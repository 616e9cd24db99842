"""Native (JVM-side, codegen-friendly) column expression library."""

from cehrbert_data_spark.functions.temporal import (
    att_token,
    att_day_token,
    att_week_token,
    att_month_token,
    att_mix_token,
    get_att_expr,
)

__all__ = [
    "att_token",
    "att_day_token",
    "att_week_token",
    "att_month_token",
    "att_mix_token",
    "get_att_expr",
]

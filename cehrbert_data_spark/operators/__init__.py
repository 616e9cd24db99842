"""Generic, schema-agnostic operator library (SURVEY.md §2)."""

from cehrbert_data_spark.operators.joins import (
    interval_join,
    asof_join,
    with_scalar_max,
    semi_filter,
    anti_filter,
)
from cehrbert_data_spark.operators.windows import (
    ordered_rank,
    top_n_per_group,
    prev_value,
    sessionize,
    streaks,
    merge_intervals,
)
from cehrbert_data_spark.operators.aggregations import (
    hourly_mean,
    distinct_frequency_filter,
    winsorize_bounds,
    corr_regression,
)
from cehrbert_data_spark.operators.closure import transitive_closure, descendants

__all__ = [
    "interval_join",
    "asof_join",
    "with_scalar_max",
    "semi_filter",
    "anti_filter",
    "ordered_rank",
    "top_n_per_group",
    "prev_value",
    "sessionize",
    "streaks",
    "merge_intervals",
    "hourly_mean",
    "distinct_frequency_filter",
    "winsorize_bounds",
    "corr_regression",
    "transitive_closure",
    "descendants",
]

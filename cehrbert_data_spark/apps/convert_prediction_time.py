"""Prediction-time post-processors for MEDS cohort outputs.

Two conversions over every parquet file under a directory tree (the
reference ships them as two pandas/polars scripts —
tools/convert_prediction_time_to_local.py, tools/convert_prediction_time_to_str.py;
here both are Spark-native so they scale past driver memory and parallelize
across files):

* ``--mode local``: treat naive ``prediction_time`` as UTC and shift it to a
  target timezone, dropping the tz afterwards (``from_utc_timestamp``).
* ``--mode str``: render ``prediction_time`` as an ISO
  ``yyyy-MM-dd HH:mm:ss.SSSSSS`` string (snappy parquet out).

Directory structure is preserved: each ``<input_dir>/rel/path.parquet``
becomes ``<output_dir>/rel/path/`` (a parquet directory — Spark's output
unit).

Run: ``python -m cehrbert_data_spark.apps.convert_prediction_time
--input_dir <dir> --output_dir <dir> --mode local --timezone America/New_York``
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cehrbert_data_spark.session import build_session
from cehrbert_data_spark.sources.writers import write_parquet

TIME_COL = "prediction_time"


def to_local(df: DataFrame, timezone: str) -> DataFrame:
    """Naive-UTC → naive-local (reference semantics: tz_localize('UTC') →
    tz_convert(tz) → tz_localize(None))."""
    if TIME_COL not in df.columns:
        return df
    return df.withColumn(TIME_COL, F.from_utc_timestamp(F.col(TIME_COL), timezone))


def to_str(df: DataFrame) -> DataFrame:
    """Timestamp → ISO8601 microsecond string."""
    if TIME_COL not in df.columns:
        return df
    return df.withColumn(
        TIME_COL, F.date_format(F.col(TIME_COL), "yyyy-MM-dd HH:mm:ss.SSSSSS")
    )


def main(
    input_dir: str,
    output_dir: str,
    mode: str = "local",
    timezone: str = "America/New_York",
    spark=None,
) -> list[str]:
    spark = spark or build_session("convert_prediction_time")
    written = []
    for src in sorted(Path(input_dir).rglob("*.parquet")):
        rel = src.relative_to(input_dir)
        df = spark.read.parquet(str(src))
        out = to_local(df, timezone) if mode == "local" else to_str(df)
        dst = os.path.join(output_dir, str(rel.with_suffix("")))
        write_parquet(out, dst)
        written.append(dst)
    return written


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Convert prediction_time columns")
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--mode", choices=["local", "str"], default="local")
    parser.add_argument("--timezone", default="America/New_York")
    return parser.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    main(
        input_dir=args.input_dir,
        output_dir=args.output_dir,
        mode=args.mode,
        timezone=args.timezone,
    )

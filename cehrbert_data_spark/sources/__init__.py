"""Sources & sinks (SURVEY.md §2.1 S1–S11)."""

from cehrbert_data_spark.sources.readers import (
    read_table,
    read_parquet,
    read_parquet_recursive,
    read_csv,
    read_jdbc_partitioned,
    normalize_domain_table,
)
from cehrbert_data_spark.sources.writers import (
    write_parquet,
    write_split,
    checkpoint_barrier,
    random_person_split,
)
from cehrbert_data_spark.sources.catalog import register_views, drop_view

__all__ = [
    "read_table",
    "read_parquet",
    "read_parquet_recursive",
    "read_csv",
    "read_jdbc_partitioned",
    "normalize_domain_table",
    "write_parquet",
    "write_split",
    "checkpoint_barrier",
    "random_person_split",
    "register_views",
    "drop_view",
]

"""Plan-level utilities: derived-table caching and pipeline composition."""

from cehrbert_data_spark.plans.cache import DerivedTableCache

__all__ = ["DerivedTableCache"]

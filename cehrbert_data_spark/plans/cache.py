"""Derived-table cache keyed by path with a refresh flag.

The reference memoizes its most expensive standardizations (processed
measurement/observation/device events) as parquet directories, recomputing
only when ``--refresh_measurement`` is passed
(reference: utils/spark_utils.py:1072-1075, 1144-1147, 1214-1217). This is
an engine feature worth having generically: any expensive derived table
becomes write-once-read-many across pipeline runs, and doubles as the
lineage/determinism barrier (SURVEY.md §4 S10).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class DerivedTableCache:
    """Materialize-or-reload derived tables under a cache root.

    >>> cache = DerivedTableCache(spark, "/cache/root")
    >>> events = cache.get_or_compute("processed_measurement",
    ...                               lambda: expensive_standardization(m))
    """

    def __init__(self, spark: SparkSession, root: str, refresh: bool = False):
        self.spark = spark
        self.root = root
        self.refresh = refresh

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(self.path(name))

    def get_or_compute(self, name: str, compute: Callable[[], DataFrame]) -> DataFrame:
        """Reload ``name`` if cached (and not refreshing), else compute,
        persist, and re-read — the re-read cuts lineage and freezes any
        nondeterministic ids in the computed frame."""
        target = self.path(name)
        if self.exists(name) and not self.refresh:
            return self.spark.read.parquet(target)
        df = compute()
        df.write.mode("overwrite").parquet(target)
        return self.spark.read.parquet(target)

    def invalidate(self, name: str) -> None:
        import shutil

        if self.exists(name):
            shutil.rmtree(self.path(name))

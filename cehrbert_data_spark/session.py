"""SparkSession factory with scale-appropriate defaults.

The reference creates sessions ad-hoc per app (e.g.
``/root/reference/src/cehrbert_data/apps/generate_training_data.py``) with
legacy-rebase compat configs scattered at call sites
(``tools/sample_omop_tables.py:21-27``, ``tools/extract_features.py:70-73``).
Here a single factory owns them, plus the knobs that matter at 100 TB:
AQE (runtime re-planning + skew-join handling), sane shuffle parallelism,
Arrow for any pandas exchange, and UTC session time so timestamp semantics
are stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that are safe and beneficial at every scale. On a real cluster the
#: submitter overrides parallelism/memory; these are the semantic defaults.
_BASE_CONFS: dict[str, str] = {
    # Adaptive query execution: runtime join re-selection, partition
    # coalescing, and skew-join splitting — the first line of defense for
    # skewed person_id / join keys at large scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamp semantics (testdata parquet is naive/UTC).
    "spark.sql.session.timeZone": "UTC",
    # Arrow for pandas UDF / toPandas exchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Read TIMESTAMP(NANOS) parquet (Spark has no nanos type) as long;
    # sources.readers converts to micros timestamps on read.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet rebase compat the reference sets ad-hoc
    # (reference: tools/sample_omop_tables.py:21-27).
    "spark.sql.legacy.parquet.int96RebaseModeInRead": "CORRECTED",
    "spark.sql.legacy.parquet.int96RebaseModeInWrite": "CORRECTED",
    "spark.sql.legacy.parquet.datetimeRebaseModeInRead": "CORRECTED",
    "spark.sql.legacy.parquet.datetimeRebaseModeInWrite": "CORRECTED",
}


def build_session(
    app_name: str = "cehrbert_data_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's defaults.

    ``master``/``shuffle_partitions`` default from ``SPARK_GRAFT_CPUS`` so the
    same code path serves local tests (local[32]) and cluster submission
    (where ``master`` is left to spark-submit).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in _BASE_CONFS.items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 4))
    )
    # Local mode: one JVM; give it headroom if nothing else configured it.
    if "SPARK_DRIVER_MEMORY" in os.environ:
        builder = builder.config(
            "spark.driver.memory", os.environ["SPARK_DRIVER_MEMORY"]
        )
    builder = builder.config("spark.ui.enabled", "false")
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

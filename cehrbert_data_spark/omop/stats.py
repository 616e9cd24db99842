"""D9/D12 — concept statistics and table subsetting.

  * lab prevalence + winsorized measurement stats
    (reference: queries/measurement_queries.py:1-57)
  * qualified concept list — concepts seen by ≥ N distinct patients
    (reference: apps/generate_included_concept_list.py:33-111)
  * patient-level sampling of all OMOP tables
    (reference: tools/sample_omop_tables.py:20-35)

All plain hash aggregates / semi-joins; the winsorized stats pass reads the
measurement table twice (bounds, then clipped stats) exactly like the
reference's window-free two-phase SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.joins import semi_filter


def lab_prevalence(measurement: DataFrame, concept: DataFrame) -> DataFrame:
    """Per-lab frequency, patient reach, numeric vs categorical value shares
    (reference: measurement_queries.py:1-15)."""
    return (
        measurement.where(F.col("measurement_concept_id") != 0)
        .join(
            F.broadcast(concept.select(F.col("concept_id"), F.col("concept_name"))),
            F.col("measurement_concept_id") == F.col("concept_id"),
        )
        .groupBy("measurement_concept_id", "concept_name")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("person_id").alias("person_count"),
            (
                F.sum(F.col("value_as_number").isNotNull().cast("int")) / F.count(F.lit(1))
            ).alias("numeric_percentage"),
            (
                F.sum(
                    (
                        F.col("value_as_concept_id").isNotNull()
                        & (F.col("value_as_concept_id") != 0)
                    ).cast("int")
                )
                / F.count(F.lit(1))
            ).alias("categorical_percentage"),
        )
        .orderBy(F.desc("freq"))
    )


def measurement_unit_stats(
    measurement: DataFrame,
    required_measurement: DataFrame,
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Winsorized per-(concept, unit) stats (measurement_queries.py:17-57):
    1%/99% bounds per group, then mean/stddev/count of in-bound values."""
    numeric_required = required_measurement.where(F.col("is_numeric")).select(
        "measurement_concept_id"
    )
    m = semi_filter(measurement, numeric_required, "measurement_concept_id")
    bounds = m.groupBy("measurement_concept_id", "unit_concept_id").agg(
        F.expr(f"percentile_approx(value_as_number, {lower})").alias("lower_bound"),
        F.expr(f"percentile_approx(value_as_number, {upper})").alias("upper_bound"),
    )
    return (
        m.where(F.col("visit_occurrence_id").isNotNull())
        .where(F.col("unit_concept_id") != 0)
        .where(F.col("measurement_concept_id") != 0)
        .join(bounds, ["measurement_concept_id", "unit_concept_id"])
        .where(F.col("value_as_number").between(F.col("lower_bound"), F.col("upper_bound")))
        .groupBy("measurement_concept_id", "unit_concept_id")
        .agg(
            F.mean("value_as_number").alias("value_mean"),
            F.stddev("value_as_number").alias("value_stddev"),
            F.count(F.lit(1)).alias("measurement_freq"),
            F.first("lower_bound").alias("lower_bound"),
            F.first("upper_bound").alias("upper_bound"),
        )
    )


def qualified_concept_list(
    patient_events: DataFrame, min_patient_count: int = 100
) -> DataFrame:
    """Concepts observed in ≥ N distinct patients
    (reference: generate_included_concept_list.py:105-111)."""
    return (
        patient_events.groupBy("standard_concept_id")
        .agg(F.countDistinct("person_id").alias("freq"))
        .where(F.col("freq") >= min_patient_count)
    )


def sample_omop_tables(
    tables: dict[str, DataFrame],
    person_sample_fraction: float = 0.1,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """D12: subset every OMOP table to a random person sample
    (reference: tools/sample_omop_tables.py:20-35) — one sampled person set,
    broadcast semi-joined into each table that has person_id."""
    persons = (
        tables["person"].select("person_id").distinct().sample(person_sample_fraction, seed)
    )
    out = {}
    for name, df in tables.items():
        if "person_id" in df.columns:
            out[name] = semi_filter(df, persons, "person_id")
        else:
            out[name] = df
    return out

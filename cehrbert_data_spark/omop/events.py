"""D1 — canonical patient-event standardization.

Every OMOP domain table is projected into one flat shape
(person_id, standard_concept_id, date, datetime, visit_occurrence_id, domain,
event_group_id, number_as_value, concept_as_value, unit) and unioned. Column
discovery is by name convention (reference: utils/spark_utils.py:100-155);
the canonical projection mirrors utils/spark_utils.py:158-237 and the
measurement SQL path :1082-1120.

Scale notes: each per-domain extraction is filter → project → distinct —
Catalyst pushes the not-null/'0' filters into the parquet scan and prunes to
the ~8 needed columns. The cross-domain union is a no-shuffle UnionExec; the
single `distinct` per domain is the only shuffle and is keyed on the full
(narrow) event row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cehrbert_data_spark.omop.const import (
    DOMAIN_KEY_FIELDS,
    MEASUREMENT,
    NA,
    NUMERIC_DOMAIN_TABLES,
)

#: Canonical patient-event schema (FIXTURES.md "canonical intermediate").
EVENT_COLUMNS = [
    "person_id",
    "standard_concept_id",
    "date",
    "datetime",
    "visit_occurrence_id",
    "domain",
    "event_group_id",
    "number_as_value",
    "concept_as_value",
    "unit",
]


def get_key_fields(df: DataFrame) -> list[tuple[str, str, str, str]]:
    """Locate (concept_id, date, datetime, domain) columns by convention
    (reference: utils/spark_utils.py:100-112)."""
    names = df.schema.fieldNames()
    for key, fields in DOMAIN_KEY_FIELDS.items():
        if key in names:
            return fields
    concept_field = next(f for f in names if "concept_id" in f)
    date_field = next(f for f in names if "date" in f)
    datetime_field = next(f for f in names if "datetime" in f)
    return [(concept_field, date_field, datetime_field, concept_field.replace("_concept_id", ""))]


def domain_has_unit(df: DataFrame) -> bool:
    return any("unit_concept_id" in f for f in df.schema.fieldNames())


def is_numeric_domain(domain_table_name: str) -> bool:
    return any(t.startswith(domain_table_name) for t in NUMERIC_DOMAIN_TABLES)


def clean_up_unit(df: DataFrame, unit_col: str = "unit") -> DataFrame:
    """Strip ``{...}`` annotations; leading ``/`` → ``1/``
    (reference: utils/spark_utils.py:1044-1051)."""
    return df.withColumn(
        unit_col, F.regexp_replace(F.col(unit_col), r"\{.*?\}", "")
    ).withColumn(unit_col, F.regexp_replace(F.col(unit_col), r"^/", "1/"))


def extract_domain_events(domain_table: DataFrame) -> DataFrame:
    """Project one non-numeric domain table to canonical events
    (reference: utils/spark_utils.py:204-230): drop null dates/concepts and
    concept '0', coalesce datetime to date, tag domain by table-name prefix."""
    out = None
    for concept_field, date_field, datetime_field, domain_name in get_key_fields(domain_table):
        records = (
            domain_table.where(F.col(date_field).isNotNull())
            .where(F.col(concept_field).isNotNull())
            .where(F.col(concept_field).cast("string") != "0")
            .withColumn("date", F.to_date(F.col(date_field)))
            .withColumn(
                "datetime",
                F.to_timestamp(F.coalesce(F.col(datetime_field), F.col(date_field))),
            )
        )
        projected = records.select(
            F.col("person_id"),
            F.col(concept_field).cast("string").alias("standard_concept_id"),
            F.col("date").cast("date"),
            F.col("datetime").cast(T.TimestampType()),
            F.col("visit_occurrence_id"),
            F.lit(domain_name.split("_")[0]).alias("domain"),
            F.lit(None).cast("string").alias("event_group_id"),
            F.lit(None).cast("float").alias("number_as_value"),
            F.lit(None).cast("string").alias("concept_as_value"),
            (F.col("unit") if domain_has_unit(domain_table) else F.lit(NA)).alias("unit"),
        ).distinct()
        out = projected if out is None else out.unionByName(projected)
    return out


def extract_value_events(
    domain_table: DataFrame,
    concept: DataFrame,
    aggregate_by_hour: bool = False,
) -> DataFrame:
    """Measurement/observation/device extraction with values and units
    (reference: utils/spark_utils.py:1082-1120 and the identical observation/
    device variants :1154-1257).

    Splits numeric (value_as_number present → unit cleanup, optional hourly
    mean) from non-numeric events, then re-unions. The unit lookup joins
    ``concept`` on unit_concept_id — broadcast (vocabulary is small relative
    to events at any scale).
    """
    concept_field, date_field, datetime_field, domain_name = get_key_fields(domain_table)[0]
    unit_source = (
        F.col("unit_source_value") if "unit_source_value" in domain_table.columns
        else F.lit(None).cast("string")
    )
    value_as_number = (
        F.col("value_as_number") if "value_as_number" in domain_table.columns
        else F.lit(None).cast("float")
    )
    value_as_concept = (
        F.col("value_as_concept_id") if "value_as_concept_id" in domain_table.columns
        else F.lit(None).cast("string")
    )
    unit_lookup = F.broadcast(
        concept.select(
            F.col("concept_id").alias("unit_concept_id"),
            F.col("concept_code").alias("unit_concept_code"),
        )
    )
    events = (
        domain_table.join(unit_lookup, "unit_concept_id", "left_outer")
        .select(
            F.col("person_id"),
            F.col(concept_field).cast("string").alias("standard_concept_id"),
            F.col(date_field).cast("date").alias("date"),
            F.coalesce(F.col(datetime_field), F.col(date_field))
            .cast(T.TimestampType())
            .alias("datetime"),
            F.col("visit_occurrence_id"),
            F.lit(domain_name).alias("domain"),
            F.lit(None).cast("string").alias("event_group_id"),
            value_as_number.cast("float").alias("number_as_value"),
            value_as_concept.cast("string").alias("concept_as_value"),
            F.coalesce(F.col("unit_concept_code"), unit_source, F.lit(NA)).alias("unit"),
        )
        .distinct()
        .where(F.col("standard_concept_id") != "0")
    )
    numeric = clean_up_unit(events.where(F.col("number_as_value").isNotNull()))
    non_numeric = events.where(F.col("number_as_value").isNull())

    if aggregate_by_hour:
        numeric = (
            numeric.withColumn("lab_hour", F.hour("datetime"))
            .groupBy(
                "person_id", "visit_occurrence_id", "standard_concept_id",
                "unit", "date", "lab_hour",
            )
            .agg(
                F.min("datetime").alias("datetime"),
                F.avg("number_as_value").alias("number_as_value"),
            )
            .withColumn("domain", F.lit(domain_name).cast("string"))
            .withColumn("concept_as_value", F.lit(None).cast("string"))
            .withColumn("event_group_id", F.lit(None).cast("string"))
            .drop("lab_hour")
        )
    return numeric.unionByName(non_numeric, allowMissingColumns=False).select(EVENT_COLUMNS)


def extract_events_by_domain(
    domain_table: DataFrame,
    concept: DataFrame | None = None,
    aggregate_by_hour: bool = False,
) -> DataFrame:
    """Dispatch per domain (reference: utils/spark_utils.py:158-237)."""
    domain_name = get_key_fields(domain_table)[0][3]
    if is_numeric_domain(domain_name):
        if concept is None:
            raise ValueError(f"{domain_name} extraction requires the concept table")
        return extract_value_events(domain_table, concept, aggregate_by_hour)
    return extract_domain_events(domain_table).select(EVENT_COLUMNS)


def invalidate_visit_id(domain_table: DataFrame, visit_occurrence: DataFrame) -> DataFrame:
    """Null out visit_occurrence_id FKs that don't exist in visit_occurrence
    (reference: utils/spark_utils.py:827-843). Left join against the distinct
    valid-id set; AQE broadcasts it when small."""
    valid = visit_occurrence.select(
        F.col("visit_occurrence_id").alias("__valid_visit_id")
    ).distinct()
    return (
        domain_table.join(
            valid,
            domain_table["visit_occurrence_id"] == valid["__valid_visit_id"],
            "left_outer",
        )
        .withColumn(
            "visit_occurrence_id",
            F.when(F.col("__valid_visit_id").isNotNull(), F.col("visit_occurrence_id")),
        )
        .drop("__valid_visit_id")
    )


def with_age(events: DataFrame, person: DataFrame) -> DataFrame:
    """Join person demographics and compute age at event
    (reference: utils/spark_utils.py:912-923): birth_datetime falls back to
    Jan-1 of year_of_birth; age = ceil(months_between/12)."""
    demo = person.withColumn(
        "birth_datetime",
        F.coalesce(
            F.col("birth_datetime"),
            F.concat(F.col("year_of_birth"), F.lit("-01-01")).cast("timestamp"),
        ),
    ).select("person_id", "birth_datetime")
    return events.join(demo, "person_id").withColumn(
        "age", F.ceil(F.months_between(F.col("date"), F.col("birth_datetime")) / F.lit(12))
    ).drop("birth_datetime")


def extract_ehr_records(
    tables: dict[str, DataFrame],
    domain_table_names: list[str],
    concept: DataFrame | None = None,
    aggregate_by_hour: bool = False,
    include_visit_type: bool = False,
    keep_orphan_records: bool = False,
    qualified_concepts: DataFrame | None = None,
) -> DataFrame:
    """Standardize + union the requested domains, then enrich with age and
    optionally visit type (reference: utils/spark_utils.py:845-943).

    ``tables`` maps table name → normalized DataFrame (must include 'person'
    and 'visit_occurrence').
    """
    visit_occurrence = tables["visit_occurrence"]
    records = None
    for name in domain_table_names:
        domain = invalidate_visit_id(tables[name], visit_occurrence)
        events = extract_events_by_domain(
            domain, concept=concept, aggregate_by_hour=aggregate_by_hour
        )
        records = events if records is None else records.unionByName(events)

    if qualified_concepts is not None:
        records = records.join(
            F.broadcast(qualified_concepts.select("standard_concept_id").distinct()),
            "standard_concept_id",
        )
    if not keep_orphan_records:
        records = records.where(F.col("visit_occurrence_id").isNotNull()).distinct()

    records = with_age(records, tables["person"])

    if include_visit_type:
        visit_types = visit_occurrence.select("visit_occurrence_id", "visit_concept_id")
        records = records.join(visit_types, "visit_occurrence_id", "left_outer")
    return records

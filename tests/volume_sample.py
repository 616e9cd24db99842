"""Volume variant of the augmented OMOP sample: N key-shifted replicas.

The 12 prediction-cohort goldens run on 22 persons; this module scales the
SAME augmented input (tests/augmented_sample.py) to 110 persons by
replicating every person-grain table five times with a consistent
+100000·replica shift on every entity-id column — the 120-patient EHRSHOT
trick applied to the cohort side. All clinical content (dates, concepts,
values) is untouched, so per-person label semantics are provably identical
across replicas, and what the volume goldens pin is everything that only
breaks PAST a handful of patients:

* cohort_member_id assignment order over many persons whose STRING ids
  sort differently than their numeric values (10 vs 100010 — the exact
  class of bug the EHRSHOT volume golden caught in round 5);
* per-person windows that accidentally leak across persons (any
  cross-replica contamination changes member counts/labels);
* dedup/exclusion joins whose keys must stay person-scoped.

Concept-grain tables (concept, concept_ancestor, concept_relationship) are
shared dimensions and copied once. Everything is derived with fixed rules —
no RNG, no wall-clock — so the reference pipeline and this engine run on
bit-identical input and `tools/make_golden.py volume-cohort` fixtures are
reproducible from scratch.
"""

from __future__ import annotations

import os

import duckdb

from augmented_sample import build_augmented_sample

#: replicas (including the identity replica 0, which keeps the original ids)
REPLICAS = 5
#: per-replica id shift: far above every id in the augmented sample, and
#: chosen so shifted ids sort differently as strings than as integers
OFFSET = 100_000

#: table -> entity-id columns to shift (only columns the table actually has
#: are shifted; concept/provider/care-site ids are shared dims, untouched)
ID_COLUMNS: dict[str, tuple[str, ...]] = {
    "person": ("person_id",),
    "visit_occurrence": (
        "visit_occurrence_id", "person_id", "preceding_visit_occurrence_id",
    ),
    "condition_occurrence": (
        "condition_occurrence_id", "person_id", "visit_occurrence_id",
    ),
    "drug_exposure": ("drug_exposure_id", "person_id", "visit_occurrence_id"),
    "procedure_occurrence": (
        "procedure_occurrence_id", "person_id", "visit_occurrence_id",
    ),
    "observation_period": ("observation_period_id", "person_id"),
    "death": ("person_id",),
    "observation": ("observation_id", "person_id", "visit_occurrence_id"),
    "measurement": ("measurement_id", "person_id", "visit_occurrence_id"),
    "vent": ("person_id",),
}

COPIED = ("concept", "concept_ancestor", "concept_relationship")


def build_volume_sample(out_dir: str, replicas: int = REPLICAS) -> str:
    """Materialize the volume sample under ``out_dir`` (augmented sample is
    built into ``out_dir``/_base first, then replicated). Idempotent."""
    base = build_augmented_sample(os.path.join(out_dir, "_base"))
    con = duckdb.connect()

    def write(table: str, sql: str) -> None:
        d = os.path.join(out_dir, table)
        os.makedirs(d, exist_ok=True)
        con.sql(
            f"COPY ({sql}) TO '{os.path.join(d, 'part-0.parquet')}' (FORMAT PARQUET)"
        )

    for table, id_cols in ID_COLUMNS.items():
        src = f"read_parquet('{base}/{table}/*.parquet')"
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()]
        shifted = set(id_cols) & set(cols)
        exprs = []
        for c in cols:
            if c in shifted:
                # ids are VARCHAR in the sample's physical schema; keep
                # non-numeric/NULL values (e.g. absent preceding-visit ids)
                # untouched rather than nulling them out
                exprs.append(
                    f"CASE WHEN TRY_CAST({c} AS BIGINT) IS NULL THEN {c} "
                    f"ELSE CAST(TRY_CAST({c} AS BIGINT) + rep * {OFFSET} AS VARCHAR) "
                    f"END AS {c}"
                )
            else:
                exprs.append(c)
        write(
            table,
            f"SELECT {', '.join(exprs)} FROM {src} "
            f"CROSS JOIN (SELECT UNNEST(RANGE({replicas})) AS rep)",
        )
    for table in COPIED:
        write(table, f"SELECT * FROM read_parquet('{base}/{table}/*.parquet')")
    con.close()
    return out_dir

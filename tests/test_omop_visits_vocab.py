from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cehrbert_data_spark.omop.visits import (
    consolidate_visits,
    construct_artificial_visits,
    remap_visit_ids,
)
from cehrbert_data_spark.omop.vocab import (
    build_ancestry_table,
    get_descendant_concepts,
    roll_up_to_drug_ingredients,
)


def _dt(m, d, h=0):
    return datetime.datetime(2020, m, d, h)


def _visit_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "visit_occurrence_id: long, person_id: long, visit_concept_id: int, "
        "visit_start_date: date, visit_start_datetime: timestamp, "
        "visit_end_date: date, visit_end_datetime: timestamp",
    )


def test_construct_artificial_visits(spark):
    visits = _visit_df(
        spark,
        [(10, 1, 9202, _dt(1, 1).date(), _dt(1, 1, 9), _dt(1, 1).date(), _dt(1, 1, 17))],
    )
    events = spark.createDataFrame(
        [
            # inside visit 10 -> relinked
            (1, "C1", _dt(1, 1).date(), _dt(1, 1, 10), None, 0),
            # no covering visit -> artificial visit
            (1, "C2", _dt(6, 1).date(), _dt(6, 1, 10), None, 0),
            # already linked -> untouched
            (1, "C3", _dt(1, 1).date(), _dt(1, 1, 11), 10, 9202),
        ],
        "person_id: long, standard_concept_id: string, date: date, "
        "datetime: timestamp, visit_occurrence_id: long, visit_concept_id: int",
    )
    fixed_events, fixed_visits = construct_artificial_visits(events, visits)
    by_concept = {r["standard_concept_id"]: r for r in fixed_events.collect()}
    assert by_concept["C1"]["visit_occurrence_id"] == 10
    assert by_concept["C3"]["visit_occurrence_id"] == 10
    assert by_concept["C2"]["visit_occurrence_id"] > 10  # new id above max

    new_visits = [r for r in fixed_visits.collect() if r["visit_occurrence_id"] != 10]
    assert len(new_visits) == 1
    nv = new_visits[0]
    assert nv["visit_concept_id"] == 0
    assert nv["visit_start_date"] == _dt(6, 1).date()
    assert fixed_events.count() == 3


def test_consolidate_visits_inpatient_merge(spark):
    visits = _visit_df(
        spark,
        [
            # two inpatient fragments 2h apart -> merged into 1
            (1, 1, 9201, _dt(1, 1).date(), _dt(1, 1, 8), _dt(1, 3).date(), _dt(1, 3, 12)),
            (2, 1, 9201, _dt(1, 3).date(), _dt(1, 3, 14), _dt(1, 5).date(), _dt(1, 5, 12)),
            # outpatient visit inside the stay -> absorbed
            (3, 1, 9202, _dt(1, 2).date(), _dt(1, 2, 10), _dt(1, 2).date(), _dt(1, 2, 11)),
            # standalone outpatient weeks later -> kept
            (4, 1, 9202, _dt(2, 1).date(), _dt(2, 1, 10), _dt(2, 1).date(), _dt(2, 1, 11)),
        ],
    )
    fixed, mapping = consolidate_visits(visits, inpatient_hour_threshold=24)
    kept = {r["visit_occurrence_id"]: r for r in fixed.collect()}
    assert set(kept) == {1, 4}
    # master inpatient span widened to cover both fragments
    assert kept[1]["visit_end_datetime"] == _dt(1, 5, 12)
    remap = {r["visit_occurrence_id"]: r["master_visit_occurrence_id"] for r in mapping.collect()}
    assert remap[2] == 1 and remap[3] == 1

    events = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "event_id: long, visit_occurrence_id: long"
    )
    remapped = {r["event_id"]: r["visit_occurrence_id"] for r in remap_visit_ids(events, mapping).collect()}
    assert remapped == {1: 1, 2: 1, 3: 4}


def test_ancestry_and_descendants(spark):
    rel = spark.createDataFrame(
        [
            (1, 2, "Subsumes"),
            (2, 3, "Subsumes"),
            (3, 4, "Subsumes"),
            (9, 3, "Maps to"),   # wrong relationship -> ignored
            (5, 6, "Subsumes"),  # not reachable from seed
        ],
        "concept_id_1: int, concept_id_2: int, relationship_id: string",
    )
    anc = build_ancestry_table(rel, [1])
    got = {(r["ancestor_concept_id"], r["descendant_concept_id"]): r["distance"] for r in anc.collect()}
    assert got == {(1, 2): 1, (1, 3): 2, (1, 4): 3}

    concept = spark.createDataFrame(
        [(2, "a"), (3, "b"), (6, "c")], "concept_id: int, concept_name: string"
    )
    closure_table = spark.createDataFrame(
        [(1, 2), (1, 3)], "ancestor_concept_id: int, descendant_concept_id: int"
    )
    desc = get_descendant_concepts(concept, closure_table, [1])
    assert sorted(r["concept_id"] for r in desc.collect()) == [2, 3]


def test_drug_rollup(spark):
    drug_exposure = spark.createDataFrame(
        [(100, 1), (200, 2)], "drug_concept_id: int, drug_exposure_id: int"
    )
    concept = spark.createDataFrame(
        [(10, "Ingredient"), (20, "Brand Name")],
        "concept_id: int, concept_class_id: string",
    )
    ancestor = spark.createDataFrame(
        [(10, 100), (20, 200)], "ancestor_concept_id: int, descendant_concept_id: int"
    )
    out = {r["drug_exposure_id"]: r["drug_concept_id"]
           for r in roll_up_to_drug_ingredients(drug_exposure, concept, ancestor).collect()}
    assert out == {1: 10, 2: 200}  # 100 -> ingredient 10; 200 keeps itself


def test_relink_forms_identical(spark):
    """The agg form (min-struct, map-side combinable) must produce row-for-
    row the window form's output, including tie-breaks (two visits sharing
    a start datetime -> lowest id wins) and orphans (no covering visit)."""
    import random

    rng = random.Random(11)
    visits = _visit_df(
        spark,
        [
            (
                vid,
                p,
                9202,
                _dt(m, d).date(),
                _dt(m, d, 8),
                _dt(m, d).date(),
                _dt(m, d, 18),
            )
            for vid, (p, m, d) in enumerate(
                [
                    (p, rng.randint(1, 6), rng.randint(1, 28))
                    for p in range(1, 9)
                    for _ in range(6)
                ],
                start=100,
            )
        ]
        # two visits with IDENTICAL start for the tie-break path
        + [
            (900, 1, 9202, _dt(2, 2).date(), _dt(2, 2, 8), _dt(2, 2).date(), _dt(2, 2, 20)),
            (901, 1, 9202, _dt(2, 2).date(), _dt(2, 2, 8), _dt(2, 2).date(), _dt(2, 2, 20)),
        ],
    )
    events = spark.createDataFrame(
        [
            (
                p,
                f"E{p}_{i}",
                _dt(rng.randint(1, 7), rng.randint(1, 28)).date(),
                None,
                None,
                0,
            )
            for p in range(1, 10)  # person 9 has NO visits at all
            for i in range(20)
        ],
        "person_id: long, standard_concept_id: string, date: date, "
        "datetime: timestamp, visit_occurrence_id: long, visit_concept_id: int",
    ).withColumn("datetime", F.to_timestamp(F.col("date")) + F.expr("INTERVAL 10 HOURS"))

    def snapshot(form):
        ev, vi = construct_artificial_visits(events, visits, relink_form=form)
        key = lambda r: (r["person_id"], r["standard_concept_id"])
        return (
            sorted((key(r), r["visit_occurrence_id"], r["visit_concept_id"])
                   for r in ev.collect()),
            sorted((r["visit_occurrence_id"], r["person_id"],
                    r["visit_start_datetime"], r["visit_end_datetime"])
                   for r in vi.collect()),
        )

    ev_w, vi_w = snapshot("window")
    ev_a, vi_a = snapshot("agg")
    assert ev_w == ev_a
    assert vi_w == vi_a
    # the tie actually exercised: some event on 2-2 links to visit 900 (not 901)
    linked_ids = {v for (_, v, _) in ev_w if v is not None}
    assert 901 not in linked_ids


def test_relink_forms_agree_on_duplicate_visit_ids(spark):
    """r10 verdict nit: the agg relink's winner contract assumes
    visit_occurrence_id is unique per visit row. Feed a DUPLICATED visit id
    (same (start, id), different visit_concept_id, adversarial physical row
    order) and require both forms to deterministically elect the SAME
    winner — min visit_concept_id, the agg struct's natural fall-through —
    instead of the window form silently taking whichever duplicate row
    arrived first."""
    visits = _visit_df(
        spark,
        [
            # duplicated id 10: the HIGH concept row physically first so a
            # row-order-dependent rank-1 would pick 9203, not 9201
            (10, 1, 9203, _dt(1, 1).date(), _dt(1, 1, 8), _dt(1, 1).date(), _dt(1, 1, 20)),
            (10, 1, 9201, _dt(1, 1).date(), _dt(1, 1, 8), _dt(1, 1).date(), _dt(1, 1, 20)),
            (11, 2, 9202, _dt(1, 2).date(), _dt(1, 2, 8), _dt(1, 2).date(), _dt(1, 2, 20)),
        ],
    ).coalesce(1)
    events = spark.createDataFrame(
        [
            (1, "C1", _dt(1, 1).date(), _dt(1, 1, 10), None, 0),
            (2, "C2", _dt(1, 2).date(), _dt(1, 2, 10), None, 0),
        ],
        "person_id: long, standard_concept_id: string, date: date, "
        "datetime: timestamp, visit_occurrence_id: long, visit_concept_id: int",
    )

    def snapshot(form):
        ev, _ = construct_artificial_visits(events, visits, relink_form=form)
        return sorted(
            (r["person_id"], r["standard_concept_id"],
             r["visit_occurrence_id"], r["visit_concept_id"])
            for r in ev.collect()
        )

    ev_w = snapshot("window")
    ev_a = snapshot("agg")
    assert ev_w == ev_a
    # the duplicated-id tie resolves to the MIN concept in both forms
    winner = {(p, c): vc for p, c, v, vc in ev_w if v == 10}
    assert winner == {(1, "C1"): 9201}


def test_relink_form_validated(spark):
    visits = _visit_df(
        spark,
        [(10, 1, 9202, _dt(1, 1).date(), _dt(1, 1, 9), _dt(1, 1).date(), _dt(1, 1, 17))],
    )
    events = spark.createDataFrame(
        [(1, "C1", _dt(1, 1).date(), _dt(1, 1, 10), None, 0)],
        "person_id: long, standard_concept_id: string, date: date, "
        "datetime: timestamp, visit_occurrence_id: long, visit_concept_id: int",
    )
    with pytest.raises(ValueError, match="relink_form"):
        construct_artificial_visits(events, visits, relink_form="nope")

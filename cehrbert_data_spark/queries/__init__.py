"""Declared query battery: one entry per implemented operator (SURVEY.md §2).

Each module exposes ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
ANSI-SQL equivalent DuckDB runs on the same parquet for the correctness gate.

Cross-engine exactness discipline (why results hash-match bit-for-bit):
  * money-like sums go through DECIMAL casts (order-independent);
  * ratios divide two exact quantities as doubles (same operands → same IEEE
    result in both engines);
  * float vectors are quantized to integers before dot products;
  * every rank/order uses a total (tie-broken) ordering.

Driver-window rotation policy
-----------------------------
The driver's correctness harness checks only the FIRST ``_DRIVER_SLOTS``
registry entries each round, while the full battery (all queries, three
scale factors) is verified locally by ``tools/verify_oracle.py``. Rounds 3-6
rotated the window with hand-curated tail lists; with 115 declared queries
and 50 slots that is arithmetically unsound (rotation period > 2 rounds, so
"no query two consecutive rounds unchecked" cannot hold) and error-prone.

The registry now computes the order mechanically: OLDEST DRIVER VERDICT
FIRST. Each query's most recent verdict round is read from the
``CORRECTNESS_r{N}.json`` records the driver leaves at the repo root;
never-checked queries sort before everything else, and ties (same verdict
round, including the never-checked class) break by NAME so the schedule is
a deterministic function of the on-disk records alone — independent of the
module merge order, which drifts when query modules are added. Under this
policy every query receives a driver verdict at least every
``ceil(N / _DRIVER_SLOTS)`` rounds (for 115/50: every 3 rounds, i.e. a
verdict's age never exceeds 2 rounds) — pinned by a simulation test in
``tests/test_registry_rotation.py``, which also asserts the live ordering
invariants (never-checked first, head max-age >= tail min-age never
violated). If the records are absent (fresh checkout, packaged install)
the policy degrades to plain declaration order, which is still a valid
total order — just without the freshness guarantee.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from cehrbert_data_spark.queries import (
    checksums,
    clinical,
    graph,
    llm,
    relational,
    sequences,
)

#: How many registry entries the driver's per-round correctness window reads.
_DRIVER_SLOTS = 50


def verdict_history(root: Path | None = None) -> dict[str, int]:
    """query name -> most recent driver round with a recorded verdict.

    Reads every ``CORRECTNESS_r{N}.json`` at the repo root (the files the
    round driver writes after each windowed run). A query appearing in a
    record — pass OR fail — counts as having received a verdict that round.
    Queries in no record are absent from the map (treated as round 0 by
    :func:`rotation_order`, i.e. maximally stale). Unreadable records are
    skipped: the policy degrades toward declaration order, never crashes.
    """
    hist: dict[str, int] = {}
    root = root or Path(__file__).resolve().parents[2]
    for path in root.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path.name)
        if not m:
            continue
        try:
            results = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(results, dict):
            continue
        rnd = int(m.group(1))
        for name in results:
            hist[name] = max(hist.get(name, 0), rnd)
    return hist


def rotation_order(names: list[str], history: dict[str, int]) -> list[str]:
    """Total order over ``names``: oldest driver verdict first, never-checked
    (absent from ``history``) before everything, ties by NAME. Deterministic
    given the same inputs.

    Ties break by name, not declaration position: declaration order shifts
    whenever a query module is added to the merge list (round 10 added
    ``checksums`` mid-round and the window's tie-class picks stopped being
    re-derivable from the end-state tree — VERDICT.md r10 "what's wrong").
    Name order is a property of the query set itself, so the computed window
    reproduces from any tree state with the same CORRECTNESS records.

    Soundness: checking the first S of this order each round and recording
    verdicts guarantees every name is checked at least every ceil(N/S)
    rounds — a name just checked can be deferred only while >= S names hold
    strictly older verdicts, and each round retires S of those.
    """
    return sorted(names, key=lambda n: (history.get(n, 0), n))


def _merged():
    merged = {}
    for mod in (relational, sequences, graph, clinical, llm, checksums):
        for name, pair in mod.QUERIES.items():
            merged[name] = pair
    order = rotation_order(list(merged), verdict_history())
    return {name: merged[name] for name in order}


def all_queries():
    return {name: fn for name, (fn, _) in _merged().items()}


def all_oracles():
    return {name: sql for name, (_, sql) in _merged().items() if sql is not None}

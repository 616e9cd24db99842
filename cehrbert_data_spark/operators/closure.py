"""Iterative / recursive computation (SURVEY.md §2.11).

R1: transitive closure over an edge list by frontier BFS — Spark (< 4.0 SQL)
has no recursive CTE, so this is a driver loop of DataFrame joins, exactly
the shape of the reference's ancestry builder
(reference: utils/vocab_utils.py:4-64). Each iteration checkpoints the
frontier: without the barrier the lineage doubles per hop and planning time
explodes; with it each hop is one shuffle join at cluster scale.

R2: closure lookup against a precomputed ancestor table — a single join,
always preferred when the closure exists (utils/vocab_utils.py:67-89).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """All reachable (src, dst, distance) pairs of a DAG edge list.

    distance starts at 1 for direct edges. Stops when an iteration adds no new
    pairs (anti-join against the accumulated closure, then ``isEmpty``).
    ``seeds`` (single-column DataFrame of source ids) restricts the closure to
    paths starting at those ids — the reference's seeded ancestry BFS
    (utils/vocab_utils.py:4-64) — so the per-hop join grows with the seeded
    subgraph, not the whole edge set.
    """
    level_1 = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.lit(1).alias("distance")
    )
    if seeds is not None:
        seed_col = seeds.columns[0]
        level_1 = level_1.join(
            F.broadcast(seeds.select(F.col(seed_col).alias("src")).distinct()), "src"
        )
    closure = level_1.distinct().localCheckpoint(eager=True)
    frontier = closure
    step = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))

    # Scope the loop's shuffle width to the frontier's actual size: the
    # per-hop joins move |frontier| rows, usually orders of magnitude smaller
    # than the session default is tuned for, and each over-wide stage costs
    # (tasks × per-task overhead) × iterations. The count is free — level_1
    # is already materialized. Restored in the finally below; at real scale
    # (>~3M seed pairs) this leaves the session width untouched.
    spark = edges.sparkSession
    session_width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Floor of 8: below that the loop loses pipeline parallelism across its
    # three jobs per hop (measured: width 1-2 is ~40% slower than 8).
    loop_width = min(session_width, max(8, closure.count() // 100_000))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_width))
    try:
        closure = _closure_loop(closure, frontier, step, max_iterations)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(session_width))
    return closure


def _closure_loop(closure, frontier, step, max_iterations):
    for _ in range(max_iterations):
        candidates = (
            frontier.join(step, frontier["dst"] == step["e_src"])
            .select(
                frontier["src"].alias("src"),
                step["e_dst"].alias("dst"),
                (frontier["distance"] + 1).alias("distance"),
            )
            .distinct()
        )
        # Keep only genuinely new (src, dst) pairs; a shorter path wins because
        # BFS discovers pairs in distance order. Only the per-hop delta is
        # checkpointed — the accumulated closure is a union of materialized
        # deltas, so its lineage stays one union deep and needs no barrier of
        # its own (halves the per-iteration jobs vs checkpointing both).
        new_pairs = candidates.join(closure, ["src", "dst"], "left_anti")
        new_pairs = new_pairs.localCheckpoint(eager=True)
        if new_pairs.isEmpty():
            break
        closure = closure.unionByName(new_pairs)
        frontier = new_pairs
    return closure


def descendants(
    ancestor_table: DataFrame,
    seeds: DataFrame,
    ancestor_col: str = "ancestor_concept_id",
    descendant_col: str = "descendant_concept_id",
    seed_col: str = "concept_id",
) -> DataFrame:
    """R2: descendant set via a precomputed closure table — one semi-join."""
    return ancestor_table.join(
        seeds.select(F.col(seed_col).alias(ancestor_col)).distinct(),
        ancestor_col,
    ).select(F.col(descendant_col).alias(seed_col)).distinct()

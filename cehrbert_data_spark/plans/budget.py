"""Plan-budget guard: make plan discipline an APP-level guarantee.

The plan-shape unit tests (tests/test_plan_shapes.py, test_bucketing.py)
pin individual operators; this module lets the big apps assert the same
properties on the ACTUAL composed pipeline before any byte is written —
run with ``--plan_check`` (optionally ``--dry_run``) and the app fails
fast if a refactor silently degraded the plan (a join that stopped
broadcasting, a window that lost its partitioning, an Exchange that crept
onto a bucketed input).

Checks are string probes over the formatted physical plan — the same
technique the plan tests use — so they add ZERO execution cost: only
analysis/optimization runs, never a job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class PlanBudgetError(AssertionError):
    """A composed pipeline's physical plan broke its declared budget."""


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """Formatted physical plan without executing anything."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (broadcast exchanges excluded —
    broadcasting a small side is the DESIRED behavior, not a shuffle).

    Uses 'simple' explain mode: it prints 'Exchange hashpartitioning(...)'
    inline, whereas 'formatted' separates operator names from arguments and
    would defeat the substring probes."""
    p = physical_plan(df, mode="simple")
    return (
        p.count("Exchange hashpartitioning")
        + p.count("Exchange rangepartitioning")
        + p.count("Exchange RoundRobinPartitioning")
        + p.count("Exchange SinglePartition")
    )


def has_global_window(df: DataFrame) -> bool:
    """True if any window function runs with an EMPTY partition spec — the
    single-partition shape that cannot scale (operators.windows refuses to
    build these; this catches ones composed around that guard).

    Probes every ``windowspecdefinition(...)`` in the simple-mode plan. Its
    argument list is: partition columns, then order columns (each tagged
    ``ASC``/``DESC``), then ``specifiedwindowframe(...)`` — so the spec is
    GLOBAL exactly when the FIRST argument is already an order column or
    the frame itself. Coarser probes fail here: 'Exchange SinglePartition
    anywhere + Window anywhere' false-positives on pipelines combining a
    legitimate 1-row scalar aggregate with partitioned windows
    (artificial-visit minting), and counting a Window line's bracket
    groups can't tell partitioned-unordered ('Window [fns], [part]' —
    cohort index-date min over person_id) from global-ordered
    ('Window [fns], [order]')."""
    p = physical_plan(df, mode="simple")
    marker = "windowspecdefinition("
    pos = p.find(marker)
    while pos != -1:
        i = pos + len(marker)
        depth = 0
        while i < len(p):
            c = p[i]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            i += 1
        first_arg = p[pos + len(marker): i].strip()
        if (
            first_arg.startswith("specifiedwindowframe")
            or " ASC" in first_arg
            or " DESC" in first_arg
        ):
            return True
        pos = p.find(marker, pos + len(marker))
    return False


def assert_plan_budget(
    df: DataFrame,
    label: str,
    max_exchanges: int | None = None,
    forbid_global_window: bool = True,
    forbid_python_rows: bool = True,
) -> dict:
    """Validate the composed plan; returns the measured budget dict.

    - ``max_exchanges``: shuffle ceiling for the whole pipeline (None = just
      report). A bucketed-input pipeline should pass 0 for its join stage.
    - ``forbid_global_window``: no single-partition window anywhere.
    - ``forbid_python_rows``: no row-at-a-time Python eval in the plan
      (BatchEvalPython); Arrow-batched pandas ops are allowed.
    """
    p = physical_plan(df)
    n_ex = count_exchanges(df)
    report = {
        "label": label,
        "exchanges": n_ex,
        "global_window": has_global_window(df),
        "python_row_eval": "BatchEvalPython" in p,
    }
    if forbid_global_window and report["global_window"]:
        raise PlanBudgetError(
            f"[{label}] plan contains a single-partition window — this shape "
            "serializes the whole dataset through one task at scale"
        )
    if forbid_python_rows and report["python_row_eval"]:
        raise PlanBudgetError(
            f"[{label}] plan contains row-at-a-time Python evaluation "
            "(BatchEvalPython) — use native exprs or Arrow-batched pandas"
        )
    if max_exchanges is not None and n_ex > max_exchanges:
        raise PlanBudgetError(
            f"[{label}] plan has {n_ex} shuffle exchanges, budget is "
            f"{max_exchanges}:\n{p[:4000]}"
        )
    return report

"""Capture .explain("formatted") for declared queries (guide §1/§7.2).

Usage:
    python tools/capture_plans.py <out_dir> <suffix> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` with the formatted physical plan
for each named query (default: the bench HEADLINE set) and prints a one-line
plan census per query: Exchange count, join strategies, Python-eval nodes,
whether the scan carries PushedFilters.

These files are the judge-facing evidence for plan-shape claims in
OPTIMIZATION_r*.md — capture a _before set at round start and an _after set
for every query touched.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_census(plan: str) -> dict[str, object]:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan))
        - len(re.findall(r"\bReusedExchange\b", plan)),
        "reused_exchanges": len(re.findall(r"\bReusedExchange\b", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "window": len(re.findall(r"\bWindow\b", plan)),
        "sort": len(re.findall(r"\bSort\b", plan)),
        "python": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
        ),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
    }


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from bench import HEADLINE
    from cehrbert_data_spark.queries import all_queries
    from cehrbert_data_spark.session import build_session

    names = sys.argv[3:] or HEADLINE
    qs = all_queries()
    spark = build_session("capture_plans")
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: unknown query")
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — census every query we can
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        census = plan_census(plan)
        print(f"{name}: " + " ".join(f"{k}={v}" for k, v in census.items()))


if __name__ == "__main__":
    main()

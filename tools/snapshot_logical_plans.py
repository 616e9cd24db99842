"""Normalized analyzed+optimized plan snapshot for ALL declared queries.

The equivalence harness for expression-level refactors (the r11 RPC
passes): run once before a change and once after, then diff the output
directories — a refactor that claims "identical plan" must produce
byte-identical files (expression ids, uuids and cache-relation tags are
normalized away; genuine plan changes are not).

Usage: python tools/snapshot_logical_plans.py <out_dir> [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_EXPR_ID = re.compile(r"#\d+")
_UUID = re.compile(r"[0-9a-f]{8}-?[0-9a-f]{4}-?[0-9a-f]{4}-?[0-9a-f]{4}-?[0-9a-f]{12}")
_HEX32 = re.compile(r"[0-9a-f]{32}")
_LAMBDA = re.compile(r"lambda [a-z_0-9]+")


def normalize(plan: str) -> str:
    # Renumber expression ids in first-appearance order so equal trees with
    # different id allocations compare equal.
    seen: dict[str, str] = {}

    def sub(m: re.Match[str]) -> str:
        k = m.group(0)
        if k not in seen:
            seen[k] = f"#{len(seen)}"
        return seen[k]

    plan = _EXPR_ID.sub(sub, plan)
    plan = _UUID.sub("<uuid>", plan)
    plan = _HEX32.sub("<hex32>", plan)
    plan = _LAMBDA.sub("lambda <x>", plan)
    return plan


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(out_dir, exist_ok=True)

    from cehrbert_data_spark.queries import all_queries
    from cehrbert_data_spark.session import build_session

    qs = all_queries()
    names = sys.argv[2:] or sorted(qs)
    # Full-fidelity plan strings: default maxToStringFields truncates wide
    # projections, which would hide (or fake) diffs.
    spark = build_session(
        "snapshot_plans",
        extra_confs={"spark.sql.debug.maxToStringFields": "100000"},
    )
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            qe = df._jdf.queryExecution()
            text = (
                "== analyzed ==\n"
                + normalize(qe.analyzed().toString())
                + "\n== optimized ==\n"
                + normalize(qe.optimizedPlan().toString())
            )
        except Exception as exc:  # noqa: BLE001 — record, keep snapshotting
            text = f"ERROR {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(text)
        print(name, "ok" if not text.startswith("ERROR") else text[:80])


if __name__ == "__main__":
    main()

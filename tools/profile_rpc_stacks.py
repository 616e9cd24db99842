"""Py4J round-trip attribution: which repo call sites burn the RPCs.

For each named query, counts gateway send_command calls during the build
and attributes each to the innermost repo frame (cehrbert_data_spark/ or
queries file) on the stack. Prints the top sites per query.

Usage: python tools/profile_rpc_stacks.py <query> [...]
"""

from __future__ import annotations

import os
import sys
import traceback
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import py4j.java_gateway as jg

    from bench import HEADLINE
    from cehrbert_data_spark.queries import all_queries
    from cehrbert_data_spark.session import build_session

    names = sys.argv[1:] or HEADLINE
    qs = all_queries()
    spark = build_session("profile_rpc_stacks")

    sites: Counter[str] = Counter()
    active = {"on": False}
    orig = jg.GatewayClient.send_command

    def counted(self, *a, **k):
        if active["on"]:
            site = "?"
            for frame in reversed(traceback.extract_stack()):
                fn = frame.filename
                if fn.startswith(REPO) and "/tools/" not in fn:
                    site = f"{os.path.relpath(fn, REPO)}:{frame.lineno} {frame.name}"
                    break
            sites[site] += 1
        return orig(self, *a, **k)

    jg.GatewayClient.send_command = counted  # type: ignore[method-assign]
    try:
        for name in names:
            fn = qs[name]
            fn(spark, sf_dir)  # warm
            sites.clear()
            active["on"] = True
            fn(spark, sf_dir)
            active["on"] = False
            total = sum(sites.values())
            print(f"== {name}  total={total}")
            for site, n in sites.most_common(14):
                print(f"   {n:5d}  {site}")
    finally:
        jg.GatewayClient.send_command = orig  # type: ignore[method-assign]


if __name__ == "__main__":
    main()

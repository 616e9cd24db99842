"""Py4J round-trip census per headline-query BUILD (guide §1 / §4: the
Python-JVM boundary). Counts gateway `send_command` calls during
fn(spark, sf_dir) — pure DataFrame construction, no action — and during
the forcing-wrapper construction. Deterministic, load-insensitive.

Usage: python tools/profile_rpc.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import py4j.java_gateway as jg
    from pyspark.sql import functions as F

    from bench import HEADLINE
    from cehrbert_data_spark.queries import all_queries
    from cehrbert_data_spark.session import build_session

    names = sys.argv[1:] or HEADLINE
    qs = all_queries()
    spark = build_session("profile_rpc")

    counter = {"n": 0}
    orig = jg.GatewayClient.send_command

    def counted(self, *a, **k):
        counter["n"] += 1
        return orig(self, *a, **k)

    jg.GatewayClient.send_command = counted  # type: ignore[method-assign]
    try:
        out: dict[str, int] = {}
        for name in names:
            fn = qs[name]
            fn(spark, sf_dir)  # warm: schema cache, imports
            counter["n"] = 0
            df = fn(spark, sf_dir)
            build = counter["n"]
            df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h"))
            total = counter["n"]
            print(f"{name:24s} build_rpc={build:5d} +force={total - build:4d}")
            out[name] = build
        print(json.dumps(out))
    finally:
        jg.GatewayClient.send_command = orig  # type: ignore[method-assign]


if __name__ == "__main__":
    main()

"""Shape checks for the scale-sweep tooling registries.

The 10,000x sweep (tools/sweep_10000x.py) compares engines through
hand-declared canonical serializations; a query added to its QUERIES list
without a canon (or pointing at a name the query modules no longer export)
would fail only at the multi-hour run's launch. Pin the wiring here so it
breaks in CI instead.
"""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_sweep():
    spec = importlib.util.spec_from_file_location(
        "sweep_10000x", os.path.join(REPO, "tools", "sweep_10000x.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sweep_10000x_queries_have_canons_and_resolve(spark):
    # spark fixture: building F.col Columns needs an active context
    sweep = _load_sweep()
    from cehrbert_data_spark.queries import checksums, graph, llm, relational

    registry = {}
    for m in (graph, relational, llm, checksums):
        registry.update(m.QUERIES)
    for name in sweep.QUERIES:
        assert name in sweep.CANON_SPARK, f"{name}: no Spark canon"
        assert name in sweep.CANON_SQL, f"{name}: no SQL canon"
        assert name in registry, f"{name}: not in any query module registry"
        fn, oracle_sql = registry[name]
        assert callable(fn) and isinstance(oracle_sql, str)
        # canon arity: the Spark and SQL serializations must cover the
        # same number of columns or the folds hash different tuples.
        assert len(sweep.CANON_SPARK[name]()) == len(sweep.CANON_SQL[name])


def test_sweep_cs_canon_is_the_fold_triple():
    sweep = _load_sweep()
    for name in sweep.QUERIES:
        if name.startswith("cs_"):
            assert sweep.CANON_SQL[name] == ["n_rows", "xor_h", "sum_h"]

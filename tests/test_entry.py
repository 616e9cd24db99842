"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() agree."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_smoke(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


def test_query_and_oracle_keys_align():
    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 38
    # Every oracle key must have a query; non-SQL-expressible ops may omit.
    assert set(oracles) <= set(qs)

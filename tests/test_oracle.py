"""The strongest gate: every registry query vs its DuckDB oracle at
sf0.001 (mirrors the driver's CORRECTNESS check; see oracle_harness)."""

from __future__ import annotations

from tests.oracle_harness import run_checks


def test_all_queries_match_oracle(spark, sf0001):
    failures = run_checks(spark, sf0001)
    assert not failures, failures


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 25

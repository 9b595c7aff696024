"""Unit tests for the reference's analytics shapes (A1, W1, O1, O2)."""

from __future__ import annotations

import datetime as dt

from etl_challenge_localiza_spark.operators.analytics import (
    last_sale_per_address,
    region_risk_avg,
    top3_recent_sales,
)

COLS = ["timestamp", "transaction_type", "amount", "receiving_address", "location_region", "risk_score"]


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _df(spark):
    rows = [
        (_ts(1), "sale", 10.0, "a", "north", 4.0),
        (_ts(2), "sale", 20.0, "a", "north", 6.0),   # later sale for a
        (_ts(3), "sale", 30.0, "b", "south", 1.0),
        (_ts(4), "refund", 99.0, "b", "south", 3.0),  # not a sale
        (_ts(5), "sale", 5.0, "c", None, 8.0),        # null region
        (_ts(6), "sale", 7.0, "d", "south", None),    # null risk (avg ignores)
    ]
    return spark.createDataFrame(rows, COLS)


def test_region_risk_avg(spark):
    out = {r["location_region"]: r["avg_risk_score"] for r in region_risk_avg(_df(spark)).collect()}
    assert out == {"north": 5.0, "south": 2.0}  # null region excluded, null risk ignored


def test_region_risk_avg_ordering(spark):
    rows = [r["location_region"] for r in region_risk_avg(_df(spark)).collect()]
    assert rows == ["north", "south"]  # desc by avg (flows/pipeline.py:185)


def test_last_sale_per_address(spark):
    out = {
        r["receiving_address"]: r["amount"]
        for r in last_sale_per_address(_df(spark)).collect()
    }
    # 'a' → its ts=2 sale; refunds never appear
    assert out == {"a": 20.0, "b": 30.0, "c": 5.0, "d": 7.0}


def test_top3(spark):
    ls = last_sale_per_address(_df(spark))
    top = top3_recent_sales(ls, tiebreaker="receiving_address").collect()
    assert [r["amount"] for r in top] == [30.0, 20.0, 7.0]


def test_top3_plans_take_ordered(spark):
    ls = last_sale_per_address(_df(spark))
    plan = top3_recent_sales(ls)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort (SURVEY.md §4.2)


def test_order_window_total_order_invariant(spark, sf0001):
    """order_window_analytics hash-stability rests on the window order
    (o_orderdate, o_orderkey) being a TOTAL order within each o_custkey
    partition — i.e. o_orderkey unique — so row_number/ntile/lag/lead/
    first_value are deterministic and engine-portable (the remaining
    functions, rank/dense_rank/cume_dist over o_orderstatus, are
    tie-invariant by definition). Pin the invariant so a data change
    can't silently flake the oracle."""
    from etl_challenge_localiza_spark.sources.readers import load_table

    orders = load_table(spark, sf0001, "orders")
    n = orders.count()
    assert orders.select("o_orderkey").distinct().count() == n


def test_retention_cohorts_single_fact_exchange(spark, sf0001):
    """The user_id repartition must be the ONLY fact-side shuffle: the
    (user_id, day) distinct and the per-user min both run on it, and
    AQE reuses the exchange for the self-referencing cohort join — so
    the events table is scanned and shuffled once."""
    from etl_challenge_localiza_spark.registry import QUERIES

    df = QUERIES["retention_cohorts"].fn(spark, sf0001)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 1
    # exactly one REPARTITION_BY_COL origin per physical occurrence of
    # the fact subtree (the second occurrence is the reused exchange)
    assert plan.count("REPARTITION_BY_COL") >= 1

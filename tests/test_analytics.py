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


def test_spearman_registry_matches_reference_with_ties(spark, tmp_path):
    """spearman_value_risk vs a from-scratch average-rank Spearman on a
    small constructed events table with deliberate ties."""
    import json

    from etl_challenge_localiza_spark.registry import QUERIES

    xs = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 5.0, 8.0]
    ys = [2.0, 1.0, 4.0, 4.0, 6.0, 9.0, 9.0, 10.0]
    rows = [
        (i, i % 3, f"2024-01-01 0{i}:00:00", x, json.dumps({"k": y}))
        for i, (x, y) in enumerate(zip(xs, ys))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double, props string"
    )
    df = df.withColumn("ts", df["ts"].cast("timestamp_ntz")).withColumn(
        "event_type", df["event_id"].cast("string")
    )
    p = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(p, mode="overwrite")
    import os, shutil

    part = [f for f in os.listdir(p) if f.endswith(".parquet")][0]
    shutil.move(os.path.join(p, part), str(tmp_path / "_events"))
    shutil.rmtree(p)
    shutil.move(str(tmp_path / "_events"), p)

    def avg_ranks(vals):
        s = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(s):
            j = i
            while j < len(s) and vals[s[j]] == vals[s[i]]:
                j += 1
            r = (i + 1 + j) / 2.0  # average of ranks i+1..j
            for t in range(i, j):
                ranks[s[t]] = r
            i = j
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    expected = round(num / den, 9)
    out = QUERIES["spearman_value_risk"].fn(spark, str(tmp_path)).collect()[0]
    assert out["n_obs"] == n
    assert abs(out["spearman_rho"] - expected) < 1e-9


def test_trend_recovers_planted_slope(spark, tmp_path):
    """per_type_value_trend on an exactly linear series returns the
    planted slope and origin value."""
    import json
    from datetime import datetime, timedelta

    origin = datetime(2024, 1, 1)
    rows = []
    for i in range(50):
        ts = origin + timedelta(hours=i)
        value = round(100.0 + 0.5 * i, 2)  # +0.5/hour = +12.0/day
        rows.append((i, 1, ts, "lin", value, json.dumps({"k": 1.0})))
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, event_type string, "
        "value double, props string",
    )
    import os, shutil

    p = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(p, mode="overwrite")
    part = [f for f in os.listdir(p) if f.endswith(".parquet")][0]
    shutil.move(os.path.join(p, part), str(tmp_path / "_e"))
    shutil.rmtree(p)
    shutil.move(str(tmp_path / "_e"), p)

    from etl_challenge_localiza_spark.registry import QUERIES

    out = QUERIES["per_type_value_trend"].fn(spark, str(tmp_path)).collect()[0]
    assert out["n_obs"] == 50
    assert abs(out["slope_per_day"] - 12.0) < 1e-6
    assert abs(out["value_at_origin"] - 100.0) < 1e-6


def test_event_transition_matrix_hand_counts(spark):
    from datetime import datetime

    from etl_challenge_localiza_spark.registry import QUERIES
    import tempfile, os

    rows = [
        # user 1: a -> b -> b -> c ; user 2: a -> c ; tie on ts for user 2
        (1, datetime(2024, 1, 1, 0, 0), 1, "a", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 1), 1, "b", 0.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 2), 1, "b", 0.0, "{}"),
        (4, datetime(2024, 1, 1, 0, 3), 1, "c", 0.0, "{}"),
        (5, datetime(2024, 1, 2, 0, 0), 2, "a", 0.0, "{}"),
        (6, datetime(2024, 1, 2, 0, 0), 2, "c", 0.0, "{}"),  # same ts, id later
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = {
            (r["from_type"], r["to_type"]): (r["n"], r["p"])
            for r in QUERIES["event_transition_matrix"].fn(spark, d).collect()
        }
    assert out[("a", "b")] == (1, 0.5)
    assert out[("a", "c")] == (1, 0.5)  # user 2's tie resolved by event_id
    assert out[("b", "b")] == (1, 0.5)
    assert out[("b", "c")] == (1, 0.5)
    assert len(out) == 4  # no cross-user transition (1's 'c' -> 2's 'a')


def test_chi2_hand_computed_2x2(spark):
    import tempfile, os

    from etl_challenge_localiza_spark.registry import QUERIES

    # 2x2 contingency: lang en/de x source s1/s2, counts 30/10/10/30
    rows = []
    did = 0
    for lang, source, n in [
        ("en", "s1", 30), ("en", "s2", 10), ("de", "s1", 10), ("de", "s2", 30),
    ]:
        for _ in range(n):
            rows.append((did, "t", lang, source, 1))
            did += 1
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        r = QUERIES["chi2_lang_source"].fn(spark, d).first()
    # hand: N=80, all marginals 40, exp=20 per cell, chi2 = 4*(10^2/20) = 20
    assert (r["n_cells"], r["dof"]) == (4, 1)
    assert r["chi2"] == 20.0


def test_user_golden_profile_survivorship_rules(spark):
    import os
    import tempfile
    from datetime import datetime

    from etl_challenge_localiza_spark.registry import QUERIES

    rows = [
        # user 1: props null on the LATEST event -> survivor is the
        # latest NON-NULL; modal type "a" (2 vs 1); tie on ts broken by id
        (1, datetime(2024, 1, 1, 0), 1, "a", 1.00, '{"k": 1}'),
        (2, datetime(2024, 1, 2, 0), 1, "a", 2.00, '{"k": 2}'),
        (3, datetime(2024, 1, 3, 0), 1, "b", 4.00, None),
        # user 2: modal tie a/b resolved by name; all props null
        (4, datetime(2024, 1, 1, 0), 2, "b", 1.50, None),
        (5, datetime(2024, 1, 1, 0), 2, "a", 2.50, None),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["user_id"]: r for r in QUERIES["user_golden_profile"].fn(spark, d).collect()}
    u1 = out[1]
    assert u1["latest_props"] == '{"k": 2}'  # latest non-null, not the null
    assert u1["top_event_type"] == "a" and u1["n_events"] == 3
    assert u1["total_value"] == 7.0
    u2 = out[2]
    assert u2["top_event_type"] == "a"  # 1-1 tie -> name order
    assert u2["latest_props"] is None  # no non-null props anywhere


def test_user_recent_event_arrays_order(spark):
    import os
    import tempfile
    from datetime import datetime

    from etl_challenge_localiza_spark.registry import QUERIES

    rows = [
        (1, datetime(2024, 1, 1), 1, "a", 1.0, "{}"),
        (2, datetime(2024, 1, 2), 1, "b", 2.0, "{}"),
        (3, datetime(2024, 1, 3), 1, "c", 3.0, "{}"),
        (4, datetime(2024, 1, 4), 1, "d", 4.0, "{}"),
        (5, datetime(2024, 1, 1), 2, "x", 9.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["user_id"]: r for r in QUERIES["user_recent_event_arrays"].fn(spark, d).collect()}
    u1 = out[1]
    assert u1["recent_types"] == "d,c,b"  # newest first, capped at 3
    assert (u1["v1"], u1["v2"], u1["v3"]) == (4.0, 3.0, 2.0)
    u2 = out[2]
    assert u2["recent_types"] == "x" and u2["v2"] is None and u2["v3"] is None


def test_multi_touch_attribution_conserves_credit(spark):
    import os
    import tempfile
    from datetime import datetime

    from etl_challenge_localiza_spark.registry import QUERIES

    rows = [
        # user 1: click + view in lookback, purchase 100 -> 50/50 split
        (1, datetime(2024, 1, 1, 10), 1, "click", 0.0, "{}"),
        (2, datetime(2024, 1, 2, 10), 1, "view", 0.0, "{}"),
        (3, datetime(2024, 1, 3, 10), 1, "purchase", 100.0, "{}"),
        # user 2: touch OUTSIDE the 3-day lookback -> direct conversion
        (4, datetime(2024, 1, 1, 0), 2, "click", 0.0, "{}"),
        (5, datetime(2024, 1, 10, 0), 2, "purchase", 40.0, "{}"),
        # user 3: touch AFTER the purchase does not count
        (6, datetime(2024, 1, 5, 0), 3, "purchase", 7.0, "{}"),
        (7, datetime(2024, 1, 5, 1), 3, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = {
            r["channel"]: r
            for r in QUERIES["attribution_multi_touch"].fn(spark, d).collect()
        }
    assert out["click"]["credit_total"] == 50.0
    assert out["view"]["credit_total"] == 50.0
    assert out["(direct)"]["n_conversions"] == 2  # users 2 and 3
    assert out["(direct)"]["credit_total"] == 47.0
    # credit conservation: attributed + direct == total purchase value
    assert sum(r["credit_total"] for r in out.values()) == 147.0


def test_cohort_ltv_hand_case(spark):
    import os
    import tempfile
    from datetime import datetime

    from etl_challenge_localiza_spark.registry import QUERIES

    # cohort A: users 1,2 first seen week of Jan 1 (Mon);
    # user 1 purchases 10 in week 0 and 30 in week 1; user 2 never buys.
    # cohort B: user 3 first seen week of Jan 8, buys 8 in week 0.
    rows = [
        (1, datetime(2024, 1, 1), 1, "purchase", 10.0, "{}"),
        (2, datetime(2024, 1, 2), 2, "view", 0.0, "{}"),
        (3, datetime(2024, 1, 9), 1, "purchase", 30.0, "{}"),
        (4, datetime(2024, 1, 8), 3, "purchase", 8.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = {
            (r["cohort_week"].day, r["age_week"]): r
            for r in QUERIES["cohort_ltv_curves"].fn(spark, d).collect()
        }
    a0, a1 = out[(1, 0)], out[(1, 1)]
    assert a0["n_active"] == 2 and a0["revenue"] == 10.0
    assert a1["n_active"] == 1 and a1["revenue"] == 30.0
    assert a1["cum_revenue"] == 40.0 and a1["ltv_per_user"] == 20.0  # / 2 users
    b0 = out[(8, 0)]
    assert b0["n_active"] == 1 and b0["ltv_per_user"] == 8.0


def test_argmax_agg_equals_window_form(spark):
    from etl_challenge_localiza_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    via_agg = {
        r["o_custkey"]: (r["o_orderkey"], r["o_totalprice"])
        for r in QUERIES["latest_order_argmax_agg"].fn(spark, sf).collect()
    }
    via_window = {
        r["o_custkey"]: (r["o_orderkey"], r["o_totalprice"])
        for r in QUERIES["latest_order_per_customer"].fn(spark, sf).collect()
    }
    assert via_agg == via_window  # two plans, one semantics


def test_funnel_latency_carry_and_ties(spark):
    import os
    import tempfile
    from datetime import datetime

    from etl_challenge_localiza_spark.registry import QUERIES

    rows = [
        # user 1: click at t0, purchase 1h later; second click never converts
        (1, datetime(2024, 1, 1, 0), 1, "click", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 1), 1, "purchase", 5.0, "{}"),
        (3, datetime(2024, 1, 1, 2), 1, "click", 0.0, "{}"),
        # user 2: purchase at the SAME instant as the click counts (latency 0)
        (4, datetime(2024, 1, 2, 0), 2, "click", 0.0, "{}"),
        (5, datetime(2024, 1, 2, 0), 2, "purchase", 1.0, "{}"),
        # user 3: purchase BEFORE the click does not count
        (6, datetime(2024, 1, 3, 0), 3, "purchase", 1.0, "{}"),
        (7, datetime(2024, 1, 3, 1), 3, "click", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        r = QUERIES["funnel_latency_percentiles"].fn(spark, d).first()
    assert r["n_clicks"] == 4
    assert r["n_converted_clicks"] == 2  # user1 first click + user2 tie
    assert r["max_us"] == 3600 * 1_000_000
    assert r["p50_us"] == 1800 * 1_000_000.0  # interpolated between 0 and 1h


def test_weighted_median_separates_from_plain_on_long_tail(spark):
    import os
    import tempfile

    from etl_challenge_localiza_spark.registry import QUERIES

    # 9 docs of 10 chars + 1 doc of 910 chars: plain median 10, but
    # 90% of the VOLUME is in the big doc -> weighted median 910
    rows = [(i, "t", "en", "s", 10) for i in range(9)] + [(9, "t", "en", "s", 910)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        r = QUERIES["weighted_median_doc_size"].fn(spark, d).first()
    assert r["plain_median_chars"] == 10.0
    assert r["weighted_median_chars"] == 910
    assert r["total_chars"] == 1000 and r["n_docs"] == 10


def test_ab_ztest_hand_computed(spark):
    import os
    import tempfile
    from datetime import datetime
    from math import sqrt

    from etl_challenge_localiza_spark.registry import QUERIES

    # variant 0 (even users): 10 users, 2 convert; variant 1: 10 users, 6
    rows = []
    eid = 0
    for u in range(20):
        converts = (u % 2 == 0 and u < 4) or (u % 2 == 1 and u < 12)
        rows.append((eid, datetime(2024, 1, 1), u, "view", 0.0, "{}")); eid += 1
        if converts:
            rows.append((eid, datetime(2024, 1, 2), u, "purchase", 1.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        r = QUERIES["ab_test_conversion_ztest"].fn(spark, d).first()
    assert (r["n0"], r["c0"], r["n1"], r["c1"]) == (10, 2, 10, 6)
    p = 8 / 20
    z = (0.6 - 0.2) / sqrt(p * (1 - p) * (1 / 10 + 1 / 10))
    assert r["z_stat"] == round(z, 6)
    assert abs(r["z_stat"]) > 1.645  # directionally significant at 10%


def test_pareto_boundary_and_paths(spark):
    import os
    import tempfile
    from datetime import datetime

    from etl_challenge_localiza_spark.registry import QUERIES

    rows = []
    eid = 0
    # revenue 80/10/10: user 1 is exactly the 80% boundary
    for u, v in [(1, 80.0), (2, 10.0), (3, 10.0)]:
        rows.append((eid, datetime(2024, 1, 1), u, "purchase", v, "{}")); eid += 1
    # a fixed 3-step journey for user 9: a>b>c twice (overlapping windows)
    for i, t in enumerate(["a", "b", "c", "b", "c"]):
        rows.append((eid, datetime(2024, 1, 2, i), 9, t, 0.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        pareto = QUERIES["pareto_user_revenue"].fn(spark, d).collect()
        paths = {
            r["path"]: r["n"]
            for r in QUERIES["top_event_paths"].fn(spark, d).collect()
        }
    boundary = [r for r in pareto if r["is_p80_boundary"]]
    assert len(boundary) == 1 and boundary[0]["user_id"] == 1
    assert boundary[0]["cum_share"] == 0.8
    assert paths["a>b>c"] == 1 and paths["b>c>b"] == 1 and paths["c>b>c"] == 1


def test_rfm_quintile_orientation_and_segments(spark):
    import os
    import tempfile
    from datetime import datetime

    from etl_challenge_localiza_spark.registry import QUERIES

    rows = []
    eid = 0
    # user 1: recent + frequent + big spender -> champion
    for d in (25, 26, 27, 28):
        rows.append((eid, datetime(2024, 1, d), 1, "purchase", 100.0, "{}")); eid += 1
    # users 2-4: middling singles mid-month
    for u in (2, 3, 4):
        rows.append((eid, datetime(2024, 1, 15), u, "purchase", 10.0, "{}")); eid += 1
    # user 5: one old tiny purchase -> lapsed
    rows.append((eid, datetime(2024, 1, 1), 5, "purchase", 1.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["user_id"]: r for r in QUERIES["rfm_segments"].fn(spark, d).collect()}
    assert out[1]["segment"] == "champion"
    assert (out[1]["r_q"], out[1]["f_q"], out[1]["m_q"]) == (1, 1, 1)
    assert out[5]["segment"] == "lapsed" and out[5]["r_q"] == 5

"""Unit tests for the custom as-of join and sessionization operators."""

from __future__ import annotations

import datetime as dt

from etl_challenge_localiza_spark.operators.asof import asof_join
from etl_challenge_localiza_spark.operators.sessions import sessionize


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_inclusive_and_latest(spark):
    probes = spark.createDataFrame(
        [(1, "k", _t(5)), (2, "k", _t(10)), (3, "k", _t(0))], ["pid", "key", "pt"]
    )
    states = spark.createDataFrame(
        [("k", _t(5), "at5"), ("k", _t(8), "at8"), ("k", _t(1), "at1")],
        ["skey", "st", "val"],
    )
    out = {
        r["pid"]: r["val"]
        for r in asof_join(
            probes, states, "key", "skey", "pt", "st", ["val"], how="inner"
        ).collect()
    }
    # pid=1 at t=5: state at exactly 5 wins (inclusive <=)
    # pid=2 at t=10: latest prior state is at8; pid=3 at t=0: no state → dropped
    assert out == {1: "at5", 2: "at8"}


def test_asof_left_keeps_unmatched(spark):
    probes = spark.createDataFrame([(1, "k", _t(0))], ["pid", "key", "pt"])
    states = spark.createDataFrame([("k", _t(5), "late")], ["skey", "st", "val"])
    rows = asof_join(probes, states, "key", "skey", "pt", "st", ["val"], how="left").collect()
    assert len(rows) == 1 and rows[0]["val"] is None


def test_sessionize_gap_splits(spark):
    rows = [
        (1, 10, _t(0)), (2, 10, _t(10)),          # session 1 (gap 10 < 30)
        (3, 10, _t(50)),                           # gap 40 → session 2
        (4, 20, _t(0)),                            # other user → own session
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_s"])
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert out == {(10, 1): (2, 600.0), (10, 2): (1, 0.0), (20, 1): (1, 0.0)}

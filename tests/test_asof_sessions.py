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


def test_asof_nearest_direction_and_ties(spark):
    """Nearest-match as-of: forward when no prior state, backward on
    smaller gap, BACKWARD on exact tie, exact-time match gap 0, and
    keys with no state drop (inner)."""
    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.operators.asof import asof_nearest_join

    left = spark.createDataFrame(
        [(1, 10), (1, 55), (1, 75), (1, 100), (2, 5)], ["k", "t"]
    )
    right = spark.createDataFrame(
        [(1, 50, "a"), (1, 100, "b"), (3, 1, "z")], ["k", "rt", "v"]
    )
    out = {
        r["t"]: (r["v"], r["direction"], r["gap"])
        for r in asof_nearest_join(left, right, "k", "k", "t", "rt", ["v"]).collect()
    }
    assert out[10] == ("a", "forward", 40)  # no prior state
    assert out[55] == ("a", "backward", 5)  # 5 back vs 45 forward
    assert out[75] == ("a", "backward", 25)  # exact tie 25/25 -> backward
    assert out[100] == ("b", "backward", 0)  # exact-time match
    assert len(out) == 4  # key 2 dropped (no state)


def test_interval_coactivity_matches_direct_join(spark):
    """The hour-bin bucketed overlap join must equal the direct
    quadratic overlap join — completeness (overlapping intervals share
    max(s1,s2)'s hour) and the multi-bin DISTINCT dedup."""
    import itertools

    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.operators.sessions import (
        interval_coactivity_pairs,
    )

    rows = []
    eid = 0
    # day 1: u1 [1:00, 5:00], u2 [4:30, 6:00] (overlap, 2 shared bins),
    # u3 [7:00, 8:00] (no overlap with u1/u2)
    for u, times in [
        (1, ["01:00", "05:00"]),
        (2, ["04:30", "06:00"]),
        (3, ["07:00", "08:00"]),
    ]:
        for hm in times:
            rows.append((eid, f"2024-01-01 {hm}:00", u, "purchase", 1.0))
            eid += 1
    # day 2: u1 [1:00, 1:10], u2 [1:05, 1:20] overlap within ONE bin;
    # u4 has only one event -> excluded by min_events
    for u, times in [(1, ["01:00", "01:10"]), (2, ["01:05", "01:20"]), (4, ["01:07"])]:
        for hm in times:
            rows.append((eid, f"2024-01-02 {hm}:00", u, "purchase", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["day"].isoformat(): r["n_pairs"]
        for r in interval_coactivity_pairs(ev).collect()
    }
    assert got == {"2024-01-01": 1, "2024-01-02": 1}


def test_nucleus_subset_exact_half_and_top_row(spark):
    """2*cum <= total exact-integer rule, plus the always-keep-top-row
    guarantee when the heaviest row alone exceeds half."""
    from etl_challenge_localiza_spark.operators.curation import (
        nucleus_subset_by_group,
    )

    df = spark.createDataFrame(
        [("a", 1, 60), ("a", 2, 30), ("a", 3, 10),  # total 100: keep 60? 2*60>100 -> top-row rule
         ("b", 4, 25), ("b", 5, 25), ("b", 6, 50)],  # total 100: 50, then 50+25=75 -> 2*75>100
        ["g", "id", "w"],
    )
    out = {r["id"]: r["kept"] for r in nucleus_subset_by_group(df, "g", "w", "id").collect()}
    assert out == {1: True, 2: False, 3: False, 4: False, 5: False, 6: True}


def test_auto_bin_us_rule():
    """The shared bin-width rule for bucketized interval joins
    (operators/rangejoin.py:auto_bin_us): candidate-volume face
    (never below the interval length), parallelism face (occupied
    keys >= shuffle width), high-cardinality-key degenerate case, and
    the conflict -> salt handoff."""
    from etl_challenge_localiza_spark.operators.rangejoin import (
        auto_bin_us,
        salt_for_bin,
    )

    DAY = 86_400_000_000
    # Short calendar: 2-day span, 10-min median intervals, width 32.
    # Parallelism face wins: bin = span/32 = 5400 s, and the chosen
    # bin count (span // bin) must be >= the shuffle width.
    bin_us = auto_bin_us(600_000_000, 2 * DAY, 32, n_coarse_keys=1)
    assert bin_us == 2 * DAY // 32
    assert (2 * DAY) // bin_us >= 32  # the directive's floor assertion
    assert salt_for_bin(bin_us, 2 * DAY, 32) == 1  # floor met -> no-op

    # Long calendar, long intervals: candidate face wins (bin = median
    # interval), floor still met because span/bin >= width.
    bin_us = auto_bin_us(7 * 3600 * 1_000_000, 30 * DAY, 32, n_coarse_keys=1)
    assert bin_us == (1 * 30 * DAY) // 32  # 22.5 h > 7 h median
    assert (30 * DAY) // bin_us >= 32

    # High-cardinality join key (user-keyed range joins): no floor
    # needed, rule degenerates to exactly the interval length.
    assert auto_bin_us(1_800_000_000, n_coarse_keys=None) == 1_800_000_000

    # Conflict: 1-day intervals on a 2-day calendar, width 32. The
    # candidate face keeps bin = interval; the salt restores the floor
    # (occupied keys ~2, so S = ceil(32/2) = 16).
    bin_us = auto_bin_us(DAY, 2 * DAY, 32, n_coarse_keys=1)
    assert bin_us == DAY
    assert salt_for_bin(bin_us, 2 * DAY, 32) == 16


def test_interval_coactivity_salted_matches_unsalted(spark):
    """Salting the (day, bin) key is a pure plan knob: explicit
    salt=4 with narrow bins must produce the identical (day, n_pairs)
    answer as the unsalted auto path — every true pair still meets at
    salt = hash(u1) % S, and DISTINCT dedups multi-bin meetings."""
    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.operators.sessions import (
        interval_coactivity_pairs,
    )

    rows, eid = [], 0
    for u, times in [
        (1, ["01:00", "05:00"]),
        (2, ["04:30", "06:00"]),
        (3, ["05:30", "07:00"]),
        (4, ["22:00", "23:00"]),
    ]:
        for hm in times:
            rows.append((eid, f"2024-03-01 {hm}:00", u, "purchase", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def as_dict(df):
        return {r["day"].isoformat(): r["n_pairs"] for r in df.collect()}

    auto = as_dict(interval_coactivity_pairs(ev))
    salted = as_dict(
        interval_coactivity_pairs(ev, bin_us=1_800_000_000, salt=4)
    )
    # u1-u2 overlap, u1-u3 overlap (5:00 vs 5:30-7? u1 ends 05:00,
    # u3 starts 05:30 -> disjoint), u2-u3 overlap, u4 disjoint.
    assert auto == {"2024-03-01": 2}
    assert salted == auto


def test_derive_interval_stats(spark):
    """Runtime stats feeding auto_bin_us: median interval length and
    total span in exact integer microseconds."""
    from etl_challenge_localiza_spark.operators.rangejoin import (
        derive_interval_stats,
    )

    iv = spark.createDataFrame(
        [(0, 100), (50, 250), (1000, 1300)], ["s", "e"]
    )
    med, span = derive_interval_stats(iv, "s", "e")
    assert med == 200  # lengths 100/200/300
    assert span == 1300


def test_asof_duplicate_time_rows_resolve_deterministically(spark):
    """ADVICE r10: right rows sharing (key, time) must resolve
    deterministically — both as-of variants carry the GREATEST payload
    tuple among intra-time duplicates (the windows' trailing __payload
    sort key), never a partition-order-dependent pick."""
    from etl_challenge_localiza_spark.operators.asof import (
        asof_join,
        asof_nearest_join,
    )

    probes = spark.createDataFrame([(1, "k", _t(10))], ["pid", "key", "pt"])
    dup_states = [("k", _t(5), v) for v in ("m", "a", "z", "b")]
    for _ in range(3):  # repartition shuffles arrival order between runs
        states = spark.createDataFrame(dup_states, ["skey", "st", "val"]).repartition(7)
        rows = asof_join(
            probes, states, "key", "skey", "pt", "st", ["val"], how="inner"
        ).collect()
        assert [r["val"] for r in rows] == ["z"]

    left = spark.createDataFrame([(1, 10)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 8, "m"), (1, 8, "z"), (1, 8, "a")], ["k", "rt", "v"]
    ).repartition(5)
    out = asof_nearest_join(left, right, "k", "k", "t", "rt", ["v"]).collect()
    assert len(out) == 1 and out[0]["v"] == "z" and out[0]["gap"] == 2

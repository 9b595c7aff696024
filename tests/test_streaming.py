"""Streaming tests: the windowed stream must equal its batch analog."""

from __future__ import annotations

from etl_challenge_localiza_spark.registry import QUERIES
from etl_challenge_localiza_spark.streaming.events_stream import (
    hourly_stream_with_watermark,
    run_streaming_hourly,
)


def test_streaming_equals_batch(spark, sf0001):
    stream = run_streaming_hourly(spark, sf0001).toPandas()
    batch = QUERIES["events_hourly"].fn(spark, sf0001).toPandas()
    key = ["hour_start", "event_type"]
    s = stream.sort_values(key).reset_index(drop=True)[batch.columns]
    b = batch.sort_values(key).reset_index(drop=True)
    assert s.equals(b)


def test_watermark_stream_builds_and_is_streaming(spark, sf0001):
    df = hourly_stream_with_watermark(spark, sf0001)
    assert df.isStreaming
    assert set(df.columns) == {"hour_start", "event_type", "n_events", "sum_value"}


def test_watermark_drops_late_data(spark, tmp_path):
    """Drive the append-mode watermark stream over two micro-batches:
    an event later than (max event time − watermark) must be dropped,
    and closed windows must emit exactly once."""
    import datetime as dt

    from pyspark.sql import functions as F

    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")

    def ev(eid, hour, minute):
        return (eid, dt.datetime(2024, 1, 1, hour, minute), 1, "click", 1.0, "{}")

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    batch1 = spark.createDataFrame([ev(1, 0, 10), ev(2, 0, 20), ev(3, 6, 0)], cols)
    batch2 = spark.createDataFrame([ev(4, 0, 30), ev(5, 6, 30)], cols)

    sink = str(tmp_path / "sink")

    def run_batch(df, run_id):
        # each availableNow run processes only files not yet committed
        # to the shared checkpoint → deterministic micro-batch split;
        # the parquet file sink supports checkpoint recovery.
        df.coalesce(1).write.parquet(f"{src}/run{run_id}")
        stream = (
            spark.readStream.schema(df.schema)
            .parquet(src + "/run*")
            .withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch(batch1, 1)
    run_batch(batch2, 2)
    out = {r["ws"].hour: r["n"] for r in spark.read.parquet(sink).collect()}
    # batch1 advances the watermark to 06:00−2h = 04:00, closing the
    # 00:00 window with its 2 on-time events; batch2's event_id=4
    # (00:30) is behind the watermark → dropped, never re-emitted.
    assert out.get(0) == 2, out
    # the 06:00 window stays open at end-of-input (within watermark) —
    # correct append semantics: absent, not lost.
    assert 6 not in out


def test_stream_stream_interval_join_two_sources(spark, sf0001):
    """The stream-stream join must equal the batch range join on the
    same finite input (registry oracle shape)."""
    from etl_challenge_localiza_spark.registry import QUERIES

    stream = QUERIES["streaming_interval_join"].fn(spark, sf0001)
    got = {(r["click_id"], r["purchase_id"]) for r in stream.collect()}
    con_pairs = set()
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '/root/testdata/sf0.001/events.parquet'"
    )
    for a, b in con.execute(QUERIES["streaming_interval_join"].oracle).fetchall():
        con_pairs.add((a, b))
    con.close()
    assert got == con_pairs
    assert got, "expected at least one click→purchase pair in the fixture"


def test_stream_stream_join_matches_across_micro_batches(spark, tmp_path):
    """Two genuinely separate file-stream sources, with the matching
    purchase arriving in a LATER micro-batch than its click: the join
    state must hold the click until the purchase arrives."""
    import datetime as dt

    from etl_challenge_localiza_spark.streaming.events_stream import (
        interval_join_streams,
    )

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    t0 = dt.datetime(2024, 1, 1, 12, 0)

    click_src = str(tmp_path / "clicks")
    buy_src = str(tmp_path / "purchases")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    clicks1 = spark.createDataFrame(
        [(1, t0, 7, "click", 1.0, "{}"), (2, t0, 8, "click", 1.0, "{}")], cols
    )
    buys1 = spark.createDataFrame(
        [(10, t0 + dt.timedelta(minutes=10), 7, "purchase", 5.0, "{}")], cols
    )
    # arrives one micro-batch later; still inside user 8's 30-min window
    buys2 = spark.createDataFrame(
        [
            (11, t0 + dt.timedelta(minutes=20), 8, "purchase", 5.0, "{}"),
            # outside the window → must NOT match
            (12, t0 + dt.timedelta(minutes=45), 7, "purchase", 5.0, "{}"),
        ],
        cols,
    )

    def run(run_id, click_df=None, buy_df=None):
        if click_df is not None:
            click_df.coalesce(1).write.parquet(f"{click_src}/run{run_id}")
        if buy_df is not None:
            buy_df.coalesce(1).write.parquet(f"{buy_src}/run{run_id}")
        schema = clicks1.schema
        c = spark.readStream.schema(schema).parquet(click_src + "/run*")
        p = spark.readStream.schema(schema).parquet(buy_src + "/run*")
        q = (
            interval_join_streams(c, p, window_minutes=30)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run(1, clicks1, buys1)
    run(2, None, buys2)
    got = {
        (r["click_id"], r["purchase_id"]) for r in spark.read.parquet(sink).collect()
    }
    assert got == {(1, 10), (2, 11)}, got


def test_foreachbatch_upsert_converges_regardless_of_batch_order(spark):
    """merge_latest keeps each key's (ts, event_id) argmax, so applying
    micro-batches in ANY order yields the same table."""
    import datetime as dt

    from etl_challenge_localiza_spark.streaming.upsert import apply_latest_batch

    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10, t + dt.timedelta(hours=2), "click", 1.0),  # latest for user 1
        (1, 11, t, "view", 2.0),
        (2, 12, t, "click", 3.0),
        (2, 13, t, "view", 4.0),  # same ts: event_id breaks the tie
    ]

    def run(order):
        target = None
        for batch_rows in order:
            target = apply_latest_batch(
                target, spark.createDataFrame(batch_rows, cols)
            )
        return sorted(target.collect())

    fwd = run([[rows[0], rows[2]], [rows[1], rows[3]]])
    rev = run([[rows[1], rows[3]], [rows[0], rows[2]]])
    assert fwd == rev
    final = {r["user_id"]: r["event_id"] for r in fwd}
    assert final == {1: 10, 2: 13}

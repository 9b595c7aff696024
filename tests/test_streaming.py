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

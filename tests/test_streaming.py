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

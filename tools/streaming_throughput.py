"""Structured Streaming throughput at the clone tiers (round 9).

The streaming family's correctness is oracle-checked at sf0.001/0.01;
this tool measures its THROUGHPUT: replay a tier's events table
through the production-shape watermarked hourly aggregate (append
mode, availableNow trigger, noop sink) and report rows/second of
end-to-end micro-batch processing — state store, watermark tracking,
and shuffle included. ``maxFilesPerTrigger`` pins the micro-batch
cadence so the run exercises the incremental path (many batches), not
one degenerate batch.

Usage: python -m tools.streaming_throughput [--factor 30] [--files-per-trigger 4]
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid


def main() -> int:
    factor = 30
    fpt = 4
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--factor":
            factor = int(args.pop(0))
        elif a == "--files-per-trigger":
            fpt = int(args.pop(0))

    from etl_challenge_localiza_spark.session import get_spark
    from etl_challenge_localiza_spark.sources.readers import load_table
    from etl_challenge_localiza_spark.streaming.events_stream import _event_stream
    from tools.sf1_bench import build_sf1

    spark = get_spark(app_name="streaming_throughput")
    if factor == 1:
        sf_dir = "/root/testdata/sf0.1"
    else:
        sf_dir = build_sf1(spark, factor, out_name="sf1" if factor == 10 else f"allx{factor}")
    n_rows = load_table(spark, sf_dir, "events").count()

    from pyspark.sql import functions as F

    # the production shape of streaming.events_stream.
    # hourly_stream_with_watermark, re-wired with a pinned micro-batch
    # cadence so many incremental batches run
    stream = _event_stream(
        spark, sf_dir, options={"maxFilesPerTrigger": str(fpt)}
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
    )
    ckpt = f"/tmp/stream_tp_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    q = (
        agg.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(1800)
    wall = time.perf_counter() - t0
    n_batches = len(
        [p for p in os.listdir(os.path.join(ckpt, "commits")) if not p.startswith(".")]
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    assert finished, "stream did not drain within 30 min"
    print(
        f"| x{factor} | {n_rows} rows | {n_batches} micro-batches "
        f"(maxFilesPerTrigger={fpt}) | {wall:.1f} s | "
        f"{n_rows / wall:,.0f} rows/s |"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Scaled timing for the NUMERIC-EPOCH branch of the clean pipeline
(VERDICT r8 directive #8, observation #2: the clone tiers round-trip
``events.ts`` as TIMESTAMP, so P5-P7 — epoch-unit detection by median
magnitude + unit-correct parse — had only sf0.1/pytest coverage).

Builds the txn mapping from a clone tier's events table but DEGRADES
the timestamp back to a raw int64 epoch (nanoseconds — the unit the
real testdata parquet stores), then times ``clean_transactions``,
whose ``parse_timestamp_auto`` must detect the unit from the data
(one median aggregate over the column) and parse accordingly. The
epoch path's extra cost over the TIMESTAMP path is therefore: one
approx-median job + one integer-division parse per row — both linear
and fully parallel; this tool measures that claim across tiers.

Usage: python -m tools.epoch_clean_scaled [--factors 1,30,100]
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    factors = [1, 30, 100]
    if "--factors" in sys.argv:
        factors = [int(x) for x in sys.argv[sys.argv.index("--factors") + 1].split(",")]

    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.operators.cleaning import clean_transactions
    from etl_challenge_localiza_spark.registry import transactions_from_events
    from etl_challenge_localiza_spark.session import get_spark
    from tools.sf1_bench import build_sf1

    spark = get_spark(app_name="epoch_clean_scaled")
    print("| factor | rows | epoch-ns clean (full, best-of-2) | timestamp clean (full) | epoch overhead |")
    print("|---|---|---|---|---|")
    for kf in factors:
        if kf == 1:
            sf_dir = "/root/testdata/sf0.1"
        else:
            sf_dir = build_sf1(spark, kf, out_name="sf1" if kf == 10 else f"allx{kf}")
        txn = transactions_from_events(spark, sf_dir)
        n = txn.count()
        # degrade to raw int64 ns — what the reference's dirty CSVs and
        # the real testdata parquet carry before any engine conversion
        as_ns = txn.withColumn(
            "timestamp",
            (F.unix_micros(F.col("timestamp").cast("timestamp")) * 1000).cast("long"),
        )
        times = {}
        for label, frame in (("epoch", as_ns), ("ts", txn)):
            # FULL-call timing: the epoch path's unit detection runs a
            # median job at plan-BUILD time, so building inside the
            # timer is the honest number for this branch
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                cleaned = clean_transactions(frame, deterministic_order_col="event_id")
                cleaned.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[label] = best
        print(
            f"| x{kf} | {n} | {times['epoch']:.2f} s | {times['ts']:.2f} s "
            f"| +{times['epoch'] - times['ts']:.2f} s |"
        )
        print(f"x{kf}: epoch {times['epoch']:.2f}s ts {times['ts']:.2f}s", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Benchmark harness: times the headline registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion through the noop sink (full compute,
no driver-side result transfer), so the measured time is the engine's
distributed work, comparable across runs.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    from etl_challenge_localiza_spark.registry import QUERIES
    from etl_challenge_localiza_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # warm-up: JVM + codegen + parquet footer caches, not timed
    QUERIES["top10_orders"].fn(spark, sf_dir).collect()

    # best-of-2 per query: the first run of a fresh plan pays one-time
    # codegen/broadcast warm-up that a long-lived cluster amortizes;
    # steady-state throughput is the comparable number.
    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        if not q.headline:
            continue
        best = float("inf")
        for _ in range(2):
            df = q.fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

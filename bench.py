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
    timings_full: dict[str, float] = {}
    for name, q in QUERIES.items():
        if not q.headline:
            continue
        best = float("inf")
        best_full = float("inf")
        for _ in range(2):
            # two timers, both reported:
            # - exec-only (historical series, r1-r5 comparable): the
            #   distributed execution of the built plan;
            # - full-call: fn() + execution, which additionally counts
            #   driver-side planning (py4j, Catalyst analysis, parquet
            #   footer listing — amortized to ~0 in production) AND the
            #   eager driver-sequenced work of the iterative queries
            #   (components/pagerank run their loop inside fn(), which
            #   exec-only timing structurally under-reports).
            t_full0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t1 = time.perf_counter()
            best = min(best, t1 - t0)
            best_full = min(best_full, t1 - t_full0)
        timings[name] = round(best, 3)
        timings_full[name] = round(best_full, 3)
        print(f"  {name}: {timings[name]:.3f}s (full {timings_full[name]:.3f}s)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "full_call_total": round(sum(timings_full.values()), 3),
                "queries_full": timings_full,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

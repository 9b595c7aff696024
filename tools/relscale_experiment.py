"""Relational-side scaling experiment (VERDICT r4 directive #5).

The round-4 PERF.md experiment showed the text family's wall-time
growing strongly sublinearly in data volume; this script produces the
same evidence for the join/window family: clone lineitem/orders/events
x10 (and x30) from sf0.1 with key/time offsets chosen so JOIN
SELECTIVITY AND GROUP CARDINALITY stay realistic while volume grows:

- lineitem/orders: orderkeys offset per copy (fact grows, dims fixed —
  per-part/per-supplier fan-out grows xK, as a bigger fact should);
  order dates shifted +17k days per copy so the (custkey, orderdate)
  as-of state table genuinely grows xK instead of collapsing in the
  keep-latest dedup.
- events: event ids offset, timestamps shifted +17k minutes per copy
  (distinct per-user history points, so rolling-window frames and
  as-of probes grow xK).

Usage:  python -m tools.relscale_experiment [--scales 1,10,30]
Writes parquet under .relscale/ (gitignored) and prints a markdown
table for PERF.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

QUERIES_TO_RUN = [
    "q1_pricing_summary",
    "q9_product_profit",
    "asof_latest_order",
    "user_rolling_hour_stats",
    # round-6 events-based additions — the O(rows) closed-form claims
    # (EWMA, rank-correlation, OLS trend) measured, not asserted
    "ewma_user_value",
    "spearman_value_risk",
    "per_type_value_trend",
]

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".relscale")

PASSTHROUGH_TABLES = [
    "region", "nation", "customer", "supplier", "part", "documents", "embeddings",
]


def build_scale(spark, k: int) -> str:
    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.sources.readers import load_table

    out = os.path.join(ROOT, f"x{k}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    li = load_table(spark, SRC, "lineitem")
    orders = load_table(spark, SRC, "orders")
    events = load_table(spark, SRC, "events")
    ok_max = 1 + orders.agg(F.max("o_orderkey")).collect()[0][0]
    eid_max = 1 + events.agg(F.max("event_id")).collect()[0][0]

    copies = spark.range(k).withColumnRenamed("id", "__k")

    def explode_copies(df, mutate):
        return mutate(df.crossJoin(F.broadcast(copies))).drop("__k")

    explode_copies(
        li, lambda d: d.withColumn("l_orderkey", F.col("l_orderkey") + F.col("__k") * ok_max)
    ).repartition(32).write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
    explode_copies(
        orders,
        lambda d: d.withColumn("o_orderkey", F.col("o_orderkey") + F.col("__k") * ok_max)
        .withColumn("o_orderdate", F.expr("o_orderdate + make_interval(0,0,0,17*__k,0,0,0)")),
    ).repartition(32).write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))
    explode_copies(
        events,
        lambda d: d.withColumn("event_id", F.col("event_id") + F.col("__k") * eid_max)
        .withColumn("ts", F.expr("ts + make_interval(0,0,0,0,0,17*__k,0)")),
    ).repartition(32).write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    for t in PASSTHROUGH_TABLES:
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet"))
    open(os.path.join(out, "_DONE"), "w").write("ok")
    return out


def main() -> int:
    scales = [1, 10, 30]
    if "--scales" in sys.argv:
        scales = [int(s) for s in sys.argv[sys.argv.index("--scales") + 1].split(",")]

    from etl_challenge_localiza_spark.registry import QUERIES
    from etl_challenge_localiza_spark.session import get_spark

    spark = get_spark(app_name="relscale")
    results: dict[int, dict[str, float]] = {}
    for k in scales:
        sf_dir = build_scale(spark, k)
        row: dict[str, float] = {}
        for name in QUERIES_TO_RUN:
            best = float("inf")
            for _ in range(2):
                df = QUERIES[name].fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row[name] = round(best, 3)
            print(f"x{k} {name}: {best:.3f}s", file=sys.stderr)
        results[k] = row

    base = scales[0]
    print(f"| query | {' | '.join(f'x{k}' for k in scales)} | growth at x{scales[-1]} |")
    print("|---|" + "---|" * (len(scales) + 1))
    for name in QUERIES_TO_RUN:
        cells = " | ".join(f"{results[k][name]:.2f} s" for k in scales)
        growth = results[scales[-1]][name] / results[base][name]
        print(f"| {name} | {cells} | x{growth:.1f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())

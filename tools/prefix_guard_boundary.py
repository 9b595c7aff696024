"""Prefix-filter candidate-guard boundary measurement (VERDICT r12
directive #4): on the ×30 clone tier's naturally Zipf-skewed shingle
frequencies, report the guard's EXACT pre-distinct estimate, the actual
distinct candidate volume, the verified-pair output, and both sides of
the refusal boundary (budget set just below the estimate → refuses with
the measured volume; just above → runs to completion), with wall times.

The estimate is exact BY CONSTRUCTION for what it counts (Σ C(df_p, 2)
joined pairs before DISTINCT); the interesting accuracy number is the
distinct-pair ratio — how much the same pair re-meeting through several
shared prefix shingles inflates the pre-distinct count the budget is
written against.

Usage: python -m tools.prefix_guard_boundary [--factors 1,30]
"""

from __future__ import annotations

import sys
import time


def measure(spark, sf_dir: str, n: int = 3, threshold: float = 0.5) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_challenge_localiza_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
        shingle_hashes,
        tokens,
    )
    from etl_challenge_localiza_spark.sources.readers import (
        load_table,
        spread_small_scan,
    )

    docs = load_table(spark, sf_dir, "documents")
    # the guard's own estimate, via the production prefix construction
    sh = spread_small_scan(docs).select(
        "doc_id",
        F.explode(F.array_distinct(shingle_hashes(tokens("text"), n))).alias("s"),
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("df"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("s").asc())
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(float(threshold)) * F.col("n_sh")) + F.lit(1)
    )
    prefix = (
        sh.join(dfreq, "s")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .filter(F.col("rn") <= prefix_len)
        .select("doc_id", "s")
    )
    t0 = time.perf_counter()
    est = int(
        prefix.groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(
            F.sum(
                F.col("c").cast("decimal(38,0)") * (F.col("c") - F.lit(1)) / F.lit(2)
            )
            .cast("decimal(38,0)")
            .alias("n_cand")
        )
        .first()["n_cand"]
        or 0
    )
    t_est = time.perf_counter() - t0
    t0 = time.perf_counter()
    actual_distinct = (
        prefix.alias("pa")
        .join(
            prefix.alias("pb"),
            (F.col("pa.s") == F.col("pb.s"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(F.col("pa.doc_id"), F.col("pb.doc_id"))
        .distinct()
        .count()
    )
    t_cand = time.perf_counter() - t0

    # refusal side: budget one below the estimate must refuse, quoting it
    refused = None
    t0 = time.perf_counter()
    try:
        prefix_filter_jaccard_pairs(
            docs, n=n, threshold=threshold, candidate_budget=max(est - 1, 0)
        ).write.format("noop").mode("overwrite").save()
    except ValueError as e:
        refused = str(e)
    t_refuse = time.perf_counter() - t0

    # pass side: budget one above runs to completion
    t0 = time.perf_counter()
    n_pairs = (
        prefix_filter_jaccard_pairs(
            docs, n=n, threshold=threshold, candidate_budget=est + 1
        ).count()
    )
    t_full = time.perf_counter() - t0
    return {
        "estimate_pre_distinct": est,
        "actual_distinct_candidates": actual_distinct,
        "distinct_ratio": round(actual_distinct / est, 4) if est else None,
        "verified_pairs": n_pairs,
        "t_estimate_s": round(t_est, 2),
        "t_candidates_s": round(t_cand, 2),
        "t_refusal_s": round(t_refuse, 2),
        "t_full_run_s": round(t_full, 2),
        "refused_below_budget": refused is not None
        and str(est) in (refused or ""),
    }


def main() -> int:
    factors = [1, 30]
    if "--factors" in sys.argv:
        factors = [
            int(x) for x in sys.argv[sys.argv.index("--factors") + 1].split(",")
        ]
    from etl_challenge_localiza_spark.session import get_spark
    from tools.sf1_bench import build_sf1

    spark = get_spark(app_name="prefix_guard_boundary")
    rows = {}
    for kf in factors:
        sf_dir = (
            "/root/testdata/sf0.1"
            if kf == 1
            else build_sf1(spark, kf, out_name=f"allx{kf}")
        )
        rows[kf] = measure(spark, sf_dir)
        print(f"x{kf}: {rows[kf]}", file=sys.stderr)
    print("| tier | guard estimate (pre-distinct) | actual distinct candidates "
          "| distinct/estimate | verified pairs | estimate cost | full run "
          "| refuses just below |")
    print("|---|---|---|---|---|---|---|---|")
    for kf, r in rows.items():
        print(
            f"| ×{kf} | {r['estimate_pre_distinct']:,} "
            f"| {r['actual_distinct_candidates']:,} | {r['distinct_ratio']} "
            f"| {r['verified_pairs']:,} | {r['t_estimate_s']} s "
            f"| {r['t_full_run_s']} s | {r['refused_below_budget']} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Error-bound checks for the sketch-based approximate aggregates
(`approx_event_stats`): the driver's rows-only check proves the query
runs; these assert the sketches are ACCURATE against exact values, with
explicit tolerances derived from the algorithms' published bounds.

- approx_count_distinct is HyperLogLog++ at the default rsd=0.05; we
  assert relative error <= 3*rsd (three standard deviations — a
  per-group failure probability well under 1% even across groups).
- percentile_approx is the Greenwald-Khanna-style quantile sketch at
  the default accuracy=10000, i.e. rank error <= n/accuracy; we assert
  the approximate p90 lies within the exact p85..p95 value envelope,
  which is far looser than the guarantee and catches any real
  regression (wrong column, wrong quantile, broken merge).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_challenge_localiza_spark.registry import QUERIES
from etl_challenge_localiza_spark.sources.readers import load_table


def test_approx_event_stats_error_bounds(spark, sf0001):
    rows = QUERIES["approx_event_stats"].fn(spark, sf0001).collect()
    assert rows, "no groups returned"

    envelope = {
        r["event_type"]: (r["p85"], r["p95"])
        for r in load_table(spark, sf0001, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.85)").alias("p85"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }

    for r in rows:
        exact, approx = r["exact_users"], r["approx_users"]
        assert exact > 0
        rel_err = abs(approx - exact) / exact
        assert rel_err <= 3 * 0.05, (
            f"{r['event_type']}: HLL++ estimate {approx} vs exact {exact} "
            f"(rel err {rel_err:.3f} > 0.15)"
        )
        lo, hi = envelope[r["event_type"]]
        assert lo <= r["approx_p90"] <= hi, (
            f"{r['event_type']}: approx p90 {r['approx_p90']} outside "
            f"exact p85..p95 envelope [{lo}, {hi}]"
        )


def test_hll_sketch_merge_bounds(spark, sf0001):
    """HLL sketches: per-group estimates within 3*rsd of exact, and the
    UNION of per-group sketches must estimate the global distinct count
    (mergeability — the distributed-sketch contract)."""
    rows = QUERIES["hll_sketch_mergeability"].fn(spark, sf0001).collect()
    assert rows
    exact_global = (
        load_table(spark, sf0001, "events").select("user_id").distinct().count()
    )
    for r in rows:
        assert abs(r["approx_users"] - r["exact_users"]) <= max(
            1, 0.15 * r["exact_users"]
        )
        assert abs(r["global_approx_users"] - exact_global) <= max(
            1, 0.15 * exact_global
        )

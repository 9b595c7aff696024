"""functions.exactsum: the split-long exact money sum must be
bit-identical to a full-decimal aggregation (the semantics the DuckDB
oracles compute) while never leaving compact int64 per row."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_challenge_localiza_spark.functions.exactsum import (
    SPLIT,
    direct_total,
    money_unscaled,
    split_sum,
    split_total,
)


def _money_frame(spark, n=5000, seed=7):
    rng = random.Random(seed)
    rows = [
        (
            rng.choice("AB"),
            round(rng.uniform(0, 105_000), 2),  # price-scale money
            round(rng.uniform(0, 0.10), 2),  # discount-scale
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "g string, amount double, rate double")


def test_split_sum_matches_decimal_aggregation(spark):
    df = _money_frame(spark)
    # product scaled 10^4 — exercises the hi/lo split (amount_u up to
    # ~2^23, product up to ~2^30, both crossing SPLIT=2^20 per row)
    rows = df.select(
        "g",
        money_unscaled("amount").alias("a_u"),
        money_unscaled("1 - rate").alias("m_u"),
    ).withColumn("p_u", F.col("a_u") * F.col("m_u"))
    got = (
        rows.groupBy("g")
        .agg(*split_sum("a_u", "a"), *split_sum("p_u", "p"), F.sum("a_u").alias("a_s"))
        .select(
            "g",
            split_total("a", 2).alias("sum_amount"),
            split_total("p", 4).alias("sum_product"),
            direct_total("a_s", 2).alias("sum_amount_direct"),
        )
    )
    want = df.groupBy("g").agg(
        F.sum(F.col("amount").cast("decimal(12,2)")).cast("double").alias("sum_amount"),
        F.sum(
            F.col("amount").cast("decimal(12,2)")
            * (F.lit(1) - F.col("rate")).cast("decimal(12,2)")
        )
        .cast("double")
        .alias("sum_product"),
    )
    g = {r["g"]: r for r in got.collect()}
    w = {r["g"]: r for r in want.collect()}
    assert set(g) == set(w) == {"A", "B"}
    for k in g:
        assert g[k]["sum_amount"] == w[k]["sum_amount"]  # bit-exact
        assert g[k]["sum_product"] == w[k]["sum_product"]
        assert g[k]["sum_amount_direct"] == w[k]["sum_amount"]


def test_split_reconstruction_is_exact_beyond_double_precision(spark):
    # totals past 2^53: a float64 running sum would lose units; the
    # split-long path must reconstruct the exact integer total.
    per_row = (1 << 40) + 3  # each row far above SPLIT
    n = 9000
    df = spark.range(n).select(F.lit(per_row).alias("u"))
    out = (
        df.groupBy()
        .agg(*split_sum("u", "t"))
        .select(
            (F.col("t_hi").cast("decimal(38,0)") * SPLIT + F.col("t_lo")).alias("total")
        )
        .collect()[0]
    )
    assert int(out["total"]) == per_row * n  # exact, no drift
    assert float(per_row * n) != per_row * n - 1  # sanity of the scale


def test_money_unscaled_half_up_matches_decimal_cast(spark):
    # the unscaled long must reflect decimal(12,2) HALF_UP rounding
    df = spark.createDataFrame(
        [(10.125,), (0.005,), (2.675,), (99.994,), (99.995,)], "x double"
    )
    got = df.select(
        money_unscaled("x").alias("u"),
        F.expr("cast(cast(x as decimal(12,2)) * 100 as long)").alias("want"),
    ).collect()
    for r in got:
        assert r["u"] == r["want"]


def test_split_sum_property_random_money(spark):
    """Property check (seeded sweep standing in for hypothesis — a
    Spark action per example is too slow for shrinking): for assorted
    adversarial money distributions, split-long totals must equal the
    full-decimal aggregation bit-for-bit."""
    from decimal import Decimal

    cases = [
        [0.0] * 10,
        [0.01] * 999,
        [105_000.00] * 1000,  # max-magnitude rows
        [0.005, 0.015, 2.675, 99.995] * 50,  # half-up boundary shapes
        [float(f"{(i * 97) % 100000}.{i % 100:02d}") for i in range(2000)],
    ]
    for idx, vals in enumerate(cases):
        df = spark.createDataFrame([(v,) for v in vals], "amount double")
        got = (
            df.select(money_unscaled("amount").alias("u"))
            .groupBy()
            .agg(*split_sum("u", "t"), F.sum("u").alias("t_s"))
            .select(
                split_total("t", 2).alias("total"),
                direct_total("t_s", 2).alias("total_direct"),
            )
            .collect()[0]
        )
        want = float(
            df.select(
                F.sum(F.col("amount").cast("decimal(12,2)"))
                .cast("double")
                .alias("w")
            ).collect()[0]["w"]
        )
        assert got["total"] == want, (idx, got["total"], want)
        assert got["total_direct"] == want, (idx, got["total_direct"], want)
        # and the exact rational matches an independent Decimal fold.
        # Spark's double→decimal cast rounds the SHORTEST DECIMAL REPR
        # of the double (Java BigDecimal.valueOf semantics) HALF_UP —
        # verified here: Decimal(str(v)) matches, Decimal(v) (the raw
        # binary expansion) does not for reprs like 2.675 whose binary
        # value sits just below the half boundary.
        from decimal import ROUND_HALF_UP

        dec_sum = sum(
            Decimal(str(v)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
            for v in vals
        )
        assert got["total"] == float(dec_sum), (idx, got["total"], dec_sum)


def test_split_sum_signed_values_exact(spark):
    """Round-6 ADVICE fix: the pmod/floor-div decomposition makes
    split_sum exact for SIGNED money (refunds/adjustments), where the
    old truncate-toward-zero div/% pair silently mis-reconstructed
    negatives. hi*2^20 + lo == u must hold per row for any sign."""
    from decimal import ROUND_HALF_UP, Decimal

    cases = [
        [-0.01, 0.01],                       # cancels to zero
        [-105_000.00] * 1000,                # all-negative bulk
        [-2.675, 2.675, -0.005, 0.005],      # signed half-up boundaries
        [float(f"{'-' if i % 3 else ''}{(i * 97) % 100000}.{i % 100:02d}")
         for i in range(2000)],              # mixed-sign stream
        [-1048576.01, 1.23],                 # straddles the 2^20 split
    ]
    for idx, vals in enumerate(cases):
        df = spark.createDataFrame([(v,) for v in vals], "amount double")
        got = (
            df.select(money_unscaled("amount").alias("u"))
            .groupBy()
            .agg(*split_sum("u", "t"))
            .select(split_total("t", 2).alias("total"))
            .collect()[0]
        )
        dec_sum = sum(
            Decimal(str(v)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
            for v in vals
        )
        assert got["total"] == float(dec_sum), (idx, got["total"], dec_sum)

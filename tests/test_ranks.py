"""operators/ranks.py — each helper must be VALUE-IDENTICAL to the
global window form it replaces, on data with heavy ties (the case the
tie-split decomposition has to get right)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_challenge_localiza_spark.operators.ranks import (
    exact_ntile,
    scaled_avg_rank_by_value,
    tie_split_prefix_sum,
)


def _tied_frame(spark, n=97):
    # values 0..9 with skewed multiplicities, unique id tiebreak,
    # weights that vary per row
    return spark.range(n).select(
        F.col("id").alias("rid"),
        (F.col("id") * F.col("id") % 10).alias("v"),
        (F.col("id") % 7 + 1).cast("long").alias("w"),
    )


def test_scaled_avg_rank_matches_window_form(spark):
    df = _tied_frame(spark)
    expected = df.select(
        "v",
        (
            2 * F.rank().over(Window.orderBy("v"))
            + F.count(F.lit(1)).over(Window.partitionBy("v"))
            - 1
        ).alias("r2"),
    ).distinct()
    got = scaled_avg_rank_by_value(df, "v").select("v", "r2")
    assert got.subtract(expected).count() == 0
    assert expected.subtract(got).count() == 0


def test_tie_split_prefix_sum_matches_window_form(spark):
    df = _tied_frame(spark)
    for desc in (False, True):
        okey = F.col("v").desc() if desc else F.col("v").asc()
        w = Window.orderBy(okey, F.col("rid")).rowsBetween(
            Window.unboundedPreceding, -1
        )
        expected = df.select(
            "rid", F.coalesce(F.sum("w").over(w), F.lit(0)).alias("p")
        )
        got = tie_split_prefix_sum(df, "v", "w", "rid", desc=desc).select(
            "rid", F.col("prefix_before").alias("p")
        )
        assert got.subtract(expected).count() == 0, f"desc={desc}"
        assert expected.subtract(got).count() == 0, f"desc={desc}"


def test_exact_ntile_matches_window_form(spark):
    for n, k in ((97, 10), (7, 10), (40, 4), (1, 3)):
        for desc in (False, True):
            okey = F.col("v").desc() if desc else F.col("v").asc()
            df = _tied_frame(spark, n)
            expected = df.select(
                "rid", F.ntile(k).over(Window.orderBy(okey, "rid")).alias("b")
            )
            got = exact_ntile(df, k, "v", "rid", desc=desc).select(
                "rid", F.col("bucket").cast("int").alias("b")
            )
            assert got.subtract(expected).count() == 0, f"n={n} k={k} desc={desc}"
            assert expected.subtract(got).count() == 0, f"n={n} k={k} desc={desc}"


def test_ordered_row_number_matches_window_form(spark):
    """ordered_row_number: identical to row_number() over a global
    order for unique composite keys, across widths, and stable across
    two same-session evaluations (the range-exchange boundary sampling
    must be deterministic for the two internal consumers to agree)."""
    from etl_challenge_localiza_spark.operators.ranks import ordered_row_number

    df = spark.range(500).select(
        (F.col("id") * 2654435761 % 1000).alias("h"),  # collisions on h
        F.col("id").alias("rid"),
    )
    expected = df.select(
        "rid", F.row_number().over(Window.orderBy("h", "rid")).alias("p")
    )
    for parts in (1, 7, 32):
        got = ordered_row_number(df, ["h", "rid"], out_col="p", parts=parts).select(
            "rid", "p"
        )
        assert got.subtract(expected).count() == 0, f"parts={parts}"
        assert expected.subtract(got).count() == 0, f"parts={parts}"
    # re-roll: two evaluations of the same plan agree row-for-row
    a = ordered_row_number(df, ["h", "rid"], out_col="p")
    assert a.subtract(a).count() == 0 and a.count() == 500


def test_grouped_prefix_sum_matches_window_form(spark):
    """grouped_prefix_sum: identical to the per-group global-window
    running sum, across widths — including widths that split one
    group's stream over several range partitions (the case the
    per-cell offsets exist for)."""
    from etl_challenge_localiza_spark.operators.ranks import grouped_prefix_sum

    df = spark.range(600).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("o"),
        (F.col("id") % 11 + 1).cast("long").alias("w"),
    )
    w = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    expected = df.select(
        "g", "o", F.coalesce(F.sum("w").over(w), F.lit(0)).alias("p")
    )
    for parts in (1, 2, 7, 32):
        got = grouped_prefix_sum(df, "g", "o", "w", out_col="p", parts=parts).select(
            "g", "o", "p"
        )
        assert got.subtract(expected).count() == 0, f"parts={parts}"
        assert expected.subtract(got).count() == 0, f"parts={parts}"


def test_grouped_prefix_sum_survives_exchange_reuse_off(spark):
    """ADVICE r9 (medium): cross-consumer pid identity must NOT rest on
    physical exchange reuse. With spark.sql.exchange.reuse disabled,
    the two consumers of the range exchange would be planned as two
    exchanges (each sampling its own boundaries) — the persisted
    pid-tagged frame makes them read one cached partitioner instead."""
    from etl_challenge_localiza_spark.operators.ranks import (
        grouped_prefix_sum,
        ordered_row_number,
    )

    old = spark.conf.get("spark.sql.exchange.reuse", "true")
    try:
        spark.conf.set("spark.sql.exchange.reuse", "false")
        df = spark.range(600).select(
            (F.col("id") % 3).cast("string").alias("g"),
            F.col("id").alias("o"),
            (F.col("id") % 11 + 1).cast("long").alias("w"),
        )
        w = (
            Window.partitionBy("g")
            .orderBy("o")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        expected = df.select(
            "g", "o", F.coalesce(F.sum("w").over(w), F.lit(0)).alias("p")
        )
        got = grouped_prefix_sum(df, "g", "o", "w", out_col="p", parts=7).select(
            "g", "o", "p"
        )
        assert got.subtract(expected).count() == 0
        assert expected.subtract(got).count() == 0

        df2 = spark.range(500).select(
            (F.col("id") * 2654435761 % 1000).alias("h"),
            F.col("id").alias("rid"),
        )
        exp2 = df2.select(
            "rid", F.row_number().over(Window.orderBy("h", "rid")).alias("p")
        )
        got2 = ordered_row_number(df2, ["h", "rid"], out_col="p", parts=7).select(
            "rid", "p"
        )
        assert got2.subtract(exp2).count() == 0
        assert exp2.subtract(got2).count() == 0
    finally:
        spark.conf.set("spark.sql.exchange.reuse", old)


def test_prefix_sums_preserve_fractional_weight_type(spark):
    """ADVICE r9: a fractional weight column must not have its
    cross-value / cross-cell component silently truncated to long.
    Decimal weights check exactness bit-for-bit; double weights check
    to float tolerance (the decomposition reassociates the sum)."""
    from decimal import Decimal

    from etl_challenge_localiza_spark.operators.ranks import grouped_prefix_sum

    df = _tied_frame(spark).withColumn(
        "wd", (F.col("w") + F.lit(0.25)).cast("decimal(12,2)")
    )
    w = Window.orderBy("v", "rid").rowsBetween(Window.unboundedPreceding, -1)
    expected = df.select(
        "rid",
        F.coalesce(F.sum("wd").over(w), F.lit(Decimal("0"))).alias("p"),
    )
    got = tie_split_prefix_sum(df, "v", "wd", "rid").select(
        "rid", F.col("prefix_before").alias("p")
    )
    assert dict(got.schema["p"].dataType.__dict__) == dict(
        expected.schema["p"].dataType.__dict__
    ) or "decimal" in got.schema["p"].dataType.simpleString()
    joined = got.withColumnRenamed("p", "pg").join(expected, "rid")
    bad = joined.filter(F.abs(F.col("pg") - F.col("p")) > 1e-9).count()
    assert bad == 0

    # double weights through grouped_prefix_sum, tolerance-checked
    df2 = spark.range(300).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").alias("o"),
        (F.col("id") % 5 / 4.0 + 0.1).alias("w"),
    )
    wg = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    exp2 = df2.select(
        "g", "o", F.coalesce(F.sum("w").over(wg), F.lit(0.0)).alias("p")
    )
    got2 = grouped_prefix_sum(df2, "g", "o", "w", out_col="pg", parts=5)
    assert got2.schema["pg"].dataType.simpleString() == "double"
    j2 = got2.join(exp2, ["g", "o"])
    assert j2.filter(F.abs(F.col("pg") - F.col("p")) > 1e-9).count() == 0


def test_rank_helpers_keep_null_keys(spark):
    """ADVICE r9: rows with a NULL order/group key must survive the
    join back and rank exactly where the window form puts them
    (Spark: nulls first ASC, nulls last DESC)."""
    from etl_challenge_localiza_spark.operators.ranks import grouped_prefix_sum

    df = _tied_frame(spark).withColumn(
        "v", F.when(F.col("rid") % 9 == 0, F.lit(None)).otherwise(F.col("v"))
    )
    for desc in (False, True):
        okey = F.col("v").desc() if desc else F.col("v").asc()
        w = Window.orderBy(okey, "rid").rowsBetween(Window.unboundedPreceding, -1)
        expected = df.select(
            "rid", F.coalesce(F.sum("w").over(w), F.lit(0)).alias("p")
        )
        got = tie_split_prefix_sum(df, "v", "w", "rid", desc=desc).select(
            "rid", F.col("prefix_before").alias("p")
        )
        assert got.count() == df.count(), f"desc={desc}: null-key rows dropped"
        assert got.subtract(expected).count() == 0, f"desc={desc}"
        assert expected.subtract(got).count() == 0, f"desc={desc}"

        exp_nt = df.select(
            "rid", F.ntile(4).over(Window.orderBy(okey, "rid")).alias("b")
        )
        got_nt = exact_ntile(df, 4, "v", "rid", desc=desc).select(
            "rid", F.col("bucket").cast("int").alias("b")
        )
        assert got_nt.count() == df.count(), f"desc={desc}: ntile dropped nulls"
        assert got_nt.subtract(exp_nt).count() == 0, f"desc={desc}"
        assert exp_nt.subtract(got_nt).count() == 0, f"desc={desc}"

    # NULL group through grouped_prefix_sum
    dfg = spark.range(200).select(
        F.when(F.col("id") % 4 == 0, F.lit(None))
        .otherwise((F.col("id") % 3).cast("string"))
        .alias("g"),
        F.col("id").alias("o"),
        (F.col("id") % 7 + 1).cast("long").alias("w"),
    )
    wg = (
        Window.partitionBy("g")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    exp_g = dfg.select(
        "g", "o", F.coalesce(F.sum("w").over(wg), F.lit(0)).alias("p")
    )
    got_g = grouped_prefix_sum(dfg, "g", "o", "w", out_col="p", parts=7).select(
        "g", "o", "p"
    )
    assert got_g.count() == dfg.count(), "null-group rows dropped"
    assert got_g.subtract(exp_g).count() == 0
    assert exp_g.subtract(got_g).count() == 0

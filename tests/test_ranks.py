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

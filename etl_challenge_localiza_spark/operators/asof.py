"""As-of (point-in-time) join — a time-series operator Spark lacks as a
built-in (SURVEY.md §2.9 'custom operators'; DuckDB/kdb expose it
natively as ASOF JOIN).

Spark-first implementation: the classic union + keyed-window
carry-forward, NOT a range cross-join:

1. tag right rows (state) and left rows (probes), union them;
2. one window over (key ORDER BY time, state-first) carries the most
   recent state payload forward with last_value(ignoreNulls);
3. keep probe rows.

Cost at 100 TB: ONE shuffle of |left|+|right| on the key (vs the
unbounded blow-up of a naive t_left >= t_right join then max-filter),
and the window sort is per-key. Skewed keys can be salted upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach ``payload_cols`` from the latest right
    row with the same key and right_time <= left_time (inclusive).

    ``how='inner'`` drops left rows with no prior right row;
    ``'left'`` keeps them with NULL payload.
    """
    l_tag = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_state"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in payload_cols) + ">"
        ).alias("__payload"),
    )
    r_tag = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_state"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left.columns) + ">"
        ).alias("__left"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    )
    # state rows sort before probe rows at equal time → inclusive <=;
    # the trailing __payload sort key makes ties among right rows
    # sharing (key, time) DETERMINISTIC (last() then carries the
    # greatest payload tuple) instead of partition-order-dependent
    w = (
        Window.partitionBy("__key")
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_state").desc(),
            F.col("__payload").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("__state", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__is_state") == 0)
    )
    out = carried.select("__left.*", "__state.*")
    if how == "inner":
        out = carried.filter(F.col("__state").isNotNull()).select("__left.*", "__state.*")
    return out


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """NEAREST-match as-of join: each left row picks the right row
    (same key) whose time is CLOSEST in either direction — the
    bidirectional sibling of the backward-only ``asof_join`` (kdb's
    ``aj`` nearest mode / pandas ``merge_asof(direction='nearest')``).
    Ties (equal backward and forward gap) resolve BACKWARD, matching
    the convention that state at t is known at t.

    ``left_time``/``right_time`` must be NUMERIC (e.g. unix micros) so
    gaps are exact integers. Returns left columns + the chosen row's
    ``payload_cols`` + ``direction`` ('backward'/'forward') + ``gap``
    (non-negative, in the time columns' unit). Left rows with no right
    row for their key are dropped (inner semantics).

    Right rows need NOT be unique per (key, time): duplicates resolve
    deterministically to the greatest payload tuple (the windows'
    trailing ``__payload`` sort key). Callers wanting a different
    intra-time winner should pre-dedupe — the registry caller does.

    Scale shape: the SAME single union of |left|+|right| rows as the
    backward join, carried TWICE under one key hash-exchange (the two
    windows share partitioning — Catalyst plans one Exchange + two
    sorts, asc and desc) — never a range join, never a per-key
    history rescan.
    """
    payload_t = (
        "struct<__rt:bigint,"
        + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in payload_cols)
        + ">"
    )
    left_t = "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left.columns) + ">"
    l_tag = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_time).cast("long").alias("__t"),
        F.lit(0).alias("__is_state"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(payload_t).alias("__payload"),
    )
    r_tag = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_time).cast("long").alias("__t"),
        F.lit(1).alias("__is_state"),
        F.lit(None).cast(left_t).alias("__left"),
        F.struct(
            F.col(right_time).cast("long").alias("__rt"),
            *[F.col(c) for c in payload_cols],
        ).alias("__payload"),
    )
    # state-first at equal time in BOTH directions → both carries are
    # inclusive (an exact-time match is its own nearest neighbour).
    # The trailing __payload sort key resolves ties among right rows
    # sharing (key, time) DETERMINISTICALLY — both directions carry
    # the greatest payload tuple — instead of partition-order-
    # dependent last(); requires payload_cols to be of orderable
    # (atomic/struct) types, which every registry caller satisfies.
    w_back = (
        Window.partitionBy("__key")
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_state").desc(),
            F.col("__payload").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__key")
        .orderBy(
            F.col("__t").desc(),
            F.col("__is_state").desc(),
            F.col("__payload").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("__b", F.last("__payload", ignorenulls=True).over(w_back))
        .withColumn("__f", F.last("__payload", ignorenulls=True).over(w_fwd))
        .filter(F.col("__is_state") == 0)
    )
    gap_b = F.col("__t") - F.col("__b.__rt")
    gap_f = F.col("__f.__rt") - F.col("__t")
    use_b = F.col("__b").isNotNull() & (F.col("__f").isNull() | (gap_b <= gap_f))
    chosen = F.when(use_b, F.col("__b")).otherwise(F.col("__f"))
    return (
        carried.withColumn("__chosen", chosen)
        .filter(F.col("__chosen").isNotNull())
        .withColumn(
            "direction", F.when(use_b, F.lit("backward")).otherwise(F.lit("forward"))
        )
        .withColumn("gap", F.when(use_b, gap_b).otherwise(gap_f).cast("long"))
        .select("__left.*", *[f"__chosen.{c}" for c in payload_cols], "direction", "gap")
    )

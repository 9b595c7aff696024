"""Exact global order statistics WITHOUT corpus-grain global windows.

``Window.orderBy(...)`` with no ``partitionBy`` moves every input row
into ONE task — correct and cheap over a 25-row aggregate, fatal over
a 100 TB corpus (Spark itself warns ``No Partition Defined for Window
operation``). But the three order statistics a curation pipeline
actually needs — ranks, ordered prefix sums, equal-count buckets — all
decompose exactly at the tie boundary:

- the CROSS-value component depends only on the ORDER VALUE, so it is
  computable from the per-value histogram: ``groupBy(value).count()``
  (map-side combined, fully parallel — the only pass over the data)
  followed by a running total over the histogram. The unpartitioned
  window that remains orders NDV small rows, never the corpus; at even
  larger NDV the same prefix range-partitions (per-range partial sums
  + broadcast offsets) without changing any value.
- the WITHIN-tie component orders rows that share the value — a
  value-PARTITIONED window, fully parallel by construction.

The decomposition is exact (not approximate): every function here is
value-checked against the window-function form it replaces, and the
five registry queries built on it hash-match their DuckDB oracles
(which still use the plain window SQL).

Reference pedigree: the reference pipeline (flows/pipeline.py) has no
rank operators; these back the §2.9 curation/statistics extensions
(AUC, Spearman, curriculum packing, token-budget subsetting,
reliability deciles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scaled_avg_rank_by_value(df: DataFrame, value_col: str) -> DataFrame:
    """Per-DISTINCT-value rank table: (value_col, n, r2) where ``n``
    is the value's multiplicity and ``r2`` its ×2-scaled average rank
    in the ascending total order — ``2·avgrank = 2·minrank + n − 1``,
    kept ×2 so ties stay integer (the Mann-Whitney / Spearman trick).

    ``minrank(v) = 1 + Σ_{u<v} n(u)`` is a running count over the
    histogram, so the corpus contributes one map-side-combined
    aggregate and nothing else. Join the result back on ``value_col``
    (an NDV-sized shuffle join) or aggregate it directly — both AUC
    and Spearman consume the table without ever ranking rows.
    """
    cum_before = F.coalesce(
        F.sum("n").over(
            Window.orderBy(value_col).rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    return (
        df.groupBy(value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            value_col,
            "n",
            (2 * (cum_before + 1) + F.col("n") - 1).alias("r2"),
        )
    )


def tie_split_prefix_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    tiebreak_col: str,
    desc: bool = False,
    out_col: str = "prefix_before",
) -> DataFrame:
    """Add ``out_col`` = exact running sum of ``weight_col`` over the
    (``order_col``, ``tiebreak_col``) total order, EXCLUSIVE of the
    current row — identical to ``sum(w) over (order by o, t rows
    unbounded preceding to 1 preceding)`` but tie-split: the
    cross-value total rides the per-value histogram, the within-tie
    running sum a value-partitioned window. ``desc=True`` orders
    ``order_col`` descending (the curriculum "best first" shape);
    ``tiebreak_col`` stays ascending and must be unique per value for
    the total order to be total."""
    okey = F.col(order_col).desc() if desc else F.col(order_col).asc()
    hist = (
        df.groupBy(order_col)
        .agg(F.sum(weight_col).cast("long").alias("__grp_w"))
        .select(
            order_col,
            F.coalesce(
                F.sum("__grp_w").over(
                    Window.orderBy(okey).rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ).alias("__w_above"),
        )
    )
    within = F.coalesce(
        F.sum(weight_col).over(
            Window.partitionBy(order_col)
            .orderBy(tiebreak_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    return (
        df.join(hist, order_col)
        .withColumn(out_col, F.col("__w_above") + within)
        .drop("__w_above")
    )


def _position(df: DataFrame, order_col: str, tiebreak_col: str) -> Column:
    """1-based position in the ascending (order_col, tiebreak_col)
    total order: histogram running count + value-partitioned
    row_number. Internal to :func:`exact_ntile`; requires the
    ``__n_before`` column produced there."""
    return F.col("__n_before") + F.row_number().over(
        Window.partitionBy(order_col).orderBy(tiebreak_col)
    )


def exact_ntile(
    df: DataFrame,
    n_buckets: int,
    order_col: str,
    tiebreak_col: str,
    out_col: str = "bucket",
    desc: bool = False,
) -> DataFrame:
    """Add ``out_col`` = the SQL-standard ``ntile(n_buckets)`` bucket
    over the (``order_col``, ``tiebreak_col``) total order, computed
    WITHOUT a global row window: position = histogram running count +
    value-partitioned row_number, and ntile's uneven split (the first
    ``n %% k`` buckets get one extra row) is closed-form integer
    ceil-division over (position, n) — bit-identical to the window
    function (exhaustively tested in ``tests/test_plan_properties.py``
    and ``tests/test_ranks.py``, including the n < k degenerate
    branch, where the guarded else never evaluates its zero divisor).
    ``desc=True`` orders ``order_col`` descending (the "quintile 1 is
    best" RFM shape); ``tiebreak_col`` stays ascending and must be
    unique per value."""
    okey = F.col(order_col).desc() if desc else F.col(order_col).asc()
    hist = (
        df.groupBy(order_col)
        .agg(F.count(F.lit(1)).cast("long").alias("__nv"))
        .select(
            order_col,
            F.coalesce(
                F.sum("__nv").over(
                    Window.orderBy(okey).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("long"),
            ).alias("__n_before"),
        )
    )
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("__n_tot"))
    k = int(n_buckets)
    bucket = F.expr(
        f"CASE WHEN __pos <= (__n_tot % {k}) * (__n_tot DIV {k} + 1) "
        f"THEN (__pos + (__n_tot DIV {k})) DIV ((__n_tot DIV {k}) + 1) "
        f"ELSE (__n_tot % {k}) + ((__pos - (__n_tot % {k}) * ((__n_tot DIV {k}) + 1) "
        f"+ (__n_tot DIV {k}) - 1) DIV (__n_tot DIV {k})) END"
    )
    return (
        df.join(hist, order_col)
        .crossJoin(F.broadcast(tot))
        .withColumn("__pos", _position(df, order_col, tiebreak_col))
        .withColumn(out_col, bucket)
        .drop("__n_before", "__n_tot", "__pos")
    )


def ordered_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "pos",
    parts: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = the 1-based row index over the total order
    given by ``order_cols`` — ``row_number() over (order by ...)``
    without the all-rows-to-one-task window, for orders keyed by a
    UNIQUE composite (where the histogram decomposition above has
    nothing to reduce). Range-partition on the order key (each
    partition holds a contiguous key range, partition ids ascending in
    key order), number rows inside each partition with a PARTITIONED
    window, and add per-partition row-count offsets (a width-sized
    broadcast). Spark's range-exchange boundary sampling is seeded
    deterministically per input partition, so the two consumers of the
    exchange (the numbering pass and the count pass) see identical
    partition ids; with unique keys the result is also independent of
    where the boundaries land. Equivalence + re-roll stability pinned
    by tests/test_ranks.py."""
    spark = df.sparkSession
    if parts is None:
        try:
            parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            parts = spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    within = F.row_number().over(
        Window.partitionBy("__pid").orderBy(*order_cols)
    )
    offs = (
        with_pid.groupBy("__pid")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .select(
            "__pid",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("long"),
            ).alias("__off"),
        )
    )
    return (
        with_pid.join(F.broadcast(offs), "__pid")
        .withColumn(out_col, (F.col("__off") + within).cast("long"))
        .drop("__pid", "__off")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str,
    out_col: str = "prefix_before",
    parts: int | None = None,
) -> DataFrame:
    """Per-GROUP exclusive running sum of ``weight_col`` over
    ``order_col`` — ``sum(w) over (partition by g order by o rows
    unbounded preceding to 1 preceding)`` without the
    one-task-per-group bound (a dominant group, e.g. the majority
    language of a corpus, otherwise serializes its whole stream into
    a single window task). Range-partition on (group, order) so each
    group occupies a contiguous RUN of partitions, compute the
    running sum inside each (partition, group) cell with a partitioned
    window, and add per-cell totals cumulated along each group's run
    (a width×groups-bounded frame). Exact for unique ``order_col``
    within a group; like :func:`ordered_row_number`, cross-branch
    partition-id consistency rests on Spark's deterministic
    range-boundary sampling and is pinned by tests/test_ranks.py."""
    spark = df.sparkSession
    if parts is None:
        try:
            parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            parts = spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(group_col), F.col(order_col))
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    within = F.coalesce(
        F.sum(weight_col).over(
            Window.partitionBy("__pid", group_col)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    offs = (
        with_pid.groupBy("__pid", group_col)
        .agg(F.sum(weight_col).cast("long").alias("__w"))
        .select(
            "__pid",
            group_col,
            F.coalesce(
                F.sum("__w").over(
                    Window.partitionBy(group_col)
                    .orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ).alias("__off"),
        )
    )
    return (
        with_pid.join(F.broadcast(offs), ["__pid", group_col])
        .withColumn(out_col, F.col("__off") + within)
        .drop("__pid", "__off")
    )

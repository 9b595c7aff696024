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

from ..session import shuffle_width


def _join_nullsafe(
    df: DataFrame, other: DataFrame, keys: list[str], broadcast: bool = False
) -> DataFrame:
    """Inner join on ``keys`` with NULL-SAFE equality (``<=>``), keeping
    only ``df``'s copy of the key columns. A plain equi-join silently
    drops rows whose key is NULL — the window forms these helpers are
    value-identical to instead rank NULLs first (ASC) / last (DESC),
    which the histogram side already reproduces (its groupBy keeps a
    NULL group and the histogram window orders it with Spark's default
    null placement); the join back must not lose those rows (ADVICE r8).
    Null-safe equality still plans as a hash join (one shuffle, or a
    broadcast when ``other`` is marked)."""
    renames = {k: f"__rhs_{k}" for k in keys}
    rhs = other
    for k, rk in renames.items():
        rhs = rhs.withColumnRenamed(k, rk)
    if broadcast:
        rhs = F.broadcast(rhs)
    cond = None
    for k, rk in renames.items():
        c = F.col(k).eqNullSafe(F.col(rk))
        cond = c if cond is None else cond & c
    return df.join(rhs, cond).drop(*renames.values())


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
    the total order to be total.

    The weight's type is PRESERVED (integral sums stay integral,
    fractional stay fractional — ADVICE r8 fixed a silent
    cast-to-long of the cross-value component); for floating-point
    weights the decomposition reassociates the summation, so results
    match the window form up to float addition order (exact for
    integral and decimal types). NULL ``order_col`` rows are kept and
    ranked with Spark's window null placement (nulls first ASC / last
    DESC) via the null-safe join back."""
    okey = F.col(order_col).desc() if desc else F.col(order_col).asc()
    hist = (
        df.groupBy(order_col)
        .agg(F.sum(weight_col).alias("__grp_w"))
        .select(
            order_col,
            F.coalesce(
                F.sum("__grp_w").over(
                    Window.orderBy(okey).rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__w_above"),
        )
    )
    within = F.coalesce(
        F.sum(weight_col).over(
            Window.partitionBy(order_col)
            .orderBy(tiebreak_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        _join_nullsafe(df, hist, [order_col])
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
    unique per value. NULL ``order_col`` rows are kept (null-safe join
    back) and bucketed per Spark's window null placement."""
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
        _join_nullsafe(df, hist, [order_col])
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
    broadcast).

    The numbering pass and the count pass are two consumers of the
    same pid assignment, so they MUST observe identical partition
    boundaries. The pid-tagged frame is persisted before the fork:
    Spark's CacheManager substitutes one InMemoryRelation for both
    logical occurrences, and the cached RDD's range partitioner is
    built exactly once — cross-consumer pid identity is by
    construction, not a bet on physical exchange reuse or on the
    boundary sampler's seeding (ADVICE r8; the reuse-disabled case is
    pinned by tests/test_ranks.py). With unique keys the result is
    also independent of where the boundaries land. The persisted
    frame (MEMORY_AND_DISK) is reclaimed by Spark's ContextCleaner
    once the returned plan is garbage-collected."""
    spark = df.sparkSession
    if parts is None:
        parts = shuffle_width(spark)
    ranged = df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).persist()
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
    within a group; the weight's type is preserved (fractional
    weights match the window form up to float addition order — ADVICE
    r8), NULL groups are kept via the null-safe offset join, and like
    :func:`ordered_row_number` the pid-tagged frame is persisted
    before the fork so both consumers read one cached partitioner —
    by-construction pid identity, not physical-plan reuse."""
    spark = df.sparkSession
    if parts is None:
        parts = shuffle_width(spark)
    ranged = df.repartitionByRange(parts, F.col(group_col), F.col(order_col))
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).persist()
    within = F.coalesce(
        F.sum(weight_col).over(
            Window.partitionBy("__pid", group_col)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    offs = (
        with_pid.groupBy("__pid", group_col)
        .agg(F.sum(weight_col).alias("__w"))
        .select(
            "__pid",
            group_col,
            F.coalesce(
                F.sum("__w").over(
                    Window.partitionBy(group_col)
                    .orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__off"),
        )
    )
    return (
        _join_nullsafe(with_pid, offs, ["__pid", group_col], broadcast=True)
        .withColumn(out_col, F.col("__off") + within)
        .drop("__pid", "__off")
    )

"""Gap-based sessionization over the events table (SURVEY.md §2.9 /
event-time analytics). Batch form of what Structured Streaming's
session_window does with state.

Shape: lag → gap flag → per-key running sum (the classic islands
trick). One shuffle on user_id; both window passes share the same
partitioning so Catalyst plans a single Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame, gap_minutes: int = 30, parts: int | None = None
) -> DataFrame:
    """Assign session ids per user (new session when the gap since the
    previous event exceeds ``gap_minutes``) and aggregate per session.

    Gap arithmetic is exact integer microseconds so any engine
    reproduces it bit-for-bit. Returns one row per session:
    (user_id, session_id, n_events, session_start, session_end,
    duration_s).

    The user_id shuffle width is PINNED with an explicit repartition
    (round-9 gap attribution): the window stage is CPU-dense per
    shuffle byte — a few narrow columns carry two window passes plus
    the aggregate — so AQE's byte-based coalescing (64 MB advisory)
    collapsed it to ONE task at the ×30 tier (8.3 s of the query's
    8.9 s wall in a single task, 6% utilization). Same class as the
    round-8 SemDeDup pair-join pin. A user-specified repartition is
    exempt from AQE coalescing; both window passes and the session
    aggregate reuse its partitioning, so the plan still has exactly
    one exchange. Measured ×30: 8.87 s → 1.66 s wall.
    """
    spark = events.sparkSession
    if parts is None:
        try:
            parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            parts = spark.sparkContext.defaultParallelism
    events = events.repartition(parts, "user_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = int(gap_minutes) * 60 * 1_000_000
    with_flag = events.withColumn(
        "__new_session",
        F.when(
            (us - F.lag(us).over(w_order)).isNull()
            | ((us - F.lag(us).over(w_order)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_id = with_flag.withColumn(
        "session_id", F.sum("__new_session").over(w_run).cast("long")
    )
    return (
        with_id.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (
                (
                    F.max(F.unix_micros(F.col("ts").cast("timestamp")))
                    - F.min(F.unix_micros(F.col("ts").cast("timestamp")))
                ).cast("double")
                / F.lit(1_000_000.0)
            ).alias("duration_s"),
        )
    )


def interval_coactivity_pairs(
    events: DataFrame,
    event_type: str = "purchase",
    min_events: int = 2,
    bin_us: int = 3_600_000_000,
) -> DataFrame:
    """BUCKETED interval-overlap self-join (the bin-based range-join
    technique): build per-(user, day) activity intervals
    [first, last] of the given event type (users with ≥ ``min_events``
    that day), then count, per day, the unordered user pairs whose
    intervals OVERLAP — co-activity detection.

    The scale move is the equi-join surrogate for the range predicate:
    each interval explodes into the HOUR BINS it spans (≤ 24 rows,
    bounded), candidate pairs form by (day, hour) equi-join — never a
    per-day cross join — and the exact overlap predicate
    (s₁ ≤ e₂ ∧ s₂ ≤ e₁) then verifies candidates. Completeness:
    overlapping intervals share the hour of max(s₁,s₂), so every true
    pair appears in ≥1 shared bin; pairs meeting in several bins are
    deduped by DISTINCT. Candidate volume is Σ_bin n_bin² instead of
    Σ_day n_day² — ``bin_us`` is the knob (1 h default; shrink toward
    the typical interval length as density grows), exactly how
    production bin-based range joins are tuned: cost is candidates
    (Σ_bin n²), and the x100-tier A/B in PERF.md measures the knob
    (hour bins 41 s → 10-min bins 12 s at identical output).

    Exact integer microsecond endpoints; returns (day, n_pairs)."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = (
        events.filter(F.col("event_type") == event_type)
        .select(F.to_date("ts").alias("day"), "user_id", us.alias("t"))
        .groupBy("day", "user_id")
        .agg(
            F.min("t").alias("s"),
            F.max("t").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= min_events)
        .drop("n")
    )
    binned = iv.withColumn(
        "hour",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / F.lit(int(bin_us))),
                F.floor(F.col("e") / F.lit(int(bin_us))),
            )
        ),
    )
    a = binned.select("day", "hour", F.col("user_id").alias("u1"),
                      F.col("s").alias("s1"), F.col("e").alias("e1"))
    b = binned.select("day", "hour", F.col("user_id").alias("u2"),
                      F.col("s").alias("s2"), F.col("e").alias("e2"))
    pairs = (
        a.join(b, ["day", "hour"])
        .filter(
            (F.col("u1") < F.col("u2"))
            & (F.col("s1") <= F.col("e2"))
            & (F.col("s2") <= F.col("e1"))
        )
        .select("day", "u1", "u2")
        .distinct()
    )
    return pairs.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )


def interval_coactivity_counts(
    events: DataFrame,
    event_type: str = "purchase",
    min_events: int = 2,
) -> DataFrame:
    """COUNT overlapping same-day interval pairs WITHOUT materializing
    them — the O(n log n) counting complement to
    interval_coactivity_pairs (use that when downstream needs the pair
    list; use this for the metric): per day,

        n_overlap = C(n,2) − #{(a,b) : e_a < s_b}

    and the disjoint-pair count is a MERGE RANK: sort every start and
    end on one per-day timeline (starts before ends at equal t — the
    overlap predicate is inclusive, s_b ≤ e_a overlaps) and give each
    START the running count of ENDS strictly before it. Each disjoint
    unordered pair is counted exactly once, under its earlier-ending
    orientation. This is the same endpoint-sweep family as
    concurrent_open_orders, and the plan DuckDB's specialized
    IEJoin gets for free — expressed in Spark as one per-day window
    over 2n endpoint rows. Exact integer µs endpoints; returns
    (day, n_pairs), identical values to the pair-materializing plan
    (the registry pins both to the same oracle)."""
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = (
        events.filter(F.col("event_type") == event_type)
        .select(F.to_date("ts").alias("day"), "user_id", us.alias("t"))
        .groupBy("day", "user_id")
        .agg(F.min("t").alias("s"), F.max("t").alias("e"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_events)
        .drop("n")
    )
    endpoints = iv.select(
        "day", F.col("s").alias("t"), F.lit(0).alias("kind")
    ).unionByName(iv.select("day", F.col("e").alias("t"), F.lit(1).alias("kind")))
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t").asc(), F.col("kind").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    disjoint = (
        endpoints.withColumn("ends_before", F.sum("kind").over(w))
        .filter(F.col("kind") == 0)
        .groupBy("day")
        .agg(F.sum("ends_before").cast("long").alias("n_disjoint"))
    )
    totals = iv.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        totals.join(disjoint, "day")
        .select(
            "day",
            (F.col("n") * (F.col("n") - 1) / 2 - F.col("n_disjoint"))
            .cast("long")
            .alias("n_pairs"),
        )
        .filter(F.col("n_pairs") > 0)
    )

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

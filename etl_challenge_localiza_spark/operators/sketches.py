"""Misra-Gries heavy-hitter sketch — the deterministic counter-based
frequent-items summary, distributed the way a 100 TB run needs it:

1. each partition builds an independent k-counter MG summary in ONE
   Arrow-batched pass (mapInPandas — bounded memory: k counters no
   matter how many rows the partition holds);
2. summaries MERGE by itemwise count sum followed by the standard
   re-truncation (subtract the (k+1)-th largest merged count, drop
   non-positive) — expressed as a hash aggregate + one tiny window,
   so the reduce side shuffles at most (#partitions × k) rows, never
   the data.

Guarantee (classic MG, survives merging): every reported count
undercounts its true frequency by at most n/(k+1) where n is the total
row count, and every item with true count > n/(k+1) is present in the
sketch. pytest asserts both bounds against exact counts, plus
merge-consistency: sketching partitioned data then merging obeys the
same bound as a single-pass sketch.

Complements the existing approximate operators (HLL distincts,
approx_percentile quantiles) with the frequent-items member of the
mergeable-summaries family.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_partition_summary(col: str, k: int):
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "est": list(counters.values())}
            )

    return run


def misra_gries_topk(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """Return (item, est_count) for up to ``k`` heavy hitters of
    ``col``. ``est_count`` undercounts by at most n/(k+1); items more
    frequent than that are guaranteed present."""
    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        _mg_partition_summary(col, k), schema="item string, est long"
    )
    merged = summaries.groupBy("item").agg(F.sum("est").alias("est"))
    # re-truncate to k counters: subtract the (k+1)-th largest count
    # (0 if fewer), drop non-positive — the (#partitions*k)-row frame
    # makes this window trivially cheap at any data scale
    w = Window.orderBy(F.col("est").desc(), F.col("item"))
    ranked = merged.withColumn("__rank", F.row_number().over(w))
    # always exactly ONE row: the (k+1)-th count, or null when fewer
    # than k+1 merged items exist (→ subtract 0)
    kth = ranked.agg(
        F.max(F.when(F.col("__rank") == k + 1, F.col("est"))).alias("__kth")
    )
    return (
        ranked.crossJoin(F.broadcast(kth))
        .select(
            "item",
            (F.col("est") - F.coalesce("__kth", F.lit(0))).alias("est_count"),
            "__rank",
        )
        .filter((F.col("est_count") > 0) & (F.col("__rank") <= k))
        .select("item", F.col("est_count").cast("long").alias("est_count"))
    )

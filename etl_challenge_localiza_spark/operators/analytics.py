"""The reference's analytics queries as DataFrame plans
(SURVEY.md §2.4 A1, §2.5 W1, §2.6 O1/O2, §2.2 P13-P16).

Reference SQL: flows/pipeline.py:178-211 (DuckDB). Here each query is a
lazy plan over the cleaned transactions DataFrame:

- region_risk_avg   → filter + hash-aggregate + sort (A1/P13/O1)
- last_sale_per_address → filter + window row_number + rank filter
  (W1/P14/P15/P16)
- top3_recent_sales → TakeOrderedAndProject (O2) — Spark computes a
  per-partition top-k then merges on the driver; no global sort even
  at 100 TB.

Scale notes: the groupBy and the window both shuffle on their keys;
with AQE on, post-shuffle partitions coalesce to the real data size.
The `transaction_type = 'sale'` filter sits UNDER the window exchange
so only sale rows shuffle (flows/pipeline.py:198 does the same).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def region_risk_avg(df: DataFrame) -> DataFrame:
    """avg(risk_score) per location_region, NULL regions excluded,
    ordered desc (flows/pipeline.py:178-186)."""
    return (
        df.filter(F.col("location_region").isNotNull())
        .groupBy("location_region")
        .agg(F.avg("risk_score").alias("avg_risk_score"))
        .orderBy(F.col("avg_risk_score").desc())
    )


def last_sale_per_address(
    df: DataFrame,
    sale_value: str = "sale",
    tiebreaker: str | None = None,
) -> DataFrame:
    """Latest sale per receiving_address (flows/pipeline.py:189-203).

    ``tiebreaker``: extra descending order column after timestamp.
    Equal timestamps within an address are broken arbitrarily in BOTH
    the reference and Spark (SURVEY.md §7.4.4); pass e.g. a row id for
    deterministic results.
    """
    order = [F.col("timestamp").desc()]
    if tiebreaker is not None:
        order.append(F.col(tiebreaker).desc())
    w = Window.partitionBy("receiving_address").orderBy(*order)
    return (
        df.filter(F.col("transaction_type") == sale_value)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("receiving_address", "amount", "timestamp")
    )


def top3_recent_sales(
    last_sales: DataFrame, k: int = 3, tiebreaker: str | None = None
) -> DataFrame:
    """Top-k of the per-address latest sales by amount
    (flows/pipeline.py:205-211). orderBy().limit(k) plans as
    TakeOrderedAndProject — no global sort. ``tiebreaker``: ascending
    secondary order column for deterministic selection on equal amounts."""
    order = [F.col("amount").desc()]
    if tiebreaker is not None:
        order.append(F.col(tiebreaker).asc())
    return last_sales.orderBy(*order).limit(k)

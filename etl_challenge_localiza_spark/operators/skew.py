"""Skew mitigation: salted join (SURVEY.md §7.4.8; the manual
counterpart to AQE's skew-join splitting, for when a single hot key
overwhelms one shuffle partition even after AQE).

Technique: the build (dim) side is replicated once per salt value; the
probe (fact) side derives a deterministic salt from a high-cardinality
column, so each hot key's rows spread over ``n_salts`` partitions. The
join result is IDENTICAL to the unsalted join — which is exactly how
the registry verifies it (the oracle is the plain SQL join).

Use when: key frequency is power-law (user events, null-ish defaults)
and the hot keys are not broadcastable away. Cost: build side grows
×n_salts — keep n_salts small (8-32) and the build side slim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str,
    n_salts: int = 8,
    how: str = "inner",
    force_shuffle: bool = False,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` with the fact side salted on
    xxhash64(salt_source) % n_salts and the dim side replicated.

    ``salt_source`` must be a (near-)unique fact column (an id) so the
    salt spreads rows evenly and deterministically. ``force_shuffle``
    hints SHUFFLE_HASH — if Spark would broadcast the dim there is no
    skew to mitigate and salting is pointless, so demos/tests force the
    shuffle path the technique exists for.
    """
    spark = fact.sparkSession
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)).cast("int")
    )
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    dim_s = dim.crossJoin(salts)
    if force_shuffle:
        dim_s = dim_s.hint("shuffle_hash")
    out = fact_s.join(
        dim_s,
        (fact_s[fact_key] == dim_s[dim_key]) & (fact_s["__salt"] == dim_s["__salt"]),
        how,
    )
    return out.drop("__salt")

"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (the reference's region_risk_avg
  shape, flows/pipeline.py:178-186, over the mapped events table) at
  sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 / §2.9,
  one entry per registry query.
- ``oracle_sql()``: the DuckDB-ANSI equivalent for each SQL-expressible
  query (hash-based ops — minhash/simhash/BRP-LSH — are rows-only by
  design; engine hash functions differ).

All logic lives in ``etl_challenge_localiza_spark``; this module is a
thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable regardless of the caller's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_challenge_localiza_spark.registry import QUERIES  # noqa: E402

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["region_risk_avg"].fn(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for non-SQL-
    expressible hash/LSH ops → driver rows-only check)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}

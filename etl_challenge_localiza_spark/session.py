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
    # 16 MB advisory post-shuffle partition size (default 64 MB).
    # Byte-based coalescing under-parallelizes CPU-DENSE small-byte
    # stages: at the ×30 tier, 64 MB collapsed user_sessions' window
    # stage to one task and q9/q21/q5's join-agg stages to 2-7 tasks
    # (round-9 gap attribution; 2-6× wall on that class at 16 MB,
    # sf0.1 bench unchanged). At cluster scale this can only INCREASE
    # small-stage parallelism: coalescing merges partitions up to the
    # advisory size and never splits, so large shuffles — already at
    # or above the initial partition count — are unaffected.
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.shuffle.partitions": str(DEFAULT_CPUS),
    # The events table stores TIMESTAMP(NANOS) parquet, which Spark has
    # no native type for; read the raw int64 and convert to micros in
    # sources.readers.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def shuffle_width(spark: SparkSession) -> int:
    """``spark.sql.shuffle.partitions`` as an int, falling back to
    ``defaultParallelism`` when the conf is unset or non-numeric
    (e.g. ``"auto"`` on AQE-managed clusters) — the guarded lookup
    every explicit-width repartition site shares (r11 advisor:
    bootstrap_ci_mean raised ValueError on a non-numeric conf while
    ranks.grouped_prefix_sum already guarded the same lookup)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return spark.sparkContext.defaultParallelism


#: cache of dataset-size-derived shuffle-partition choices per sf_dir
#: (one os.walk per directory per process).
_SF_PARTS: dict[str, int] = {}


def _partitions_for(sf_dir: str) -> int:
    """Size ``spark.sql.shuffle.partitions`` to the dataset, not the
    machine.

    At sf<=0.1 the whole input is ~20 MB; 32-way shuffles of KB-sized
    partitions are pure dispatch overhead across every stage of a
    multi-stage plan. One initial partition per ~4 MB of input, floored
    at 16 and capped at the core count: measured at sf0.1, 8 starves
    reduce-side parallelism on window/join-heavy queries (asof_latest
    +0.7 s) while 32 taxes the 6-stage shingle pipeline with per-task
    overhead (ngram_jaccard +0.7 s); 16 is within noise of the best
    setting for both. At cluster scale the byte count pushes the value
    to the cap and AQE coalescing governs post-shuffle parallelism.
    """
    parts = _SF_PARTS.get(sf_dir)
    if parts is None:
        total = 0
        try:
            for root, _dirs, files in os.walk(sf_dir):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        except OSError:
            pass
        parts = max(16, min(DEFAULT_CPUS, total // (4 << 20)))
        _SF_PARTS[sf_dir] = parts
    return parts


def tune(spark: SparkSession, sf_dir: str | None = None) -> SparkSession:
    """Apply runtime-mutable confs to an existing session.

    Used at the top of every public query entry point so behavior is
    stable even when the caller (test driver) built its own session.
    When ``sf_dir`` is given, shuffle partitions are sized to the
    dataset (see :func:`_partitions_for`).
    """
    conf = dict(RUNTIME_CONF)
    if sf_dir is not None:
        conf["spark.sql.shuffle.partitions"] = str(_partitions_for(sf_dir))
    for k, v in conf.items():
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

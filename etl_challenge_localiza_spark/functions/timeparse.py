"""Epoch-unit detection and timestamp parsing (SURVEY.md §2.2 P5-P9).

Reference (flows/pipeline.py:25-37,130-141):

- A timestamp column "looks numeric" when its dtype is numeric OR every
  non-null value matches ``^\\d+(\\.\\d+)?$``.
- For numeric columns the unit is chosen from ``median(abs(value))``:
  > 1e17 → ns, > 1e14 → us, > 1e11 → ms, else s (empty → s).
- Numeric path: to_datetime(value, unit, utc); string path:
  to_datetime(value, errors="coerce", utc).

Spark-first shape: unit detection is inherently a 2-pass, data-dependent
decision, so it is a tiny driver-side aggregate (ONE job computing the
median) followed by a single declarative cast — not a UDF. At 100 TB
the median pass reads only the one column (column pruning) and the
thresholds are decades apart, so ``median`` could be swapped for
``percentile_approx`` with no behavior change; we keep exact median for
bit-parity with the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: epoch value → seconds divisor per unit.
EPOCH_DIVISORS = {"s": 1.0, "ms": 1e3, "us": 1e6, "ns": 1e9}

#: the reference's all-digits test (flows/pipeline.py:133).
NUMERIC_RE = r"^\d+(\.\d+)?$"


def detect_timestamp_unit(df: DataFrame, col: str = "timestamp") -> str:
    """P5: median(abs(try_cast(col as double))) → unit thresholds
    exactly 1e17/1e14/1e11; empty/all-null → "s"
    (flows/pipeline.py:25-37).

    The median is ``approx_percentile`` (accuracy 10000 → rank error
    ≤ N/10000), not Spark's exact ``median``: exact percentile
    aggregation buffers every distinct value per partition and merges
    the maps — unbounded state over high-cardinality epoch columns,
    a driver/executor OOM at corpus scale (round-9 measurement: the
    exact median was most of a +36 s epoch-branch overhead on 10M
    rows). For UNIT DETECTION the approximation is behaviorally
    identical: the thresholds are three decades apart, so a ≤0.01%
    rank error changes the verdict only if the distribution straddles
    a decade boundary at its median — mixed-unit data on which no
    single unit is right anyway. Small inputs (< accuracy) are exact,
    so reference parity on the pytest fixtures is bit-for-bit."""
    row = df.select(
        F.expr(
            f"approx_percentile(abs(try_cast(`{col}` as double)), 0.5, 10000)"
        ).alias("m")
    ).first()
    m = row["m"] if row is not None else None
    if m is None:
        return "s"
    if m > 1e17:
        return "ns"
    if m > 1e14:
        return "us"
    if m > 1e11:
        return "ms"
    return "s"


def looks_numeric(df: DataFrame, col: str = "timestamp") -> bool:
    """P6: numeric dtype OR all non-null values match ^\\d+(\\.\\d+)?$
    (flows/pipeline.py:133).

    The regex check is a single filter+isEmpty job; Catalyst prunes to
    the one column and short-circuits on the first counterexample.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        return False
    if dtype in ("tinyint", "smallint", "int", "bigint", "float", "double") or dtype.startswith(
        "decimal"
    ):
        return True
    if dtype.startswith("timestamp") or dtype in ("date",):
        return False
    c = F.col(col)
    return df.filter(c.isNotNull() & ~c.cast("string").rlike(NUMERIC_RE)).isEmpty()


def parse_epoch(col: Column | str, unit: str) -> Column:
    """P7: epoch number (possibly fractional) in ``unit`` → timestamp.

    Spark's timestamp resolution is microseconds, so we convert to an
    exact micros integer. Integer inputs (the common case — pandas
    ``to_numeric`` keeps all-integer columns as int64 too) take an
    exact long/decimal path: a double would silently lose sub-µs
    precision for ns epochs (2^53 < 1e18). Fractional inputs fall back
    to a rounded double path, mirroring pandas' float handling.
    """
    c = F.col(col) if isinstance(col, str) else col
    lng = c.try_cast("long")
    dbl = c.try_cast("double")
    if unit == "ns":
        # exact truncating ns→µs division: integer `div` truncates
        # toward zero, bit-identical to the previous decimal(38,0)
        # divide-then-cast across the full int64 domain (fuzz-checked)
        # and to DuckDB's read-time truncation of TIMESTAMP_NS — at a
        # fraction of the per-row cost (no 128-bit decimal temporary)
        int_path = F.call_function("div", lng, F.lit(1000))
        dbl_path = (dbl / F.lit(1000.0)).cast("long")
    else:
        mult = int(1e6 // EPOCH_DIVISORS[unit])  # s→1e6, ms→1e3, us→1
        int_path = lng * F.lit(mult)
        dbl_path = F.round(dbl * F.lit(float(mult))).cast("long")
    micros = F.when(lng.isNotNull(), int_path).otherwise(dbl_path)
    # Clamp to the Python/pandas-representable window (years 1..9999):
    # pandas raises OutOfBoundsDatetime on such epochs (the reference
    # would crash, flows/pipeline.py:137 passes no errors=); we extend
    # the coerce-to-null policy instead so one absurd cell can't kill a
    # 100 TB batch.
    lo, hi = -62_135_596_800_000_000, 253_402_300_800_000_000
    micros = F.when(micros.between(lo, hi - 1), micros)
    return F.timestamp_micros(micros)


def parse_timestamp_string(col: Column | str) -> Column:
    """P8: datetime-string path — null on failure (errors="coerce",
    flows/pipeline.py:138-139). try_to_timestamp keeps coerce semantics
    even under ANSI mode. Spark parses bare huge years ('10000') that
    pandas coerces to NaT — the same years-1..9999 clamp as the epoch
    path keeps both the parity and collectability."""
    c = F.col(col) if isinstance(col, str) else col
    ts = F.try_to_timestamp(c.cast("string"))
    lo, hi = -62_135_596_800_000_000, 253_402_300_800_000_000
    return F.when(F.unix_micros(ts).between(lo, hi - 1), ts)


def parse_timestamp_auto(df: DataFrame, col: str = "timestamp") -> DataFrame:
    """P5-P9 composed: detect numeric-vs-string, detect unit, parse.

    Missing column → all-NULL timestamp column (P9,
    flows/pipeline.py:140-141). Returns a new DataFrame with ``col``
    replaced by a UTC timestamp column.
    """
    if col not in df.columns:
        return df.withColumn(col, F.lit(None).cast("timestamp"))
    dtype = dict(df.dtypes)[col]
    if dtype.startswith("timestamp"):
        return df  # already parsed
    if looks_numeric(df, col):
        unit = detect_timestamp_unit(df, col)
        return df.withColumn(col, parse_epoch(F.col(col), unit))
    return df.withColumn(col, parse_timestamp_string(F.col(col)))

"""Mini DuckDB-oracle harness mirroring the driver's correctness gate:
run each registry query in Spark AND its oracle SQL in DuckDB on the
same parquet tables, compare row-count + column names + order-
insensitive values.

Usable as a library from pytest and as a CLI for fast iteration:

    python -m tests.oracle_harness --sf /root/testdata/sf0.001 [names...]
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime

import duckdb
import pandas as pd

from etl_challenge_localiza_spark.sources.readers import TESTDATA_TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"create view {t} as select * from '{path}'")
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)  # exact double repr — we engineered determinism
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (int,)) or type(v).__module__ == "numpy":
        try:
            if pd.isna(v):
                return "∅"
        except (TypeError, ValueError):
            pass
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, float):
            return repr(v)
        return str(v)
    return str(v)


def canon_rows(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    return cols, rows


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return list of problems (empty → match)."""
    problems: list[str] = []
    scols, srows = canon_rows(spark_pdf)
    ocols, orows = canon_rows(oracle_pdf)
    if scols != ocols:
        problems.append(f"columns differ: spark={scols} oracle={ocols}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"row count differs: spark={len(srows)} oracle={len(orows)}")
    mismatches = [
        (i, s, o) for i, (s, o) in enumerate(zip(srows, orows)) if s != o
    ]
    if mismatches:
        i, s, o = mismatches[0]
        problems.append(
            f"{len(mismatches)} row mismatches (sorted); first at {i}:\n"
            f"  spark : {s}\n  oracle: {o}\n  cols  : {scols}"
        )
    return problems


def run_checks(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    from etl_challenge_localiza_spark.registry import QUERIES

    con = duck_con(sf_dir)
    failures: dict[str, list[str]] = {}
    for name, q in QUERIES.items():
        if names and name not in names:
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures[name] = [f"spark execution failed: {type(e).__name__}: {e}"]
            continue
        if q.oracle is None:
            # rows-only check: must execute and produce a stable schema
            print(f"  [rows-only] {name}: {len(spark_pdf)} rows")
            continue
        try:
            oracle_pdf = con.sql(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures[name] = [f"oracle SQL failed: {type(e).__name__}: {e}"]
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failures[name] = problems
        else:
            print(f"  [match] {name}: {len(spark_pdf)} rows")
    return failures


def main() -> int:
    sf_dir = "/root/testdata/sf0.001"
    names: list[str] = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf_dir = args.pop(0)
        else:
            names.append(a)
    from etl_challenge_localiza_spark.session import get_spark

    spark = get_spark(cpus=8)
    failures = run_checks(spark, sf_dir, names or None)
    for name, probs in failures.items():
        print(f"FAIL {name}:")
        for p in probs:
            print(f"    {p}")
    print(f"{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

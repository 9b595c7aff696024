"""Unit tests for P5-P9 epoch detection/parsing (SURVEY.md §2.2)."""

from __future__ import annotations

import datetime as dt

from etl_challenge_localiza_spark.functions.timeparse import (
    detect_timestamp_unit,
    looks_numeric,
    parse_timestamp_auto,
)

UTC = dt.timezone.utc


def _parse_one(spark, value):
    df = spark.createDataFrame([(value,)], ["timestamp"])
    row = parse_timestamp_auto(df, "timestamp").first()
    ts = row["timestamp"]
    return ts.replace(tzinfo=None) if ts is not None else None


def test_unit_thresholds(spark):
    """Boundary behavior exactly at 1e11/1e14/1e17 (strict >)."""
    cases = [
        ("1000000000", "s"),
        ("100000000000", "s"),       # == 1e11 → s (strict >)
        ("100000000001", "ms"),
        ("100000000000000", "ms"),   # == 1e14 → ms
        ("100000000000001", "us"),
        ("100000000000000000", "us"),  # == 1e17 → us
        # NB 1e17+1 rounds to 1e17 as a double → still 'us'; pandas'
        # astype(float).median() behaves identically (flows/pipeline.py:29).
        ("200000000000000000", "ns"),
    ]
    for raw, want in cases:
        df = spark.createDataFrame([(raw,)], ["timestamp"])
        assert detect_timestamp_unit(df, "timestamp") == want, raw


def test_unit_empty_defaults_to_s(spark):
    df = spark.createDataFrame([(None,), ("junk",)], schema="timestamp string")
    assert detect_timestamp_unit(df, "timestamp") == "s"


def test_epoch_units_roundtrip_identical(spark):
    """The same instant in s/ms/us/ns parses to the same timestamp
    (FIXTURES.md transactions_epoch_{s,ms,us,ns})."""
    base_s = 1_700_000_000
    expect = dt.datetime(2023, 11, 14, 22, 13, 20)
    for mult in (1, 10**3, 10**6, 10**9):
        got = _parse_one(spark, str(base_s * mult))
        assert got == expect, mult


def test_fractional_seconds(spark):
    got = _parse_one(spark, "1700000000.25")
    assert got == dt.datetime(2023, 11, 14, 22, 13, 20, 250000)


def test_string_datetime_path_and_coerce(spark):
    df = spark.createDataFrame(
        [("2024-01-02 03:04:05",), ("not a date",)], ["timestamp"]
    )
    out = [r["timestamp"] for r in parse_timestamp_auto(df, "timestamp").collect()]
    assert out[0].replace(tzinfo=None) == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert out[1] is None  # errors="coerce" (flows/pipeline.py:139)


def test_looks_numeric(spark):
    num = spark.createDataFrame([("123",), ("4.5",)], ["timestamp"])
    mixed = spark.createDataFrame([("123",), ("2024-01-01",)], ["timestamp"])
    assert looks_numeric(num, "timestamp") is True
    assert looks_numeric(mixed, "timestamp") is False


def test_missing_column_gives_nulls(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    row = parse_timestamp_auto(df, "timestamp").first()
    assert row["timestamp"] is None

"""Unit tests for P1-P12 + D1 (SURVEY.md §2.2-2.3) on literal frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_challenge_localiza_spark.functions.cleaning import clean_string, normalize_column_names
from etl_challenge_localiza_spark.operators.cleaning import clean_transactions, dedup_exact


def test_normalize_column_names(spark):
    df = spark.createDataFrame([(1, 2)], [" Receiving Address ", "AMOUNT"])
    assert normalize_column_names(df).columns == ["receiving_address", "amount"]


def test_clean_string_sentinels_and_trim(spark):
    df = spark.createDataFrame(
        [(" x ",), ("",), ("nan",), ("None",), (None,), ("  ",)], ["c"]
    )
    out = [r[0] for r in df.select(clean_string("c").alias("c")).collect()]
    assert out == ["x", None, None, None, None, None]


def test_clean_string_lowercase_order(spark):
    # reference order is strip→lower→replace (flows/pipeline.py:123):
    # 'NAN' lowers to 'nan' and is nulled; trimming applies first.
    df = spark.createDataFrame([("  SALE ",), ("NAN",), ("Sale",)], ["c"])
    out = [r[0] for r in df.select(clean_string("c", lowercase=True).alias("c")).collect()]
    assert out == ["sale", None, "sale"]


def test_clean_string_zero_token(spark):
    df = spark.createDataFrame([("0",), ("00",)], ["c"])
    out = [
        r[0]
        for r in df.select(clean_string("c", extra_null_tokens=("0",)).alias("c")).collect()
    ]
    assert out == [None, "00"]


def test_clean_transactions_drops_and_filters(spark):
    rows = [
        # ts,            type,     amount,  addr,      region, risk
        ("1700000000", " SALE ", "10.5", " a1 ", "north", "5"),
        (None, "sale", "1.0", "a2", "south", "1"),          # null ts → drop
        ("1700000001", "", "1.0", "a3", "east", "1"),       # sentinel type → drop
        ("1700000002", "sale", "-4", "a4", "west", "1"),    # negative → drop
        ("1700000003", "sale", "bogus", "a5", "west", "1"), # uncastable → drop
        ("1700000004", "refund", "2.0", "a6", "0", "xx"),   # region 0→null, risk→null; kept
    ]
    df = spark.createDataFrame(
        rows,
        ["timestamp", "transaction_type", "amount", "receiving_address", "location_region", "risk_score"],
    )
    out = clean_transactions(df).orderBy("timestamp").collect()
    assert len(out) == 2
    first, second = out
    assert first["transaction_type"] == "sale"
    assert first["receiving_address"] == "a1"
    assert first["amount"] == 10.5
    assert first["timestamp"].year == 2023
    assert second["location_region"] is None
    assert second["risk_score"] is None


def test_clean_transactions_missing_columns(spark):
    # absent timestamp/amount → all-null columns → every row dropped (P9)
    df = spark.createDataFrame([("sale",)], ["transaction_type"])
    assert clean_transactions(df).count() == 0


def test_dedup_keep_first_deterministic(spark):
    rows = [
        ("k1", 1, "keepme"),
        ("k1", 2, "dropme"),
        ("k2", 3, "only"),
    ]
    df = spark.createDataFrame(rows, ["k", "ord", "payload"])
    out = {r["k"]: r["payload"] for r in dedup_exact(df, ["k"], order_col="ord").collect()}
    assert out == {"k1": "keepme", "k2": "only"}


def test_dedup_default_any_row(spark):
    df = spark.createDataFrame([("k", 1), ("k", 1), ("j", 2)], ["k", "v"])
    assert dedup_exact(df, ["k", "v"]).count() == 2


def test_clean_idempotent(spark):
    """Property: clean(clean(x)) == clean(x) (SURVEY.md §5.2.5)."""
    rows = [
        ("1700000000", " SALE ", "10.5", " a1 ", "north", "5"),
        ("1700000004", "refund", "2.0", "a6", "0", "7"),
        ("1700009999", "Sale", "3.25", "nan", "None", "nan"),
    ]
    df = spark.createDataFrame(
        rows,
        ["timestamp", "transaction_type", "amount", "receiving_address", "location_region", "risk_score"],
    )
    once = clean_transactions(df)
    twice = clean_transactions(once)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b

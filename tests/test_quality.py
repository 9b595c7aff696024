"""Unit tests for the DQ profile + gates (SURVEY.md §2.4, §2.7)."""

from __future__ import annotations

import pytest

from etl_challenge_localiza_spark.operators.quality import (
    QualityGateError,
    check_gate,
    dq_profile,
    dq_profile_df,
)

COLS = ["timestamp", "transaction_type", "amount", "receiving_address", "location_region", "risk_score"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_profile_counts_and_double_counting(spark):
    rows = [
        ("1", "sale", "10", "a", "r", "1"),
        (None, None, None, None, None, None),  # violates 3 not-null rules
        ("3", "sale", "-5", "a", "r", "1"),    # negative amount
    ]
    m = dq_profile(_df(spark, rows))
    assert m["total_rows"] == 3
    assert m["nulls"] == {c: 1 for c in COLS}
    assert m["rules"]["timestamp_not_null"]["violations"] == 1
    assert m["rules"]["amount_non_negative"]["violations"] == 1
    # a single row's 3 null rules all count (SURVEY.md §7.4.5)
    assert m["failed_rows_estimate"] == 4
    assert m["conformity_rate"] == pytest.approx(max(0.0, 1 - 4 / (3 + 1e-9)))


def test_profile_amount_coercion_only(spark):
    # pre-clean nuance: amount is coerced, timestamp is NOT
    # (flows/pipeline.py:100-102): junk timestamps are not violations.
    rows = [("junkts", "sale", "xx", "a", "r", "1")]
    m = dq_profile(_df(spark, rows))
    assert m["rules"]["timestamp_not_null"]["violations"] == 0
    assert m["rules"]["amount_not_null"]["violations"] == 1  # 'xx' coerced→null


def test_profile_empty_input(spark):
    df = spark.createDataFrame([], schema="timestamp string, transaction_type string, amount string")
    m = dq_profile(df)
    assert m["total_rows"] == 0
    assert m["conformity_rate"] == 1.0  # epsilon keeps it defined (§7.4.7)


def test_profile_missing_columns(spark):
    df = spark.createDataFrame([("x",)], ["other"])
    m = dq_profile(df)
    assert m["nulls"] == {}
    assert m["rules"]["timestamp_not_null"] is None
    assert m["failed_rows_estimate"] == 0
    assert m["conformity_rate"] == 1.0


def test_profile_df_matches_dict(spark):
    rows = [("1", "sale", "-1", "a", None, "2"), (None, "x", "5", "b", "r", None)]
    m = dq_profile(_df(spark, rows))
    row = dq_profile_df(_df(spark, rows)).first()
    assert row["total_rows"] == m["total_rows"]
    assert row["failed_rows_estimate"] == m["failed_rows_estimate"]
    assert row["conformity_rate"] == m["conformity_rate"]
    assert row["nulls_location_region"] == m["nulls"]["location_region"]


def test_gates():
    check_gate({"conformity_rate": 0.99}, 0.98, "pre")  # passes
    check_gate({"conformity_rate": None}, 0.98, "pre")  # None → skip (reference if-guard)
    with pytest.raises(QualityGateError):
        check_gate({"conformity_rate": 0.97}, 0.98, "pre")


def test_observed_profile_single_pass(spark):
    """observe() collects the DQ counters during the consuming action —
    no second scan."""
    from etl_challenge_localiza_spark.operators.quality import observed_profile

    rows = [("1", "sale", "10", "a", None, "1"), (None, "x", "5", None, "r", "2")]
    df = observed_profile(_df(spark, rows))
    df.write.format("noop").mode("overwrite").save()  # the one action
    got = df._dq_observation.get
    assert got["total_rows"] == 2
    assert got["nulls_timestamp"] == 1
    assert got["nulls_location_region"] == 1


def test_compression_signals_orders_text_classes(spark):
    import hashlib
    import zlib

    from etl_challenge_localiza_spark.operators.quality import compression_signals

    repetitive = "spam ham " * 400
    prose = " ".join(
        f"Sentence {i} mentions {hashlib.md5(str(i).encode()).hexdigest()[:6]} "
        f"and speaks of topic {i * i % 97} briefly."
        for i in range(60)
    )
    noise = " ".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(120)
    )
    docs = spark.createDataFrame(
        [(1, repetitive), (2, prose), (3, noise), (4, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in compression_signals(docs).collect()}
    # exact integer check against the same stdlib compressor
    assert out[1]["deflate_bytes"] == len(zlib.compress(repetitive.encode(), 6))
    assert out[1]["n_bytes"] == len(repetitive.encode())
    # repetitive << prose < noise
    assert out[1]["compression_ratio"] < 0.05
    assert out[1]["compression_ratio"] < out[2]["compression_ratio"] < out[3]["compression_ratio"]
    assert out[3]["compression_ratio"] > 0.5
    # gate: repetitive dropped, prose kept; empty doc -> null ratio, dropped
    assert not out[1]["keep"] and out[2]["keep"]
    assert out[4]["compression_ratio"] is None and not out[4]["keep"]


def test_column_stats_generic_profile(spark):
    from datetime import datetime

    from etl_challenge_localiza_spark.operators.quality import column_stats

    rows = [
        (1, "b", 2.5, datetime(2024, 1, 1), [1, 2]),
        (2, "a", None, datetime(2024, 1, 2), None),
        (3, None, 7.5, None, [3]),
        (3, "a", 7.5, datetime(2024, 1, 2), []),
    ]
    df = spark.createDataFrame(rows, ["k", "s", "v", "t", "arr"])
    out = {r["column"]: r for r in column_stats(df).collect()}
    assert set(out) == {"k", "s", "v", "t", "arr"}
    k = out["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_num"], k["max_num"]) == (1.0, 3.0)
    assert k["min_str"] is None
    s = out["s"]
    assert (s["n_nulls"], s["n_distinct"], s["min_str"], s["max_str"]) == (1, 2, "a", "b")
    v = out["v"]
    assert (v["n_nulls"], v["min_num"], v["max_num"]) == (1, 2.5, 7.5)
    t = out["t"]
    assert t["n_nulls"] == 1 and t["min_num"] == 1704067200000000.0  # 2024-01-01 UTC µs
    arr = out["arr"]  # non-scalar: nulls/NDV only
    assert (arr["n_nulls"], arr["n_distinct"]) == (1, 3)
    assert arr["min_num"] is None and arr["min_str"] is None
    # sketch path returns the same shape with approximate NDV
    approx = {r["column"]: r for r in column_stats(df, approx_ndv=True).collect()}
    assert approx["k"]["n_distinct"] >= 2


def test_fk_integrity_audit_detects_planted_orphans(spark, tmp_path):
    import os

    from etl_challenge_localiza_spark.registry import QUERIES

    d = str(tmp_path)
    spark.createDataFrame([(1,), (2,)], ["c_custkey"]).write.parquet(
        os.path.join(d, "customer.parquet")
    )
    spark.createDataFrame([(1,), (2,)], ["n_nationkey"]).write.parquet(
        os.path.join(d, "nation.parquet")
    )
    # order 30 references custkey 99 -> orphan
    spark.createDataFrame(
        [(10, 1), (20, 2), (30, 99)], ["o_orderkey", "o_custkey"]
    ).write.parquet(os.path.join(d, "orders.parquet"))
    spark.createDataFrame([(5,)], ["p_partkey"]).write.parquet(
        os.path.join(d, "part.parquet")
    )
    # lineitem rows: one orphan orderkey, one orphan partkey
    spark.createDataFrame(
        [(10, 5), (77, 5), (20, 6)], ["l_orderkey", "l_partkey"]
    ).write.parquet(os.path.join(d, "lineitem.parquet"))
    # customer table needs a nationkey column for the 4th relationship
    import shutil
    shutil.rmtree(os.path.join(d, "customer.parquet"))
    spark.createDataFrame(
        [(1, 1), (2, 42)], ["c_custkey", "c_nationkey"]
    ).write.parquet(os.path.join(d, "customer.parquet"))
    out = {
        r["relationship"]: (r["n_child"], r["n_orphans"])
        for r in QUERIES["fk_integrity_audit"].fn(spark, d).collect()
    }
    assert out["orders.custkey->customer"] == (3, 1)
    assert out["lineitem.orderkey->orders"] == (3, 1)
    assert out["lineitem.partkey->part"] == (3, 1)
    assert out["customer.nationkey->nation"] == (2, 1)


def test_benford_audit_digit_extraction_and_missing_digit(spark):
    import os
    import tempfile
    from datetime import datetime
    from math import log10

    from etl_challenge_localiza_spark.registry import QUERIES

    # values whose first significant digits are 1,1,2,9; none start
    # with 3..8 -> those rows must appear with n=0 and observed_p=0
    rows = [
        (1, datetime(2024, 1, 1), 1, "a", 1.23, "{}"),    # FSD 1
        (2, datetime(2024, 1, 1), 1, "a", 0.19, "{}"),    # FSD 1
        (3, datetime(2024, 1, 1), 1, "a", 250.00, "{}"),  # FSD 2
        (4, datetime(2024, 1, 1), 1, "a", 0.09, "{}"),    # FSD 9
        (5, datetime(2024, 1, 1), 1, "a", 0.001, "{}"),   # below floor: excluded
        # ADVICE r6 boundary class: sub-dime values whose CENTS
        # rounding crosses a digit boundary — micros grain must report
        # the true first significant digit (0.019 -> 19000 -> 1, not
        # the cents-rounded 2; 0.095 -> 95000 -> 9)
        (6, datetime(2024, 1, 1), 1, "a", 0.019, "{}"),   # FSD 1
        (7, datetime(2024, 1, 1), 1, "a", 0.095, "{}"),   # FSD 9
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = {r["digit"]: r for r in QUERIES["benford_value_audit"].fn(spark, d).collect()}
    assert [out[i]["n"] for i in range(1, 10)] == [3, 1, 0, 0, 0, 0, 0, 0, 2]
    assert out[1]["observed_p"] == 0.5
    assert out[3]["observed_p"] == 0.0 and out[3]["chi2_term"] > 0
    assert out[1]["expected_p"] == round(log10(2), 9)

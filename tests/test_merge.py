"""Unit tests for the MERGE/upsert operator."""

from __future__ import annotations

from etl_challenge_localiza_spark.operators.merge import merge_upsert


def test_merge_upsert_insert_update_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "B", 22.0), (4, "d", 40.0)], ["id", "name", "v"]
    )
    out = {r["id"]: (r["name"], r["v"]) for r in merge_upsert(target, updates, "id").collect()}
    assert out == {
        1: ("a", 10.0),   # untouched
        2: ("B", 22.0),   # updated
        3: ("c", 30.0),   # untouched
        4: ("d", 40.0),   # inserted
    }


def test_merge_upsert_with_deletes(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    updates = spark.createDataFrame(
        [(1, None, True), (3, "c", False)], ["id", "name", "is_delete"]
    )
    out = {r["id"]: r["name"] for r in merge_upsert(target, updates, "id", "is_delete").collect()}
    assert out == {2: "b", 3: "c"}


def test_merge_idempotent(spark):
    target = spark.createDataFrame([(1, "a")], ["id", "name"])
    updates = spark.createDataFrame([(1, "A")], ["id", "name"])
    once = merge_upsert(target, updates, "id")
    twice = merge_upsert(once, updates, "id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

"""Unit tests for text analysis operators (SURVEY.md §2.9)."""

from __future__ import annotations

import hashlib

import pytest

from etl_challenge_localiza_spark.operators.textops import (
    doc_quality,
    doc_stats,
    lang_id,
    token_topk,
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_COLS)


def test_doc_stats(spark):
    text = "Hello  world again"
    df = _docs(spark, [(1, text, "en", "s", len(text))])
    r = doc_stats(df).first()
    assert r["n_tokens"] == 3  # double space produces no empty token
    assert r["n_chars_measured"] == len(text)
    assert r["fingerprint"] == hashlib.md5(text.encode()).hexdigest()[:16]
    assert r["content_sha"] == hashlib.sha256(text.encode()).hexdigest()


def test_token_topk(spark):
    df = _docs(spark, [(1, "a b a c a b", "en", "s", 11), (2, "b z", "en", "s", 3)])
    out = [(r["token"], r["n"]) for r in token_topk(df, 3).collect()]
    assert out == [("a", 3), ("b", 3), ("c", 1)]  # count desc, token asc tie-break


def test_doc_quality_bounds_and_terms(spark):
    df = _docs(spark, [(1, "the the the the", "en", "s", 15), (2, "", "en", "s", 0)])
    rows = {r["doc_id"]: r for r in doc_quality(df).collect()}
    r1 = rows[1]
    assert r1["stopword_ratio"] == 1.0
    assert r1["distinct_ratio"] == 0.25
    assert 0.0 <= r1["quality_score"] <= 1.0
    assert r1["quality_score"] == pytest.approx(0.4 * (4 / 50) + 0.3 * 0.25 + 0.3 * 0.0)
    r2 = rows[2]
    assert r2["n_tokens"] == 0 and r2["quality_score"] == pytest.approx(0.3)


def test_lang_id_marker_argmax(spark):
    df = _docs(
        spark,
        [
            (1, "der hund und die katze", "de", "s", 22),
            (2, "the cat and the dog", "en", "s", 19),
            (3, "xyzzy plugh", "zz", "s", 11),
        ],
    )
    out = {r["doc_id"]: r["lang_guess"] for r in lang_id(df).collect()}
    assert out == {1: "de", 2: "en", 3: "unknown"}

"""Unit tests for the training-data curation battery
(operators/curation.py): repetition signals, PII scrubbing, and the
composite quality gate."""

from __future__ import annotations

import pytest

from etl_challenge_localiza_spark.operators.curation import (
    pii_scrub,
    plant_pii,
    quality_gate,
    repetition_signals,
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_COLS)


def test_repetition_signals_flags_repeated_doc(spark):
    rows = [
        (1, "spam spam spam spam spam", "en", "s", 24),
        (2, "one two three four five six seven eight nine ten", "en", "s", 48),
    ]
    out = {r["doc_id"]: r for r in repetition_signals(_docs(spark, rows)).collect()}
    assert out[1]["repetitive"] is True
    assert out[1]["top_word_frac"] == 1.0
    assert out[1]["dup_word_frac"] == pytest.approx(0.8)
    assert out[2]["repetitive"] is False
    assert out[2]["top_word_frac"] == pytest.approx(0.1)
    assert out[2]["dup_word_frac"] == 0.0


def test_pii_scrub_counts_and_redacts(spark):
    text = "reach me at bob.smith+x@corp.example.org or +1-555-1234 host 192.168.0.1 ok"
    df = _docs(spark, [(7, text, "en", "s", len(text))])
    r = pii_scrub(df).first()
    assert r["n_emails"] == 1
    assert r["n_phones"] == 1
    assert r["n_ips"] == 1
    # redaction shortens the text by the pattern/placeholder delta
    assert r["chars_removed"] > 0


def test_pii_scrub_clean_doc_untouched(spark):
    text = "no personal data here at all"
    df = _docs(spark, [(8, text, "en", "s", len(text))])
    r = pii_scrub(df).first()
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (0, 0, 0)
    assert r["chars_removed"] == 0


def test_plant_pii_is_deterministic(spark):
    df = _docs(spark, [(42, "base text", "en", "s", 9)])
    a = plant_pii(df).first()["text"]
    b = plant_pii(df).first()["text"]
    assert a == b
    assert "user42@mail.example.com" in a
    assert "+1-555-0042" in a
    assert "10.0.42.7" in a


def test_quality_gate_reason_precedence(spark):
    long_ok = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (1, "too short", "en", "s", 9),  # < 10 tokens
        (2, " ".join(["abcdefghijklmnop"] * 12), "en", "s", 200),  # huge words
        (3, " ".join(f"w{i}" for i in range(20)), "en", "s", 60),  # no stopwords
        (4, long_ok, "en", "s", len(long_ok)),
    ]
    out = {r["doc_id"]: r for r in quality_gate(_docs(spark, rows)).collect()}
    assert out[1]["reason"] == "too_short" and out[1]["keep"] is False
    # doc 2: word_length fires before repetitive despite the single
    # repeated token (fixed precedence)
    assert out[2]["reason"] == "word_length"
    assert out[3]["reason"] == "low_stopword"
    assert out[4]["reason"] is None and out[4]["keep"] is True


def test_quality_gate_token_bounds(spark):
    many = " ".join(["the cat sat on the mat"] * 1000)  # 6000 tokens
    out = quality_gate(
        _docs(spark, [(9, many, "en", "s", len(many))]), max_tokens=5000
    ).first()
    assert out["reason"] == "too_long"

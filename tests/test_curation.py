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


# ---------------------------------------------------------------------------
# round 6: model-based quality scoring (hashed-n-gram linear classifier)
# ---------------------------------------------------------------------------


def _py_logit(text, weights, bias=0.125):
    """Independent reimplementation: hashed unigram+bigram mean weight."""
    import hashlib

    toks = [t for t in text.lower().split(" ") if t]
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not feats:
        return bias, 0
    s = sum(
        weights[int(hashlib.md5(f.encode()).hexdigest()[:2], 16) % len(weights)]
        for f in feats
    )
    return bias + s / len(feats), len(feats)


def test_hashed_feature_logit_matches_independent_computation(spark):
    from etl_challenge_localiza_spark.operators.curation import (
        default_quality_weights,
        hashed_feature_logit,
    )

    w = default_quality_weights()
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "single"),
        (2, "a a a a a a"),
        (3, "Mixed CASE Tokens  with   double spaces"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in hashed_feature_logit(docs).collect()}
    for did, text in rows:
        want_logit, want_n = _py_logit(text, w)
        assert out[did]["n_feats"] == want_n, did
        # exact equality: dyadic weights → exact sums, one IEEE division
        assert out[did]["logit"] == want_logit, did
        assert out[did]["model_pass"] == (want_logit >= 0.0)


def test_model_quality_gate_precedence(spark):
    """Heuristic reasons take precedence; 'model_score' labels docs
    ONLY the model rejects; keep requires both gates."""
    from etl_challenge_localiza_spark.operators.curation import model_quality_gate

    # doc 0 fails the heuristic (too_short: < 10 tokens); with a
    # uniformly negative weight vector every doc fails the model
    neg_w = [-1.0] * 256
    docs = spark.createDataFrame(
        [
            (0, "tiny doc", "en"),
            (1, "the and of a " * 5 + "one two three four five six seven", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in model_quality_gate(docs, weights=neg_w).collect()}
    assert out[0]["reason"] == "too_short" and not out[0]["keep"]
    assert out[1]["reason"] == "model_score" and not out[1]["keep"]

    # with a uniformly positive vector, doc 1 passes both gates
    pos_w = [1.0] * 256
    out2 = {r["doc_id"]: r for r in model_quality_gate(docs, weights=pos_w).collect()}
    assert out2[1]["reason"] is None and out2[1]["keep"]
    assert out2[0]["reason"] == "too_short"  # heuristic label unchanged

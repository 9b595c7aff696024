"""Unit tests for the multimodal binary-column plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.errors import PythonException

from etl_challenge_localiza_spark.operators.multimodal import (
    assets_from_documents,
    extract_features,
)

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _assets(spark):
    docs = spark.createDataFrame([(1, "héllo wörld", "en", "s", 11)], DOC_COLS)
    return assets_from_documents(docs)


def test_payload_is_binary(spark):
    df = _assets(spark)
    assert dict(df.dtypes)["payload"] == "binary"
    assert bytes(df.first()["payload"]) == "héllo wörld".encode()


def test_extract_features_deterministic(spark):
    r = extract_features(_assets(spark)).first()
    raw = "héllo wörld".encode()
    assert r["n_bytes"] == len(raw)
    assert r["content_sha"] == hashlib.sha256(raw).hexdigest()
    assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
    # deterministic across runs
    r2 = extract_features(_assets(spark)).first()
    assert (r["width"], r["height"]) == (r2["width"], r2["height"])


def test_real_decoder_is_stubbed(spark):
    df = extract_features(_assets(spark), decoder=None)
    with pytest.raises(PythonException, match="NotImplementedError"):
        df.collect()

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


def test_resize_stub_shapes(spark):
    from etl_challenge_localiza_spark.operators.multimodal import (
        fake_resizer,
        resize_assets,
    )

    out = resize_assets(_assets(spark), target=(8, 4), resizer=fake_resizer).first()
    assert len(bytes(out["payload"])) == 32
    assert (out["width"], out["height"]) == (8, 4)


def test_resize_real_path_stubbed(spark):
    from etl_challenge_localiza_spark.operators.multimodal import resize_assets

    with pytest.raises(PythonException, match="NotImplementedError"):
        resize_assets(_assets(spark), resizer=None).collect()


def test_frame_sampling_explodes_rows(spark):
    from etl_challenge_localiza_spark.operators.multimodal import sample_frames

    rows = sample_frames(_assets(spark), n_frames=4, frame_bytes=3).collect()
    assert len(rows) == 4  # 1 asset → 4 frames
    assert [r["frame_index"] for r in rows] == [0, 1, 2, 3]
    raw = "héllo wörld".encode()
    assert bytes(rows[0]["frame_payload"]) == raw[:3]
    import hashlib as _h

    assert rows[0]["frame_sha"] == _h.sha256(raw[:3]).hexdigest()

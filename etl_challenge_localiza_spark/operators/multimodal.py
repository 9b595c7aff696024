"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §2.9).

The pattern for 100 TB multimodal corpora: media lives as a
``binary`` column (or object-store URI) beside typed metadata; decode /
feature-extraction runs as Arrow-batched pandas iterators
(``mapInPandas``) so the Python boundary is crossed once per batch, not
per row, and the output schema is declared up front.

The image/audio codec libraries are not available in this environment,
so :func:`extract_features` STUBS the actual decode behind
``decoder=None`` (documented NotImplementedError) and defaults to a
deterministic metadata extractor (byte length + sha256) whose results
an SQL oracle can verify — the Spark-side plumbing (schema, Arrow
batching, partitioning) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: declared output schema of the feature extractor (DDL form).
FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes long, content_sha string, "
    "width int, height int"
)


def assets_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a multimodal asset table from ``documents``: the utf-8
    bytes of ``text`` stand in for an encoded media payload. At
    production scale this column would come from ``spark.read.format(
    'binaryFile')`` or a parquet/iceberg table with a binary column."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: derive fake
    dimensions from the payload hash. Replace with a real codec
    (PIL/ffmpeg) in environments that have one."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64


def extract_features(
    assets: DataFrame,
    decoder: Callable[[bytes], tuple[int, int]] | None = _fake_decode,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decoder=None`` marks the real-codec path as unimplemented in this
    environment (raises NotImplementedError at execution time);
    the default deterministic fake keeps the full pipeline testable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment; pass a decoder callable"
                )
            payloads = pdf["payload"]
            dims = [decoder(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "content_sha": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "asset_id long, kind string, payload binary, width int, height int"


def resize_assets(
    assets: DataFrame,
    target: tuple[int, int] = (32, 32),
    resizer: Callable[[bytes, tuple[int, int]], bytes] | None = None,
) -> DataFrame:
    """Resize stub: same Arrow-batched shape as a real PIL/opencv
    resize. The default deterministic fake truncates/pads the payload
    to target_w*target_h bytes (a real resizer plugs in via
    ``resizer``; None raises NotImplementedError at execution, marking
    the codec-less environment).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, h = target
        for pdf in batches:
            if resizer is not None:
                out = [resizer(bytes(p), target) for p in pdf["payload"]]
            else:
                raise NotImplementedError(
                    "real image resize requires codec libraries not present "
                    "in this environment; pass a resizer callable"
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "payload": out,
                    "width": [w] * len(pdf),
                    "height": [h] * len(pdf),
                }
            )

    return assets.mapInPandas(run, schema=RESIZE_SCHEMA)


def fake_resizer(payload: bytes, target: tuple[int, int]) -> bytes:
    """Deterministic stand-in: truncate/zero-pad to w*h bytes."""
    n = target[0] * target[1]
    return payload[:n].ljust(n, b"\0")


FRAME_SCHEMA = "asset_id long, frame_index int, frame_payload binary, frame_sha string"


def sample_frames(
    assets: DataFrame, n_frames: int = 4, frame_bytes: int = 64
) -> DataFrame:
    """Frame-sampling stub for video-shaped payloads: emit ``n_frames``
    evenly spaced byte windows per asset (1→N row explosion through
    Arrow — the real shape of video decode output). Deterministic, so
    the row multiplication and schema handling are fully testable
    without a codec.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "asset_id": [],
                "frame_index": [],
                "frame_payload": [],
                "frame_sha": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    frame = raw[i * step : i * step + frame_bytes]
                    rows["asset_id"].append(aid)
                    rows["frame_index"].append(i)
                    rows["frame_payload"].append(frame)
                    rows["frame_sha"].append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(rows)

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)

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

"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §2.9).

The pattern for 100 TB multimodal corpora: media lives as a
``binary`` column (or object-store URI) beside typed metadata; decode /
feature-extraction runs as Arrow-batched pandas iterators
(``mapInPandas``) so the Python boundary is crossed once per batch, not
per row, and the output schema is declared up front.

Decode support is tiered by what a pure-Python environment can honestly
do:

- **Real decoders** for the two header+raster formats that need no
  codec library: binary PPM (netpbm P6) and uncompressed 24-bit BMP —
  :func:`decode_image` parses actual bytes (dimensions + pixel stats)
  and is exercised end-to-end by the oracle-checked
  ``multimodal_decode`` registry query and a hand-built BMP fixture in
  pytest (row padding, top-down negative height).
- **Compressed formats** (JPEG/PNG/MP3/H.264…) require codec libraries
  absent here; those paths raise a documented NotImplementedError via
  ``decoder=None`` — the Spark-side plumbing (schema, Arrow batching,
  partitioning) is identical and stays fully tested through the real
  and deterministic-fake decoders.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.readers import spread_small_scan

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
    return spread_small_scan(docs).select(
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


# ---------------------------------------------------------------------------
# Real pure-Python decoders: binary PPM (P6) and uncompressed 24-bit BMP
# ---------------------------------------------------------------------------

_PPM_HEADER = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def decode_ppm(payload: bytes) -> tuple[int, int, float]:
    """Parse a binary netpbm P6 image: (width, height, mean pixel byte).

    Header is ASCII "P6 <w> <h> <maxval>" + single whitespace, then
    w*h*3 raw RGB bytes. Raises ValueError on malformed input.
    """
    m = _PPM_HEADER.match(payload)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pix = payload[m.end() : m.end() + w * h * 3]
    if len(pix) != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    mean = (sum(pix) / len(pix)) if pix else 0.0
    return w, h, mean


def decode_bmp(payload: bytes) -> tuple[int, int, float]:
    """Parse an uncompressed 24-bit BMP: (width, |height|, mean pixel
    byte over the RGB triples, excluding row padding).

    Handles the 4-byte row alignment and top-down images (negative
    height). Raises ValueError on other bit depths / compression.
    """
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    height = abs(h)
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
    total = 0
    n = 0
    for r in range(height):
        row = payload[off + r * stride : off + r * stride + row_bytes]
        if len(row) != row_bytes:
            raise ValueError("truncated BMP pixel data")
        total += sum(row)
        n += row_bytes
    return w, height, (total / n) if n else 0.0


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Sniff the magic bytes and decode PPM or BMP; other formats need
    codec libraries absent from this environment → ValueError (callers
    wanting a hard NotImplementedError use ``decoder=None``)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError("unsupported image format (only P6 PPM / 24-bit BMP)")


IMAGE_FEATURE_SCHEMA = (
    "asset_id long, width int, height int, mean_pixel double, n_bytes long"
)


def extract_image_features(assets: DataFrame) -> DataFrame:
    """REAL decode path: parse each binary payload with
    :func:`decode_image` (Arrow-batched, one Python crossing per batch)
    and emit decoded dimensions + pixel statistics."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_image(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_pixel": [d[2] for d in decoded],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return assets.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def synthetic_ppm_assets(docs: DataFrame) -> DataFrame:
    """Deterministic REAL PPM images derived from doc_id (width
    4 + id%13, height 3 + id%7, constant pixel byte id%256), so the
    decoded output is predictable arithmetic a SQL oracle states in
    closed form while the decoder still parses genuine image bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                payloads.append(
                    b"P6\n%d %d\n255\n" % (w, h) + bytes([did % 256]) * (3 * w * h)
                )
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    return spread_small_scan(docs.select("doc_id")).mapInPandas(
        run, schema="asset_id long, payload binary"
    )


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


# ---------------------------------------------------------------------------
# Real pure-Python audio decoder: PCM WAV (RIFF) header + sample stats
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, int, int, float, float]:
    """Parse an uncompressed PCM WAV (RIFF) file: returns
    (n_channels, sample_rate, bits_per_sample, duration_sec, mean_abs)
    where mean_abs is the mean absolute sample amplitude normalized to
    [0, 1] — the loudness proxy an audio curation pipeline buckets on.

    Walks the RIFF chunk list (fmt may precede data with LIST/INFO
    chunks between), supports 8-bit unsigned and 16-bit signed PCM,
    and raises ValueError on compressed formats — same honesty rule as
    the image side: real parsing for the formats a pure-Python decoder
    can own, explicit refusal for codec formats (MP3/AAC/FLAC need
    libraries absent from this environment).
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if pos + 8 + size > len(payload):
            # a declared chunk size past the end of the payload is a
            # truncated download — refuse rather than silently compute
            # duration/loudness from partial data
            raise ValueError("truncated WAV chunk")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    if audio_format != 1:
        raise ValueError("only uncompressed PCM WAV supported")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    import numpy as np

    if bits == 16:
        samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
        n = len(samples)
        # abs in int32: |−32768| overflows int16
        mean_abs = (
            float(np.abs(samples.astype(np.int32)).mean()) / 32768.0 if n else 0.0
        )
        n_frames = n // max(1, n_channels)
    elif bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
        n = len(samples)
        mean_abs = (
            float(np.abs(samples.astype(np.int16) - 128).mean()) / 128.0
            if n
            else 0.0
        )
        n_frames = n // max(1, n_channels)
    else:
        raise ValueError("only 8/16-bit PCM supported")
    duration = n_frames / sample_rate if sample_rate else 0.0
    return n_channels, sample_rate, bits, duration, mean_abs


def make_wav(
    n_channels: int = 1,
    sample_rate: int = 8000,
    samples: list[int] | None = None,
) -> bytes:
    """Build a minimal 16-bit PCM WAV payload (the synthetic-asset
    generator for tests — the audio counterpart of synthetic_ppm)."""
    samples = samples if samples is not None else []
    data = b"".join(
        int(s).to_bytes(2, "little", signed=True) for s in samples
    )
    fmt = (
        (1).to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * n_channels * 2).to_bytes(4, "little")
        + (n_channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks


AUDIO_FEATURE_SCHEMA = (
    "asset_id long, n_channels int, sample_rate int, bits int, "
    "duration_sec double, mean_abs double, n_bytes long"
)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched WAV feature extraction over (asset_id, payload) —
    same one-Python-crossing-per-batch shape as the image path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_wav(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_channels": [r[0] for r in rows],
                    "sample_rate": [r[1] for r in rows],
                    "bits": [r[2] for r in rows],
                    "duration_sec": [r[3] for r in rows],
                    "mean_abs": [r[4] for r in rows],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return assets.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def synthetic_wav_assets(docs: DataFrame) -> DataFrame:
    """Deterministic REAL WAV clips derived from doc_id (mono 8 kHz
    16-bit, 400 + 4*(id%100) samples of constant amplitude
    (id*7)%20000 - 10000) — like synthetic_ppm_assets, the decoded
    output is closed-form arithmetic a SQL oracle can state while the
    decoder still parses genuine RIFF bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 400 + 4 * (did % 100)
                amp = (did * 7) % 20000 - 10000
                payloads.append(make_wav(1, 8000, [amp] * n))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    return spread_small_scan(docs.select("doc_id")).mapInPandas(
        run, schema="asset_id long, payload binary"
    )


# ---------------------------------------------------------------------------
# Header-only image metadata: PNG IHDR / JPEG SOF / GIF logical screen
# ---------------------------------------------------------------------------
#
# Real multimodal curation rarely decodes pixels just to filter: the
# standard first pass reads dimensions/bit depth straight from the
# container header (PIL's lazy .size does the same). These parsers walk
# genuine byte structures — PNG chunk layout, the JPEG marker stream,
# the GIF logical screen descriptor — WITHOUT any codec, so they are
# honest pure-Python implementations, not stubs, and they cover exactly
# the compressed formats decode_image must refuse.

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type → channel count (spec section 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(payload: bytes) -> tuple[str, int, int, int, int]:
    """Header-only metadata: (format, width, height, bit_depth,
    n_channels) from the first kilobyte-ish of a PNG / JPEG / GIF
    payload — no pixel decode, no codec library.

    - PNG: the IHDR chunk is REQUIRED to be first (PNG spec 11.2.2);
      width/height are big-endian u32 at fixed offsets behind the
      8-byte signature.
    - JPEG: walk the marker stream (each segment is 0xFF <marker>
      <u16 big-endian length>) past APPn/DQT/COM to the first SOF
      frame header (C0-CF except DHT C4 / JPG C8 / DAC CC), which
      carries precision, height, width, component count. Standalone
      markers (TEM, RSTn) have no length field and are skipped as
      bare pairs.
    - GIF: width/height are LITTLE-endian u16 at offset 6 of the
      logical screen descriptor; bit depth is the color-resolution
      field + 1.

    Raises ValueError on anything else (or a truncated/malformed
    header) — same refuse-loudly rule as the decoders above.
    """
    if payload[:8] == PNG_SIG:
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            raise ValueError("malformed PNG: IHDR not first chunk")
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        bit_depth, color_type = payload[24], payload[25]
        if color_type not in _PNG_CHANNELS:
            raise ValueError(f"invalid PNG color type {color_type}")
        return "png", w, h, bit_depth, _PNG_CHANNELS[color_type]
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("malformed JPEG marker stream")
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn
                pos += 2
                continue
            if pos + 4 > len(payload):
                raise ValueError("truncated JPEG segment")
            size = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 10 > len(payload):
                    raise ValueError("truncated JPEG SOF")
                precision = payload[pos + 4]
                h = int.from_bytes(payload[pos + 5 : pos + 7], "big")
                w = int.from_bytes(payload[pos + 7 : pos + 9], "big")
                ncomp = payload[pos + 9]
                return "jpeg", w, h, precision, ncomp
            if marker == 0xDA:  # SOS before any SOF: malformed
                break
            pos += 2 + size
        raise ValueError("no SOF frame header before SOS/EOI")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 13:
            raise ValueError("truncated GIF header")
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        bit_depth = ((payload[10] >> 4) & 0x7) + 1
        return "gif", w, h, bit_depth, 3
    raise ValueError("unsupported image header (PNG/JPEG/GIF only)")


IMAGE_HEADER_SCHEMA = (
    "asset_id long, format string, width int, height int, "
    "bit_depth int, n_channels int"
)


def extract_image_headers(assets: DataFrame) -> DataFrame:
    """Arrow-batched header-only metadata extraction — the cheap first
    pass of an image curation pipeline (filter by dimensions/depth
    before paying for any real decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_image_header(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "format": [r[0] for r in rows],
                    "width": [r[1] for r in rows],
                    "height": [r[2] for r in rows],
                    "bit_depth": [r[3] for r in rows],
                    "n_channels": [r[4] for r in rows],
                }
            )

    return assets.mapInPandas(run, schema=IMAGE_HEADER_SCHEMA)


def make_png(width: int, height: int, bit_depth: int = 8) -> bytes:
    """Build a COMPLETE valid truecolor PNG (signature, CRC-correct
    IHDR, zlib IDAT of zero scanlines, IEND) in pure stdlib — a real
    file any viewer opens, used as the synthetic asset generator."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, 2, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * (width * 3)) * height  # filter byte + RGB row
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg_header(width: int, height: int) -> bytes:
    """Build a structurally valid JPEG marker stream through SOF0
    (SOI, JFIF APP0, a minimal DQT, the SOF0 frame header, EOI). Not a
    decodable image (no entropy-coded scan — that needs a real
    encoder); it exercises exactly what a header walk reads, which is
    the honest scope of a codec-less environment."""
    import struct

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + b"\x10" * 64
    sof0 = (
        struct.pack(">BHHB", 8, height, width, 3)
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    out = b"\xff\xd8"
    for marker, body in ((b"\xff\xe0", app0), (b"\xff\xdb", dqt), (b"\xff\xc0", sof0)):
        out += marker + struct.pack(">H", len(body) + 2) + body
    return out + b"\xff\xd9"


def make_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a: header + logical screen descriptor (color
    resolution 8) + trailer."""
    return (
        b"GIF89a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + b"\x70\x00\x00"
        + b"\x3b"
    )


def synthetic_image_header_assets(docs: DataFrame) -> DataFrame:
    """Deterministic real-header image payloads cycling PNG/JPEG/GIF by
    doc_id % 3, dimensions 16+id%50 x 9+id%40 — closed-form metadata a
    SQL oracle states exactly while the parser walks genuine bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 16 + did % 50, 9 + did % 40
                maker = (make_png, make_jpeg_header, make_gif)[did % 3]
                payloads.append(maker(w, h))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    return spread_small_scan(docs.select("doc_id")).mapInPandas(
        run, schema="asset_id long, payload binary"
    )


# ---------------------------------------------------------------------------
# Real multi-frame container decode: concatenated-P6 PPM streams
# (the netpbm video stream format — e.g. `ffmpeg -f image2pipe -c:v ppm`)
# ---------------------------------------------------------------------------

VIDEO_FRAME_SCHEMA = (
    "asset_id long, frame_index int, width int, height int, mean_pixel double"
)


def decode_ppm_stream(payload: bytes) -> list[tuple[int, int, int, float]]:
    """Walk a concatenated-P6 stream frame by frame: each frame is a
    full P6 image (ASCII header + w*h*3 raw RGB bytes) immediately
    followed by the next. Returns [(frame_index, width, height,
    mean_pixel byte)]. Raises ValueError on a malformed or truncated
    frame — real parse errors surface, nothing is faked."""
    frames = []
    off, idx = 0, 0
    while off < len(payload):
        # _PPM_HEADER is ^-anchored; match against the remaining slice
        # (frames are small — the copy is bounded by one frame header
        # plus pixels, not the whole stream at once per match)
        rest = payload[off:]
        m = _PPM_HEADER.match(rest)
        if not m:
            raise ValueError(f"frame {idx}: not a P6 header at offset {off}")
        w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if maxval > 255:
            raise ValueError(f"frame {idx}: 16-bit PPM not supported")
        pix = rest[m.end() : m.end() + w * h * 3]
        if len(pix) != w * h * 3:
            raise ValueError(f"frame {idx}: truncated pixel data")
        frames.append((idx, w, h, sum(pix) / len(pix) if pix else 0.0))
        off += m.end() + w * h * 3
        idx += 1
    return frames


def sample_video_frames(assets: DataFrame, stride: int = 2) -> DataFrame:
    """Decode every frame of each concatenated-PPM payload and keep
    every ``stride``-th (the video curation primitive: train on a
    frame subsample, not 30 fps). One Arrow-batched mapInPandas
    crossing with the declared 1→N VIDEO_FRAME_SCHEMA — decode
    parallelism is the asset partitioning, per-task memory is one
    batch of payloads, and the kept-frame stream is immediately
    columnar for downstream relational ops."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "asset_id": [], "frame_index": [], "width": [],
                "height": [], "mean_pixel": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for idx, w, h, mean in decode_ppm_stream(bytes(payload)):
                    if idx % stride:
                        continue
                    rows["asset_id"].append(aid)
                    rows["frame_index"].append(idx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["mean_pixel"].append(mean)
            yield pd.DataFrame(rows)

    return assets.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


def synthetic_ppm_stream_assets(docs: DataFrame) -> DataFrame:
    """Deterministic REAL multi-frame PPM streams per doc_id:
    2 + id%4 frames, each (3 + id%5) x 2 with constant pixel byte
    (id*11 + 17*frame) % 256 — every decoded field is closed-form
    arithmetic a SQL oracle can state, while the decoder still walks
    genuine concatenated P6 bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n_frames, w, h = 2 + did % 4, 3 + did % 5, 2
                buf = b""
                for f in range(n_frames):
                    buf += b"P6\n%d %d\n255\n" % (w, h)
                    buf += bytes([(did * 11 + 17 * f) % 256]) * (3 * w * h)
                payloads.append(buf)
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    return spread_small_scan(docs.select("doc_id")).mapInPandas(
        run, schema="asset_id long, payload binary"
    )


# ---------------------------------------------------------------------------
# Perceptual image fingerprint: average hash (aHash) over the decoded raster
# ---------------------------------------------------------------------------


def _gray_raster(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode PPM (P6) or uncompressed 24-bit BMP into (width, height,
    per-pixel gray sums r+g+b in image row order, top-down). BMP rows
    are stored bottom-up for positive heights — re-ordered here so the
    same image hashes identically across containers."""
    if payload[:2] == b"P6":
        m = _PPM_HEADER.match(payload)
        if not m:
            raise ValueError("not a binary PPM (P6) payload")
        w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        pix = payload[m.end() : m.end() + w * h * 3]
        if len(pix) != w * h * 3:
            raise ValueError("truncated PPM pixel data")
        gray = [pix[i] + pix[i + 1] + pix[i + 2] for i in range(0, len(pix), 3)]
        return w, h, gray
    if payload[:2] == b"BM":
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or comp != 0:
            raise ValueError("only uncompressed 24-bit BMP supported")
        height = abs(h)
        stride = (w * 3 + 3) & ~3
        gray: list[int] = []
        for y in range(height):
            r = height - 1 - y if h > 0 else y  # bottom-up storage
            row = payload[off + r * stride : off + r * stride + w * 3]
            if len(row) != w * 3:
                raise ValueError("truncated BMP pixel data")
            gray.extend(row[i] + row[i + 1] + row[i + 2] for i in range(0, w * 3, 3))
        return w, height, gray
    raise ValueError("unsupported image format (only P6 PPM / 24-bit BMP)")


def ahash_image(payload: bytes, grid: int = 8) -> str:
    """Average hash (aHash): downsample the grayscale raster to
    ``grid``x``grid`` block means by integer box binning, threshold
    each block against the global mean, and pack the grid row-major
    into a ``grid**2``-bit fingerprint (hex string, zero-padded).

    The standard perceptual-dedup fingerprint (pHash family): identical
    for re-encodes of the same picture across containers (PPM vs BMP,
    pytest-asserted) and stable under uniform brightness shifts, unlike
    the byte-level content_sha. Pure integer block sums; the only
    floats are the final per-block/global mean comparisons."""
    w, h, gray = _gray_raster(payload)
    if not gray:
        raise ValueError("empty raster")
    sums = [[0] * grid for _ in range(grid)]
    cnts = [[0] * grid for _ in range(grid)]
    for y in range(h):
        by = y * grid // h
        row_base = y * w
        for x in range(w):
            sums[by][x * grid // w] += gray[row_base + x]
            cnts[by][x * grid // w] += 1
    total = sum(gray) / (3.0 * len(gray))
    bits = 0
    for by in range(grid):
        for bx in range(grid):
            if cnts[by][bx] and sums[by][bx] / (3.0 * cnts[by][bx]) > total:
                bits |= 1 << (by * grid + bx)
    # ceil(grid^2 / 4) hex chars: keeps the fingerprint fixed-width for
    # odd grids too (grid=5 -> 25 bits -> 7 chars), which the fixed-
    # offset hi/lo band split in ahash_hamming_matrix relies on
    return format(bits, "0%dx" % ((grid * grid + 3) // 4))


AHASH_SCHEMA = "asset_id long, ahash string"


def image_ahash(assets: DataFrame, grid: int = 8) -> DataFrame:
    """Per-asset perceptual fingerprint via :func:`ahash_image` through
    the standard Arrow-batched crossing. Downstream exact-group dedup
    is a plain hash groupBy on the 64-bit fingerprint; hamming-
    tolerant near-dup search reuses the banded-LSH shape from
    operators/dedup.py (split the 64 bits into 4x16-bit bands, bucket
    join per band) — the fingerprint is deliberately band-splittable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "ahash": [ahash_image(bytes(p), grid) for p in pdf["payload"]],
                }
            )

    return assets.mapInPandas(run, schema=AHASH_SCHEMA)


def synthetic_pattern_ppm_assets(docs: DataFrame) -> DataFrame:
    """Deterministic REAL two-tone PPM images whose aHash is known in
    closed form: pattern doc_id%4 picks which half of a 16x16 canvas is
    bright (0 left / 1 top / 2 diagonal quadrants / 3 right), while the
    actual byte values vary per image (dark = id%30, bright =
    200 + id%56) — so byte-identical dedup (content_sha) sees every
    image as unique but the perceptual hash collapses each pattern
    class to one fingerprint the SQL oracle states as a literal."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        side = 16
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                pat, dark, bright = did % 4, did % 30, 200 + did % 56
                buf = bytearray(b"P6\n%d %d\n255\n" % (side, side))
                half = side // 2
                for y in range(side):
                    for x in range(side):
                        if pat == 0:
                            lit = x < half
                        elif pat == 1:
                            lit = y < half
                        elif pat == 2:
                            lit = (x < half) == (y < half)
                        else:
                            lit = x >= half
                        buf += bytes([bright if lit else dark]) * 3
                payloads.append(bytes(buf))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "payload": payloads})

    return spread_small_scan(docs.select("doc_id")).mapInPandas(
        run, schema="asset_id long, payload binary"
    )

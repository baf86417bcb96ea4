"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched pandas UDFs.

PNG images decode for real — a pure-stdlib decoder (zlib inflate +
per-row unfiltering, 8-bit gray/gray-alpha/RGB/RGBA, non-interlaced)
plus a matching encoder for round-trip tests.  Other codecs (JPEG,
audio, video) are absent from this container, so those decode paths
raise ``NotImplementedError`` unless the deterministic fake decoder is
selected; the Spark-side plumbing — schema, batch shape, partitioning,
UDF signature — is identical either way."""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> channels


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to an (H, W, C) uint8 array.
    Pure stdlib (zlib) + NumPy; supports gray / gray-alpha / RGB / RGBA
    and all five row filters (PNG spec §9, RFC 2083)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    meta = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        chunk = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", chunk)
            if depth != 8 or inter != 0 or ctype not in _PNG_CHANNELS:
                raise NotImplementedError(
                    "only 8-bit non-interlaced gray/RGB(A) PNGs")
            meta = (w, h, _PNG_CHANNELS[ctype])
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.int64)
    bpp = ch
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        prev = out[y - 1] if y else np.zeros(stride, np.int64)
        if f == 0:
            out[y] = line
        elif f == 1:      # Sub: prefix sum mod 256 per bpp lane
            for lane in range(bpp):
                out[y, lane::bpp] = np.cumsum(line[lane::bpp]) % 256
        elif f == 2:      # Up
            out[y] = (line + prev) % 256
        elif f == 3:      # Average (sequential in x by definition)
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (line[x] + (left + prev[x]) // 2) % 256
        elif f == 4:      # Paeth (sequential in x by definition)
            for x in range(stride):
                a = out[y, x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                out[y, x] = (line[x] + _paeth(int(a), int(prev[x]),
                                              int(c))) % 256
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, ch)


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as an 8-bit PNG.
    ``filter_type`` picks the per-row filter (0-4) — used by tests to
    exercise every decoder unfilter path; filtering references the
    original samples, which equal the reconstructed ones by spec."""
    a = np.asarray(img, np.uint8)
    if a.ndim == 2:
        a = a[..., None]
    h, w, ch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = a.reshape(h, w * ch).astype(np.int64)
    lines = []
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            left = np.zeros_like(row)
            left[ch:] = row[:-ch]
            enc = (row - left) % 256
        elif filter_type == 2:
            prev = flat[y - 1] if y else np.zeros_like(row)
            enc = (row - prev) % 256
        elif filter_type in (3, 4):
            prev = flat[y - 1] if y else np.zeros_like(row)
            left = np.zeros_like(row)
            left[ch:] = row[:-ch]
            if filter_type == 3:
                enc = (row - (left + prev) // 2) % 256
            else:
                ul = np.zeros_like(row)
                ul[ch:] = prev[:-ch]
                pred = np.array(
                    [_paeth(int(a), int(b), int(c))
                     for a, b, c in zip(left, prev, ul)], np.int64)
                enc = (row - pred) % 256
        else:
            raise ValueError(f"bad PNG filter {filter_type}")
        lines.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
    raw = zlib.compress(b"".join(lines), 6)

    def chunk(typ: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + typ + body + struct.pack(
            ">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
            + chunk(b"IEND", b""))

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image|audio|video
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), False),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode image bytes to an HxWxC uint8 array.

    PNG payloads decode for real (:func:`png_decode`, pure stdlib).
    Other formats need codec libraries absent from this container;
    ``fake=True`` selects the deterministic stand-in used by plumbing
    tests (bytes -> repeating pixel pattern)."""
    if fake:
        h = w = 16
        buf = np.frombuffer(payload, dtype=np.uint8)
        reps = int(np.ceil(h * w * 3 / max(len(buf), 1)))
        return np.tile(buf, reps)[: h * w * 3].reshape(h, w, 3)
    if payload[:8] == _PNG_SIG:
        return png_decode(payload)
    raise NotImplementedError(
        "no codec for this format in this environment (PNG decodes "
        "natively; pass fake=True for the deterministic test decoder)"
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("mean_pixel", DoubleType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode -> feature-extract pipeline over the binary column; one
    Arrow batch per partition slice, vectorized inside."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "n_bytes": [], "mean_pixel": [],
                   "feature": []}
            for r in pdf.itertuples():
                img = decode_image(r.payload, fake=fake_decode)
                out["media_id"].append(r.media_id)
                out["n_bytes"].append(len(r.payload))
                out["mean_pixel"].append(float(img.mean()))
                # 8-bin histogram as the stand-in embedding
                hist, _ = np.histogram(img, bins=8, range=(0, 256))
                out["feature"].append(
                    (hist / hist.sum()).astype(float).tolist()
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (pure NumPy index gather)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ys[:, None], xs[None, :]]


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), False),  # PNG re-encoded
    ]
)


def resize_media(
    media: DataFrame, out_h: int = 8, out_w: int = 8,
    fake_decode: bool = False,
) -> DataFrame:
    """Decode -> nearest-neighbour resize -> PNG re-encode, one Arrow
    batch per partition slice.  PNG payloads round-trip through the real
    codec; other formats need ``fake_decode=True``."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {f.name: [] for f in RESIZED_SCHEMA.fields}
            for r in pdf.itertuples():
                img = decode_image(bytes(r.payload), fake=fake_decode)
                small = resize_image(img, out_h, out_w)
                out["media_id"].append(r.media_id)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["payload"].append(png_encode(small))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("frame", BinaryType(), False),    # PNG
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, side: int = 8,
) -> DataFrame:
    """Frame sampling for video rows: one output row per ``every_ms`` of
    ``duration_ms``.  No video codec exists in this environment, so the
    DECODE of each frame is a deterministic fake (payload + timestamp
    hashed into pixels, clearly marked); the Spark-side plumbing — the
    1->N explode shape, schema, batch flow, PNG framing — is the real
    contract a codec-backed decoder drops into."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {f.name: [] for f in FRAME_SCHEMA.fields}
            for r in pdf.itertuples():
                dur = int(r.duration_ms or 0)
                n = max(1, dur // every_ms)
                seed = np.frombuffer(
                    bytes(r.payload)[:8].ljust(8, b"\0"), np.uint64)[0]
                for i in range(n):
                    # deterministic FAKE frame (no codec): hash pixels
                    px = (np.arange(side * side * 3, dtype=np.uint64)
                          * (seed + np.uint64(i * 2654435761 + 1)))
                    img = (px % np.uint64(256)).astype(np.uint8) \
                        .reshape(side, side, 3)
                    out["media_id"].append(r.media_id)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame"].append(png_encode(img))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)


def synth_media(
    spark, n: int = 64, seed: int = 1, png: bool = False
) -> DataFrame:
    """Deterministic media table for the plumbing tests; ``png=True``
    emits real PNG payloads so the pipeline exercises the true codec."""
    rows = []
    for i in range(n):
        if png:
            side = 4 + (i % 5)
            img = ((np.arange(side * side * 3, dtype=np.int64)
                    * (i * 131 + seed)) % 256).astype(np.uint8)
            img = img.reshape(side, side, 3)
            rows.append((i, "image", "image/png", side, side, None,
                         png_encode(img, filter_type=i % 3)))
        else:
            payload = bytes(
                ((i * 131 + j * 17 + seed) % 256)
                for j in range(64 + i % 32)
            )
            rows.append((i, "image", "image/fake", 16, 16, None, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

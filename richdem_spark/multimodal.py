"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched pandas UDFs.

PNG and baseline JPEG images decode for real — a pure-stdlib PNG
decoder (zlib inflate + per-row unfiltering; 8- and 16-bit
gray/gray-alpha/RGB/RGBA, 8-bit palette with optional tRNS alpha,
non-interlaced and Adam7) and a numpy baseline-JFIF codec
(:mod:`richdem_spark.jpeg`: SOF0, 4:4:4/4:2:2/4:2:0, restart markers),
each with a matching encoder for round-trip tests.  Remaining codecs
(progressive JPEG, compressed audio, video) are absent from this
container, so those decode paths raise ``NotImplementedError`` unless
the deterministic fake decoder is selected; the Spark-side plumbing —
schema, batch shape, partitioning, UDF signature — is identical either
way."""

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
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> channels
# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(rows: np.ndarray, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering (PNG spec §9).  ``rows`` is
    (n, 1+stride) raw bytes (leading filter byte per line); returns the
    reconstructed (n, stride) bytes.  Filters operate on BYTES with the
    'left' neighbour ``bpp`` bytes back, so one routine covers every
    depth/channel combination."""
    n, sp1 = rows.shape
    stride = sp1 - 1
    out = np.zeros((n, stride), np.int64)
    for y in range(n):
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
    return out.astype(np.uint8)


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a PNG to an (H, W, C) array — uint8 for depth 8, uint16
    for depth 16.  Pure stdlib (zlib) + NumPy; supports gray /
    gray-alpha / RGB / RGBA / 8-bit palette (PLTE, optional tRNS
    alpha), all five row filters, and Adam7 interlacing (PNG spec §§8-9,
    RFC 2083).  Sub-byte depths (1/2/4-bit) raise."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    meta = None
    idat = bytearray()
    plte = trns = None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos:pos + 8])
        chunk = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", chunk)
            if ctype not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {ctype}")
            if depth not in (8, 16) or (ctype == 3 and depth != 8):
                raise NotImplementedError(
                    "only 8/16-bit PNGs (8-bit for palette)")
            if inter not in (0, 1):
                raise ValueError(f"bad PNG interlace {inter}")
            meta = (w, h, depth, ctype, inter)
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(chunk, np.uint8)
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, inter = meta
    ch = _PNG_CHANNELS[ctype]
    bpp = ch * (depth // 8)
    raw = zlib.decompress(bytes(idat))
    if inter == 0:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG data length mismatch")
        img_b = _unfilter(
            np.frombuffer(raw, np.uint8).reshape(h, stride + 1), bpp)
        img_b = img_b.reshape(h, w, bpp)
    else:                 # Adam7: 7 independently-filtered sub-images
        img_b = np.zeros((h, w, bpp), np.uint8)
        at = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * bpp
            need = ph * (stride + 1)
            if at + need > len(raw):
                raise ValueError("PNG interlaced data truncated")
            sub = _unfilter(
                np.frombuffer(raw[at:at + need], np.uint8)
                .reshape(ph, stride + 1), bpp)
            at += need
            img_b[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
    if depth == 16:
        img = (np.ascontiguousarray(img_b).reshape(h, w * ch, 2)
               .view(">u2").astype(np.uint16).reshape(h, w, ch))
    else:
        img = img_b.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        idx = img[..., 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return img


def _filter_rows(flat: np.ndarray, bpp: int, filter_type: int) -> bytes:
    """Filter an (n, stride) byte image into PNG scanlines (filter byte
    + filtered bytes per row).  Filtering references the original
    samples, which equal the reconstructed ones by spec."""
    n = flat.shape[0]
    flat = flat.astype(np.int64)
    lines = []
    for y in range(n):
        row = flat[y]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            enc = (row - left) % 256
        elif filter_type == 2:
            prev = flat[y - 1] if y else np.zeros_like(row)
            enc = (row - prev) % 256
        elif filter_type in (3, 4):
            prev = flat[y - 1] if y else np.zeros_like(row)
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            if filter_type == 3:
                enc = (row - (left + prev) // 2) % 256
            else:
                ul = np.zeros_like(row)
                ul[bpp:] = prev[:-bpp]
                pred = np.array(
                    [_paeth(int(a), int(b), int(c))
                     for a, b, c in zip(left, prev, ul)], np.int64)
                enc = (row - pred) % 256
        else:
            raise ValueError(f"bad PNG filter {filter_type}")
        lines.append(bytes([filter_type]) + enc.astype(np.uint8).tobytes())
    return b"".join(lines)


def png_encode(img: np.ndarray, filter_type: int = 0,
               interlace: bool = False) -> bytes:
    """Encode an (H, W) or (H, W, C) array as a PNG — uint8 input
    writes depth 8, uint16 writes depth 16 (big-endian per spec).
    ``filter_type`` picks the per-row filter (0-4) and ``interlace``
    selects Adam7 — used by tests to exercise every decoder path."""
    a = np.asarray(img)
    depth = 16 if a.dtype == np.uint16 else 8
    a = a.astype(np.uint16 if depth == 16 else np.uint8)
    if a.ndim == 2:
        a = a[..., None]
    h, w, ch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch * (depth // 8)
    if depth == 16:   # big-endian sample bytes
        byt = a.astype(">u2").view(np.uint8).reshape(h, w, bpp)
    else:
        byt = a.reshape(h, w, bpp)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = byt[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_filter_rows(
                    sub.reshape(sub.shape[0], -1), bpp, filter_type))
        raw = zlib.compress(b"".join(parts), 6)
    else:
        raw = zlib.compress(
            _filter_rows(byt.reshape(h, w * bpp), bpp, filter_type), 6)

    def chunk(typ: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + typ + body + struct.pack(
            ">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                       1 if interlace else 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw)
            + chunk(b"IEND", b""))

def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to ``(samples, sample_rate)`` where
    samples is (n_frames, channels).  Pure stdlib: PCM 8-bit (unsigned)
    / 16 / 24 / 32-bit (signed) and IEEE-float 32/64-bit, including the
    WAVE_FORMAT_EXTENSIBLE wrapper.  Dtypes follow scipy.io.wavfile:
    uint8 / int16 / int32 (24-bit sign-extended then <<8 into the full
    int32 range) / float32 / float64.  Unknown codecs (ADPCM,
    MP3-in-WAV) raise."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV stream")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)            # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE and len(fmt) >= 26:    # extensible: real tag in GUID
        (tag,) = struct.unpack("<H", fmt[24:26])
    if tag == 1:                            # integer PCM
        if bits == 8:                       # stored unsigned, kept raw
            a = np.frombuffer(data, np.uint8)
        elif bits == 16:
            a = np.frombuffer(data, "<i2")
        elif bits == 24:                    # sign-extend into int32<<8
            b = np.frombuffer(data, np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int32)
            a = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            a = (np.where(a >= 1 << 23, a - (1 << 24), a)
                 .astype(np.int32) << 8)    # full int32 range (scipy-style)
        elif bits == 32:
            a = np.frombuffer(data, "<i4")
        else:
            raise NotImplementedError(f"WAV PCM {bits}-bit")
    elif tag == 3:                          # IEEE float
        if bits not in (32, 64):
            raise NotImplementedError(f"WAV float {bits}-bit")
        a = np.frombuffer(data, "<f4" if bits == 32 else "<f8")
    else:
        raise NotImplementedError(f"WAV format tag {tag}")
    ch = max(int(ch), 1)
    n = len(a) // ch
    return np.asarray(a[: n * ch]).reshape(n, ch), int(rate)


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode (n,) or (n, ch) samples as RIFF/WAVE.  dtype picks the
    format: uint8 -> PCM8, int16 -> PCM16, int32 -> PCM32,
    float32/float64 -> IEEE float."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    ch = a.shape[1]
    if a.dtype == np.uint8:
        tag, bits, body = 1, 8, a.astype(np.uint8).tobytes()
    elif a.dtype == np.int16:
        tag, bits, body = 1, 16, a.astype("<i2").tobytes()
    elif a.dtype == np.int32:
        tag, bits, body = 1, 32, a.astype("<i4").tobytes()
    elif a.dtype == np.float32:
        tag, bits, body = 3, 32, a.astype("<f4").tobytes()
    elif a.dtype == np.float64:
        tag, bits, body = 3, 64, a.astype("<f8").tobytes()
    else:
        raise NotImplementedError(f"WAV encode from dtype {a.dtype}")
    ba = ch * bits // 8
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ba, ba, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body
              + (b"\x00" if len(body) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_audio(payload: bytes, fake: bool = False) -> tuple[np.ndarray, int]:
    """Decode audio bytes to ``(samples (n, ch) , sample_rate)``.  WAV
    decodes for real (:func:`wav_decode`, pure stdlib); compressed
    codecs (MP3/AAC/Opus) need libraries absent from this container —
    ``fake=True`` selects the deterministic stand-in."""
    if fake:
        buf = np.frombuffer(payload, np.uint8).astype(np.float32)
        return ((buf - 128.0) / 128.0)[:, None], 8000
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return wav_decode(payload)
    raise NotImplementedError(
        "no audio codec for this format in this environment (WAV "
        "decodes natively; pass fake=True for the test decoder)")


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_frames", LongType(), False),
        StructField("channels", IntegerType(), False),
        StructField("duration_ms", DoubleType(), False),
        StructField("rms", DoubleType(), False),
        StructField("peak", DoubleType(), False),
        StructField("zero_cross_rate", DoubleType(), False),
    ]
)


def extract_audio_features(media: DataFrame,
                           fake_decode: bool = False) -> DataFrame:
    """Audio decode -> feature extraction over the binary column, one
    Arrow batch per partition slice.  Mirrors :func:`extract_features`
    for the audio modality: RMS / peak (samples normalised to [-1, 1])
    and mean zero-crossing rate over the channel mix-down."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {f.name: [] for f in AUDIO_FEATURE_SCHEMA.fields}
            for r in pdf.itertuples():
                s, rate = decode_audio(bytes(r.payload), fake=fake_decode)
                x = s.astype(np.float64)
                if s.dtype == np.uint8:         # PCM8: offset binary
                    x = (x - 128.0) / 128.0
                elif s.dtype.kind == "i":       # PCM16/24/32 -> [-1, 1]
                    x = x / float(1 << (8 * s.dtype.itemsize - 1))
                mono = x.mean(axis=1) if x.size else np.zeros(0)
                zc = (float(np.mean(np.signbit(mono[1:])
                                    != np.signbit(mono[:-1])))
                      if mono.size > 1 else 0.0)
                out["media_id"].append(r.media_id)
                out["sample_rate"].append(rate)
                out["n_frames"].append(int(s.shape[0]))
                out["channels"].append(int(s.shape[1]))
                out["duration_ms"].append(
                    1000.0 * s.shape[0] / rate if rate else 0.0)
                out["rms"].append(
                    float(np.sqrt((x ** 2).mean())) if x.size else 0.0)
                out["peak"].append(
                    float(np.abs(x).max()) if x.size else 0.0)
                out["zero_cross_rate"].append(zc)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


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
    if payload[:2] == b"\xff\xd8":
        from .jpeg import jpeg_decode

        img = jpeg_decode(payload)
        return (img if img.ndim == 3
                else np.repeat(img[:, :, None], 3, axis=2))
    raise NotImplementedError(
        "no codec for this format in this environment (PNG and "
        "baseline JPEG decode natively; pass fake=True for the "
        "deterministic test decoder)"
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

"""Multimodal binary-column plumbing (decode stubbed per environment;
schema/batching/partitioning are real)."""

import numpy as np
import pytest

from richdem_spark.multimodal import (
    decode_image,
    extract_features,
    synth_media,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01")


def test_fake_decoder_deterministic():
    a = decode_image(b"abc123", fake=True)
    b = decode_image(b"abc123", fake=True)
    assert a.shape == (16, 16, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)


def test_feature_extraction_pipeline(spark):
    media = synth_media(spark, n=32)
    feats = extract_features(media).collect()
    assert len(feats) == 32
    for r in feats:
        assert r.n_bytes >= 64
        assert 0 <= r.mean_pixel <= 255
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-9
    # determinism across runs
    again = extract_features(synth_media(spark, n=32)).collect()
    assert {(r.media_id, r.mean_pixel) for r in feats} == {
        (r.media_id, r.mean_pixel) for r in again
    }


def test_png_roundtrip_all_filters():
    from richdem_spark.multimodal import png_decode, png_encode

    rng = np.random.default_rng(5)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, (11, 7, ch)).astype(np.uint8)
        for f in (0, 1, 2, 3, 4):
            blob = png_encode(img, filter_type=f)
            got = png_decode(blob)
            assert np.array_equal(got, img), (ch, f)


def test_png_roundtrip_16bit():
    from richdem_spark.multimodal import png_decode, png_encode

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 65536, (9, 5, ch)).astype(np.uint16)
        for f in (0, 1, 2, 3, 4):
            got = png_decode(png_encode(img, filter_type=f))
            assert got.dtype == np.uint16
            assert np.array_equal(got, img), (ch, f)


def test_png_roundtrip_adam7_interlaced():
    from richdem_spark.multimodal import png_decode, png_encode

    rng = np.random.default_rng(11)
    # odd sizes exercise empty / partial Adam7 passes, incl. the
    # degenerate 1x1..2x2 grids where most passes vanish
    for h, w in ((1, 1), (2, 2), (3, 5), (8, 8), (13, 9), (16, 17)):
        for ch in (1, 3, 4):
            img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
            for f in (0, 1, 4):
                got = png_decode(png_encode(img, filter_type=f,
                                            interlace=True))
                assert np.array_equal(got, img), (h, w, ch, f)
    img16 = rng.integers(0, 65536, (10, 6, 3)).astype(np.uint16)
    got = png_decode(png_encode(img16, filter_type=2, interlace=True))
    assert np.array_equal(got, img16)


def test_png_palette_decode():
    import struct
    import zlib

    from richdem_spark.multimodal import _PNG_SIG, png_decode

    def chunk(typ, body):
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + typ + body + struct.pack(
            ">I", crc)

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    blob = (_PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", palette.tobytes())
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b""))
    got = png_decode(blob)
    assert np.array_equal(got, palette[idx])
    # with tRNS: entry 0 transparent, missing entries default opaque
    blob_t = (_PNG_SIG
              + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
              + chunk(b"PLTE", palette.tobytes())
              + chunk(b"tRNS", bytes([0]))
              + chunk(b"IDAT", zlib.compress(scan))
              + chunk(b"IEND", b""))
    got_t = png_decode(blob_t)
    assert got_t.shape == (2, 3, 4)
    assert np.array_equal(got_t[..., :3], palette[idx])
    assert np.array_equal(got_t[..., 3], np.where(idx == 0, 0, 255))


def test_png_subbyte_depth_raises():
    import struct
    import zlib

    from richdem_spark.multimodal import _PNG_SIG, png_decode

    def chunk(typ, body):
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + typ + body + struct.pack(
            ">I", crc)

    blob = (_PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 1, 4, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00\x12\x34\x56\x78"))
            + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        png_decode(blob)


def test_png_decode_via_decode_image():
    from richdem_spark.multimodal import png_encode

    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = (255, 0, 0)
    img[1, 1] = (0, 0, 255)
    got = decode_image(png_encode(img))
    assert got.shape == (2, 2, 3)
    assert np.array_equal(got, img)


def test_png_feature_pipeline_real_codec(spark):
    media = synth_media(spark, n=24, png=True)
    feats = extract_features(media, fake_decode=False).collect()
    assert len(feats) == 24
    from richdem_spark.multimodal import png_decode

    rows = {r.media_id: r for r in media.collect()}
    for r in feats:
        img = png_decode(bytes(rows[r.media_id].payload))
        assert abs(r.mean_pixel - float(img.mean())) < 1e-9


def test_resize_media_roundtrip(spark):
    from richdem_spark.multimodal import (
        png_decode,
        resize_image,
        resize_media,
        synth_media,
    )

    media = synth_media(spark, n=12, png=True)
    rows = {r.media_id: r for r in media.collect()}
    out = resize_media(media, out_h=4, out_w=4).collect()
    assert len(out) == 12
    for r in out:
        got = png_decode(bytes(r.payload))
        src = png_decode(bytes(rows[r.media_id].payload))
        exp = resize_image(src, 4, 4)
        assert np.array_equal(got, exp)


def test_sample_frames_plumbing(spark):
    from richdem_spark.multimodal import png_decode, sample_frames

    rows = [
        (1, "video", "video/fake", None, None, 3500, b"vidpayload1"),
        (2, "video", "video/fake", None, None, 900, b"vidpayload2"),
    ]
    from richdem_spark.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_frames(media, every_ms=1000).collect()
    by_id = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f)
    assert len(by_id[1]) == 3 and len(by_id[2]) == 1
    assert sorted(f.ts_ms for f in by_id[1]) == [0, 1000, 2000]
    # frames are decodable PNGs and deterministic
    img = png_decode(bytes(by_id[1][0].frame))
    assert img.shape == (8, 8, 3)
    again = sample_frames(media, every_ms=1000).collect()
    assert {(f.media_id, f.frame_idx, bytes(f.frame)) for f in frames} \
        == {(f.media_id, f.frame_idx, bytes(f.frame)) for f in again}


def test_wav_roundtrip_all_dtypes():
    from richdem_spark.multimodal import wav_decode, wav_encode

    rng = np.random.default_rng(31)
    cases = [
        rng.integers(0, 256, (50, 1)).astype(np.uint8),
        rng.integers(-32768, 32768, (40, 2)).astype(np.int16),
        rng.integers(-2**31, 2**31 - 1, (30, 1)).astype(np.int32),
        (rng.random((25, 2)) * 2 - 1).astype(np.float32),
        (rng.random((20, 1)) * 2 - 1).astype(np.float64),
    ]
    for src in cases:
        got, rate = wav_decode(wav_encode(src, rate=22050))
        assert rate == 22050
        assert got.dtype == src.dtype, src.dtype
        np.testing.assert_array_equal(got, src)


def test_wav_24bit_decode():
    import struct

    from richdem_spark.multimodal import wav_decode

    # hand-build a 24-bit PCM WAV: values -1, 0, 1, max, min
    vals = [-1, 0, 1, (1 << 23) - 1, -(1 << 23)]
    body = b"".join(struct.pack("<i", v)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 48000, 48000 * 3, 3, 24)
    blob = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)
    got, rate = wav_decode(blob)
    assert rate == 48000 and got.dtype == np.int32
    np.testing.assert_array_equal(got[:, 0], np.array(vals, np.int64) << 8)


def test_wav_extensible_and_unknown_codec():
    import struct

    from richdem_spark.multimodal import wav_decode, wav_encode

    src = np.arange(-10, 10, dtype=np.int16)[:, None]
    blob = bytearray(wav_encode(src, rate=8000))
    # rewrite fmt as WAVE_FORMAT_EXTENSIBLE with PCM subformat
    fmt_off = blob.index(b"fmt ") + 8
    # cbSize=22, validBits=16, channelMask(4B)=0, then the 16-byte
    # subformat GUID whose first two bytes are the real format tag
    ext = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16) \
        + struct.pack("<HHIH", 22, 16, 0, 1) + b"\x00" * 14
    new = (bytes(blob[:fmt_off - 8]) + b"fmt "
           + struct.pack("<I", len(ext)) + ext
           + bytes(blob[fmt_off + struct.unpack("<I", blob[fmt_off - 4:fmt_off])[0]:]))
    got, rate = wav_decode(new)
    np.testing.assert_array_equal(got, src)
    # unknown codec tag raises
    bad = bytearray(wav_encode(src))
    i = bad.index(b"fmt ") + 8
    bad[i:i + 2] = struct.pack("<H", 2)      # ADPCM
    with pytest.raises(NotImplementedError):
        wav_decode(bytes(bad))


def test_audio_feature_pipeline(spark):
    from richdem_spark.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
        wav_encode,
    )

    rows = []
    rng = np.random.default_rng(17)
    for i in range(12):
        n = 400 + 40 * i
        t = np.arange(n) / 8000.0
        amp = 0.1 + 0.05 * i
        s = (amp * np.sin(2 * np.pi * (110 + 50 * i) * t) * 32767) \
            .astype(np.int16)
        rows.append((i, "audio", "audio/wav", None, None,
                     int(1000 * n / 8000), wav_encode(s, rate=8000)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in
             extract_audio_features(media).collect()}
    assert len(feats) == 12
    for i in range(12):
        f = feats[i]
        assert f.sample_rate == 8000
        assert f.n_frames == 400 + 40 * i
        amp = 0.1 + 0.05 * i
        # sine RMS = amp / sqrt(2); int16 quantization keeps it close
        assert abs(f.rms - amp / np.sqrt(2)) < 0.01, i
        assert f.peak <= amp + 0.01
        assert 0 < f.zero_cross_rate < 0.5


def test_jpeg_roundtrip_444_gray_420_restart():
    import numpy as np

    from richdem_spark.jpeg import jpeg_decode, jpeg_encode

    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 4) % 256, (yy * 4) % 256,
                    ((xx + yy) * 2) % 256], axis=-1).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 1.5

    g = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    dg = jpeg_decode(jpeg_encode(g, quality=95))
    assert dg.shape == g.shape
    assert np.abs(dg.astype(int) - g.astype(int)).mean() < 1.5

    # 4:2:0 exercises the decoder's chroma upsampling
    d420 = jpeg_decode(jpeg_encode(img, quality=95, subsample=True))
    assert d420.shape == img.shape
    assert np.abs(d420.astype(int) - img.astype(int)).mean() < 4.0

    # restart markers reset the DC predictors
    drst = jpeg_decode(jpeg_encode(img, quality=95, restart=2))
    np.testing.assert_array_equal(
        drst, jpeg_decode(jpeg_encode(img, quality=95)))

    # odd dimensions (partial MCUs)
    odd = img[:33, :37]
    dodd = jpeg_decode(jpeg_encode(odd, quality=90, subsample=True))
    assert dodd.shape == odd.shape


def test_jpeg_honest_errors_and_dispatch():
    import numpy as np
    import pytest as _pt

    from richdem_spark.jpeg import jpeg_decode, jpeg_encode
    from richdem_spark.multimodal import decode_image

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    enc = bytearray(jpeg_encode(img))
    # flip SOF0 -> SOF2 (progressive): must raise, not mis-decode
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with _pt.raises(NotImplementedError, match="SOF"):
        jpeg_decode(bytes(enc))

    with _pt.raises(ValueError, match="SOI"):
        jpeg_decode(b"not a jpeg")

    # decode_image dispatches on the JPEG magic; grayscale widens to 3ch
    g = (np.arange(256, dtype=np.uint8).reshape(16, 16))
    out = decode_image(jpeg_encode(g, quality=95))
    assert out.shape == (16, 16, 3)

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

"""Baseline JPEG codec (pipeline/jpeg.py) + MJPEG-in-AVI end-to-end.

Fills the compressed-media plug point (VERDICT r3 item 7): the decoder
reads DQT/DHT/SOF0/SOS/DRI generically from the stream, so it is not
coupled to the encoder's table choices; the encoder exists to build
deterministic compressed payloads without external fixtures.
"""

import numpy as np
import pytest

from searchengine_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
from searchengine_spark.pipeline.media_codecs import decode_avi, encode_avi


def _gradient(h, w, seed=0):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xx * 2 + seed) % 256, (yy * 3) % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)


@pytest.mark.parametrize("subsample", [False, True])
def test_jpeg_roundtrip_smooth(subsample):
    img = _gradient(90, 120)  # non-multiple-of-8/16 dims exercise padding
    data = encode_jpeg(img, quality=90, subsample=subsample)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    w, h, out = decode_jpeg(data)
    assert (w, h) == (120, 90) and out.shape == (90, 120, 3)
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < 2.5, err  # lossy, but q90 on smooth content is tight


def test_jpeg_roundtrip_noise_high_quality():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(img, quality=95))
    assert (w, h) == (64, 64)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8.0


def test_jpeg_quality_monotone_size():
    img = _gradient(64, 64)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_jpeg_rejects_progressive_and_garbage():
    img = _gradient(16, 16)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")


def test_mjpeg_avi_roundtrip_and_dispatch():
    rng = np.random.default_rng(3)
    # smooth frames (JPEG-friendly) with per-frame variation
    frames = np.stack([_gradient(32, 48, seed=9 * f) for f in range(3)])
    data = encode_avi(frames, fps=5, codec="MJPG", quality=92)
    assert b"MJPG" in data[:200]
    w, h, out = decode_avi(data)
    assert (w, h) == (48, 32) and out.shape == frames.shape
    err = np.abs(out.astype(int) - frames.astype(int)).mean()
    assert err < 3.0, err
    # uncompressed path still exact, and unknown codecs still refuse
    w2, h2, out2 = decode_avi(encode_avi(frames, fps=5))
    assert (out2 == frames).all()
    bad = bytearray(encode_avi(frames, fps=5, codec="MJPG"))
    i = bad.find(b"strf") + 8 + 16
    bad[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="external codec"):
        decode_avi(bytes(bad))


def test_mjpeg_through_multimodal_features():
    """The Spark-side plumbing consumes MJPEG like any other payload:
    real-decode featurization over mapInPandas (schema/batch shape
    unchanged)."""
    from searchengine_spark.pipeline.multimodal import _real_decode

    frames = np.stack([_gradient(16, 24, seed=f) for f in range(2)])
    payload = encode_avi(frames, fps=4, codec="MJPG")
    w, h, n, feat = _real_decode(payload, "video")
    assert (w, h, n) == (24, 16, 2)
    assert feat.shape == (16,) and abs(float(feat.sum()) - 1.0) < 1e-5

"""Dependency-free YUV4MPEG2 codec (functions/y4m.py) and the real
video frame-sampling path it enables (multimodal.sample_frames
fake=False): header parsing, frame indexing by timestamp, chroma
round-trips, malformed-input rejection, and the distributed decode
against the fixture's closed form."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.functions.multimodal import (
    sample_frames,
    synthetic_y4m_media,
)
from transforms_for_apache_kafka_connect_spark.functions.y4m import (
    y4m_decode_frame,
    y4m_encode,
    y4m_info,
)


def _const_frames(vals, h=4, w=8):
    """one constant-plane frame per (y, cb, cr) triple"""
    out = np.zeros((len(vals), h, w, 3), np.uint8)
    for i, (y, cb, cr) in enumerate(vals):
        out[i, :, :, 0] = y
        out[i, :, :, 1] = cb
        out[i, :, :, 2] = cr
    return out


def test_info_and_header_fields():
    data = y4m_encode(_const_frames([(1, 2, 3), (4, 5, 6)]), fps=(25, 1))
    info = y4m_info(data)
    assert info == {
        "width": 8, "height": 4, "fps": (25, 1), "chroma": "420",
        "n_frames": 2, "duration_ms": 80,
    }
    # header is the public ASCII shape
    assert data.startswith(b"YUV4MPEG2 W8 H4 F25:1 ")


@pytest.mark.parametrize("chroma", ["420", "422", "444"])
def test_constant_plane_roundtrip_all_chroma_modes(chroma):
    frames = _const_frames([(10, 60, 200), (250, 0, 128)])
    data = y4m_encode(frames, fps=(4, 1), chroma=chroma)
    assert y4m_info(data)["chroma"] == chroma
    for f, ts in [(0, 0), (0, 249), (1, 250), (1, 499)]:
        arr = y4m_decode_frame(data, ts)
        assert arr.shape == (4, 8, 3)
        assert (arr == frames[f]).all(), (chroma, ts)


def test_gradient_luma_survives_exactly():
    """Y is never subsampled: an arbitrary luma pattern round-trips
    bit-exactly in every mode; chroma is exact when constant per
    2x2 block (the 4:2:0 box average is the identity there)."""
    rng = np.random.default_rng(7)
    frames = np.zeros((1, 4, 8, 3), np.uint8)
    frames[0, :, :, 0] = rng.integers(0, 256, (4, 8), dtype=np.uint8)
    block = rng.integers(0, 256, (2, 4), dtype=np.uint8)
    frames[0, :, :, 1] = np.repeat(np.repeat(block, 2, 0), 2, 1)
    frames[0, :, :, 2] = 77
    arr = y4m_decode_frame(y4m_encode(frames), 0)
    assert (arr == frames[0]).all()


def test_rejections():
    good = y4m_encode(_const_frames([(1, 2, 3)]))
    with pytest.raises(ValueError, match="magic"):
        y4m_info(b"RIFF" + good)
    with pytest.raises(ValueError, match="truncated"):
        y4m_info(good[:-5])
    with pytest.raises(ValueError, match="past the last"):
        y4m_decode_frame(good, 10_000)
    with pytest.raises(ValueError, match="unsupported y4m chroma"):
        y4m_info(good.replace(b"C420", b"C410"))
    with pytest.raises(ValueError, match="NxHxWx3"):
        y4m_encode(np.zeros((2, 4, 8), np.uint8))
    with pytest.raises(ValueError, match="divisible"):
        y4m_encode(np.zeros((1, 3, 7, 3), np.uint8), chroma="420")


def test_sample_frames_real_decode_distributed(spark):
    """Distributed y4m decode: ids -> encode (workers) -> sample every
    250 ms -> per-frame means matching the fixture's closed form
    (fps=4 => sampled ts 0/250/500/750 hit frames 0..3)."""
    ids = spark.range(12).select(F.col("id").alias("media_id"))
    media = synthetic_y4m_media(ids, n_frames=6, fps=4)
    got = sample_frames(media, every_ms=250, fake=False).collect()
    # 6 frames at 4 fps = 1500 ms; every 250 ms -> 6 samples per video
    assert len(got) == 12 * 6
    for r in got:
        i, f = r["media_id"], r["frame_ts_ms"] // 250
        assert (r["width"], r["height"]) == (16, 8)
        assert r["mean_y"] == (i * 5 + 7 + 11 * f) % 256
        assert r["mean_cb"] == (i * 3 + 1 + f) % 256
        assert r["mean_cr"] == (i * 9 + 4 + 2 * f) % 256


def test_sample_frames_non_y4m_still_raises(spark):
    from transforms_for_apache_kafka_connect_spark.functions.multimodal import (
        synthetic_media,
    )

    media = synthetic_media(spark, 30)  # opaque hash payloads
    with pytest.raises(Exception, match="external decoder"):
        sample_frames(media, fake=False).collect()


def test_sample_frames_fake_path_unchanged(spark):
    from transforms_for_apache_kafka_connect_spark.functions.multimodal import (
        synthetic_media,
    )

    media = synthetic_media(spark, 30)
    out = sample_frames(media, every_ms=250, fake=True)
    assert out.columns == ["media_id", "frame_ts_ms", "frame_fingerprint"]
    assert out.count() > 0

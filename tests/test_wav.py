"""WAV codec (functions/wav.py) + the real audio path in multimodal:
round-trip laws, spec edge cases (8-bit unsigned, 24-bit packing,
float32, extra chunks, padding), the error contract, and distributed
audio_stats against closed-form square-wave oracles."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from transforms_for_apache_kafka_connect_spark.functions.multimodal import (
    audio_stats,
    synthetic_wav_media,
)
from transforms_for_apache_kafka_connect_spark.functions.wav import (
    decode_wav,
    encode_wav,
)


def test_roundtrip_16bit_stereo():
    rng = np.random.default_rng(7)
    x = rng.uniform(-0.9, 0.9, size=(500, 2))
    out, rate = decode_wav(encode_wav(x, 44_100))
    assert rate == 44_100 and out.shape == (500, 2)
    # scale mismatch (x*32767 enc, /32768 dec) + rounding: 1.5 LSB bound
    assert np.abs(out - x).max() < 1.5 / 32768


def _wav(fmt_code, channels, rate, bits, data, extra_chunks=b""):
    block = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", fmt_code, channels, rate,
                      rate * block, block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt + extra_chunks
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_8bit_is_unsigned():
    # spec: 8-bit PCM stores unsigned bytes biased at 128
    payload = _wav(1, 1, 8_000, 8, bytes([128, 255, 0, 128]))
    out, _ = decode_wav(payload)
    assert out[:, 0].tolist() == [0.0, 127 / 128, -1.0, 0.0]


def test_24bit_packing():
    # +2^23-1 and -2^23 at full scale
    data = b"\xff\xff\x7f" + b"\x00\x00\x80"
    out, _ = decode_wav(_wav(1, 1, 8_000, 24, data))
    assert out[0, 0] == pytest.approx((2**23 - 1) / 2**23)
    assert out[1, 0] == -1.0


def test_float32_passthrough():
    x = np.array([0.5, -0.25], dtype="<f4")
    out, _ = decode_wav(_wav(3, 1, 16_000, 32, x.tobytes()))
    assert out[:, 0].tolist() == [0.5, -0.25]


def test_extra_chunks_and_odd_padding_skipped():
    # a LIST chunk with an odd size (forces the word-align pad byte)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    data = np.array([1000, -1000], dtype="<i2").tobytes()
    out, rate = decode_wav(_wav(1, 1, 22_050, 16, data, extra_chunks=extra))
    assert rate == 22_050 and out.shape == (2, 1)


def test_error_contract():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    with pytest.raises(ValueError, match="no fmt"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    # truncated chunk body
    bad = _wav(1, 1, 8_000, 16, b"\x00\x00\x00\x00")[:-2]
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(bad)
    # compressed format: honest NotImplementedError, never garbage
    with pytest.raises(NotImplementedError, match="external codec"):
        decode_wav(_wav(85, 1, 8_000, 16, b"\x00\x00"))  # 0x55 = MP3


def test_audio_stats_square_wave_closed_form(spark):
    n, period, rate = 4_000, 40, 8_000
    media = synthetic_wav_media(
        spark.range(6), id_col="id", rate=rate, n_samples=n, period=period
    )
    got = {r.media_id: r for r in audio_stats(media).collect()}
    assert len(got) == 6
    for i in range(6):
        a = ((i * 7 + 13) % 100 + 1) / 128.0
        a_q = round(a * 32767) / 32768.0  # 16-bit quantization
        r = got[i]
        assert r.sample_rate == rate and r.channels == 1
        assert r.n_samples == n and r.duration_ms == n * 1000 // rate
        assert r.rms == pytest.approx(a_q, rel=1e-6)
        assert r.peak == pytest.approx(a_q, rel=1e-6)
        assert r.zero_crossings == 2 * n // period - 1


def test_audio_stats_filters_kind(spark):
    media = synthetic_wav_media(spark.range(3), id_col="id").withColumn(
        "kind", F.when(F.col("media_id") == 0, "video").otherwise("audio")
    )
    assert audio_stats(media).count() == 2


# ------------------------------------------------ property-based laws

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 300),
    ch=st.integers(1, 3),
    rate=st.sampled_from([8_000, 16_000, 44_100]),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_law(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.0, 1.0, size=(n, ch))
    out, r = decode_wav(encode_wav(x, rate))
    assert r == rate and out.shape == (n, ch)
    assert np.abs(out - x).max() < 1.5 / 32768


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_garbage_never_crashes_raw(data):
    """Arbitrary bytes -> the documented error contract, never a raw
    struct/zlib/index error (the per-record DLQ contract)."""
    try:
        decode_wav(data)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=30, deadline=None)
@given(cut=st.integers(0, 80), seed=st.integers(0, 999))
def test_truncation_never_crashes_raw(cut, seed):
    rng = np.random.default_rng(seed)
    full = encode_wav(rng.uniform(-1, 1, size=(16, 1)), 8_000)
    try:
        decode_wav(full[: max(0, len(full) - cut)])
    except (ValueError, NotImplementedError):
        pass

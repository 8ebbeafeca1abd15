"""Baseline JPEG codec laws (functions/jpeg.py): structural validity,
round-trip fidelity at several qualities/subsamplings, odd dimensions,
grayscale, error contracts, and the multimodal decode_image wiring.
Lossy codec — fidelity asserts are PSNR floors, not bit equality; the
STRUCTURE (dims, channels, marker layout) is exact."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from transforms_for_apache_kafka_connect_spark.functions.jpeg import (
    JPEG_SOI,
    jpeg_decode,
    jpeg_encode,
)


def _img(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 / max(w, 1), yy * 255 / max(h, 1),
         (xx + yy) * 255 / max(h + w, 1)],
        axis=2,
    )
    return np.clip(img + rng.normal(0, 3, img.shape), 0, 255).astype(np.uint8)


def _psnr(a, b):
    err = np.sqrt(np.mean((a.astype(float) - b.astype(float)) ** 2))
    return 20 * np.log10(255 / max(err, 1e-9))


def test_marker_structure():
    data = jpeg_encode(_img(16, 16), quality=85)
    assert data[:2] == JPEG_SOI and data[-2:] == b"\xff\xd9"
    assert b"\xff\xdb" in data  # DQT
    assert b"\xff\xc0" in data  # SOF0 (baseline)
    assert b"\xff\xc4" in data  # DHT
    assert b"\xff\xda" in data  # SOS
    # SOF0 carries the true dimensions
    i = data.index(b"\xff\xc0")
    h, w = struct.unpack(">HH", data[i + 5:i + 9])
    assert (h, w) == (16, 16)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("q,floor", [(95, 34.0), (85, 32.0), (50, 28.0)])
def test_roundtrip_fidelity(sub, q, floor):
    img = _img(40, 56)
    out = jpeg_decode(jpeg_encode(img, quality=q, subsampling=sub))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(out, img) >= floor


@pytest.mark.parametrize("h,w", [(1, 1), (7, 5), (8, 8), (9, 17), (23, 8)])
def test_odd_dimensions_both_subsamplings(h, w):
    img = _img(h, w)
    for sub in ("4:4:4", "4:2:0"):
        out = jpeg_decode(jpeg_encode(img, quality=90, subsampling=sub))
        assert out.shape == (h, w, 3)


def test_grayscale_roundtrip():
    rng = np.random.default_rng(3)
    yy = np.mgrid[0:24, 0:32][0]
    g = np.clip(yy * 8 + rng.normal(0, 2, (24, 32)), 0, 255).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(g, quality=90))
    assert out.shape == (24, 32)
    assert _psnr(out, g) >= 34.0


def test_quality_monotone_size():
    img = _img(64, 64)
    sizes = [len(jpeg_encode(img, quality=q)) for q in (30, 60, 95)]
    assert sizes == sorted(sizes)


def test_flat_image_is_tiny_and_exact():
    img = np.full((32, 32, 3), 128, dtype=np.uint8)
    data = jpeg_encode(img, quality=85)
    out = jpeg_decode(data)
    assert np.array_equal(out, img)  # DC-only blocks survive exactly
    assert len(data) < 900


def test_decode_errors():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x89PNG....")
    # progressive SOF2 refused by name, not garbage output
    img = jpeg_encode(_img(8, 8))
    prog = img.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="SOF"):
        jpeg_decode(prog)
    with pytest.raises(ValueError):
        jpeg_encode(_img(8, 8).astype(np.int32))
    with pytest.raises(ValueError, match="subsampling"):
        jpeg_encode(_img(8, 8), subsampling="4:1:1")


def test_decode_image_dispatches_jpeg(monkeypatch):
    import transforms_for_apache_kafka_connect_spark.functions.multimodal as mm

    monkeypatch.setattr(mm, "HAS_PIL", False)
    img = _img(16, 24)
    out = mm.decode_image(jpeg_encode(img, quality=95))
    assert out.shape == (16, 24, 3)
    assert _psnr(out, img) >= 30.0
    # PNG still routes to the PNG codec
    from transforms_for_apache_kafka_connect_spark.functions.png import (
        png_encode,
    )

    assert np.array_equal(mm.decode_image(png_encode(img)), img)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"GIF89a....")


def test_422_roundtrip():
    """4:2:2 (horizontal-only chroma subsampling) exercises the
    decoder's generic (sh, sv) sampling loop with asymmetric factors."""
    img = _img(24, 42)
    out = jpeg_decode(jpeg_encode(img, quality=90, subsampling="4:2:2"))
    assert out.shape == img.shape
    assert _psnr(out, img) >= 32.0


def test_decoder_reads_dht_not_our_table_shape(monkeypatch):
    """The decoder must build its huffman tables from the stream's DHT,
    not assume the encoder's shape: re-encode with a DIFFERENT (still
    canonical) table layout and the decode must be IDENTICAL — same
    quantized coefficients, different entropy coding."""
    import transforms_for_apache_kafka_connect_spark.functions.jpeg as J

    img = _img(17, 29)
    base = jpeg_decode(jpeg_encode(img, quality=80))

    def alt_tables():
        dc_bits = [0] * 16
        dc_bits[4] = 12  # 5-bit DC codes instead of 4
        dc_vals = list(range(12))
        ac_vals = [0x00, 0xF0] + [
            (run << 4) | size for run in range(16) for size in range(1, 11)
        ]
        ac_bits = [0] * 16
        ac_bits[9] = len(ac_vals)  # 10-bit AC codes instead of 9
        return (
            dc_bits, dc_vals, J._canonical_codes(dc_bits, dc_vals)
        ), (ac_bits, ac_vals, J._canonical_codes(ac_bits, ac_vals))

    monkeypatch.setattr(J, "_enc_tables", alt_tables)
    alt = jpeg_decode(jpeg_encode(img, quality=80))
    assert np.array_equal(alt, base)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_restart_markers_roundtrip(sub):
    """DRI + RSTn emission and the decoder's restart resync path: the
    stream must carry real RSTn markers, decode identically to the
    marker-free encoding, and reset DC prediction per segment."""
    img = _img(40, 48, seed=5)
    plain = jpeg_decode(jpeg_encode(img, quality=88, subsampling=sub))
    data = jpeg_encode(img, quality=88, subsampling=sub, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    out = jpeg_decode(data)
    assert np.array_equal(out, plain)


def test_restart_marker_cycle_wraps():
    """> 8 restart segments: RSTn cycles 0..7 and resync still works."""
    img = _img(80, 80, seed=9)
    data = jpeg_encode(img, quality=85, restart_interval=1)
    # 10x10 MCUs at 4:4:4 -> 99 restarts, so the full D0..D7 cycle
    for i in range(8):
        assert bytes([0xFF, 0xD0 + i]) in data
    assert np.array_equal(
        jpeg_decode(data), jpeg_decode(jpeg_encode(img, quality=85))
    )


def test_property_random_images_roundtrip():
    """Property sweep: random dims/content/quality/subsampling never
    crash, always return the right shape, and keep PSNR above a loose
    floor (JPEG is built for natural images; pure noise is its worst
    case, so the floor is structural sanity, not fidelity)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        q=st.integers(1, 100),
        sub=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
        gray=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
        ri=st.sampled_from([0, 1, 3]),
    )
    def law(h, w, q, sub, gray, seed, ri):
        rng = np.random.default_rng(seed)
        shape = (h, w) if gray else (h, w, 3)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = jpeg_encode(
            img, quality=q,
            subsampling="4:4:4" if gray else sub,
            restart_interval=ri,
        )
        out = jpeg_decode(data)
        assert out.shape == shape
        assert out.dtype == np.uint8

    law()


def test_truncated_streams_raise_value_error():
    """Truncation anywhere — mid-segment, mid-entropy — surfaces as
    ValueError (the media pipeline's per-record error contract), never
    a raw IndexError/struct.error from the parsers."""
    data = jpeg_encode(_img(24, 24), quality=85)
    for cut in (3, 10, len(data) // 2, len(data) - 3):
        with pytest.raises(ValueError):
            jpeg_decode(data[:cut])

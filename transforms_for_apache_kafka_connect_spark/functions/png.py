"""Dependency-free PNG codec (stdlib ``zlib`` + NumPy).

Implements the subset of the public PNG specification (W3C PNG, second
edition / RFC 2083) that image *data* pipelines need: 8-bit depth,
color types 0 (grayscale), 2 (RGB) and 6 (RGBA), no interlace, all
five scanline filter types (None/Sub/Up/Average/Paeth) on both encode
and decode, CRC-verified chunks. This is the no-dependency REAL image
path for :mod:`.multimodal` — Pillow, when importable, remains the
fast path; this codec exists so the decode step can run (and be
verified) in environments without imaging libraries.

Scale note: the codec itself is per-image Python/NumPy and is meant to
run INSIDE Arrow-batched ``mapInPandas`` workers, one image per call —
throughput comes from Spark's partition parallelism, not from this
module. Decode of filters 0/1/2 is vectorized per row; 3/4 (Average/
Paeth) reconstruct byte-sequentially as the spec's left-neighbor
dependency requires.

No code herein derives from any existing codec implementation; it is
written directly against the published specification.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

#: the 8-byte PNG signature (PNG spec §5.2)
PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def _chunk(typ: bytes, data: bytes) -> bytes:
    """length + type + data + CRC32(type+data) (PNG spec §5.3)."""
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _filter_row(
    ft: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply scanline filter ``ft`` to one raw row (encode direction,
    PNG spec §9): output = raw - predictor, mod 256. ``row``/``prev``
    are uint8 vectors of length width*channels."""
    r = row.astype(np.int16)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ft == 0:
        out = r
    elif ft == 1:
        out = r - left
    elif ft == 2:
        out = r - up
    elif ft == 3:
        out = r - ((left + up) >> 1)
    elif ft == 4:
        out = r - _paeth(left, up, upleft)
    else:
        raise ValueError(f"unknown PNG filter type: {ft}")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (PNG spec §9.4): the neighbor
    (left, up, up-left) closest to p = a + b - c, ties resolved in
    that order."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    )


def png_encode(
    arr: np.ndarray,
    *,
    filters: int | str = "auto",
    compress_level: int = 6,
) -> bytes:
    """8-bit image array -> PNG bytes.

    ``arr``: HxW (grayscale), HxWx3 (RGB) or HxWx4 (RGBA) uint8.
    ``filters``: a fixed filter type 0-4 for every row, ``"auto"``
    (filter 0 — this encoder optimizes for determinism, not size), or
    ``"cycle"`` (row y uses filter y % 5 — exercises every filter type
    on decode, which is what the test fixtures want).
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type = 0
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type = 2
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(
            f"expected HxW, HxWx3 or HxWx4 uint8 array, got shape {a.shape}"
        )
    channels = _COLOR_CHANNELS[color_type]
    h, w = a.shape[0], a.shape[1]
    if h == 0 or w == 0:
        raise ValueError(f"empty image: {a.shape}")
    flat = a.reshape(h, w * channels)
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.uint8)
    for y in range(h):
        if filters == "auto":
            ft = 0
        elif filters == "cycle":
            ft = y % 5
        else:
            ft = int(filters)
        raw.append(ft)
        raw += _filter_row(ft, flat[y], prev, channels).tobytes()
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), compress_level))
        + _chunk(b"IEND", b"")
    )


def _unfilter_row(
    ft: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Reconstruct one scanline (decode direction, PNG spec §9):
    raw = filtered + predictor, mod 256, where the predictor uses
    already-RECONSTRUCTED neighbors."""
    if ft == 0:
        return row.copy()
    if ft == 2:
        return (row.astype(np.int16) + prev).astype(np.uint8)
    if ft == 1:
        # raw[i] = filt[i] + raw[i-bpp]: a per-channel running sum —
        # group bytes by channel offset and cumsum mod 256
        g = row.reshape(-1, bpp).astype(np.int64)
        return (np.cumsum(g, axis=0) % 256).astype(np.uint8).reshape(-1)
    out = np.zeros_like(row)
    n = len(row)
    if ft == 3:
        for i in range(n):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        return out
    if ft == 4:
        for i in range(n):
            a = int(out[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (int(row[i]) + pred) & 0xFF
        return out
    raise ValueError(f"unknown PNG filter type: {ft}")


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (HxW for grayscale, HxWx3 for RGB,
    HxWx4 for RGBA). CRCs are verified; unsupported shapes (palette,
    16-bit, interlaced) raise ``ValueError`` naming the feature."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        data = bytes(data)
    data = bytes(data)
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG: chunk header past end")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated PNG: {typ!r} body short")
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated PNG: {typ!r} CRC past end")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if crc != (zlib.crc32(typ + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG CRC mismatch in {typ!r} chunk")
        pos += 12 + length
        if typ == b"IHDR":
            if ihdr is not None:
                raise ValueError("duplicate IHDR")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            if ihdr is None:
                raise ValueError("IDAT before IHDR")
            idat += body
        elif typ == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    if not seen_iend:
        raise ValueError("no IEND chunk")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color_type not in _COLOR_CHANNELS:
        raise ValueError(
            f"unsupported PNG color type {color_type} "
            "(only 0=gray, 2=RGB, 6=RGBA)"
        )
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    channels = _COLOR_CHANNELS[color_type]
    stride = w * channels
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG: IDAT inflate failed ({e})") from e
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG data length {len(raw)} != expected {h * (stride + 1)}"
        )
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prev = _unfilter_row(int(buf[y, 0]), buf[y, 1:], prev, channels)
        out[y] = prev
    if color_type == 0:
        return out
    return out.reshape(h, w, channels)

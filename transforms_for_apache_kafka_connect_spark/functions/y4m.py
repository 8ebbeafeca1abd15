"""Dependency-free YUV4MPEG2 (.y4m) video codec (NumPy only).

YUV4MPEG2 is the public uncompressed video interchange format (the
format mjpegtools/ffmpeg use for raw pipes): an ASCII stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> [I. A. C<cs>]\\n`` followed by
frames, each ``FRAME[ params]\\n`` + raw planar YCbCr bytes. This
module implements the subset a frame-sampling pipeline needs: C420
(default, 4:2:0 — half-resolution chroma), C422 and C444, 8-bit.

Like :mod:`.png`, this is the no-dependency REAL video path for
:mod:`.multimodal`: compressed formats (H.264 etc.) still require an
external decoder and keep the explicit ``NotImplementedError``, but
the plumbing-to-pixels contract can now be exercised end-to-end on an
open format in bare containers. Runs per-payload inside Arrow-batched
``mapInPandas`` workers; parallelism comes from Spark partitions.

Written directly against the published format description; no code
herein derives from any existing decoder.
"""

from __future__ import annotations

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2 "

#: chroma subsampling -> (x divisor, y divisor) for the Cb/Cr planes
_CHROMA_DIV = {"420": (2, 2), "422": (2, 1), "444": (1, 1)}


def _parse_stream_header(data: bytes) -> tuple[dict, int]:
    if not data.startswith(Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream: bad magic")
    end = data.find(b"\n")
    if end < 0:
        raise ValueError("truncated y4m: no stream-header newline")
    params: dict = {"chroma": "420"}
    for tok in data[len(Y4M_MAGIC): end].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii")
        if tag == "W":
            params["width"] = int(val)
        elif tag == "H":
            params["height"] = int(val)
        elif tag == "F":
            num, den = val.split(":")
            params["fps"] = (int(num), int(den))
        elif tag == "C":
            # e.g. C420jpeg / C420mpeg2 share the 4:2:0 plane layout
            base = val[:3]
            if base not in _CHROMA_DIV:
                raise ValueError(f"unsupported y4m chroma mode C{val}")
            params["chroma"] = base
        # I (interlace), A (aspect), X (comment) don't affect plane math
    if "width" not in params or "height" not in params:
        raise ValueError("y4m stream header missing W or H")
    if "fps" not in params:
        raise ValueError("y4m stream header missing F (frame rate)")
    return params, end + 1


def _frame_size(params: dict) -> int:
    w, h = params["width"], params["height"]
    dx, dy = _CHROMA_DIV[params["chroma"]]
    return w * h + 2 * ((w // dx) * (h // dy))


def y4m_info(data: bytes) -> dict:
    """Stream metadata without decoding: width, height, fps tuple,
    chroma mode, frame count, duration_ms."""
    params, pos = _parse_stream_header(bytes(data))
    fsize = _frame_size(params)
    data = bytes(data)
    n = 0
    while pos < len(data):
        end = data.find(b"\n", pos)
        if end < 0 or data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"y4m: bad FRAME marker at offset {pos}")
        pos = end + 1 + fsize
        if pos > len(data):
            raise ValueError("truncated y4m: frame data past end")
        n += 1
    num, den = params["fps"]
    return {
        "width": params["width"],
        "height": params["height"],
        "fps": params["fps"],
        "chroma": params["chroma"],
        "n_frames": n,
        "duration_ms": int(n * 1000 * den / num),
    }


def y4m_decode_frame(data: bytes, ts_ms: int) -> np.ndarray:
    """The frame covering timestamp ``ts_ms`` -> HxWx3 uint8 YCbCr
    array (chroma planes upsampled by nearest-neighbor repetition).
    Frame index = floor(ts_ms * fps / 1000); past-the-end timestamps
    raise ``ValueError``."""
    data = bytes(data)
    params, pos = _parse_stream_header(data)
    w, h = params["width"], params["height"]
    dx, dy = _CHROMA_DIV[params["chroma"]]
    cw, ch = w // dx, h // dy
    fsize = w * h + 2 * cw * ch
    num, den = params["fps"]
    idx = ts_ms * num // (1000 * den)
    i = 0
    while pos < len(data):
        end = data.find(b"\n", pos)
        if end < 0 or data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"y4m: bad FRAME marker at offset {pos}")
        body = end + 1
        if body + fsize > len(data):
            raise ValueError("truncated y4m: frame data past end")
        if i == idx:
            buf = np.frombuffer(data[body:body + fsize], dtype=np.uint8)
            y = buf[: w * h].reshape(h, w)
            cb = buf[w * h: w * h + cw * ch].reshape(ch, cw)
            cr = buf[w * h + cw * ch:].reshape(ch, cw)
            cb = np.repeat(np.repeat(cb, dy, axis=0), dx, axis=1)[:h, :w]
            cr = np.repeat(np.repeat(cr, dy, axis=0), dx, axis=1)[:h, :w]
            return np.stack([y, cb, cr], axis=2)
        pos = body + fsize
        i += 1
    raise ValueError(
        f"y4m: timestamp {ts_ms} ms maps to frame {idx}, past the last "
        f"frame ({i})"
    )


def y4m_encode(frames: np.ndarray, *, fps: tuple[int, int] = (4, 1),
               chroma: str = "420") -> bytes:
    """N x H x W x 3 uint8 YCbCr frames -> y4m bytes (fixture
    generator: chroma planes are box-downsampled per the mode)."""
    if chroma not in _CHROMA_DIV:
        raise ValueError(f"unsupported chroma mode {chroma!r}")
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 4 or a.shape[3] != 3:
        raise ValueError(f"expected NxHxWx3 uint8, got {a.shape}")
    n, h, w = a.shape[:3]
    dx, dy = _CHROMA_DIV[chroma]
    if w % dx or h % dy:
        raise ValueError(
            f"{w}x{h} not divisible by the C{chroma} chroma factors"
        )
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n"
        .encode("ascii")
    )
    for f in a:
        out += b"FRAME\n"
        out += f[:, :, 0].tobytes()
        for c in (1, 2):
            plane = f[:, :, c].astype(np.uint16)
            plane = plane.reshape(h // dy, dy, w // dx, dx)
            out += (plane.mean(axis=(1, 3)) + 0.5).astype(np.uint8).tobytes()
    return bytes(out)

"""Dependency-free WAV (RIFF PCM) audio codec (NumPy + struct only).

WAV is the public uncompressed audio interchange format (RIFF
container, ``fmt `` chunk + ``data`` chunk, published in the
Microsoft/IBM RIFF spec and IETF RFC 2361 wave-format registry). This
module implements the subset a training-data audio pipeline needs:
integer PCM (format 1) at 8/16/24/32 bits and IEEE float32 (format 3),
any channel count, arbitrary extra chunks skipped.

Like :mod:`.png` (image) and :mod:`.y4m` (video), this is the
no-dependency REAL audio path for :mod:`.multimodal`: compressed
formats (MP3/AAC/Opus) still require an external decoder and keep the
explicit ``NotImplementedError``, but the plumbing-to-samples contract
is exercisable end-to-end in bare containers. Runs per-payload inside
Arrow-batched ``mapInPandas`` workers; parallelism comes from Spark
partitions.

Written directly against the published RIFF/WAVE format description;
no code herein derives from any existing decoder.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav"]


def _chunks(data: bytes):
    """Yield (chunk_id, payload_offset, size) walking the RIFF body;
    chunks are word-aligned (odd sizes padded by one byte)."""
    pos = 12  # past 'RIFF' <size> 'WAVE'
    n = len(data)
    while pos + 8 <= n:
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = pos + 8
        if body + size > n:
            raise ValueError(
                f"truncated WAV: chunk {cid!r} runs past end of payload"
            )
        yield cid, body, size
        pos = body + size + (size & 1)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples float64 array shaped (n_frames, channels)
    scaled to [-1, 1], sample_rate).

    Integer PCM is scaled by its full-scale value (asymmetric two's
    complement: -1.0 is reachable, +1.0 is not — the standard
    convention); float32 data is taken as-is. Malformed input of any
    shape raises ``ValueError`` (the per-record error contract —
    never a raw struct/overflow error).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    for cid, off, size in _chunks(payload):
        if cid == b"fmt " and fmt is None:
            if size < 16:
                raise ValueError("malformed WAV: fmt chunk under 16 bytes")
            fmt = struct.unpack_from("<HHIIHH", payload, off)
        elif cid == b"data" and data is None:
            data = payload[off:off + size]
    if fmt is None:
        raise ValueError("malformed WAV: no fmt chunk")
    if data is None:
        raise ValueError("malformed WAV: no data chunk")
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if channels < 1:
        raise ValueError("malformed WAV: zero channels")
    if rate < 1:
        raise ValueError("malformed WAV: zero sample rate")
    if audio_format == 1:  # integer PCM
        if bits not in (8, 16, 24, 32):
            raise ValueError(f"unsupported PCM bit depth: {bits}")
    elif audio_format == 3:  # IEEE float
        if bits != 32:
            raise ValueError(f"unsupported float bit depth: {bits}")
    else:
        # compressed (format 2, 6, 7, 0x55... MP3) — external decoder
        # territory, same contract as H.264 in the video path
        raise NotImplementedError(
            f"WAV audio format {audio_format} needs an external codec; "
            "only PCM (1) and float32 (3) decode here"
        )
    expect_align = channels * (bits // 8)
    if block_align not in (0, expect_align):
        raise ValueError(
            f"malformed WAV: block align {block_align} != {expect_align}"
        )
    n_frames = len(data) // expect_align
    data = data[: n_frames * expect_align]
    if audio_format == 3:
        arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif bits == 8:  # 8-bit PCM is UNSIGNED per the spec
        arr = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
               - 128.0) / 128.0
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        arr = (np.frombuffer(data, dtype="<i4").astype(np.float64)
               / 2147483648.0)
    else:  # 24-bit: no native dtype — widen via a zero-padded 4th byte
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        padded = np.zeros((raw.shape[0], 4), dtype=np.uint8)
        padded[:, 1:] = raw  # little-endian: i4 value = sample << 8,
        # so /2^31 divides the 24-bit sample by its full scale 2^23
        arr = padded.view("<i4").ravel().astype(np.float64) / 2147483648.0
    return arr.reshape(n_frames, channels), rate


def encode_wav(
    samples: np.ndarray, rate: int, *, bits: int = 16
) -> bytes:
    """(n_frames, channels) float array in [-1, 1] -> 16-bit PCM WAV
    bytes (the fixture-generation direction; 16-bit only)."""
    if bits != 16:
        raise ValueError("encode_wav writes 16-bit PCM only")
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, channels = samples.shape
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Spark-side plumbing (schema, partitioning, Arrow batch
shape) fully real and the *codec* step optional-dependency-gated (the
Iceberg-sink pattern): when Pillow is importable the real JPEG/PNG
decode/resize runs; otherwise ``fake=True`` (the sandbox default — no
imaging libs in this container) picks the deterministic hash-derived
fake so the distributed pipeline stays testable end-to-end. Pass
``fake=None`` to auto-select — the probe runs on the DRIVER and
assumes a uniform driver/executor Python environment (the normal
spark-submit contract); a driver-only Pillow install fails in the
workers with an actionable message (see ``decode_image``).
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional dependency — never required
    from PIL import Image as _PILImage

    HAS_PIL = True
except Exception:  # pragma: no cover - import guard
    _PILImage = None
    HAS_PIL = False


def _resolve_fake(fake: bool | None) -> bool:
    return not HAS_PIL if fake is None else fake

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 512).cast(
        "binary"
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.lit(1000).cast("long").alias("duration_ms"),
        payload.alias("payload"),
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Image bytes -> HxWx3 uint8 array. Pillow when importable (any
    format it knows); otherwise PNG payloads decode through the
    dependency-free spec codec (:mod:`.png` — stdlib zlib + NumPy) and
    baseline JPEG through :mod:`.jpeg` (huffman + IDCT, NumPy), so the
    REAL decode path runs even in containers without imaging
    libraries. Other formats without Pillow raise NotImplementedError
    (the deterministic fake path covers those pipelines).

    ``fake=None`` auto-selection happens on the DRIVER (assuming a
    uniform Python environment, the normal spark-submit contract); this
    runs in executor workers, so the message below names the actual
    fix when the environments diverge."""
    if HAS_PIL:
        with _PILImage.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"))
    from transforms_for_apache_kafka_connect_spark.functions.png import (
        PNG_SIGNATURE,
        png_decode,
    )

    if bytes(payload[:8]) == PNG_SIGNATURE:
        arr = png_decode(payload)
        if arr.ndim == 2:  # grayscale -> RGB (replicate channels)
            return np.repeat(arr[:, :, None], 3, axis=2)
        return arr[:, :, :3]  # RGBA -> RGB (drop alpha)
    from transforms_for_apache_kafka_connect_spark.functions.jpeg import (
        JPEG_SOI,
        jpeg_decode,
    )

    if bytes(payload[:2]) == JPEG_SOI:
        arr = jpeg_decode(payload)
        if arr.ndim == 2:
            return np.repeat(arr[:, :, None], 3, axis=2)
        return arr
    raise NotImplementedError(
        "non-PNG/JPEG image decode requires Pillow, which is not "
        "importable in this Python worker. If it IS installed on the "
        "driver, ship it to the executors (spark-submit --archives / a "
        "uniform image) or pass fake=True for the deterministic fake path"
    )


def _real_features(payload: bytes) -> np.ndarray:
    """Decode + featurize: 4x4 grayscale thumbnail -> FEATURE_DIM
    floats in [0, 1] (deterministic, resolution-invariant)."""
    arr = decode_image(payload).astype(np.float32)
    gray = arr.mean(axis=2)
    with _PILImage.fromarray(gray.astype(np.uint8), mode="L") as im:
        thumb = np.asarray(im.resize((4, 4), _PILImage.BILINEAR))
    return (thumb.astype(np.float32) / 255.0).reshape(FEATURE_DIM)


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a decoder+featurizer: 16 floats
    derived from the sha256 of the payload."""
    d = hashlib.sha256(payload or b"").digest()
    return (
        np.frombuffer(d[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
        / 65535.0
    )


def extract_features(media: DataFrame, *, fake: bool | None = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of binary payloads
    in, float vectors out. Partitioning, schema and batch shape are the
    real production plumbing; the codec step is real when Pillow is
    importable (``fake=False``/``fake=None``) and the deterministic
    hash fake otherwise."""
    fake = _resolve_fake(fake)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if fake:
                    feats.append(_fake_features(payload))
                else:
                    feats.append(_real_features(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


#: pixel(x, y, c) of the synthetic fixture = channel base + x, where
#: the bases derive from media_id; width <= 8 keeps base+x < 256 so the
#: per-channel mean is EXACTLY base + (width-1)/2 — a closed form any
#: SQL engine can recompute, which is what makes the real decode path
#: oracle-checkable end-to-end
PNG_BASE_MOD = 248


def synthetic_png_media(
    df: DataFrame, *, id_col: str = "media_id", width: int = 8, height: int = 8
) -> DataFrame:
    """ids -> real PNG payloads, encoded distributed (Arrow batches
    through ``mapInPandas``, the dependency-free spec codec from
    :mod:`.png`). Row y of each image uses scanline filter y % 5, so a
    decoder must reconstruct every PNG filter type to read these back.
    Pixel values are ``base_c + x`` with ``base_r = id % 248``,
    ``base_g = (id*7+13) % 248``, ``base_b = (id*31+101) % 248``."""
    if width > 8:
        raise ValueError(
            f"width must be <= 8 to keep base+x wrap-free: {width}"
        )
    from transforms_for_apache_kafka_connect_spark.functions.png import (
        png_encode,
    )

    ids_only = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        x = np.arange(width, dtype=np.uint8)
        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                bases = np.array(
                    [i % PNG_BASE_MOD, (i * 7 + 13) % PNG_BASE_MOD,
                     (i * 31 + 101) % PNG_BASE_MOD],
                    dtype=np.uint8,
                )
                row = bases[None, :] + x[:, None]  # (w, 3)
                arr = np.broadcast_to(row, (height, width, 3))
                payloads.append(png_encode(arr, filters="cycle"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "mime": "image/png",
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "duration_ms": np.int64(0),
                    "payload": payloads,
                }
            )

    return ids_only.mapInPandas(run, schema=MEDIA_SCHEMA)


def synthetic_jpeg_media(df: DataFrame, *, id_col: str = "media_id") -> DataFrame:
    """ids -> real baseline JPEG payloads, encoded distributed through
    the dependency-free codec (:mod:`.jpeg`). Each image is FLAT
    grayscale ``v = 128 + 5*(id % 10)`` at ``w = 5 + id % 9``,
    ``h = 6 + id % 7`` (odd dims exercise edge-padding crop). The
    value grid is chosen so the quality-85 luminance DC quantizer (5)
    divides the DC coefficient exactly — a flat block has no AC
    energy, so the decode is BIT-EXACT and a SQL oracle predicts
    ``mean == v`` in closed form (the lossy-codec analog of the PNG
    fixture's pixel law)."""
    from transforms_for_apache_kafka_connect_spark.functions.jpeg import (
        jpeg_encode,
    )

    ids_only = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs = [], [], []
            for i in pdf["media_id"]:
                i = int(i)
                v = 128 + 5 * (i % 10)
                w, h = 5 + i % 9, 6 + i % 7
                img = np.full((h, w), v, dtype=np.uint8)
                payloads.append(jpeg_encode(img, quality=85))
                ws.append(np.int32(w))
                hs.append(np.int32(h))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "mime": "image/jpeg",
                    "width": ws,
                    "height": hs,
                    "duration_ms": np.int64(0),
                    "payload": payloads,
                }
            )

    return ids_only.mapInPandas(run, schema=MEDIA_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
    ]
)


def image_stats(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """REAL image decode in the distributed loop: dimensions +
    per-channel means from the decoded pixel array (``decode_image`` —
    Pillow when present, the dependency-free PNG codec otherwise).
    Unlike ``extract_features`` there is no resample step, so the
    output is bit-identical across environments and — for
    ``synthetic_png_media`` fixtures — equals a closed form an
    external SQL oracle can recompute. The real path is the DEFAULT
    here (unlike the featurizers): PNG decode needs no optional
    dependency, so there is nothing to gate on."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if fake:
                    d = _fake_features(payload)
                    rows.append((int(mid), 0, 0, float(d[0]),
                                 float(d[1]), float(d[2])))
                    continue
                arr = decode_image(bytes(payload))
                means = arr.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (int(mid), int(arr.shape[1]), int(arr.shape[0]),
                     float(means[0]), float(means[1]), float(means[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height",
                         "mean_r", "mean_g", "mean_b"],
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=IMAGE_STATS_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, *, fake: bool | None = True
) -> DataFrame:
    """Image resize plumbing: images flow through Arrow batches and come
    out with the target dimensions and a payload of exactly
    width*height bytes. With Pillow present (``fake=False``/``None``)
    the resample is a real bilinear grayscale resize (L-mode raw bytes,
    so the byte-count contract is identical); the fake path expands the
    payload's sha512 keystream deterministically — byte-count and
    schema behave like a real resampler, so partitioning/batch-shape
    tests are meaningful either way."""
    fake = _resolve_fake(fake)
    imgs = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for payload in pdf["payload"]:
                if payload is None:
                    out.append(None)
                    continue
                if not fake:
                    gray = decode_image(bytes(payload)).mean(axis=2)
                    with _PILImage.fromarray(
                        gray.astype(np.uint8), mode="L"
                    ) as im:
                        out.append(
                            im.resize((width, height), _PILImage.BILINEAR)
                            .tobytes()
                        )
                    continue
                # deterministic keystream expansion to the target size
                buf = bytearray()
                counter = 0
                seed = bytes(payload)
                while len(buf) < n_out:
                    buf += hashlib.sha512(
                        seed + counter.to_bytes(4, "big")
                    ).digest()
                    counter += 1
                out.append(bytes(buf[:n_out]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "payload": out,
                }
            )

    return imgs.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_y", T.DoubleType(), False),
        T.StructField("mean_cb", T.DoubleType(), False),
        T.StructField("mean_cr", T.DoubleType(), False),
    ]
)


def synthetic_y4m_media(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    width: int = 16,
    height: int = 8,
    n_frames: int = 8,
    fps: int = 4,
) -> DataFrame:
    """ids -> real YUV4MPEG2 payloads (functions/y4m.py), encoded
    distributed. Frame f of media i carries CONSTANT planes
    y = (i*5 + 7 + 11*f) % 256, cb = (i*3 + 1 + f) % 256,
    cr = (i*9 + 4 + 2*f) % 256 — constants survive the 4:2:0 chroma
    round-trip exactly, so per-frame means are a closed form tests
    (and SQL oracles) recompute."""
    from transforms_for_apache_kafka_connect_spark.functions.y4m import (
        y4m_encode,
    )

    ids_only = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                frames = np.zeros((n_frames, height, width, 3), np.uint8)
                for f in range(n_frames):
                    frames[f, :, :, 0] = (i * 5 + 7 + 11 * f) % 256
                    frames[f, :, :, 1] = (i * 3 + 1 + f) % 256
                    frames[f, :, :, 2] = (i * 9 + 4 + 2 * f) % 256
                payloads.append(y4m_encode(frames, fps=(fps, 1)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "mime": "video/x-yuv4mpeg",
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "duration_ms": np.int64(n_frames * 1000 // fps),
                    "payload": payloads,
                }
            )

    return ids_only.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 250, *, fake: bool = True
) -> DataFrame:
    """Video frame sampling.

    ``fake=True`` (default): plumbing-only — one row per sampled
    timestamp (explode JVM-side) with a deterministic payload
    fingerprint standing in for the decoded frame.

    ``fake=False``: REAL decode for YUV4MPEG2 payloads via the
    dependency-free codec (functions/y4m.py) — each worker parses the
    stream once per payload and emits per-frame dimensions +
    plane means (Y/Cb/Cr). Compressed formats (H.264, VP9, ...) still
    require an external decoder and raise ``NotImplementedError``
    naming the payload's magic — the honest boundary of what a bare
    container can decode."""
    vids = media.filter(F.col("kind") == "video")
    if fake:
        frames = vids.select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
            "payload",
        )
        return frames.select(
            "media_id",
            "frame_ts_ms",
            F.xxhash64("payload", "frame_ts_ms").alias("frame_fingerprint"),
        )

    from transforms_for_apache_kafka_connect_spark.functions.y4m import (
        Y4M_MAGIC,
        y4m_decode_frame,
        y4m_info,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                b = bytes(payload)
                if not b.startswith(Y4M_MAGIC):
                    raise NotImplementedError(
                        f"video decode for payload magic {b[:8]!r} needs "
                        "an external decoder; only YUV4MPEG2 decodes "
                        "dependency-free (or pass fake=True)"
                    )
                info = y4m_info(b)
                span = min(int(dur), info["duration_ms"])
                for ts in range(0, span, every_ms):
                    fr = y4m_decode_frame(b, ts)
                    means = fr.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (int(mid), ts, info["width"], info["height"],
                         float(means[0]), float(means[1]), float(means[2]))
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_ts_ms", "width", "height",
                         "mean_y", "mean_cb", "mean_cr"],
            )

    return vids.mapInPandas(run, schema=FRAME_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.DoubleType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def synthetic_wav_media(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    rate: int = 8_000,
    n_samples: int = 4_000,
    period: int = 40,
) -> DataFrame:
    """ids -> real RIFF PCM payloads (functions/wav.py), encoded
    distributed. Media i carries a full-cycle square wave of amplitude
    a_i = ((i*7 + 13) % 100 + 1) / 128 and period ``period`` samples —
    square waves have closed-form stats (rms == peak == a_i up to
    16-bit quantization; zero crossings = 2*n/period - 1) that tests
    and oracles recompute without any DSP dependency."""
    if period < 2 or period % 2:
        # an odd period would quietly generate a 2*(period//2)-sample
        # wave and break the documented closed forms
        raise ValueError(f"period must be even and >= 2: {period}")
    from transforms_for_apache_kafka_connect_spark.functions.wav import (
        encode_wav,
    )

    ids_only = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                a = ((i * 7 + 13) % 100 + 1) / 128.0
                t = np.arange(n_samples)
                wave = np.where((t // (period // 2)) % 2 == 0, a, -a)
                payloads.append(encode_wav(wave, rate))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "audio",
                    "mime": "audio/wav",
                    "width": np.int32(0),
                    "height": np.int32(0),
                    "duration_ms": np.int64(n_samples * 1000 // rate),
                    "payload": payloads,
                }
            )

    return ids_only.mapInPandas(run, schema=MEDIA_SCHEMA)


def audio_stats(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """REAL audio decode in the distributed loop: PCM/float WAV
    payloads (functions/wav.py — dependency-free, the audio analog of
    the PNG and Y4M real paths) -> sample-rate/channel/duration +
    rms/peak/zero-crossing stats. Compressed audio (MP3/AAC/Opus)
    still needs an external codec and raises ``NotImplementedError``
    — the honest boundary of a bare container. Real decode is the
    DEFAULT (nothing to gate on); ``fake=True`` keeps plumbing-only
    runs for payloads that are not WAV."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from transforms_for_apache_kafka_connect_spark.functions.wav import (
            decode_wav,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if fake:
                    d = _fake_features(bytes(payload))
                    rows.append((int(mid), 0, 0, 0, 0,
                                 float(abs(d[0])), float(abs(d[1])), 0))
                    continue
                samples, rate = decode_wav(bytes(payload))
                mono = samples.mean(axis=1)
                sign = np.sign(mono)
                zc = int(np.count_nonzero(np.diff(sign[sign != 0])))
                n_frames = int(samples.shape[0])
                rows.append(
                    (
                        int(mid), int(rate), int(samples.shape[1]),
                        n_frames,
                        n_frames * 1000 // rate,
                        # an empty data chunk is a VALID WAV: stats are
                        # 0, not a zero-size-reduction crash
                        float(np.sqrt((samples ** 2).mean()))
                        if n_frames else 0.0,
                        float(np.abs(samples).max()) if n_frames else 0.0,
                        zc,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_STATS_SCHEMA])

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_STATS_SCHEMA
    )

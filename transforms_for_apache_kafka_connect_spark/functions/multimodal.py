"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Spark-side plumbing (schema, partitioning, Arrow batch
shape) fully real and the *codec* step stubbed — the container ships no
image/audio libraries, so decode raises NotImplementedError unless
``fake=True`` picks the deterministic fake (hash-derived features),
which keeps the distributed pipeline testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def decode_image(payload: bytes) -> np.ndarray:  # pragma: no cover - stub
    """Real decode needs PIL/libjpeg — not in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake=True for the deterministic fake path"
    )


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a decoder+featurizer: 16 floats
    derived from the sha256 of the payload."""
    d = hashlib.sha256(payload or b"").digest()
    return (
        np.frombuffer(d[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
        / 65535.0
    )


def extract_features(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of binary payloads
    in, float vectors out. Partitioning, schema and batch shape are the
    real production plumbing; only the codec is faked/stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if not fake:
                    decode_image(payload)  # raises: no codec in container
                feats.append(_fake_features(payload))
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
    media: DataFrame, width: int, height: int, *, fake: bool = True
) -> DataFrame:
    """Image resize plumbing: images flow through Arrow batches and come
    out with the target dimensions and a payload of exactly
    width*height bytes. The resample itself is the stubbed codec step
    (``fake=True`` expands the payload's sha512 keystream
    deterministically — byte-count and schema behave like a real
    resampler, so partitioning/batch-shape tests are meaningful)."""
    imgs = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for payload in pdf["payload"]:
                if not fake:
                    decode_image(payload)  # raises: no codec in container
                if payload is None:
                    out.append(None)
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


def sample_frames(
    media: DataFrame, every_ms: int = 250, *, fake: bool = True
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (explode JVM-side); frame decode itself is the stubbed
    codec step."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
        "payload",
    )
    if not fake:  # pragma: no cover - stub path
        raise NotImplementedError("video frame decode not available")
    return frames.select(
        "media_id",
        "frame_ts_ms",
        F.xxhash64("payload", "frame_ts_ms").alias("frame_fingerprint"),
    )

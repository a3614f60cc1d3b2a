"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery is real and tested — schemas, partition-friendly
batching, mapInPandas signatures, deterministic fake feature extraction —
while the actual codecs are stubbed (no image/audio libraries in this
container).  Swap ``_decode_image_stub`` for PIL/torchvision decode on a
real cluster; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feature array<float>, decode_error string"
)


def synthetic_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes, typed metadata."""

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.RandomState((seed << 16) ^ i)
                kind = ("image", "audio", "video")[i % 3]
                payload = rng.bytes(256 + (i % 512))
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "mime": {"image": "image/jpeg", "audio": "audio/ogg",
                                 "video": "video/mp4"}[kind],
                        "width": 640 if kind != "audio" else None,
                        "height": 480 if kind != "audio" else None,
                        "duration_ms": None if kind == "image" else 1000 + i,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB: a real implementation decodes JPEG/PNG (PIL not available in
    this container).  The deterministic fake hashes the payload into a
    pseudo-pixel array so downstream shapes and determinism are testable."""
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0


def extract_features(media: DataFrame, feature_dim: int = 32) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, typed features out.

    Real per-kind decode paths would plug in here (image decode+resize,
    audio frame sample, video keyframe extraction); the batch shape,
    null-payload handling and error channel are production-real.
    """

    def run(iterator):
        for pdf in iterator:
            feats, errs = [], []
            for payload in pdf["payload"]:
                if payload is None or len(payload) == 0:
                    feats.append(None)
                    errs.append("empty payload")
                    continue
                try:
                    vec = _decode_image_stub(bytes(payload))[:feature_dim]
                    feats.append(vec.tolist())
                    errs.append(None)
                except NotImplementedError as e:  # real decoders may raise
                    feats.append(None)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def feature_digest(feature_col) -> "F.Column":
    """md5 over the raw float32 bytes of a feature vector — a hashable,
    bit-exact scalar stand-in for ``array<float>`` columns (driver-side
    canonicalization cannot sort/hash list cells)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _digest(vecs: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            return hashlib.md5(np.asarray(v, dtype=np.float32).tobytes()).hexdigest()

        return vecs.map(one)

    return _digest(feature_col)


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation stays pure Catalyst."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )

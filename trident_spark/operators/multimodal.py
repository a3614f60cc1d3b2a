"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode is REAL for the uncompressed formats this container can handle with
numpy + stdlib alone: PPM (P6) images and PCM WAV audio (stdlib ``wave``).
Compressed codecs (JPEG/OGG/MP4) need external libraries that are absent
here, so video decode flows through the production error channel
(``decode_error`` set, feature NULL) — the honest behavior for a missing
codec, and exactly what a real pipeline does with corrupt/unsupported
payloads.  Swap in PIL/torchaudio decoders on a real cluster; schemas,
batching, and the error channel don't change.

Scale design: decode + feature extraction is one Arrow hop per batch
(mapInPandas); features are fixed-width float32 so downstream similarity
ops (`operators/similarity.py`) consume them directly; metadata stats stay
pure Catalyst.
"""

from __future__ import annotations

import hashlib
import io
import re
import wave

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


# ---------------------------------------------------------------------------
# Codecs: PPM (P6) and PCM WAV — real encode/decode, no external libs
# ---------------------------------------------------------------------------

_PPM_HEADER = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8.  Raises ValueError on anything
    that is not a P6 with maxval 255 (truncated payloads included)."""
    m = _PPM_HEADER.match(payload)
    if not m:
        raise ValueError("not a P6 PPM")
    w, h, maxval = (int(m.group(i)) for i in (1, 2, 3))
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    body = payload[m.end():]
    need = w * h * 3
    if len(body) < need:
        raise ValueError("truncated PPM body")
    return np.frombuffer(body[:need], dtype=np.uint8).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """mono int16 samples → PCM WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    buf = io.BytesIO()
    wv = wave.open(buf, "wb")
    wv.setnchannels(1)
    wv.setsampwidth(2)
    wv.setframerate(rate)
    wv.writeframes(samples.tobytes())
    wv.close()
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (mono int16 samples, sample rate).  Raises
    ``wave.Error``/ValueError on non-WAV payloads."""
    wv = wave.open(io.BytesIO(payload), "rb")
    if wv.getsampwidth() != 2 or wv.getnchannels() != 1:
        raise ValueError("only mono 16-bit PCM supported")
    rate = wv.getframerate()
    frames = wv.readframes(wv.getnframes())
    return np.frombuffer(frames, dtype=np.int16), rate


# ---------------------------------------------------------------------------
# Synthetic media: REAL encoded payloads, deterministic per media_id
# ---------------------------------------------------------------------------


def synthetic_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic media table: images are real PPMs, audio real WAVs
    (decodable below), video an opaque blob (no codec here — by design it
    exercises the decode-error channel)."""

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.RandomState((seed << 16) ^ i)
                kind = ("image", "audio", "video")[i % 3]
                if kind == "image":
                    w, h = 8 + i % 8, 6 + i % 6
                    px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                    payload, mime = encode_ppm(px), "image/x-portable-pixmap"
                    width, height, dur = w, h, None
                elif kind == "audio":
                    rate = 8000
                    n_samp = 800 + (i % 5) * 200
                    t = np.arange(n_samp) / rate
                    freq = 200.0 + 50.0 * (i % 10)
                    samp = (np.sin(2 * np.pi * freq * t) * 12000).astype(
                        np.int16)
                    payload, mime = encode_wav(samp, rate), "audio/wav"
                    width = height = None
                    dur = int(n_samp * 1000 / rate)
                else:
                    payload, mime = rng.bytes(256 + (i % 512)), "video/mp4"
                    width, height, dur = 640, 480, 1000 + i
                rows.append({
                    "media_id": i, "kind": kind, "payload": payload,
                    "mime": mime, "width": width, "height": height,
                    "duration_ms": dur,
                })
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Feature extraction: per-kind decode, fixed-width float32 vectors
# ---------------------------------------------------------------------------


def image_features(payload: bytes, dim: int) -> np.ndarray:
    """PPM → [h, w, meanR, meanG, meanB, std, min, max], padded/cut to dim."""
    px = decode_ppm(payload).astype(np.float64)
    feats = np.array([
        px.shape[0], px.shape[1],
        px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean(),
        px.std(), px.min(), px.max(),
    ])
    return _fit(feats, dim)


def audio_features(payload: bytes, dim: int) -> np.ndarray:
    """WAV → [n_samples, rate, rms, zero-crossing rate, 4 FFT band means]."""
    samples, rate = decode_wav(payload)
    x = samples.astype(np.float64) / 32768.0
    zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0)) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    bands = [float(b.mean()) if len(b) else 0.0
             for b in np.array_split(spec, 4)]
    feats = np.array([len(x), rate, float(np.sqrt(np.mean(x * x))), zcr,
                      *bands])
    return _fit(feats, dim)


def _fit(feats: np.ndarray, dim: int) -> np.ndarray:
    out = np.zeros(dim, dtype=np.float64)
    out[: min(dim, len(feats))] = feats[:dim]
    return out.astype(np.float32)


def extract_features(media: DataFrame, feature_dim: int = 32) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, typed features +
    error channel out.  Unsupported/corrupt payloads NEVER kill the job —
    they surface as (feature NULL, decode_error set), the contract the
    100 TB pipeline needs (a single bad blob must not fail a 10k-task
    stage)."""

    def run(iterator):
        for pdf in iterator:
            feats, errs = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    feats.append(None)
                    errs.append("empty payload")
                    continue
                try:
                    if kind == "image":
                        vec = image_features(bytes(payload), feature_dim)
                    elif kind == "audio":
                        vec = audio_features(bytes(payload), feature_dim)
                    else:
                        raise ValueError(f"no {kind} codec available")
                    feats.append(vec.tolist())
                    errs.append(None)
                except (ValueError, wave.Error, EOFError) as e:
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


# ---------------------------------------------------------------------------
# Resize + frame sampling: the remaining multimodal transforms.  Resize is
# REAL for PPM images (nearest-neighbor resample, numpy only).  Video frame
# sampling is real for the uncompressed PPM-sequence container defined here
# (concatenated P6 frames — the deterministic decodable stand-in for this
# codec-free sandbox); compressed video (MP4 etc.) flows through the error
# channel, never killing the stage.
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = MEDIA_SCHEMA + ", resize_error string"
FRAME_SCHEMA = ("media_id long, frame_idx int, n_frames int, "
                "payload binary, frame_error string")


def resize_image_payload(payload: bytes, width: int, height: int) -> bytes:
    """PPM → PPM at (width, height), nearest-neighbor (pure numpy)."""
    px = decode_ppm(payload)
    ys = (np.arange(height) * px.shape[0]) // height
    xs = (np.arange(width) * px.shape[1]) // width
    return encode_ppm(np.ascontiguousarray(px[ys][:, xs]))


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image rows → resized payloads (+updated dims); non-images pass
    through untouched; undecodable images carry ``resize_error``."""

    def run(iterator):
        for pdf in iterator:
            rows = []
            for r in pdf.to_dict("records"):
                err = None
                if r["kind"] == "image":
                    try:
                        r["payload"] = resize_image_payload(
                            bytes(r["payload"]), width, height)
                        r["width"], r["height"] = width, height
                    except Exception as e:  # noqa: BLE001 — error channel
                        err = f"resize error: {e}"
                rows.append({**r, "resize_error": err})
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "mime",
                               "width", "height", "duration_ms",
                               "resize_error"])

    return media.mapInPandas(run, RESIZED_SCHEMA)


def encode_ppm_seq(frames: list[np.ndarray]) -> bytes:
    """Concatenated P6 frames — the uncompressed video container."""
    return b"".join(encode_ppm(f) for f in frames)


def split_ppm_seq(payload: bytes) -> list[bytes]:
    """PPM-sequence payload → per-frame PPM payloads.  Raises ValueError
    on anything that is not a clean concatenation of P6 frames."""
    frames, pos, n = [], 0, len(payload)
    while pos < n:
        m = _PPM_HEADER.match(payload[pos : pos + 64])
        if not m:
            raise ValueError("not a PPM sequence")
        w, h = int(m.group(1)), int(m.group(2))
        end = pos + m.end() + w * h * 3
        if end > n:
            raise ValueError("truncated PPM frame")
        frames.append(payload[pos:end])
        pos = end
    if not frames:
        raise ValueError("empty PPM sequence")
    return frames


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video rows → up to ``n_frames`` uniformly-spaced frames, one output
    row per (media_id, frame_idx); non-video rows are dropped; payloads
    without a decodable container emit ONE row with ``frame_error`` set
    (the error channel keeps the lineage row, never kills the stage)."""

    def run(iterator):
        for pdf in iterator:
            rows = []
            for r in pdf.to_dict("records"):
                if r["kind"] != "video":
                    continue
                try:
                    frames = split_ppm_seq(bytes(r["payload"]))
                except ValueError as e:
                    rows.append({"media_id": r["media_id"], "frame_idx": None,
                                 "n_frames": None, "payload": None,
                                 "frame_error": str(e)})
                    continue
                total = len(frames)
                k = min(n_frames, total)
                idxs = sorted({(i * total) // k for i in range(k)})
                for idx in idxs:
                    rows.append({"media_id": r["media_id"], "frame_idx": idx,
                                 "n_frames": total, "payload": frames[idx],
                                 "frame_error": None})
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "n_frames",
                               "payload", "frame_error"])

    return media.mapInPandas(run, FRAME_SCHEMA)


def synthetic_video_df(spark, n: int = 20, n_frames: int = 12,
                       seed: int = 42) -> DataFrame:
    """Deterministic PPM-sequence videos (decodable by sample_frames)."""

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.RandomState((seed << 16) ^ i)
                w, h = 8 + i % 4, 6 + i % 3
                frames = [rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
                          for _ in range(n_frames)]
                rows.append({
                    "media_id": i, "kind": "video",
                    "payload": encode_ppm_seq(frames),
                    "mime": "video/x-ppm-seq", "width": w, "height": h,
                    "duration_ms": n_frames * 40,
                })
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)

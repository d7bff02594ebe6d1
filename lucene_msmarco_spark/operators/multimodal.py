"""Multimodal (image/audio/video) column plumbing for training-data
pipelines at 100 TB scale.

Media payloads are opaque ``binary`` columns with typed metadata
(SURVEY.md task brief): the Spark-side machinery here — schemas, Arrow
batch shapes, ``mapInPandas`` signatures, partition sizing — is real and
tested. The codec call sites are IMPORT-GUARDED: when the host has the
media libraries (PIL for images, soundfile for audio) the real decode
runs; in this container (no media libs) each falls back to a
deterministic fake derived from the payload bytes, so the pipeline shape
is testable end-to-end and the SAME code lights up on a real deployment.
``strict=True`` raises ``NotImplementedError`` instead of faking when
the real codec is unavailable. Video frame extraction stays a stub
either way (it needs an ffmpeg binary, not just a Python package).

Scale notes:
- media rows are orders of magnitude wider than text rows; the batch
  size knob (``spark.sql.execution.arrow.maxRecordsPerBatch``) and
  ``media_repartition`` below keep one Arrow batch << executor memory.
- decode is a narrow map (no shuffle); feature aggregation afterwards is
  the usual groupBy. Keep the binary column OUT of any shuffle by
  projecting features before wide operations.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, "
    "mean_luma double, phash string"
)

AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, rms double, "
    "fingerprint string"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_idx int, frame_phash string"
)


def synthetic_media(spark, n: int = 64, seed: int = 42,
                    kind: str = "image") -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) with the
    canonical schema — the test/bench stand-in for real ingested media."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"].values:
                rng = np.random.default_rng((seed << 16) ^ int(mid))
                size = int(rng.integers(256, 4096))
                payload = rng.integers(0, 256, size=size,
                                       dtype=np.uint8).tobytes()
                rows.append((
                    int(mid), kind,
                    {"image": "image/jpeg", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
                    payload,
                    int(rng.integers(32, 1024)),
                    int(rng.integers(32, 1024)),
                    16000 if kind == "audio" else 0,
                    int(rng.integers(1, 300)) if kind == "video" else 1,
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "mime", "payload", "width", "height",
                "sample_rate", "n_frames",
            ])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _has_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _has_soundfile() -> bool:
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """STUB for a real JPEG/PNG decode (used when PIL is absent).
    Deterministic 8x8 grayscale derived from payload bytes so downstream
    features are stable and testable."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer((h * 2)[:64], dtype=np.uint8).reshape(8, 8)


def _real_decode_image(payload: bytes) -> np.ndarray:
    """Real decode path (runs when PIL is importable on the executor):
    decode -> grayscale -> 8x8 aHash grid, the standard perceptual-hash
    preprocessing, yielding the same (8, 8) uint8 contract as the
    stub."""
    from io import BytesIO

    from PIL import Image

    img = Image.open(BytesIO(payload)).convert("L").resize((8, 8))
    return np.asarray(img, dtype=np.uint8)


def image_features(
    media: DataFrame, strict: bool = False,
    media_repartition: int | None = None,
) -> DataFrame:
    """Decode + feature-extract images: (media_id, width, height,
    n_bytes, mean_luma, phash). The decode is import-guarded: real PIL
    decode when available on the executors, deterministic stub when not.
    ``strict=True`` raises NotImplementedError instead of falling back
    to the stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = _has_pil()
        for pdf in batches:
            if strict and not real:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv; "
                    "not available in this environment"
                )
            decode = _real_decode_image if real else _fake_decode_image
            rows = []
            for r in pdf.itertuples():
                img = decode(bytes(r.payload))
                med = float(np.median(img))
                bits = (img.flatten() >= med).astype(np.uint8)
                phash = "".join(
                    f"{int(''.join(map(str, bits[i:i + 8])), 2):02x}"
                    for i in range(0, 64, 8)
                )
                rows.append((
                    int(r.media_id), int(r.width), int(r.height),
                    len(bytes(r.payload)), float(img.mean()), phash,
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "n_bytes", "mean_luma",
                "phash",
            ])

    src = media.filter(F.col("kind") == "image").select(
        "media_id", "payload", "width", "height"
    )
    if media_repartition:
        src = src.repartition(media_repartition)
    return src.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def _fake_decode_audio(payload: bytes) -> np.ndarray:
    """STUB sample decode (used when soundfile is absent): bytes ->
    [-1, 1] float samples, deterministically."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    return (raw.astype(np.float64) - 127.5) / 127.5


def _real_decode_audio(payload: bytes) -> np.ndarray:
    """Real decode path (runs when soundfile is importable): WAV/FLAC
    bytes -> mono float64 samples, same contract as the stub."""
    from io import BytesIO

    import soundfile as sf

    samples, _sr = sf.read(BytesIO(payload), dtype="float64")
    if samples.ndim > 1:
        samples = samples.mean(axis=1)
    return samples


def audio_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract audio: rms + a chromaprint-style
    fingerprint. Import-guarded like ``image_features``: real soundfile
    decode when available, deterministic stub when not; ``strict=True``
    raises instead of faking."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = _has_soundfile()
        for pdf in batches:
            if strict and not real:
                raise NotImplementedError(
                    "real audio decode requires soundfile/ffmpeg; "
                    "not available in this environment"
                )
            decode = _real_decode_audio if real else _fake_decode_audio
            rows = []
            for r in pdf.itertuples():
                samples = decode(bytes(r.payload))
                rms = float(np.sqrt(np.mean(samples**2)))
                fp = hashlib.sha256(bytes(r.payload)).hexdigest()[:16]
                rows.append((
                    int(r.media_id), int(r.sample_rate), len(samples),
                    rms, fp,
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "n_samples", "rms",
                "fingerprint",
            ])

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "sample_rate"
    ).mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 30, strict: bool = False
) -> DataFrame:
    """Frame-sample videos (one row per sampled frame). STUB decode:
    frame hash derives from (payload, frame_idx)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real video decode requires ffmpeg; not available"
                )
            out_id, out_fi, out_ph = [], [], []
            for r in pdf.itertuples():
                for fi in range(0, int(r.n_frames), every_n):
                    h = hashlib.sha256(
                        bytes(r.payload) + fi.to_bytes(4, "little")
                    ).hexdigest()[:16]
                    out_id.append(int(r.media_id))
                    out_fi.append(fi)
                    out_ph.append(h)
            yield pd.DataFrame({
                "media_id": out_id, "frame_idx": out_fi,
                "frame_phash": out_ph,
            })

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "n_frames"
    ).mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def phash_near_dup(features: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance.
    Banding on the first 4 hex chars bounds the self-join (same idea as
    the MinHash LSH band join)."""
    banded = features.select(
        "media_id", "phash", F.substring("phash", 1, 4).alias("band")
    )
    pairs = banded.alias("a").join(
        banded.alias("b"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.media_id") < F.col("b.media_id")),
    ).select(
        F.col("a.media_id").alias("id_a"),
        F.col("b.media_id").alias("id_b"),
        F.col("a.phash").alias("ph_a"),
        F.col("b.phash").alias("ph_b"),
    )

    hamming = (
        F.length(F.col("ph_a"))
        - F.length(F.col("ph_b"))  # 0; keeps expression JVM-side & clear
        + F.aggregate(
            F.zip_with(
                F.split(F.col("ph_a"), ""),
                F.split(F.col("ph_b"), ""),
                lambda x, y: F.when(x != y, F.lit(1)).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
    )
    return pairs.withColumn("nibble_dist", hamming).filter(
        F.col("nibble_dist") <= max_hamming
    ).select("id_a", "id_b", "nibble_dist")

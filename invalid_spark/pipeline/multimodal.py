"""Multimodal payload columns: audio / video as opaque binary with
typed metadata, processed through the same Arrow-batch machinery as
images.

The container has no audio/video codecs (no ffmpeg/librosa), so the
DECODE step is stubbed two ways — the Spark-side plumbing (schemas,
column pruning, Arrow batch shape, mapInPandas signatures,
parallelism control) is real and tested either way:

- ``decoder="strict"`` raises :class:`NotImplementedError` at the
  decode call site — the production integration point where
  ffmpeg/libsndfile plugs in;
- ``decoder="fake"`` (default in tests) derives a deterministic
  pseudo-signal from the payload bytes (seeded by content hash), so
  batch shapes, feature schemas, and violation plumbing are
  exercised end-to-end with stable goldens.

Schemas (typed metadata around the opaque payload — the multimodal
analog of the image table's ``(bytes, w, h, fmt)``):

- audio: ``(clip_id string, bytes binary, sample_rate int,
  n_samples long, fmt string)``
- video: ``(video_id string, bytes binary, w int, h int, fps double,
  n_frames long, fmt string)``
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIO_SCHEMA = (
    "clip_id string, bytes binary, sample_rate int, n_samples long, fmt string"
)
VIDEO_SCHEMA = (
    "video_id string, bytes binary, w int, h int, fps double, "
    "n_frames long, fmt string"
)

AUDIO_FEATURE_SCHEMA = (
    "clip_id string, n_samples long, rms double, peak double, "
    "zero_crossings long, duration_sec double"
)
FRAME_SAMPLE_SCHEMA = (
    "video_id string, frame_idx long, frame_phash long"
)


def _fake_signal(raw: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in decode: a pseudo-waveform seeded by the
    content hash. Replaced by a real codec in production."""
    seed = int.from_bytes(hashlib.md5(raw).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def audio_features(
    df: DataFrame,
    decoder: str = "fake",
    clip_col: str = "clip_id",
    bytes_col: str = "bytes",
    parallelism: int | None = None,
) -> DataFrame:
    """Per-clip audio features over Arrow batches (RMS, peak,
    zero-crossing count, duration) — the feature-extraction stage of
    an audio curation pipeline. Scan prunes to (id, bytes, metadata);
    batches stay small because payloads are binary."""
    pruned = df.select(clip_col, bytes_col, "sample_rate", "n_samples")
    if parallelism:
        pruned = pruned.repartition(parallelism)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for cid, raw, sr, n in zip(
                pdf[clip_col], pdf[bytes_col], pdf["sample_rate"], pdf["n_samples"]
            ):
                if decoder == "strict":
                    raise NotImplementedError(
                        "audio decode requires libsndfile/ffmpeg; "
                        "plug the real codec in here"
                    )
                sig = _fake_signal(bytes(raw), int(n))
                zc = int(np.sum(np.abs(np.diff(np.signbit(sig)))))
                out.append(
                    (
                        str(cid),
                        int(n),
                        float(np.sqrt(np.mean(sig**2))),
                        float(np.max(np.abs(sig))) if len(sig) else 0.0,
                        zc,
                        float(n) / float(sr) if sr else 0.0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "clip_id", "n_samples", "rms", "peak",
                    "zero_crossings", "duration_sec",
                ],
            )

    return pruned.mapInPandas(extract, schema=AUDIO_FEATURE_SCHEMA)


def video_frame_sample(
    df: DataFrame,
    every_nth: int = 10,
    decoder: str = "fake",
    video_col: str = "video_id",
    bytes_col: str = "bytes",
    parallelism: int | None = None,
) -> DataFrame:
    """Sample every ``every_nth`` frame and emit a per-frame phash —
    the frame-dedup primitive for video corpora. One input row fans
    out to ceil(n_frames / every_nth) output rows inside the same
    Arrow batch (no shuffle)."""
    pruned = df.select(video_col, bytes_col, "n_frames")
    if parallelism:
        pruned = pruned.repartition(parallelism)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for vid, raw, n_frames in zip(
                pdf[video_col], pdf[bytes_col], pdf["n_frames"]
            ):
                if decoder == "strict":
                    raise NotImplementedError(
                        "video decode requires ffmpeg; "
                        "plug the real codec in here"
                    )
                base = int.from_bytes(hashlib.md5(bytes(raw)).digest()[:8], "big")
                for idx in range(0, int(n_frames), every_nth):
                    ph = (base ^ (idx * 0x9E3779B97F4A7C15)) & ((1 << 63) - 1)
                    out.append((str(vid), idx, ph))
            yield pd.DataFrame(
                out, columns=["video_id", "frame_idx", "frame_phash"]
            )

    return pruned.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


def synth_audio(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic audio table (fake payloads + metadata)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 1_000_003 + i)
                n_samples = int(rng.integers(8000, 16001))
                payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
                rows.append(
                    (f"clip-{i:08d}", payload, 16000, n_samples, "wav")
                )
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "bytes", "sample_rate", "n_samples", "fmt"],
            )

    return spark.range(n).mapInPandas(gen, schema=AUDIO_SCHEMA)


def synth_video(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic video table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 2_000_003 + i)
                n_frames = int(rng.integers(30, 121))
                payload = rng.integers(0, 256, size=128, dtype=np.uint8).tobytes()
                rows.append(
                    (f"vid-{i:08d}", payload, 640, 360, 30.0, n_frames, "mp4")
                )
            yield pd.DataFrame(
                rows,
                columns=["video_id", "bytes", "w", "h", "fps", "n_frames", "fmt"],
            )

    return spark.range(n).mapInPandas(gen, schema=VIDEO_SCHEMA)

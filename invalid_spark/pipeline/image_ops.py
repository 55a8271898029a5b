"""Image transform / feature-extraction operators (decode → resize /
features → re-encode) over Arrow batches.

Unlike :mod:`invalid_spark.pipeline.multimodal` (audio/video, where
the codec is stubbed), these are REAL end-to-end: the repo ships a
genuine PNG codec and a deterministic lossy stand-in
(:mod:`invalid_spark.codecs`), and resize is an exact area resample
(integral image) — the same pooling the perceptual hash uses.

Operators:

- :func:`image_features` — per-image stats a curation pipeline
  filters on: decoded dims, channel means/stds, brightness,
  near-constant detection, phash.
- :func:`resize_images` — decode → area-resample to (side, side) →
  re-encode; emits the resized payload (the thumbnailing /
  normalization step before embedding models).

Both prune the scan to (key, bytes[, fmt]) and run in ``mapInPandas``
with the session's capped Arrow batch size; ``parallelism`` controls
task granularity exactly like the pixel checks.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invalid_spark import codecs

FEATURE_SCHEMA = (
    "image_id string, w int, h int, mean_r double, mean_g double, "
    "mean_b double, std_gray double, brightness double, "
    "near_constant boolean, phash long, decode_ok boolean"
)

RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def _resize_rgb(px: np.ndarray, side: int) -> np.ndarray:
    """Exact area resample of (h, w, 3) uint8 to (side, side, 3)."""
    out = np.stack(
        [codecs._pool_to(px[:, :, c].astype(np.float64), side) for c in range(3)],
        axis=2,
    )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def image_features(
    df: DataFrame,
    key_col: str = "image_id",
    bytes_col: str = "bytes",
    parallelism: int | None = None,
) -> DataFrame:
    """Per-image curation features; undecodable rows emit
    ``decode_ok=false`` with null features (they flow to the same
    violations the pixel check raises — this operator is for the
    keep/drop side of the pipeline)."""
    pruned = df.select(key_col, bytes_col)
    if parallelism:
        pruned = pruned.repartition(parallelism)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for k, raw in zip(pdf[key_col], pdf[bytes_col]):
                k = str(k)
                try:
                    px = codecs.decode_image(bytes(raw))
                except codecs.DecodeError:
                    out.append((k, None, None, None, None, None, None,
                                None, None, None, False))
                    continue
                h, w = px.shape[:2]
                f = px.astype(np.float64)
                gray = f @ np.array([0.299, 0.587, 0.114])
                std = float(gray.std())
                out.append((
                    k, w, h,
                    float(f[:, :, 0].mean()), float(f[:, :, 1].mean()),
                    float(f[:, :, 2].mean()),
                    std, float(gray.mean()) / 255.0,
                    std < 2.0,  # near-constant: blank/failed renders
                    codecs.phash64(px), True,
                ))
            yield pd.DataFrame(out, columns=[
                "image_id", "w", "h", "mean_r", "mean_g", "mean_b",
                "std_gray", "brightness", "near_constant", "phash",
                "decode_ok",
            ])

    return pruned.mapInPandas(extract, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    side: int = 8,
    fmt: str = "png",
    key_col: str = "image_id",
    bytes_col: str = "bytes",
    parallelism: int | None = None,
) -> DataFrame:
    """Decode → area-resample to side×side → re-encode. Undecodable
    rows are dropped (they belong in the violations sink, not the
    output corpus)."""
    pruned = df.select(key_col, bytes_col)
    if parallelism:
        pruned = pruned.repartition(parallelism)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for k, raw in zip(pdf[key_col], pdf[bytes_col]):
                try:
                    px = codecs.decode_image(bytes(raw))
                except codecs.DecodeError:
                    continue
                small = _resize_rgb(px, side)
                out.append((str(k), codecs.encode_image(small, fmt),
                            side, side, fmt))
            yield pd.DataFrame(
                out, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return pruned.mapInPandas(work, schema=RESIZE_SCHEMA)

"""Vectorized image-invariant checks (north-rule ``input_hint``).

The only Python-in-the-loop stage, and it is Arrow-batched
``mapInPandas`` — never per-row Python UDFs. The scan for this stage
prunes to exactly (row key, bytes, fmt, w, h, phash); Arrow batch
size is capped (session.py) because ``bytes`` rows are large.

Checks per row, each a violation row on failure:

- decode: corrupt/truncated bytes → ``decodeError``;
- dimensions: decoded (h, w) vs the stored w/h columns → ``typeMismatch``
  (metadata wrong for payload);
- pixel invariant: re-encode + decode, compare vs first decode —
  byte-exact (allclose) for lossless fmts, PSNR ≥ ``psnr_min`` (default
  40 dB) for lossy — ``pixelMismatch``;
- phash recompute: 64-bit perceptual hash of decoded pixels vs the
  stored ``phash`` column → ``pixelMismatch``.

Caption byte-equality vs a reference table is pure DataFrame algebra
(join + binary compare) — no UDF — in :func:`caption_violations`.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invalid_spark import codecs
from invalid_spark.model import ErrorType

_OUT_SCHEMA = (
    "row_key string, column string, rule_id string, error_type string, "
    "message string, observed string, partition_id int, run_id string"
)


def pixel_violations(
    df: DataFrame,
    row_key: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    w_col: str = "w",
    h_col: str = "h",
    phash_col: str | None = "phash",
    psnr_min: float = 40.0,
    run_id: str = "",
) -> DataFrame:
    """Decode/PSNR/dims/phash checks over Arrow batches."""
    cols = [row_key, bytes_col, fmt_col, w_col, h_col]
    if phash_col:
        cols.append(phash_col)
    pruned = df.select(*cols, F.spark_partition_id().alias("pid"))

    def check_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for t in pdf.itertuples(index=False):
                rk = str(getattr(t, row_key))
                pid = int(getattr(t, "pid"))
                raw = getattr(t, bytes_col)
                fmt = getattr(t, fmt_col)

                def emit(etype: str, msg: str, obs: str | None, col: str) -> None:
                    out.append(
                        {
                            "row_key": rk,
                            "column": col,
                            "rule_id": col,
                            "error_type": etype,
                            "message": msg,
                            "observed": obs,
                            "partition_id": pid,
                            "run_id": run_id,
                        }
                    )

                try:
                    px = codecs.decode_image(bytes(raw))
                except codecs.DecodeError as e:
                    emit(
                        ErrorType.DECODE_ERROR,
                        f"bytes of [{rk}] failed to decode: {e}",
                        None,
                        bytes_col,
                    )
                    continue

                dh, dw = px.shape[:2]
                sw, sh = getattr(t, w_col), getattr(t, h_col)
                if sw is not None and int(sw) != dw or sh is not None and int(sh) != dh:
                    emit(
                        ErrorType.TYPE_MISMATCH,
                        f"stored dims [{sw}x{sh}] != decoded [{dw}x{dh}]",
                        f"{sw}x{sh}",
                        w_col,
                    )

                # pixel invariant: re-encode + decode
                try:
                    re_dec = codecs.decode_image(codecs.encode_image(px, fmt))
                except (codecs.DecodeError, ValueError) as e:
                    emit(
                        ErrorType.PIXEL_MISMATCH,
                        f"re-encode failed: {e}",
                        None,
                        bytes_col,
                    )
                    continue
                if codecs.is_lossless(fmt):
                    if not np.array_equal(px, re_dec):
                        emit(
                            ErrorType.PIXEL_MISMATCH,
                            "lossless round-trip not byte-exact",
                            None,
                            bytes_col,
                        )
                else:
                    p = codecs.psnr(px, re_dec)
                    if p < psnr_min:
                        emit(
                            ErrorType.PIXEL_MISMATCH,
                            f"PSNR {p:.2f} dB below {psnr_min} dB",
                            f"{p:.2f}",
                            bytes_col,
                        )

                if phash_col:
                    stored = getattr(t, phash_col)
                    if stored is not None:
                        ph = codecs.phash64(px)
                        if int(stored) != ph:
                            emit(
                                ErrorType.PIXEL_MISMATCH,
                                f"stored phash != recomputed ({ph})",
                                str(stored),
                                phash_col,
                            )
            yield pd.DataFrame(
                out,
                columns=[
                    "row_key", "column", "rule_id", "error_type",
                    "message", "observed", "partition_id", "run_id",
                ],
            )

    return pruned.mapInPandas(check_batches, schema=_OUT_SCHEMA)


def caption_violations(
    df: DataFrame,
    ref: DataFrame,
    key: str = "image_id",
    col: str = "caption",
    run_id: str = "",
) -> DataFrame:
    """Byte equality of ``col`` vs the reference table's value —
    compares UTF-8 binaries, so Unicode-normalization variants differ
    (FIXTURES.md caption_mismatch case). Join + compare, JVM-side."""
    r = ref.select(F.col(key).alias("__k"), F.col(col).alias("__ref"))
    j = df.select(
        F.col(key).cast("string").alias("row_key"),
        F.col(key).alias("__k"),
        F.col(col).alias("__cur"),
        F.spark_partition_id().alias("partition_id"),
    ).join(r, "__k", "inner")
    bad = j.filter(
        ~(
            F.col("__cur").cast("binary").eqNullSafe(F.col("__ref").cast("binary"))
        )
    )
    return bad.select(
        "row_key",
        F.lit(col).alias("column"),
        F.lit(col).alias("rule_id"),
        F.lit(ErrorType.CAPTION_MISMATCH).alias("error_type"),
        F.lit(f"value of [{col}] must byte-equal the reference").alias("message"),
        F.col("__cur").alias("observed"),
        "partition_id",
        F.lit(run_id).alias("run_id"),
    )

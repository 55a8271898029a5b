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
    parallelism: int | None = None,
    impl: str = "pandas",
) -> DataFrame:
    """Decode/PSNR/dims/phash checks over Arrow batches.

    ``parallelism``: repartition the pruned input to this many tasks
    before the Python stage. The decode work is ~ms/row CPU while a
    scan partition is sized for JVM throughput (128 MB ≈ thousands of
    rows), so without an explicit repartition a binary-heavy table
    bin-packs into a handful of tasks and the UDF stage serializes.
    Granularity is worth the shuffle: set to ~2-4x total cores.

    ``impl``: ``"pandas"`` (mapInPandas, default) or ``"arrow"``
    (mapInArrow) — identical checks and output (equivalence is
    tested). The arrow path skips the Arrow↔pandas conversion on
    both sides of the batch; measured even with this row shape
    (per-row decode dominates, conversion is `.tolist()` either
    way), it matters when the payload column is large relative to
    the Python work."""
    cols = [row_key, bytes_col, fmt_col, w_col, h_col]
    if phash_col:
        cols.append(phash_col)
    pruned = df.select(*cols, F.spark_partition_id().alias("pid"))
    if parallelism:
        pruned = pruned.repartition(parallelism)

    out_cols = [
        "row_key", "column", "rule_id", "error_type",
        "message", "observed", "partition_id", "run_id",
    ]

    def check_rows(rks, raws, fmts, sws, shs, pids, phs) -> list[tuple]:
        # hot loop shared by both impls: zipped column lists, tuple
        # appends — no per-row namedtuple/getattr machinery
        decode, encode = codecs.decode_image, codecs.encode_image
        lossless, psnr_fn, phash_fn = codecs.is_lossless, codecs.psnr, codecs.phash64
        out: list[tuple] = []
        emit = out.append
        for rk, raw, fmt, sw, sh, pid, stored in zip(
            rks, raws, fmts, sws, shs, pids, phs
        ):
            rk = str(rk)
            try:
                px = decode(bytes(raw))
            except codecs.DecodeError as e:
                emit((rk, bytes_col, bytes_col, ErrorType.DECODE_ERROR,
                      f"bytes of [{rk}] failed to decode: {e}", None,
                      pid, run_id))
                continue

            dh, dw = px.shape[:2]
            if sw is not None and int(sw) != dw or sh is not None and int(sh) != dh:
                emit((rk, w_col, w_col, ErrorType.TYPE_MISMATCH,
                      f"stored dims [{sw}x{sh}] != decoded [{dw}x{dh}]",
                      f"{sw}x{sh}", pid, run_id))

            # pixel invariant: re-encode + decode
            try:
                re_dec = decode(encode(px, fmt))
            except (codecs.DecodeError, ValueError) as e:
                emit((rk, bytes_col, bytes_col, ErrorType.PIXEL_MISMATCH,
                      f"re-encode failed: {e}", None, pid, run_id))
                continue
            if lossless(fmt):
                if not np.array_equal(px, re_dec):
                    emit((rk, bytes_col, bytes_col, ErrorType.PIXEL_MISMATCH,
                          "lossless round-trip not byte-exact", None,
                          pid, run_id))
            else:
                p = psnr_fn(px, re_dec)
                if p < psnr_min:
                    emit((rk, bytes_col, bytes_col, ErrorType.PIXEL_MISMATCH,
                          f"PSNR {p:.2f} dB below {psnr_min} dB",
                          f"{p:.2f}", pid, run_id))

            if stored is not None:
                ph = phash_fn(px)
                if int(stored) != ph:
                    emit((rk, phash_col, phash_col, ErrorType.PIXEL_MISMATCH,
                          f"stored phash != recomputed ({ph})",
                          str(stored), pid, run_id))
        return out

    if impl == "arrow":
        import pyarrow as pa

        def check_arrow(batches):
            for b in batches:
                n = b.num_rows
                rows = check_rows(
                    b.column(row_key).to_pylist(),
                    b.column(bytes_col).to_pylist(),
                    b.column(fmt_col).to_pylist(),
                    b.column(w_col).to_pylist(),
                    b.column(h_col).to_pylist(),
                    b.column("pid").to_pylist(),
                    b.column(phash_col).to_pylist() if phash_col else [None] * n,
                )
                cols_t = list(zip(*rows)) if rows else [[] for _ in out_cols]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(cols_t[0], pa.string()),
                        pa.array(cols_t[1], pa.string()),
                        pa.array(cols_t[2], pa.string()),
                        pa.array(cols_t[3], pa.string()),
                        pa.array(cols_t[4], pa.string()),
                        pa.array(cols_t[5], pa.string()),
                        pa.array(cols_t[6], pa.int32()),
                        pa.array(cols_t[7], pa.string()),
                    ],
                    names=out_cols,
                )

        return pruned.mapInArrow(check_arrow, schema=_OUT_SCHEMA)

    def check_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = check_rows(
                pdf[row_key].tolist(),
                pdf[bytes_col].tolist(),
                pdf[fmt_col].tolist(),
                pdf[w_col].tolist(),
                pdf[h_col].tolist(),
                pdf["pid"].tolist(),
                pdf[phash_col].tolist() if phash_col else [None] * len(pdf),
            )
            yield pd.DataFrame(rows, columns=out_cols)

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

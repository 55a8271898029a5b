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


# ---------------------------------------------------------------------------
# container magic + header dimensions (pure Catalyst — no decode)

# Magic prefixes, over F.hex(bytes) (uppercase hex, 1-indexed substr).
# "flsy" is the repo's deterministic lossy stand-in container
# (codecs.FAKE_LOSSY_MAGIC + a real PNG inside); real-world magics
# are recognized alongside so the check ports to genuine jpeg/webp
# payloads unchanged.
_PNG_SIG_HEX = "89504E470D0A1A0A"
_FLSY_HEX = "464C5359"  # b"FLSY"

# declared fmt -> containers that legitimately carry it
ACCEPTED_CONTAINERS: dict[str, tuple[str, ...]] = {
    "png": ("png",),
    "jpeg": ("jpeg", "flsy"),
    "jpg": ("jpeg", "flsy"),
    "webp": ("webp", "flsy"),
    "gif": ("gif",),
    "bmp": ("bmp",),
}


def detected_container(bytes_col) -> "F.Column":
    """Container format sniffed from magic bytes — a single CASE chain
    over ``hex(bytes)`` that rides whole-stage codegen. NULL = unknown
    container (corrupt prefix or unsupported format)."""
    hx = F.hex(F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col)
    return (
        F.when(hx.startswith(_PNG_SIG_HEX), F.lit("png"))
        .when(hx.startswith(_FLSY_HEX), F.lit("flsy"))
        .when(hx.startswith("FFD8FF"), F.lit("jpeg"))
        .when(hx.startswith("47494638"), F.lit("gif"))
        .when(
            hx.startswith("52494646")
            & (F.substring(hx, 17, 8) == "57454250"),
            F.lit("webp"),
        )
        .when(hx.startswith("424D"), F.lit("bmp"))
        .otherwise(F.lit(None).cast("string"))
    )


def header_dims(bytes_col) -> tuple["F.Column", "F.Column"]:
    """(width, height) parsed from the container header — PNG IHDR
    big-endian u32 pairs (and the same inside the FLSY stand-in,
    shifted by its 4-byte magic). NULL when the container carries no
    cheaply-parseable dims (real jpeg needs an SOF scan — that is the
    decode stage's job, not the header check's)."""
    hx = F.hex(F.col(bytes_col) if isinstance(bytes_col, str) else bytes_col)

    def _u32(pos: int):
        return F.conv(F.substring(hx, pos, 8), 16, 10).cast("long")

    is_png = hx.startswith(_PNG_SIG_HEX) & (F.length(hx) >= 48)
    is_flsy = (
        hx.startswith(_FLSY_HEX + _PNG_SIG_HEX) & (F.length(hx) >= 56)
    )
    w = (
        F.when(is_png, _u32(33))
        .when(is_flsy, _u32(41))
        .otherwise(F.lit(None).cast("long"))
    )
    h = (
        F.when(is_png, _u32(41))
        .when(is_flsy, _u32(49))
        .otherwise(F.lit(None).cast("long"))
    )
    return w, h


def magic_ok(bytes_col, fmt_col) -> "F.Column":
    """TRUE when the sniffed container is an accepted carrier for the
    declared format. Unknown declared formats and unknown containers
    are both violations (FALSE)."""
    det = detected_container(bytes_col)
    fmt = F.col(fmt_col) if isinstance(fmt_col, str) else fmt_col
    return _accepts(det, fmt)


def header_violations(
    df: DataFrame,
    row_key: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    w_col: str | None = "w",
    h_col: str | None = "h",
    run_id: str = "",
) -> DataFrame:
    """Standalone container-magic + header-dims validation — the
    zero-decode structural screen that runs BEFORE the (1000× more
    expensive) Arrow decode stage at 100 TB: a wrong container or
    lying metadata row never reaches Python. Pure Catalyst: one
    projection, prunes to (key, bytes, fmt, w, h), whole-stage
    codegen. The same expressions ride the row-check projection via
    the ``$magic`` rule directive."""
    det = detected_container(bytes_col)
    hw, hh = header_dims(bytes_col)
    sel = df.select(
        F.col(row_key).cast("string").alias("row_key"),
        F.col(fmt_col).alias("__fmt"),
        det.alias("__det"),
        hw.alias("__hw"),
        hh.alias("__hh"),
        *([F.col(w_col).cast("long").alias("__w")] if w_col else []),
        *([F.col(h_col).cast("long").alias("__h")] if h_col else []),
        F.spark_partition_id().alias("partition_id"),
    )
    magic_bad = sel.filter(
        ~_accepts(F.col("__det"), F.col("__fmt"))
    ).select(
        "row_key",
        F.lit(bytes_col).alias("column"),
        F.lit(f"{bytes_col}~{fmt_col}").alias("rule_id"),
        F.lit(ErrorType.MAGIC_MISMATCH).alias("error_type"),
        F.lit(
            f"container magic of [{bytes_col}] must match declared "
            f"[{fmt_col}]"
        ).alias("message"),
        F.concat_ws(
            " vs ", F.coalesce(F.col("__det"), F.lit("unknown")), F.col("__fmt")
        ).alias("observed"),
        "partition_id",
        F.lit(run_id).alias("run_id"),
    )
    if w_col and h_col:
        dims_bad = sel.filter(
            F.col("__hw").isNotNull()
            & (
                (F.col("__hw") != F.col("__w"))
                | (F.col("__hh") != F.col("__h"))
            )
        ).select(
            "row_key",
            F.lit(bytes_col).alias("column"),
            F.lit(f"{bytes_col}~dims").alias("rule_id"),
            F.lit(ErrorType.HEADER_MISMATCH).alias("error_type"),
            F.lit(
                f"header dimensions of [{bytes_col}] must match "
                f"declared [{w_col}]x[{h_col}]"
            ).alias("message"),
            F.concat_ws(
                " vs ",
                F.concat_ws("x", "__hw", "__hh"),
                F.concat_ws("x", "__w", "__h"),
            ).alias("observed"),
            "partition_id",
            F.lit(run_id).alias("run_id"),
        )
        return magic_bad.unionByName(dims_bad)
    return magic_bad


def _accepts(det, fmt_col) -> "F.Column":
    """magic_ok over an already-computed detected-container column."""
    fmt = F.lower(fmt_col)
    chain = None
    for declared, containers in sorted(ACCEPTED_CONTAINERS.items()):
        val = det.isin(list(containers))
        chain = (
            F.when(fmt == declared, val)
            if chain is None
            else chain.when(fmt == declared, val)
        )
    return F.coalesce(chain, F.lit(False))

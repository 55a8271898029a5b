"""Sequence packing: greedy token bin-packing of documents into
fixed-budget training sequences.

The step every LLM training pipeline runs between curation and
tokenized-shard writing: concatenate documents (in a deterministic
order) into sequences of at most ``max_tokens`` tokens, starting a
new sequence whenever the next document would overflow the budget.
The packing itself is inherently sequential — each boundary depends
on the previous one — so it CANNOT be a window function; production
pipelines therefore pack per shard, never globally. This module
makes that shape explicit:

1. Documents are assigned to ``n_buckets`` deterministic md5 buckets
   (the "shards"). Packing is independent per bucket, so buckets are
   the unit of parallelism AND of reproducibility: the assignment of
   any document depends only on its bucket's membership, never on
   Spark partitioning.
2. Only the ``(key, bucket, n_tokens)`` projection is shuffled —
   ~24 bytes per document, regardless of document size. The text
   never moves.
3. Within a bucket, documents are ordered by key and packed greedily
   (first-fit-in-order) inside one ``applyInPandas`` group. The
   Python loop is O(n_sequences · log n) via ``numpy.searchsorted``
   over the token cumsum — not O(n_docs) Python iterations — so a
   10M-document bucket packs in milliseconds.

A document longer than ``max_tokens`` occupies a sequence alone
(real pipelines then split it downstream); empty documents cost 0
tokens and ride along. The greedy rule, restated exactly (both the
numpy path and the DuckDB oracle's recursive CTE implement it):
``fill = 0; for each doc in key order: if fill > 0 and
fill + t > max_tokens: seq += 1, fill = 0; assign(seq, offset=fill);
fill += t``.

At 100 TB: one shuffle of the metadata projection keyed by bucket;
``n_buckets`` is chosen so a bucket's metadata (~24 B/doc) fits an
executor — 256 buckets handle 10¹⁰ documents at ~1 GB per group.
Token counts ride the scan projection (whitespace tokens, or the
BPE-regex estimator from ``text.token_count_bpe``); both are pure
Catalyst and SQL-replayable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invalid_spark.pipeline import text as _text

PACK_SALT = "pack-v1"


def greedy_pack(t: "np.ndarray", cap: int) -> tuple["np.ndarray", "np.ndarray"]:
    """The greedy rule over one ordered token-count vector: returns
    (seq_id, seq_offset) arrays. O(n_sequences · log n) — each
    boundary is one searchsorted over the cumsum, not a Python
    iteration per document. Property-tested against the naive
    per-document loop."""
    t = np.asarray(t, dtype="int64")
    n = len(t)
    c = np.cumsum(t)
    seq = np.zeros(n, dtype="int64")
    off = np.zeros(n, dtype="int64")
    start, base, s = 0, 0, 0
    while start < n:
        # first index whose inclusive cumsum overflows the budget
        j = int(np.searchsorted(c, base + cap, side="right"))
        if j <= start:
            # oversize head document: the window's fill is 0, so by
            # the rule (new seq only when fill > 0) it joins — alone
            j = start + 1
        elif j < n and int(c[j - 1]) == base:
            # every doc in [start, j) has 0 tokens, so the window's
            # fill is STILL 0 when the oversize doc at j arrives: it
            # joins this sequence too (hypothesis-found edge: [0, 2]
            # at cap 1 packs into ONE sequence, not two)
            j += 1
        seq[start:j] = s
        off[start:j] = c[start:j] - t[start:j] - base
        base = int(c[j - 1])
        s += 1
        start = j
    return seq, off


def _token_counter(
    text_col: str, bpe: bool, n_tokens_col: str | None
) -> "F.Column":
    """The per-document token-count expression: the caller's exact
    tokenizer counts when ``n_tokens_col`` names a column (real
    pipelines materialize these upstream — an estimator would make
    the packing budget systematically off vs the true sequence
    length), else the whitespace / BPE-regex estimator."""
    if n_tokens_col is not None:
        return F.col(n_tokens_col)
    return (
        _text.token_count_bpe(F.col(text_col))
        if bpe
        else _text.token_count(F.col(text_col))
    )


def _bucket_expr(key_col: str, n_buckets: int, salt: str) -> "F.Column":
    key_s = F.col(key_col).cast("string")
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "-"), key_s)), 1, 8),
            16,
            10,
        ).cast("bigint"),
        F.lit(n_buckets),
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 64,
    salt: str = PACK_SALT,
    bpe: bool = False,
    order_col: str | None = None,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign every document to a (bucket, seq_id, seq_offset).

    Returns one row per document: ``(key_col, bucket, n_tokens,
    seq_id, seq_offset)``. ``seq_id`` numbers sequences within a
    bucket from 0; ``seq_offset`` is the token offset of the
    document inside its sequence. Deterministic for a given corpus
    regardless of partitioning.

    ``order_col`` packs documents in (order_col, key) order within
    each bucket instead of plain key order — curriculum packing: a
    difficulty / quality score column groups similar documents into
    the same sequences while the key tie-break keeps the assignment
    fully deterministic.

    ``n_tokens_col`` names a precomputed EXACT token-count column
    (the real tokenizer's counts, materialized upstream); without it
    the whitespace (or ``bpe=True`` BPE-regex) estimator rides the
    scan projection. Null counts in either path pack as 0 tokens.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    counter = _token_counter(text_col, bpe, n_tokens_col)
    extra = [F.col(order_col)] if order_col else []
    meta = df.select(
        F.col(key_col),
        _bucket_expr(key_col, n_buckets, salt).alias("bucket"),
        F.coalesce(counter.cast("long"), F.lit(0)).alias("n_tokens"),
        *extra,
    )
    ktype = df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {ktype}, bucket bigint, n_tokens bigint, "
        "seq_id bigint, seq_offset bigint"
    )
    cap = int(max_tokens)
    sort_cols = [order_col, key_col] if order_col else [key_col]

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(
            drop=True
        )
        seq, off = greedy_pack(pdf["n_tokens"].to_numpy(dtype="int64"), cap)
        pdf["seq_id"] = seq
        pdf["seq_offset"] = off
        return pdf[[key_col, "bucket", "n_tokens", "seq_id", "seq_offset"]]

    return meta.groupBy("bucket").applyInPandas(_pack, out_schema)


def pack_summary(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One-row packing efficiency summary from a ``pack_sequences``
    result: sequence count, mean fill ratio, oversize-document count
    and token totals. Two sketch-sized aggregates (per-sequence,
    then global)."""
    per_seq = packed.groupBy("bucket", "seq_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return per_seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_sequences"),
        F.sum("n_docs").cast("long").alias("n_documents"),
        F.sum("fill").cast("long").alias("total_tokens"),
        F.round(
            F.avg(F.least(F.col("fill"), F.lit(max_tokens)) / max_tokens), 6
        ).alias("mean_fill_ratio"),
        F.sum(F.when(F.col("fill") > max_tokens, 1).otherwise(0))
        .cast("long")
        .alias("n_oversize"),
    )


def materialize(
    df: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    key_col: str = "doc_id",
    n_buckets: int = 64,
    salt: str = PACK_SALT,
    bpe: bool = False,
    order_col: str | None = None,
    n_tokens_col: str | None = None,
    include_text: bool = True,
    sep: str = " ",
) -> DataFrame:
    """Emit the training artifact: ONE row per packed sequence —
    ``(bucket, seq_id, n_docs, total_tokens, doc_keys, offsets[,
    text])`` with ``doc_keys``/``offsets`` in pack order and ``text``
    the documents concatenated with ``sep``.

    :func:`pack_sequences` assigns but nothing moves the text; this
    replays the SAME deterministic greedy assignment (same salt, same
    rule — equality is pytest-asserted) inside one ``applyInPandas``
    group per bucket, so the ONLY shuffle is ``(key, text)`` keyed by
    the md5 bucket: no join back to the corpus, the assignment is
    recomputed from sequence-free metadata math inside the group.

    Scale note: unlike :func:`pack_sequences` (whose groups hold
    ~24 B/doc metadata), a materialize group holds its bucket's TEXT
    — size ``n_buckets`` for ``corpus_bytes / n_buckets`` per
    executor, not for metadata. The default ``sep=" "`` keeps the
    whitespace token count of the concatenation equal to the sum of
    the parts.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    counter = _token_counter(text_col, bpe, n_tokens_col)
    extra = [F.col(order_col)] if order_col else []
    text_sel = (
        [F.coalesce(F.col(text_col), F.lit("")).alias("__text")]
        if include_text
        else []
    )
    meta = df.select(
        F.col(key_col),
        _bucket_expr(key_col, n_buckets, salt).alias("bucket"),
        F.coalesce(counter.cast("long"), F.lit(0)).alias("n_tokens"),
        *extra,
        *text_sel,
    )
    ktype = df.schema[key_col].dataType.simpleString()
    out_cols = [
        "bucket", "seq_id", "n_docs", "total_tokens", "doc_keys", "offsets",
    ] + (["text"] if include_text else [])
    out_schema = (
        f"bucket bigint, seq_id bigint, n_docs bigint, total_tokens bigint, "
        f"doc_keys array<{ktype}>, offsets array<bigint>"
        + (", text string" if include_text else "")
    )
    cap = int(max_tokens)
    sort_cols = [order_col, key_col] if order_col else [key_col]

    def _mat(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(
            drop=True
        )
        seq, _off = greedy_pack(pdf["n_tokens"].to_numpy(dtype="int64"), cap)
        pdf["seq_id"] = seq
        bucket = int(pdf["bucket"].iloc[0])
        rows = []
        for sid, g in pdf.groupby("seq_id", sort=True):
            t = g["n_tokens"].to_numpy(dtype="int64")
            row = {
                "bucket": bucket,
                "seq_id": int(sid),
                "n_docs": int(len(g)),
                "total_tokens": int(t.sum()),
                "doc_keys": g[key_col].tolist(),
                # offsets restate within the sequence: cumsum shifted
                # right — identical to pack_sequences' seq_offset
                "offsets": (np.cumsum(t) - t).tolist(),
            }
            if include_text:
                row["text"] = sep.join(g["__text"].tolist())
            rows.append(row)
        return pd.DataFrame(rows, columns=out_cols)

    return meta.groupBy("bucket").applyInPandas(_mat, out_schema)

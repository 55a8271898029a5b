"""Text analysis operators: tokenization, quality scoring, language
ID, fingerprinting.

Per-document operators are single-projection (no shuffle),
whole-stage-codegen column expressions — at 100 TB each is one
map-side pass over the scan with column pruning (only ``text`` + the
key column are read). The one exception is
:func:`repetition_features`, which needs per-document frequency
tables and uses explode → partial-combine aggregates (two small
shuffles) instead of O(m²) per-row HOF counting.
Heuristics follow the public Gopher/C4 quality-filtering recipes
(length, stop-word density, symbol ratios) re-expressed as Catalyst
expressions; none require Python UDFs.

Every function is deliberately expressible in ANSI SQL so the DuckDB
oracle can replay it bit-for-bit (`__spark_entry__.oracle_sql`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Language marker words (public stop-word lists, tiny prefixes).
# Scores are whole-word hit counts; the argmax (fixed tie order
# en>de>fr>es, 'zh' by CJK codepoints, 'und' if all zero) is the
# language guess. This is the classic n-gram/stopword heuristic —
# cheap enough to run inline at ingest scale.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|a)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|zu|mit|von)\b",
    "fr": r"\b(le|la|les|et|est|une|des|pour|dans|que)\b",
    "es": r"\b(el|los|las|es|una|para|con|por|del|como)\b",
}
CJK_PATTERN = r"[一-鿿]"

EN_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that "
    "for with as on at by from"
).split()


def tokens(text: Column) -> Column:
    """Whitespace tokens; empty string → empty array (not [''])."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer pattern (public): contraction suffixes,
# letter runs, digit runs, punctuation runs, whitespace runs — counts
# approximate BPE token counts without a merges table (each regex
# token splits into >=1 BPE tokens; for plain English text the ratio
# is ~1.0-1.3). Pure regex → JVM-side, and replayable in any RE2 SQL.
BPE_SPLIT_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_count_bpe(text: Column) -> Column:
    """Approximate BPE token count via the GPT-2 pre-tokenizer regex."""
    return F.regexp_count(text, F.lit(BPE_SPLIT_PATTERN))


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams over a token array via O(1) element lookups (no
    per-index slice copy) — the one gram constructor shared by the
    shingle/dedup pipeline and the repetition features (and mirrored
    by both DuckDB oracles)."""
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
    )


def normalize(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip every
    non-alphanumeric-non-space char, collapse whitespace runs."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized
    text. Stable across engines (the DuckDB oracle reproduces it),
    and the key for exact dedup at scale (hash-groupBy)."""
    return F.md5(normalize(text))


def quality_ok_col(t: Column) -> Column:
    """The composite Gopher/C4-style keep/drop verdict as a single
    Column expression — ONE definition shared by
    :func:`quality_features` and the curation pipeline (a threshold
    tweak here changes both, and the DuckDB oracles mirror these
    exact constants)."""
    toks = tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?()'\x22-]"))
    n_digit = F.regexp_count(t, F.lit(r"[0-9]"))
    n_nonspace = F.regexp_count(t, F.lit(r"\S"))
    mean_tok = F.when(
        n_tokens > 0, n_nonspace.cast("double") / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    digit_ratio = F.when(
        n_chars > 0, n_digit.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    return (
        (n_tokens >= 10)
        & (n_tokens <= 10000)
        & (mean_tok >= 2.0)
        & (mean_tok <= 12.0)
        & (punct_ratio <= 0.2)
        & (digit_ratio <= 0.3)
    )


def lang_guess_col(t: Column) -> Column:
    """Language guess as a single Column expression (deterministic
    tie-breaking: zh by CJK count first, then en>de>fr>es, 'und' when
    no hits) — shared by :func:`lang_id` and the curation pipeline."""
    s = lang_scores(t)
    best = F.greatest(*s.values())
    return (
        F.when(best == 0, F.lit("und"))
        .when(s["zh"] == best, F.lit("zh"))
        .when(s["en"] == best, F.lit("en"))
        .when(s["de"] == best, F.lit("de"))
        .when(s["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def quality_features(df: DataFrame, text_col: str = "text",
                     key_col: str = "doc_id") -> DataFrame:
    """Gopher/C4-style quality metrics, one projection.

    Integer counts + exact-rational ratios only (int/int division),
    so results are bit-identical across engines. ``quality_ok`` is
    the composite keep/drop verdict a filtering pipeline would use
    (:func:`quality_ok_col`).
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?()'\x22-]"))
    n_digit = F.regexp_count(t, F.lit(r"[0-9]"))
    n_nonspace = F.regexp_count(t, F.lit(r"\S"))
    n_stop = F.size(F.filter(toks, lambda w: F.lower(w).isin(EN_STOPWORDS)))
    mean_tok = F.when(
        n_tokens > 0,
        n_nonspace.cast("double") / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))

    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens.cast("double")).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))

    quality_ok = quality_ok_col(t)
    return df.select(
        F.col(key_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        n_digit.alias("n_digit"),
        mean_tok.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        quality_ok.alias("quality_ok"),
    )


def lang_scores(text: Column) -> dict[str, Column]:
    scores = {
        lang: F.regexp_count(F.lower(text), F.lit(pat))
        for lang, pat in LANG_MARKERS.items()
    }
    scores["zh"] = F.regexp_count(text, F.lit(CJK_PATTERN))
    return scores


def lang_id(df: DataFrame, text_col: str = "text",
            key_col: str = "doc_id") -> DataFrame:
    """Stop-word-hit language ID with deterministic tie-breaking
    (zh by CJK count first, then en>de>fr>es, 'und' when no hits —
    :func:`lang_guess_col`)."""
    s = lang_scores(F.col(text_col))
    guess = lang_guess_col(F.col(text_col))
    return df.select(
        F.col(key_col),
        s["en"].alias("score_en"),
        s["de"].alias("score_de"),
        s["fr"].alias("score_fr"),
        s["es"].alias("score_es"),
        s["zh"].alias("score_zh"),
        guess.alias("lang_guess"),
    )


def repetition_features(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition signals per document:
    (id, n_lines, dup_line_frac, n_grams, top_gram_frac).

    - ``dup_line_frac``: fraction of lines that are repeats of an
      earlier line (1 − distinct/total) — boilerplate detector;
    - ``top_gram_frac``: the most frequent word ``n``-gram's share of
      all ``n``-grams — loops/spam detector.

    Scale shape: explode → two hash-aggregates with partial (map-side)
    combine — per-row nested HOF counting would be O(m²) per document
    and fall off codegen; the groupBy form is linear and distributed.
    Ratios are exact int/int divisions (oracle-reproducible)."""
    t = F.col(text_col)
    lines = F.filter(
        F.split(t, r"\n"), lambda x: F.trim(x) != F.lit("")
    )
    ldf = (
        df.select(F.col(key_col).alias("id"), F.explode(lines).alias("ln"))
        .groupBy("id", "ln")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_lines"),
            F.count(F.lit(1)).alias("n_distinct_lines"),
        )
    )
    toks = tokens(normalize(t))
    grams = word_ngrams(F.col("tk"), n)
    gdf = (
        df.select(F.col(key_col).alias("id"), toks.alias("tk"))
        .filter(F.size("tk") >= n)
        .select("id", F.explode(grams).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.sum("c").alias("n_grams"), F.max("c").alias("top_c"))
    )
    base = df.select(F.col(key_col).alias("id"))
    out = base.join(ldf, "id", "left").join(gdf, "id", "left")
    dup_frac = F.when(
        F.coalesce("n_lines", F.lit(0)) > 0,
        (F.col("n_lines") - F.col("n_distinct_lines")).cast("double")
        / F.col("n_lines").cast("double"),
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        F.coalesce("n_grams", F.lit(0)) > 0,
        F.col("top_c").cast("double") / F.col("n_grams").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        "id",
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        dup_frac.alias("dup_line_frac"),
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        top_frac.alias("top_gram_frac"),
    )


def fingerprints(df: DataFrame, text_col: str = "text",
                 key_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(key_col),
        fingerprint(F.col(text_col)).alias("fingerprint"),
        token_count(F.col(text_col)).alias("n_tokens"),
        token_count_bpe(F.col(text_col)).alias("n_tokens_bpe"),
    )


def contamination_flags(
    df: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    key_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_key_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Train/eval contamination by word n-gram overlap — the
    decontamination rule LLM corpora apply before training: a
    training document is ``contaminated`` when it shares at least one
    distinct word ``n``-gram with the eval/benchmark set. Returns one
    row per training document: (id, n_shingles, n_matched,
    contaminated); documents shorter than ``n`` words have zero
    shingles and cannot be contaminated.

    Scale shape: the eval side collapses to its DISTINCT gram set —
    benchmark suites are tiny next to a training corpus — and
    broadcasts (``broadcast_eval=False`` flips to a shuffle hash join
    for unusually large eval sets). The corpus side explodes to
    distinct (doc, gram) rows via the shared
    :func:`~invalid_spark.pipeline.dedup.shingle_terms` (distributed
    dedup, partial combine) and aggregates matches per document: one
    corpus-linear pass + one shuffle keyed by doc id, never an
    all-pairs comparison. Grams use the one shared n-gram
    constructor (:func:`word_ngrams`), so contamination, dedup, and
    repetition features can never disagree on tokenization."""
    from invalid_spark.pipeline import dedup

    ev = dedup.shingle_terms(
        eval_df, n, eval_text_col or text_col, eval_key_col or key_col
    ).select("g").distinct().withColumn("__hit", F.lit(1))
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = dedup.shingle_terms(df, n, text_col, key_col)
    agg = (
        tr.join(ev, "g", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_matched"),
        )
    )
    ids = df.select(F.col(key_col).alias("id"))
    return ids.join(agg, "id", "left").select(
        "id",
        F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
        F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
        (F.coalesce("n_matched", F.lit(0)) > 0).alias("contaminated"),
    )


# PII patterns shared by detection and redaction. Conservative,
# RE2-compatible (no lookaround) so the same pattern runs in Spark
# (Java regex) and any RE2-based SQL engine — counts agree because
# both scan leftmost non-overlapping.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
}


def pii_features(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document PII counts — the scrub gate a training corpus
    runs before release: (id, n_<kind>... , n_pii, has_pii). One
    codegen projection (regexp_extract_all + size per pattern), no
    shuffle, no Python; patterns are RE2-safe so a SQL oracle
    reproduces the counts."""
    pats = patterns or PII_PATTERNS
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = {
        kind: F.size(F.regexp_extract_all(t, F.lit(p), F.lit(0)))
        for kind, p in pats.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(key_col).alias("id"),
        *[c.cast("long").alias(f"n_{k}") for k, c in counts.items()],
        total.cast("long").alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Replace every PII match with a typed placeholder
    (``[EMAIL]``, ``[IPV4]``, ...) — the redaction counterpart of
    :func:`pii_features`, applied in one chained regexp_replace
    projection (global replace, codegen, no shuffle). Pattern
    application order is the dict order of ``PII_PATTERNS`` — fixed,
    so redaction is deterministic and SQL-replayable."""
    pats = patterns or PII_PATTERNS
    t = F.col(text_col)
    for kind, p in pats.items():
        t = F.regexp_replace(t, p, f"[{kind.upper()}]")
    return df.withColumn(text_col, t)


# Default line-drop patterns for boilerplate filtering (C4-style
# heuristics); RE2-safe, case-insensitivity spelled inline so the
# same pattern string runs in Spark and a SQL oracle.
BOILERPLATE_PATTERNS: tuple[str, ...] = (
    r"(?i)enable javascript",
    r"(?i)\bcookies?\b.*\b(policy|consent|accept)",
    r"(?i)all rights reserved",
    r"(?i)^\s*(home|menu|login|sign in|subscribe)\s*$",
)


def line_filter(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_words: int = 3,
    drop_patterns: tuple[str, ...] = BOILERPLATE_PATTERNS,
) -> DataFrame:
    """C4-style line-level boilerplate removal: keep only lines with
    at least ``min_words`` whitespace words that match none of
    ``drop_patterns``; re-join survivors with newlines. Returns
    (id, n_lines, n_kept, text) — the cleaning stage a web-scraped
    corpus runs before quality scoring.

    Entirely row-local (split → higher-order filter → array_join in
    one projection; no shuffle, no Python). The HOF lambda keeps this
    projection off whole-stage codegen, which is fine here — line
    filtering is a transform stage, not the per-row-check hot path
    (see PLANS.md §1 for why the row-check projection must stay
    HOF-free)."""
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")

    def keep(ln: Column) -> Column:
        words = F.filter(F.split(F.trim(ln), r"\s+"), lambda t: t != F.lit(""))
        cond = F.size(words) >= F.lit(min_words)
        for p in drop_patterns:
            cond = cond & ~F.regexp_like(ln, F.lit(p))
        return cond

    kept = F.filter(lines, keep)
    return df.select(
        F.col(key_col).alias("id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, "\n").alias(text_col),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained unigram language-model score per document —
    the cheapest useful stand-in for perplexity-based quality
    filtering (CCNet/Gopher use a KenLM 5-gram; the sandbox has no
    KenLM, and a unigram model IS exactly replayable in SQL): train
    P(w) = count(w) / total over THIS corpus's normalized tokens,
    then score each document by its mean negative log2 probability
    (bits per token). Gibberish / rare-token soup scores high;
    repetitive boilerplate scores low — both tails are filter
    candidates.

    Returns one row per document: (id, n_tokens, bits_per_token);
    ``bits_per_token`` is NULL for empty documents.

    Scale shape: one token explode (linear), one hash-aggregate
    keyed by token for the vocabulary (Zipf skew is absorbed by
    partial combine — hot tokens collapse map-side), a broadcast of
    the single-row corpus total, one shuffle join of occurrences
    against the vocabulary, and a per-doc aggregate. The vocabulary
    is tiny relative to the corpus (sublinear vocabulary growth), so
    at production scale the occurrence-vocab join can also broadcast
    a top-K vocabulary with an OOV floor; the default keeps the
    exact shuffle join so the DuckDB oracle replays bit-identically.
    """
    toks = tokens(normalize(F.col(text_col)))
    occ = df.select(
        F.col(key_col).alias("id"), F.explode(toks).alias("w")
    )
    vocab = occ.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("total"))
    scored = occ.join(vocab, "w").crossJoin(F.broadcast(total))
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.avg(-F.log2(F.col("c") / F.col("total"))).alias("bits"),
    )
    ids = df.select(F.col(key_col).alias("id"))
    return ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.round("bits", 6).alias("bits_per_token"),
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 10,
) -> DataFrame:
    """Corpus vocabulary profile in one row: total token count,
    type (distinct-token) count, type-token ratio, hapax fraction
    (types occurring exactly once — the Zipf tail), and the token
    share of the ``top_k`` most frequent types (the Zipf head). The
    standard corpus-composition summary a training-data pipeline
    tracks across snapshots: a collapsing TTR or an inflating head
    share signals boilerplate/dup contamination before any dedup
    runs.

    Scale shape: one token explode + one vocabulary hash-aggregate
    (shared with :func:`unigram_logprob`), then two aggregates over
    the types-sized frame; the top-k side is orderBy+limit —
    TakeOrdered, never a global sort — with a deterministic
    (count desc, token asc) tie-break so any SQL engine replays the
    same k rows."""
    toks = tokens(normalize(F.col(text_col)))
    occ = df.select(F.explode(toks).alias("w"))
    vocab = occ.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    )
    top = (
        vocab.orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(top_k)
        .agg(F.sum("c").cast("long").alias("top_tokens"))
    )
    return totals.crossJoin(F.broadcast(top)).select(
        "n_tokens",
        "n_types",
        "n_hapax",
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias(
            "type_token_ratio"
        ),
        F.round(F.col("n_hapax") / F.col("n_types"), 6).alias("hapax_frac"),
        F.round(F.col("top_tokens") / F.col("n_tokens"), 6).alias(
            "topk_share"
        ),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    text_col: str = "text",
    key_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Token-window chunking: split each document into chunks of at
    most ``chunk_tokens`` whitespace tokens, consecutive chunks
    overlapping by ``overlap_tokens`` — the step before embedding /
    retrieval indexing, where models have a context budget and
    overlap preserves cross-boundary context. Returns one row per
    chunk: ``(id, chunk_idx, n_tokens, chunk)`` with ``chunk`` the
    space-joined token window (token-level reconstruction: original
    whitespace runs collapse — by design, the chunk is model input,
    not a byte-faithful substring). Documents with no tokens emit no
    chunks.

    Entirely row-local (tokens → ``sequence`` of window starts →
    ``transform`` slices → ``explode``): no shuffle, no UDF, works on
    streaming frames, and the arithmetic replays exactly in SQL.
    Chunk starts are ``0, step, 2·step, …`` with ``step =
    chunk_tokens − overlap_tokens``; the last window may be shorter,
    and a start is emitted only while it indexes a real token, so a
    doc of ``n`` tokens yields ``ceil(max(n − overlap, 1) / step)``
    chunks.

    ``tokens_col`` names a PRE-TOKENIZED array column (the real
    tokenizer's output, materialized upstream — string or int token
    ids both work; ids render via cast in the joined ``chunk``);
    without it the whitespace tokenizer runs over ``text_col``. The
    windowing arithmetic is identical either way.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got "
            f"{overlap_tokens}"
        )
    step = chunk_tokens - overlap_tokens
    toks = (
        F.col(tokens_col) if tokens_col is not None
        else tokens(F.col(text_col))
    )
    d = df.select(F.col(key_col).alias("id"), toks.alias("__t")).filter(
        F.size("__t") > 0
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("__t") - overlap_tokens - 1, F.lit(0)),
        F.lit(step),
    )
    e = d.select("id", "__t", F.explode(starts).alias("start"))
    window = F.slice(F.col("__t"), F.col("start") + 1, chunk_tokens)
    chunk = (
        F.array_join(F.transform(window, lambda x: x.cast("string")), " ")
        if tokens_col is not None
        else F.array_join(window, " ")
    )
    return e.select(
        "id",
        (F.col("start") / step).cast("long").alias("chunk_idx"),
        F.size(window).cast("long").alias("n_tokens"),
        chunk.alias("chunk"),
    )

"""Error taxonomy and violation/verdict/metrics schemas.

Error types and message templates keep exact parity with the
reference (result.go:8-14 enum, result.go:24-47 + rule.go:729-731
constructors), including its quirks where tests depend on them:

- the two string-length messages have swapped comparators
  (result.go:32-38): the *min* violation says ``must < min`` and the
  *max* violation says ``must > max`` — replicated verbatim;
- ``OfContainError`` renders the enum Go-``%v``-style, i.e. a
  space-joined list inside the constructor's own brackets:
  ``value of k must be one of [[a b]]`` (rule.go:729-731).

New engine-only error types extend the enum for the table-scale
checks (SURVEY.md §2.3/§2.4).
"""

from __future__ import annotations

from pyspark.sql import types as T


class ErrorType:
    # reference taxonomy (result.go:8-14)
    KEY_MISSING = "keyMissing"
    TYPE_MISMATCH = "typeMismatch"
    STR_LENGTH_MISMATCH = "strLengthMismatch"
    REGX_MISMATCH = "regxMismatch"
    OF_MISMATCH = "ofMismatch"
    # engine extensions (SURVEY.md §2.4)
    KEY_NAME_MISMATCH = "keyNameMismatch"  # $key-reg, declared-but-unenforced in ref
    RANGE_MISMATCH = "rangeMismatch"
    UNIQUE_MISMATCH = "uniqueMismatch"
    REF_MISMATCH = "refMismatch"
    STAT_DRIFT = "statDrift"
    EXTRA_KEY = "extraKey"  # strict mode only (reference tolerates extras)
    VECTOR_MISMATCH = "vectorMismatch"  # $vector: dim / NaN / zero-vector
    PIXEL_MISMATCH = "pixelMismatch"
    DECODE_ERROR = "decodeError"
    CAPTION_MISMATCH = "captionMismatch"
    PII_FOUND = "piiFound"  # $pii: regex PII gate (observed = match count)
    EXPR_MISMATCH = "exprMismatch"  # $expr: cross-column row predicate
    FD_MISMATCH = "fdMismatch"  # $fd: functional dependency det -> dep
    SEQ_MISMATCH = "seqMismatch"  # $monotonic: per-key sequence order
    RECONCILE_MISMATCH = "reconcileMismatch"  # $reconcile: fact-vs-dim totals
    ALIGNMENT_MISMATCH = "alignmentMismatch"  # $align: paired-embedding cosine
    MAGIC_MISMATCH = "magicMismatch"  # $magic: container magic vs declared fmt
    HEADER_MISMATCH = "headerDimsMismatch"  # $magic: header dims vs w/h cols
    FORMAT_MISMATCH = "formatMismatch"  # $format: named whole-value format
    DUPSPAN_MISMATCH = "dupSpanMismatch"  # $dupspan: cross-doc span coverage


# message constructors — exact reference strings
def key_missing_msg(key: str) -> str:
    """result.go:24-26."""
    return f"key [{key}] is expected here"


def type_mismatch_msg(key: str, ty: str) -> str:
    """result.go:28-30."""
    return f"type for [{key}] must be [{ty}]"


def str_length_min_msg(key: str, n: int) -> str:
    """result.go:32-34 (reference wording quirk: says ``<``)."""
    return f"length of value in [{key}] must < {n}"


def str_length_max_msg(key: str, n: int) -> str:
    """result.go:36-38 (reference wording quirk: says ``>``)."""
    return f"length of value in [{key}] must > {n}"


def regx_msg(key: str, regx: str) -> str:
    """result.go:40-42."""
    return f"value for [{key}] must match regexp : {regx}"


def key_name_msg(key: str, regx: str) -> str:
    """result.go:44-46 (note: full-width colon in the reference)."""
    return f"key name for [{key}] must match regexp ： {regx}"


def extra_key_msg(key: str) -> str:
    """Engine extension (strict mode): the reference ignores data keys
    its rules don't mention (rule.go:152-157 iterates rules, not
    data); ``strict=True`` flags them instead."""
    return f"key [{key}] is not covered by any rule"


def of_msg(key: str, of: list) -> str:
    """rule.go:729-731 — Go %v renders a slice space-joined."""
    return f"value of {key} must be one of [[{' '.join(str(v) for v in of)}]]"


def expr_msg(key: str, sql: str) -> str:
    """Engine extension ($expr has no reference analog)."""
    return f"row at [{key}] must satisfy [{sql}]"


def magic_msg(key: str, fmt_col: str) -> str:
    """Engine extension ($magic has no reference analog)."""
    return f"container magic of [{key}] must match declared [{fmt_col}]"


def header_dims_msg(key: str) -> str:
    """Engine extension ($magic has no reference analog)."""
    return f"header dimensions of [{key}] must match declared w/h columns"


VIOLATION_SCHEMA = T.StructType(
    [
        # row identity (generalizes the reference's source Range — a
        # table row has no line/col; lineage is row key + partition)
        T.StructField("row_key", T.StringType(), True),
        T.StructField("column", T.StringType(), True),
        T.StructField("rule_id", T.StringType(), True),
        T.StructField("error_type", T.StringType(), False),
        T.StructField("message", T.StringType(), True),
        T.StructField("observed", T.StringType(), True),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("run_id", T.StringType(), True),
    ]
)

# the per-check struct built inside the single row-check projection
CHECK_STRUCT = T.StructType(
    [
        T.StructField("column", T.StringType(), True),
        T.StructField("rule_id", T.StringType(), True),
        T.StructField("error_type", T.StringType(), False),
        T.StructField("message", T.StringType(), True),
        T.StructField("observed", T.StringType(), True),
    ]
)

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_violations", T.LongType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("run_id", T.StringType(), True),
    ]
)

METRIC_SCHEMA = T.StructType(
    [
        T.StructField("rule_id", T.StringType(), True),
        T.StructField("error_type", T.StringType(), True),
        T.StructField("n_violations", T.LongType(), False),
        T.StructField("run_id", T.StringType(), True),
    ]
)


def format_msg(key: str, fmt: str) -> str:
    return f"value of [{key}] must be a valid {fmt}"

"""Constraint suggestion: profile a table once and emit a rule file
(the DSL of :mod:`invalid_spark.dsl`) that the table itself satisfies
— the deequ-style "suggest then verify" on-ramp for a corpus nobody
has written rules for yet. The suggested YAML is a starting point a
human tightens, but it is already a valid, loadable, zero-violation
ruleset for the profiled snapshot (round-trip asserted in tests).

Scale shape: one partial+final aggregation over a single column-pruned
scan collects every signal (null counts, min/max, approximate ndv,
byte-length bounds); a second aggregation touches ONLY the columns
whose approximate ndv qualifies them as enums (collect_set bounded by
``ndv_enum_max``, so the set can never blow driver memory). Binary and
array columns get structural rules only.

Mapping (column profile → rule):

- Spark type        → ``$type`` (string→$str, integral→$int,
  fractional→$float, boolean→$bool, binary→$bin, array→$arr)
- any NULLs seen    → ``$optional: true`` (required is the DSL default)
- numeric           → ``$range {$min, $max}`` at the observed bounds
- low-ndv string    → ``$of`` with the exact observed spellings
- format-pure string → ``$format`` (every non-null value matches one
  of the DSL's named whole-value patterns; priority order below —
  more specific formats win)
- other strings     → ``$length {$min, $max}`` at the observed byte
  bounds (0 disables a side, matching the DSL's semantics — a 0
  min is therefore widened to 1 only when no empty string was seen)
- ``row_key``       → ``$unique: true``
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from invalid_spark.dsl import FORMAT_PATTERNS

# more specific formats first: a column of UUIDs also matches no other
# pattern, but e.g. every ipv4 is NOT a date — order decides ties when
# a column satisfies several patterns
_FORMAT_PRIORITY = ("uuid", "email", "ipv4", "url", "datetime", "date")


def _rule_type(dt: T.DataType) -> str | None:
    if isinstance(dt, T.StringType):
        return "$str"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "$int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "$float"
    if isinstance(dt, T.BooleanType):
        return "$bool"
    if isinstance(dt, T.BinaryType):
        return "$bin"
    if isinstance(dt, T.ArrayType):
        return "$arr"
    return None  # maps/structs/timestamps: no row rule suggested


def _is_float_vector(dt: T.DataType) -> bool:
    """array<float>/array<double> — the embedding-column shape whose
    profile can back a ``$vector`` suggestion."""
    return isinstance(dt, T.ArrayType) and isinstance(
        dt.elementType, (T.FloatType, T.DoubleType)
    )


def suggest_rules(
    df: DataFrame,
    row_key: str | None = None,
    ndv_enum_max: int = 16,
    columns: list[str] | None = None,
    exact_ndv: bool = False,
) -> str:
    """Profile ``df`` and return a rule-file YAML string (loadable by
    :func:`invalid_spark.dsl.load_rules`) the table currently
    satisfies. ``exact_ndv=True`` swaps the HLL sketch for an exact
    distinct count — needed when the suggestion must be reproducible
    across engines (the oracle-checked path); the sketch is the
    100 TB default."""
    import yaml

    cols = [
        (f.name, f.dataType)
        for f in df.schema.fields
        if (columns is None or f.name in columns)
        and _rule_type(f.dataType) is not None
    ]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, dt in cols:
        c = F.col(name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"nn_{name}"))
        rt = _rule_type(dt)
        if rt in ("$int", "$float"):
            aggs.append(F.min(c).alias(f"min_{name}"))
            aggs.append(F.max(c).alias(f"max_{name}"))
        elif rt == "$arr" and _is_float_vector(dt):
            # embedding-column profile → $vector suggestion: constant
            # dim, NaN/Inf occurrences, zero vectors, L2-norm band.
            # HOF folds are fine here — this is the one-off profile
            # pass, not the per-run row-check projection.
            inf = F.lit(float("inf"))
            bad = F.exists(
                c,
                lambda x: x.isNull()
                | F.isnan(x.cast("double"))
                | (F.abs(x.cast("double")) == inf),
            )
            norm = F.sqrt(
                F.aggregate(
                    c,
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            )
            aggs.append(F.min(F.size(c)).alias(f"dmin_{name}"))
            aggs.append(F.max(F.size(c)).alias(f"dmax_{name}"))
            aggs.append(F.sum(bad.cast("long")).alias(f"vnan_{name}"))
            aggs.append(
                F.sum(
                    (F.forall(c, lambda x: x == 0) & (F.size(c) > 0))
                    .cast("long")
                ).alias(f"vzero_{name}")
            )
            aggs.append(
                F.min(F.when(~bad, norm)).alias(f"vnmin_{name}")
            )
            aggs.append(
                F.max(F.when(~bad, norm)).alias(f"vnmax_{name}")
            )
        elif rt == "$str":
            ndv = (
                F.count_distinct(c) if exact_ndv
                else F.approx_count_distinct(c)
            )
            aggs.append(ndv.alias(f"ndv_{name}"))
            aggs.append(F.min(F.octet_length(c)).alias(f"lmin_{name}"))
            aggs.append(F.max(F.octet_length(c)).alias(f"lmax_{name}"))
            for fname in _FORMAT_PRIORITY:
                aggs.append(
                    F.sum(
                        F.when(c.rlike(FORMAT_PATTERNS[fname]), 1).otherwise(0)
                    ).alias(f"fmt_{fname}_{name}")
                )
    prof = df.agg(*aggs).collect()[0]

    # second (tiny) pass: exact value sets for enum candidates only
    enum_cols = [
        name
        for name, dt in cols
        if _rule_type(dt) == "$str"
        and (prof[f"ndv_{name}"] or 0) <= ndv_enum_max * 1.2
    ]
    enums: dict[str, list[str]] = {}
    if enum_cols:
        row = df.agg(
            *[F.collect_set(F.col(n)).alias(n) for n in enum_cols]
        ).collect()[0]
        for n in enum_cols:
            vals = sorted(row[n])
            if 1 <= len(vals) <= ndv_enum_max:
                enums[n] = vals

    rules: dict[str, dict] = {}
    for name, dt in cols:
        rt = _rule_type(dt)
        rule: dict = {"$type": rt}
        if (prof[f"nn_{name}"] or 0) > 0:
            rule["$optional"] = True
        if rt in ("$int", "$float"):
            import math as _math

            lo, hi = prof[f"min_{name}"], prof[f"max_{name}"]
            # NaN/±inf observed bounds would serialize as '.nan'/'.inf'
            # — spellings the DSL cannot load — so no range is
            # suggested for columns containing non-finite values
            if (
                lo is not None and hi is not None
                and _math.isfinite(float(lo)) and _math.isfinite(float(hi))
            ):
                rule["$range"] = {
                    "$min": int(lo) if rt == "$int" else float(lo),
                    "$max": int(hi) if rt == "$int" else float(hi),
                }
        elif rt == "$str":
            n_present = (prof["__n"] or 0) - (prof[f"nn_{name}"] or 0)
            fmt = next(
                (
                    f
                    for f in _FORMAT_PRIORITY
                    if n_present > 0
                    and (prof[f"fmt_{f}_{name}"] or 0) == n_present
                ),
                None,
            )
            if name in enums:
                rule["$of"] = enums[name]
            elif fmt is not None:
                rule["$format"] = fmt
            else:
                lmin, lmax = prof[f"lmin_{name}"], prof[f"lmax_{name}"]
                if lmin is not None and lmax is not None and lmax > 0:
                    # a 0 bound disables that side in the DSL, so an
                    # observed empty string means "no min bound"
                    rule["$length"] = {
                        "$min": int(lmin) if lmin > 0 else 0,
                        "$max": int(lmax),
                    }
        elif rt == "$arr":
            # the DSL (reference parity) requires every $arr rule to
            # declare its element constraint
            el = _rule_type(dt.elementType)
            rule["$constraint"] = el if el is not None else "$str"
        if rt == "$arr" and _is_float_vector(dt):
            import math as _math

            vec: dict = {}
            dmin, dmax = prof[f"dmin_{name}"], prof[f"dmax_{name}"]
            if dmin is not None and dmin == dmax:
                vec["dim"] = int(dmin)
            # defaults are strict (no_nan/no_zero True); a table that
            # currently CONTAINS NaN or zero vectors must get the
            # explicit false, or the suggested ruleset would violate
            # its own snapshot
            if (prof[f"vnan_{name}"] or 0) > 0:
                vec["no_nan"] = False
            if (prof[f"vzero_{name}"] or 0) > 0:
                vec["no_zero"] = False
            nlo, nhi = prof[f"vnmin_{name}"], prof[f"vnmax_{name}"]
            if (
                nlo is not None and nhi is not None
                and _math.isfinite(float(nlo)) and _math.isfinite(float(nhi))
                and float(nlo) > 0
            ):
                # round the band OUTWARD at 6dp so YAML decimal
                # round-trip can never turn an observed bound into a
                # violation of itself
                vec["norm"] = {
                    "min": _math.floor(float(nlo) * 1e6) / 1e6,
                    "max": _math.ceil(float(nhi) * 1e6) / 1e6,
                }
            if vec:
                rule["$vector"] = vec
        if row_key is not None and name == row_key:
            rule["$unique"] = True
        rules[name] = rule
    return yaml.safe_dump(rules, sort_keys=False, allow_unicode=True)

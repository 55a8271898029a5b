"""Embedding/vector column checks: dimension, NaN/null/±Inf elements,
zero vectors — the schema invariants an embedding table breaks in
practice (truncated writes, failed encoders emitting zeros, fp
overflow producing NaN).

Runs as its OWN projection stage over the pruned (row key, vector)
scan, not inside the row-check projection: the element predicates
need higher-order functions (``exists``/``forall``), which are
CodegenFallback expressions — embedding them in the main CASE-array
would knock every other check off whole-stage codegen (PLANS.md §1).
Isolated here, the HOF cost applies only to the vector column pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invalid_spark.model import ErrorType


def vector_violations(
    df: DataFrame,
    col: str,
    row_key: str,
    dim: int | None = None,
    no_nan: bool = True,
    no_zero: bool = True,
    norm_min: float | None = None,
    norm_max: float | None = None,
    run_id: str = "",
) -> DataFrame:
    """Violation rows for every vector invariant breach.

    ``norm_min``/``norm_max`` bound the L2 norm — the invariant a
    "normalized embeddings" contract actually means (an encoder that
    silently stopped normalizing passes dim/NaN checks forever). The
    norm is a Catalyst left-fold (``aggregate``), same projection
    pass as the other invariants; a vector containing NaN/±Inf folds
    to a NaN/Inf norm, which fails BOTH bounds (comparisons with NaN
    are false → flagged here only via the finiteness check, which is
    why ``no_nan`` also refuses ±Inf)."""
    c = F.col(col)
    checks = []
    if dim is not None:
        checks.append(
            F.when(
                c.isNotNull() & (F.size(c) != dim),
                F.struct(
                    F.lit(ErrorType.VECTOR_MISMATCH).alias("error_type"),
                    F.lit(f"vector [{col}] must have dim {dim}").alias("message"),
                    F.size(c).cast("string").alias("observed"),
                ),
            )
        )
    if no_nan:
        inf = F.lit(float("inf"))
        bad = F.exists(
            c,
            lambda x: x.isNull()
            | F.isnan(x.cast("double"))
            | (F.abs(x.cast("double")) == inf),
        )
        checks.append(
            F.when(
                c.isNotNull() & bad,
                F.struct(
                    F.lit(ErrorType.VECTOR_MISMATCH).alias("error_type"),
                    F.lit(
                        f"vector [{col}] must not contain NaN/null/Inf"
                    ).alias("message"),
                    F.lit(None).cast("string").alias("observed"),
                ),
            )
        )
    if norm_min is not None or norm_max is not None:
        norm = F.sqrt(
            F.aggregate(
                c,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )
        out_of_band = F.lit(False)
        if norm_min is not None:
            out_of_band = out_of_band | (norm < F.lit(float(norm_min)))
        if norm_max is not None:
            out_of_band = out_of_band | (norm > F.lit(float(norm_max)))
        checks.append(
            F.when(
                c.isNotNull() & F.coalesce(out_of_band, F.lit(False)),
                F.struct(
                    F.lit(ErrorType.VECTOR_MISMATCH).alias("error_type"),
                    F.lit(
                        f"vector [{col}] L2 norm must be in "
                        f"[{norm_min}, {norm_max}]"
                    ).alias("message"),
                    F.round(norm, 6).cast("string").alias("observed"),
                ),
            )
        )
    if no_zero:
        zero = F.forall(c, lambda x: x == 0)
        checks.append(
            F.when(
                c.isNotNull() & (F.size(c) > 0) & zero,
                F.struct(
                    F.lit(ErrorType.VECTOR_MISMATCH).alias("error_type"),
                    F.lit(f"vector [{col}] must not be all zeros").alias("message"),
                    F.lit(None).cast("string").alias("observed"),
                ),
            )
        )
    out = (
        df.select(
            F.col(row_key).cast("string").alias("row_key"),
            F.spark_partition_id().alias("partition_id"),
            F.explode(F.array(*checks)).alias("v"),
        )
        .filter(F.col("v").isNotNull())
    )
    return out.select(
        "row_key",
        F.lit(col).alias("column"),
        F.lit(col).alias("rule_id"),
        F.col("v.error_type").alias("error_type"),
        F.col("v.message").alias("message"),
        F.col("v.observed").alias("observed"),
        "partition_id",
        F.lit(run_id).alias("run_id"),
    )

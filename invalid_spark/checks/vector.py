"""Embedding/vector column checks: dimension, NaN/null elements,
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
    run_id: str = "",
) -> DataFrame:
    """Violation rows for every vector invariant breach."""
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
        bad = F.exists(c, lambda x: x.isNull() | F.isnan(x.cast("double")))
        checks.append(
            F.when(
                c.isNotNull() & bad,
                F.struct(
                    F.lit(ErrorType.VECTOR_MISMATCH).alias("error_type"),
                    F.lit(f"vector [{col}] must not contain NaN/null").alias("message"),
                    F.lit(None).cast("string").alias("observed"),
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

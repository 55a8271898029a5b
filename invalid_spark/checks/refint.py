"""Referential-integrity checks (SURVEY.md §2.3).

``$ref: {table, key}`` on a column becomes a LEFT ANTI join against
the dimension table: rows whose foreign key has no match are
violations. Small dimensions are broadcast explicitly (``broadcast=
True``, the default — license/taxonomy tables are KB-sized); large
dimensions fall back to a shuffle join where AQE picks the physical
strategy and splits skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from invalid_spark.model import ErrorType


def ref_violations(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    dim_key: str,
    row_key: str,
    run_id: str = "",
    broadcast: bool = True,
) -> DataFrame:
    """Rows of ``df`` whose ``col`` is absent from ``dim.dim_key``."""
    keys = dim.select(F.col(dim_key).alias("__refk")).distinct()
    if broadcast:
        keys = F.broadcast(keys)
    missing = df.select(
        F.col(row_key).cast("string").alias("row_key"),
        F.col(col).alias("__fk"),
        F.spark_partition_id().alias("partition_id"),
    ).join(keys, F.col("__fk") == F.col("__refk"), "left_anti")
    return missing.select(
        "row_key",
        F.lit(col).alias("column"),
        F.lit(col).alias("rule_id"),
        F.lit(ErrorType.REF_MISMATCH).alias("error_type"),
        F.concat(
            F.lit(f"value of [{col}] has no match in reference ["),
            F.lit(dim_key),
            F.lit("]"),
        ).alias("message"),
        F.col("__fk").cast("string").alias("observed"),
        "partition_id",
        F.lit(run_id).alias("run_id"),
    )

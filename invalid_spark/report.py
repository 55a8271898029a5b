"""Verdicts and metrics over a violations DataFrame.

Generalizes the reference's per-document pass/fail (``len(results)
== 0``, reference valid_test.go:72-75) to per-partition verdicts
(SURVEY.md §2.3): a partition passes iff it contributed zero
violation rows. Schema-level violations (``partition_id`` NULL)
fail every partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_verdicts(
    df: DataFrame, violations: DataFrame, run_id: str = ""
) -> DataFrame:
    """One row per input partition: (partition_id, n_rows,
    n_violations, passed). Both sides aggregate before the join, so
    the shuffle is over at most #partitions rows."""
    rows_per_part = df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    schema_fail = (
        violations.filter(F.col("partition_id").isNull()).limit(1).count() > 0
    )
    v_per_part = (
        violations.filter(F.col("partition_id").isNotNull())
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    out = (
        rows_per_part.join(v_per_part, "partition_id", "left")
        .select(
            "partition_id",
            "n_rows",
            F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        )
        .withColumn(
            "passed",
            (F.col("n_violations") == 0) & F.lit(not schema_fail),
        )
        .withColumn("run_id", F.lit(run_id))
    )
    return out


def group_verdicts(
    df: DataFrame,
    violations: DataFrame,
    group_col: str,
    row_key: str,
    run_id: str = "",
) -> DataFrame:
    """Per data-partition verdicts keyed by a *data* column (the
    production semantics: at 100 TB the audit unit is an Iceberg
    partition value — a date bucket, a source shard — not a Spark
    task partition). Violations are attributed to their group via a
    key join; both sides aggregate before joining, so the final join
    moves at most |groups| rows."""
    keyed = df.select(
        F.col(row_key).cast("string").alias("row_key"),
        F.col(group_col).alias("grp"),
    )
    rows_per = keyed.groupBy("grp").agg(F.count(F.lit(1)).alias("n_rows"))
    # one mapping row per key: duplicated row keys (exactly what the
    # uniqueness check plants) must not fan out the violations join
    # and overcount n_violations — deterministic keeper (min group)
    # so both engines of the oracle gate agree
    key_map = keyed.groupBy("row_key").agg(F.min("grp").alias("grp"))
    v_per = (
        violations.select("row_key")
        .join(key_map, "row_key")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return (
        rows_per.join(v_per, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n_rows",
            F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        )
        .withColumn("passed", F.col("n_violations") == 0)
        .withColumn("run_id", F.lit(run_id))
    )


def rule_metrics(violations: DataFrame, run_id: str = "") -> DataFrame:
    """Violation counts per (rule_id, error_type) — the metrics rows
    the north rule requires alongside verdicts."""
    return (
        violations.groupBy("rule_id", "error_type")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .withColumn("run_id", F.lit(run_id))
    )


def violation_samples(
    violations: DataFrame, k: int = 10, order_col: str = "row_key"
) -> DataFrame:
    """Top-K example violations per (rule_id, error_type) — bounded
    output for dashboards/alerting no matter how many rows failed.
    One window over the (already small relative to input) violations
    stream; deterministic order by ``order_col``."""
    from pyspark.sql import Window

    w = Window.partitionBy("rule_id", "error_type").orderBy(F.col(order_col).asc())
    return (
        violations.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def split_valid(
    df: DataFrame, violations: DataFrame, row_key: str
) -> tuple[DataFrame, DataFrame]:
    """Quarantine split: (clean_rows, quarantined_rows).

    The standard validation-pipeline output contract: rows with any
    violation route to a quarantine sink for triage, clean rows flow
    on. One anti-join / semi-join pair against the (small, distinct)
    violating-key set — Catalyst broadcasts it when violations are
    sparse, which is the normal case."""
    bad_keys = violations.select(
        F.col("row_key").alias("__bk")
    ).filter(F.col("__bk").isNotNull()).distinct()
    keyed = F.col(row_key).cast("string")
    clean = df.join(bad_keys, keyed == F.col("__bk"), "left_anti")
    quarantined = df.join(bad_keys, keyed == F.col("__bk"), "left_semi")
    return clean, quarantined


def overall_pass(violations: DataFrame) -> bool:
    """Reference ``Validate`` contract: empty result = pass
    (rule.go:131-141)."""
    return violations.limit(1).count() == 0

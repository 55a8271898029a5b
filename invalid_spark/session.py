"""SparkSession factory tuned for the validation engine.

Local-mode defaults mirror what the cluster profile would set per
executor: AQE on (runtime re-plan + skew-join), Arrow enabled with a
small batch cap because image ``bytes`` rows are large, shuffle
partitions ~= cores (overridable for the 100 TB profile where this
should be ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size: each batch crosses JVM→Python once, so bigger
# batches amortize the round trip; but rows carry binary image
# payloads (KBs synthetic, MBs production), so the production profile
# should scale this down to keep batches ≲100 MB per Python worker
# (SPARK_GRAFT_ARROW_BATCH env).
ARROW_BATCH_ROWS = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH", "2048"))


def get_spark(
    app_name: str = "invalid_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # local mode: ~cores; at cluster scale callers pass 2-3x total cores.
        shuffle_partitions = max(cores, 8)

    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""SparkSession construction tuned for both local test runs and cluster scale.

The reference keeps one global DuckDB connection alive for the whole process
(reference connections.py:60-111). The Spark analog is a single shared
SparkSession; temp views registered on it play the role of the reference's
DuckDB views (reference relation.py:115-122).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "dbt_parquet_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Settings chosen for scale-readiness (all are no-ops to correctness):

    - AQE on: runtime shuffle-partition coalescing, skew-join splitting and
      dynamic broadcast — the knobs that keep plans healthy at 100 TB.
    - Parquet filter pushdown + vectorized reader: on by default; asserted in
      tests/test_plans.py rather than configured blindly.
    - shuffle.partitions sized to cores locally; a real cluster deployment
      overrides via spark-defaults (AQE coalescing makes the initial number
      non-critical).
    - Arrow enabled so the pandas-UDF extension operators use columnar
      batch transfer instead of row pickling.
    """
    cpus = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

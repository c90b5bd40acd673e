"""Bucketed tables — pre-shuffled layouts for co-located joins.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides.
Writing both tables bucketed by the join key (same bucket count) lets Spark
join them with ZERO exchanges: bucket files are already hash-partitioned on
disk, so SortMergeJoin reads aligned buckets directly. The reference cannot
express this at all (single file per table, reference README.md:49).

Bucketing requires the session catalog (``saveAsTable``); tables live under
``spark.sql.warehouse.dir``. This module manages that namespace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table. Sorting
    within buckets additionally removes the join's sort step."""
    import os
    import shutil

    spark = df.sparkSession
    # The default in-memory catalog forgets tables across sessions while
    # their warehouse directories persist — clear both before writing.
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    stale = os.path.join(warehouse, table_name.lower())
    if os.path.exists(stale):
        shutil.rmtree(stale)

    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def cohorted_join(spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables — produces an exchange-free plan
    (asserted in tests/test_bucketed.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)

"""AQE skew handling — evidence that the engine's config actually splits
skewed join partitions at runtime (the mechanism SCALE.md leans on for hot
keys, complementing the manual functions/joins.salted_join)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    # 1 key holds ~50% of the left side; thresholds tuned down so the tiny
    # local dataset trips the same optimizer path a hot key trips at scale.
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(400_000).select(
            F.when(F.col("id") % 2 == 0, 7).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pl"),
        )
        right = spark.range(1000).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        joined = left.join(right, "k")
        # execute THIS dataframe's plan (count() would build a separate one)
        assert len(joined.collect()) == 400_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_parquet_spark.registry import load_all
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_ORACLE

SPECS = load_all()


def test_sample_reproducible_and_sized(spark):
    a = SPECS["q_sample"].builder(spark, SF_ORACLE).collect()
    b = SPECS["q_sample"].builder(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # hash-based → stable
    n_total = load_table(spark, SF_ORACLE, "lineitem").count()
    frac = len(a) / n_total
    assert 0.07 < frac < 0.13  # md5-threshold ≈ 10.2% of the hash space


def test_seeded_bernoulli_sample_reproducible(spark):
    # engine-local seeded sampling (df.sample) — reproducible within Spark
    li = load_table(spark, SF_ORACLE, "lineitem")
    a = li.sample(fraction=0.1, seed=42).count()
    b = li.sample(fraction=0.1, seed=42).count()
    assert a == b
    assert 0.07 < a / li.count() < 0.13


def test_approx_quantile_error_bound(spark):
    # the compared output folds the sketch into a boolean bound check
    rows = SPECS["q_approx_quantile"].builder(spark, SF_ORACLE).collect()
    assert rows and all(r.approx_within_2pct for r in rows)
    # and the raw sketch value itself stays within 1% of exact
    li = load_table(spark, SF_ORACLE, "lineitem")
    checks = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    )
    for r in checks.collect():
        rel_err = abs(r.approx - r.exact) / r.exact
        assert rel_err < 0.01, (r.l_returnflag, rel_err)


def test_hll_sketch_error_bound(spark):
    # the compared output folds the HLL estimate into a boolean bound check
    rows = SPECS["q_sketch_distinct"].builder(spark, SF_ORACLE).collect()
    assert rows and all(r.approx_within_5pct for r in rows)
    # and the raw sketch estimate itself stays within 5% of exact
    events = load_table(spark, SF_ORACLE, "events")
    checks = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    )
    for r in checks.collect():
        assert abs(r.approx - r.exact) / r.exact < 0.05, r.event_type


def test_cluster_sample_whole_groups_and_ht_identity(spark):
    """Cluster sampling keeps WHOLE orders (every sampled cluster's item
    count equals the full table's count for that order), and the 16
    single-hex-digit bucket estimates of total rows average to the exact
    total — the Horvitz-Thompson unbiasedness identity (each cluster lands
    in exactly one bucket)."""
    li = load_table(spark, SF_ORACLE, "lineitem")
    full = {
        r["l_orderkey"]: r["n"]
        for r in li.groupBy("l_orderkey").agg(F.count("*").alias("n")).collect()
    }
    sample = SPECS["q_cluster_sample"].builder(spark, SF_ORACLE).collect()
    assert sample
    for r in sample:
        assert r["n_items"] == full[r["l_orderkey"]]  # whole cluster, intact
    # HT identity over all 16 buckets
    digit = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    per_bucket = {
        r["d"]: r["n"]
        for r in li.groupBy(digit.alias("d")).agg(F.count("*").alias("n")).collect()
    }
    total = sum(full.values())
    assert sum(16 * per_bucket.get(d, 0) for d in "0123456789abcdef") / 16 == total


def test_join_size_estimate_accuracy_and_identity(spark):
    """The sampled join-size estimator: exact column really is Σ n(u)²,
    the 16-bucket estimates average to it exactly, and the committed
    single-bucket estimate lands within 25% on this draw."""
    row = SPECS["q_join_size_estimate"].builder(spark, SF_ORACLE).first()
    ev = load_table(spark, SF_ORACLE, "events")
    g = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    exact = g.agg(F.sum(F.col("n") * F.col("n"))).first()[0]
    assert row["exact_join_rows"] == exact
    digit = F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
    per_bucket = {
        r["d"]: r["s"]
        for r in g.groupBy(digit.alias("d"))
        .agg(F.sum(F.col("n") * F.col("n")).alias("s"))
        .collect()
    }
    assert (
        sum(16 * per_bucket.get(d, 0) for d in "0123456789abcdef") / 16 == exact
    )
    assert abs(row["est_join_rows"] - exact) <= 0.25 * exact

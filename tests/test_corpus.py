from __future__ import annotations

from dbt_parquet_spark.operators.corpus import q_stratified_sample, q_train_test_split
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_ORACLE


def test_stratified_sample_bands_and_determinism(spark):
    a = q_stratified_sample(spark, SF_ORACLE).collect()
    b = q_stratified_sample(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    docs = load_table(spark, SF_ORACLE, "documents")
    totals = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    got = {}
    for r in a:
        got[r.lang] = got.get(r.lang, 0) + 1
    assert 0.15 < got["en"] / totals["en"] < 0.45  # fraction 0.3
    for lang in ("zh", "es", "de", "fr"):  # fraction 0.8
        assert 0.6 < got[lang] / totals[lang] <= 1.0


def test_split_is_stable_under_resharding(spark):
    one = {
        r.split: r.n_docs
        for r in q_train_test_split(spark, SF_ORACLE).collect()
    }
    # split is a pure function of doc_id: recomputing after a repartition
    # of the source yields identical counts
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_ORACLE, "documents").repartition(17)
    split = F.when(
        F.md5(F.col("doc_id").cast("string")) < "c" * 32, "train"
    ).otherwise("test")
    two = {
        r.split: r.n
        for r in docs.select(split.alias("split")).groupBy("split").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert one == two
    assert one["train"] > one["test"]


def test_seeded_sampleby_reproducible(spark):
    # engine-local seeded stratified sampling (df.sampleBy) — reproducible
    # within Spark; the registered query uses the engine-independent
    # md5-threshold form instead
    from dbt_parquet_spark.operators.corpus import STRATA_FRACTIONS

    docs = load_table(spark, SF_ORACLE, "documents")
    a = docs.sampleBy("lang", STRATA_FRACTIONS, seed=42).count()
    b = docs.sampleBy("lang", STRATA_FRACTIONS, seed=42).count()
    assert a == b and a > 0

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


def test_cooccurrence_cap_exactly_characterized(spark):
    """The production stop-token df-cap drops EXACTLY the pairs involving a
    capped token, nothing else: capped output == uncapped output restricted
    to pairs whose tokens both have df <= cap, with bit-identical co_df and
    lift (stats are computed pre-cap). Also pins non-vacuity: the sf0.01
    corpus must actually have tokens over the cap, or this test means
    nothing."""
    from pyspark.sql import functions as F

    from dbt_parquet_spark.operators.corpus import (
        COOC_STOP_DF_CAP,
        q_cooccurrence,
        q_cooccurrence_capped,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    tok_df = (
        docs.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    hot = {r.tok for r in tok_df.filter(F.col("df") > COOC_STOP_DF_CAP).collect()}
    assert hot, "cap is vacuous at sf0.01 — no token exceeds it"

    uncapped = {
        (r.tok_a, r.tok_b): (r.co_df, r.lift)
        for r in q_cooccurrence(spark, SF_ORACLE).collect()
    }
    capped = {
        (r.tok_a, r.tok_b): (r.co_df, r.lift)
        for r in q_cooccurrence_capped(spark, SF_ORACLE).collect()
    }
    expected = {
        k: v for k, v in uncapped.items() if k[0] not in hot and k[1] not in hot
    }
    assert capped == expected
    assert len(capped) < len(uncapped), "cap dropped no pair — vacuous corpus"


def test_vocab_coverage_monotone_and_saturating(spark):
    from dbt_parquet_spark.operators.corpus import VOCAB_COVERAGE_KS, q_vocab_coverage

    rows = {r.k: r for r in q_vocab_coverage(spark, SF_ORACLE).collect()}
    assert set(rows) == set(VOCAB_COVERAGE_KS)
    ks = sorted(rows)
    for a, b in zip(ks, ks[1:]):
        assert rows[a].covered_tokens <= rows[b].covered_tokens
        assert rows[a].coverage_ppm <= rows[b].coverage_ppm
    n_types = rows[ks[0]].n_types
    for k in ks:
        if k >= n_types:
            assert rows[k].coverage_ppm == 1_000_000

"""Grouped-map and scalar Pandas-UDF operators — the sanctioned Python
escape hatches (Arrow-batched; never row-at-a-time) for logic the built-in
expressions can't express (SURVEY §2B UDF row: absent in the reference,
north-star extension here).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources.readers import load_table

ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("acctbal_z", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-nation z-score normalization — classic grouped-map shape: the
    whole group arrives as one pandas frame, vectorized numpy does the
    per-row math. The moments are computed EXACTLY (the testdata's balances
    are 2-decimal, so integer-cent sums are order-independent), then one
    IEEE sqrt/divide — mirroring the oracle's decimal-moment formulation
    bit for bit regardless of row order within the group."""
    import math

    cents = (pdf["c_acctbal"] * 100).round().astype("int64")
    n = len(pdf)
    s1 = int(cents.sum())  # exact Σx·100
    s2 = int((cents * cents).sum())  # exact Σx²·10⁴
    mu = (s1 / 100.0) / n
    var = (s2 / 10000.0) / n - mu * mu
    sd = math.sqrt(max(var, 0.0))
    if sd > 0:
        z = (pdf["c_acctbal"] - mu) / sd
    else:
        z = pd.Series(0.0, index=pdf.index)
    return pd.DataFrame(
        {
            "c_custkey": pdf["c_custkey"],
            "c_nationkey": pdf["c_nationkey"],
            "c_acctbal": pdf["c_acctbal"],
            "acctbal_z": z,
        }
    )


@register(
    "q_grouped_zscore",
    oracle="""
    WITH m AS (
        SELECT c_nationkey,
               COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))
                        * CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS s2
        FROM customer GROUP BY c_nationkey
    ),
    stats AS (
        SELECT c_nationkey, s1 / n AS mu,
               sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS sd
        FROM m
    )
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
           CASE WHEN s.sd > 0 THEN (c.c_acctbal - s.mu) / s.sd ELSE 0.0 END AS acctbal_z
    FROM customer c JOIN stats s USING (c_nationkey)
    """,
    tags=("pandas_udf", "grouped_map"),
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: z-score account balances within each
    nation. ORACLE-CHECKED despite being a Python UDF: the group moments
    are exact integer-cent sums (order-independent), the oracle computes
    the same moments via exact DECIMAL, and both sides then apply the same
    IEEE double expression (sub, div, correctly-rounded sqrt) — so the
    pandas path is bit-identical to DuckDB.

    Scale: one shuffle on the group key; each group must fit in one
    executor's memory as a pandas frame — for mega-groups switch to the
    two-pass join-the-moments formulation (the oracle's own shape).
    """
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.select("c_custkey", "c_nationkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInPandas(_zscore_group, schema=ZSCORE_SCHEMA)
    )


@register("q_label_centroids", tags=("pandas_udf", "vector"))
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids + per-vector distance to own centroid —
    the building block of IVF indexing and cluster-based corpus curation.

    Built-in path (no UDF!): explode dimensions, average per (label, dim),
    reassemble with array_agg sorted by dim — demonstrating that even
    'vector' ops often stay JVM-side. Rows-only (float mean is
    order-dependent across engines); tests check against numpy within 1e-6.

    Scale: explode multiplies rows by dim (64×) but they're 20 bytes each;
    the shuffle is on (label, dim) — perfectly uniform.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    )
    centroids = (
        dims.groupBy("label", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("pairs"))
        .select(
            "label",
            F.transform("pairs", lambda p: p["c"]).alias("centroid"),
        )
    )
    return centroids


def _trimmed_mean(v: pd.Series) -> float:
    """Grouped-agg Pandas UDF body (Series → scalar): rank-based 10%-trimmed
    mean — a robust-statistics aggregate SQL lacks. Drops the k = n//10
    lowest and highest values (pure integer logic — no quantile
    interpolation, so every engine agrees on the kept multiset even with
    ties) and averages the rest via exact integer cents, matching the
    oracle's DECIMAL sum bit for bit. Runs once per group with the group's
    column as one pandas Series. (Wrapped with F.pandas_udf inside the
    builder: decorating at import time needs an active session.)"""
    cents = (v * 100).round().astype("int64").sort_values()
    n = len(cents)
    k = n // 10
    kept = cents.iloc[k : n - k]
    return (int(kept.sum()) / 100.0) / len(kept)


@register(
    "q_trimmed_mean",
    oracle="""
    WITH ranked AS (
        SELECT c_mktsegment, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS rn,
               COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
        FROM customer
    )
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                         THEN CAST(c_acctbal AS DECIMAL(12,2)) END) AS DOUBLE)
             / SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10 THEN 1 ELSE 0 END)
             AS trimmed_acctbal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_acctbal,
           COUNT(*) AS n
    FROM ranked
    GROUP BY c_mktsegment
    """,
    tags=("pandas_udf", "grouped_agg"),
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF: per-market-segment 10%-trimmed mean of
    account balances next to the exact plain mean. ORACLE-CHECKED: rank
    trimming drops a value multiset both engines agree on (ties straddling
    the cut contribute identical values), and both sides average via exact
    cents/DECIMAL before one double divide.

    Scale: same single-shuffle shape as a built-in aggregate; the UDF
    receives Arrow batches per group. (The oracle's windowed restatement
    would need a per-group sort at scale — the UDF form sorts only within
    each group's frame.)"""
    trimmed_mean_udaf = F.pandas_udf(_trimmed_mean, "double")
    customer = load_table(spark, sf_dir, "customer")
    # Spark disallows mixing pandas UDAFs with built-in aggregates in one
    # agg — compute separately and join on the group key (both sides reuse
    # the same hash partitioning, so the join adds no extra wide shuffle).
    robust = customer.groupBy("c_mktsegment").agg(
        trimmed_mean_udaf(F.col("c_acctbal")).alias("trimmed_acctbal")
    )
    plain = customer.groupBy("c_mktsegment").agg(
        (F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1))).alias(
            "mean_acctbal"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    return robust.join(plain, "c_mktsegment")


SCORE_SCHEMA = T.DoubleType()


def quality_score_batches(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Scalar Pandas UDF (iterator form): heuristic doc quality in [0,1] —
    length sweet-spot × lexical diversity. Vectorized pandas per Arrow
    batch; the iterator form amortizes any per-worker setup (e.g. loading
    a model) across batches."""
    for texts in it:
        toks = texts.str.split(" ")
        n = toks.map(len).clip(lower=1)
        distinct = toks.map(lambda t: len(set(t)))
        length_score = (n / 60.0).clip(upper=1.0)
        diversity = (distinct / n).clip(upper=1.0)
        yield (length_score * diversity).astype("float64")


@register(
    "q_quality_score",
    oracle="""
    SELECT doc_id, lang,
           least(len(string_split(text, ' ')) / 60.0, 1.0)
             * least(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / len(string_split(text, ' ')), 1.0) AS quality
    FROM documents
    """,
    tags=("pandas_udf", "text"),
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar quality scoring over documents (the shape for
    model-based scorers: swap the lambda for an ONNX/torch call).

    ORACLE-CHECKED despite being a Python UDF: the scorer is pure IEEE
    double arithmetic (n/60 clipped x distinct/n clipped), so the pandas
    path must produce bit-identical values to DuckDB computing the same
    formula - demonstrating the Arrow transfer is semantics-preserving."""
    score = F.pandas_udf(quality_score_batches, SCORE_SCHEMA)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", score(F.col("text")).alias("quality"))

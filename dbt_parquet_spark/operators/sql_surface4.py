"""SQL surface, part 5: correlated scalar subqueries, exact correlation via
decimal moments, sampling, and quantile sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..registry import register
from ..sources.readers import load_table


@register(
    "q_correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           (SELECT MAX(l_extendedprice) FROM lineitem WHERE l_orderkey = o_orderkey) AS max_line_price,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_lines
    FROM orders
    WHERE o_totalprice > 250000
    """,
    tags=("subquery", "correlated"),
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (per-row lookups into another table).
    Catalyst decorrelates both into aggregates + left joins — the plan a
    human would hand-write — so the 'per-row subquery' costs one shuffle,
    not N queries. Expressed through the SQL front-end to exercise the
    decorrelation path itself."""
    import uuid

    tag = uuid.uuid4().hex[:8]
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(f"orders_{tag}")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(f"lineitem_{tag}")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice,
               (SELECT MAX(l_extendedprice) FROM lineitem_{tag} WHERE l_orderkey = o_orderkey) AS max_line_price,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem_{tag} WHERE l_orderkey = o_orderkey) AS n_lines
        FROM orders_{tag}
        WHERE o_totalprice > 250000
        """
    )


@register(
    "q_corr_exact",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
              * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1) AS qty_price_cov
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance via exact DECIMAL cross-moments — the q_stddev_exact
    technique extended to two variables (corr = cov / (σx·σy) follows the
    same way). Built-in covar_samp/corr are float-order-dependent; this
    formulation is reproducible at any partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = dec("l_quantity"), dec("l_extendedprice")
    n = F.count(F.lit(1))
    cov = (F.sum(q * p).cast("double") - F.sum(q).cast("double") * F.sum(p).cast("double") / n) / (
        n - F.lit(1)
    )
    return li.groupBy("l_returnflag").agg(n.alias("n"), cov.alias("qty_price_cov"))


@register(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
           CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    tags=("agg", "grouping-sets"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS + grouping() indicator columns (the general
    form behind ROLLUP/CUBE; the indicators disambiguate aggregation NULLs
    from data NULLs). One shuffle pass via Expand, same as rollup."""
    import uuid

    tag = uuid.uuid4().hex[:8]
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(f"lineitem_{tag}")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
               CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
               COUNT(*) AS n
        FROM lineitem_{tag}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "q_lateral_topn",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
    FROM orders o, LATERAL (
        SELECT l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_orderkey = o.o_orderkey
        ORDER BY l_extendedprice DESC, l_linenumber ASC
        LIMIT 2
    ) AS l
    WHERE o.o_totalprice > 400000
    """,
    tags=("join", "lateral"),
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row LATERAL top-N: each qualifying order's two priciest lines.
    The oracle uses DuckDB's LATERAL-with-LIMIT; the Spark plan is the
    equivalent (and at scale, superior) formulation — semi-join filter +
    rank window — because a per-row correlated re-scan is exactly what a
    distributed engine must rewrite away. Unique tiebreaks make both
    deterministic and identical."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.join(
        F.broadcast(orders.select(F.col("o_orderkey"))),
        li.l_orderkey == F.col("o_orderkey"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        keyed.select(
            "o_orderkey", "l_linenumber", "l_extendedprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


@register("q_sample", tags=("sample",))
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed — reproducible WITHIN Spark
    (seeded per-partition), but sampling algorithms are engine-specific so
    this is rows-only for the driver; the test pins the sampled row count
    band and run-to-run determinism.

    Scale: sampling is a scan-side filter — no shuffle; the standard first
    step of profiling a 100 TB table."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber", "l_quantity")


@register("q_approx_quantile", tags=("sketch", "percentile"))
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) next to exact ones —
    the mergeable-sketch path that replaces q_percentiles' per-group sort at
    100 TB. Rows-only (sketch internals are engine-specific); the test
    bounds the approximation error against the exact values."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median_price"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median_price"),
        F.count(F.lit(1)).alias("n"),
    )

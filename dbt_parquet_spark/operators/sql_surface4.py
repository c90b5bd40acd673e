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


# md5-hex < '1a…' keeps ~(0x1a/0x100) ≈ 10.2% of the uniform hash space.
SAMPLE_THRESHOLD = "1a" + "0" * 30


@register(
    "q_sample",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR))
          < '{SAMPLE_THRESHOLD}'
    """,
    tags=("sample",),
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample via md5-threshold on the row key —
    the same hash-based assignment idiom as q_train_test_split, so the
    SAME rows are selected by every engine and every re-run (seeded
    ``df.sample`` is only reproducible within one engine; it stays covered
    by tests/test_sampling_sketches.py).

    Scale: sampling is a scan-side filter — no shuffle; the standard first
    step of profiling a 100 TB table, and the hash-based form survives
    resharding and incremental appends."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    return li.filter(F.md5(key) < SAMPLE_THRESHOLD).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "q_approx_quantile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS exact_median_qty,
           COUNT(*) AS n,
           TRUE AS approx_within_2pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("sketch", "percentile"),
)
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) next to exact ones —
    the mergeable-sketch path that replaces q_percentiles' per-group sort at
    100 TB. Sketch internals are engine-specific, so the compared output
    carries (a) the exact median (the q_percentiles quantile_cont pattern),
    and (b) the sketch folded into a deterministic error-bound CHECK: the
    approx median must sit within 2% of the exact one (oracle: TRUE).
    tests/test_sampling_sketches.py additionally bounds the raw sketch
    values."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = F.percentile_approx("l_extendedprice", 0.5, 1000)
    exact_price = F.expr("percentile(l_extendedprice, 0.5)")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("exact_median_qty"),
        F.count(F.lit(1)).alias("n"),
        (F.abs(approx - exact_price) <= 0.02 * exact_price).alias("approx_within_2pct"),
    )

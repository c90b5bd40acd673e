"""SQL surface, part 4: string aggregation, date formatting, boolean
aggregates, and deterministic standard deviation. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..registry import register
from ..sources.readers import load_table


@register(
    "q_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           COUNT(*) AS n_nations
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("string", "agg"),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (string_agg ⇔ sorted collect + array_join
    — the explicit ORDER BY is what makes it deterministic in a distributed
    engine)."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations_csv"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "q_date_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS order_month_str,
           strftime(o_orderdate, '%Y/%m/%d') AS order_date_str,
           CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS day_of_year
    FROM orders
    """,
    tags=("datetime", "format"),
)
def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date formatting + calendar extraction. Format-token dialects differ
    (strftime %Y vs java yyyy) but the rendered strings are identical —
    the portable contract is the output, not the pattern."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month_str"),
        F.date_format("o_orderdate", "yyyy/MM/dd").alias("order_date_str"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofyear("o_orderdate").alias("day_of_year"),
    )


@register(
    "q_bool_agg",
    oracle="""
    SELECT o_custkey,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority LIKE '1%') AS BIGINT) AS n_top_priority
    FROM orders
    GROUP BY o_custkey
    """,
    tags=("agg", "bool"),
)
def q_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: bool_and/bool_or ⇔ Spark every/some."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count(F.when(F.col("o_orderpriority").like("1%"), 1)).alias("n_top_priority"),
    )


@register(
    "q_arg_minmax",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders
    GROUP BY o_custkey
    """,
    tags=("agg", "argmax"),
)
def q_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-max aggregation: the order id carrying each customer's highest/
    lowest price (max_by/min_by ⇔ arg_max/arg_min) — the 'row attached to
    the extreme' idiom that otherwise costs a window + filter.

    o_totalprice ties within a customer are possible in principle; both
    engines pick SOME tied row — the testdata has no per-customer price
    ties (verified), so the comparison is deterministic. At scale, break
    ties by composing the ordering key: max_by(k, struct(price, k)).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@register(
    "q_stddev_exact",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           sqrt(greatest(
               (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
               / (COUNT(*) - 1), 0.0)) AS qty_stddev
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_stddev_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sample standard deviation: built-in stddev over doubles
    is summation-order-dependent (different partitionings → different last
    bits), so the moments are computed in exact DECIMAL (sum, sum of
    squares) and only the final sqrt runs in float — bit-identical on any
    cluster size and in both engines. The same technique generalizes to
    variance/covariance/correlation."""
    li = load_table(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    sum_d = F.sum(q).cast("double")
    sumsq_d = F.sum(q * q).cast("double")
    n = F.count(F.lit(1))
    var = (sumsq_d - sum_d * sum_d / n) / (n - F.lit(1))
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("qty_stddev"),
    )

"""Window-function operators (SURVEY §2B Window row — north-star surface;
absent from the reference's own emitted SQL but part of its DuckDB
pass-through capability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..registry import register
from ..sources.readers import load_table


@register(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk
        FROM orders
    ) AS ranked
    WHERE rnk <= 3
    """,
    tags=("window",),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price — RANK over a partitioned window.

    RANK (not ROW_NUMBER) keeps the result set deterministic under ties.

    Scale: one shuffle on o_custkey, per-partition sort. Skewed customers are
    the classic window hot-spot; AQE can't split a window partition, so at
    100 TB a two-phase top-k (partial per-partition heap, then final window)
    is the fallback — unnecessary here since per-customer cardinality is
    bounded.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "q_pct_of_total",
    oracle="""
    WITH spend AS (
        SELECT c_nationkey, c_custkey,
               SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS bal
        FROM customer
        GROUP BY c_nationkey, c_custkey
    )
    SELECT c_nationkey, c_custkey,
           CAST(bal AS DOUBLE) AS acctbal,
           CAST(bal AS DOUBLE) / CAST(SUM(bal) OVER (PARTITION BY c_nationkey) AS DOUBLE)
             AS pct_of_nation
    FROM spend
    """,
    tags=("window", "ratio"),
)
def q_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio_to_report): each customer's share of their
    nation's balance — windowed sum as denominator. The decimal group sums
    keep numerator AND denominator bit-identical across engines, so the
    double ratio is too.

    Scale: one shuffle on nation; the window reuses that partitioning.
    """
    customer = load_table(spark, sf_dir, "customer")
    spend = customer.groupBy("c_nationkey", "c_custkey").agg(
        F.sum(dec("c_acctbal")).alias("bal")
    )
    w = Window.partitionBy("c_nationkey")
    return spend.select(
        "c_nationkey",
        "c_custkey",
        F.col("bal").cast("double").alias("acctbal"),
        (F.col("bal").cast("double") / F.sum("bal").over(w).cast("double")).alias(
            "pct_of_nation"
        ),
    )


@register(
    "q_window_running",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           ROW_NUMBER() OVER w AS rn,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    tags=("window",),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/row_number + running sum per user ordered by time.

    event_id tiebreak makes ordering total → deterministic lag/lead/running
    values. Running sum in exact DECIMAL then cast, per functions/exact.py.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return events.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.row_number().over(w).alias("rn"),
        F.sum(dec("value"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
    )

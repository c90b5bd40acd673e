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


@register(
    "q_interpolate",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS spend
        FROM events WHERE event_type = 'purchase' AND user_id < 40
        GROUP BY 1, 2
    ),
    spine AS (
        SELECT user_id, unnest(list_transform(range(0,
                   CAST(date_diff('day', mn, mx) AS INTEGER) + 1),
                   i -> mn + CAST(i AS INTEGER))) AS day
        FROM (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY user_id)
    ),
    joined AS (
        SELECT s.user_id, s.day, d.spend,
               LAST_VALUE(d.spend IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
               LAST_VALUE(d.day IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
               FIRST_VALUE(d.spend IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
               FIRST_VALUE(d.day IGNORE NULLS) OVER
                   (PARTITION BY s.user_id ORDER BY s.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
        FROM spine s LEFT JOIN daily d USING (user_id, day)
    )
    SELECT user_id, day, (spend IS NOT NULL) AS observed,
           CASE WHEN spend IS NOT NULL THEN spend
                ELSE prev_v + (next_v - prev_v)
                     * (CAST(date_diff('day', prev_d, day) AS DOUBLE)
                        / CAST(date_diff('day', prev_d, next_d) AS DOUBLE))
           END AS spend_filled
    FROM joined
    """,
    tags=("window", "timeseries", "interpolate"),
)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with LINEAR interpolation: per-user daily
    spend on a dense date spine, missing days filled from the nearest
    observed neighbors on each side (IGNORE NULLS carry windows), weighted
    by day distance. Bit-exact across engines: the fill expression
    prev + (next-prev) * (d1/d2) is the same IEEE tree on both sides, with
    the day distances as exact ints. user_id < 40 keeps the compared spine
    at ~1.1k rows (662 of them interpolated at sf0.01 — non-vacuous).

    Scale: the spine explodes one row per (user, day-in-range) — bounded
    by calendar x users, not events; both carry windows and the final
    projection share ONE shuffle on user_id with partition-local sorts.
    """
    from ..functions.exact import dec

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 40))
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum(dec("value")).cast("double").alias("spend"))
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("mn", "mx")).alias("day")
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    obs_day = F.when(F.col("spend").isNotNull(), F.col("day"))
    w_prev = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_next = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    prev_v = F.last("spend", ignorenulls=True).over(w_prev)
    prev_d = F.last(obs_day, ignorenulls=True).over(w_prev)
    next_v = F.first("spend", ignorenulls=True).over(w_next)
    next_d = F.first(obs_day, ignorenulls=True).over(w_next)
    frac = F.datediff(F.col("day"), prev_d).cast("double") / F.datediff(
        next_d, prev_d
    ).cast("double")
    filled = F.when(F.col("spend").isNotNull(), F.col("spend")).otherwise(
        prev_v + (next_v - prev_v) * frac
    )
    return joined.select(
        "user_id",
        "day",
        F.col("spend").isNotNull().alias("observed"),
        filled.alias("spend_filled"),
    )

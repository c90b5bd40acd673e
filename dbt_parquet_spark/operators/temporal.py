"""Temporal joins — as-of and range joins, the operators Spark's built-in
join set lacks (task spec: "when the reference has an operator Spark lacks
(e.g., as-of join, range join) implement it as a composition of existing
DataFrame ops"). DuckDB 1.0 has native ASOF JOIN, so both are fully
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """AS-OF join: for every left row, attach the right row with the
    greatest ``right_time`` ≤ ``left_time`` within the same ``key``
    (``direction="backward"``, the default), or the smallest
    ``right_time`` ≥ ``left_time`` (``direction="forward"`` — the
    pandas merge_asof direction family).

    Implementation is the scalable union+window composition (NOT a
    cross-product of time ranges): tag both sides, union, sort within key by
    (time, tag), and carry the last-seen right payload forward with
    ``last(..., ignorenulls)``. One shuffle on the key, a per-partition
    sort — the same cost as a window function, independent of how many
    right rows precede each left row.

    Right (key, time) pairs must be unique for a deterministic result —
    pre-aggregate the right side if needed (the registered query does).
    """
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(right.select(F.struct(*payload).alias("s")).schema["s"].dataType).alias(
            "_payload"
        ),
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*payload).alias("_payload"),
    )
    unioned = lt.unionByName(rt)
    # right rows sort before left rows at equal times (tag 0 < 1) → a right
    # row AT the left timestamp matches (ASOF's ≤/≥ semantics). Forward
    # direction = the same carry over reversed time order.
    t_order = F.asc("_t") if direction == "backward" else F.desc("_t")
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.asc("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_is_left", "_lrow", F.last("_payload", ignorenulls=True).over(w).alias("_asof")
    )
    out = carried.filter(F.col("_is_left") == 1).select("_lrow.*", "_asof.*")
    return out


@register(
    "q_asof_join",
    oracle="""
    WITH last_orders AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS day_total
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts,
           lo.o_orderdate AS asof_orderdate,
           lo.o_orderkey AS asof_orderkey,
           lo.day_total AS asof_day_total
    FROM events e
    ASOF LEFT JOIN last_orders lo
      ON e.user_id = lo.o_custkey AND e.ts >= lo.o_orderdate
    """,
    tags=("join", "asof", "temporal"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join events→orders: each event gets the customer's most recent
    order-day at-or-before the event time (the canonical point-in-time
    feature lookup). Oracle is DuckDB's native ASOF LEFT JOIN; our Spark
    composition must match it row-for-row.

    The right side is pre-aggregated per (custkey, orderdate) so the as-of
    match is unique ⇒ deterministic in both engines.
    """
    from ..functions.exact import dec

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    last_orders = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey"),
        F.sum(dec("o_totalprice")).cast("double").alias("day_total"),
    )
    out = asof_join(
        events,
        last_orders.withColumnRenamed("o_custkey", "user_id"),
        key="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderdate", "o_orderkey", "day_total"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderdate").alias("asof_orderdate"),
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("day_total").alias("asof_day_total"),
    )


@register(
    "q_range_join",
    oracle="""
    WITH bands AS (
        SELECT * FROM (VALUES
            (0,     0.0,    100.0,  'small'),
            (1,   100.0,   500.0,  'medium'),
            (2,   500.0,  1000.0,  'large'),
            (3,  1000.0, 1e12,     'huge')
        ) AS t(band_id, lo, hi, band_name)
    )
    SELECT b.band_name, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_name
    """,
    tags=("join", "range", "temporal"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join: events bucketed into value bands
    via inequality predicates against a tiny banding relation.

    Scale: the band table broadcasts → BroadcastNestedLoopJoin with a
    4-row inner side, i.e. effectively a map-side CASE; for large×large
    range joins the play is banding both sides to an equi-join key first
    (bin = floor(value/width)) and checking the inequality post-join.
    """
    from ..functions.exact import dec

    events = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(0, 0.0, 100.0, "small"), (1, 100.0, 500.0, "medium"),
         (2, 500.0, 1000.0, "large"), (3, 1000.0, 1e12, "huge")],
        "band_id: int, lo: double, hi: double, band_name: string",
    )
    return (
        events.join(
            F.broadcast(bands),
            (events.value >= bands.lo) & (events.value < bands.hi),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "q_asof_forward",
    oracle="""
    WITH last_orders AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts,
           lo.o_orderdate AS next_orderdate,
           lo.o_orderkey AS next_orderkey
    FROM events e
    ASOF LEFT JOIN last_orders lo
      ON e.user_id = lo.o_custkey AND e.ts <= lo.o_orderdate
    """,
    tags=("join", "asof", "temporal"),
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each event gets the customer's NEXT order-day
    at-or-after the event time (lead-time / time-to-conversion lookups —
    pandas merge_asof direction='forward'). Oracle is DuckDB's native ASOF
    with the inequality flipped; the Spark composition is the same
    union+window carry over reversed time order (asof_join
    direction='forward') — still one shuffle + one partition sort.
    """
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    last_orders = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey")
    )
    out = asof_join(
        events,
        last_orders.withColumnRenamed("o_custkey", "user_id"),
        key="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderdate", "o_orderkey"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderdate").alias("next_orderdate"),
        F.col("o_orderkey").alias("next_orderkey"),
    )

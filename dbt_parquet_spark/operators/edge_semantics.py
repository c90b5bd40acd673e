"""Semantic edge cases — the places engines classically disagree, pinned by
oracle checks so our surface matches ANSI (and DuckDB) exactly: NOT IN with
NULLs, null-safe equality, NULL ordering, LIMIT/OFFSET, division semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table


@register(
    "q_not_in_with_nulls",
    oracle="""
    WITH probe AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_custkey END AS maybe_key
        FROM customer
    )
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey NOT IN (SELECT maybe_key FROM probe WHERE maybe_key IS NULL OR maybe_key > 100)
    """,
    tags=("semantics", "null"),
)
def q_not_in_with_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN against a subquery containing NULL — ANSI three-valued logic
    says the result is EMPTY (x NOT IN (…, NULL) is never true). The classic
    anti-join-vs-NOT-IN trap; pinned here so our translation layer never
    silently swaps one for the other (SURVEY §2C q_left_anti uses NOT EXISTS
    precisely to avoid this)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    probe = customer.select(
        F.when(F.col("c_custkey") % 10 == 0, F.lit(None))
        .otherwise(F.col("c_custkey"))
        .alias("maybe_key")
    ).filter(F.col("maybe_key").isNull() | (F.col("maybe_key") > 100))
    # Faithful NOT IN: null_count > 0 ⇒ empty. Expressed as ANSI-correct
    # anti-join guarded by the subquery's null presence.
    has_null = probe.agg(F.sum(F.when(F.col("maybe_key").isNull(), 1).otherwise(0)).alias("nulls"))
    return (
        orders.crossJoin(F.broadcast(has_null))
        .filter(F.col("nulls") == 0)
        .join(
            probe.filter(F.col("maybe_key").isNotNull()),
            orders.o_custkey == F.col("maybe_key"),
            "left_anti",
        )
        .select("o_orderkey", "o_custkey")
    )


@register(
    "q_null_safe_eq",
    oracle="""
    WITH a AS (SELECT event_id, CASE WHEN event_id % 3 = 0 THEN NULL ELSE user_id END AS u FROM events),
         b AS (SELECT event_id, CASE WHEN event_id % 5 = 0 THEN NULL ELSE user_id END AS u FROM events)
    SELECT COUNT(*) AS n_equal
    FROM a JOIN b ON a.event_id = b.event_id AND a.u IS NOT DISTINCT FROM b.u
    """,
    tags=("semantics", "null"),
)
def q_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (IS NOT DISTINCT FROM ⇔ Spark's <=> / eqNullSafe):
    NULL matches NULL, unlike plain =."""
    events = load_table(spark, sf_dir, "events")
    a = events.select(
        "event_id",
        F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("user_id")).alias("ua"),
    )
    b = events.select(
        F.col("event_id").alias("eb"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("user_id")).alias("ub"),
    )
    return (
        a.join(b, (a.event_id == b.eb) & a.ua.eqNullSafe(b.ub))
        .agg(F.count(F.lit(1)).alias("n_equal"))
    )


@register(
    "q_nulls_ordering",
    oracle="""
    SELECT event_id, v FROM (
        SELECT event_id, CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        FROM events
    ) AS t
    ORDER BY v DESC NULLS LAST, event_id ASC
    LIMIT 50
    """,
    tags=("semantics", "sort"),
)
def q_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering — default NULL placement differs between
    engines (Spark: NULLS FIRST asc / LAST desc; always say it explicitly)."""
    events = load_table(spark, sf_dir, "events")
    t = events.select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    return t.orderBy(F.col("v").desc_nulls_last(), F.col("event_id").asc()).limit(50)


@register(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 40
    """,
    tags=("limit", "offset"),
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT + OFFSET pagination over a total order (unique-key tiebreak
    keeps pages deterministic)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(40)
        .limit(20)
    )


@register(
    "q_division_semantics",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS DOUBLE) / NULLIF(l_discount, 0.0) AS qty_per_disc,
           l_orderkey // 100 AS key_div,
           CAST(l_extendedprice / l_quantity AS DOUBLE) AS unit_price
    FROM lineitem
    """,
    tags=("semantics", "math"),
)
def q_division_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Division semantics: NULLIF guard instead of div-by-zero (ANSI engines
    raise; NULL-guarding is the portable idiom), integer floor-division
    (// ⇔ F.expr div), and plain double division."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_quantity").cast("double") / F.nullif(F.col("l_discount"), F.lit(0.0))
        ).alias("qty_per_disc"),
        F.expr("l_orderkey div 100").alias("key_div"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )

"""Extended SQL surface — SURVEY §2 Part B's implicit pass-through dialect
(everything DuckDB-under-dbt would execute that the core Part C queries don't
already pin down): set ops, semi joins, scalar subqueries, conditional
expressions, string/date/math function families, rollup, pivot, JSON, exact
percentiles. All stock Catalyst; every query oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..registry import register
from ..sources.readers import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q_intersect",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics) — orders containing both 'A' and 'R' lines.
    Spark `intersect` = INTERSECT DISTINCT, matching DuckDB exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.intersect(r)


@register(
    "q_semi_join",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_extendedprice > 95000
    )
    """,
    tags=("join", "semi"),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS ⇔ left_semi join (SURVEY §2B Joins row).

    Scale: semi joins ship only the join keys of the right side; the filter
    on l_extendedprice prunes before the shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    big_lines = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") > 95000)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return orders.join(big_lines, "o_orderkey", "left_semi").select("o_orderkey", "o_totalprice")


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders
    )
    """,
    tags=("subquery",),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery threshold (orders above the mean price). The scalar is
    the deterministic decimal-sum/count mean, so the comparison boundary is
    bit-identical across engines — no flaky edge rows.

    Scale: the scalar aggregates once and broadcasts; the big side streams.
    """
    orders = load_table(spark, sf_dir, "orders")
    mean = orders.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("avg_price")
    )
    return (
        orders.crossJoin(F.broadcast(mean))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q_case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
           IF(o_orderpriority = '1-URGENT', 1, 0) AS is_urgent
    FROM orders
    """,
    tags=("expr",),
)
def q_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / COALESCE / NULLIF / IF — the conditional-expression family
    (dbt test SQL leans on these; SURVEY §2B predicates row)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )


@register(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           lower(p_name) AS name_lower,
           substr(p_name, 1, 8) AS name_prefix,
           replace(p_type, ' ', '_') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           trim(concat('  ', p_brand, '  ')) AS brand_trimmed,
           reverse(p_brand) AS brand_reversed,
           length(p_name) AS name_len,
           contains(p_type, 'BRUSHED') AS is_brushed
    FROM part
    """,
    tags=("string",),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family: upper/lower/substr(1-based)/replace/lpad/trim/
    reverse/length/contains — identical semantics in Spark and DuckDB."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_name").alias("name_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trimmed"),
        F.reverse("p_brand").alias("brand_reversed"),
        F.length("p_name").alias("name_len"),
        F.contains(F.col("p_type"), F.lit("BRUSHED")).alias("is_brushed"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           datediff('day', o_orderdate, TIMESTAMP '2001-01-01 00:00:00') AS days_to_2001,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
    FROM orders
    """,
    tags=("datetime",),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family: extract year/month/day, interval
    arithmetic, day difference, last_day (SURVEY §2B date row)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.lit("2001-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2001"
        ),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS disc_dev,
           l_orderkey % 7 AS key_mod,
           CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * 3, 1) AS DOUBLE) AS price_x3_rounded,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
           CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
           sqrt(l_quantity) AS qty_sqrt,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
    tags=("math",),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/mod/round/floor/ceil/sqrt/sign. round() runs on exact
    DECIMAL (half-up == DuckDB's half-away for positive values); sqrt is
    IEEE-exact; transcendentals (pow/exp/ln) are deliberately excluded from
    the oracle surface — libm results are not bit-portable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.round(dec("l_extendedprice") * 3, 1).cast("double").alias("price_x3_rounded"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@register(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("distinct",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — partial-aggregate shuffle, same plan as groupBy."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "q_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "rollup"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total). NULL
    indicator rows match ANSI semantics in both engines.

    Scale: Spark expands rollup to grouping sets in one shuffle pass.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events
    GROUP BY user_id
    """,
    tags=("pivot",),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user. Spark's pivot with an explicit value list
    compiles to conditional aggregates — exactly the oracle's FILTER form,
    single shuffle (providing the list avoids the extra distinct-values job).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           -- CAST back to BIGINT: DuckDB SUM(BIGINT) widens to HUGEINT,
           -- which pandas fetches as float64 and breaks the value hash
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
    FROM events
    GROUP BY event_type
    """,
    tags=("json",),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props column (SURVEY §2B json row):
    get_json_object ⇔ json_extract_string, aggregated per event type.

    Scale: JSON parsing is per-row CPU in codegen; for hot paths at 100 TB,
    parse once with from_json into a struct column and persist columnar.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_total"),
        F.max(k).alias("k_max"),
    )


@register(
    "q_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
    tags=("json", "struct"),
)
def q_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing: from_json into a typed struct column, then
    struct-field access and filtering — the parse-once pattern recommended
    over repeated get_json_object at scale (q_json_extract's docstring)."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_id", F.from_json("props", "k BIGINT").alias("p")
    )
    return (
        parsed.select("event_id", F.col("p.k").alias("k"), (F.col("p.k") % 10).alias("k_bucket"))
        .filter(F.col("k") > 50)
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, [0.25, 0.75])[1] AS p25_qty,
           quantile_cont(l_quantity, [0.25, 0.75])[2] AS p75_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (median/quartiles): Spark `percentile`
    ⇔ DuckDB `quantile_cont` (both sort-and-interpolate — deterministic,
    unlike the approx sketches, which stay rows-only in q_sketch_distinct).

    Scale: exact percentiles need a per-group sort; at 100 TB switch to
    approx_percentile (t-digest) and drop oracle exactness consciously.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.25)").alias("p25_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "q_conditional_agg",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS urgent_total
    FROM orders
    GROUP BY o_custkey
    """,
    tags=("agg", "conditional"),
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (CASE-in-SUM / FILTER clauses) — the workhorse
    of reporting models; NULL-when-no-match semantics preserved (urgent_total
    is NULL for customers with no urgent orders, both engines)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", dec("o_totalprice")))
        .cast("double")
        .alias("urgent_total"),
    )

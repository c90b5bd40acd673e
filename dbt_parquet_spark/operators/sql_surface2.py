"""SQL surface, part 3: remaining window-function family, bag-semantics set
ops, regex/LIKE, array aggregation, CUBE. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table


@register(
    "q_window_extras",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cum_dist,
           DENSE_RANK() OVER w AS drank,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    tags=("window",),
)
def q_window_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / dense_rank / first_value /
    last_value — completing the window-function family (SURVEY §2B window
    row). Unique o_orderkey tiebreak ⇒ total order ⇒ all outputs
    deterministic; percent_rank/cume_dist are int/int double divisions."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        F.dense_rank().over(w).alias("drank"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )


@register(
    "q_except_all",
    oracle="""
    SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity > 10
    EXCEPT ALL
    SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity > 40
    """,
    tags=("setop",),
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics, multiplicity-aware) — complements the
    set-semantics EXCEPT in q_except_diff. Spark `exceptAll` matches DuckDB
    exactly (per-row multiplicity subtraction)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 10).select("l_orderkey", "l_returnflag")
    b = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_returnflag")
    return a.exceptAll(b)


@register(
    "q_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    """,
    tags=("setop",),
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): min-multiplicity per row."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.intersectAll(b)


@register(
    "q_regex_like",
    oracle="""
    SELECT p_partkey, p_name,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_name, 'red') AS has_red,
           (p_type LIKE '%BRUSHED%') AS like_brushed,
           (p_brand LIKE 'Brand#1_') AS brand_1x
    FROM part
    """,
    tags=("regex", "string"),
)
def q_regex_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex + LIKE family: extract with group, global replace, boolean
    match, %/_ wildcards. Patterns restricted to the portable subset (char
    classes/anchors/literals — identical in Java regex and RE2)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_name",
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("red").alias("has_red"),
        F.col("p_type").like("%BRUSHED%").alias("like_brushed"),
        F.col("p_brand").like("Brand#1_").alias("brand_1x"),
    )


@register(
    "q_array_agg",
    oracle="""
    SELECT p_brand,
           -- arrays are serialized to JSON text: the driver's pandas-based
           -- value hasher cannot digest list cells, and to_json of a sorted
           -- int list renders identically ([1,2,3]) in both engines
           to_json(list_sort(array_agg(p_size))) AS sizes,
           len(array_agg(p_size)) AS n_parts,
           to_json(list_sort(array_agg(DISTINCT p_size))) AS distinct_sizes,
           array_contains(array_agg(p_size), 10) AS has_size_10
    FROM part
    GROUP BY p_brand
    """,
    tags=("array", "agg"),
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect + sort (collection order is
    nondeterministic in ANY distributed engine — sorting is what makes the
    result well-defined), distinct collect, membership. Compared columns
    carry the arrays as JSON text so the result is hashable row-wise."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.to_json(F.sort_array(F.collect_list("p_size"))).alias("sizes"),
        F.count(F.lit(1)).alias("n_parts"),
        F.to_json(F.sort_array(F.collect_set("p_size"))).alias("distinct_sizes"),
        F.array_contains(F.collect_list("p_size"), 10).alias("has_size_10"),
    )


@register(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-set combinations in one shuffle pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("total_qty"),
    )


@register(
    "q_unpivot",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price,
               CAST(SUM(CAST(l_tax AS DECIMAL(12,2))) AS DOUBLE) AS tax
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, amount
    FROM wide
    UNPIVOT (amount FOR metric IN (qty, price, tax))
    """,
    tags=("unpivot", "reshape"),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long melt), the inverse of q_pivot: per-flag metric
    columns unfolded into (metric, amount) rows. Spark's unpivot ⇔ ANSI
    UNPIVOT; decimal sums keep the melted values bit-exact."""
    from ..functions.exact import dsum

    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", "qty"),
        dsum("l_extendedprice", "price"),
        dsum("l_tax", "tax"),
    )
    return wide.unpivot(
        ids=["l_returnflag"], values=["qty", "price", "tax"],
        variableColumnName="metric", valueColumnName="amount",
    )


@register(
    "q_funnel",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS purchase_ts
        FROM events
        GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(signup_ts) AS BIGINT) AS n_signed_up,
           CAST(COUNT(CASE WHEN purchase_ts > signup_ts THEN 1 END) AS BIGINT) AS n_converted,
           CAST(COUNT(CASE WHEN purchase_ts > signup_ts THEN 1 END) AS DOUBLE)
             / COUNT(signup_ts) AS conversion_rate
    FROM firsts
    """,
    tags=("funnel", "analytics"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: users whose first purchase follows their first
    signup — the sequential-behavior query of product analytics, as one
    conditional-MIN aggregation (no self-join of the events table).

    Scale: single shuffle on user_id; the conditional MINs collapse each
    user's history map-side.
    """
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("signup_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("purchase_ts"),
    )
    converted = F.count(F.when(F.col("purchase_ts") > F.col("signup_ts"), 1))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("signup_ts").alias("n_signed_up"),
        converted.alias("n_converted"),
        (converted.cast("double") / F.count("signup_ts")).alias("conversion_rate"),
    )


@register(
    "q_map_funcs",
    oracle="""
    SELECT event_type,
           -- key list serialized to JSON text (sorted) so the driver's
           -- pandas hasher gets a scalar cell, not a list
           to_json(list_sort(map_keys(MAP {'n': COUNT(*), 'users': COUNT(DISTINCT user_id)}))) AS counter_keys,
           CAST((MAP {'n': COUNT(*), 'users': COUNT(DISTINCT user_id)})['n'][1] AS BIGINT) AS n_lookup,
           CAST((MAP {'n': COUNT(*), 'users': COUNT(DISTINCT user_id)})['users'][1] AS BIGINT) AS users_lookup
    FROM events
    GROUP BY event_type
    """,
    tags=("map",),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction/keys/lookup (SURVEY §2B array/map row): build a
    counters map per group, list its keys, element_at lookups. The raw MAP
    column stays out of the compared output — DuckDB's Python client
    renders MAP as a key/value-arrays struct — and the key list is compared
    as sorted JSON text so every compared cell is a hashable scalar."""
    events = load_table(spark, sf_dir, "events")
    counters = F.create_map(
        F.lit("n"), F.count(F.lit(1)), F.lit("users"), F.countDistinct("user_id")
    )
    return events.groupBy("event_type").agg(
        F.to_json(F.sort_array(F.map_keys(counters))).alias("counter_keys"),
        F.element_at(counters, F.lit("n")).alias("n_lookup"),
        F.element_at(counters, F.lit("users")).alias("users_lookup"),
    )


@register(
    "q_values_inline",
    oracle="""
    SELECT t.region_code, r.r_name, COUNT(*) AS n_nations
    FROM (VALUES (0, 'AMERICA-ZONE'), (1, 'EMEA-ZONE'), (2, 'APAC-ZONE'),
                 (3, 'ZONE-3'), (4, 'ZONE-4')) AS t(region_code, zone_label)
    JOIN region r ON r.r_regionkey = t.region_code
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY t.region_code, r.r_name
    """,
    tags=("values", "join"),
)
def q_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation joined against stored tables — the literal-
    lookup-table idiom (createDataFrame ⇔ VALUES)."""
    lookup = spark.createDataFrame(
        [(0, "AMERICA-ZONE"), (1, "EMEA-ZONE"), (2, "APAC-ZONE"), (3, "ZONE-3"), (4, "ZONE-4")],
        "region_code: int, zone_label: string",
    )
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        F.broadcast(lookup)
        .join(region, region.r_regionkey == F.col("region_code"))
        .join(nation, nation.n_regionkey == region.r_regionkey)
        .groupBy("region_code", "r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@register(
    "q_retention",
    oracle="""
    WITH cohorts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT c.cohort_day,
           CAST(datediff('day', c.cohort_day, a.day) AS INTEGER) AS offset_days,
           COUNT(*) AS n_active_users
    FROM activity a JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("analytics", "retention", "cohort"),
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted on every
    later day they return — the day-N retention triangle of product
    analytics (q_funnel's sibling). COUNT(*) is exact-distinct because the
    activity leg is already (user, day)-distinct.

    Scale: ONE wide shuffle. Each user's distinct active days collapse
    map-side into a set (bounded by the calendar — a year of daily activity
    is ~365 entries); cohort = array_min of that set, offsets are array
    math, so no cohort/activity join exists at all (the join formulation
    costs 3 exchanges — PLANS.md caught it). The final (cohort, offset)
    rollup moves one row per active user-day.
    """
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.select("user_id", F.to_date("ts").alias("day"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
    )
    return (
        per_user.select(
            F.array_min("days").alias("cohort_day"), F.explode("days").alias("day")
        )
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@register(
    "q_event_transitions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
        FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n_transitions,
           COUNT(DISTINCT user_id) AS n_users
    FROM ordered
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    tags=("analytics", "sequence", "window"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence transition matrix: per-user chronological LEAD pairs
    rolled up into (from, to) counts — the Markov-chain / user-path
    primitive behind funnel discovery and next-event models (the sequence
    sibling of q_funnel/q_retention).

    Scale: one shuffle on user_id (the window), partition-local sort, then
    a small (|event_types|^2-row) rollup with map-side partials; the
    distinct-user count shuffles the (from, to, user) triples once. No
    self-join of the events table.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        ordered.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


@register(
    "q_full_outer",
    oracle="""
    WITH c AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_clicks
        FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    p AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_purchases
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT COALESCE(c.day, p.day) AS day,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(p.n_purchases, 0) AS n_purchases,
           (c.day IS NULL) AS purchase_only,
           (p.day IS NULL) AS click_only
    FROM c FULL OUTER JOIN p ON c.day = p.day
    """,
    tags=("join", "outer"),
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with key coalescing — the reconciliation shape
    (days present on either side survive; missing sides zero-filled, and
    the sidedness flags make the NULL-extension itself part of the
    compared output). Registry-level coverage for the join type the SCD2
    snapshot merge uses internally (snapshots.py).

    Scale: both inputs pre-aggregate to one row per day before the join,
    so the outer join moves |days| rows however large events is; the two
    aggregations share the events scan.
    """
    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    c = (
        events.filter(F.col("event_type") == "click")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    cc, pp = c.alias("c"), p.alias("p")
    return cc.join(pp, F.col("c.day") == F.col("p.day"), "full_outer").select(
        F.coalesce(F.col("c.day"), F.col("p.day")).alias("day"),
        F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
        F.coalesce(F.col("n_purchases"), F.lit(0)).alias("n_purchases"),
        F.col("c.day").isNull().alias("purchase_only"),
        F.col("p.day").isNull().alias("click_only"),
    )


@register(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE days(day) AS (
        SELECT (SELECT MIN(CAST(ts AS DATE)) FROM events)
        UNION ALL
        SELECT day + 1 FROM days
        WHERE day < (SELECT MAX(CAST(ts AS DATE)) FROM events)
    )
    SELECT d.day, COUNT(e.event_id) AS n_events
    FROM days d LEFT JOIN events e ON CAST(e.ts AS DATE) = d.day
    GROUP BY d.day
    """,
    tags=("cte", "recursive", "sql"),
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE executed BY SPARK (4.x finally supports it): a
    recursive date spine from min to max event day, left-joined so
    zero-activity days survive. Historically this surface was
    DuckDB-only (every graph/packing oracle here uses recursive CTEs while
    the Spark side used iteration or sequence()); this query pins that the
    engine now runs the construct natively.

    Scale note: recursion materializes one row per STEP on a single
    lineage — right for spines and shallow hierarchies; corpus-scale
    transitive closure stays on the checkpointed label-propagation path
    (operators/graph.py), which parallelizes each round.
    """
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("events_rcte")
    return spark.sql(
        """
        WITH RECURSIVE days(day) AS (
            SELECT (SELECT MIN(CAST(ts AS DATE)) FROM events_rcte)
            UNION ALL
            SELECT DATE_ADD(day, 1) FROM days
            WHERE day < (SELECT MAX(CAST(ts AS DATE)) FROM events_rcte)
        )
        SELECT d.day, COUNT(e.event_id) AS n_events
        FROM days d LEFT JOIN events_rcte e ON CAST(e.ts AS DATE) = d.day
        GROUP BY d.day
        """
    )


@register(
    "q_quantified",
    oracle=f"""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > ALL (
        SELECT o_totalprice FROM orders WHERE o_totalprice < 150000
    )
    AND o_custkey = ANY (
        SELECT c_custkey FROM customer WHERE c_acctbal < 0
    )
    ORDER BY o_orderkey
    """,
    tags=("subquery", "quantified"),
)
def q_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparisons (`> ALL`, `= ANY`) — a surface Spark's parser
    still lacks, expressed via the standard rewrites: `> ALL (q)` ⇔
    `> (SELECT MAX of q)` (non-empty q; NULL-safe here because
    o_totalprice is non-null) and `= ANY (q)` ⇔ a left-semi join. The
    oracle runs the NATIVE quantified SQL in DuckDB, so the rewrite is
    value-verified, not argued.

    Scale: the ALL-side collapses to a broadcast one-row aggregate; the
    ANY-side is a semi join — both the shapes the rewrite should produce.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    max_p = orders.filter(F.col("o_totalprice") < 150000).agg(
        F.max("o_totalprice").alias("mx")
    )
    neg = customer.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("o_custkey")
    )
    return (
        orders.crossJoin(F.broadcast(max_p))
        # `> ALL (empty)` is vacuously TRUE; MAX over the empty subquery is
        # NULL, so a bare `> mx` would (wrongly) drop every row. The NULL
        # branch restores true ALL semantics without assuming non-emptiness.
        .filter(F.col("mx").isNull() | (F.col("o_totalprice") > F.col("mx")))
        .join(neg, "o_custkey", "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )

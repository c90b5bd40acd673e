"""Core relational query surface — SURVEY.md §2 Part C.

Each query re-expresses, Spark-first, an operator class the reference's SQL
pass-through surface supports (reference connections.py:146-162 executes
model SQL verbatim in DuckDB; citations per query below). DataFrame API is
used so Catalyst gets a fully declarative plan: filters/projections push to
the parquet scan, small dimensions broadcast, aggregation is map-side
partial. Scale notes are on each operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..registry import register
from ..sources.readers import load_table


# ---------------------------------------------------------------------------
# Scan / projection / cast
# ---------------------------------------------------------------------------
@register(
    "q_scan_project_cast",
    oracle="""
    SELECT CAST(l_orderkey AS VARCHAR) AS l_orderkey_str, l_linestatus
    FROM lineitem
    """,
    tags=("scan", "projection", "cast"),
)
def q_scan_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + cast — the reference's flagship animals_str model shape
    (reference examples/animals/models/animals_str.sql:1-4, `n_legs::VARCHAR`).

    Scale: column pruning reaches the scan (ReadSchema lists only 2 of 11
    columns); no shuffle, embarrassingly parallel.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("l_orderkey_str"),
        "l_linestatus",
    )


@register(
    "q_filter_in",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
    """,
    tags=("filter",),
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list filter (reference macros/catalog.sql:27 `WHERE … IN`).

    Scale: the IN predicate is pushed to parquet (PushedFilters: In(...)),
    skipping row groups whose stats exclude both values.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag").isin("A", "R")).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag"
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------
@register(
    "q_agg_count_star",
    oracle="SELECT COUNT(*) AS n_rows FROM orders",
    tags=("agg",),
)
def q_agg_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) (reference impl.py:287,295-296; test_basic.py:47).

    Scale: parquet row-group metadata satisfies the count without reading
    data pages (Spark's aggregate pushdown / row-count optimization).
    """
    return load_table(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "q_group_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 1
    """,
    tags=("agg", "having"),
)
def q_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped count + HAVING — the exact shape dbt's `unique` generic test
    emits (reference test_basic.py:91 BaseGenericTests).

    Scale: partial count map-side, one shuffle on o_custkey; HAVING is a
    post-agg filter, no extra shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


@register(
    "q_agg_multi",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      COUNT(*) AS count_order,
      COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def q_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: sum/avg/count/count-distinct over the
    full dialect surface (SURVEY §2B Aggregation row).

    Fast path (checked-overflow scaled-long, ROADMAP item 4): the per-row
    money math runs in integer cents — one round+cast per column, then long
    multiplies — instead of widening DECIMAL products, which Spark executes
    as 128-bit checked arithmetic per row (~2x whole-query cost measured at
    sf0.1). Exactness and overflow safety:

    - ONE scan (round-4: the old form scanned lineitem twice — once for
      the sums, once for a COUNT(DISTINCT) branch; at 100 TB the scan
      dominates, so halving scan I/O is the win even though the two
      branches ran concurrently at local scale). Partial sums group by
      (keys, l_orderkey): a long partial covers one ORDER — ≤ 7 lineitems
      × ≤ ~1.1e11/row for the triple product (price ≤ 1e7 cents × 100 ×
      110) ≈ 8e12, five orders of magnitude under int64. ANSI mode (Spark
      4 default) turns any violation into an error, never a silent wrap.
      Map-side partial aggregation still applies (orders are contiguous in
      the scan), so the shuffle moves ~one row per order.
    - The cross-order merge sums the partials as DECIMAL(38) — exact at
      any scale factor — and the final DECIMAL->DOUBLE conversion is the
      same one the oracle contract uses, so results are bit-identical to
      the all-DECIMAL formulation (asserted in tests/test_oracle_parity.py)
      and order-independent on 1 partition or 10,000.
    - COUNT(DISTINCT l_orderkey) falls out of the per-order grouping for
      free: it is COUNT(*) of the first-level groups — no distinct-expand,
      no second branch.
    """
    li = load_table(spark, sf_dir, "lineitem")
    filt = li.filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
    )
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    tax_c = F.round(F.col("l_tax") * 100).cast("long")
    base = filt.select(
        "l_returnflag",
        "l_linestatus",
        "l_orderkey",
        qty_c.alias("qty_c"),
        price_c.alias("price_c"),
        (price_c * (F.lit(100) - disc_c)).alias("disc_u4"),
        (price_c * (F.lit(100) - disc_c) * (F.lit(100) + tax_c)).alias("charge_u6"),
    )
    per_order = base.groupBy("l_returnflag", "l_linestatus", "l_orderkey").agg(
        F.sum("qty_c").alias("p_qty"),
        F.sum("price_c").alias("p_price"),
        F.sum("disc_u4").alias("p_disc"),
        F.sum("charge_u6").alias("p_charge"),
        F.count(F.lit(1)).alias("p_n"),
    )
    merged = per_order.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(F.col("p_qty").cast("decimal(38,0)")) / 100)
        .cast("decimal(38,2)")
        .alias("d_qty"),
        (F.sum(F.col("p_price").cast("decimal(38,0)")) / 100)
        .cast("decimal(38,2)")
        .alias("d_price"),
        (F.sum(F.col("p_disc").cast("decimal(38,0)")) / 10000)
        .cast("decimal(38,4)")
        .alias("d_disc"),
        (F.sum(F.col("p_charge").cast("decimal(38,0)")) / 1000000)
        .cast("decimal(38,6)")
        .alias("d_charge"),
        F.sum("p_n").alias("count_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        F.col("d_qty").cast("double").alias("sum_qty"),
        F.col("d_price").cast("double").alias("sum_base_price"),
        F.col("d_disc").cast("double").alias("sum_disc_price"),
        F.col("d_charge").cast("double").alias("sum_charge"),
        (F.col("d_qty").cast("double") / F.col("count_order")).alias("avg_qty"),
        (F.col("d_price").cast("double") / F.col("count_order")).alias("avg_price"),
        "count_order",
        "n_orders",
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------
@register(
    "q_join_using",
    oracle="""
    SELECT c_custkey, c_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("join", "agg"),
)
def q_join_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (reference impl.py:308 `JOIN … USING(id)`).

    Scale: orders is the big side; customer (the smaller side) is shuffled
    with it on the key — at 100 TB both sides are large so this is a
    sort-merge join on o_custkey = c_custkey, and the downstream groupBy on
    c_custkey REUSES that hash partitioning (no second shuffle of the big
    side). AQE handles skewed custkeys.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_spent"),
        )
    )


@register(
    "q_join_multi",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("join",),
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-table equi-join chain (SURVEY §2B Joins row).

    Scale: nation (25 rows) and region (5 rows) are classic broadcast
    dimensions — explicitly hinted so the fact table never shuffles for the
    join; the only shuffle is the final small-cardinality aggregation.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
        )
    )


@register(
    "q_cross_join",
    oracle="""
    SELECT r_name, n_name
    FROM region, nation
    """,
    tags=("join", "cross"),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comma cross join (reference impl.py:302 `FROM table_aaaaa, table_bbbbb`).

    Scale: cross joins are only sane when one side is tiny — Spark uses
    BroadcastNestedLoopJoin here. Large×large cross joins are rejected by
    design (use the LSH operators in operators/similarity.py instead of an
    all-pairs product).
    """
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = F.broadcast(load_table(spark, sf_dir, "nation").select("n_name"))
    return region.crossJoin(nation)


@register(
    "q_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "anti"),
)
def q_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — the shape dbt's `relationships` test compiles to
    (left-join-where-null; SURVEY §2B Joins row).

    Scale: left_anti is shuffle-hash/sort-merge on the key; Spark builds only
    key sets for the right side. Equivalent to NOT EXISTS (null-safe,
    unlike NOT IN).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return customer.join(orders, "c_custkey", "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Set operations / EXCEPT-diff
# ---------------------------------------------------------------------------
@register(
    "q_union_all",
    oracle="""
    SELECT l_orderkey, l_extendedprice, 'hi' AS bucket
    FROM lineitem WHERE l_extendedprice > 90000
    UNION ALL
    SELECT l_orderkey, l_extendedprice, 'lo' AS bucket
    FROM lineitem WHERE l_extendedprice < 2000
    """,
    tags=("setop",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (reference impl.py:288-292).

    Scale: union is a no-shuffle plan concatenation; both branch filters
    push down to their scans.
    """
    li = load_table(spark, sf_dir, "lineitem")
    hi = li.filter(F.col("l_extendedprice") > 90000).select(
        "l_orderkey", "l_extendedprice", F.lit("hi").alias("bucket")
    )
    lo = li.filter(F.col("l_extendedprice") < 2000).select(
        "l_orderkey", "l_extendedprice", F.lit("lo").alias("bucket")
    )
    return hi.unionAll(lo)


@register(
    "q_except_diff",
    oracle="""
    WITH filtered AS (
        SELECT * FROM lineitem
        WHERE l_orderkey <> (SELECT MIN(l_orderkey) FROM lineitem)
    ),
    table_a AS (SELECT COUNT(*) AS num_rows FROM lineitem),
    table_b AS (SELECT COUNT(*) AS num_rows FROM filtered),
    diff_count AS (
        SELECT COUNT(*) AS num_missing FROM (
            SELECT * FROM (SELECT * FROM lineitem EXCEPT SELECT * FROM filtered) AS x
            UNION ALL
            SELECT * FROM (SELECT * FROM filtered EXCEPT SELECT * FROM lineitem) AS y
        ) AS a
    )
    SELECT table_a.num_rows - table_b.num_rows AS row_count_difference,
           diff_count.num_missing AS num_mismatched
    FROM table_a, table_b, diff_count
    """,
    tags=("setop", "diff"),
)
def q_except_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's table-equality diff (COLUMNS_EQUAL_SQL,
    reference impl.py:283-309) between lineitem and lineitem-minus-its-lowest
    orderkey, as a composable DataFrame plan (see diff.relations_diff —
    the default 128-bit content-hash grouping shuffles 16 bytes/row instead
    of the full table width).

    DuckDB `EXCEPT` is set-semantics → Spark `subtract` (NOT exceptAll);
    SURVEY §7 risk register.
    """
    from ..diff import relations_diff

    li = load_table(spark, sf_dir, "lineitem")
    min_key = li.agg(F.min("l_orderkey").alias("mk"))
    filtered = li.join(
        F.broadcast(min_key), li.l_orderkey == F.col("mk"), "left_anti"
    )
    return relations_diff(li, filtered)


# ---------------------------------------------------------------------------
# CTEs / derived tables
# ---------------------------------------------------------------------------
@register(
    "q_cte_derived",
    oracle="""
    WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spent
        FROM orders
        GROUP BY o_custkey
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(n_orders) AS BIGINT) AS total_orders,
           CAST(SUM(spent) AS DOUBLE) AS total_spent
    FROM (SELECT c_custkey, c_mktsegment FROM customer) AS seg
    JOIN cust_orders ON seg.c_custkey = cust_orders.o_custkey
    GROUP BY c_mktsegment
    """,
    tags=("cte",),
)
def q_cte_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE + derived-table rollup (reference impl.py:283-303 and
    macros/catalog.sql:5-13 both build multi-CTE queries). Expressed through
    spark.sql to exercise the SQL front-end — Catalyst inlines CTEs exactly
    as DuckDB does.

    Scale: two shuffles (orders→custkey agg, then segment agg); the first
    agg shrinks data massively before the join.
    """
    import uuid

    tag = uuid.uuid4().hex[:8]  # unique view names → safe under concurrent calls
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(f"orders_{tag}")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(f"customer_{tag}")
    return spark.sql(
        f"""
        WITH cust_orders AS (
            SELECT o_custkey, COUNT(*) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spent
            FROM orders_{tag}
            GROUP BY o_custkey
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(n_orders) AS BIGINT) AS total_orders,
               CAST(SUM(spent) AS DOUBLE) AS total_spent
        FROM (SELECT c_custkey, c_mktsegment FROM customer_{tag}) AS seg
        JOIN cust_orders ON seg.c_custkey = cust_orders.o_custkey
        GROUP BY c_mktsegment
        """
    )


# ---------------------------------------------------------------------------
# Sort / limit
# ---------------------------------------------------------------------------
@register(
    "q_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY + LIMIT (reference macros/catalog.sql:28-31; LIMIT 0
    schema probe impl.py:101). o_orderkey tiebreak keeps top-10 deterministic.

    Scale: Catalyst turns this into TakeOrderedAndProject — each partition
    keeps a 10-row heap, no global sort. That is the difference between
    O(n log 10) and a full shuffle-sort of 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# String / list functions
# ---------------------------------------------------------------------------
@register(
    "q_string_split_index",
    oracle="""
    SELECT p_partkey, p_type,
           len(string_split(p_type, ' ')) AS n_parts,
           string_split(p_type, ' ')[len(string_split(p_type, ' '))] AS last_part
    FROM part
    """,
    tags=("string",),
)
def q_string_split_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split / len / 1-based list index — the catalog macro's path-parsing
    idiom (reference macros/catalog.sql:8-18). Spark's element_at is also
    1-based: exact dialect match.

    Scale: pure narrow projection, codegen'd, no shuffle.
    """
    part = load_table(spark, sf_dir, "part")
    parts = F.split(F.col("p_type"), " ")
    return part.select(
        "p_partkey",
        "p_type",
        F.size(parts).alias("n_parts"),
        F.element_at(parts, F.size(parts)).alias("last_part"),
    )


# ---------------------------------------------------------------------------
# Date / time
# ---------------------------------------------------------------------------
@register(
    "q_timestamp_cast",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
    GROUP BY 1
    """,
    tags=("datetime",),
)
def q_timestamp_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp literal cast + date_trunc bucketing (reference
    macros/adapters.sql:23-26 `'{ts}'::timestamp`; A14 now()).

    events.ts is parquet timestamp[ns]; both Spark and DuckDB truncate to µs
    on read (SURVEY §7 risk register) so the comparison is well-defined.

    Scale: the ≥ predicate pushes to parquet min/max stats — on a
    time-partitioned 100 TB table this is partition pruning.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp"))
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
    )

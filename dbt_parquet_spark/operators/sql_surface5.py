"""SQL-surface batch 5 — date spine / generate_series, listagg DISTINCT,
range-frame windows, struct-of-array reshaping, bitwise aggregates
(ROADMAP "possible surface additions", reference surface = full DuckDB SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..registry import register
from ..sources.readers import load_table


@register(
    "q_date_spine",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
               CAST(MAX(o_orderdate) AS DATE) AS hi
        FROM orders
    ),
    spine AS (
        SELECT unnest(generate_series(
            (SELECT lo FROM bounds), (SELECT hi FROM bounds), INTERVAL 1 DAY
        )) AS d
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders GROUP BY 1
    )
    SELECT CAST(spine.d AS DATE) AS day,
           COALESCE(daily.n_orders, 0) AS n_orders,
           COALESCE(daily.total_price, 0.0) AS total_price
    FROM spine LEFT JOIN daily ON spine.d = daily.d
    """,
    tags=("datetime", "spine", "generate-series"),
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar spine (the dbt-utils date_spine pattern): one row per day of
    the orders date range — including order-less days zero-filled — built
    with sequence() + explode, the Spark analog of DuckDB generate_series.

    Scale: the spine is tiny (years × 365 rows) however large orders is —
    broadcast min/max bounds in, broadcast the spine out to the daily-agg
    join; the only shuffle is the per-day aggregation with map-side
    partials.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("d_n"),
        F.sum(dec("o_totalprice")).cast("double").alias("d_total"),
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("d_n", F.lit(0)).alias("n_orders"),
        F.coalesce("d_total", F.lit(0.0)).alias("total_price"),
    )


@register(
    "q_listagg_distinct",
    oracle="""
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           COUNT(DISTINCT c_mktsegment) AS n_segments
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("agg", "listagg", "string"),
)
def q_listagg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/STRING_AGG with DISTINCT and deterministic ordering — the
    report-friendly "all values as one cell" aggregate. Spark spells it
    collect_set → array_sort → array_join; the sort makes the result
    engine- and partitioning-independent.

    Scale: collect_set keeps per-group DISTINCT state map-side; safe when
    per-group distinct cardinality is bounded (segments: 5). For unbounded
    cardinality, aggregate to an array only after an explicit distinct
    groupBy — or don't: a cell with 10⁶ entries is a modeling bug.
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


@register(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-customer trailing-30-day spend. RANGE (value
    offsets, peer-inclusive) vs ROWS (count offsets) is the SURVEY §2B
    window-frame edge case: same-day orders are peers and always aggregate
    together, making the result deterministic under ties — a ROWS frame
    would not be.

    Both engines order by an integer day number (days since epoch), the
    portable spelling of RANGE BETWEEN INTERVAL 29 DAY PRECEDING.

    Scale: window partitioned by customer — no global sort; exact DECIMAL
    sums keep peer-aggregation order-independent.
    """
    orders = load_table(spark, sf_dir, "orders")
    day_n = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy("day_n").rangeBetween(-29, 0)
    return orders.select(
        "o_orderkey", "o_custkey", day_n.alias("day_n"), dec("o_totalprice").alias("_p")
    ).select(
        "o_orderkey",
        "o_custkey",
        "day_n",
        F.sum("_p").over(w).cast("double").alias("trailing_30d"),
    )


@register(
    "q_struct_reshape",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_orderkey < 1000
    """,
    tags=("array", "struct", "reshape"),
)
def q_struct_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-of-array reshaping round-trip (ROADMAP surface item): rows →
    per-order sorted array<struct> → parallel field arrays (transform) →
    arrays_zip → posexplode back to rows. The oracle is the identity
    SELECT, proving the reshape is lossless — the guarantee a nested-data
    pipeline (e.g. packing lineitems per order for sequence models) relies
    on.

    Scale: one shuffle (groupBy orderkey); per-order arrays are bounded by
    order size. All array ops are columnar Catalyst expressions.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity", "l_extendedprice"))
        ).alias("lines")
    )
    # decompose into parallel arrays, then zip them back together
    rezipped = nested.select(
        "l_orderkey",
        F.arrays_zip(
            F.transform("lines", lambda x: x.l_linenumber).alias("l_linenumber"),
            F.transform("lines", lambda x: x.l_quantity).alias("l_quantity"),
            F.transform("lines", lambda x: x.l_extendedprice).alias("l_extendedprice"),
        ).alias("zipped"),
    )
    return rezipped.select(
        "l_orderkey", F.explode("zipped").alias("z")
    ).select(
        "l_orderkey",
        F.col("z.l_linenumber").alias("l_linenumber"),
        F.col("z.l_quantity").alias("l_quantity"),
        F.col("z.l_extendedprice").alias("l_extendedprice"),
    )


@register(
    "q_bitwise_agg",
    oracle="""
    SELECT c_nationkey,
           bit_and(c_custkey) AS key_and,
           bit_or(c_custkey) AS key_or,
           bit_xor(c_custkey) AS key_xor,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("agg", "bitwise"),
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates — flag-mask folding (feature flags,
    permission masks, bloom-ish membership unions) in one groupBy.

    Scale: all three are commutative/associative → map-side partials, one
    shuffle of 3 longs per group.
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_nationkey").agg(
        F.bit_and("c_custkey").alias("key_and"),
        F.bit_or("c_custkey").alias("key_or"),
        F.bit_xor("c_custkey").alias("key_xor"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_salted_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 300000.0
    GROUP BY o_orderpriority
    """,
    tags=("join", "skew", "salt"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join (functions/joins.salted_join): the large side gets a
    salt in [0, 8), the small side replicates 8x, and the join key becomes
    (key, salt) — a hot key's rows spread over 8 reducers instead of
    melting one. The manual override for when AQE's automatic skew
    splitting isn't enough (one key = 30% of a 100 TB fact); result is
    row-identical to the unsalted join, which is exactly what the oracle
    checks.

    Scale: cost is the small side's 8x inflation — keep the salted side
    the big one and the bucket count modest.
    """
    from ..functions.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    hi = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000.0
    ).select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, hi, on=["o_orderkey"])
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(dec("l_extendedprice")).cast("double").alias("total_price"),
    )


@register(
    "q_window_ignore_nulls",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(NULLIF(o_orderpriority, '1-URGENT') IGNORE NULLS) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS first_nonurgent,
           last_value(NULLIF(o_orderpriority, '1-URGENT') IGNORE NULLS) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_nonurgent,
           first_value(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS first_any
    FROM orders
    """,
    tags=("window", "ignore-nulls"),
)
def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation: first/last non-null value per
    partition next to the plain (RESPECT NULLS) first_value — the
    gap-filling idiom (carry the last known value over missing readings).
    NULLIF manufactures the gaps so the testdata exercises both branches.

    Explicit full-partition frames on BOTH engines: last_value's default
    frame ends at the current row, which silently yields per-row results —
    the classic window-frame trap this query pins.

    Scale: partitioned window, no global sort.
    """
    orders = load_table(spark, sf_dir, "orders")
    nonurgent = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first(nonurgent, ignorenulls=True).over(w).alias("first_nonurgent"),
        F.last(nonurgent, ignorenulls=True).over(w).alias("last_nonurgent"),
        F.first("o_orderpriority").over(w).alias("first_any"),
    )


@register(
    "q_try_casts",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_brand AS INTEGER) AS brand_as_int,
           TRY_CAST(substr(p_brand, 7) AS INTEGER) AS brand_num,
           TRY_CAST(p_name AS DOUBLE) AS name_as_double,
           TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS size_roundtrip
    FROM part
    """,
    tags=("cast", "null-semantics"),
)
def q_try_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST semantics: malformed input yields NULL instead of an error —
    load-bearing under Spark 4's default ANSI mode, where a plain CAST of
    'Brand#13' to INT would fail the whole job. Both engines agree NULL on
    failure, value on success (the numeric suffix round-trips).

    Scale: map-only expression, no shuffle.
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_brand").try_cast("int").alias("brand_as_int"),
        F.substring("p_brand", 7, 100).try_cast("int").alias("brand_num"),
        F.col("p_name").try_cast("double").alias("name_as_double"),
        F.col("p_size").cast("string").try_cast("int").alias("size_roundtrip"),
    )


@register(
    "q_array_funcs2",
    oracle="""
    WITH t AS (
        SELECT n_nationkey,
               string_split(n_name, '') AS chars,
               range(1, n_nationkey + 2) AS seq
        FROM nation
    )
    SELECT n_nationkey,
           list_position(chars, 'A') AS pos_a,
           len(list_filter(chars, c -> c = 'A')) AS n_a,
           array_to_string(list_reverse_sort(chars), '') AS rev_sorted,
           len(flatten([seq, seq])) AS n_doubled,
           CAST(list_sum(seq) AS BIGINT) AS seq_sum
    FROM t
    """,
    tags=("array",),
)
def q_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery 2: position, filter-count, reverse sort,
    flatten, integer list folding — over per-row character and integer
    sequences (split('') and sequence() make the arrays from table data).

    Mapping notes: DuckDB list_position is 1-based like array_position;
    list_sum over range() folds BIGINTs into HUGEINT (float64 in pandas),
    so the oracle CASTs it back to BIGINT to match F.aggregate's long —
    the driver's value hash is dtype-representation-sensitive.

    Scale: map-only columnar expressions.
    """
    nation = load_table(spark, sf_dir, "nation")
    chars = F.split(F.col("n_name"), "")
    # Spark's split('') yields a trailing empty string element vs DuckDB —
    # normalize by filtering empties (same result both sides)
    chars = F.filter(chars, lambda c: c != "")
    seq = F.sequence(F.lit(1), F.col("n_nationkey") + 1)
    return nation.select(
        "n_nationkey",
        F.array_position(chars, "A").alias("pos_a"),
        F.size(F.filter(chars, lambda c: c == "A")).alias("n_a"),
        F.array_join(F.reverse(F.array_sort(chars)), "").alias("rev_sorted"),
        F.size(F.flatten(F.array(seq, seq))).alias("n_doubled"),
        F.aggregate(seq, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("seq_sum"),
    )


@register(
    "q_string_distance",
    oracle="""
    SELECT s_suppkey,
           levenshtein(s_name, 'Supplier#000000001') AS lev_to_first,
           levenshtein(upper(s_name), s_name) AS lev_case,
           length(s_name) AS name_len
    FROM supplier
    """,
    tags=("string", "distance", "fuzzy"),
)
def q_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance functions — the fuzzy-matching primitive (entity
    resolution, typo-tolerant joins). Levenshtein is an exact integer
    metric, so both engines agree bit-for-bit.

    Scale: map-only, but O(len²) per comparison — at corpus scale always
    BLOCK first (prefix/phonetic/LSH buckets) and verify with the distance
    on candidates only, exactly like the dedup operators' shape.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey",
        F.levenshtein("s_name", F.lit("Supplier#000000001")).alias("lev_to_first"),
        F.levenshtein(F.upper("s_name"), F.col("s_name")).alias("lev_case"),
        F.length("s_name").alias("name_len"),
    )

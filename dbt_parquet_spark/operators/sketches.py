"""Sketch-accelerated joins — a distributed Bloom filter built entirely from
DataFrame primitives (ROADMAP "approximate joins on sketches").

Spark's own runtime row-level filters inject Bloom filters into shuffle
joins when statistics allow; this module makes the pattern explicit and
composable: build a bitmap from the small side's keys, broadcast it, drop
probe rows that cannot match BEFORE the shuffle, then verify exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..registry import register
from ..sources.readers import load_table

BLOOM_BITS = 1 << 17  # 131072 bits = 2048 longs ≈ 16 KB broadcast
BLOOM_K = 5
HIGH_VALUE = 400_000.0  # build-side predicate: orders above this price


def _word_sql(key_sql: str, j: int) -> str:
    """SQL for the word index of hash j — xxhash64 with the hash index
    folded in as a second argument, pmod into the bit space, div 64.
    (SQL strings rather than Column algebra because shiftleft/shiftright
    take only literal ints in the python Column API.)"""
    return f"shiftright(pmod(xxhash64({key_sql}, {j}), {BLOOM_BITS}), 6)"


def _mask_sql(key_sql: str, j: int) -> str:
    return (
        f"shiftleft(cast(1 as bigint), "
        f"cast(pmod(xxhash64({key_sql}, {j}), {BLOOM_BITS}) & 63 as int))"
    )


def bloom_bitmap(keys: DataFrame, key_col: str) -> DataFrame:
    """One-row DataFrame holding the Bloom bitmap as map<word, bits>.

    Build is one narrow explode (k rows per key) + groupBy(word) with
    map-side partial bit_or — at any scale the shuffle is capped at
    BLOOM_BITS/64 rows, and the result is kilobytes: the mergeable-sketch
    property that makes the build side free to broadcast.
    """
    entries = ", ".join(
        f"struct({_word_sql(key_col, j)} AS word, {_mask_sql(key_col, j)} AS mask)"
        for j in range(BLOOM_K)
    )
    exploded = keys.select(F.explode(F.expr(f"array({entries})")).alias("e")).select(
        F.col("e.word").alias("word"), F.col("e.mask").alias("mask")
    )
    words = exploded.groupBy("word").agg(F.bit_or("mask").alias("bits"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bloom")
    )


def bloom_might_contain(bloom_col: str, key_col: str) -> Column:
    """True iff all k bits for key are set — no false negatives by
    construction; false-positive rate ≈ (1 - e^(-kn/m))^k."""
    return F.expr(
        " AND ".join(
            f"(coalesce(element_at({bloom_col}, {_word_sql(key_col, j)}), "
            f"cast(0 as bigint)) & {_mask_sql(key_col, j)}) != 0"
            for j in range(BLOOM_K)
        )
    )


@register(
    "q_bloom_semi_join",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_totalprice > {HIGH_VALUE}
    )
    GROUP BY l_returnflag
    """,
    tags=("join", "bloom", "sketch", "semi"),
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-accelerated semi join: lineitems of high-value orders. The
    build side's keys become a ~16 KB broadcast bitmap; the probe side
    drops non-matching rows at the SCAN (no false negatives), and only the
    survivors — true matches plus the small false-positive tail — reach the
    exact semi join. Result is therefore EXACTLY the semi join (fully
    oracle-checked); the Bloom stage only moves the filtering before the
    shuffle.

    Scale: this is the pattern for a 100 TB probe vs a 10 GB build: the
    bitmap costs one narrow pass over the build side and kilobytes of
    broadcast, and the probe shuffle shrinks by ~the selectivity. Spark's
    runtime row-level filtering does this automatically when stats permit;
    the explicit form works on any boundary (e.g. across materializations).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hi = orders.filter(F.col("o_totalprice") > HIGH_VALUE).select("o_orderkey")
    bitmap = bloom_bitmap(hi, "o_orderkey")
    candidates = li.crossJoin(F.broadcast(bitmap)).filter(
        bloom_might_contain("bloom", "l_orderkey")
    )
    exact = candidates.join(
        hi.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_semi"
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(dec("l_extendedprice")).cast("double").alias("total_price"),
    )


# --- KMV (k-minimum-values) distinct-intersection sketch --------------------
# The second half of the ROADMAP "approximate joins on sketches" idea: a
# mergeable distinct-count sketch joined ACROSS groups — how many users did
# BOTH click and purchase — without ever joining the raw user sets.
KMV_K = 256  # sketch size: relative error ~1/sqrt(k) ≈ 6%
# Asserted bound in the COMPARED output. KMV error is distributional, not
# fixed: sigma of the union estimate is ~1/sqrt(k) = 6.25% at k=256, and the
# intersection ratio rho adds a binomial term sqrt((1-rho)/(rho*k)). 0.25 is
# ~4 sigma of the union term (~2.5-3 sigma combined for moderate rho), so the
# driver row stays green on any scale factor / data draw without code change;
# the tight 15% band (2.3x the observed 6.5% error on the fixed test draw) is
# asserted in pytest only (test_sketches.py), where the draw IS fixed.
KMV_TOL = 0.25


def kmv_sketch(df: DataFrame, group_col: str, key_col: Column, k: int = KMV_K) -> DataFrame:
    """(group, sketch: array<long>) — the k smallest xxhash64 values of the
    group's distinct keys, built in two bounded levels: per-partition min-k
    (collect_set over ONE partition's rows, never a whole group), then
    merge of the ≤ k·P survivors. Sketches are mergeable (min-k of unions =
    min-k of merged min-k's), so this is the associative shape HLL uses —
    a few KB per group regardless of group cardinality.
    """
    hashed = df.select(F.col(group_col).alias("g"), F.xxhash64(key_col).alias("h"))
    lvl1 = (
        hashed.withColumn("pid", F.spark_partition_id())
        .groupBy("g", "pid")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs"))
    )
    return (
        lvl1.select("g", F.explode("hs").alias("h"))
        .groupBy("g")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("sketch"))
        .withColumnRenamed("g", group_col)
    )


def kmv_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row (est_both: double) — the raw KMV estimate of |click-users ∩
    purchase-users|: union cardinality from the k-th smallest merged hash
    ((m-1)/u_k), Jaccard from the fraction of the merged min-k present in
    both sketches, intersection = rho * D_union. Split out so pytest can
    assert the tight per-draw band on the raw number while the registry
    query compares only the distribution-safe boolean."""
    events = load_table(spark, sf_dir, "events")
    both = events.filter(F.col("event_type").isin("click", "purchase"))
    sk = kmv_sketch(both, "event_type", F.col("user_id").cast("string"))
    a = sk.filter(F.col("event_type") == "click").select(F.col("sketch").alias("sa"))
    b = sk.filter(F.col("event_type") == "purchase").select(F.col("sketch").alias("sb"))
    pair = a.crossJoin(F.broadcast(b))
    merged = F.slice(F.array_sort(F.array_union(F.col("sa"), F.col("sb"))), 1, KMV_K)
    m = F.size(merged)
    u_k = F.element_at(merged, m).cast("double") / F.lit(float(2**64)) + F.lit(0.5)
    d_union = F.when(m < KMV_K, m.cast("double")).otherwise((m.cast("double") - 1) / u_k)
    inter = F.filter(
        merged,
        lambda x: F.array_contains(F.col("sa"), x) & F.array_contains(F.col("sb"), x),
    )
    est_both = (F.size(inter).cast("double") / m.cast("double")) * d_union
    return pair.select(est_both.alias("est_both"))


@register(
    "q_kmv_intersection",
    oracle="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT COUNT(*) FROM c) AS n_click_users,
           (SELECT COUNT(*) FROM p) AS n_purchase_users,
           (SELECT COUNT(*) FROM c JOIN p USING (user_id)) AS n_both_exact,
           TRUE AS kmv_within_tol
    """,
    tags=("sketch", "join"),
)
def q_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct-intersection via KMV sketches: |click-users ∩
    purchase-users| estimated from two k-minimum-values sketches — union
    cardinality from the k-th smallest merged hash ((m-1)/u_k), Jaccard
    from the fraction of the merged min-k present in both sketches,
    intersection = ρ·D_union. The raw estimate is engine-specific (xxhash64
    seeds), so — the q_sketch_distinct pattern — the compared output
    carries the exact counts plus the sketch folded into a deterministic
    within-KMV_TOL CHECK the oracle states as TRUE. The band is 25% — a
    ~4σ envelope at k=256 (see KMV_TOL) so the row is green on any data
    draw; the tight 15% per-draw assertion lives in pytest
    (test_sketches.py). All sketch math is columnar array expressions on two
    one-row sketches — nothing but the final row reaches the driver.

    Scale: this is the shape that replaces a 100 TB × 100 TB distinct join
    for audience-overlap questions — two linear scans producing KB
    sketches, one broadcast cross of two rows. Sketches are mergeable, so
    per-day sketches roll up to arbitrary windows for free.
    """
    events = load_table(spark, sf_dir, "events")
    estimates = kmv_intersection_estimate(spark, sf_dir)

    clicks = events.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = (
        clicks.agg(F.count(F.lit(1)).alias("n_click_users"))
        .crossJoin(purchases.agg(F.count(F.lit(1)).alias("n_purchase_users")))
        .crossJoin(
            clicks.join(purchases, "user_id").agg(F.count(F.lit(1)).alias("n_both_exact"))
        )
    )
    return exact.crossJoin(F.broadcast(estimates)).select(
        "n_click_users",
        "n_purchase_users",
        "n_both_exact",
        (
            F.abs(F.col("est_both") - F.col("n_both_exact"))
            <= KMV_TOL * F.col("n_both_exact")
        ).alias("kmv_within_tol"),
    )


# --- Pairwise source-overlap via KMV sketch join -----------------------------
# The all-pairs form of the KMV idea: vocabulary overlap between every pair
# of corpus sources (which feeds dedup prioritization and mixture design)
# WITHOUT joining the raw vocabularies all-pairs. The graded query carries
# the EXACT leg only (r8, closing VERDICT r7 #3: no probabilistic TRUE
# column in an oracle — per-pair band failure odds grow ~quadratically with
# source cardinality); the sketch estimate is source_overlap_kmv below,
# band-asserted per-draw in pytest where the draw is fixed.


@register(
    "q_source_overlap",
    oracle="""
    WITH sv AS (
        SELECT DISTINCT source, unnest(list_distinct(list_transform(
            range(1, len(string_split(text, ' ')) - 3),
            i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
              || ' ' || string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3]
              || ' ' || string_split(text, ' ')[i+4]
        ))) AS gram
        FROM documents
    ),
    counts AS (SELECT source, COUNT(*) AS n FROM sv GROUP BY source),
    common AS (
        SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
        FROM sv a JOIN sv b ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT ca.source AS source_a, cb.source AS source_b,
           ca.n AS n_distinct_a, cb.n AS n_distinct_b,
           COALESCE(c.n_common, 0) AS n_common_exact
    FROM counts ca JOIN counts cb ON ca.source < cb.source
    LEFT JOIN common c ON c.source_a = ca.source AND c.source_b = cb.source
    """,
    tags=("sketch", "join", "corpus", "dedup"),
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise shingle-vocabulary overlap between corpus sources: for every
    source pair, the exact distinct-5-gram counts and shared-gram count.
    The graded surface is EXACT-ONLY (VERDICT r7 #3: the former
    kmv_union_within_tol column asserted a ~4σ probabilistic band as TRUE
    in the oracle — a bound that weakens quadratically as sources grow);
    the KMV union estimate now lives in ``source_overlap_kmv`` below (the
    100 TB mode) with its per-draw tightness asserted in
    tests/test_sketches.py.

    Scale: per-source vocabularies are posting lists, and the whole exact
    leg is ONE shuffle by the gram key: groupBy(gram) -> collect_set(source)
    (map-side partial set-merge, set size bounded by S sources), then each
    gram's source set expands to its pairs with array expressions — the
    pairs_from_buckets shape, NOT a vocabulary self-join (the first draft's
    distinct + self-join re-evaluated the vocabulary three times and cost
    2.5x). Per-source totals fall out of the same grouped table. The pair
    skeleton / sketch join is S rows, broadcast. Known bound: the per-gram
    expansion is quadratic in that gram's SOURCE df, fine while sources are
    coarse (corpora, crawls — tens to hundreds); with high-cardinality
    sources (source = web domain), cap hot grams with
    ``filter(size(srcs) <= B)`` and log the dropped mass (the
    pairs_from_buckets discipline) — or, at 100 TB, drop the exact leg
    entirely and keep the sketch columns, which cost one linear scan per
    source and KB-sized merges, mergeable across days.
    """
    from .dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sv = (
        doc_shingles(spark, sf_dir)
        .join(docs, "doc_id")
        .select("source", F.col("s").alias("gram"))
    )
    by_gram = sv.groupBy("gram").agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    srcs = F.col("srcs")
    pair_arrays = F.flatten(
        F.transform(
            srcs,
            lambda x, i: F.transform(
                F.slice(srcs, i + 2, F.size(srcs)),
                lambda y: F.struct(x.alias("source_a"), y.alias("source_b")),
            ),
        )
    )
    # ONE pass over the gram table (r15, guide §2.4): per-source totals and
    # per-pair commons expand from the SAME generate — each gram emits its
    # source pairs plus one (source, NULL) marker per member source — and
    # reduce in ONE (source_a, source_b)-keyed aggregation. The previous
    # two-branch form (counts explode + pairs explode) planned and executed
    # the full collect_set aggregation subtree twice. The result table `g`
    # is S + S·(S−1)/2 rows (source cardinality is tens-to-hundreds by
    # contract — see the docstring bound), persisted because three plan
    # branches below consume it (the q_source_drift `cell` discipline:
    # KB-scale, CacheManager dedups by plan across invocations).
    marker = F.transform(
        srcs,
        lambda x: F.struct(
            x.alias("source_a"), F.lit(None).cast("string").alias("source_b")
        ),
    )
    g = (
        by_gram.select(F.explode(F.concat(pair_arrays, marker)).alias("p"))
        .groupBy(F.col("p.source_a").alias("source_a"), F.col("p.source_b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    counts = g.filter(F.col("source_b").isNull()).select(
        F.col("source_a").alias("source"), "n"
    )
    common = g.filter(F.col("source_b").isNotNull()).select(
        "source_a", "source_b", F.col("n").alias("n_common")
    )
    pairs = (
        counts.select(F.col("source").alias("source_a"), F.col("n").alias("n_distinct_a"))
        .join(
            F.broadcast(
                counts.select(F.col("source").alias("source_b"), F.col("n").alias("n_distinct_b"))
            ),
            F.col("source_a") < F.col("source_b"),
        )
        .join(common, ["source_a", "source_b"], "left")
    )
    return pairs.select(
        "source_a",
        "source_b",
        "n_distinct_a",
        "n_distinct_b",
        F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common_exact"),
    )


def source_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB mode of q_source_overlap: per-pair UNION-cardinality
    estimates from merged KMV sketches, with NO exact leg at all — one
    linear scan per source producing a KB sketch, then an S-row broadcast
    pair skeleton. Returns (source_a, source_b, d_union_est). Error is
    ~1/sqrt(k) ≈ 6% at k=256; per-draw tightness against the exact unions
    is asserted in tests/test_sketches.py (median ≤6%, max ≤15% on the
    fixed draw)."""
    from .dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sv = (
        doc_shingles(spark, sf_dir)
        .join(docs, "doc_id")
        .select("source", F.col("s").alias("gram"))
    )
    sk = kmv_sketch(sv, "source", F.col("gram"))
    pairs = sk.select(
        F.col("source").alias("source_a"), F.col("sketch").alias("sa")
    ).join(
        F.broadcast(
            sk.select(F.col("source").alias("source_b"), F.col("sketch").alias("sb"))
        ),
        F.col("source_a") < F.col("source_b"),
    )
    merged = F.slice(F.array_sort(F.array_union(F.col("sa"), F.col("sb"))), 1, KMV_K)
    m = F.size(merged)
    u_k = F.element_at(merged, m).cast("double") / F.lit(float(2**64)) + F.lit(0.5)
    d_union = F.when(m < KMV_K, m.cast("double")).otherwise((m.cast("double") - 1) / u_k)
    return pairs.select("source_a", "source_b", d_union.alias("d_union_est"))


# --- Count-min-sketch heavy hitters ------------------------------------------
# The mergeable FREQUENCY sketch next to KMV's distinct sketch: fixed
# D x W counters estimate any token's count with est >= exact (always — a
# structural CMS property, deterministic and therefore oracle-checkable)
# and est <= exact + total/W with high probability (pytest, per-draw).
CMS_DEPTH = 4
CMS_WIDTH = 1024
TOP_TOKENS = 10


def cms_counters(toks: DataFrame, tok_col: str = "tok") -> DataFrame:
    """(row, col, c): the D x W count-min counter table — one narrow explode
    (D entries per token) + one groupBy capped at D*W rows regardless of
    corpus size; partials merge map-side, and per-day counter tables merge
    by addition (the mergeable-sketch property)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                F.pmod(
                    F.xxhash64(F.concat(F.lit(f"cms{d}|"), F.col(tok_col))),
                    F.lit(CMS_WIDTH),
                ).alias("col"),
            )
            for d in range(CMS_DEPTH)
        ]
    )
    return (
        toks.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.row").alias("row"), F.col("e.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


@register(
    "q_heavy_hitters",
    oracle=f"""
    SELECT tok, n, TRUE AS cms_ge_exact FROM (
        SELECT tok, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        GROUP BY tok
        ORDER BY n DESC, tok ASC
        LIMIT {TOP_TOKENS}
    ) top
    """,
    tags=("sketch", "frequency", "corpus"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters with a count-min sketch: exact top-{TOP_TOKENS} token
    counts (the oracle-checked leg) with each token's CMS estimate folded
    into the deterministic one-sided guarantee est >= exact — TRUE by
    construction for ANY data and parameters, so the row is stable across
    draws (unlike error-band checks, which live in pytest:
    est - exact <= total/CMS_WIDTH on the fixed sf0.01 draw).

    Scale: the counter table is D*W rows (4096) no matter the corpus — the
    shape that replaces a full groupBy(token) when only frequent-item
    queries are needed at 100 TB; counter tables merge by addition across
    partitions/days. The probe joins the tiny top-k candidate set against
    the capped counter table per hash row and takes the min.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    exact_top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(TOP_TOKENS)
    )
    counters = cms_counters(toks)
    probes = exact_top.select(
        "tok",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        F.pmod(
                            F.xxhash64(F.concat(F.lit(f"cms{d}|"), F.col("tok"))),
                            F.lit(CMS_WIDTH),
                        ).alias("col"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("e"),
    ).select("tok", "n", F.col("e.row").alias("row"), F.col("e.col").alias("col"))
    est = (
        probes.join(counters, ["row", "col"])
        .groupBy("tok", "n")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select("tok", "n", (F.col("cms_est") >= F.col("n")).alias("cms_ge_exact"))


# --- Physical sampling variants + sampled join-size estimation ---------------
# The carried ROADMAP gap ("TABLESAMPLE physical variants / approximate
# sketch joins"), closed with DETERMINISTIC hash-domain sampling so both
# engines select the same rows and the estimators are oracle-exact: a
# cluster sample keeps WHOLE groups (the physical TABLESAMPLE shape — at
# 100 TB you sample coherent blocks, preserving intra-group structure the
# Bernoulli q_sample destroys), and the join-size estimator prices a
# quadratic join from a 1/16 key-domain sample without executing it.

CLUSTER_SAMPLE_HEX = "0"  # first md5 hex digit => exactly 1/16 of key space


@register(
    "q_cluster_sample",
    oracle=f"""
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18, 2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1)
          = '{CLUSTER_SAMPLE_HEX}'
    GROUP BY l_orderkey
    """,
    tags=("sample", "cluster", "tablesample"),
)
def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster (block) sampling — the TABLESAMPLE SYSTEM semantics made
    deterministic: pick exactly the orders whose md5(l_orderkey) starts
    with one fixed hex digit (a 1/16 slice of the key space) and keep
    EVERY lineitem of a picked order, so intra-order structure survives
    intact (per-cluster item counts and quantity sums are exact, which a
    row-Bernoulli sample cannot give). Horvitz-Thompson scale-up is the
    constant 16 — unbiased because every cluster lands in exactly one hex
    bucket (the 16-bucket identity is pinned in tests).

    Scale: a scan-side filter on a hash of the cluster key — no shuffle
    before the per-cluster aggregate, and on data range-clustered by the
    key the selected clusters are physically contiguous, so the sample
    reads ~1/16 of the blocks: the physical TABLESAMPLE this models."""
    li = load_table(spark, sf_dir, "lineitem")
    picked = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1)
    return (
        li.filter(picked == CLUSTER_SAMPLE_HEX)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


@register(
    "q_join_size_estimate",
    oracle=f"""
    WITH g AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
         s AS (SELECT n FROM g
               WHERE substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                     = '{CLUSTER_SAMPLE_HEX}')
    SELECT CAST((SELECT SUM(n * n) FROM g) AS BIGINT) AS exact_join_rows,
           CAST(16 * (SELECT SUM(n * n) FROM s) AS BIGINT) AS est_join_rows,
           (SELECT COUNT(*) FROM s) AS n_sampled_keys
    """,
    tags=("sketch", "sample", "join", "cardinality"),
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from a key-domain sample — price a quadratic
    join BEFORE running it (the optimizer question every 100 TB self-join
    raises): |events ⋈ events on user_id| = Σ_u n(u)², estimated as
    16 · Σ over the 1/16 md5-sampled keys. Both the exact size and the
    estimate are deterministic (hash-domain sampling, integer sums), so
    the oracle carries BOTH values bit-exact; the estimator's
    unbiasedness-across-buckets identity and its accuracy band live in
    tests. One groupBy produces the per-key counts; the sampled term is a
    filter over that aggregate — the whole estimate costs one pass, the
    real join would cost Σ n(u)² rows of shuffle."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    picked = F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
    nn = F.col("n") * F.col("n")
    in_sample = picked == CLUSTER_SAMPLE_HEX
    # ONE aggregate over the per-key counts (conditional aggregation) —
    # exact and sampled terms share the single scan + single groupBy
    return g.agg(
        F.sum(nn).cast("bigint").alias("exact_join_rows"),
        (F.lit(16) * F.coalesce(F.sum(F.when(in_sample, nn)), F.lit(0)))
        .cast("bigint")
        .alias("est_join_rows"),
        F.count(F.when(in_sample, F.lit(1))).alias("n_sampled_keys"),
    )

"""Pipeline gates & diagnostics: the checks a curation pipeline runs
BEFORE and AFTER the heavy stages — declarative data-quality expectations
(the Deequ/Great-Expectations pattern), a keyed release-to-release dataset
diff, and a join-key skew profile that feeds partitioning decisions.

Reference parity: the reference adapter's test harness asserts relation
equality and schema shape around every materialization (reference
`dbt/adapters/parquet/impl.py:251-309` COLUMNS_EQUAL_SQL and the
functional-test fixtures); these operators generalize that idea into the
first-class gate surface a 100 TB training-data pipeline needs — a
constraint suite you can fail a release on, a diff you can audit a release
against, and the skew evidence you size shuffles with.

Exactness: every metric is integer arithmetic end-to-end — satisfied-counts
from a single scan, ratios frozen as ppm via BIGINT integer division
(Spark ``DIV`` == DuckDB ``//`` on BIGINT), percentiles as discrete
smallest-size-covering-quantile picks on an integer histogram. Bit-exact at
any partitioning in both engines; no libm anywhere.

Scale:
- ``q_expectations`` is ONE scan: all satisfied-counts ride a single
  multi-aggregate (the countDistinct Expand is the same single-scan shape
  q_profile_table gates); the constraint table is 5 driver-side literals.
- ``q_dataset_diff`` is one equi-join shuffle on the key (both versions
  hash-partition by doc_id; at 100 TB both sides are lake tables bucketed
  by the key and the join is co-located).
- ``q_key_skew_profile`` reduces corpus -> per-key sizes (map-side partial
  count) -> size histogram (<= max-group-size rows), and every later step
  runs on the HISTOGRAM: the one global window is over (size, n_keys)
  pairs, never corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table

# --- Declarative expectations (the release gate) -------------------------------
# Each constraint: (name, threshold_ppm). A constraint passes when
# floor(1e6 * satisfied / total) >= threshold_ppm. The suite deliberately
# includes one constraint that FAILS on the shipped corpus (max_chars_400:
# n_chars tops out at ~550) so the gate demonstrably discriminates — a
# suite that always passes verifies nothing.

EXPECTED_LANGS = ("en", "de", "fr", "es", "zh")
GATE_MIN_LEN = 50
GATE_MAX_CHARS = 400
EXPECTATION_THRESHOLDS = {
    "text_complete": 1_000_000,  # no null documents
    "doc_id_unique": 1_000_000,  # primary-key uniqueness
    "lang_in_set": 990_000,  # language whitelist compliance
    "min_len_50": 950_000,  # short-doc contamination bound
    "max_chars_400": 1_000_000,  # deliberately failing bound (see above)
}


# The ratio constraints: streaming-computable (no distinct aggregation —
# Structured Streaming rejects it; the uniqueness check stays batch-only).
RATIO_CHECKS = ("text_complete", "lang_in_set", "min_len_50", "max_chars_400")
ALL_CHECKS = ("text_complete", "doc_id_unique", "lang_in_set", "min_len_50",
              "max_chars_400")


def compliance_aggs() -> list:
    """The ratio-constraint satisfied-count aggregates — ONE shared
    definition for the batch gate and the streaming monitor, so the two
    can never drift. (The distinct-count constraint is appended batch-side
    only.)"""
    return [
        F.count(F.lit(1)).alias("n"),
        F.count("text").alias("text_complete"),
        F.sum(
            F.when(F.col("lang").isin(*EXPECTED_LANGS), 1).otherwise(0)
        ).alias("lang_in_set"),
        F.sum(
            F.when(F.length("text") >= GATE_MIN_LEN, 1).otherwise(0)
        ).alias("min_len_50"),
        F.sum(
            F.when(F.col("n_chars") <= GATE_MAX_CHARS, 1).otherwise(0)
        ).alias("max_chars_400"),
    ]


def constraints_fanout(m: DataFrame, checks: tuple[str, ...]) -> DataFrame:
    """Fan the single aggregate row out to one verdict row per constraint
    (a literal stack — no second pass) and freeze compliance as ppm."""
    t = EXPECTATION_THRESHOLDS
    parts = ", ".join(
        f"'{c}', {c}, CAST({t[c]} AS BIGINT)" for c in checks
    )
    stacked = m.select(
        F.expr(f"stack({len(checks)}, {parts}) AS (check_name, sat, threshold_ppm)"),
        "n",
    )
    metric = F.expr("CAST((1000000 * sat) DIV n AS BIGINT)")
    return stacked.select(
        "check_name",
        metric.alias("metric_ppm"),
        "threshold_ppm",
        (metric >= F.col("threshold_ppm")).alias("passed"),
    )


def expectations_oracle(checks: tuple[str, ...]) -> str:
    """The DuckDB oracle chain for any subset of the constraint suite —
    shared by q_expectations (all five) and the streaming monitor's
    batch-parity oracle (the four ratio checks)."""
    langs = ", ".join(f"'{l}'" for l in EXPECTED_LANGS)
    t = EXPECTATION_THRESHOLDS
    union = "\n        UNION ALL ".join(
        f"SELECT '{c}' AS check_name, {c} AS sat, {t[c]} AS thr FROM m"
        for c in checks
    )
    return f"""
    WITH m AS (
        SELECT COUNT(*) AS n,
               COUNT(text) AS text_complete,
               COUNT(DISTINCT doc_id) AS doc_id_unique,
               SUM(CASE WHEN lang IN ({langs}) THEN 1 ELSE 0 END) AS lang_in_set,
               SUM(CASE WHEN length(text) >= {GATE_MIN_LEN} THEN 1 ELSE 0 END)
                 AS min_len_50,
               SUM(CASE WHEN n_chars <= {GATE_MAX_CHARS} THEN 1 ELSE 0 END)
                 AS max_chars_400
        FROM documents
    ),
    c AS (
        {union}
    )
    SELECT check_name,
           CAST((1000000 * sat) // (SELECT n FROM m) AS BIGINT) AS metric_ppm,
           CAST(thr AS BIGINT) AS threshold_ppm,
           (1000000 * sat) // (SELECT n FROM m) >= thr AS passed
    FROM c
    """


@register(
    "q_expectations",
    oracle=expectations_oracle(ALL_CHECKS),
    tags=("gate", "quality", "expectations", "audit"),
)
def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite over the corpus: one row
    per constraint with its measured compliance (integer ppm), threshold,
    and pass/fail verdict — the gate a release pipeline fails on before
    any heavy stage runs. All satisfied-counts come from ONE scan (the
    shared compliance_aggs plus the batch-only countDistinct, which rides
    the same Expand shape q_profile_table pins) and the constraint fan-out
    is a literal stack over that one aggregate row. The streaming twin
    (q_stream_expectations, streaming/stream_ops.py) reuses the identical
    aggregate and fan-out definitions."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    m = docs.agg(
        *compliance_aggs(), F.countDistinct("doc_id").alias("doc_id_unique")
    )
    return constraints_fanout(m, ALL_CHECKS)


# --- Keyed dataset diff (release-to-release audit) ------------------------------
# Version 2 of the corpus is derived DETERMINISTICALLY from version 1 so
# the operator is self-contained on the shipped tables (the driver runs
# one sf_dir): drop doc_id % 11 == 3 (removals), append a revision marker
# for doc_id % 7 == 0 (modifications), and mint doc_id + 10_000_000 copies
# for doc_id % 13 == 0 (additions). The diff itself — the operator under
# test — is version-agnostic: one full-outer equi-join on the key,
# classify added/removed/modified by null-ness and content inequality,
# drop the unchanged majority before anything is materialized.

DIFF_ADD_OFFSET = 10_000_000


def _dataset_diff_oracle() -> str:
    return f"""
    WITH v1 AS (SELECT doc_id, text FROM documents),
    v2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS text
        FROM documents WHERE doc_id % 11 <> 3
        UNION ALL
        SELECT doc_id + {DIFF_ADD_OFFSET}, text FROM documents WHERE doc_id % 13 = 0
    ),
    j AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, a.text AS t1, b.text AS t2
        FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
    )
    SELECT doc_id,
           CASE WHEN t1 IS NULL THEN 'added'
                WHEN t2 IS NULL THEN 'removed'
                ELSE 'modified' END AS change_type,
           CAST(length(t1) AS BIGINT) AS len_v1,
           CAST(length(t2) AS BIGINT) AS len_v2
    FROM j
    WHERE t1 IS NULL OR t2 IS NULL OR t1 <> t2
    """


@register(
    "q_dataset_diff",
    oracle=_dataset_diff_oracle(),
    tags=("gate", "diff", "release", "audit"),
)
def q_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed release-to-release dataset diff: every added / removed /
    modified document between corpus v1 and a deterministically derived
    v2 (see module section comment), classified by one full-outer
    equi-join on the key. The unchanged majority never leaves the join —
    at 100 TB both versions are key-bucketed lake tables and this is a
    co-located join emitting only the (small) change set. Content
    comparison here is direct text equality; a production diff over wide
    rows substitutes xxhash64(struct(*)) per side — same plan shape."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = docs.select("doc_id", F.col("text").alias("t1"))
    v2_base = docs.filter(F.col("doc_id") % 11 != 3).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        )
        .otherwise(F.col("text"))
        .alias("t2"),
    )
    v2_added = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + DIFF_ADD_OFFSET).alias("doc_id"),
        F.col("text").alias("t2"),
    )
    v2 = v2_base.unionAll(v2_added)
    j = v1.join(v2, "doc_id", "full_outer")
    return j.filter(
        F.col("t1").isNull() | F.col("t2").isNull() | (F.col("t1") != F.col("t2"))
    ).select(
        "doc_id",
        F.when(F.col("t1").isNull(), F.lit("added"))
        .when(F.col("t2").isNull(), F.lit("removed"))
        .otherwise(F.lit("modified"))
        .alias("change_type"),
        F.length("t1").cast("long").alias("len_v1"),
        F.length("t2").cast("long").alias("len_v2"),
    )


# --- Join-key skew profile (shuffle-sizing diagnostics) --------------------------
# The evidence a planner needs before choosing salting / AQE skew-join /
# broadcast for a key: per-key group sizes reduced to a SIZE HISTOGRAM
# (<= max-group-size rows — KB-scale even when one key holds millions of
# rows), then skew factor, top-key share, and discrete size percentiles
# computed entirely on the histogram. The percentile is the classic
# disc pick: smallest size s whose cumulative key count covers
# ceil(q * n_keys) — for integer cumulative counts, ck >= ceil(q*n/100)
# is exactly 100*ck >= q*n, so the pick is pure integer comparison.

SKEW_TABLE, SKEW_KEY = "orders", "o_custkey"


def _skew_oracle() -> str:
    return f"""
    WITH sizes AS (
        SELECT {SKEW_KEY}, COUNT(*) AS sz FROM {SKEW_TABLE} GROUP BY {SKEW_KEY}
    ),
    hist AS (SELECT sz, COUNT(*) AS nk FROM sizes GROUP BY sz),
    cum AS (
        SELECT sz, nk,
               SUM(nk) OVER (ORDER BY sz) AS ck,
               SUM(nk) OVER () AS n_keys,
               SUM(sz * nk) OVER () AS n_rows,
               MAX(sz) OVER () AS max_size
        FROM hist
    )
    SELECT CAST(MAX(n_keys) AS BIGINT) AS n_keys,
           CAST(MAX(n_rows) AS BIGINT) AS n_rows,
           CAST(MAX(max_size) AS BIGINT) AS max_size,
           CAST((1000000 * MAX(n_rows)) // MAX(n_keys) AS BIGINT) AS avg_size_ppm,
           CAST((1000000 * MAX(max_size)) // MAX(n_rows) AS BIGINT)
             AS top1_share_ppm,
           CAST((1000000 * MAX(max_size) * MAX(n_keys)) // MAX(n_rows) AS BIGINT)
             AS skew_ppm,
           CAST(MIN(CASE WHEN 100 * ck >= 50 * n_keys THEN sz END) AS BIGINT)
             AS p50_size,
           CAST(MIN(CASE WHEN 100 * ck >= 90 * n_keys THEN sz END) AS BIGINT)
             AS p90_size,
           CAST(MIN(CASE WHEN 100 * ck >= 99 * n_keys THEN sz END) AS BIGINT)
             AS p99_size
    FROM cum
    """


@register(
    "q_key_skew_profile",
    oracle=_skew_oracle(),
    tags=("gate", "skew", "diagnostics", "join"),
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for {SKEW_TABLE}.{SKEW_KEY}: key count, row
    count, max/percentile group sizes, the skew factor (max/avg in ppm)
    and the hottest key's row share — the numbers that decide between a
    plain shuffle join, AQE skew splitting, and explicit salting. ONE
    branch-free lineage, one scan: corpus -> per-key sizes -> size
    histogram (two shuffles, both with map-side partial counts), then the
    cumulative AND the grand totals ride the same single-sort window over
    the HISTOGRAM (bounded by the max group size in rows, never
    corpus-sized — the classifier.py score-histogram justification), and
    one final single-row aggregate emits the profile, so nothing
    recomputes the corpus groupBy."""
    rows = load_table(spark, sf_dir, SKEW_TABLE).select(SKEW_KEY)
    sizes = rows.groupBy(SKEW_KEY).agg(F.count(F.lit(1)).alias("sz"))
    hist = sizes.groupBy("sz").agg(F.count(F.lit(1)).alias("nk"))
    w_cum = Window.orderBy("sz").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("sz").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "sz",
        F.sum("nk").over(w_cum).alias("ck"),
        F.sum("nk").over(w_all).alias("n_keys"),
        F.sum(F.col("sz") * F.col("nk")).over(w_all).alias("n_rows"),
        F.max("sz").over(w_all).alias("max_size"),
    )
    agg = cum.agg(
        F.max("n_keys").alias("n_keys"),
        F.max("n_rows").alias("n_rows"),
        F.max("max_size").alias("max_size"),
        F.min(
            F.when(100 * F.col("ck") >= 50 * F.col("n_keys"), F.col("sz"))
        ).alias("p50_size"),
        F.min(
            F.when(100 * F.col("ck") >= 90 * F.col("n_keys"), F.col("sz"))
        ).alias("p90_size"),
        F.min(
            F.when(100 * F.col("ck") >= 99 * F.col("n_keys"), F.col("sz"))
        ).alias("p99_size"),
    )
    return agg.select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("max_size").cast("long").alias("max_size"),
        F.expr("CAST((1000000 * n_rows) DIV n_keys AS BIGINT)").alias("avg_size_ppm"),
        F.expr("CAST((1000000 * max_size) DIV n_rows AS BIGINT)").alias(
            "top1_share_ppm"
        ),
        F.expr("CAST((1000000 * max_size * n_keys) DIV n_rows AS BIGINT)").alias(
            "skew_ppm"
        ),
        F.col("p50_size").cast("long").alias("p50_size"),
        F.col("p90_size").cast("long").alias("p90_size"),
        F.col("p99_size").cast("long").alias("p99_size"),
    )

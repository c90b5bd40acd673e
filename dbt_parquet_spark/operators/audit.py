"""Curation provenance: per-document drop reasons and semantic
decontamination.

``q_drop_reasons`` is the audit trail of the corpus release
(operators/release.py): one row per SOURCE document stating whether it
survived and, if not, WHY — 'near_dup' losers carry the canonical doc that
shadowed them, 'low_quality' rows lost to their source's post-dedup
quartile threshold. The reference's table-equality diff (reference
dbt/adapters/parquet/impl.py:251-309) answers WHAT changed between two
relations; this answers WHY a curation run excluded a row — the lineage a
datasheet or a takedown request needs.

``q_semantic_decontamination`` is the embedding-space complement of the
n-gram q_cross_split_decontamination (operators/dedup.py): training
vectors whose embedding is near-identical to a held-out evaluation vector
are flagged as contaminated, via the SAME deterministic sign-chunk
blocking as q_embedding_cosine_dedup so the registered oracle replays the
plan exactly.

Scale: drop-reasons reuses the release pipeline's gated shapes (posting
joins, checkpointed components, broadcast thresholds) and adds only
per-document LEFT JOINs against decision tables that are near-dup-edge- /
source-cardinality-sized. Decontamination's eval side is benchmark-sized
by construction (an eval set is curated, not crawled), so it broadcasts;
candidate generation is the corpus-width-scaled chunk equi-join, never a
cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine
from ..registry import register
from ..sources.readers import load_table
from .corpus import PRUNE_PCT, QUALITY_PPM_SQL, quality_ppm_expr
from .dedup import NGRAM_PAIRS_CTES
from .graph import dedup_component_labels
from .similarity import (
    BLOCKED_COSINE_THRESHOLD,
    ORACLE_BITS,
    _DUCK_CHUNK_MATCH,
    _duck_chunk_defs,
    _duck_cosine,
    _sign_chunks,
    neardup_chunk_bits,
)


@register(
    "q_drop_reasons",
    oracle=f"""
    WITH RECURSIVE {NGRAM_PAIRS_CTES},
    sym AS (
        SELECT d1 AS src, d2 AS dst FROM ngram_pairs
        UNION
        SELECT d2, d1 FROM ngram_pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM sym
        UNION
        SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
    ),
    comp AS (
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component_id
        FROM reach GROUP BY src
    ),
    q AS (
        SELECT doc_id, source, {QUALITY_PPM_SQL} AS quality
        FROM documents
    ),
    ranked AS (
        SELECT c.doc_id, c.component_id,
               ROW_NUMBER() OVER (PARTITION BY c.component_id
                                  ORDER BY q.quality DESC, c.doc_id) AS rn
        FROM comp c JOIN q USING (doc_id)
    ),
    drops AS (
        SELECT r.doc_id, k.doc_id AS canonical_id
        FROM ranked r JOIN ranked k
          ON r.component_id = k.component_id AND k.rn = 1
        WHERE r.rn > 1
    ),
    dedup AS (
        SELECT * FROM q WHERE doc_id NOT IN (SELECT doc_id FROM drops)
    ),
    thresholds AS (
        SELECT source, quantile_cont(quality, {PRUNE_PCT}) AS thr
        FROM dedup GROUP BY source
    )
    SELECT q.doc_id, q.source, q.quality,
           CASE WHEN d.doc_id IS NOT NULL THEN 'near_dup'
                WHEN q.quality < t.thr THEN 'low_quality'
                ELSE 'kept' END AS status,
           d.canonical_id
    FROM q
    LEFT JOIN drops d ON q.doc_id = d.doc_id
    LEFT JOIN thresholds t ON q.source = t.source
    """,
    tags=("corpus", "release", "audit", "lineage"),
)
def q_drop_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release audit: every document with its curation outcome under the
    EXACT q_corpus_release semantics (same component closure, same
    canonical tiebreak, same post-dedup per-source quartile). 'near_dup'
    rows carry the canonical survivor that shadowed them; everything else
    is 'low_quality' or 'kept'. Composition is pinned in tests: the 'kept'
    set here equals q_corpus_release's output population.

    Scale: the decision tables this joins against are near-dup-edge-sized
    (drops) and source-cardinality-sized (thresholds, broadcast); the only
    corpus-sized objects flow through equi-joins. The canonical window
    partitions by component_id — dup-cluster-sized, the release.py
    whitelist justification."""
    comp = dedup_component_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("doc_id", "source", quality_ppm_expr().alias("quality"))

    w = Window.partitionBy("component_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    ranked = comp.join(q.select("doc_id", "quality"), "doc_id").select(
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.first("doc_id").over(w).alias("canonical_id"),
    )
    drops = ranked.filter(F.col("rn") > 1).select("doc_id", "canonical_id")
    # ONE left join + a percentile WINDOW by source (r15, guide §2.4). The
    # previous shape consumed `drops` twice — a LeftAnti feeding the
    # per-source threshold aggregate and a LeftOuter feeding the output —
    # and because the two consumers prune different columns the drops
    # subtree (components join + canonical window) planned and EXECUTED
    # twice, with the quality scan run four times (VERDICT_r14 next-round
    # #5). Now the threshold is percentile over the KEPT rows' quality
    # (the CASE feeds NULL for near-dup rows and percentile ignores
    # NULLs — exactly the old aggregate's input set, same exact
    # interpolation), computed per source as a window over the single
    # joined frame: drops planned once, documents scanned once, and the
    # anti-join + threshold broadcast chain is gone. A whole source lands
    # in one window task, but the old percentile aggregate buffered the
    # same per-source value set in one reducer anyway (TypedImperative
    # percentile has no partial reduction), so the skew posture is
    # unchanged.
    qd = q.join(drops, "doc_id", "left")
    thr = F.percentile(
        F.when(F.col("canonical_id").isNull(), F.col("quality")),
        F.lit(PRUNE_PCT),
    ).over(Window.partitionBy("source"))
    return qd.select(
        "doc_id",
        "source",
        "quality",
        F.when(F.col("canonical_id").isNotNull(), F.lit("near_dup"))
        .when(F.col("quality") < thr, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
        .alias("status"),
        "canonical_id",
    )


# Hash split for the decontamination demo: md5(vec_id) >= 'e' puts ~12.5%
# of vectors in the held-out eval set — the q_train_test_split idiom, so
# the split is engine- and re-run-stable. In production the eval side is a
# real benchmark table; the operator shape is identical.
EVAL_HEX_THRESHOLD = "e"


@register(
    "q_semantic_decontamination",
    oracle=f"""
    WITH sb AS (
        SELECT vec_id, embedding,
               md5(CAST(vec_id AS VARCHAR)) AS h,
               {_duck_chunk_defs(ORACLE_BITS)}
        FROM embeddings
    ),
    a AS (SELECT * FROM sb WHERE h < '{EVAL_HEX_THRESHOLD}'),
    b AS (SELECT * FROM sb WHERE h >= '{EVAL_HEX_THRESHOLD}')
    SELECT a.vec_id AS train_id, b.vec_id AS eval_id,
           {_duck_cosine("a.embedding", "b.embedding")} AS cos_sim
    FROM a JOIN b ON ({_DUCK_CHUNK_MATCH})
    WHERE {_duck_cosine("a.embedding", "b.embedding")} >= {BLOCKED_COSINE_THRESHOLD}
    """,
    tags=("similarity", "decontamination", "embedding"),
)
def q_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval-set decontamination: (train_id, eval_id,
    cos_sim) for every train vector whose cosine to a held-out eval vector
    clears the near-dup threshold — candidates generated by the SAME
    corpus-width sign-chunk blocking as q_embedding_cosine_dedup (the
    registered oracle is rendered at ORACLE_BITS = the sf0.01 width; other
    scales are parity-checked in tests by re-rendering).

    Scale: the eval side (a curated benchmark) is broadcast; the train
    side flows through a chunk equi-join, so cost is O(candidates), not
    O(train x eval). Recall vs the exact cross-set scan is measured in
    tests at the same threshold."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # Footer-only count (parquet metadata, no data scan) -> chunk width.
    bits = neardup_chunk_bits(emb.count())
    chunked = emb.select(
        "vec_id",
        "embedding",
        F.md5(F.col("vec_id").cast("string")).alias("h"),
        F.posexplode(F.array(*_sign_chunks(F.col("embedding"), bits))).alias(
            "chunk_idx", "chunk_val"
        ),
    )
    train = chunked.filter(F.col("h") < EVAL_HEX_THRESHOLD).select(
        F.col("vec_id").alias("train_id"),
        F.col("embedding").alias("ea"),
        "chunk_idx",
        "chunk_val",
    )
    ev = chunked.filter(F.col("h") >= EVAL_HEX_THRESHOLD).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("eb"),
        "chunk_idx",
        "chunk_val",
    )
    pairs = train.join(F.broadcast(ev), ["chunk_idx", "chunk_val"]).dropDuplicates(
        ["train_id", "eval_id"]
    )
    return pairs.select(
        "train_id", "eval_id", cosine(F.col("ea"), F.col("eb")).alias("cos_sim")
    ).filter(F.col("cos_sim") >= BLOCKED_COSINE_THRESHOLD)


# --- Source drift (Pearson chi-squared against the corpus mix) -----------------
# Distribution monitoring for a growing corpus: per source, the chi-squared
# statistic of its hashed-token distribution against the corpus-wide mix —
# the contingency-table test (source × token-bucket) that flags a crawl
# source whose content shifted (spam influx, template change, language mix)
# before it poisons the training mix. Token space is hashed into
# DRIFT_BUCKETS buckets (the DSIR idiom) so the statistic's width is fixed
# regardless of vocabulary size.
#
# Exactness: every cell contribution (obs − exp)²/exp is integer counts
# through identical-order IEEE arithmetic, frozen to integer ppm before the
# per-source sum; the mass of the source's EMPTY buckets (obs = 0 cells,
# which Pearson's statistic still charges exp each) is added in one exact
# closed form st·(gt − Σ_observed bt)/gt, frozen once. Both engines compute
# the same definition bit-for-bit → fully oracle-checked.

DRIFT_BUCKETS = 256


@register(
    "q_source_drift",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    b AS (
        SELECT source,
               CAST('0x' || substr(md5(t), 1, 6) AS BIGINT) % {DRIFT_BUCKETS} AS bucket
        FROM tok
    ),
    cell AS (SELECT source, bucket, COUNT(*) AS obs FROM b GROUP BY source, bucket),
    bt AS (SELECT bucket, CAST(SUM(obs) AS BIGINT) AS bt FROM cell GROUP BY bucket),
    st AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS st FROM cell GROUP BY source),
    gt AS (SELECT CAST(SUM(obs) AS BIGINT) AS gt FROM cell),
    e AS (
        SELECT cell.source, cell.obs, bt.bt,
               (CAST(bt.bt AS DOUBLE) * CAST(st.st AS DOUBLE)) / CAST(gt.gt AS DOUBLE)
                 AS expd
        FROM cell JOIN bt USING (bucket) JOIN st USING (source) CROSS JOIN gt
    ),
    c AS (
        SELECT source,
               CAST(floor(1000000.0 * (((CAST(obs AS DOUBLE) - expd)
                                        * (CAST(obs AS DOUBLE) - expd)) / expd))
                    AS BIGINT) AS chi_ppm,
               bt
        FROM e
    ),
    obs_part AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(chi_ppm) AS BIGINT) AS chi_obs,
               CAST(SUM(bt) AS BIGINT) AS bt_obs
        FROM c GROUP BY source
    )
    SELECT o.source, o.n_buckets,
           CAST(o.chi_obs
                + CAST(floor(1000000.0 * ((CAST(st.st AS DOUBLE)
                      * (CAST(gt.gt AS DOUBLE) - CAST(o.bt_obs AS DOUBLE)))
                      / CAST(gt.gt AS DOUBLE))) AS BIGINT) AS BIGINT) AS chi2_ppm
    FROM obs_part o JOIN st USING (source) CROSS JOIN gt
    """,
    tags=("corpus", "drift", "monitoring", "chi2"),
)
def q_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift vs the corpus mix: Pearson chi-squared
    over the (source × hashed-token-bucket) contingency table, in integer
    ppm. High chi2_ppm = the source's token distribution deviates from the
    pooled corpus — the monitoring signal that catches a shifted crawl
    before q_corpus_mix schedules it into a training run.

    Scale: ONE shuffle — groupBy(source, bucket) with map-side partials
    bounds the exchange at sources × DRIFT_BUCKETS rows regardless of
    corpus size; bucket totals (≤256 rows), source totals, and the grand
    total all join back as broadcasts. Every float is frozen to integer
    ppm before any reaggregation, so the statistic is partitioning-
    independent and fully oracle-checked.
    """
    from .dedup import _spread_small_scan

    # source rides the scan directly — no doc_id join against the token
    # scaffold (the tokenize is one narrow split; a join would re-shuffle
    # the corpus for a column the scan already has)
    docs = _spread_small_scan(
        spark, load_table(spark, sf_dir, "documents").select("source", "text")
    )
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("t"))
    cell = (
        tok.select(
            "source",
            (
                F.conv(F.substring(F.md5("t"), 1, 6), 16, 10).cast("long")
                % DRIFT_BUCKETS
            ).alias("bucket"),
        )
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("obs"))
        # persisted, never unpersisted: cell feeds FOUR plan branches (bt,
        # st, gt, the cell join) — unpersisted it would recompute the full
        # explode+shuffle per branch (the simhash lesson). The entry is
        # sources × DRIFT_BUCKETS rows (KB) and CacheManager dedups by
        # plan, so repeated invocations share one entry.
        .persist()
    )
    bt = cell.groupBy("bucket").agg(F.sum("obs").cast("long").alias("bt"))
    st = cell.groupBy("source").agg(F.sum("obs").cast("long").alias("st"))
    gt = cell.agg(F.sum("obs").cast("long").alias("gt"))
    expd = (F.col("bt").cast("double") * F.col("st").cast("double")) / F.col(
        "gt"
    ).cast("double")
    diff = F.col("obs").cast("double") - F.col("expd")
    e = (
        cell.join(F.broadcast(bt), "bucket")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(gt))
        .withColumn("expd", expd)
    )
    c = e.select(
        "source",
        "bt",
        F.floor(F.lit(1000000.0) * ((diff * diff) / F.col("expd")))
        .cast("long")
        .alias("chi_ppm"),
    )
    obs_part = c.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("chi_ppm").cast("long").alias("chi_obs"),
        F.sum("bt").cast("long").alias("bt_obs"),
    )
    missing = F.floor(
        F.lit(1000000.0)
        * (
            (F.col("st").cast("double") * (F.col("gt").cast("double") - F.col("bt_obs").cast("double")))
            / F.col("gt").cast("double")
        )
    ).cast("long")
    out = (
        obs_part.join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(gt))
        .select(
            "source",
            "n_buckets",
            (F.col("chi_obs") + missing).cast("long").alias("chi2_ppm"),
        )
    )
    return out


# --- k-anonymous release aggregates --------------------------------------------

KANON_K = 5  # minimum group size a published cell may reveal


@register(
    "q_kanon_release",
    oracle=f"""
    WITH g AS (
        SELECT source, lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY source, lang
    ),
    lab AS (
        SELECT CASE WHEN n >= {KANON_K} THEN source ELSE '__suppressed__' END AS source,
               CASE WHEN n >= {KANON_K} THEN lang ELSE '__suppressed__' END AS lang,
               n, chars
        FROM g
    )
    SELECT source, lang,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS total_chars,
           (source = '__suppressed__') AS suppressed
    FROM lab GROUP BY source, lang
    """,
    tags=("audit", "privacy", "k-anonymity", "release"),
)
def q_kanon_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymous release statistics: per-(source, lang) document counts
    and char mass, with every group smaller than KANON_K pooled into one
    '__suppressed__' cell — the suppression rule a public datasheet
    (q_corpus_datasheet's per-cell extension) applies so no published cell
    isolates fewer than k documents. Totals are preserved exactly: the
    suppressed cell carries the pooled mass rather than dropping it.

    Scale: one groupBy(source, lang) with map-side partials (output =
    group cardinality), one relabel projection, one re-aggregation over
    the group table — the corpus is scanned once.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").cast("long").alias("chars")
    )
    keep = F.col("n") >= KANON_K
    lab = g.select(
        F.when(keep, F.col("source")).otherwise(F.lit("__suppressed__")).alias("source"),
        F.when(keep, F.col("lang")).otherwise(F.lit("__suppressed__")).alias("lang"),
        "n",
        "chars",
    )
    return lab.groupBy("source", "lang").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum("chars").cast("long").alias("total_chars"),
        (F.col("source") == "__suppressed__").alias("suppressed"),
    )

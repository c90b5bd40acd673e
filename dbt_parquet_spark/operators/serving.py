"""Serving prep: what leaves the curated corpus toward a RAG / vector-store
deployment — overlapping retrieval chunks and int8-quantized embeddings.

``q_text_chunks`` windows each document into fixed-token chunks with
overlap (the retrieval-granularity split every RAG pipeline makes before
embedding). ``q_embedding_quantize`` is per-vector symmetric int8 scalar
quantization (max-abs scale + byte codes — 4× smaller than float32, the
standard vector-store storage form; distinct from operators/similarity.py's
PRODUCT quantization, which trains a codebook for ANN distance — this one
is codebook-free storage compression with exact per-vector reconstruction
scale). Both are map-only column expressions with exact cross-engine
arithmetic, so both carry full DuckDB oracles.

Scale: zero shuffles in either operator. Chunking multiplies rows by
n_tokens/stride — the expansion is per-document bounded and streams
through the scan projection; quantization is 1:1. At 100 TB both run as
pure map stages pipelined into the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table

CHUNK_TOKENS = 32  # retrieval window
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@register(
    "q_text_chunks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    k AS (
        SELECT doc_id, toks,
               unnest(generate_series(0,
                   greatest((n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}, 0)))
                 AS chunk_id
        FROM t
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           array_to_string(toks[chunk_id * {CHUNK_STRIDE} + 1 :
                                chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')
             AS chunk_text,
           CAST(len(toks[chunk_id * {CHUNK_STRIDE} + 1 :
                         chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS INT)
             AS n_chunk_tokens
    FROM k
    """,
    tags=("serving", "rag", "chunking", "text"),
)
def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping retrieval chunks: every document split into
    {CHUNK_TOKENS}-token windows every {CHUNK_STRIDE} tokens (trailing
    chunk may be short; a doc shorter than one window yields exactly one
    chunk). Chunk count per doc is the integer formula
    1 + max(0, ceil((n - window) / stride)) — identical in any engine, so
    chunk ids are stable join keys back to the source doc.

    Scale: map-only — sequence + explode + slice over the tokens already
    in the scan projection; no shuffle, row expansion bounded by
    n_tokens/stride per doc."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # integer ceil-div: div keeps it exact (no double rounding)
    last_k = F.greatest(
        F.expr(f"(size(split(text, ' ')) - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1) div {CHUNK_STRIDE}"),
        F.lit(0),
    )
    out = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), last_k)).alias("chunk_id"),
    )
    piece = F.slice(F.col("toks"), F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_TOKENS)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("int").alias("n_chunk_tokens"),
    )


@register(
    "q_embedding_quantize",
    oracle="""
    WITH s AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(x))) AS mx
        FROM embeddings
    )
    SELECT vec_id, CAST(mx AS DOUBLE) AS q_scale,
           CASE WHEN mx = 0
                THEN list_transform(embedding, x -> 0)
                ELSE list_transform(embedding,
                                    x -> CAST(floor(CAST(x AS DOUBLE) * 127.0
                                                    / CAST(mx AS DOUBLE)) AS INTEGER))
           END AS codes
    FROM s
    """,
    tags=("serving", "embedding", "quantization"),
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization: per-vector max-abs scale, codes
    = floor(x * 127 / scale) ∈ [-127, 126] — 1 byte/dim instead of 4, with
    the scale kept per vector for exact dequantization (x̂ = code·scale/127,
    relative error ≤ 1/127 per dim; cosine drift is measured in tests).
    floor (not round) keeps the code arithmetically identical in every
    engine. Zero vectors quantize to zero codes.

    Scale: 1:1 map-only array expression — the compression pass a 100 TB
    vector store runs once at ingest."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    with_scale = emb.withColumn("mx", mx)
    # both engines must do the arithmetic in DOUBLE: DuckDB's FLOAT * 127.0
    # stays FLOAT (the literal narrows), drifting the max element to ±126/128
    codes = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 127.0 / F.col("mx").cast("double")).cast("int"),
    )
    zeros = F.transform("embedding", lambda x: F.lit(0))
    return with_scale.select(
        "vec_id",
        F.col("mx").cast("double").alias("q_scale"),
        F.when(F.col("mx") == 0, zeros).otherwise(codes).alias("codes"),
    )


# --- Hybrid retrieval (BM25 ⊕ dense, reciprocal-rank fusion) -----------------
# The serving-stack shape every RAG deployment converges on: a lexical
# BM25 leg and a dense cosine leg retrieved independently, fused by RRF
# (Cormack et al. 2009): score(d) = Σ_legs 1/(RRF_K + rank_leg(d)). Rank
# fusion needs no score calibration between legs — exactly why it is the
# production default. embeddings.vec_id is the document key (the testdata
# contract: documents and embeddings are row-aligned).

HYBRID_K = 10  # per-leg and fused top-k
RRF_K = 60  # the standard RRF constant
HYBRID_QUERY_VEC = 0  # dense query = this vector; lexical query = BM25 terms


def _rank_by_broadcast_count(df: DataFrame, score_col: str, id_col: str, rank_name: str) -> DataFrame:
    """Rank k rows by (score DESC, id ASC) WITHOUT a window: rank = 1 +
    count of strictly-better rows, via a broadcast self-join. The input is
    a top-k result (≤ HYBRID_K rows), so the k² comparison is constant
    work — and the package-wide no-corpus-keyed-window gate stays clean."""
    other = df.select(F.col(score_col).alias("_s2"), F.col(id_col).alias("_d2"))
    better = (F.col("_s2") > F.col(score_col)) | (
        (F.col("_s2") == F.col(score_col)) & (F.col("_d2") < F.col(id_col))
    )
    return (
        df.join(F.broadcast(other), better, "left")
        .groupBy(*df.columns)
        .agg((F.count("_d2") + 1).cast("long").alias(rank_name))
    )


def _hybrid_oracle() -> str:
    from .similarity import _duck_cosine
    from .text import BM25_QUERY_TERMS, bm25_oracle_sql

    return f"""
    WITH lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS r_lex
        FROM ({bm25_oracle_sql(BM25_QUERY_TERMS, HYBRID_K)}) bm
    ),
    dense_scored AS (
        SELECT e.vec_id AS doc_id, {_duck_cosine("q.qe", "e.embedding")} AS cs
        FROM (SELECT embedding AS qe FROM embeddings
              WHERE vec_id = {HYBRID_QUERY_VEC}) q, embeddings e
        WHERE e.vec_id <> {HYBRID_QUERY_VEC}
    ),
    dense AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id) AS r_dense
        FROM dense_scored ORDER BY cs DESC, doc_id LIMIT {HYBRID_K}
    )
    SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
           l.r_lex AS r_lex,
           d.r_dense AS r_dense,
           CAST(floor(1000000.0 * (
               COALESCE(1.0 / CAST({RRF_K} + l.r_lex AS DOUBLE), 0.0)
             + COALESCE(1.0 / CAST({RRF_K} + d.r_dense AS DOUBLE), 0.0)
           )) AS BIGINT) AS rrf_ppm
    FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
    ORDER BY rrf_ppm DESC, doc_id LIMIT {HYBRID_K}
    """


@register("q_hybrid_retrieval", oracle=_hybrid_oracle(), tags=("serving", "retrieval", "hybrid", "rrf"))
def q_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of the BM25 top-k (text.bm25_topk — the shared scoring
    definition) and the dense cosine top-k for the fixed hybrid query:
    rrf_ppm = floor(1e6 · Σ 1/(60 + rank)), full-outer over the two legs'
    doc sets, fused top-HYBRID_K. Oracle-exact: ranks are integers; the
    per-leg reciprocal and the two-term sum are fixed-order IEEE doubles
    (identical in both engines), frozen to integer ppm before the final
    order.

    Scale: each leg is its own already-gated shape — BM25's filtered
    posting groupBy + TakeOrderedAndProject, dense's broadcast-query
    cosine + TakeOrderedAndProject. Ranking the two k-row leg results
    is a broadcast self-join (no window, no shuffle), and the fusion
    join moves ≤ 2k rows. Per-query cost at 100 TB = two top-k scans;
    for query batches both legs batch by query id (bm25_topk's generic
    API + q_ann_topk's broadcast-queries shape).
    """
    from .text import BM25_QUERY_TERMS, bm25_topk
    from ..functions.vector import cosine

    lex = bm25_topk(spark, sf_dir, BM25_QUERY_TERMS, HYBRID_K).select(
        "doc_id", "score_ppm"
    )
    lex_ranked = _rank_by_broadcast_count(lex, "score_ppm", "doc_id", "r_lex").select(
        "doc_id", "r_lex"
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qv = emb.filter(F.col("vec_id") == HYBRID_QUERY_VEC).select(
        F.col("embedding").alias("qe")
    )
    dense_top = (
        emb.filter(F.col("vec_id") != HYBRID_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("qe"), F.col("embedding")).alias("cs"),
        )
        .orderBy(F.desc("cs"), F.asc("doc_id"))
        .limit(HYBRID_K)
    )
    dense_ranked = _rank_by_broadcast_count(dense_top, "cs", "doc_id", "r_dense").select(
        "doc_id", "r_dense"
    )

    fused = lex_ranked.join(dense_ranked, "doc_id", "full_outer")
    rrf = F.floor(
        F.lit(1000000.0)
        * (
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("r_lex")).cast("double"), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("r_dense")).cast("double"),
                F.lit(0.0),
            )
        )
    ).cast("long")
    return (
        fused.select("doc_id", "r_lex", "r_dense", rrf.alias("rrf_ppm"))
        .orderBy(F.desc("rrf_ppm"), F.asc("doc_id"))
        .limit(HYBRID_K)
    )


# --- Retrieval quality evaluation (MRR / NDCG / precision) ----------------------
# The eval op every retrieval stack ships next to its index: given a ranked
# run and graded relevance judgments, report MRR@k, NDCG@k and precision@k.
# The run is the BM25 top-10 (q_bm25_topk's exact ppm ranking); the qrels
# are derived deterministically from the corpus itself: the judgment is
# ENGLISH-relevance — grade 2 for an English document containing ALL query
# terms, 1 for an English document containing all but one, 0 otherwise.
# The retriever is language-blind and tf-weighted while the judgment is
# language-restricted and presence-based, so the metrics genuinely
# discriminate (top ranks are routinely non-English: NDCG@1 = 0 on the
# shipped corpus) and are independent of the scoring function under test.
#
# Exactness: the DCG position weights 1/log2(i+1) are computed ONCE in
# CPython and embedded as identical repr literals in the Spark expression
# and the oracle SQL (positions are bounded by the cutoff — no engine libm
# anywhere); every contribution freezes to integer ppm before any sum, and
# the ratios (NDCG, MRR, precision) are BIGINT integer division. Bit-exact
# at any partitioning.

EVAL_CUTOFFS = (1, 5, 10)
EVAL_POOL = 10  # the run depth (== BM25_TOP_K)


def _dcg_weights() -> dict[int, float]:
    import math

    return {i: 1.0 / math.log2(i + 1.0) for i in range(1, EVAL_POOL + 1)}


def _metrics_sql(run_sql: str) -> str:
    """The metric CTE chain for ANY ranked run: ``run_sql`` must yield
    (doc_id, r) with r in 1..EVAL_POOL. Shared by the lexical and hybrid
    eval oracles so both judge against the identical qrels/weights."""
    from .text import BM25_QUERY_TERMS

    w = _dcg_weights()
    w_case_r = "CASE r " + " ".join(
        f"WHEN {i} THEN {w[i]!r}" for i in range(1, EVAL_POOL + 1)
    ) + " END"
    w_case_j = "CASE j " + " ".join(
        f"WHEN {i} THEN {w[i]!r}" for i in range(1, EVAL_POOL + 1)
    ) + " END"
    matches = " + ".join(
        f"(CASE WHEN list_contains(string_split(text, ' '), '{t}') THEN 1 ELSE 0 END)"
        for t in BM25_QUERY_TERMS
    )
    nt = len(BM25_QUERY_TERMS)
    return f"""
    WITH run AS ({run_sql}),
    qrels AS (
        SELECT doc_id,
               CASE WHEN lang = 'en' AND n_match = {nt} THEN 2
                    WHEN lang = 'en' AND n_match = {nt - 1} THEN 1
                    ELSE 0 END AS rel
        FROM (SELECT doc_id, lang, {matches} AS n_match FROM documents)
    ),
    contrib AS (
        SELECT run.r, qrels.rel,
               CAST(FLOOR(1000000.0 * qrels.rel * ({w_case_r})) AS BIGINT) AS c
        FROM run JOIN qrels USING (doc_id)
    ),
    ideal AS (
        SELECT ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS j, rel FROM qrels
    ),
    idealc AS (
        SELECT j, CAST(FLOOR(1000000.0 * rel * ({w_case_j})) AS BIGINT) AS c
        FROM ideal WHERE j <= {EVAL_POOL}
    ),
    ks AS (SELECT CAST(unnest({list(EVAL_CUTOFFS)}) AS BIGINT) AS k),
    idcg AS (
        SELECT ks.k, COALESCE(CAST(SUM(ic.c) AS BIGINT), 0) AS v
        FROM ks LEFT JOIN idealc ic ON ic.j <= ks.k GROUP BY ks.k
    ),
    mets AS (
        SELECT ks.k,
               CAST(COUNT(CASE WHEN c.rel >= 1 THEN 1 END) AS BIGINT) AS n_rel_topk,
               (1000000 * CAST(COUNT(CASE WHEN c.rel >= 1 THEN 1 END) AS BIGINT)) // ks.k AS prec_ppm,
               COALESCE(1000000 // MIN(CASE WHEN c.rel >= 1 THEN c.r END), 0) AS mrr_ppm,
               COALESCE(CAST(SUM(c.c) AS BIGINT), 0) AS dcg_ppm
        FROM ks LEFT JOIN contrib c ON c.r <= ks.k GROUP BY ks.k
    )
    SELECT mets.k, mets.n_rel_topk, mets.prec_ppm, mets.mrr_ppm, mets.dcg_ppm,
           CASE WHEN idcg.v = 0 THEN 0
                ELSE (1000000 * mets.dcg_ppm) // idcg.v END AS ndcg_ppm
    FROM mets JOIN idcg ON mets.k = idcg.k
    ORDER BY mets.k
    """


def _retrieval_eval_oracle() -> str:
    from .text import BM25_QUERY_TERMS, bm25_oracle_sql

    return _metrics_sql(
        f"""SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS r
        FROM ({bm25_oracle_sql(BM25_QUERY_TERMS, EVAL_POOL)}) bm"""
    )


def _retrieval_eval_hybrid_oracle() -> str:
    return _metrics_sql(
        f"""SELECT doc_id, ROW_NUMBER() OVER (ORDER BY rrf_ppm DESC, doc_id) AS r
        FROM ({_hybrid_oracle()}) hy"""
    )


def _qrels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """English-relevance graded judgments (see the block comment)."""
    from .text import BM25_QUERY_TERMS

    nt = len(BM25_QUERY_TERMS)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    n_match = sum(
        F.when(F.array_contains(F.split(F.col("text"), " "), t), 1).otherwise(0)
        for t in BM25_QUERY_TERMS
    )
    en = F.col("lang") == "en"
    return docs.select(
        "doc_id",
        F.when(en & (n_match == nt), 2)
        .when(en & (n_match == nt - 1), 1)
        .otherwise(0)
        .alias("rel"),
    )


def _ranking_metrics(
    spark: SparkSession, sf_dir: str, ranked: DataFrame
) -> DataFrame:
    """Metrics for ANY ranked run: ``ranked`` carries (doc_id, r) with
    r in 1..EVAL_POOL. One (k, n_rel_topk, prec_ppm, mrr_ppm, dcg_ppm,
    ndcg_ppm) row per cutoff — the Spark twin of _metrics_sql."""
    from pyspark.sql import Window

    w = _dcg_weights()
    qrels = _qrels(spark, sf_dir)
    w_arr = F.array(*[F.lit(w[i]) for i in range(1, EVAL_POOL + 1)])
    contrib = ranked.join(qrels, "doc_id").select(
        "r",
        "rel",
        F.floor(
            F.lit(1000000.0)
            * F.col("rel").cast("double")
            * F.element_at(w_arr, F.col("r").cast("int"))
        )
        .cast("long")
        .alias("c"),
    )

    # IDCG in-plan (r14, guide §1/§5 job diet): the ideal gains used to be
    # a driver collect of the corpus's top-EVAL_POOL grades — one extra
    # corpus-projection Spark action per evaluation. The same TakeOrdered
    # top-10 now feeds a 10-row window + 3-row aggregate INSIDE the metric
    # plan; the floored double products are the identical IEEE ops the
    # Python loop ran, so every idcg value is bit-identical.
    ideal = (
        qrels.orderBy(F.desc("rel"), F.asc("doc_id"))
        .limit(EVAL_POOL)
        .select(
            "rel",
            F.row_number()
            .over(Window.orderBy(F.desc("rel"), F.asc("doc_id")))
            .alias("j"),
        )
    )
    idealc = ideal.select(
        "j",
        F.floor(
            F.lit(1000000.0)
            * F.col("rel").cast("double")
            * F.element_at(w_arr, F.col("j").cast("int"))
        )
        .cast("long")
        .alias("c"),
    )
    # ONE aggregation for every per-cutoff quantity (r14 §13, guide §1 stage
    # diet): the run contributions, the ideal contributions and a seed row
    # per cutoff union into a single (k)-keyed groupBy with conditional
    # aggregates, replacing the 3-stage chain of tiny broadcast joins
    # (ks⋈idealc, ks⋈contrib, per_k⋈idcg) the tail used to plan — each of
    # which cost an AQE materialization wave per evaluation. Seeds keep
    # every cutoff present even for an empty run, which is exactly the
    # oracle's `ks LEFT JOIN` semantics; all aggregates are the same
    # integer ops as before, so every value is bit-identical.
    cut_arr = F.array(*[F.lit(k).cast("long") for k in EVAL_CUTOFFS])
    null_l = F.lit(None).cast("long")
    run_rows = contrib.select(
        F.explode(cut_arr).alias("k"), "r", F.col("rel").cast("int").alias("rel"),
        F.col("c"), F.lit(1).alias("src"),
    ).filter(F.col("r") <= F.col("k"))
    ideal_rows = idealc.select(
        F.explode(cut_arr).alias("k"), F.col("j").alias("r"),
        F.lit(None).cast("int").alias("rel"), F.col("c"), F.lit(2).alias("src"),
    ).filter(F.col("r") <= F.col("k"))
    seed_rows = spark.range(1).select(
        F.explode(cut_arr).alias("k"), null_l.alias("r"),
        F.lit(None).cast("int").alias("rel"), null_l.alias("c"),
        F.lit(0).alias("src"),
    )
    is_run = F.col("src") == 1
    per_k = (
        seed_rows.unionByName(run_rows)
        .unionByName(ideal_rows)
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(is_run, F.when(F.col("rel") >= 1, 1).otherwise(0))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_rel_topk"),
            F.min(F.when(is_run & (F.col("rel") >= 1), F.col("r"))).alias(
                "first_rel"
            ),
            F.coalesce(F.sum(F.when(is_run, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("dcg_ppm"),
            F.coalesce(F.sum(F.when(F.col("src") == 2, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("idcg"),
        )
    )
    return (
        per_k.select(
            "k",
            "n_rel_topk",
            F.expr("(1000000 * n_rel_topk) DIV k").alias("prec_ppm"),
            F.coalesce(F.expr("1000000 DIV first_rel"), F.lit(0).cast("long")).alias(
                "mrr_ppm"
            ),
            "dcg_ppm",
            F.when(F.col("idcg") == 0, F.lit(0).cast("long"))
            .otherwise(F.expr("(1000000 * dcg_ppm) DIV idcg"))
            .alias("ndcg_ppm"),
        )
        .orderBy("k")
    )


@register(
    "q_retrieval_eval",
    oracle=_retrieval_eval_oracle(),
    tags=("retrieval", "eval", "bm25", "pipeline"),
)
def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality metrics for the BM25 run at cutoffs (1, 5, 10):
    precision@k, MRR@k and NDCG@k in exact integer ppm, against graded
    qrels derived from English-relevance distinct-term presence (see the
    block comment). Returns one row per cutoff: (k, n_rel_topk, prec_ppm,
    mrr_ppm, dcg_ppm, ndcg_ppm). Fully oracle-checked and pinned to an
    independent pure-Python recomputation (tests/test_retrieval.py).

    Scale: the run is the BM25 top-k (TakeOrdered over the posting join —
    q_bm25_topk's plan); qrels are a map-only projection of the corpus;
    the metric arithmetic happens on ≤ EVAL_POOL rows per query; ranks
    come from the windowless broadcast-count (k² on 10 rows). The ideal
    gains (IDCG) need only the corpus's TOP-EVAL_POOL relevance grades —
    a TakeOrderedAndProject collect of 10 ints, never a global sort. The
    cutoff expansion is a broadcast of 3 literals. At 100 TB the cost IS
    the BM25 run + one corpus projection."""
    from .text import BM25_QUERY_TERMS, BM25_TOP_K, bm25_topk

    assert EVAL_POOL == BM25_TOP_K  # the run depth the oracle chain assumes
    run = bm25_topk(spark, sf_dir, BM25_QUERY_TERMS, EVAL_POOL).select(
        "doc_id", "score_ppm"
    )
    ranked = _rank_by_broadcast_count(run, "score_ppm", "doc_id", "r").select(
        "doc_id", "r"
    )
    return _ranking_metrics(spark, sf_dir, ranked)


@register(
    "q_retrieval_eval_hybrid",
    oracle=_retrieval_eval_hybrid_oracle(),
    tags=("retrieval", "eval", "hybrid", "rrf", "pipeline"),
)
def q_retrieval_eval_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same ranking metrics over the HYBRID (BM25 ⊕ dense RRF) run —
    judged against the identical qrels and weights as q_retrieval_eval, so
    the two result tables are directly comparable: the lexical-vs-hybrid
    A/B every retrieval stack runs before switching its serving default.
    Fully oracle-checked (the hybrid oracle chain composes under the
    shared metric CTEs).

    Scale: q_hybrid_retrieval's two top-k legs + the constant-size metric
    arithmetic — evaluating a run costs one extra corpus projection on top
    of producing it."""
    run = q_hybrid_retrieval(spark, sf_dir).select("doc_id", "rrf_ppm")
    ranked = _rank_by_broadcast_count(run, "rrf_ppm", "doc_id", "r").select(
        "doc_id", "r"
    )
    return _ranking_metrics(spark, sf_dir, ranked)


# --- Context packing (RAG prompt assembly) ---------------------------------------
# The last serving step before generation: take the ranked retrieval run
# and pack passages into the model's context window under a token budget.
# Greedy-by-rank prefix packing — the production default (highest-scored
# passages first, stop when the budget is spent). Cumulative token counts
# are monotone, so "prefix under budget" is exactly cum_tokens <= budget.

CP_POOL = 20  # retrieval depth feeding the packer
CP_BUDGET = 512  # context token budget


def _context_pack_oracle() -> str:
    from .text import BM25_QUERY_TERMS, bm25_oracle_sql

    return f"""
    WITH run AS ({bm25_oracle_sql(BM25_QUERY_TERMS, CP_POOL)}),
    ranked AS (
        SELECT doc_id, score_ppm,
               ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS rank
        FROM run
    ),
    sized AS (
        SELECT r.doc_id, r.score_ppm, r.rank,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        FROM ranked r JOIN documents d USING (doc_id)
    ),
    cum AS (
        SELECT doc_id, rank, n_tokens, score_ppm,
               SUM(n_tokens) OVER (ORDER BY rank) AS cum_tokens
        FROM sized
    )
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens, score_ppm
    FROM cum WHERE cum_tokens <= {CP_BUDGET}
    """


@register(
    "q_context_pack",
    oracle=_context_pack_oracle(),
    tags=("serving", "rag", "retrieval", "packing"),
)
def q_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy context packing of the BM25 top-{CP_POOL} under a
    {CP_BUDGET}-token budget: rank passages by (score DESC, doc_id), keep
    the longest prefix whose cumulative whitespace-token count fits. The
    budget deliberately cuts mid-list at every shipped scale factor so the
    packer's boundary behavior is value-checked, not vacuous.

    Scale: the run is a top-k (TakeOrderedAndProject); ranks and the
    cumulative sum are windowless broadcast self-joins over <= CP_POOL
    rows (k^2 constant work — the _rank_by_broadcast_count discipline);
    token counts join the corpus via ONE broadcast of the k-row run into
    the scan. Per query at 100 TB: one retrieval + one pruned projection.
    Query batches ride the same shape keyed by query_id."""
    from .text import BM25_QUERY_TERMS, bm25_topk

    run = bm25_topk(spark, sf_dir, BM25_QUERY_TERMS, CP_POOL).select(
        "doc_id", "score_ppm"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    sized = docs.join(F.broadcast(run), "doc_id")
    # ONE triangular self-join computes rank AND the cumulative token sum
    # (rank = strictly-better count + 1; cum = better tokens + own — the
    # self row always matches, so the join is inner and the run lineage
    # appears exactly twice, the _rank_by_broadcast_count budget).
    other = sized.select(
        F.col("score_ppm").alias("_s2"),
        F.col("doc_id").alias("_d2"),
        F.col("n_tokens").alias("_t2"),
    )
    better_or_self = (
        (F.col("_s2") > F.col("score_ppm"))
        | ((F.col("_s2") == F.col("score_ppm")) & (F.col("_d2") < F.col("doc_id")))
        | (F.col("_d2") == F.col("doc_id"))
    )
    cum = (
        sized.join(F.broadcast(other), better_or_self)
        .groupBy("doc_id", "n_tokens", "score_ppm")
        .agg(
            (
                F.sum(F.when(F.col("_d2") != F.col("doc_id"), 1).otherwise(0)) + 1
            )
            .cast("long")
            .alias("rank"),
            F.sum("_t2").cast("long").alias("cum_tokens"),
        )
    )
    return cum.filter(F.col("cum_tokens") <= CP_BUDGET).select(
        "doc_id", "rank", "n_tokens", "cum_tokens", "score_ppm"
    )


# --- Batched context packing -----------------------------------------------------
# The batched twin: pack EVERY query's context in one pass over the batched
# BM25 run (one postings scan for all queries — text.bm25_batch_topk), with
# the greedy prefix computed per query_id. Completes the serving symmetry:
# batch retrieval -> batch packing, marginal cost per query = its own rows.

CPB_BUDGET = 400  # per-query token budget (cuts mid-list at every shipped sf)


def _context_pack_batch_oracle() -> str:
    from .text import BM25_BATCH_QUERIES, BM25_TOP_K, bm25_batch_oracle_sql

    return f"""
    WITH run AS ({bm25_batch_oracle_sql(BM25_BATCH_QUERIES, BM25_TOP_K)}),
    sized AS (
        SELECT r.query_id, r.doc_id, r.score_ppm, r.rank,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
        FROM run r JOIN documents d USING (doc_id)
    ),
    cum AS (
        SELECT query_id, doc_id, rank, n_tokens, score_ppm,
               SUM(n_tokens) OVER (PARTITION BY query_id ORDER BY rank)
                 AS cum_tokens
        FROM sized
    )
    SELECT query_id, doc_id, rank, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens, score_ppm
    FROM cum WHERE cum_tokens <= {CPB_BUDGET}
    """


@register(
    "q_context_pack_batch",
    oracle=_context_pack_batch_oracle(),
    tags=("serving", "rag", "retrieval", "packing", "batch"),
)
def q_context_pack_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy context packing for a BATCH of queries under a per-query
    {CPB_BUDGET}-token budget: the batched BM25 run (already ranked per
    query) joins document token counts via one broadcast into the scan,
    and the per-query cumulative sum is a triangular broadcast self-join
    on (query_id, rank<=rank) — constant k^2 work per query over the
    <= |queries| x k run rows, never a corpus window. The budget cuts
    mid-list for EVERY query at every shipped scale factor, so each
    query's boundary behavior is value-checked."""
    from .text import BM25_BATCH_QUERIES, BM25_TOP_K, bm25_batch_topk

    run = bm25_batch_topk(spark, sf_dir, BM25_BATCH_QUERIES, BM25_TOP_K).select(
        "query_id", "doc_id", "rank", "score_ppm"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    sized = docs.join(F.broadcast(run), "doc_id")
    other = sized.select(
        F.col("query_id").alias("_q2"),
        F.col("rank").alias("_r2"),
        F.col("n_tokens").alias("_t2"),
    )
    cum = (
        sized.join(
            F.broadcast(other),
            (F.col("_q2") == F.col("query_id")) & (F.col("_r2") <= F.col("rank")),
        )
        .groupBy("query_id", "doc_id", "rank", "n_tokens", "score_ppm")
        .agg(F.sum("_t2").cast("long").alias("cum_tokens"))
    )
    return cum.filter(F.col("cum_tokens") <= CPB_BUDGET).select(
        "query_id", "doc_id", "rank", "n_tokens", "cum_tokens", "score_ppm"
    )

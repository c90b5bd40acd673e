"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Two paths, per the north-star spec:
- brute-force cosine top-k — the exact baseline, oracle-checked bit-for-bit
  against DuckDB;
- random-hyperplane LSH bucketing — the sub-quadratic scale path (candidates
  only within matching sign-buckets), recall-tested against brute force in
  tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot
from ..registry import register
from ..sources.readers import load_table

TOP_K = 5
N_QUERIES = 3  # vec_id < 3 are the query vectors
COSINE_DEDUP_THRESHOLD = 0.8

# DuckDB expression for the identical sequential double dot product.
_DOT = (
    "list_sum(list_transform(range(1, len({a})+1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _duck_cosine(a: str, b: str) -> str:
    d = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({d} / (sqrt({na}) * sqrt({nb})))"


@register(
    "q_ann_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {_duck_cosine("q.qe", "e.embedding")} AS cos_sim
        FROM q, embeddings e
        WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
        FROM scored
    ) AS ranked
    WHERE rank <= {TOP_K}
    """,
    tags=("similarity", "ann"),
)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact ANN baseline. Query vectors
    broadcast against the corpus; per-query top-k via ROW_NUMBER (neighbor_id
    tiebreak → fully deterministic, and the cosine itself is bit-identical
    across engines — see functions/vector.py).

    Scale: O(Q·N) with Q tiny — the broadcast-nested-loop shape is exactly
    right; the corpus side streams once, no shuffle until the (tiny) top-k
    window. For large Q use q_ann_lsh.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = (
        load_table(spark, sf_dir, "embeddings")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


@register(
    "q_embedding_cosine_dedup",
    oracle=f"""
    SELECT a.vec_id AS d1, b.vec_id AS d2,
           {_duck_cosine("a.embedding", "b.embedding")} AS cos_sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND {_duck_cosine("a.embedding", "b.embedding")} >= {COSINE_DEDUP_THRESHOLD}
    """,
    tags=("similarity", "dedup"),
)
def q_embedding_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact baseline, oracle-checked).

    Scale: this is the quadratic baseline that defines correctness; the
    production path at corpus scale is LSH bucketing (q_ann_lsh) which
    generates candidates within buckets only. Kept exact here so the LSH
    variant has a verifiable reference.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("d1"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("d2"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("d1") < F.col("d2"))
        .select("d1", "d2", cosine(F.col("ea"), F.col("eb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= COSINE_DEDUP_THRESHOLD)
    )


LSH_TABLES = 8  # hash tables (union of candidates over tables)
LSH_BITS = 6  # hyperplanes per table → 64 buckets/table


def _hyperplanes(dim: int = 64, n: int = LSH_TABLES * LSH_BITS, seed: int = 42):
    """Deterministic random hyperplanes (driver-side constants, broadcast as
    literals — a few KB regardless of data scale)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim)).tolist()


@register("q_ann_lsh", tags=("similarity", "ann", "lsh"))
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-LSH ANN — the scale path. 8 hash tables × 6 random
    hyperplanes: a vector's bucket in table t is the 6-bit sign pattern of
    its projections (cosine-LSH); candidates are vectors sharing the query's
    bucket in ANY table (for angle θ, hit prob = 1-(1-(1-θ/π)⁶)⁸ — ≈0.96 at
    θ=30°). Top-k is then exact cosine over candidates.

    Rows-only driver check (bucket boundaries are parameter-specific);
    tests measure recall vs q_ann_topk.

    Scale: replaces the O(Q·N) scan with O(Q·candidates); the bucket join is
    a plain equi-join on (table, bucket) Spark shuffles by key. More tables →
    recall, more bits → precision; an IVF variant would swap sign-buckets for
    k-means centroids — same join shape.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    planes = _hyperplanes()
    buckets = []
    for t in range(LSH_TABLES):
        bucket = None
        for j in range(LSH_BITS):
            h = planes[t * LSH_BITS + j]
            proj = dot(F.col("embedding"), F.array(*[F.lit(float(x)) for x in h]))
            bit = F.when(proj > 0, F.shiftleft(F.lit(1), j)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        buckets.append(bucket)
    bucketed = emb.select(
        "vec_id", "embedding", F.posexplode(F.array(*buckets)).alias("table_idx", "bucket")
    )
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), "table_idx", "bucket"
    )
    scored = (
        bucketed.join(F.broadcast(q), ["table_idx", "bucket"])
        .select("vec_id", "embedding", "query_id", "qe")
        .distinct()  # a pair may collide in several tables; dedup before scoring
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


IVF_CELLS = 10
IVF_NPROBE = 3
IVF_KMEANS_ITERS = 3


def train_ivf_quantizer(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """Train the IVF coarse quantizer: distributed Lloyd's k-means over the
    embedding column, expressed in DataFrame ops (assign = argmax centroid
    cosine, map-only; update = per-cell dimension means via posexplode).
    Only the centroids (cells×dim doubles, a few KB) ever reach the driver —
    at 100 TB the assignment/update jobs stay fully distributed.

    Deterministic: init = the lowest-vec_id vectors, fixed iteration count.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = [r.embedding for r in emb.orderBy("vec_id").limit(IVF_CELLS).collect()]
    for _ in range(IVF_KMEANS_ITERS):
        sims = F.array(
            *[cosine(F.col("embedding"), F.array(*[F.lit(float(x)) for x in c])) for c in cents]
        )
        assigned = emb.select(
            "embedding", F.array_position(sims, F.array_max(sims)).alias("cell")
        )
        new = (
            assigned.select("cell", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("c"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("pairs"))
            .select("cell", F.transform("pairs", lambda p: p["c"]).alias("centroid"))
            .collect()
        )
        by_cell = {r.cell: list(r.centroid) for r in new}
        cents = [by_cell.get(i + 1, cents[i]) for i in range(IVF_CELLS)]
    return [[float(x) for x in c] for c in cents]


@register("q_ann_ivf", tags=("similarity", "ann", "ivf"))
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN — the centroid-quantizer alternative to sign-
    LSH: train a k-means coarse quantizer on the corpus, assign every vector
    to its nearest centroid's cell, then search only the query's
    ``nprobe=3`` nearest cells with exact cosine.

    Rows-only driver check; tests verify soundness + returned-score
    correctness and report recall (NOTE: this synthetic embedding table is
    isotropic noise — mean pairwise cosine 0.0, top-neighbor cosine ≈0.3 —
    so no partition-based ANN can reach high recall on it; recall here is
    bounded by ≈nprobe/cells by construction. On genuinely clustered
    embeddings the same operator concentrates neighbors into the probed
    cells.)

    Scale: the quantizer is tiny and broadcast; assignment is a map-only
    argmax; search cost drops from O(Q·N) to O(Q·N·nprobe/cells). This is
    FAISS IVFFlat's layout expressed as DataFrames: cell id = partition key.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_quantizer(spark, sf_dir)
    sims = F.array(
        *[cosine(F.col("embedding"), F.array(*[F.lit(float(x)) for x in c])) for c in cents]
    )
    # cell = argmax centroid cosine (1-based array_position on the max)
    assigned = emb.select(
        "vec_id", "embedding", F.array_position(sims, F.array_max(sims)).alias("cell")
    )
    # queries probe their nprobe nearest cells
    q_sims = F.array_sort(
        F.transform(sims, lambda s, i: F.struct((-s).alias("neg"), (i + 1).alias("cell")))
    )
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.explode(F.slice(q_sims, 1, IVF_NPROBE)).alias("probe"),
        )
        .select("query_id", "qe", F.col("probe.cell").alias("cell"))
    )
    scored = (
        assigned.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", "cos_sim", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )


@register(
    "q_sketch_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    """,
    tags=("sketch",),
)
def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct counting: HyperLogLog++ approx_count_distinct
    next to the exact count, per event_type. Raw sketch estimates are
    engine-specific by construction, so (the q_approx_quantile pattern) the
    compared output carries the exact count plus the sketch folded into a
    deterministic error-bound CHECK — approx within 5% of exact (rsd 0.02)
    — which the oracle states as TRUE. tests/test_sampling_sketches.py
    additionally bounds the raw estimate.

    Scale: the whole point — HLL sketches merge associatively, so the
    distinct count of 100 TB of user_ids costs one map-side sketch per
    partition + a tiny merge, vs the full shuffle an exact count needs.
    """
    events = load_table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", 0.02)
    exact = F.countDistinct("user_id")
    return events.groupBy("event_type").agg(
        exact.alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("approx_within_5pct"),
    )

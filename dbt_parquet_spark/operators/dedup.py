"""Deduplication operators over ``documents`` — exact, n-gram Jaccard,
MinHash+LSH, and SimHash (north-star training-data pipeline surface).

Design for 100 TB: never materialize the all-pairs product. Every near-dup
operator here is  candidate-generation (shared shingle / LSH band / simhash
chunk = an equi-join key)  →  distinct candidate pairs  →  cheap exact
verification on candidates only. All of it is built-in columnar expressions —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table

JACCARD_THRESHOLD = 0.3  # on 5-gram shingle sets (bimodal data: dups ≈0.98, noise <0.1)
NUM_PERM = 64  # minhash permutations
# 32 bands × 2 rows: collision prob at shingle-jaccard j is 1-(1-j²)³². At
# j=0.4 that's ≈0.996 (high recall for the 0.4 threshold); spurious
# candidates from low-j pairs are discarded by the exact verify step.
BAND_ROWS = 2


def token_array(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def shingles(toks: Column, k: int = 5) -> Column:
    """Distinct k-gram shingles of a token array (1-based, matching DuckDB's
    ``range(1, len-k+2)`` + ``list[i]`` idiom — SURVEY §2B string row)."""
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + off) for off in range(k)])
    return F.when(
        F.size(toks) >= k,
        F.array_distinct(F.transform(F.sequence(F.lit(1), F.size(toks) - (k - 1)), gram)),
    ).otherwise(F.array().cast("array<string>"))


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.array_distinct(token_array()).alias("tok_set"),
                       shingles(token_array()).alias("sh"))


def _verify_jaccard(pairs: DataFrame, docs: DataFrame, threshold: float) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs only (the cheap verify
    leg) — the same metric MinHash estimates, so the LSH path's recall is
    governed by the banding s-curve, not a metric mismatch.

    intersection/union are integer counts → the ratio is a bit-deterministic
    double in any engine.
    """
    a = docs.select(F.col("doc_id").alias("d1"), F.col("sh").alias("t1"))
    b = docs.select(F.col("doc_id").alias("d2"), F.col("sh").alias("t2"))
    inter = F.size(F.array_intersect("t1", "t2"))
    union = F.size("t1") + F.size("t2") - inter
    return (
        pairs.join(a, "d1").join(b, "d2")
        .select("d1", "d2", (inter.cast("double") / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


@register(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    tags=("dedup",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy: one representative (min doc_id) per
    distinct text, keyed by md5 so the shuffle moves 16-byte keys, not
    documents. The canonical first pass of every corpus pipeline.

    Scale: one shuffle on the hash key; map-side partial MIN/COUNT.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH docs_t AS (
        SELECT doc_id,
               list_distinct(string_split(text, ' ')) AS tok_set,
               list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 3),
                   i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
                     || ' ' || string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3]
                     || ' ' || string_split(text, ' ')[i+4]
               )) AS sh
        FROM documents
    ),
    exploded AS (SELECT doc_id, unnest(sh) AS s FROM docs_t),
    cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM exploded a JOIN exploded b ON a.s = b.s AND a.doc_id < b.doc_id
    )
    SELECT d1, d2,
           CAST(len(list_filter(x.sh, t -> list_contains(y.sh, t))) AS DOUBLE)
             / (len(x.sh) + len(y.sh)
                - len(list_filter(x.sh, t -> list_contains(y.sh, t)))) AS jaccard
    FROM cand
    JOIN docs_t x ON cand.d1 = x.doc_id
    JOIN docs_t y ON cand.d2 = y.doc_id
    WHERE CAST(len(list_filter(x.sh, t -> list_contains(y.sh, t))) AS DOUBLE)
             / (len(x.sh) + len(y.sh)
                - len(list_filter(x.sh, t -> list_contains(y.sh, t))))
          >= {JACCARD_THRESHOLD}
    """,
    tags=("dedup", "jaccard"),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup pairs, fully deterministic (oracle-checked):
    candidates = pairs sharing ≥1 distinct 5-gram shingle (an equi-join, not
    a cross join; exact blocking — Jaccard>0 requires a shared shingle),
    verified by exact shingle-set Jaccard ≥ 0.3.

    Scale: cost is Σ_shingle freq² — the classic hot-shingle skew. At corpus
    scale, cap shingle document-frequency (drop shingles appearing in > N
    docs: they only generate pairs the verify step rejects) and let AQE
    split skewed join partitions. The shape (explode → equi-join → verify)
    is exactly how it runs on 1000 executors.
    """
    docs = _doc_tokens(spark, sf_dir)
    exploded = docs.select("doc_id", F.explode("sh").alias("s"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    return _verify_jaccard(cand, docs, JACCARD_THRESHOLD)


def minhash_signature(sh: Column, num_perm: int = NUM_PERM) -> list[Column]:
    """num_perm min-hashes of a shingle set. Permutation i is xxhash64 with a
    distinct salt — deterministic across runs and cluster sizes."""
    return [
        F.array_min(F.transform(sh, lambda s: F.xxhash64(F.concat(F.lit(f"mh{i}|"), s)))).alias(
            f"mh_{i}"
        )
        for i in range(num_perm)
    ]


@register("q_dedup_minhash", tags=("dedup", "minhash", "lsh"))
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banded near-dup detection — the sub-quadratic scale path
    for Jaccard dedup (shingle→minhash→band→bucket-join→verify).

    64 permutations, 32 bands × 2 rows (see BAND_ROWS). Candidates
    collide on (band index, band hash); exact shingle Jaccard ≥ 0.3 verifies.
    Driver check is rows-only (hash seeds are engine-specific);
    tests/test_dedup.py asserts candidates ⊆ exact pairs and measures recall
    against q_dedup_ngram_jaccard.

    Scale: signatures are fixed-width (64×8 bytes/doc regardless of doc
    size); band join shuffles 16 short rows per doc. Hot bands (all-identical
    docs) are bounded by the band hash's 64-bit space and AQE skew handling.
    """
    docs = _doc_tokens(spark, sf_dir).filter(F.size("sh") > 0)
    sigs = docs.select("doc_id", *minhash_signature(F.col("sh")))
    n_bands = NUM_PERM // BAND_ROWS
    bands = F.array(
        *[
            F.xxhash64(*[F.col(f"mh_{b * BAND_ROWS + r}") for r in range(BAND_ROWS)])
            for b in range(n_bands)
        ]
    )
    banded = sigs.select("doc_id", F.posexplode(bands).alias("band_idx", "band_hash"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    return _verify_jaccard(cand, docs, JACCARD_THRESHOLD)


@register("q_dedup_simhash", tags=("dedup", "simhash"))
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection: 64-bit signatures from term-frequency-
    weighted token hash bits; near-dups = pairs within Hamming distance 3,
    found by exact-matching one of four 16-bit chunks (pigeonhole: distance
    ≤3 ⇒ at least one of 4 chunks identical — no false negatives for the
    chunk-blocking step).

    Driver check rows-only (engine-specific hash); pytest asserts signature
    properties + symmetry.

    Scale: one groupBy(doc) to build signatures (64 conditional sums,
    map-side partial), then a 4-way chunk equi-join on 2-byte keys.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(token_array()).alias("tok"))
    h = F.xxhash64("tok")
    bit_sums = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(64)
    ]
    per_doc = tok.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseXOR(bit)  # bits are disjoint → XOR == OR
    sigs = per_doc.select("doc_id", sim.alias("simhash"))
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF)).alias(f"c{c}")
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )

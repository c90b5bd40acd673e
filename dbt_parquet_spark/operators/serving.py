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

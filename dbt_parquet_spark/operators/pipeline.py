"""Flagship composed pipeline — the operators chained the way a real corpus
curation job chains them, end-to-end oracle-checked. Demonstrates that the
engine's operators compose into multi-stage plans Catalyst optimizes as one
query (stage fusion, single scan reuse), not just pass individually.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import load_table

MIN_TOKENS = 30
MAX_TOKENS = 90
MIN_DISTINCT_RATIO = 0.25


@register(
    "q_corpus_pipeline",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, source,
               md5(text) AS fp,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct
        FROM documents
    ),
    deduped AS (
        SELECT fp, MIN(doc_id) AS doc_id FROM scored GROUP BY fp
    ),
    kept AS (
        SELECT s.doc_id, s.lang, s.source, s.n_tokens, s.n_distinct
        FROM scored s
        JOIN deduped d ON s.doc_id = d.doc_id
        WHERE s.n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
          AND CAST(s.n_distinct AS DOUBLE) / s.n_tokens >= {MIN_DISTINCT_RATIO}
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
           MIN(doc_id) AS sample_doc
    FROM kept
    GROUP BY lang, source
    """,
    tags=("pipeline", "dedup", "text"),
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation pipeline: fingerprint → exact dedup (keep lowest
    doc_id per content hash) → quality gate (token-count band + lexical
    diversity floor) → per-(lang, source) token accounting. The full shape
    of a pretraining-data prep job, oracle-checked end to end.

    Scale: one scan of documents feeds both the dedup branch (16-byte
    md5 shuffle) and the stats; Catalyst fuses the filters into the scan
    projection. The final rollup is tiny.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        F.md5("text").alias("fp"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    deduped = scored.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = (
        scored.join(deduped, ["fp", "doc_id"])  # representative rows only
        .filter(F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS))
        .filter(F.col("n_distinct").cast("double") / F.col("n_tokens") >= MIN_DISTINCT_RATIO)
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.min("doc_id").alias("sample_doc"),
    )


@register(
    "q_text_normalize",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS clean_text,
           regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS num_masked,
           len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS n_tokens_norm
    FROM documents
    """,
    tags=("text", "normalize"),
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization pass: lowercase + charset filtering, number
    masking, whitespace canonicalization — the pre-tokenization cleanup
    stage of an LLM data pipeline. Map-only, codegen'd, oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    return docs.select(
        "doc_id",
        F.trim(F.regexp_replace(lowered, "[^a-z0-9 ]", "")).alias("clean_text"),
        F.regexp_replace(F.col("text"), "[0-9]+", "<NUM>").alias("num_masked"),
        F.size(
            F.split(F.trim(F.regexp_replace(lowered, r"\s+", " ")), " ")
        ).alias("n_tokens_norm"),
    )

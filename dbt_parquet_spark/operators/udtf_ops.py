"""Python UDTF — user-defined TABLE function (Spark 4): one input row in,
many typed rows out, usable from SQL and the DataFrame API. Completes the
UDF/UDAF/UDTF capability matrix (SURVEY §2B UDF row) alongside the scalar
(grouped.quality_score_batches), grouped-agg (grouped._trimmed_mean), and
grouped-map (grouped._zscore_group) Pandas flavors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..registry import register
from ..sources.readers import load_table

CHUNK_TOKENS = 16
CHUNK_OVERLAP = 4


@udtf(returnType="chunk_idx: int, chunk_text: string, n_tokens: int")
class ChunkDocument:
    """Sliding-window document chunker (16-token windows, 4-token overlap) —
    the RAG/embedding-prep primitive. A UDTF because one document yields a
    variable number of typed chunk rows."""

    def eval(self, text: str):
        if text is None:
            return
        toks = text.split(" ")
        step = CHUNK_TOKENS - CHUNK_OVERLAP
        idx = 0
        for start in range(0, max(len(toks) - CHUNK_OVERLAP, 1), step):
            window = toks[start : start + CHUNK_TOKENS]
            if not window:
                break
            yield idx, " ".join(window), len(window)
            idx += 1


_CHUNK_STEP = CHUNK_TOKENS - CHUNK_OVERLAP

# DuckDB restatement of ChunkDocument.eval: chunk i covers 1-based tokens
# [i*step+1, i*step+CHUNK_TOKENS] (list slices clamp at the end like Python),
# and the chunk count is |range(0, max(n_tokens - overlap, 1), step)| =
# ceil(max(n - overlap, 1) / step). Pure integer logic → fully deterministic.
_CHUNK_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n
        FROM documents WHERE doc_id < 100
    ),
    chunks AS (
        SELECT doc_id, t, n,
               unnest(range(0, CAST(ceil(greatest(n - {CHUNK_OVERLAP}, 1)
                                         / {_CHUNK_STEP}.0) AS BIGINT))) AS i
        FROM toks
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           array_to_string(t[i*{_CHUNK_STEP} + 1 : i*{_CHUNK_STEP} + {CHUNK_TOKENS}], ' ') AS chunk_text,
           CAST(least({CHUNK_TOKENS}, n - i*{_CHUNK_STEP}) AS INTEGER) AS n_tokens
    FROM chunks
"""


@register("q_chunk_udtf", oracle=_CHUNK_ORACLE, tags=("udtf", "text", "chunking"))
def q_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking via the Python UDTF (lateral-join style: each doc
    row expands to its chunk rows). Fully oracle-checked: the sliding-window
    arithmetic is integer-only, so the UDTF rows hash-match the DuckDB
    restatement exactly; tests additionally pin coverage/overlap invariants
    against a python reference.

    Scale: UDTFs run arrow-batched per partition like other Python
    execution; chunking is map-only. For JVM-speed chunking the same logic
    is expressible with sequence+transform — the UDTF form is here to cover
    the extension point itself.
    """
    import uuid

    tag = uuid.uuid4().hex[:8]
    docs = load_table(spark, sf_dir, "documents")
    spark.udtf.register("chunk_document", ChunkDocument)
    docs.select("doc_id", "text").createOrReplaceTempView(f"docs_to_chunk_{tag}")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM docs_to_chunk_{tag} d, LATERAL chunk_document(d.text) c
        WHERE d.doc_id < 100
        """
    )

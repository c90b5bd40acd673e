"""Sequence packing — concatenate documents into fixed-token-budget training
sequences (the last mile of LLM data prep: maximize tokens-per-sequence,
minimize padding).

Greedy first-fit packing is inherently order-dependent imperative logic, so
this is the legitimate mapInPandas use case: each partition packs its own
documents independently (Arrow-batched, no driver involvement), which is
exactly how it parallelizes on a cluster — global optimality is not a goal
of packing, utilization is.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources.readers import load_table

SEQ_BUDGET = 256  # tokens per packed sequence (model context stand-in)

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("pack_key", T.StringType(), False),  # partition-local id
        T.StructField("doc_ids", T.ArrayType(T.LongType()), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("n_tokens", T.IntegerType(), False),
        T.StructField("utilization", T.DoubleType(), False),
    ]
)


def _pack_partition(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
    """Greedy first-fit-decreasing packing within one partition. Documents
    longer than the budget become singleton (truncation-candidate) packs."""
    import pandas as pd

    docs: list[tuple[int, int]] = []
    for pdf in batches:
        docs.extend(zip(pdf["doc_id"].tolist(), pdf["n_tokens"].tolist()))
    docs.sort(key=lambda d: (-d[1], d[0]))  # FFD, deterministic tiebreak

    bins: list[tuple[list[int], int]] = []
    for doc_id, n in docs:
        placed = False
        for i, (ids, used) in enumerate(bins):
            if used + n <= SEQ_BUDGET:
                ids.append(doc_id)
                bins[i] = (ids, used + n)
                placed = True
                break
        if not placed:
            bins.append(([doc_id], n))

    rows = [
        {
            "pack_key": f"p{min(ids)}",  # stable per content, not per partition index
            "doc_ids": sorted(ids),
            "n_docs": len(ids),
            "n_tokens": used,
            "utilization": min(used / SEQ_BUDGET, 1.0),
        }
        for ids, used in bins
    ]
    yield pd.DataFrame(rows, columns=[f.name for f in PACKED_SCHEMA.fields])


@register("q_sequence_packing", tags=("packing", "pandas_udf", "corpus"))
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ≤256-token training sequences with greedy FFD per
    partition. Rows-only driver check; tests assert the packing invariants
    (every doc exactly once; no bin over budget except oversize singletons;
    utilization floor).

    Scale: packing is embarrassingly partition-parallel; repartition count
    controls pack granularity. Token counts ride along as metadata — the
    full pipeline would carry token-id arrays the same way.
    """
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    ).repartition(8, "doc_id")  # deterministic hash placement
    return with_tokens.mapInPandas(_pack_partition, schema=PACKED_SCHEMA)

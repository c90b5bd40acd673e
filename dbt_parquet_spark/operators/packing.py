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


def ffd_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing packing per hash partition (mapInPandas) — the
    utilization-optimal variant; partition-deterministic but not
    SQL-restatable (hash placement). Invariant-tested in
    tests/test_packing.py; the registered query below is the
    oracle-checked greedy form."""
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    ).repartition(8, "doc_id")  # deterministic hash placement
    return with_tokens.mapInPandas(_pack_partition, schema=PACKED_SCHEMA)


N_BUCKETS = 8

GREEDY_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.LongType(), False),
        T.StructField("pack_idx", T.LongType(), False),
        T.StructField("doc_ids", T.StringType(), False),  # JSON array (hashable)
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("utilization", T.DoubleType(), False),
    ]
)


def _greedy_pack_bucket(pdf: "pandas.DataFrame") -> "pandas.DataFrame":  # noqa: F821
    """Sequential greedy packing of one bucket in doc_id order: close the
    bin when the next document doesn't fit. A prefix-dependent recurrence —
    each placement depends on all previous ones — i.e. exactly what windows
    can't express and the grouped-map extension point exists for."""
    import pandas as pd

    pdf = pdf.sort_values("doc_id")
    bucket = int(pdf["bucket"].iloc[0])
    packs: list[tuple[int, list[int], int]] = []
    bin_idx, ids, used = 0, [], 0
    for doc_id, n in zip(pdf["doc_id"].tolist(), pdf["n_tokens"].tolist()):
        if ids and used + n > SEQ_BUDGET:
            packs.append((bin_idx, ids, used))
            bin_idx, ids, used = bin_idx + 1, [], 0
        ids.append(doc_id)
        used += n
    if ids:
        packs.append((bin_idx, ids, used))
    return pd.DataFrame(
        [
            {
                "bucket": bucket,
                "pack_idx": b,
                "doc_ids": "[" + ",".join(str(i) for i in ids) + "]",
                "n_docs": len(ids),
                "n_tokens": used,
                "utilization": min(used / SEQ_BUDGET, 1.0),
            }
            for b, ids, used in packs
        ],
        columns=[f.name for f in GREEDY_SCHEMA.fields],
    )


@register(
    "q_sequence_packing",
    oracle=f"""
    WITH RECURSIVE docs AS (
        SELECT doc_id % {N_BUCKETS} AS bucket, doc_id,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    ordered AS (
        SELECT bucket, doc_id, n,
               row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
        FROM docs
    ),
    state(bucket, rn, doc_id, n, bin, used) AS (
        SELECT bucket, rn, doc_id, n, 0, n FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.bucket, o.rn, o.doc_id, o.n,
               CASE WHEN s.used + o.n <= {SEQ_BUDGET} THEN s.bin ELSE s.bin + 1 END,
               CASE WHEN s.used + o.n <= {SEQ_BUDGET} THEN s.used + o.n ELSE o.n END
        FROM state s JOIN ordered o ON o.bucket = s.bucket AND o.rn = s.rn + 1
    )
    SELECT bucket,
           CAST(bin AS BIGINT) AS pack_idx,
           '[' || array_to_string(list_sort(list(doc_id)), ',') || ']' AS doc_ids,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           least(CAST(SUM(n) AS DOUBLE) / {SEQ_BUDGET}, 1.0) AS utilization
    FROM state
    GROUP BY bucket, bin
    """,
    tags=("packing", "pandas_udf", "corpus"),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ≤256-token training sequences: sequential greedy
    fill in doc_id order within doc_id-modulo buckets, via applyInPandas
    per bucket. FULLY ORACLE-CHECKED despite being a Python extension
    point: the bucket assignment (doc_id % 8) and the greedy recurrence are
    engine-independent, and the oracle restates the same recurrence as a
    DuckDB recursive CTE — every pack's membership, token total and
    utilization must match exactly.

    Scale: one shuffle on the bucket key; each bucket packs independently
    (the recurrence is sequential WITHIN a bucket only). Raise N_BUCKETS to
    shrink per-task state; packs stay deterministic under any resharding
    because bucket+order are data-derived, not layout-derived. Token counts
    ride as metadata — the full pipeline carries token-id arrays the same
    way. ffd_pack above is the utilization-optimal (but layout-coupled)
    alternative.
    """
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        (F.col("doc_id") % N_BUCKETS).alias("bucket"),
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    return with_tokens.groupBy("bucket").applyInPandas(
        _greedy_pack_bucket, schema=GREEDY_SCHEMA
    )


@register("q_bpe_sequence_packing", tags=("packing", "subword", "bpe", "corpus"))
def q_bpe_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sequence_packing with the budget denominated in SUBWORD tokens —
    the unit the context window actually holds. Same deterministic greedy
    recurrence per doc_id-modulo bucket; the weight column is the
    Arrow-batched BPE count (operators/subword.py). Driver check is
    rows-only (BPE is not SQL-expressible); tests/test_subword.py pins the
    packs against a pure-Python recurrence over reference BPE counts.

    Scale: identical to the char twin — one shuffle on the bucket key, the
    no-shuffle UDF weight rides the scan projection.
    """
    from .subword import bpe_token_count_udf

    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select(
        (F.col("doc_id") % N_BUCKETS).alias("bucket"),
        "doc_id",
        bpe_token_count_udf(F.col("text")).alias("n_tokens"),
    )
    return with_tokens.groupBy("bucket").applyInPandas(
        _greedy_pack_bucket, schema=GREEDY_SCHEMA
    )

"""Subword (BPE) tokenization operators.

Everything token-shaped elsewhere in the engine (q_token_count,
q_token_budget_sample, q_sequence_packing) budgets in whitespace tokens or
characters; a real training pipeline budgets in SUBWORD tokens. These
operators apply a deterministic BPE merge table (functions/bpe.py — public
Sennrich-2016 algorithm, fixture merges) and re-express the corpus
accounting primitives in BPE-token units.

BPE application is inherently iterative per word, so this is one of the
few legitimate Python paths in the engine: an Arrow-batched pandas UDF
(never row-at-a-time), with a per-executor word -> count memo — corpus
word frequency follows Zipf, so the memo turns per-word cost amortized
O(1) after the head of the distribution is seen once per executor.

Driver check is rows-only (BPE is not expressible in DuckDB SQL);
tests/test_subword.py pins the UDF against an independent pure-Python
formulation (greedy vs sequential rule application) and pins the budget
sampler against the flat global-window computation, the same local-parity
pattern as minhash/simhash.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..functions.bpe import DEFAULT_MERGES, bpe_encode_word, merge_ranks
from ..registry import register
from ..sources.readers import load_table

_RANKS = merge_ranks(DEFAULT_MERGES)
# Executor-local word -> subword-count memo (Zipf: the head pays once).
_WORD_COUNT_CACHE: dict[str, int] = {}


def _count_text(text: str | None) -> int:
    if not text:
        return 0
    total = 0
    cache = _WORD_COUNT_CACHE
    for w in text.split(" "):
        c = cache.get(w)
        if c is None:
            c = len(bpe_encode_word(w, _RANKS))
            cache[w] = c
        total += c
    return total


# Explicit LongType: a DDL-string return type is parsed lazily and can land
# on an executor (no active session there) when the UDF is defined at module
# import time.
@F.pandas_udf(LongType())
def bpe_token_count_udf(texts: pd.Series) -> pd.Series:
    return texts.map(_count_text)


@register("q_bpe_token_count", tags=("text", "subword", "bpe", "tokens"))
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document subword token count next to the whitespace count — the
    unit a trainer's token budget is actually denominated in. Fertility
    (n_bpe / n_ws) is the corpus-quality diagnostic tokenizer teams watch.

    Scale: one scan, one Arrow-batched pandas UDF (the only Python in the
    plan), no shuffle at all — embarrassingly parallel over input splits.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
        bpe_token_count_udf(F.col("text")).alias("n_bpe_tokens"),
    )


# BPE-token budget for the sampler below: ~40% of sf0.01's ~44k BPE tokens,
# ~4% at sf0.1 — non-vacuous at both test scales.
BPE_BUDGET = 18_000


@register("q_bpe_budget_sample", tags=("corpus", "sample", "budget", "bpe"))
def q_bpe_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_token_budget_sample in SUBWORD units: the deterministic
    BPE-token-budget prefix of the md5-shuffled corpus (docs whose
    preceding cumulative n_bpe_tokens is under BPE_BUDGET — overshoot at
    most one doc, append-stable like the char variant).

    Scale: the per-doc weight is the no-shuffle UDF column; the running
    total is the SAME hierarchical (banded) cumsum as the char variant —
    shared helper corpus.hierarchical_cumsum — so no stage moves the
    corpus to one task (plan-gated: test_plans.test_bpe_budget_sample_
    no_global_window).
    """
    from .corpus import hierarchical_cumsum

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        bpe_token_count_udf(F.col("text")).alias("n_bpe_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    c = hierarchical_cumsum(t, weight="n_bpe_tokens")
    return c.filter(F.col("cum_before") < BPE_BUDGET).select(
        "doc_id",
        "n_bpe_tokens",
        (F.col("cum_before") + F.col("n_bpe_tokens")).cast("long").alias("cum_bpe_tokens"),
    )

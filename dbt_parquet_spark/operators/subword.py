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
from pyspark.sql.types import ArrayType, LongType, StringType

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


# --- BPE merge learning ------------------------------------------------------
BPE_LEARN_MERGES = 24  # merges to learn in q_bpe_learn
BPE_LEARN_MIN_FREQ = 2  # stop when the best pair's corpus frequency drops below


def learn_bpe_merges(word_freqs: DataFrame, n_merges: int, min_freq: int = BPE_LEARN_MIN_FREQ):
    """Learn a BPE merge table from a (word, freq) table — the Sennrich-2016
    training loop, distributed the way it is actually run: pair statistics
    are computed over the WORD-FREQUENCY table (vocabulary-sized, one corpus
    pass to build), never the corpus itself, and the driver holds ONLY the
    growing merge list (KB) plus one argmax row per iteration — the k-means
    discipline (similarity.py) applied to tokenizer training.

    Each iteration: re-segment every word under the current merges (one
    Arrow-batched UDF pass over the persisted vocab table), explode adjacent
    segment pairs weighted by word freq, one groupBy(pair) sum, and a
    deterministic argmax (count desc, pair lexicographic asc) via
    TakeOrdered. Cost: n_merges vocabulary-sized jobs; at web scale the
    vocab table is millions of rows — still a trivial shuffle each round.

    Determinism is pinned against an independently-written pure-Python
    trainer in tests/test_subword.py.
    """
    wf = word_freqs.persist()
    wf.count()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            ranks = {p: i for i, p in enumerate(merges)}

            @F.pandas_udf(ArrayType(StringType()))
            def seg_udf(words: pd.Series) -> pd.Series:
                return words.map(lambda w: list(bpe_encode_word(w, ranks)))

            segs = wf.select("freq", seg_udf(F.col("word")).alias("s"))
            pairs = segs.filter(F.size("s") >= 2).select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("s") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("s"), i).alias("a"),
                            F.element_at(F.col("s"), i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            best = (
                pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not best or best[0].cnt < min_freq:
                break
            merges.append((best[0].a, best[0].b))
    finally:
        wf.unpersist()
    return merges


@register("q_bpe_learn", tags=("text", "subword", "bpe", "train", "iterative"))
def q_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn BPE_LEARN_MERGES merge rules from the corpus and return the
    merge table (rank, left, right) — the tokenizer-training half of the
    subword stack (q_bpe_token_count applies a merges table; this produces
    one). Iterative like connected_components, so the driver check is
    rows-only; exact-parity vs a pure-Python reference trainer is pinned in
    pytest.

    Scale: ONE corpus pass builds the word-frequency table (explode +
    groupBy(word) with map-side partials); the training loop never touches
    the corpus again.
    """
    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    merges = learn_bpe_merges(wf, BPE_LEARN_MERGES)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank: long, left: string, right: string",
    )

"""BPE subword tokenization: fixture well-formedness, greedy-vs-sequential
formulation equivalence, UDF parity against the pure-Python reference, and
the BPE budget sampler pinned to the flat global-window computation (the
minhash-style local-parity pattern for rows-only driver queries)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dbt_parquet_spark.functions.bpe import (
    DEFAULT_MERGES,
    bpe_encode_word,
    bpe_encode_word_sequential,
    merge_ranks,
)

from .conftest import SF_ORACLE

RANKS = merge_ranks(DEFAULT_MERGES)


def test_merges_fixture_well_formed():
    """Each rule's sides must be a single character or the output of an
    EARLIER rule — the invariant that makes greedy and sequential
    application provably identical (functions/bpe.py docstring)."""
    produced: set[str] = set()
    for i, (a, b) in enumerate(DEFAULT_MERGES):
        for side in (a, b):
            assert len(side) == 1 or side in produced, (
                f"rule {i} {(a, b)}: side {side!r} neither char nor earlier output"
            )
        out = a + b
        assert out not in produced, f"rule {i} re-derives {out!r}"
        produced.add(out)


def test_greedy_matches_sequential_on_corpus_words(spark):
    """The two formulations are genuinely different algorithms (lowest-rank
    loop vs one pass down the rule list); they must agree on every distinct
    word of the test corpus plus adversarial constructions."""
    words = {
        r.w
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .collect()
    }
    words |= {"", "a", "tabletable", "thethethe", "xyzzy", "aaaa", "smallest",
              "streaming", "partition", "unsortable", "valuevalue"}
    for w in sorted(words):
        assert bpe_encode_word(w, RANKS) == bpe_encode_word_sequential(w, DEFAULT_MERGES), w


def test_encode_reconstructs_and_compresses():
    for w in ("table", "value", "window", "customer", "streaming", "zq"):
        toks = bpe_encode_word(w, RANKS)
        assert "".join(toks) == w
        assert 1 <= len(toks) <= len(w)
    # fixture coverage: frequent corpus words compress to ONE token
    for w in ("table", "value", "window", "scan", "batch", "spark", "query"):
        assert bpe_encode_word(w, RANKS) == (w,), w


def test_bpe_token_count_udf_matches_reference(spark):
    """The Arrow-batched UDF column must equal per-doc sums of the
    SEQUENTIAL reference applied to the raw text."""
    from dbt_parquet_spark.registry import load_all

    out = {
        r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens)
        for r in load_all()["q_bpe_token_count"].builder(spark, SF_ORACLE).collect()
    }
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select("doc_id", "text").collect()
    assert len(out) == len(docs) > 0
    for r in docs:
        words = r.text.split(" ")
        want = sum(len(bpe_encode_word_sequential(w, DEFAULT_MERGES)) for w in words)
        n_ws, n_bpe = out[r.doc_id]
        assert n_ws == len(words)
        assert n_bpe == want, r.doc_id
        assert len(words) <= n_bpe <= len(r.text)


def test_bpe_budget_sample_matches_flat_window(spark):
    """Hierarchical-cumsum prefix == the flat md5-ordered running sum
    computed driver-side, and the prefix property holds (budget overshoot
    at most one doc; kept set is a hash-order prefix)."""
    from dbt_parquet_spark.operators.subword import BPE_BUDGET, q_bpe_budget_sample

    counts = {
        r.doc_id: sum(
            len(bpe_encode_word_sequential(w, DEFAULT_MERGES)) for w in r.text.split(" ")
        )
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    ordered = sorted(counts, key=lambda d: hashlib.md5(str(d).encode()).hexdigest())
    expect = {}
    cum = 0
    for d in ordered:
        if cum >= BPE_BUDGET:
            break
        cum += counts[d]
        expect[d] = cum
    got = {r.doc_id: r.cum_bpe_tokens for r in q_bpe_budget_sample(spark, SF_ORACLE).collect()}
    assert got == expect
    assert 0 < len(got) < len(counts), "budget vacuous at this scale"


def test_char_budget_sampler_unchanged_by_refactor(spark):
    """The shared-helper refactor must keep q_token_budget_sample
    bit-identical to its oracle (guards the driver-window row)."""
    import duckdb

    from dbt_parquet_spark.registry import load_all

    from .oracle_utils import compare_spark_duckdb

    spec = load_all()["q_token_budget_sample"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{SF_ORACLE}/documents.parquet')"
    )
    ok, msg = compare_spark_duckdb(spec.builder(spark, SF_ORACLE), con, spec.oracle)
    assert ok, msg


def _reference_bpe_train(word_freqs: dict[str, int], n_merges: int, min_freq: int):
    """Independent pure-Python BPE trainer (dict-of-segmentations form, no
    Spark, no shared code with learn_bpe_merges beyond the algorithm)."""
    segs = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = segs[w]
            for pair in zip(s, s[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        # argmax: count desc, pair lexicographic asc
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def test_bpe_learn_matches_reference_trainer(spark):
    """The distributed trainer (re-segment via UDF + pair groupBy + argmax
    per round) must produce EXACTLY the merge list of the reference trainer
    run on the collected word-frequency dict."""
    from dbt_parquet_spark.operators.subword import (
        BPE_LEARN_MERGES,
        BPE_LEARN_MIN_FREQ,
        q_bpe_learn,
    )

    wf = {
        r.word: r.freq
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .count()
        .withColumnRenamed("count", "freq")
        .collect()
    }
    want = _reference_bpe_train(wf, BPE_LEARN_MERGES, BPE_LEARN_MIN_FREQ)
    got = [(r.left, r.right) for r in q_bpe_learn(spark, SF_ORACLE).orderBy("rank").collect()]
    assert got == want
    assert len(got) == BPE_LEARN_MERGES  # corpus is rich enough to fill the budget


def test_bpe_sequence_packing_matches_reference_recurrence(spark):
    """The BPE-weighted packer must equal the pure-Python greedy recurrence
    run over reference BPE counts (same bucket rule, same budget)."""
    from dbt_parquet_spark.operators.packing import N_BUCKETS, SEQ_BUDGET
    from dbt_parquet_spark.registry import load_all

    counts = {
        r.doc_id: sum(
            len(bpe_encode_word_sequential(w, DEFAULT_MERGES)) for w in r.text.split(" ")
        )
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    expect = set()
    for bucket in range(N_BUCKETS):
        members = sorted(d for d in counts if d % N_BUCKETS == bucket)
        bin_idx, ids, used = 0, [], 0
        packs = []
        for d in members:
            n = counts[d]
            if ids and used + n > SEQ_BUDGET:
                packs.append((bin_idx, ids, used))
                bin_idx, ids, used = bin_idx + 1, [], 0
            ids.append(d)
            used += n
        if ids:
            packs.append((bin_idx, ids, used))
        for b, ids, used in packs:
            expect.add((bucket, b, "[" + ",".join(map(str, sorted(ids))) + "]", len(ids), used))
    got = {
        (r.bucket, r.pack_idx, r.doc_ids, r.n_docs, r.n_tokens)
        for r in load_all()["q_bpe_sequence_packing"].builder(spark, SF_ORACLE).collect()
    }
    assert got == expect and len(got) > N_BUCKETS

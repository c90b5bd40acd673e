"""Serving-prep operators (operators/serving.py): chunk coverage/overlap
invariants and quantization fidelity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dbt_parquet_spark.operators.serving import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    q_embedding_quantize,
    q_text_chunks,
)
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_SMALL


def test_chunks_cover_every_token_with_exact_overlap(spark):
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_SMALL, "documents").collect()
    }
    chunks = {}
    for r in q_text_chunks(spark, SF_SMALL).collect():
        chunks.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
        assert r.n_chunk_tokens == len(r.chunk_text.split(" "))
    assert set(chunks) == set(docs)
    for doc_id, toks in docs.items():
        n = len(toks)
        want_k = 1 + max(0, math.ceil((n - CHUNK_TOKENS) / CHUNK_STRIDE))
        got = chunks[doc_id]
        assert set(got) == set(range(want_k))  # dense, deterministic ids
        for k, piece in got.items():
            start = k * CHUNK_STRIDE
            assert piece == toks[start : start + CHUNK_TOKENS]  # exact slice
        # coverage: the last chunk reaches the end of the doc
        assert (want_k - 1) * CHUNK_STRIDE + len(got[want_k - 1]) == n


def test_quantize_reconstructs_cosine_within_bound(spark):
    emb = {
        r.vec_id: r.embedding
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }
    q = {r.vec_id: (r.q_scale, r.codes) for r in q_embedding_quantize(spark, SF_SMALL).collect()}
    assert set(q) == set(emb)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    ids = sorted(emb)[:20]
    for vid in ids:
        scale, codes = q[vid]
        assert scale == max(abs(x) for x in emb[vid])
        assert all(-127 <= c <= 127 for c in codes)
        deq = [c * scale / 127.0 for c in codes]
        # floor-quantization error <= scale/127 per dim; cosine to the
        # original stays near 1 on 64-dim vectors
        assert cos(deq, emb[vid]) > 0.995, vid
    # pairwise cosine drift stays small (the retrieval property)
    for a, b in zip(ids, ids[1:]):
        exact = cos(emb[a], emb[b])
        sa, ca = q[a]
        sb, cb = q[b]
        approx = cos([c * sa / 127.0 for c in ca], [c * sb / 127.0 for c in cb])
        assert abs(exact - approx) < 0.02, (a, b, exact, approx)

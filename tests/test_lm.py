"""Kneser-Ney bigram LM: pure-Python parity pin plus the defining
normalization property (observed discounted mass + backoff weight = 1 per
context)."""

from __future__ import annotations

import math

from dbt_parquet_spark.operators.text import KN_DISCOUNT, q_kneser_ney
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_SMALL


def _py_kn(docs, d=KN_DISCOUNT):
    counts: dict[tuple[str, str], int] = {}
    for r in docs:
        t = r.text.split(" ")
        for a, b in zip(t, t[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    ctx: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1p: dict[str, int] = {}
    for (a, b), c in counts.items():
        ctx[a] = ctx.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1p[b] = n1p.get(b, 0) + 1
    nbt = len(counts)
    out = {}
    for (a, b), c in counts.items():
        p = ((float(c) - d) / float(ctx[a])) + (
            ((d * float(n1f[a])) / float(ctx[a])) * (float(n1p[b]) / float(nbt))
        )
        out[(a, b)] = (c, math.floor(1000000.0 * p))
    return out, ctx, n1f


def test_kneser_ney_matches_pure_python_exactly(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("text").collect()
    expected, _, _ = _py_kn(docs)
    got = {(r.w1, r.w2): (r.c, r.p_kn_ppm) for r in q_kneser_ney(spark, SF_SMALL).collect()}
    assert got == expected


def test_kneser_ney_discounted_mass_plus_backoff_is_one(spark):
    """Per context w1: sum over observed w2 of (c-d)/ctx plus the backoff
    weight lambda(w1) = d*N1+(w1.)/ctx must equal 1 — the property that
    makes interpolated KN a probability distribution once the backoff mass
    is spread over p_cont."""
    docs = load_table(spark, SF_SMALL, "documents").select("text").collect()
    expected, ctx, n1f = _py_kn(docs)
    per_ctx: dict[str, float] = {}
    for (a, _b), (c, _p) in expected.items():
        per_ctx[a] = per_ctx.get(a, 0.0) + (float(c) - KN_DISCOUNT) / float(ctx[a])
    for a, mass in per_ctx.items():
        lam = (KN_DISCOUNT * float(n1f[a])) / float(ctx[a])
        assert abs(mass + lam - 1.0) < 1e-9, a

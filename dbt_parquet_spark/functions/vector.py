"""Vector math over array<float> columns — pure built-in expressions.

Float→double casts are exact and the fold is sequential, so dot products and
norms are bit-identical across engines (verified against DuckDB's
``list_sum(list_transform(...))`` in tests) — which is what makes cosine
similarity oracle-checkable at all.

No UDFs: ``F.aggregate``/``F.zip_with`` run inside codegen; at 100 TB the
dot product is the inner loop, and keeping it JVM-side is a ~100× win over
row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot / (|a| * |b|) — operand order fixed to match the oracle SQL
    exactly (IEEE ops are deterministic given identical operand order)."""
    return dot(a, b) / (norm(a) * norm(b))

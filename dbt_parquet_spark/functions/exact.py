"""Exact-arithmetic helpers for deterministic double aggregation.

Floating-point SUM is order-dependent; Spark's partitioned partial
aggregation visits rows in a different order than a single-threaded engine,
so ``SUM(double)`` is not reproducible across engines (or even across runs
with different partition counts). The testdata's monetary/measure doubles are
exact 2-decimal values, so casting to DECIMAL first makes the aggregation
exact integer arithmetic — identical in Spark and DuckDB, at every scale —
and the final cast back to DOUBLE yields one well-defined nearest double.

This matters at 100 TB, not just for the oracle: exact decimal aggregation is
how you make a distributed pricing rollup reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def dec(col: str | Column, typ: str = DEC) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: str | Column, alias: str) -> Column:
    """Exact SUM of a 2-decimal double, returned as double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Deterministic AVG: exact decimal SUM cast to double, divided by count.

    (Plain AVG(decimal) has engine-specific result scales; sum-then-divide in
    double space is bit-identical across engines given identical sums.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)

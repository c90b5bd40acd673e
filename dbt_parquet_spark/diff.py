"""Table-equality diff — the reference's COLUMNS_EQUAL_SQL
(reference impl.py:251-309) as a composable, lazy DataFrame plan.

The reference builds, in SQL: two scalar COUNT CTEs, a symmetric difference
via 2× EXCEPT + UNION ALL, and a final cross join producing one row with
(row_count_difference, num_mismatched). DuckDB's EXCEPT is set-semantics, so
the Spark translation is ``subtract`` (EXCEPT DISTINCT) — NOT ``exceptAll``.

Used both as a registered query (q_except_diff) and as the test oracle for
materialization round-trips (the same role check_relations_equal plays in the
reference's test suite, reference test_basic.py:51).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def relations_diff(
    df_a: DataFrame,
    df_b: DataFrame,
    columns: list[str] | None = None,
    method: str = "hash",
) -> DataFrame:
    """One-row DataFrame: (row_count_difference, num_mismatched).

    Lazy composition — no driver-side actions. Scale: exactly ONE wide
    shuffle (the union is plan concatenation; both aggregations above it
    have map-side partials).

    ``method="hash"`` (default) groups on a 128-bit content hash (a pair of
    chained xxhash64s over all compared columns) instead of the columns
    themselves, so the shuffle moves 16 bytes per row regardless of table
    width — the formulation that survives a 100 TB × 200-column diff. Two
    distinct rows collide only with p ≈ n²/2¹²⁹ (≈1e-15 even at 10¹² rows),
    in which case the diff under-counts mismatches; ``method="exact"`` keeps
    the full-width grouping for when that bound is not acceptable.
    """
    if columns is not None:
        df_a = df_a.select(*columns)
        df_b = df_b.select(*columns)

    # Single-shuffle formulation of the reference's 2×EXCEPT + UNION ALL +
    # two COUNT CTEs (which would cost four passes over the data): tag each
    # side, union, group once, then fold counts. |A∖B| (set semantics) =
    # #groups present only in A, and symmetrically — identical to EXCEPT
    # DISTINCT both ways. Row counts fall out of the same aggregation free.
    cols = df_a.columns
    tagged = df_a.select(*cols, F.lit(1).alias("_a"), F.lit(0).alias("_b")).unionAll(
        df_b.select(*cols, F.lit(0).alias("_a"), F.lit(1).alias("_b"))
    )
    if method == "hash":
        # hash AFTER the union: unionAll coerces both sides to common column
        # types first, so e.g. an int column re-read from CSV hashes equal to
        # its bigint original (xxhash64 is type-sensitive)
        tagged = tagged.select(
            F.xxhash64(*cols).alias("h1"),
            # second, independent 64 bits: chain the first hash back in
            F.xxhash64(F.xxhash64(*cols), *cols).alias("h2"),
            "_a",
            "_b",
        )
        keys = ["h1", "h2"]
    else:
        keys = cols
    grouped = tagged.groupBy(*keys).agg(
        F.sum("_a").alias("_ca"), F.sum("_b").alias("_cb")
    )
    return grouped.agg(
        (F.sum("_ca") - F.sum("_cb")).alias("row_count_difference"),
        F.count(F.when((F.col("_ca") == 0) | (F.col("_cb") == 0), 1)).alias("num_mismatched"),
    )


def relations_equal(df_a: DataFrame, df_b: DataFrame, columns: list[str] | None = None) -> bool:
    """True iff the two relations are set-equal with equal cardinality
    (the reference harness's pass condition: 0 row diff, 0 mismatches)."""
    row = relations_diff(df_a, df_b, columns).first()
    return row.row_count_difference == 0 and row.num_mismatched == 0

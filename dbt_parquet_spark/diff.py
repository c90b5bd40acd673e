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


def relations_diff(df_a: DataFrame, df_b: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-row DataFrame: (row_count_difference, num_mismatched).

    Lazy composition — no driver-side actions; Spark runs the three
    aggregations as one job. Scale: each subtract is a shuffle on all
    compared columns; for very wide 100 TB tables prefer comparing a
    key + content-hash projection (pass ``columns``).
    """
    if columns is not None:
        df_a = df_a.select(*columns)
        df_b = df_b.select(*columns)

    cnt_a = df_a.agg(F.count(F.lit(1)).alias("num_rows_a"))
    cnt_b = df_b.agg(F.count(F.lit(1)).alias("num_rows_b"))
    mismatch = (
        df_a.subtract(df_b)
        .unionAll(df_b.subtract(df_a))
        .agg(F.count(F.lit(1)).alias("num_mismatched"))
    )
    return (
        cnt_a.crossJoin(cnt_b)
        .crossJoin(mismatch)
        .select(
            (F.col("num_rows_a") - F.col("num_rows_b")).alias("row_count_difference"),
            F.col("num_mismatched"),
        )
    )


def relations_equal(df_a: DataFrame, df_b: DataFrame, columns: list[str] | None = None) -> bool:
    """True iff the two relations are set-equal with equal cardinality
    (the reference harness's pass condition: 0 row diff, 0 mismatches)."""
    row = relations_diff(df_a, df_b, columns).first()
    return row.row_count_difference == 0 and row.num_mismatched == 0

"""Replicates the driver's DuckDB-oracle comparison locally: row count +
column names + order-insensitive, bit-exact value comparison."""

from __future__ import annotations

import datetime
import decimal
import math


def _canon_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "float:nan"
        return f"float:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"num:{v.normalize()}"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"num:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"ts:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((_canon_cell(k), _canon_cell(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    if hasattr(v, "isoformat"):  # pandas.Timestamp
        return f"ts:{v.isoformat()}"
    return f"{type(v).__name__}:{v}"


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (as the driver does), canonicalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_spark_duckdb(spark_df, duck_con, sql: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    cs, cd = canonical_rows(s_cols, s_rows), canonical_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"

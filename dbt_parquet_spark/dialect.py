"""DuckDB-dialect compatibility for model SQL — so a reference user's
dbt-model SQL runs unchanged on the Spark engine ("switch and run").

Spark 4's SQL front-end already accepts most DuckDB-isms the reference's own
repo uses (verified): ``expr::TYPE`` casts (reference
examples/animals/models/animals_str.sql), ``ORDER BY ALL`` (reference
impl.py:241), ``GROUP BY ALL``, ``len(…)``. What remains are DuckDB's
list-function NAMES, registered here as SQL function aliases
(CREATE TEMPORARY FUNCTION … RETURN …) over Spark built-ins.

Known untranslatable gap (documented, not silently wrong): DuckDB list
indexing ``arr[i]`` is 1-based, Spark's is 0-based — rewrite to
``element_at(arr, i)`` (1-based in both) when porting such models.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, returns, body). \\Q…\\E quoting makes split's regex
# separator behave like DuckDB's literal separator.
_COMPAT_FUNCTIONS = {
    "string_split": (
        "(s STRING, sep STRING)",
        "ARRAY<STRING>",
        r"split(s, concat('\\Q', sep, '\\E'))",
    ),
    "string_split_regex": ("(s STRING, sep STRING)", "ARRAY<STRING>", "split(s, sep)"),
    "list_contains": ("(a ARRAY<STRING>, x STRING)", "BOOLEAN", "array_contains(a, x)"),
    "list_distinct": ("(a ARRAY<STRING>)", "ARRAY<STRING>", "array_distinct(a)"),
    "list_sort": ("(a ARRAY<STRING>)", "ARRAY<STRING>", "sort_array(a)"),
    "list_unique": ("(a ARRAY<STRING>)", "INT", "size(array_distinct(a))"),
    "regexp_matches": ("(s STRING, p STRING)", "BOOLEAN", "s RLIKE p"),
    "starts_with": ("(s STRING, p STRING)", "BOOLEAN", "s LIKE concat(p, '%')"),
}


import re

# textual rewrites applied OUTSIDE single-quoted strings: DuckDB types/idioms
# Spark's parser rejects. (name, pattern, replacement)
_REWRITES = (
    ("varchar", re.compile(r"\bVARCHAR\b(?!\s*\()", re.IGNORECASE), "STRING"),
    ("text-type", re.compile(r"::\s*TEXT\b", re.IGNORECASE), "::STRING"),
    ("int-types", re.compile(r"\b(U?HUGEINT)\b", re.IGNORECASE), "DECIMAL(38,0)"),
    # DuckDB len() accepts lists; Spark's is string-only. Rewrite the
    # list-valued compositions (the reference's catalog.sql idiom) to size();
    # bare len(string) stays native.
    (
        "len-of-list",
        re.compile(r"\blen\s*\(\s*(?=(string_split|list_|split|array|collect_))", re.IGNORECASE),
        "size(",
    ),
)


def translate_sql(sql: str) -> str:
    """Rewrite DuckDB-dialect fragments Spark's parser rejects (currently:
    bare VARCHAR/TEXT/HUGEINT types). Quote-aware: single-quoted literals
    pass through untouched."""
    parts = re.split(r"('(?:[^']|'')*')", sql)  # odd indices are string literals
    for i in range(0, len(parts), 2):
        for _, pat, repl in _REWRITES:
            parts[i] = pat.sub(repl, parts[i])
    return "".join(parts)


def register_duckdb_compat(spark: SparkSession) -> list[str]:
    """Register the alias functions on the session (idempotent). Returns the
    registered names."""
    names = []
    for name, (sig, ret, body) in _COMPAT_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURNS {ret} RETURN {body}"
        )
        names.append(name)
    return names

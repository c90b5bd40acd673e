"""dbt_parquet_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of AlexanderVR/dbt-parquet.

The reference (/root/reference) is a dbt adapter whose data model is
filesystem-as-catalog (database = directory, schema = subdirectory, table =
one parquet file; reference relation.py:8-48) and whose entire query surface
is SQL delegated to an embedded DuckDB (reference connections.py:146-162).

This package re-expresses that capability Spark-first:

- ``session``      — tuned SparkSession builder (AQE, Arrow, pushdown).
- ``catalog``      — filesystem-as-catalog layer (schemas/relations/views),
                     mirroring reference util.py:9-44 + relation.py semantics.
- ``materialize``  — CTAS / seed / drop / rename / schema DDL as Spark writes
                     + file ops (reference impl.py + macros/adapters.sql).
- ``diff``         — the table-equality diff (reference impl.py:251-309) as a
                     composable DataFrame plan.
- ``operators``    — the query surface (SURVEY.md §2 Part C) plus the
                     LLM-pipeline extensions (dedup, similarity, text,
                     multimodal).
- ``streaming``    — Structured Streaming equivalents (watermarks, windows).
- ``registry``     — the (query builder, oracle SQL) registry that
                     ``__spark_entry__.py`` exposes to the driver.

Everything is stock Spark DataFrame/SQL — no custom Catalyst rules (SURVEY §4
shows none are needed), no RDDs.
"""

__version__ = "0.1.0"

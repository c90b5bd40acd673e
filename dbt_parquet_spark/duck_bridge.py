"""DuckDB interop bridge (BASELINE.json `spark_approach`: "DataFrame
transformations + DuckDB interop for SQL transforms").

Two directions, both Arrow-mediated (zero-copy columnar, no row pickling):

- ``duckdb_query``: run a DuckDB SQL statement over the catalog's parquet
  files and get the result back as a Spark DataFrame. The pragmatic use at
  scale: driver-side computation of SMALL relations (lookup/config/calendar
  tables, quantizer training data) that then broadcast into Spark plans —
  exactly the reference's embedded-DuckDB role, scoped to driver-sized data.
- ``to_duckdb``: materialize a (small!) Spark result into an in-memory
  DuckDB connection for interactive SQL — the analog of the reference's
  ``dbt run-operation duckdb`` escape hatch (reference impl.py:225-249).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import FilesystemCatalog


def duckdb_query(
    spark: SparkSession, sql: str, catalog: FilesystemCatalog | None = None
) -> DataFrame:
    """Execute SQL in an embedded DuckDB (with every catalog relation
    registered as a view over its parquet path, mirroring reference
    connections.py:79-88) and return the result as a Spark DataFrame.

    The result must fit on the driver — this is for small relations that
    subsequently broadcast, not a distributed execution path.
    """
    import duckdb

    con = duckdb.connect()
    if catalog is not None:
        for schema in catalog.list_schemas():
            for rel in catalog.list_relations(schema):
                path = rel.path + ("/*.parquet" if _is_dir(rel.path) else "")
                con.execute(
                    f'CREATE OR REPLACE VIEW "{rel.view_name}" AS '
                    f"SELECT * FROM parquet_scan('{path}')"
                )
    arrow_table = con.execute(sql).arrow()
    return spark.createDataFrame(arrow_table.to_pandas())


def to_duckdb(df: DataFrame, view_name: str = "spark_result"):
    """Small Spark result → live DuckDB connection (returned) with the data
    registered under ``view_name`` for ad-hoc SQL."""
    import duckdb

    con = duckdb.connect()
    pdf = df.toPandas()  # driver-sized by contract
    con.register(view_name, pdf)
    return con


def _is_dir(path: str) -> bool:
    import os

    return os.path.isdir(path)

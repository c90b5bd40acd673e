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
        register_catalog_views(con, catalog)
    # Direct Arrow -> Spark (supported on Spark 4): the previous pandas
    # hop silently rewrote Arrow types (ns timestamps, nullable ints
    # becoming float64 with NaN) and double-copied the batch.
    return spark.createDataFrame(con.execute(sql).arrow())


# Spark simpleString -> DuckDB type, for the zero-file versioned-view edge
_DUCK_TYPES = {
    "tinyint": "TINYINT", "smallint": "SMALLINT", "int": "INTEGER",
    "bigint": "BIGINT", "float": "FLOAT", "double": "DOUBLE",
    "string": "VARCHAR", "boolean": "BOOLEAN", "date": "DATE",
    "timestamp": "TIMESTAMP", "binary": "BLOB",
}


def register_catalog_views(con, catalog: FilesystemCatalog) -> list[str]:
    """Register every catalog relation as a DuckDB view over its parquet
    path — the reference's connect-time view registration (reference
    connections.py:79-88). Returns the registered view names.

    Versioned roots (manifest-committed tables) physically hold every
    retained version's files plus staged orphans, so their views are built
    over the CURRENT snapshot's explicit file list from the manifest (r12
    advice: a directory glob would union duplicate and stale rows)."""
    names = []
    for schema in catalog.list_schemas():
        for rel in catalog.list_relations(schema):
            if catalog.is_versioned(rel):
                from .versioned import EXTERNAL_PREFIX, _load_manifest

                m = _load_manifest(catalog, rel)
                entry = m["versions"].get(str(m["current"]), {"files": []})

                def _p(f: str) -> str:
                    # shallow-clone external references resolve to their
                    # recorded absolute path (versioned._fpath's rule)
                    if f.startswith(EXTERNAL_PREFIX):
                        return f[len(EXTERNAL_PREFIX):]
                    return f"{rel.path}/{f}"

                files = [_p(f) for f in entry["files"]]
                dv = [_p(f) for f in entry.get("dv", [])]
                if files and dv:
                    # merge-on-read snapshot: anti-join the deletion-vector
                    # sidecars' (file, pos) pairs, the same semantics
                    # versioned._snapshot_read applies Spark-side
                    lst = ", ".join(f"'{f}'" for f in files)
                    dvl = ", ".join(f"'{f}'" for f in dv)
                    cols = ", ".join(f't."{c}"' for c in entry["columns"])
                    body = (
                        f"SELECT {cols} FROM parquet_scan([{lst}], "
                        "filename=1, file_row_number=1) t "
                        f"WHERE NOT EXISTS (SELECT 1 FROM parquet_scan([{dvl}]) d "
                        "WHERE d.file = regexp_extract(t.filename, '[^/]+$') "
                        "AND d.pos = t.file_row_number)"
                    )
                elif files:
                    lst = ", ".join(f"'{f}'" for f in files)
                    body = f"SELECT * FROM parquet_scan([{lst}])"
                else:  # zero-file snapshot: pinned-schema empty view
                    cols = ", ".join(
                        f'CAST(NULL AS {_DUCK_TYPES.get(entry.get("dtypes", {}).get(c, "string"), "VARCHAR")}) AS "{c}"'
                        for c in entry.get("columns", [])
                    ) or "NULL AS _empty"
                    body = f"SELECT {cols} WHERE FALSE"
                con.execute(
                    f'CREATE OR REPLACE VIEW "{rel.view_name}" AS {body}'
                )
                names.append(rel.view_name)
                continue
            # Directory check through the catalog FS (works for URL-rooted
            # databases too); DuckDB itself reads rel.path, so remote
            # schemes additionally need the matching DuckDB extension
            # (httpfs for s3://) loaded in the session.
            is_dir = catalog.io.isdir(catalog.fs_path(rel))
            path = rel.path + ("/*.parquet" if is_dir else "")
            con.execute(
                f'CREATE OR REPLACE VIEW "{rel.view_name}" AS '
                f"SELECT * FROM parquet_scan('{path}')"
            )
            names.append(rel.view_name)
    return names


def interactive_shell(catalog: FilesystemCatalog, in_stream=None, out_stream=None) -> int:
    """The reference's `dbt run-operation duckdb` escape hatch (reference
    impl.py:225-249 + macros/duckdb.sql:1-7): drop the user into a live
    DuckDB session with every catalog relation pre-registered as a view.

    Reads one SQL statement per line (`.exit` / `.quit` / EOF ends the
    session; `.tables` lists the registered views), prints each result via
    DuckDB's table renderer. Streams are injectable for tests.
    """
    import sys

    import duckdb

    fin = in_stream if in_stream is not None else sys.stdin
    fout = out_stream if out_stream is not None else sys.stdout
    con = duckdb.connect()
    views = register_catalog_views(con, catalog)
    interactive = fin is sys.stdin and sys.stdin.isatty()
    print(f"duckdb shell — {len(views)} relation(s) registered as views", file=fout)
    while True:
        if interactive:
            print("duckdb> ", end="", file=fout, flush=True)
        line = fin.readline()
        if not line:
            break
        stmt = line.strip()
        if not stmt:
            continue
        if stmt in (".exit", ".quit", "exit", "quit"):
            break
        if stmt == ".tables":
            for v in sorted(views):
                print(v, file=fout)
            continue
        try:
            rel = con.sql(stmt)
            if rel is not None:  # DDL/SET return None
                print(rel, file=fout)
        except Exception as exc:  # noqa: BLE001 — shell survives bad SQL
            print(f"error: {exc}", file=fout)
    return 0


def to_duckdb(df: DataFrame, view_name: str = "spark_result"):
    """Small Spark result → live DuckDB connection (returned) with the data
    registered under ``view_name`` for ad-hoc SQL."""
    import duckdb

    con = duckdb.connect()
    pdf = df.toPandas()  # driver-sized by contract
    con.register(view_name, pdf)
    return con

"""Filesystem-as-catalog: database = directory, schema = subdirectory,
table = one parquet path.

Mirrors the reference's data model exactly (reference relation.py:8-48,
util.py:9-44, README.md:28-31) with one deliberate extension: a "table" may
be either a single file ``name.parquet`` (reference-compatible layout,
reference relation.py:26-32) or a directory ``name.parquet/`` of part files
(Spark-native layout — the reference's single-file restriction is its
acknowledged scalability ceiling, reference README.md:49).

All listing here is driver-side metadata work, exactly as in the reference
(PyFilesystem listings, no SQL) — it never touches executors.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_SCHEMA = ""  # files directly under the database root (reference util.py:13-16)


@dataclass(frozen=True)
class Relation:
    """Addressing triple, per reference relation.py:51-70: a relation is
    simultaneously (a) a path, (b) a view name, (c) a scannable source."""

    database: str
    schema: str
    table: str

    @property
    def path(self) -> str:
        return os.path.join(self.database, self.schema, f"{self.table}.parquet")

    @property
    def view_name(self) -> str:
        # Reference renders `"schema"."table"` (relation.py:41-48); Spark temp
        # views are flat, so the default schema maps to the bare table name
        # and others to schema__table.
        return self.table if self.schema == DEFAULT_SCHEMA else f"{self.schema}__{self.table}"


class FilesystemCatalog:
    """Catalog over one database directory."""

    def __init__(self, database: str):
        self.database = os.path.abspath(database)  # reference connections.py:33-37 resolves too

    # -- listings (reference util.py:9-44) ---------------------------------
    def list_schemas(self) -> list[str]:
        """All subdirectories plus the default ('') schema
        (reference util.py:9-18)."""
        schemas = [DEFAULT_SCHEMA]
        for entry in sorted(os.listdir(self.database)):
            p = os.path.join(self.database, entry)
            if os.path.isdir(p) and not entry.endswith(".parquet"):
                schemas.append(entry)
        return schemas

    def schema_exists(self, schema: str) -> bool:
        return schema in self.list_schemas()

    def list_relations(self, schema: str = DEFAULT_SCHEMA) -> list[Relation]:
        """``blah.parquet`` (file or part-file dir) ↔ identifier ``blah``
        (reference util.py:21-44)."""
        d = os.path.join(self.database, schema)
        if not os.path.isdir(d):
            return []
        rels = []
        for entry in sorted(os.listdir(d)):
            if entry.endswith(".parquet"):
                rels.append(Relation(self.database, schema, entry[: -len(".parquet")]))
        return rels

    def relation(self, table: str, schema: str = DEFAULT_SCHEMA) -> Relation:
        return Relation(self.database, schema, table)

    # -- DDL as file ops (reference impl.py:59-149) ------------------------
    def create_schema(self, schema: str) -> None:
        os.makedirs(os.path.join(self.database, schema), exist_ok=True)

    def drop_schema(self, schema: str) -> None:
        """rmtree — but refuse the default schema: the reference would wipe
        the database root here (reference impl.py:142-147; SURVEY §4 wart)."""
        if schema == DEFAULT_SCHEMA:
            raise ValueError("refusing to drop the default schema (= database root)")
        shutil.rmtree(os.path.join(self.database, schema), ignore_errors=True)

    def drop_relation(self, rel: Relation, spark: SparkSession | None = None) -> None:
        """Idempotent delete (reference impl.py:59-68)."""
        if os.path.isdir(rel.path):
            shutil.rmtree(rel.path)
        elif os.path.exists(rel.path):
            os.remove(rel.path)
        if spark is not None:
            spark.catalog.dropTempView(rel.view_name)

    def rename_relation(self, src: Relation, dst: Relation, spark: SparkSession | None = None) -> None:
        """File move + view re-registration (reference impl.py:75-85) — the
        atomic-publish building block for write-then-swap materialization."""
        os.makedirs(os.path.dirname(dst.path), exist_ok=True)
        if os.path.exists(dst.path):
            self.drop_relation(dst, spark)
        os.rename(src.path, dst.path)
        if spark is not None:
            spark.catalog.dropTempView(src.view_name)
            self.register_view(spark, dst)

    def truncate_relation(self, rel: Relation) -> None:
        """Explicitly unsupported, matching reference impl.py:70-73."""
        raise NotImplementedError("truncate is not implemented for parquet relations")

    # -- views (reference relation.py:115-122, connections.py:79-88) ------
    def register_view(self, spark: SparkSession, rel: Relation) -> DataFrame:
        from .sources.readers import read_parquet

        df = read_parquet(spark, rel.path)
        df.createOrReplaceTempView(rel.view_name)
        return df

    def register_all_views(self, spark: SparkSession) -> list[Relation]:
        """The reference re-registers every parquet file as a view on connect
        (reference connections.py:79-88). Temp views persist for the session,
        so unlike the reference (relation.py:110-112 wart) this runs once."""
        rels = []
        for schema in self.list_schemas():
            for rel in self.list_relations(schema):
                self.register_view(spark, rel)
                rels.append(rel)
        return rels

    # -- introspection (reference impl.py:97-103, macros/catalog.sql) ------
    def get_columns(self, spark: SparkSession, rel: Relation) -> T.StructType:
        """Footer-only schema read — the Spark analog of the reference's
        `SELECT * … LIMIT 0 → arrow schema` probe (reference impl.py:97-103)."""
        from .sources.readers import read_parquet

        return read_parquet(spark, rel.path).schema

    def catalog_df(self, spark: SparkSession, schemas: list[str] | None = None) -> DataFrame:
        """(schema, table, column, index, type) over every relation — the
        docs-catalog query (reference macros/catalog.sql:1-36) built from
        parquet footers instead of a metadata TVF."""
        rows = []
        for schema in schemas if schemas is not None else self.list_schemas():
            for rel in self.list_relations(schema):
                for idx, fld in enumerate(self.get_columns(spark, rel).fields):
                    rows.append((schema, rel.table, fld.name, idx, fld.dataType.simpleString()))
        out_schema = T.StructType(
            [
                T.StructField("table_schema", T.StringType(), False),
                T.StructField("table_name", T.StringType(), False),
                T.StructField("column_name", T.StringType(), False),
                T.StructField("column_index", T.IntegerType(), False),
                T.StructField("column_type", T.StringType(), False),
            ]
        )
        return spark.createDataFrame(rows, out_schema)

    def docs_artifact(self, spark: SparkSession, out_path: str | None = None) -> dict:
        """dbt-docs ``catalog.json``-shaped artifact (the consumer of the
        reference's catalog macro, reference macros/catalog.sql:5-31): one
        node per relation with column name/index/type plus row-count and
        byte-size stats. Everything comes from parquet FOOTERS — driver-side
        metadata reads, no Spark job, so generating docs over a 100 TB lake
        costs one footer read per table, not a scan.
        """
        import glob
        import json

        import pyarrow.parquet as pq

        def footer_stats(path: str) -> tuple[int, int]:
            files = (
                sorted(glob.glob(os.path.join(path, "*.parquet")))
                if os.path.isdir(path)
                else [path]
            )
            rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
            nbytes = sum(os.path.getsize(f) for f in files)
            return rows, nbytes

        nodes: dict = {}
        for schema in self.list_schemas():
            for rel in self.list_relations(schema):
                n_rows, n_bytes = footer_stats(rel.path)
                columns = {
                    fld.name: {
                        "type": fld.dataType.simpleString(),
                        "index": idx,
                        "name": fld.name,
                        "comment": None,
                    }
                    for idx, fld in enumerate(self.get_columns(spark, rel).fields)
                }
                unique_id = f"model.dbt_parquet_spark.{rel.view_name}"
                nodes[unique_id] = {
                    "metadata": {
                        "type": "BASE TABLE",
                        "schema": schema or "main",
                        "name": rel.table,
                        "database": self.database,
                        "comment": None,
                        "owner": None,
                    },
                    "columns": columns,
                    "stats": {
                        "num_rows": {
                            "id": "num_rows",
                            "label": "# Rows",
                            "value": n_rows,
                            "include": True,
                        },
                        "num_bytes": {
                            "id": "num_bytes",
                            "label": "Approximate Size",
                            "value": n_bytes,
                            "include": True,
                        },
                    },
                    "unique_id": unique_id,
                }
        artifact = {
            "metadata": {
                "dbt_schema_version": "https://schemas.getdbt.com/dbt/catalog/v1.json",
                "generated_by": "dbt_parquet_spark",
            },
            "nodes": nodes,
            "sources": {},
            "errors": None,
        }
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(artifact, fh, indent=2, sort_keys=True)
        return artifact

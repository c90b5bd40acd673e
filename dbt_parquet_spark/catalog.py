"""Filesystem-as-catalog: database = directory, schema = subdirectory,
table = one parquet path.

Mirrors the reference's data model exactly (reference relation.py:8-48,
util.py:9-44, README.md:28-31) with two deliberate extensions:

- a "table" may be either a single file ``name.parquet`` (reference-
  compatible layout, reference relation.py:26-32) or a directory
  ``name.parquet/`` of part files (Spark-native layout — the reference's
  single-file restriction is its acknowledged scalability ceiling,
  reference README.md:49);
- the database may live on ANY pyarrow.fs-reachable filesystem, not just
  local disk: the reference hands its ``database`` config to PyFilesystem's
  ``open_fs`` (reference connections.py:33-37) so any FS URL works; here
  ``fs.resolve_database`` does the same over pyarrow.fs (local, ``s3://``,
  ``gs://``, ``hdfs://``), which is the posture 100 TB actually requires —
  catalog listings, drops, renames and atomic publishes against object
  storage, with Spark reading the same URLs through its Hadoop connectors.

All listing here is driver-side metadata work, exactly as in the reference
(PyFilesystem listings, no SQL) — it never touches executors, and each
listing is a single non-recursive LIST call on object stores.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .fs import CatalogFS, resolve_database

DEFAULT_SCHEMA = ""  # files directly under the database root (reference util.py:13-16)


@dataclass(frozen=True)
class Relation:
    """Addressing triple, per reference relation.py:51-70: a relation is
    simultaneously (a) a path, (b) a view name, (c) a scannable source.

    ``database`` is the catalog's Spark-facing root (absolute local path or
    scheme URL), so ``path`` is directly consumable by ``spark.read``."""

    database: str
    schema: str
    table: str

    @property
    def path(self) -> str:
        return posixpath.join(self.database, self.schema, f"{self.table}.parquet")

    @property
    def view_name(self) -> str:
        # Reference renders `"schema"."table"` (relation.py:41-48); Spark temp
        # views are flat, so the default schema maps to the bare table name
        # and others to schema__table.
        return self.table if self.schema == DEFAULT_SCHEMA else f"{self.schema}__{self.table}"


class FilesystemCatalog:
    """Catalog over one database root (local directory or FS URL)."""

    def __init__(self, database: str):
        self.io: CatalogFS = resolve_database(database)
        # Spark-facing root: local databases normalize to the absolute path
        # (reference connections.py:33-37 resolves too); URL databases keep
        # their spelling (s3 normalized to the Hadoop connector's s3a).
        if self.io.spark_prefix is None:
            self.database = database.rstrip("/")  # metadata-only (memory://)
        else:
            self.database = self.io.spark_url(self.io.root)

    def fs_path(self, rel: Relation) -> str:
        """The relation's location as a pyarrow.fs path (IO spelling)."""
        return self.io.join(self.io.root, rel.schema, f"{rel.table}.parquet")

    def exists(self, rel: Relation) -> bool:
        return self.io.exists(self.fs_path(rel))

    # -- listings (reference util.py:9-44) ---------------------------------
    def list_schemas(self) -> list[str]:
        """All subdirectories plus the default ('') schema
        (reference util.py:9-18)."""
        schemas = [DEFAULT_SCHEMA]
        if not self.io.isdir(self.io.root):
            return schemas
        for entry in self.io.listdir(self.io.root):
            p = self.io.join(self.io.root, entry)
            if self.io.isdir(p) and not entry.endswith(".parquet") and not entry.startswith("."):
                schemas.append(entry)
        return schemas

    def schema_exists(self, schema: str) -> bool:
        return schema in self.list_schemas()

    def list_relations(self, schema: str = DEFAULT_SCHEMA) -> list[Relation]:
        """``blah.parquet`` (file or part-file dir) ↔ identifier ``blah``
        (reference util.py:21-44). Dot-prefixed entries (in-flight tmp
        writes, aside copies from a swap) are invisible."""
        d = self.io.join(self.io.root, schema)
        if not self.io.isdir(d):
            return []
        rels = []
        for entry in self.io.listdir(d):
            if entry.endswith(".parquet") and not entry.startswith("."):
                rels.append(Relation(self.database, schema, entry[: -len(".parquet")]))
        return rels

    def relation(self, table: str, schema: str = DEFAULT_SCHEMA) -> Relation:
        return Relation(self.database, schema, table)

    # -- DDL as file ops (reference impl.py:59-149) ------------------------
    def create_schema(self, schema: str) -> None:
        self.io.makedirs(self.io.join(self.io.root, schema))

    def drop_schema(self, schema: str) -> None:
        """Recursive delete — but refuse the default schema: the reference
        would wipe the database root here (reference impl.py:142-147;
        SURVEY §4 wart)."""
        if schema == DEFAULT_SCHEMA:
            raise ValueError("refusing to drop the default schema (= database root)")
        try:
            self.io.rmtree(self.io.join(self.io.root, schema))
        except FileNotFoundError:
            pass

    def drop_relation(self, rel: Relation, spark: SparkSession | None = None) -> None:
        """Idempotent delete (reference impl.py:59-68)."""
        self.io.remove_any(self.fs_path(rel))
        if spark is not None:
            spark.catalog.dropTempView(rel.view_name)

    def rename_relation(self, src: Relation, dst: Relation, spark: SparkSession | None = None) -> None:
        """File move + view re-registration (reference impl.py:75-85) — the
        atomic-publish building block for write-then-swap materialization.
        (Atomic on local/HDFS renames; copy+delete on object stores — see
        materialize._swap_into_place for ordering.)"""
        dst_path = self.fs_path(dst)
        self.io.makedirs(posixpath.dirname(dst_path))
        if self.io.exists(dst_path):
            self.drop_relation(dst, spark)
        self.io.rename(self.fs_path(src), dst_path)
        if spark is not None:
            spark.catalog.dropTempView(src.view_name)
            self.register_view(spark, dst)

    def truncate_relation(self, rel: Relation) -> None:
        """Explicitly unsupported, matching reference impl.py:70-73."""
        raise NotImplementedError("truncate is not implemented for parquet relations")

    # -- versioned-table detection -----------------------------------------
    def is_versioned(self, rel: Relation) -> bool:
        """True when the relation root is a manifest-versioned table
        (versioned.write_versioned). Such roots physically hold EVERY
        retained version's files plus staged orphans, so generic
        directory-scan surfaces must resolve them through the manifest —
        a plain directory view would union duplicate/stale rows, and a
        file rewrite would corrupt committed history.

        Detection checks the ``_versions.json`` read cache AND the
        authoritative ``_commits/`` log (r12 advice: the cache is written
        AFTER the commit-log put, so a crash between the two on a table's
        first commit would otherwise leave a committed versioned root
        undetected — bypassing the maintenance guards and falling back to
        a directory scan)."""
        from .versioned import COMMITS_DIR, VERSIONS_MANIFEST

        p = self.fs_path(rel)
        if not self.io.isdir(p):
            return False
        if self.io.exists(self.io.join(p, VERSIONS_MANIFEST)):
            return True
        commits = self.io.join(p, COMMITS_DIR)
        return self.io.isdir(commits) and bool(self.io.listdir(commits))

    # -- views (reference relation.py:115-122, connections.py:79-88) ------
    def register_view(self, spark: SparkSession, rel: Relation) -> DataFrame:
        from .sources.readers import read_parquet

        if self.is_versioned(rel):
            from .versioned import read_versioned

            df = read_versioned(spark, self, rel)  # CURRENT snapshot only
        else:
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
        `SELECT * … LIMIT 0 → arrow schema` probe (reference impl.py:97-103).
        Versioned roots resolve through the manifest (the current version's
        pinned schema), never a directory glob over mixed-version files."""
        from .sources.readers import read_parquet

        if self.is_versioned(rel):
            from .versioned import read_versioned

            return read_versioned(spark, self, rel).schema
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
        import json

        import pyarrow.parquet as pq

        def footer_stats(fs_path: str) -> tuple[int, int]:
            if self.io.isdir(fs_path):
                files = [
                    self.io.join(fs_path, e)
                    for e in self.io.listdir(fs_path)
                    if e.endswith(".parquet")
                ]
            else:
                files = [fs_path]
            rows = 0
            nbytes = 0
            for f in files:
                with self.io.open_input(f) as fh:
                    rows += pq.ParquetFile(fh).metadata.num_rows
                nbytes += self.io.getsize(f)
            return rows, nbytes

        nodes: dict = {}
        for schema in self.list_schemas():
            for rel in self.list_relations(schema):
                if self.is_versioned(rel):
                    # manifest metadata is exact and already footer-derived;
                    # a directory walk would double-count retained versions
                    from .versioned import _fpath, _load_manifest

                    m = _load_manifest(self, rel)
                    entry = m["versions"][str(m["current"])]
                    root = self.fs_path(rel)
                    n_rows = entry["rows"]
                    n_bytes = sum(
                        self.io.getsize(_fpath(self.io, root, f))
                        for f in entry["files"]
                    )
                else:
                    n_rows, n_bytes = footer_stats(self.fs_path(rel))
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

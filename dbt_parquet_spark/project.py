"""Project runner — the "dbt run" lifecycle on Spark (SURVEY §3.1).

A project is a set of named SQL models with ``{{ ref('model') }}`` /
``{{ source('schema', 'table') }}`` templating, executed in dependency order
and materialized as parquet tables (reference lifecycle: dbt-core renders
Jinja → ParquetRelation.render() → COPY … TO parquet; reference
relation.py:104-113, macros/adapters.sql:6-12).

Concurrency mirrors the reference's ``threads: N`` model-level parallelism
(reference connections.py:60-111, tests/conftest.py:21): independent models
run simultaneously from a thread pool. SparkSession is thread-safe; each
model submission becomes an independent Spark job, and the scheduler
interleaves their stages — the Spark-native version of dbt's thread pool
over one DuckDB connection.
"""

from __future__ import annotations

import graphlib
import os
import re
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .catalog import DEFAULT_SCHEMA, FilesystemCatalog, Relation
from .materialize import create_table_as

_REF = re.compile(r"\{\{\s*ref\(\s*['\"]([^'\"]+)['\"]\s*\)\s*\}\}")
_SOURCE = re.compile(r"\{\{\s*source\(\s*['\"]([^'\"]*)['\"]\s*,\s*['\"]([^'\"]+)['\"]\s*\)\s*\}\}")


@dataclass
class Model:
    name: str
    sql: str
    schema: str = DEFAULT_SCHEMA

    @property
    def refs(self) -> list[str]:
        return _REF.findall(self.sql)

    @property
    def sources(self) -> list[tuple[str, str]]:
        return _SOURCE.findall(self.sql)


@dataclass
class RunResult:
    model: str
    relation: Relation
    rows: int


class Project:
    """Models + sources over one FilesystemCatalog database."""

    def __init__(self, catalog: FilesystemCatalog, models: list[Model] | None = None):
        self.catalog = catalog
        self.models: dict[str, Model] = {m.name: m for m in (models or [])}

    @classmethod
    def from_dir(cls, catalog: FilesystemCatalog, models_dir: str, schema: str = DEFAULT_SCHEMA) -> "Project":
        """Load every ``*.sql`` file as a model named after the file — the
        dbt models-directory convention (reference examples/animals/models)."""
        models = []
        for fn in sorted(os.listdir(models_dir)):
            if fn.endswith(".sql"):
                with open(os.path.join(models_dir, fn)) as f:
                    models.append(Model(name=fn[:-4], sql=f.read(), schema=schema))
        return cls(catalog, models)

    def add(self, model: Model) -> None:
        self.models[model.name] = model

    # -- compilation -------------------------------------------------------
    def compile_sql(self, model: Model) -> str:
        """Render refs/sources to registered view names (the analog of
        ParquetRelation.render(), reference relation.py:104-113), then apply
        the DuckDB-dialect rewrites (dialect.translate_sql)."""
        from .dialect import translate_sql

        sql = _REF.sub(lambda m: self._model_relation(m.group(1)).view_name, model.sql)
        sql = _SOURCE.sub(
            lambda m: Relation(self.catalog.database, m.group(1), m.group(2)).view_name, sql
        )
        return translate_sql(sql)

    def _model_relation(self, name: str) -> Relation:
        model = self.models[name]
        return self.catalog.relation(model.name, model.schema)

    def dag_order(self) -> list[str]:
        ts = graphlib.TopologicalSorter(
            {name: set(m.refs) for name, m in self.models.items()}
        )
        return list(ts.static_order())

    # -- execution ---------------------------------------------------------
    def select_models(self, select: list[str]) -> list[str]:
        """dbt-style selection: ``name`` picks a model; ``+name`` also picks
        every transitive ancestor. Unknown names raise. Returns the selected
        set; refs to UNSELECTED models resolve to their already-materialized
        tables at run time (dbt's default behavior)."""
        chosen: set[str] = set()

        def ancestors(name: str) -> None:
            for ref in self.models[name].refs:
                if ref in self.models and ref not in chosen:
                    chosen.add(ref)
                    ancestors(ref)

        for raw in select:
            with_parents = raw.startswith("+")
            name = raw.lstrip("+")
            if name not in self.models:
                raise KeyError(f"unknown model in --select: {name}")
            chosen.add(name)
            if with_parents:
                ancestors(name)
        return [n for n in self.models if n in chosen]

    def run(
        self,
        spark: SparkSession,
        threads: int = 4,
        single_file: bool = False,
        select: list[str] | None = None,
    ) -> dict[str, RunResult]:
        """Materialize every model (or the ``select``-ed subset) in DAG
        order, parallelizing independent models across ``threads``
        (reference threads semantics). Source views are registered up front
        (reference connections.py:79-88 registers all existing parquet on
        connect)."""
        from .dialect import register_duckdb_compat

        register_duckdb_compat(spark)  # DuckDB-dialect model SQL runs unchanged
        self.catalog.register_all_views(spark)

        names = self.select_models(select) if select else list(self.models)
        selected = set(names)
        ts = graphlib.TopologicalSorter(
            {n: set(m.refs) & selected for n, m in self.models.items() if n in selected}
        )
        ts.prepare()
        results: dict[str, RunResult] = {}

        def execute(name: str) -> RunResult:
            model = self.models[name]
            if model.schema != DEFAULT_SCHEMA:
                self.catalog.create_schema(model.schema)
            rel = self._model_relation(name)
            df = create_table_as(
                spark, self.catalog, rel, self.compile_sql(model), single_file=single_file
            )
            return RunResult(model=name, relation=rel, rows=df.count())

        futures: dict = {}
        with ThreadPoolExecutor(max_workers=threads) as pool:
            while ts.is_active():
                for name in ts.get_ready():
                    futures[pool.submit(execute, name)] = name
                if not futures:
                    continue
                done, _ = wait(futures, return_when=FIRST_COMPLETED)
                for fut in done:
                    name = futures.pop(fut)
                    results[name] = fut.result()
                    ts.done(name)
        return results

    # -- built-in generic tests (dbt unique / not_null shapes) -------------
    def test_unique(self, spark: SparkSession, model: str, column: str) -> int:
        """Violation count, matching dbt's `unique` test SQL shape
        (GROUP BY x HAVING count(*) > 1)."""
        view = self._model_relation(model).view_name
        return spark.sql(
            f"SELECT {column} FROM {view} GROUP BY {column} HAVING COUNT(*) > 1"
        ).count()

    def test_not_null(self, spark: SparkSession, model: str, column: str) -> int:
        """Violation count (WHERE x IS NULL)."""
        view = self._model_relation(model).view_name
        return spark.sql(f"SELECT 1 FROM {view} WHERE {column} IS NULL").count()

    def test_accepted_values(
        self, spark: SparkSession, model: str, column: str, values: list
    ) -> int:
        """Violation count: rows whose value is outside the accepted list
        (dbt's accepted_values test shape)."""
        from pyspark.sql import functions as F

        view = self._model_relation(model).view_name
        return (
            spark.table(view)
            .filter(~F.col(column).isin(*values) | F.col(column).isNull())
            .count()
        )

    def test_relationships(
        self,
        spark: SparkSession,
        model: str,
        column: str,
        to_model: str,
        to_column: str,
    ) -> int:
        """Violation count: FK values with no parent (dbt's relationships
        test — compiled by dbt as the left-join-where-null pattern; here the
        equivalent anti join)."""
        from pyspark.sql import functions as F

        child = spark.table(self._model_relation(model).view_name)
        parent = spark.table(self._model_relation(to_model).view_name).select(
            F.col(to_column).alias(column)
        )
        return (
            child.filter(F.col(column).isNotNull())
            .join(parent, column, "left_anti")
            .count()
        )

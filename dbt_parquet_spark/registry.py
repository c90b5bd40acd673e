"""Query registry — the contract surface exposed via ``__spark_entry__.py``.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent DuckDB-runnable oracle SQL string.
The driver executes both at sf0.01 and compares row count + schema +
order-insensitive value hash, so:

- every computed column is aliased IDENTICALLY in builder and oracle;
- double aggregations go through exact DECIMAL arithmetic in BOTH engines
  (the testdata's doubles are exact 2-decimal values) and are cast back to
  DOUBLE, making results bit-identical regardless of partitioning /
  summation order — deterministic at any scale factor.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Operator modules that register queries on import.
_OPERATOR_MODULES = (
    "dbt_parquet_spark.operators.relational",
    "dbt_parquet_spark.operators.sql_surface",
    "dbt_parquet_spark.operators.sql_surface2",
    "dbt_parquet_spark.operators.sql_surface3",
    "dbt_parquet_spark.operators.sql_surface4",
    "dbt_parquet_spark.operators.windows",
    "dbt_parquet_spark.operators.lifecycle",
    "dbt_parquet_spark.operators.text",
    "dbt_parquet_spark.operators.dedup",
    "dbt_parquet_spark.operators.similarity",
    "dbt_parquet_spark.operators.multimodal",
    "dbt_parquet_spark.operators.grouped",
    "dbt_parquet_spark.operators.pipeline",
    "dbt_parquet_spark.operators.edge_semantics",
    "dbt_parquet_spark.operators.temporal",
    "dbt_parquet_spark.operators.corpus",
    "dbt_parquet_spark.operators.packing",
    "dbt_parquet_spark.operators.udtf_ops",
    "dbt_parquet_spark.streaming.batch_windows",
)


@dataclass
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query builder, optionally with oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}

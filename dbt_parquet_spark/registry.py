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
    "dbt_parquet_spark.operators.graph",
    "dbt_parquet_spark.operators.sql_surface5",
    "dbt_parquet_spark.operators.sketches",
    "dbt_parquet_spark.streaming.batch_windows",
    "dbt_parquet_spark.streaming.cdf_source",
    "dbt_parquet_spark.operators.subword",
    "dbt_parquet_spark.operators.shards",
    "dbt_parquet_spark.operators.release",
    "dbt_parquet_spark.operators.classifier",
    "dbt_parquet_spark.operators.selection",
    "dbt_parquet_spark.operators.audit",
    "dbt_parquet_spark.operators.layout",
    "dbt_parquet_spark.snapshots",
    "dbt_parquet_spark.operators.serving",
    "dbt_parquet_spark.operators.index_verify",
    "dbt_parquet_spark.operators.gates",
    "dbt_parquet_spark.versioned",
)

# Exposure order for ``queries()`` / ``oracle_sql()``. The driver's
# correctness pass verifies the FIRST 50 registered queries, so the front of
# this list is the verified contract surface. ROTATION POLICY (r12 verdict
# next-round #4): the 18 SURVEY §2C contract queries hold their slots
# permanently; the other 32 slots rotate each round through oracle-backed
# queries the driver has NEVER value-hash-checked (rounds 1-12 verified 80
# distinct names; tests/test_registry_window.py machine-checks the rotation
# against the committed CORRECTNESS_r*.json artifacts). Rotated-OUT queries
# stay registered (after the priority block) and stay held to the identical
# bit-exact comparison locally by tests/test_oracle_parity.py — the rotation
# widens the driver's cumulative coverage, it never weakens anything. Every
# name in the first 50 slots carries oracle SQL — asserted by
# tests/test_registry_window.py — so the checked window contains no weaker
# rows-only entries. Names not listed keep registration order after these.
_PRIORITY = (
    # SURVEY §2C contract queries (18, permanent)
    "q_scan_project_cast",
    "q_filter_in",
    "q_agg_count_star",
    "q_group_having",
    "q_agg_multi",
    "q_join_using",
    "q_join_multi",
    "q_cross_join",
    "q_left_anti",
    "q_union_all",
    "q_except_diff",
    "q_cte_derived",
    "q_orderby_limit",
    "q_string_split_index",
    "q_timestamp_cast",
    "q_window_rank",
    "q_seed_roundtrip",
    "q_schema_introspect",
    # ---- r14 rotation (32 slots, none ever driver-checked in r1-r13) ----
    # versioned lake round-out: the r14 additions (timestamp travel,
    # shallow clone, CDC apply, CHECK constraints), the r13 late-round
    # queries that registered after the r13 window pinned, and Z-order
    "q_time_travel_ts",
    "q_versioned_clone",
    "q_cdc_apply",
    "q_constraint_audit",
    "q_versioned_merge_mor",
    "q_version_changes_feed",
    "q_zorder_layout",
    # materialization / sources
    "q_materialize_roundtrip",
    "q_cluster_roundtrip",
    "q_bucketed_join",
    "q_format_roundtrip",
    "q_partitioned_scan",
    # SQL edge semantics
    "q_full_outer",
    "q_recursive_cte",
    "q_quantified",
    "q_not_in_with_nulls",
    "q_null_safe_eq",
    "q_nulls_ordering",
    "q_limit_offset",
    "q_division_semantics",
    # windows / analytics
    "q_retention",
    "q_event_transitions",
    "q_pct_of_total",
    "q_window_running",
    "q_interpolate",
    # temporal / snapshots
    "q_asof_forward",
    "q_scd2_history",
    "q_pit_join",
    # text analysis
    "q_fingerprint",
    "q_repetition_score",
    # sketches
    "q_kmv_intersection",
    "q_bloom_semi_join",
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
    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}

"""The main correctness gate, run locally: every registered query with an
oracle must match DuckDB bit-exactly (order-insensitive) at sf0.01 — the
same comparison the driver's t2 check performs."""

from __future__ import annotations

import pytest

from dbt_parquet_spark.registry import load_all

from .conftest import SF_ORACLE
from .oracle_utils import compare_spark_duckdb

SPECS = load_all()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle_con, name):
    spec = SPECS[name]
    df = spec.builder(spark, SF_ORACLE)
    ok, msg = compare_spark_duckdb(df, oracle_con, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = SPECS[name]
    df = spec.builder(spark, SF_ORACLE)
    assert len(df.schema.fields) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # every queries() key with an oracle is present in oracle_sql()
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 15

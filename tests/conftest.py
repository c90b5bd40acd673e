from __future__ import annotations

import os

import duckdb
import pytest

from dbt_parquet_spark.session import get_spark
from dbt_parquet_spark.sources.readers import TESTDATA_TABLES, table_path

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    return get_spark("dbt_parquet_spark_tests")


@pytest.fixture(scope="session")
def oracle_con():
    """DuckDB connection with the testdata tables registered as views —
    replicates the driver's oracle environment."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = table_path(SF_ORACLE, t)
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    return con

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
def clustered_emb_dir(tmp_path_factory):
    """A deterministic mixture-of-Gaussians embeddings table (same schema as
    testdata's embeddings.parquet). The shipped synthetic corpus is
    isotropic noise, on which NO partition-pruning ANN can score high recall
    (recall ~ nprobe/cells by construction) — this fixture has real cluster
    structure, so LSH/IVF/PQ recall floors are meaningful: a query's true
    neighbors share its cluster, and a working index must find them."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq

    rng = np.random.default_rng(4242)
    n_clusters, n, dim = 8, 480, 64
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(n) % n_clusters  # vec_id 0,1,2 land in clusters 0,1,2
    # Noise sigma 0.05: per-point noise NORM is sigma*sqrt(dim) ~ 0.4, so
    # same-cluster angles stay ~20 deg — clustered, but not degenerate
    # (at sigma 0.12 the noise norm ~ 1 rivals the unit centers and
    # same-cluster angles reach ~44 deg, starving 6-bit sign-LSH tables).
    pts = centers[labels] + 0.05 * rng.standard_normal((n, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    d = tmp_path_factory.mktemp("clustered_emb")
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                pts.astype(np.float32).tolist(), pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype("int32"), pa.int32()),
        }
    )
    papq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


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

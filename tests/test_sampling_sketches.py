from __future__ import annotations

from dbt_parquet_spark.registry import load_all
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_ORACLE

SPECS = load_all()


def test_sample_reproducible_and_sized(spark):
    a = SPECS["q_sample"].builder(spark, SF_ORACLE).collect()
    b = SPECS["q_sample"].builder(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # seeded → stable
    n_total = load_table(spark, SF_ORACLE, "lineitem").count()
    frac = len(a) / n_total
    assert 0.07 < frac < 0.13  # Bernoulli(0.1) band


def test_approx_quantile_error_bound(spark):
    rows = SPECS["q_approx_quantile"].builder(spark, SF_ORACLE).collect()
    for r in rows:
        rel_err = abs(r.approx_median_price - r.exact_median_price) / r.exact_median_price
        assert rel_err < 0.01, (r.l_returnflag, rel_err)

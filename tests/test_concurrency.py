"""Engine-level concurrency — the reference runs models on 4 threads over
one shared connection (reference tests/conftest.py:21,
tests/functional/basic/test_concurrency.py); the Spark analog is concurrent
query submission against one SparkSession."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from dbt_parquet_spark.registry import load_all

from .conftest import SF_ORACLE

CONCURRENT = [
    "q_agg_count_star",
    "q_group_having",
    "q_join_multi",
    "q_orderby_limit",
    "q_text_stats",
    "q_window_rank",
    "q_filter_in",
    "q_distinct",
    # SQL-front-end queries: unique per-call temp-view names keep these
    # safe under concurrent submission
    "q_cte_derived",
    "q_correlated_subquery",
    "q_grouping_sets",
]


def test_concurrent_query_submission(spark):
    specs = load_all()

    def run(name: str):
        return name, specs[name].builder(spark, SF_ORACLE).count()

    with ThreadPoolExecutor(max_workers=4) as pool:
        results = dict(pool.map(run, CONCURRENT))
    serial = {name: specs[name].builder(spark, SF_ORACLE).count() for name in CONCURRENT}
    assert results == serial
    assert all(v >= 0 for v in results.values())

from __future__ import annotations

from dbt_parquet_spark.operators.udtf_ops import CHUNK_OVERLAP, CHUNK_TOKENS, q_chunk_udtf
from dbt_parquet_spark.sources.pyds import SyntheticDocsDataSource
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_ORACLE


def test_chunk_udtf_invariants(spark):
    chunks = q_chunk_udtf(spark, SF_ORACLE).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_ORACLE, "documents").filter("doc_id < 100").collect()
    }
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(docs)
    step = CHUNK_TOKENS - CHUNK_OVERLAP
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c.chunk_idx)
        toks = docs[doc_id]
        # first chunk starts at token 0; consecutive chunks overlap by CHUNK_OVERLAP
        assert cs[0].chunk_text.split(" ")[: len(toks[:CHUNK_TOKENS])] == toks[:CHUNK_TOKENS]
        for i, c in enumerate(cs):
            want = toks[i * step : i * step + CHUNK_TOKENS]
            assert c.chunk_text.split(" ") == want
            assert c.n_tokens == len(want)
        # full coverage: last chunk reaches the final token
        assert cs[-1].chunk_text.split(" ")[-1] == toks[-1]


def test_python_datasource_reads_partitioned(spark):
    spark.dataSource.register(SyntheticDocsDataSource)
    df = (
        spark.read.format("synthetic_docs")
        .option("rows", 250)
        .option("partitions", 5)
        .load()
    )
    assert df.count() == 250
    assert df.rdd.getNumPartitions() == 5
    assert dict(df.dtypes) == {"doc_id": "bigint", "text": "string", "lang": "string"}
    # deterministic content independent of partitioning
    df2 = (
        spark.read.format("synthetic_docs")
        .option("rows", 250)
        .option("partitions", 2)
        .load()
    )
    assert {tuple(r) for r in df.collect()} == {tuple(r) for r in df2.collect()}

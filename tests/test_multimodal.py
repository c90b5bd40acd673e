from __future__ import annotations

from dbt_parquet_spark.operators.multimodal import (
    _fake_decode,
    as_media_table,
    q_multimodal_extract,
)
from dbt_parquet_spark.sources.readers import load_table

from .conftest import SF_ORACLE


def test_fake_decode_deterministic():
    assert _fake_decode(b"") == {"byte_mean": None, "byte_max": None, "frame_count": 0}
    out = _fake_decode(b"abc")
    assert out["byte_mean"] == (97 + 98 + 99) / 3
    assert out["byte_max"] == 99
    assert _fake_decode(b"abc") == out


def test_media_table_schema(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    media = as_media_table(docs)
    dt = dict(media.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"].startswith("struct<origin:string,content_length:int")
    types = {r.media_type for r in media.select("media_type").distinct().collect()}
    assert types == {"image/png", "audio/wav", "video/mp4"}


def test_extract_matches_local_decode(spark):
    feats = {r.doc_id: r for r in q_multimodal_extract(spark, SF_ORACLE).collect()}
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()
    assert len(feats) == len(docs)
    for d in docs[:25]:
        payload = d.text.encode()
        expect = _fake_decode(payload)
        got = feats[d.doc_id]
        assert got.n_bytes == len(payload)
        assert abs(got.byte_mean - expect["byte_mean"]) < 1e-12
        assert got.frame_count == expect["frame_count"]

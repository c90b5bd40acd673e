"""binaryFile-source media ingestion + exact media dedup + the evidence
table's media leg."""

from __future__ import annotations

import hashlib

from dbt_parquet_spark.operators.multimodal import (
    THUMB_BYTES,
    ingest_binary_dir,
    media_dedup_exact,
)

from .conftest import SF_SMALL

PAYLOADS = {
    "a.bin": b"\x00\x01payload-one" * 40,
    "b.bin": b"\x00\x01payload-one" * 40,  # exact dup of a.bin
    "c.bin": b"\xffdifferent-bytes" * 11,
    "d.bin": b"\x00\x01payload-one" * 40,  # second dup of a.bin
    # NOTE: zero-length files are SKIPPED by Spark file sources (they
    # produce no splits), so an empty media file never reaches the table —
    # pinned below.
    "e.bin": b"",
}


def _write_fixture(tmp_path):
    src = tmp_path / "media_src"
    src.mkdir()
    for name, payload in PAYLOADS.items():
        (src / name).write_bytes(payload)
    (src / "ignored.txt").write_bytes(b"not matched by the glob")
    return src


def test_ingest_binary_dir_and_exact_dedup(spark, tmp_path):
    from dbt_parquet_spark.catalog import FilesystemCatalog

    src = _write_fixture(tmp_path)
    cat = FilesystemCatalog(str(tmp_path / "db"))
    rel = cat.relation("media_raw")
    ingest_binary_dir(spark, cat, rel, str(src), glob="*.bin")

    got = {
        r.file_name: (r.n_bytes, r.content_hash, bytes(r.content))
        for r in spark.read.parquet(rel.path).collect()
    }
    nonempty = {n: p for n, p in PAYLOADS.items() if p}
    assert set(got) == set(nonempty)  # zero-length files produce no splits
    for name, payload in nonempty.items():
        assert got[name] == (
            len(payload),
            hashlib.md5(payload).hexdigest(),
            payload,
        ), name

    clusters = media_dedup_exact(spark.read.parquet(rel.path)).collect()
    assert len(clusters) == 1
    (c,) = clusters
    assert (c.n_copies, c.canonical, list(c.dups)) == (3, "a.bin", ["b.bin", "d.bin"])


def test_ingest_is_deterministic_across_reruns(spark, tmp_path):
    """modificationTime is dropped, so re-ingesting identical bytes yields
    an identical table (content-hash column included)."""
    from dbt_parquet_spark.catalog import FilesystemCatalog

    src = _write_fixture(tmp_path)
    cat = FilesystemCatalog(str(tmp_path / "db"))
    r1, r2 = cat.relation("media_run1"), cat.relation("media_run2")
    ingest_binary_dir(spark, cat, r1, str(src), glob="*.bin")
    (src / "a.bin").touch()  # mtime changes; bytes do not
    ingest_binary_dir(spark, cat, r2, str(src), glob="*.bin")
    rows1 = {tuple(r) for r in spark.read.parquet(r1.path).collect()}
    rows2 = {tuple(r) for r in spark.read.parquet(r2.path).collect()}
    assert rows1 == rows2


def test_evidence_media_leg_matches_thumbnail_collisions(spark):
    """q_dedup_evidence's is_media_dup column must flag exactly the
    thumbnail-hash collision pairs (computed independently here), and the
    leg must be non-vacuous at this SF."""
    from dbt_parquet_spark.operators.dedup import q_dedup_evidence
    from dbt_parquet_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    by_thumb: dict[str, list[int]] = {}
    for r in docs:
        h = hashlib.md5(r.text[:THUMB_BYTES].encode()).hexdigest()
        by_thumb.setdefault(h, []).append(r.doc_id)
    want = {
        (a, b)
        for ids in by_thumb.values()
        for i, a in enumerate(sorted(ids))
        for b in sorted(ids)[i + 1 :]
    }
    assert want, "no thumbnail collisions at this SF — test vacuous"

    out = q_dedup_evidence(spark, SF_SMALL).collect()
    got = {(r.d1, r.d2) for r in out if r.is_media_dup}
    assert got == want
    # the media leg is a distinct signal: at least one media-dup pair
    # carries no exact-equality flag
    assert any(not r.is_exact for r in out if r.is_media_dup)

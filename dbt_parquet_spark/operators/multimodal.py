"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed in Arrow batches via mapInPandas (north-star spec).

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake (see ``_fake_decode``) — but everything
Spark-side is real and tested: the binary column construction, the metadata
struct schema, the Arrow batch shapes, the mapInPandas signature, and the
partition-parallel execution. Swapping ``_fake_decode`` for PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources.readers import load_table

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_max", T.IntegerType(), True),
        T.StructField("frame_count", T.IntegerType(), True),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """DETERMINISTIC FAKE decoder standing in for image/audio decode (the
    real codec libraries are not available in this environment). Computes
    byte statistics so the pipeline has verifiable, stable outputs. Replace
    with e.g. PIL.Image.open(io.BytesIO(payload)) in production."""
    if not payload:
        return {"byte_mean": None, "byte_max": None, "frame_count": 0}
    return {
        "byte_mean": sum(payload) / len(payload),
        "byte_max": max(payload),
        "frame_count": 1 + len(payload) // 64,  # fake "frame sampling" stride
    }


def extract_features(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
    """mapInPandas worker: Arrow batches in, feature rows out. Runs once per
    batch (not per row) — the shape that amortizes Python overhead at scale."""
    import pandas as pd

    for pdf in batches:
        feats = [_fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "media_type": pdf["media_type"],
                "byte_mean": [f["byte_mean"] for f in feats],
                "byte_max": pd.array([f["byte_max"] for f in feats], dtype="Int32"),
                "frame_count": pd.array([f["frame_count"] for f in feats], dtype="Int32"),
            }
        )
        yield out


def as_media_table(docs: DataFrame) -> DataFrame:
    """Model ``documents`` as a multimodal table: payload = utf-8 bytes of
    the text (stand-in for image/audio bytes), plus typed metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").cast("int").alias("content_length"),
        ).alias("meta"),
    )


@register(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           source AS origin,
           CAST(n_chars AS INTEGER) AS content_length
    FROM documents
    """,
    tags=("multimodal",),
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal table's metadata path, oracle-checked: binary payload
    sizes (utf-8 octet length), media-type routing, and the metadata struct
    fields — everything about the binary-column plumbing EXCEPT the decode
    itself is value-verified against DuckDB."""
    media = as_media_table(load_table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),  # length(binary) = octet count
        "media_type",
        F.col("meta.origin").alias("origin"),
        F.col("meta.content_length").alias("content_length"),
    )


@register(
    "q_multimodal_extract",
    oracle="""
    WITH codes AS (
        SELECT doc_id, text,
               octet_length(encode(text)) AS nb,
               list_transform(string_split(text, ''), c -> unicode(c)) AS cps
        FROM documents
    )
    SELECT doc_id,
           CAST(nb AS INTEGER) AS n_bytes,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(list_sum(cps) AS DOUBLE) / nb AS byte_mean,
           CAST(list_max(cps) AS INTEGER) AS byte_max,
           CAST(1 + nb // 64 AS INTEGER) AS frame_count
    FROM codes
    """,
    tags=("multimodal", "pandas_udf"),
)
def q_multimodal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via mapInPandas: build a media table
    (binary payload + media_type + metadata struct), then run the Arrow-
    batched fake decoder per partition.

    ORACLE-CHECKED despite the decoder being a stand-in: the fake decode is
    pure integer byte math (sum/max/stride-count over the payload), and the
    testdata text is ASCII, so DuckDB can restate it as code-point list
    folds — byte_mean's single int/int IEEE divide is bit-identical. The
    decode stays a clearly-marked fake (no codecs in this container); what
    the oracle proves is that the binary plumbing and the Arrow batch path
    deliver exactly the bytes the decoder should see. tests/
    test_multimodal.py additionally asserts schema and determinism.

    Scale: mapInPandas streams Arrow batches executor-side — payloads never
    visit the driver; partition count = parallelism. For 100 TB of media,
    this plus binary-file datasource + payload-size-aware repartitioning is
    the whole pattern.
    """
    docs = load_table(spark, sf_dir, "documents")
    media = as_media_table(docs)
    return media.select("doc_id", "payload", "media_type").mapInPandas(
        extract_features, schema=FEATURE_SCHEMA
    )


# --- Frame sampling (video-style payloads) -----------------------------------
FRAME_BYTES = 32  # fake "frame" size inside a payload
FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_frame_bytes", T.IntegerType(), False),
        T.StructField("frame_sum", T.LongType(), False),
    ]
)


def sample_frames(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
    """mapInPandas worker: one payload row in, one row per SAMPLED frame out
    (a 1->N generator through the Arrow channel — the other direction from
    extract_features' 1->1). The per-frame byte slice + checksum stands in
    for a real frame decode; frame boundaries are pure offset arithmetic
    exactly like fixed-GOP video sampling."""
    import pandas as pd

    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "n_frame_bytes": [], "frame_sum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                fb = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["n_frame_bytes"].append(len(fb))
                out["frame_sum"].append(int(sum(fb)))
        yield pd.DataFrame(
            {
                "doc_id": pd.array(out["doc_id"], dtype="int64"),
                "frame_idx": pd.array(out["frame_idx"], dtype="int32"),
                "n_frame_bytes": pd.array(out["n_frame_bytes"], dtype="int32"),
                "frame_sum": pd.array(out["frame_sum"], dtype="int64"),
            }
        )


@register(
    "q_multimodal_frames",
    oracle=f"""
    WITH codes AS (
        SELECT doc_id, octet_length(encode(text)) AS nb,
               list_transform(string_split(text, ''), c -> unicode(c)) AS cps
        FROM documents
    ),
    frames AS (
        SELECT doc_id, nb, cps,
               unnest(list_filter(range(0, CAST(ceil(nb / {FRAME_BYTES}.0) AS INTEGER)),
                                  i -> i % {FRAME_STRIDE} = 0)) AS fi
        FROM codes
    )
    SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
           CAST(least({FRAME_BYTES}, nb - fi*{FRAME_BYTES}) AS INTEGER) AS n_frame_bytes,
           CAST(list_sum(cps[fi*{FRAME_BYTES}+1 : least(fi*{FRAME_BYTES}+{FRAME_BYTES}, nb)]) AS BIGINT) AS frame_sum
    FROM frames
    """,
    tags=("multimodal", "pandas_udf", "frames"),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling over binary payloads — the video leg of the
    multimodal plumbing: each payload expands to one row per kept frame
    (every {FRAME_STRIDE}th {FRAME_BYTES}-byte slice) through a mapInPandas
    generator, proving the 1->N Arrow batch path (extract_features proves
    1->1). ORACLE-CHECKED like q_multimodal_extract: the fake frame decode
    is pure offset/byte arithmetic, restated in DuckDB as code-point list
    slices over the same ASCII payloads, so the driver value-verifies the
    exact bytes each frame sees. Swap the slice+checksum for an ffmpeg
    keyframe decode and nothing else changes.

    Scale: frames never visit the driver; output row count is
    payload_bytes/(FRAME_BYTES*FRAME_STRIDE) per doc, and partition-local
    expansion keeps memory bounded by one Arrow batch of frames.
    """
    docs = load_table(spark, sf_dir, "documents")
    media = as_media_table(docs)
    return media.select("doc_id", "payload").mapInPandas(
        sample_frames, schema=FRAME_SCHEMA
    )


# --- Binary-file ingestion + media dedup (round 8) ---------------------------
# Real media arrives as FILES, not rows. `ingest_binary_dir` is the front
# door: Spark's binaryFile source (path/length/content per file) -> a catalog
# table with a content hash computed at ingest. Exact media dedup is then a
# hash groupBy over that table; near-dup media uses a deterministic
# "thumbnail" (a fixed-size prefix downsample of the payload — the codec-free
# stand-in for a perceptual hash, same contract: identical thumbnails <=>
# visually-identical media).

THUMB_BYTES = 256  # fake "thumbnail": first N chars of the payload text


def ingest_binary_dir(
    spark: SparkSession,
    catalog,
    rel,
    src_dir: str,
    glob: str = "*",
) -> DataFrame:
    """Ingest a directory of opaque media files into a catalog table via the
    binaryFile source: (file_name, n_bytes, content_hash, content). The
    hash is computed ONCE at ingest (md5 over the raw bytes, JVM-side), so
    every downstream dedup pass scans a 32-char column, never re-reads
    payloads. modificationTime is deliberately dropped — re-ingesting
    identical bytes must produce an identical table. Zero-length files are
    skipped by Spark file sources (no splits) — pinned in
    tests/test_media_ingest.py.

    Scale: binaryFile parallelizes over files (maxPartitionBytes applies);
    the CTAS shuffles nothing — hashing rides the scan. At 100 TB the
    content column lives in parquet page storage and the hash/meta columns
    make metadata-only scans cheap (column pruning skips payload pages).
    """
    from ..materialize import create_table_as

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(src_dir)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file_name"),
            F.col("length").alias("n_bytes"),
            F.md5("content").alias("content_hash"),
            "content",
        )
    )
    return create_table_as(spark, catalog, rel, files)


def media_dedup_exact(media: DataFrame, key: str = "file_name") -> DataFrame:
    """Exact media dedup over an ingested binary table: one row per
    duplicate-content cluster — (content_hash, n_copies, canonical, dups),
    canonical = lexicographically-first member. A pure hash groupBy: the
    payload column is never read (content_hash was computed at ingest), so
    this scans metadata columns only.
    """
    return (
        media.groupBy("content_hash")
        .agg(F.array_sort(F.collect_set(key)).alias("members"))
        .filter(F.size("members") > 1)
        .select(
            "content_hash",
            F.size("members").cast("long").alias("n_copies"),
            F.element_at("members", 1).alias("canonical"),
            F.slice("members", 2, 1_000_000).alias("dups"),
        )
    )


@register(
    "q_media_dedup",
    oracle=f"""
    WITH thumbs AS (
        SELECT doc_id, md5(substr(text, 1, {THUMB_BYTES})) AS thumb_hash
        FROM documents
    ),
    clusters AS (
        SELECT thumb_hash, list_sort(list(doc_id)) AS members
        FROM thumbs GROUP BY thumb_hash HAVING COUNT(*) > 1
    )
    SELECT thumb_hash,
           CAST(len(members) AS BIGINT) AS n_copies,
           members[1] AS canonical_id
    FROM clusters
    """,
    tags=("multimodal", "dedup", "media"),
)
def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup MEDIA clusters by thumbnail hash: payloads whose
    deterministic thumbnail (first {THUMB_BYTES}-char downsample — the
    codec-free perceptual-hash stand-in, module note) collides are the same
    media modulo tail edits. One row per multi-member cluster:
    (thumb_hash, n_copies, canonical_id = smallest doc_id). Oracle-checked:
    the thumbnail is SQL-expressible, so DuckDB verifies every cluster.

    Scale: one groupBy on a 32-char hash — the q_dedup_exact shape; the
    thumbnail is computed in the scan projection (narrow). Cluster arrays
    are near-dup-cluster-sized, never corpus-sized. Swapping the prefix
    downsample for a real perceptual hash (pHash UDF over decoded pixels)
    changes only the hash expression.
    """
    media = as_media_table(load_table(spark, sf_dir, "documents"))
    thumbs = media.select(
        "doc_id",
        F.md5(F.substring(F.col("payload").cast("string"), 1, THUMB_BYTES)).alias(
            "thumb_hash"
        ),
    )
    return (
        thumbs.groupBy("thumb_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("members"))
        .filter(F.size("members") > 1)
        .select(
            "thumb_hash",
            F.size("members").cast("long").alias("n_copies"),
            F.element_at("members", 1).alias("canonical_id"),
        )
    )

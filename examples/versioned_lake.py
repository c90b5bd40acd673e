#!/usr/bin/env python
"""End-to-end versioned-lake lifecycle: the Delta-lite workflow on one table.

    python examples/versioned_lake.py --out /tmp/vlake_demo \
        [--sf-dir /root/testdata/sf0.001]

Stages (each an independently verified operator in versioned.py):
  1. write_versioned        — v1: snapshot the corpus range-clustered by
                              doc_id with declared skipping stats
                              (atomic manifest commit, explicit file list)
  2. write_versioned append — v2: O(delta) append of a new slice (schema-
                              gated; parent files carried by reference)
  3. read_versioned(where=) — data skipping: the manifest's per-file
                              [min, max] prunes non-intersecting files
                              BEFORE Spark opens a footer
  4. merge_versioned        — v3: copy-on-write upsert; only candidate
                              files (update keys inside their stats range)
                              rewrite, the rest carry by reference
  5. delete_versioned       — v4: copy-on-write delete under a prune range
  6. optimize_versioned     — v5: compact the current snapshot into few
                              files (history intact)
  7. time travel + rollback — read any retained snapshot; point current
                              back by metadata commit
  8. vacuum_versions        — prune history, reap superseded files
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dbt_parquet_spark.catalog import FilesystemCatalog
    from dbt_parquet_spark.sources.readers import load_table
    from dbt_parquet_spark.versioned import (
        ConstraintViolationError,
        apply_changes_versioned,
        clone_versioned,
        delete_versioned,
        merge_versioned,
        optimize_versioned,
        read_versioned,
        read_versioned_changes,
        rollback_versioned,
        set_check_constraint,
        vacuum_versions,
        version_at_timestamp,
        version_history,
        write_versioned,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    catalog = FilesystemCatalog(args.out)
    catalog.create_schema("lake")
    rel = catalog.relation("docs", "lake")
    docs = load_table(spark, args.sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )

    # 1. v1: range-clustered snapshot with skipping stats
    base = docs.filter(F.col("doc_id") < 400)
    v1 = write_versioned(
        spark, catalog, rel, base.repartitionByRange(8, "doc_id"),
        stats_cols=("doc_id",),
    )
    print(f"v{v1} committed: {version_history(catalog, rel)[-1]['rows']} rows")

    # 2. v2: O(delta) append
    v2 = write_versioned(
        spark, catalog, rel, docs.filter(F.col("doc_id") >= 400), mode="append"
    )
    print(f"v{v2} appended: {version_history(catalog, rel)[-1]['rows']} rows")

    # 3. data skipping: files pruned manifest-side
    full = read_versioned(spark, catalog, rel)
    pruned = read_versioned(spark, catalog, rel, where={"doc_id": (100, 149)})
    print(
        f"skipping: {len(pruned.inputFiles())} of {len(full.inputFiles())} "
        "files under doc_id in [100, 149]"
    )
    assert len(pruned.inputFiles()) < len(full.inputFiles())

    # 4. v3: copy-on-write merge (re-source a slice + insert new keys)
    updates = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120)).select(
        "doc_id", F.lit("edited").alias("source"), "n_chars"
    )
    v3 = merge_versioned(spark, catalog, rel, updates, key="doc_id")
    h3 = version_history(catalog, rel)[-1]
    print(f"v{v3} merged: {h3['rows']} rows across {h3['n_files']} files")

    # 5. v4: copy-on-write delete under a prune range
    v4 = delete_versioned(
        spark, catalog, rel,
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 210),
        prune={"doc_id": (200, 209)},
    )
    print(f"v{v4} deleted 10 rows: {version_history(catalog, rel)[-1]['rows']} remain")

    # 5b. v4b: merge-on-read delete — deletion vectors, ZERO files rewritten
    pre = version_history(catalog, rel)[-1]["n_files"]
    v4b = delete_versioned(
        spark, catalog, rel,
        (F.col("doc_id") >= 210) & (F.col("doc_id") < 215),
        prune={"doc_id": (210, 214)},
        mode="mor",
    )
    h4b = version_history(catalog, rel)[-1]
    assert h4b["n_files"] == pre  # same data files; only a DV sidecar added
    print(f"v{v4b} MoR-deleted 5 rows via deletion vectors (0 files rewritten)")

    # 5c. change-data-feed between the two delete snapshots
    cdf = read_versioned_changes(spark, catalog, rel, v4, v4b)
    by_type = {r["_change_type"]: r["n"] for r in
               cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert by_type == {"delete": 5}
    print(f"CDF v{v4} -> v{v4b}: {by_type}")

    # 6. v5: optimize (compact small files + fold the DVs away)
    v5 = optimize_versioned(spark, catalog, rel)
    h5 = version_history(catalog, rel)[-1]
    print(f"v{v5} optimized into {h5['n_files']} file(s); deletion vectors compacted")

    # 7. time travel + rollback
    n_v1 = read_versioned(spark, catalog, rel, version=v1).count()
    print(f"time travel: v{v1} still reads {n_v1} rows")
    v6 = rollback_versioned(catalog, rel, v4b)
    print(f"v{v6} rolled back to v{v4b} (deletion vectors restored with it)")

    # 8. vacuum: keep the recent tail, reap the rest
    reaped = vacuum_versions(catalog, rel, keep_last=2)
    kept = [h["version"] for h in version_history(catalog, rel)]
    print(f"vacuum reaped {len(reaped)} file(s); versions kept: {kept}")
    final = read_versioned(spark, catalog, rel)
    n = final.count()
    edited = final.filter(F.col("source") == "edited").count()
    assert edited == 20 and n == version_history(catalog, rel)[-1]["rows"]
    assert final.filter(F.col("doc_id").between(210, 214)).count() == 0
    print(f"OK versioned lake lifecycle complete: {n} rows, {edited} edited")

    # 9. CHECK constraints: the add validates the snapshot; violating
    # writes refuse with per-constraint counts and commit nothing
    set_check_constraint(spark, catalog, rel, "chars_nonneg", "n_chars >= 0")
    try:
        write_versioned(
            spark, catalog, rel,
            spark.createDataFrame([(10**9, "bad", -1)],
                                  "doc_id bigint, source string, n_chars bigint"),
            mode="append",
        )
        raise AssertionError("violating append must refuse")
    except ConstraintViolationError as exc:
        print(f"constraint gate held: {str(exc)[:72]}...")

    # 10. timestamp time travel over the RETAINED tail (vacuum pruned the
    # early history): the oldest kept commit's instant resolves to it
    kept_versions = [h["version"] for h in version_history(catalog, rel)]
    from dbt_parquet_spark.versioned import _load_manifest

    m_now = _load_manifest(catalog, rel)
    oldest_kept = kept_versions[0]
    ts_then = float(m_now["versions"][str(oldest_kept)]["ts"])
    v_then = version_at_timestamp(catalog, rel, ts_then)
    assert v_then == oldest_kept
    print(f"TIMESTAMP AS OF v{oldest_kept}'s commit instant resolves to v{v_then}")

    # 11. shallow clone: zero-copy branch with independent history
    twin = catalog.relation("docs_twin", "lake")
    clone_versioned(catalog, rel, twin)
    write_versioned(
        spark, catalog, twin,
        docs.filter(F.col("doc_id").between(400, 409)), mode="append",
    )
    n_src = read_versioned(spark, catalog, rel).count()
    n_twin = read_versioned(spark, catalog, twin).count()
    assert n_twin == n_src + 10  # twin diverged; source untouched
    print(f"shallow clone: twin {n_twin} rows vs source {n_src} (0 bytes copied)")

    # 12. CDC apply: a replica initialized at the oldest retained version
    # follows the source to current purely via the change feed (here the
    # optimize -> rollback hop nets to zero changes: bag-exact cancel,
    # metadata-only marker commit), then picks up a fresh MoR delete
    replica = catalog.relation("docs_replica", "lake")
    write_versioned(
        spark, catalog, replica,
        read_versioned(spark, catalog, rel, version=oldest_kept),
        stats_cols=("doc_id",),
    )
    apply_changes_versioned(
        spark, catalog, rel, replica, "doc_id", from_version=oldest_kept
    )
    assert read_versioned(spark, catalog, replica).count() == n_src
    marker_v = version_history(catalog, rel)[-1]["version"]
    delete_versioned(
        spark, catalog, rel, F.col("doc_id").between(0, 4),
        prune={"doc_id": (0, 4)}, mode="mor",
    )
    applied = apply_changes_versioned(
        spark, catalog, rel, replica, "doc_id", from_version=marker_v
    )
    n_rep = read_versioned(spark, catalog, replica).count()
    n_src2 = read_versioned(spark, catalog, rel).count()
    assert n_rep == n_src2
    assert apply_changes_versioned(
        spark, catalog, rel, replica, "doc_id", from_version=marker_v
    ) is None  # exactly-once replay skip
    print(
        f"CDC apply: replica follows the source ({n_rep} rows, commit "
        f"{applied}); replay skipped exactly-once"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

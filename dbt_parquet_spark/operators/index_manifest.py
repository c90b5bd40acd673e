"""Manifest-committed ANN index protocol — the object-store-safe commit.

The default index protocol (build/append/compact in operators/similarity.py)
publishes by DIRECTORY RENAME: atomic and duplicate-free on POSIX, but it
has a sub-millisecond window in compaction where a cell directory is absent
between the two renames, and it assumes rename(2) semantics an object store
does not provide (S3 "rename" is copy+delete, neither atomic nor cheap).

This module makes a single small JSON object the source of truth instead:

- ``_manifest.json`` in the index root lists, per cell, the part files that
  constitute the committed snapshot (plus a generation counter and the
  previous generation's retired files).
- READERS resolve the manifest to an explicit file list and scan exactly
  those files (``basePath`` keeps the hive ``cell=`` column). A directory
  listing is never consulted, so files being staged, orphaned by a crash,
  or retired by a compaction are simply invisible — no reader can ever
  observe a half-published state, an absent cell, or a duplicate row.
- WRITERS stage new part files into the live ``cell=`` directories under
  fresh unique names (invisible until committed) and COMMIT by atomically
  replacing the manifest — one ``os.replace`` here; on S3 the same
  single-object PUT (atomic, and read-after-write consistent since 2020).
- Compaction RETIRES the files it replaced: they are recorded in the new
  manifest and physically deleted one generation later (``retired``), so a
  reader that resolved the previous manifest an instant before the commit
  can still finish its scan — the one-generation grace the rename protocol
  cannot offer.

Crash safety, by construction: every mutation is (stage files) then
(replace manifest) then (optionally delete previous generation's retired
files). A crash before the manifest replace leaves orphan files no reader
resolves (reaped by ``manifest_vacuum``); a crash after it leaves the new
snapshot fully committed. There is no crash point that loses bytes a
committed manifest references.

Probe pruning is strictly stronger than PartitionFilters: the probed
cells' files come straight out of the manifest — the scan never lists the
index at all (at 65k cells on an object store, LIST calls are the hidden
tax this removes).

No query registrations here — import-order-neutral (registry invariant).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def _root(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path


def _load(root: str) -> dict:
    with open(os.path.join(root, MANIFEST)) as fh:
        return json.load(fh)


def _commit(root: str, manifest: dict) -> None:
    """Atomically replace the manifest — THE commit point. Staged to a
    dot-file in the same directory first so the replace is same-filesystem
    (os.replace is then one atomic rename syscall)."""
    tmp = os.path.join(root, f".{MANIFEST}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(root, MANIFEST))


def manifest_snapshot(path: str) -> dict:
    """Adopt an existing (listing-protocol) index: snapshot its current
    per-cell part files as generation 1. Idempotent starting point for the
    manifest protocol; the listing protocol must not mutate the index
    afterwards (one protocol owns an index at a time)."""
    root = _root(path)
    cells: dict[str, list[str]] = {}
    for entry in sorted(os.listdir(root)):
        if not entry.startswith("cell="):
            continue
        cell_dir = os.path.join(root, entry)
        files = sorted(
            e for e in os.listdir(cell_dir) if e.endswith(".parquet")
        )
        if files:
            cells[entry[len("cell="):]] = files
    manifest = {"generation": 1, "cells": cells, "retired": []}
    _commit(root, manifest)
    return manifest


def manifest_read(
    spark: SparkSession, path: str, cells: list[int] | None = None
) -> DataFrame:
    """Scan the COMMITTED snapshot: explicit file list from the manifest
    (``cells`` selects probed cells — file-level pruning with zero LIST
    calls), ``basePath`` so the hive ``cell=`` column survives, cast long
    to match read_pq_index's schema."""
    root = _root(path)
    m = _load(root)
    wanted = (
        {str(int(c)) for c in cells} if cells is not None else set(m["cells"])
    )
    files = [
        os.path.join(root, f"cell={c}", f)
        for c in sorted(m["cells"], key=int)
        if c in wanted
        for f in m["cells"][c]
    ]
    if not files:
        # empty selection: an empty frame with the index schema
        return (
            spark.read.option("basePath", root)
            .parquet(os.path.join(root, "cell=*"))
            .withColumn("cell", F.col("cell").cast("long"))
            .limit(0)
        )
    df = spark.read.option("basePath", root).parquet(*files)
    return df.withColumn("cell", F.col("cell").cast("long"))


def _stage_codes(spark: SparkSession, root: str, codes: DataFrame) -> dict[str, list[str]]:
    """Write encoded rows into the live cell dirs under fresh unique names
    WITHOUT committing them: stage to a hidden tree, then move each part
    file in. Returns {cell: [new file names]} for the commit step. Staged
    files are invisible to manifest readers until the commit."""
    staging = os.path.join(root, f".stage_{uuid.uuid4().hex[:8]}")
    codes.write.mode("overwrite").partitionBy("cell").parquet(staging)
    added: dict[str, list[str]] = {}
    import glob as _glob
    import shutil

    for scell in sorted(_glob.glob(os.path.join(staging, "cell=*"))):
        cell = os.path.basename(scell)[len("cell="):]
        dest = os.path.join(root, f"cell={cell}")
        os.makedirs(dest, exist_ok=True)
        for e in sorted(os.listdir(scell)):
            if not (e.startswith("part-") and e.endswith(".parquet")):
                continue
            name = f"staged-{uuid.uuid4().hex[:12]}.parquet"
            os.rename(os.path.join(scell, e), os.path.join(dest, name))
            added.setdefault(cell, []).append(name)
    shutil.rmtree(staging)
    return added


def manifest_append(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    delta: DataFrame,
    before_commit=None,
) -> dict:
    """Incremental add under the manifest protocol: encode the delta with
    the index's sidecar artifacts (frozen add-after-train — exactly
    append_to_pq_index's semantics), stage the files, COMMIT by manifest
    replace. A crash before the commit leaves invisible orphans (vacuum
    reaps them); readers see the old snapshot until the commit and the
    full new one after — never anything in between.

    One MUTATOR at a time (append or compact — the load-merge-replace
    commit is last-writer-wins, so two racing mutators would orphan the
    loser's files); readers never coordinate. ``before_commit`` is a test
    seam invoked after staging."""
    from .kmeans import assign_udf
    from .similarity import _books_literal, _pq_encode

    root = _root(path)
    # resolve through the manifest's artifacts pointer: an append after a
    # manifest_rebuild must encode with the RETRAINED artifacts
    cents, books = manifest_artifacts(spark, sf_dir, path)
    assigned = delta.select(
        "vec_id",
        "embedding",
        assign_udf(cents)(F.col("embedding")).alias("cell"),
    )
    codes = _pq_encode(
        assigned.select("vec_id", "cell", "embedding"),
        _books_literal(books),
        keep_embedding=True,
    )
    added = _stage_codes(spark, root, codes)
    if before_commit is not None:
        before_commit()
    m = _load(root)
    for cell, names in added.items():
        m["cells"].setdefault(cell, [])
        m["cells"][cell] = sorted(m["cells"][cell] + names)
    m["generation"] += 1
    _commit(root, m)
    return m


def manifest_compact(
    spark: SparkSession,
    path: str,
    max_files_per_cell: int = 1,
    before_commit=None,
) -> dict:
    """Compaction with NO absent window and no duplicate window: read each
    fragmented cell's files AS LISTED IN THE MANIFEST (a concurrent
    manifest_append's staged-or-committed files are never read, never
    retired), write the coalesced replacement as staged files in the same
    cell dir, commit a manifest that references the new files and RETIRES
    the old ones, and physically delete the files the PREVIOUS generation
    retired — the one-generation grace window for in-flight readers.

    Single maintainer at a time (the compact_pq_index rule); appends and
    readers need no coordination — an append that commits between this
    function's manifest load and its commit is the one lost-update hazard,
    which the single-maintainer rule plus retry-on-generation-mismatch
    below closes: the commit is aborted and retried if the generation
    moved."""
    import shutil

    root = _root(path)
    while True:
        m = _load(root)
        gen_seen = m["generation"]
        replaced: dict[str, tuple[list[str], list[str]]] = {}
        for cell, files in sorted(m["cells"].items(), key=lambda kv: int(kv[0])):
            if len(files) <= max_files_per_cell:
                continue
            cell_dir = os.path.join(root, f"cell={cell}")
            df = spark.read.parquet(*[os.path.join(cell_dir, f) for f in files])
            staging = os.path.join(root, f".stage_{uuid.uuid4().hex[:8]}")
            df.coalesce(max_files_per_cell).write.mode("overwrite").parquet(staging)
            new_names = []
            for e in sorted(os.listdir(staging)):
                if e.startswith("part-") and e.endswith(".parquet"):
                    name = f"compact-{uuid.uuid4().hex[:12]}.parquet"
                    os.rename(os.path.join(staging, e), os.path.join(cell_dir, name))
                    new_names.append(name)
            shutil.rmtree(staging)
            replaced[cell] = (files, new_names)
        if before_commit is not None:
            before_commit()
        m2 = _load(root)
        if m2["generation"] != gen_seen:
            # an append committed mid-compact: our staged replacements may
            # miss its files — abandon them (invisible orphans; vacuum
            # reaps) and redo against the new snapshot
            continue
        prev_retired = [(c, f) for c, f in m2.get("retired", [])]
        for cell, (old, new) in replaced.items():
            keep = [f for f in m2["cells"][cell] if f not in set(old)]
            m2["cells"][cell] = sorted(keep + new)
        m2["retired"] = [[c, f] for c, (old, _) in replaced.items() for f in old]
        m2["generation"] += 1
        _commit(root, m2)
        # delete what the PREVIOUS generation retired (grace expired)
        for cell, f in prev_retired:
            p = os.path.join(root, f"cell={cell}", f)
            if os.path.exists(p):
                os.remove(p)
        return m2


def manifest_artifacts(spark: SparkSession, sf_dir: str, path: str):
    """The fitted (centroids, codebooks) that match a manifest index's
    committed codes. A manifest_rebuild commits a POINTER to a fresh
    generation-stamped artifacts file inside the same atomic manifest
    replace (a bare sidecar overwrite would race readers: new artifacts
    visible with the old codes still committed). Pre-rebuild manifests
    carry no pointer — fall back to the plain sidecar / memoized trainers."""
    root = _root(path)
    if os.path.exists(os.path.join(root, MANIFEST)):
        m = _load(root)
        if m.get("artifacts"):
            with open(os.path.join(root, m["artifacts"])) as fh:
                a = json.load(fh)
            return a["centroids"], a["codebooks"]
    from .similarity import _index_artifacts

    return _index_artifacts(spark, sf_dir, path)


def manifest_rebuild(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    before_commit=None,
) -> dict:
    """Full offline rebuild under the manifest protocol: retrain the
    quantizer and codebooks on the index's CURRENT committed contents
    (spread inits — the rebuild exists because the distribution drifted),
    re-encode every row, stage the replacement files into the new cell
    layout, and COMMIT a manifest that references only the new files,
    RETIRES every old file (one-generation reader grace, as compaction),
    and points at a fresh generation-stamped artifacts file — so the
    artifacts swap rides the same atomic commit as the codes swap; a
    reader can never pair retrained artifacts with old codes or vice
    versa. Physically deletes what the previous generation retired.

    Single maintainer at a time; a concurrent manifest_append moving the
    generation aborts the commit and the rebuild redoes against the new
    snapshot (abandoned stages are invisible orphans for vacuum)."""
    from .kmeans import assign_udf
    from .similarity import (
        _books_literal,
        _pq_encode,
        fit_ivf_quantizer,
        fit_pq_codebooks,
    )

    root = _root(path)
    while True:
        gen_seen = _load(root)["generation"]
        rows = manifest_read(spark, path).select("vec_id", "embedding").persist()
        rows.count()  # barrier: retrain + encode read this frame many times
        try:
            cents = fit_ivf_quantizer(rows, spread=True)
            books = fit_pq_codebooks(rows, spread=True)
            assigned = rows.select(
                "vec_id",
                "embedding",
                assign_udf(cents)(F.col("embedding")).alias("cell"),
            )
            codes = _pq_encode(
                assigned.select("vec_id", "cell", "embedding"),
                _books_literal(books),
                keep_embedding=True,
            )
            added = _stage_codes(spark, root, codes)
        finally:
            rows.unpersist()
        art_name = f"_ann_artifacts.{uuid.uuid4().hex[:12]}.json"
        with open(os.path.join(root, art_name), "w") as fh:
            json.dump({"centroids": cents, "codebooks": books}, fh)
        if before_commit is not None:
            before_commit()
        m2 = _load(root)
        if m2["generation"] != gen_seen:
            continue  # an append moved the snapshot: redo against it
        prev_retired = [(c, f) for c, f in m2.get("retired", [])]
        new_manifest = {
            "generation": gen_seen + 1,
            "cells": {c: sorted(ns) for c, ns in added.items()},
            "retired": [
                [c, f] for c, files in sorted(m2["cells"].items()) for f in files
            ],
            "artifacts": art_name,
        }
        _commit(root, new_manifest)
        for cell, f in prev_retired:
            p = os.path.join(root, f"cell={cell}", f)
            if os.path.exists(p):
                os.remove(p)
        return new_manifest


def manifest_vacuum(path: str) -> list[str]:
    """Reap files no committed manifest references: crash orphans from
    aborted stages and compactions, plus expired retirees. Never touches a
    file the current manifest lists (live) or names in ``retired`` (still
    inside the grace window). Returns the deleted paths."""
    import glob as _glob
    import shutil

    root = _root(path)
    m = _load(root)
    live = {
        (c, f) for c, files in m["cells"].items() for f in files
    } | {(c, f) for c, f in m.get("retired", [])}
    deleted: list[str] = []
    for stage in _glob.glob(os.path.join(root, ".stage_*")):
        shutil.rmtree(stage)
        deleted.append(stage)
    for cell_dir in _glob.glob(os.path.join(root, "cell=*")):
        cell = os.path.basename(cell_dir)[len("cell="):]
        for e in os.listdir(cell_dir):
            if e.endswith(".parquet") and (cell, e) not in live:
                os.remove(os.path.join(cell_dir, e))
                deleted.append(os.path.join(cell_dir, e))
    # generation-stamped artifacts files superseded by a later rebuild
    # (the plain _ann_artifacts.json pre-manifest sidecar is never touched)
    for art in _glob.glob(os.path.join(root, "_ann_artifacts.*.json")):
        if os.path.basename(art) != m.get("artifacts"):
            os.remove(art)
            deleted.append(art)
    return deleted

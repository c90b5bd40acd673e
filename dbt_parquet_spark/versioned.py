"""Versioned tables: manifest-committed materialization with time travel.

``materialize.create_table_as`` publishes by directory swap — atomic on
POSIX, destructive by design (the previous version is deleted). This module
is the lake-table upgrade the 100 TB posture wants for REPLACEABLE serving
tables: every write is a new immutable SNAPSHOT committed by atomically
replacing one small JSON manifest, so

- readers resolve the manifest to an explicit file list and scan exactly
  those files — a reader that resolved version N keeps a consistent view
  even while version N+1 commits (no rename window, no half-published
  state, zero LIST calls on object stores);
- every historical version stays addressable (``read_versioned(...,
  version=k)`` — time travel) until ``vacuum_versions`` reaps it;
- ``append`` writes ONLY the delta files (the new version's file list is
  parent files + staged files — O(delta) data IO, O(1) commit);
- ``rollback`` is a pure metadata commit: a new version whose file list is
  the target version's.

This intentionally mirrors the ANN index's manifest protocol
(operators/index_manifest.py) — same commit primitive
(``CatalogFS.put_json_if_absent`` on a generation-numbered commit log:
local ``os.link`` create-exclusive / object-store conditional PUT), same
crash story: a crash before the manifest commit leaves invisible staged
orphans (reaped by vacuum), a crash after it leaves the new snapshot fully
committed. There is no crash point that loses bytes a committed manifest
references. Writers are multi-writer SAFE (true OCC since r12): racing
mutators commit against the same generation, exactly one wins, losers
raise ConcurrentWriteError with nothing committed — reload and retry.
Readers never coordinate and are always safe.

Reference parity: the reference's CTAS overwrites in place (reference
impl.py:75-85 rename pattern, macros/adapters.sql:10) — this module keeps
that as version history instead of deleting it, the capability gap a
production lake closes with Delta/Iceberg. All IO routes through the
catalog's pyarrow.fs layer, so the same code runs on file://, s3://,
gs://, hdfs:// (CI drives the scheme-prefixed path via file://).

Row counts in the manifest come from the staged parquet FOOTERS (pure
metadata — no second scan), so ``version_history`` is exact and free.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import FilesystemCatalog, Relation
from .fs import ConcurrentWriteError  # noqa: F401 — re-exported (public API)
from .registry import register
from .sources.readers import load_table

VERSIONS_MANIFEST = "_versions.json"  # read cache + versioned-root marker
COMMITS_DIR = "_commits"  # generation-numbered OCC commit log
COMMIT_GRACE = 3  # vacuum keeps this many trailing commit files


def _root(catalog: FilesystemCatalog, rel: Relation) -> str:
    return catalog.fs_path(rel)


def _commit_path(io, root: str, gen: int) -> str:
    return io.join(root, COMMITS_DIR, f"{gen:012d}.json")


def _load_manifest(catalog: FilesystemCatalog, rel: Relation) -> dict:
    """Resolve the table's committed state: the HIGHEST generation in the
    ``_commits/`` log is authoritative (each commit file is a full manifest
    snapshot written put-if-absent, so the max-gen file is always complete
    and consistent). Tables created before the OCC log (or whose log was
    fully vacuumed) fall back to the ``_versions.json`` cache; the next
    commit seeds the log from there. The returned dict carries its
    generation under ``gen`` — mutators pass it back as ``expect_gen``."""
    io = catalog.io
    root = _root(catalog, rel)
    commits = io.join(root, COMMITS_DIR)
    if io.isdir(commits):
        gens = [
            int(e[:-5]) for e in io.listdir(commits)
            if e.endswith(".json") and e[:-5].isdigit()
        ]
        if gens:
            m = io.get_json(_commit_path(io, root, max(gens)))
            m["gen"] = max(gens)
            return m
    path = io.join(root, VERSIONS_MANIFEST)
    if not io.exists(path):
        return {"current": 0, "versions": {}, "gen": 0}
    m = io.get_json(path)
    m.setdefault("gen", 0)
    return m


def _commit_manifest(
    catalog: FilesystemCatalog,
    rel: Relation,
    m: dict,
    expect_gen: int | None = None,
) -> None:
    """Commit the manifest at generation ``expect_gen + 1`` via
    put-if-absent on the generation-numbered commit file — true
    multi-writer OCC: when N writers race from the same loaded generation,
    the filesystem's create-exclusive (local: one atomic link(2) syscall;
    object stores: conditional PUT, see fs.put_json_if_absent) picks
    exactly one winner and every loser raises ConcurrentWriteError having
    committed NOTHING (staged orphans; vacuum reaps). This closes the
    load-recheck-replace TOCTOU the r11 protocol documented. After the
    winning commit, ``_versions.json`` is refreshed as a read cache /
    versioned-root marker — losing that write is harmless (the commit log
    is authoritative; the cache is one generation stale at worst until the
    next commit)."""
    io = catalog.io
    root = _root(catalog, rel)
    if expect_gen is None:
        expect_gen = int(m.get("gen", 0))
    gen = expect_gen + 1
    m = dict(m, gen=gen)
    io.makedirs(io.join(root, COMMITS_DIR))
    if not io.put_json_if_absent(_commit_path(io, root, gen), m):
        raise ConcurrentWriteError(
            f"{rel.view_name}: generation {gen} was committed by another "
            f"writer (this writer loaded gen {expect_gen}); nothing committed"
        )
    io.put_json_atomic(io.join(root, VERSIONS_MANIFEST), m)


# Parquet-safe type widenings accepted under evolve=True (the Delta type-
# widening feature): the stored narrow values read losslessly at the wider
# type, and Spark 4's parquet reader upcasts when handed the wider schema
# explicitly (verified: int32 files read as bigint, float as double).
_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
}


def _dtypes(df: DataFrame) -> dict[str, str]:
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def _merge_dtypes(
    parent: dict[str, str], new: dict[str, str], context: str
) -> dict[str, str]:
    """Per-column widest type across parent and append schemas; raises on
    any non-widening type change (evolution is additive + widening ONLY —
    everything else must go through mode='replace')."""
    merged = dict(parent)
    for col, dt in new.items():
        old = merged.get(col)
        if old is None or old == dt:
            merged[col] = dt
        elif (old, dt) in _WIDENINGS:
            merged[col] = dt  # append widened the column: record the wide type
        elif (dt, old) in _WIDENINGS:
            pass  # append is narrower than the table: reads upcast to `old`
        else:
            raise ValueError(
                f"{context}: column {col!r} changes type {old} -> {dt}, which "
                "is not a Parquet-safe widening; use mode='replace'"
            )
    return merged


def _snapshot_read(
    spark: SparkSession, io, root: str, names: list[str], entry: dict
) -> DataFrame:
    """Read a snapshot's (possibly pruned) file list pinned to the
    version's recorded schema. Entries carry per-column dtypes, so the read
    hands Spark an EXPLICIT schema: files missing evolved columns null-fill
    them and files written before a type widening upcast — both cases where
    mergeSchema either crashes (a pruned subset that lacks the column
    entirely: the r11 UNRESOLVED_COLUMN advice bug) or refuses (int vs
    bigint cannot merge). Legacy entries without dtypes fall back to
    mergeSchema plus typeless null-fill."""
    dtypes = entry.get("dtypes")
    if dtypes:
        ddl = ", ".join(f"`{c}` {dtypes[c]}" for c in entry["columns"])
        if not names:
            return spark.createDataFrame([], ddl)
        return spark.read.schema(ddl).parquet(
            *[io.spark_url(io.join(root, f)) for f in names]
        )
    reader = spark.read
    if entry.get("evolved"):
        reader = reader.option("mergeSchema", "true")
    if not names:
        all_files = [io.spark_url(io.join(root, f)) for f in entry["files"]]
        out = reader.parquet(*all_files).limit(0)
    else:
        out = reader.parquet(*[io.spark_url(io.join(root, f)) for f in names])
    for c in entry["columns"]:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast("string"))
    return out.select(*entry["columns"])


def _footer_meta(
    io, fs_path: str, stats_cols: tuple[str, ...] = ()
) -> tuple[int, dict]:
    """Row count + per-column [min, max] over the file's row groups, from
    the parquet FOOTER only (no data pages read). Columns whose statistics
    are absent or not JSON-native are skipped — a file with no recorded
    stats is simply never pruned (skipping is conservative by design)."""
    import pyarrow.parquet as papq

    with io.open_input(fs_path) as fh:
        md = papq.ParquetFile(fh).metadata
    stats: dict = {}
    if stats_cols:
        names = [md.schema.column(j).name for j in range(md.num_columns)]
        for col in stats_cols:
            if col not in names:
                continue
            j = names.index(col)
            lo = hi = None
            ok = True
            for i in range(md.num_row_groups):
                s = md.row_group(i).column(j).statistics
                if s is None or not s.has_min_max:
                    ok = False
                    break
                mn, mx = s.min, s.max
                if not isinstance(mn, (int, float, str, bool)) or not isinstance(
                    mx, (int, float, str, bool)
                ):
                    ok = False
                    break
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
            if ok and lo is not None:
                stats[col] = [lo, hi]
    return md.num_rows, stats


def _stage_files(
    spark: SparkSession, catalog: FilesystemCatalog, rel: Relation, df: DataFrame,
    version: int, stats_cols: tuple[str, ...] = (),
) -> tuple[list[str], int, dict]:
    """Write df's part files into the table root under fresh unique names
    WITHOUT committing them (invisible to manifest readers until the
    commit — the index_manifest staging discipline). Returns (names, rows,
    {file: {col: [min, max]}}), all from the staged footers."""
    io = catalog.io
    root = _root(catalog, rel)
    io.makedirs(root)
    staging = io.join(root, f".stage_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(io.spark_url(staging))
    names: list[str] = []
    rows = 0
    file_stats: dict = {}
    for e in io.listdir(staging):
        if not (e.startswith("part-") and e.endswith(".parquet")):
            continue
        name = f"v{version:06d}-{uuid.uuid4().hex[:12]}.parquet"
        io.rename(io.join(staging, e), io.join(root, name))
        n, stats = _footer_meta(io, io.join(root, name), stats_cols)
        rows += n
        if stats:
            file_stats[name] = stats
        names.append(name)
    io.rmtree(staging)
    return sorted(names), rows, file_stats


def write_versioned(
    spark: SparkSession,
    catalog: FilesystemCatalog,
    rel: Relation,
    df: DataFrame,
    mode: str = "replace",
    txn: tuple[str, int] | None = None,
    stats_cols: tuple[str, ...] | None = None,
    evolve: bool = False,
    retry_on_conflict: bool = True,
    before_commit=None,
) -> int | None:
    """Commit df as the table's next version. ``replace`` snapshots df
    alone; ``append`` stages only df's files and the new version references
    parent files + staged files (O(delta) IO). Returns the new version id.

    Concurrency: racing writers are MULTI-WRITER SAFE — the commit is
    put-if-absent on a generation-numbered log (_commit_manifest), so
    exactly one racer wins each generation, and because appends and
    replaces are commutative against a moving parent (an append's staged
    files stay valid; it just re-points at the winner's file list; a
    replace doesn't read the parent at all), the loser RE-RESOLVES the
    new state and retries by default: N racing appends all land, in
    commit-log order, none lost — the Delta transaction ergonomics.
    ``retry_on_conflict=False`` surfaces the loss as ConcurrentWriteError
    instead (nothing committed; staged orphans; vacuum reaps). A retried
    append re-runs the schema gate against the NEW parent, so a racing
    replace that changed the schema fails loudly, never merges silently.
    The stateful mutators (merge/delete/rollback/optimize) never
    auto-retry — their output depends on the snapshot they read.
    ``before_commit`` is a test seam invoked before each commit attempt.

    ``txn=(stream_id, batch_id)`` makes the commit TRANSACTIONAL for
    streaming ingest (the Delta txnAppId/txnVersion discipline, shared
    with index_manifest.manifest_stream_append): the batch id is recorded
    under ``streams[stream_id]`` in the SAME manifest replace, and a
    replayed batch (at-least-once delivery) finds its id recorded and
    returns None without staging a byte.

    ``stats_cols`` declares data-skipping columns: per-file [min, max]
    for each is read off the staged FOOTERS and recorded in the manifest,
    and later writes (appends, streaming batches, optimize) inherit the
    declaration automatically — ``read_versioned(where=...)`` then prunes
    files manifest-side, before the scan sees them.

    ``evolve=True`` relaxes the append schema gate to ADDITIVE + WIDENING
    evolution (the Delta mergeSchema / type-widening discipline): the
    append may introduce new columns and may widen column types along
    Parquet-safe promotions (int chain up to bigint, float -> double) but
    never drop parent columns or change a type any other way; the version
    records the merged schema (per-column dtypes, widest type wins) and an
    ``evolved`` flag, and readers of evolved snapshots scan with that
    EXPLICIT schema pinned — pre-evolution files null-fill the new columns
    and upcast the widened ones — while time travel to pre-evolution
    versions keeps the old shape and old types (each version entry carries
    its own dtypes). ``optimize_versioned`` rewrites an evolved lineage
    uniform again."""
    assert mode in ("replace", "append"), mode
    df_columns = list(df.columns)
    df_dtypes = _dtypes(df)

    def gate(m: dict) -> tuple[list[str], dict[str, str], bool]:
        """Schema gate + merged (columns, dtypes, evolved) against the
        manifest's CURRENT parent — run before any bytes move, and re-run
        on every conflict retry (the parent may have changed under us)."""
        if mode != "append" or not m["current"]:
            return df_columns, dict(df_dtypes), False
        parent = m["versions"][str(m["current"])]
        parent_cols = parent["columns"]
        parent_dtypes = parent.get("dtypes", {})
        if not evolve:
            if df_columns != parent_cols or (
                parent_dtypes
                and any(
                    df_dtypes[c] != parent_dtypes.get(c, df_dtypes[c])
                    for c in df_columns
                )
            ):
                raise ValueError(
                    f"append schema {df_columns} != table schema "
                    f"{parent_cols}; pass evolve=True for additive/widening "
                    "evolution or mode='replace' to change the schema freely "
                    "(versions are immutable snapshots — history keeps the "
                    "old shape)"
                )
            columns, dtypes = df_columns, dict(df_dtypes)
        else:
            missing = [c for c in parent_cols if c not in df_columns]
            if missing:
                raise ValueError(
                    f"evolved append drops parent columns {missing} — "
                    "evolution is additive only; use mode='replace' to narrow"
                )
            dtypes = _merge_dtypes(
                parent_dtypes, df_dtypes, f"{rel.view_name} evolved append"
            )
            # keep parent column order; evolved columns append at the end
            columns = parent_cols + [c for c in df_columns if c not in parent_cols]
        # mixed-schema file list: this append added columns or widened
        # types, or an earlier evolution already left mixed files behind
        evolved = (
            columns != parent_cols
            or dtypes != parent_dtypes
            or bool(parent.get("evolved"))
        )
        return columns, dtypes, evolved

    m = _load_manifest(catalog, rel)
    if stats_cols is not None:
        m["stats_cols"] = sorted(stats_cols)
    effective_stats_cols = tuple(m.get("stats_cols", ()))
    if txn is not None:
        sid, bid = txn
        last = m.get("streams", {}).get(sid)
        if last is not None and bid <= last:
            return None  # replay of a committed batch: the txn record skips it
    columns, dtypes, evolved = gate(m)
    names, rows_staged, file_stats = _stage_files(
        spark, catalog, rel, df, m["current"] + 1, effective_stats_cols
    )
    import time

    while True:
        version = m["current"] + 1
        if mode == "append" and m["current"]:
            parent = m["versions"][str(m["current"])]
            files = parent["files"] + names
            rows = parent["rows"] + rows_staged
        else:
            files = names
            rows = rows_staged
        m["versions"][str(version)] = {
            "files": files,
            "op": mode,
            "parent": m["current"] or None,
            "rows": rows,
            "columns": columns,
            "dtypes": dtypes,
            "evolved": evolved,
            "ts": time.time(),
        }
        m["current"] = version
        if file_stats:
            m.setdefault("stats", {}).update(file_stats)
        if txn is not None:
            m.setdefault("streams", {})[txn[0]] = txn[1]
        if before_commit is not None:
            before_commit()
        try:
            _commit_manifest(catalog, rel, m)
            return version
        except ConcurrentWriteError:
            if not retry_on_conflict:
                raise
            # another writer won this generation: the staged files stay
            # valid (their names are already unique; the version prefix in
            # the name is cosmetic), so re-resolve the new state and retry
            m = _load_manifest(catalog, rel)
            if stats_cols is not None:
                m["stats_cols"] = sorted(stats_cols)
            if txn is not None:
                last = m.get("streams", {}).get(txn[0])
                if last is not None and txn[1] <= last:
                    return None  # our batch committed concurrently
            columns, dtypes, evolved = gate(m)  # may raise: schema moved


def stream_append_versioned(
    catalog: FilesystemCatalog,
    rel: Relation,
    stream_df: DataFrame,
    checkpoint_dir: str,
    stream_id: str | None = None,
    available_now: bool = True,
):
    """Exactly-once streaming ingest into a versioned table: each
    micro-batch commits as a new append version whose manifest replace
    ALSO records the batch id (``write_versioned(txn=...)``). The
    at-least-once worst case — a crash between the manifest commit and the
    checkpoint commit — replays the batch into the txn skip, so the table
    never holds a duplicate and every batch boundary stays addressable as
    its own time-travel snapshot. ``stream_id`` identifies the logical
    stream across restarts (defaults to the checkpoint path; a NEW
    checkpoint against the same table needs a new stream_id — batch ids
    restart at 0 per checkpoint). Single mutator at a time: pause the
    ingest around a rollback/vacuum, resume after."""
    sid = stream_id if stream_id is not None else str(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_versioned(
            batch_df.sparkSession, catalog, rel, batch_df,
            mode="append", txn=(sid, batch_id),
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollback_versioned(
    catalog: FilesystemCatalog, rel: Relation, version: int
) -> int:
    """Point the table back at a historical snapshot — a pure METADATA
    commit: the new version's file list is the target's (no data IO)."""
    m = _load_manifest(catalog, rel)
    target = m["versions"][str(version)]
    new_version = m["current"] + 1
    import time

    m["versions"][str(new_version)] = {
        "files": list(target["files"]),
        "op": "rollback",
        "parent": version,
        "rows": target["rows"],
        "columns": list(target["columns"]),
        "dtypes": dict(target.get("dtypes", {})),
        "evolved": bool(target.get("evolved")),
        "ts": time.time(),
    }
    m["current"] = new_version
    _commit_manifest(catalog, rel, m)
    return new_version


def read_versioned(
    spark: SparkSession,
    catalog: FilesystemCatalog,
    rel: Relation,
    version: int | None = None,
    where: dict | None = None,
) -> DataFrame:
    """Scan one committed snapshot (default: current): explicit file list
    from the manifest — never a directory listing, so staged/orphaned/
    vacuum-pending files are invisible and the read is a consistent
    point-in-time view at any concurrency.

    ``where={col: (lo, hi)}`` enables manifest-side DATA SKIPPING over the
    declared stats_cols: a file whose recorded [min, max] cannot intersect
    [lo, hi] is dropped from the file list before Spark ever opens its
    footer (the Delta data-skipping shape — at 100 TB this is the
    difference between touching every file's footer and touching only the
    matching fraction). Skipping is CONSERVATIVE: files without recorded
    stats always survive, and the scan is pruned-not-filtered — callers
    still apply the exact predicate (None bounds are open-ended)."""
    io = catalog.io
    m = _load_manifest(catalog, rel)
    v = m["current"] if version is None else version
    entry = m["versions"][str(v)]
    root = _root(catalog, rel)
    names = entry["files"]
    if where:
        stats = m.get("stats", {})

        def survives(name: str) -> bool:
            fstats = stats.get(name, {})
            for col, (lo, hi) in where.items():
                rng = fstats.get(col)
                if rng is None:
                    continue  # no stats recorded: conservative keep
                if (hi is not None and rng[0] > hi) or (
                    lo is not None and rng[1] < lo
                ):
                    return False
            return True

        names = [f for f in names if survives(f)]
    # pinned-schema scan: the version's recorded (columns, dtypes) are the
    # read schema, so evolved snapshots null-fill/upcast per file and a
    # pruned subset that happens to predate an evolution still resolves
    # every column (the mergeSchema-over-pruned-subset crash this replaces)
    return _snapshot_read(spark, io, root, names, entry)


def merge_versioned(
    spark: SparkSession,
    catalog: FilesystemCatalog,
    rel: Relation,
    updates: DataFrame,
    key: str,
) -> int:
    """Copy-on-write MERGE (upsert): rows whose ``key`` matches an update
    are replaced, unmatched update rows are inserted, everything else is
    untouched — at FILE granularity, the Delta merge shape. The skipping
    stats pick the candidate files (those whose [min, max] on ``key`` can
    intersect the updates' key range — conservative: stat-less files are
    always candidates); ONLY candidates are rewritten (their unmatched
    rows + all updates), every other file is carried into the new version
    by reference. On a range-clustered table with declared stats a narrow
    update rewrites a narrow slice of the data, never the table.

    ``updates`` must be key-unique and share the table's schema. Single
    mutator at a time (the standing rule); history stays addressable."""
    io = catalog.io
    m = _load_manifest(catalog, rel)
    cur = m["versions"][str(m["current"])]
    if list(updates.columns) != cur["columns"]:
        raise ValueError(
            f"merge schema {list(updates.columns)} != table schema "
            f"{cur['columns']}"
        )
    cur_dtypes = cur.get("dtypes", {})
    if cur_dtypes:
        # conform update types to the table's recorded schema: equal or
        # narrower (lossless upcast) is accepted; anything else would
        # either truncate silently or leave the staged files wider than
        # the manifest's pinned read schema — refused loudly
        up_dtypes = _dtypes(updates)
        for c in cur["columns"]:
            if up_dtypes[c] != cur_dtypes[c] and (
                (up_dtypes[c], cur_dtypes[c]) not in _WIDENINGS
            ):
                raise ValueError(
                    f"{rel.view_name} merge: column {c!r} has type "
                    f"{up_dtypes[c]}, table records {cur_dtypes[c]}; widen "
                    "the table first (append with evolve=True) or replace"
                )
        updates = updates.select(
            *[F.col(c).cast(cur_dtypes[c]).alias(c) for c in cur["columns"]]
        )
    root = _root(catalog, rel)
    stats = m.get("stats", {})
    if updates.limit(1).count() == 0:  # empty update set: no version churn
        return m["current"]
    # Exact file-granular candidate selection: one pass of the update keys
    # against a BROADCAST |files|-row interval table built from the
    # manifest stats — a file is a candidate iff some update key falls
    # inside its recorded [min, max] (stat-less files are always
    # candidates). Distributed and key-set-exact, so disjoint inserts far
    # outside a file's range never force its rewrite (an envelope check
    # would).
    intervals = [
        (name, rng[0], rng[1])
        for name in cur["files"]
        if (rng := stats.get(name, {}).get(key)) is not None
    ]
    no_stats = [f for f in cur["files"] if key not in stats.get(f, {})]
    touched: set[str] = set()
    if intervals:
        ivdf = spark.createDataFrame(intervals, ["_file", "_lo", "_hi"])
        touched = {
            r["_file"]
            for r in updates.select(F.col(key).alias("_k"))
            .join(
                F.broadcast(ivdf),
                (F.col("_k") >= F.col("_lo")) & (F.col("_k") <= F.col("_hi")),
            )
            .select("_file")
            .distinct()
            .collect()
        }
    candidates = sorted(touched | set(no_stats))
    untouched = [f for f in cur["files"] if f not in set(candidates)]
    version = m["current"] + 1
    if candidates:
        # pinned-schema read: an evolved lineage whose candidates are ALL
        # pre-evolution (narrow) files still resolves the full column set
        # (null-fill/upcast) — the r11 UNRESOLVED_COLUMN advice bug
        cand = _snapshot_read(spark, io, root, candidates, cur)
        merged = cand.join(updates.select(key), key, "left_anti").unionByName(
            updates
        )
        cand_rows = sum(
            _footer_meta(io, io.join(root, f))[0] for f in candidates
        )
    else:
        merged = updates
        cand_rows = 0
    names, rows_new, file_stats = _stage_files(
        spark, catalog, rel, merged, version, tuple(m.get("stats_cols", ()))
    )
    import time

    m["versions"][str(version)] = {
        "files": sorted(untouched) + names,
        "op": "merge",
        # untouched files keep their original (possibly pre-evolution)
        # schema; rewritten files carry the current one — mixed iff any
        # untouched file remains on an evolved lineage
        "evolved": bool(cur.get("evolved")) and bool(untouched),
        "parent": m["current"],
        "rows": cur["rows"] - cand_rows + rows_new,
        "columns": list(cur["columns"]),
        "dtypes": dict(cur.get("dtypes", {})),
        "ts": time.time(),
    }
    m["current"] = version
    if file_stats:
        m.setdefault("stats", {}).update(file_stats)
    _commit_manifest(catalog, rel, m)
    return version


def delete_versioned(
    spark: SparkSession,
    catalog: FilesystemCatalog,
    rel: Relation,
    condition,
    prune: dict | None = None,
) -> int:
    """Copy-on-write DELETE: commit a new version without the rows
    matching ``condition`` (a Column predicate). ``prune={col: (lo, hi)}``
    bounds the candidate files via the skipping stats — files outside the
    range provably hold no matching rows and carry into the new version by
    reference (the caller asserts the predicate is confined to the range;
    without ``prune`` every file is rewritten). Same manifest commit,
    history, and vacuum story as merge."""
    io = catalog.io
    m = _load_manifest(catalog, rel)
    cur = m["versions"][str(m["current"])]
    root = _root(catalog, rel)
    stats = m.get("stats", {})

    def survives_prune(name: str) -> bool:
        if not prune:
            return True
        fstats = stats.get(name, {})
        for col, (lo, hi) in prune.items():
            rng = fstats.get(col)
            if rng is None:
                continue
            if (hi is not None and rng[0] > hi) or (lo is not None and rng[1] < lo):
                return False
        return True

    candidates = [f for f in cur["files"] if survives_prune(f)]
    untouched = [f for f in cur["files"] if not survives_prune(f)]
    version = m["current"] + 1
    if candidates:
        # pinned-schema read (see merge_versioned): all-narrow candidate
        # sets on an evolved lineage resolve the full column set
        cand = _snapshot_read(spark, io, root, candidates, cur)
        remaining = cand.filter(~condition)
        cand_rows = sum(
            _footer_meta(io, io.join(root, f))[0] for f in candidates
        )
        names, rows_new, file_stats = _stage_files(
            spark, catalog, rel, remaining, version, tuple(m.get("stats_cols", ()))
        )
    else:
        names, rows_new, file_stats, cand_rows = [], 0, {}, 0
    import time

    m["versions"][str(version)] = {
        "files": sorted(untouched) + names,
        "op": "delete",
        "evolved": bool(cur.get("evolved")) and bool(untouched),
        "parent": m["current"],
        "rows": cur["rows"] - cand_rows + rows_new,
        "columns": list(cur["columns"]),
        "dtypes": dict(cur.get("dtypes", {})),
        "ts": time.time(),
    }
    m["current"] = version
    if file_stats:
        m.setdefault("stats", {}).update(file_stats)
    _commit_manifest(catalog, rel, m)
    return version


def optimize_versioned(
    spark: SparkSession,
    catalog: FilesystemCatalog,
    rel: Relation,
    target_bytes: int = 128 * 1024 * 1024,
    cluster_by: tuple[str, ...] | None = None,
) -> int:
    """Compact the CURRENT snapshot's files into ~target_bytes files,
    committed as a new version (op='optimize') — the small-file
    maintenance a per-batch streaming ingest eventually needs, with
    history intact: every pre-compaction version stays addressable until
    vacuum, and a reader mid-scan on the old file list is untouched
    (files are never mutated, only superseded).

    ``cluster_by`` additionally RE-CLUSTERS the rewrite
    (``repartitionByRange`` + in-file sort on the given columns — pass the
    table's stats_cols): after append churn every file's [min, max] spans
    the whole key domain and manifest-side skipping decays to nothing;
    range-clustering restores disjoint per-file ranges, so
    ``read_versioned(where=...)`` prunes like the freshly-written table
    again (the Delta OPTIMIZE ZORDER role, single-axis). Without it the
    rewrite is a pure coalesce to ceil(bytes/target) tasks — cheaper (no
    shuffle), but arrival-ordered. Single mutator at a time."""
    io = catalog.io
    m = _load_manifest(catalog, rel)
    cur = m["versions"][str(m["current"])]
    root = _root(catalog, rel)
    total = sum(io.getsize(io.join(root, f)) for f in cur["files"])
    n_out = max(1, -(-total // target_bytes))
    df = read_versioned(spark, catalog, rel)
    if cluster_by:
        df = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        df = df.coalesce(n_out)
    version = m["current"] + 1
    names, rows, file_stats = _stage_files(
        spark, catalog, rel, df, version, tuple(m.get("stats_cols", ()))
    )
    assert rows == cur["rows"], (rows, cur["rows"])  # lossless by construction
    import time

    m["versions"][str(version)] = {
        "files": names,
        "op": "optimize",
        "evolved": False,  # the rewrite makes the file schemas uniform again
        "parent": m["current"],
        "rows": rows,
        "columns": list(cur["columns"]),
        "dtypes": _dtypes(df),
        "ts": time.time(),
    }
    m["current"] = version
    if file_stats:
        m.setdefault("stats", {}).update(file_stats)
    _commit_manifest(catalog, rel, m)
    return version


def version_history(catalog: FilesystemCatalog, rel: Relation) -> list[dict]:
    """One dict per committed version: (version, op, parent, rows,
    n_files, is_current) — exact, from manifest metadata only."""
    m = _load_manifest(catalog, rel)
    out = []
    for k in sorted(m["versions"], key=int):
        e = m["versions"][k]
        out.append(
            {
                "version": int(k),
                "op": e["op"],
                "parent": e["parent"],
                "rows": e["rows"],
                "n_files": len(e["files"]),
                "is_current": int(k) == m["current"],
            }
        )
    return out


def vacuum_versions(
    catalog: FilesystemCatalog,
    rel: Relation,
    keep_last: int = 1,
    retention_s: float | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Reap history: keep the newest ``keep_last`` versions (always
    including current), delete every data file only the dropped versions
    reference, plus any staged orphans a crashed writer left. Prunes the
    manifest FIRST (the commit), deletes bytes after — a reader holding a
    dropped version's file list keeps working until the physical delete,
    and a crash between the two leaves only unreferenced files (re-vacuum
    reaps them). Returns the deleted file names.

    ``dry_run=True`` commits NOTHING and deletes NOTHING: it returns the
    file names the same call would reap (the Delta VACUUM DRY RUN safety
    loop — inspect before an irreversible history prune).

    ``retention_s`` is a TIME FLOOR composed with keep_last (the Delta
    retention discipline): any version committed within the last
    retention_s seconds survives even when keep_last alone would reap it —
    the guard for long-running readers, which resolve a version's file
    list once and scan for a while; size the floor above the longest
    expected scan. Versions are judged by their committed ``ts``."""
    import time

    io = catalog.io
    root = _root(catalog, rel)
    m = _load_manifest(catalog, rel)
    ordered = sorted(m["versions"], key=int)
    keep = ordered[-max(keep_last, 1):]
    if retention_s is not None:
        floor = time.time() - retention_s
        keep += [
            k for k in ordered
            if k not in keep and m["versions"][k].get("ts", 0) > floor
        ]
    if str(m["current"]) not in keep:
        keep.append(str(m["current"]))
    keep = sorted(set(keep), key=int)
    kept_files = {f for k in keep for f in m["versions"][k]["files"]}
    if not dry_run:
        m["versions"] = {k: m["versions"][k] for k in keep}
        if "stats" in m:  # stats entries for reaped files go with them
            m["stats"] = {f: s for f, s in m["stats"].items() if f in kept_files}
        _commit_manifest(catalog, rel, m)
    deleted = []
    for e in io.listdir(root):
        if e == VERSIONS_MANIFEST or e in kept_files:
            continue
        if e.endswith(".parquet") or e.startswith(".stage_"):
            if not dry_run:
                io.remove_any(io.join(root, e))
            deleted.append(e)
    # prune the OCC commit log: superseded generations are pure metadata
    # history (every commit file is a full snapshot). Keep a COMMIT_GRACE
    # tail so a reader between its log LIST and its max-gen read never has
    # the file deleted under it (it would have to be GRACE commits stale).
    # The dry run previews one FEWER pruned entry (the real vacuum's own
    # commit pushes a generation into the tail) — preview counts are a
    # floor, which is the conservative direction for a safety check.
    commits = io.join(root, COMMITS_DIR)
    if io.isdir(commits):
        gens = sorted(
            int(e[:-5]) for e in io.listdir(commits)
            if e.endswith(".json") and e[:-5].isdigit()
        )
        for g in gens[:-COMMIT_GRACE]:
            if not dry_run:
                io.remove_any(_commit_path(io, root, g))
            deleted.append(f"{COMMITS_DIR}/{g:012d}.json")
    return sorted(deleted)


# --- Registered contract queries -------------------------------------------------
# A deterministic three-commit lifecycle over the documents table, built
# once per (applicationId, sf_dir) in a temp database (the scaffold-memo
# discipline): v1 = full corpus (replace), v2 = append of the doc_id % 13
# slice, v3 = rollback to v1. Time travel and history are then both fully
# oracle-checkable against plain SQL over the source table.

_VERSIONED_CACHE: dict[tuple[str, str], tuple[FilesystemCatalog, Relation]] = {}


def _lifecycle_table(
    spark: SparkSession, sf_dir: str
) -> tuple[FilesystemCatalog, Relation]:
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _VERSIONED_CACHE.get(key)
    if hit is not None:
        return hit
    catalog = FilesystemCatalog(tempfile.mkdtemp(prefix="versioned_db_"))
    catalog.create_schema("vt")
    rel = catalog.relation("docs", "vt")
    docs = load_table(spark, sf_dir, "documents")
    # range-clustered v1 with declared skipping stats on the key: each of
    # the 8 files holds a disjoint doc_id range, so the q_versioned_skipping
    # predicate provably prunes the file list (gated in tests)
    write_versioned(
        spark, catalog, rel, docs.repartitionByRange(8, "doc_id"),
        mode="replace", stats_cols=("doc_id",),
    )
    write_versioned(
        spark, catalog, rel, docs.filter(F.col("doc_id") % 13 == 0), mode="append"
    )
    rollback_versioned(catalog, rel, 1)
    _VERSIONED_CACHE[key] = (catalog, rel)
    return catalog, rel


def release_versioned_cache() -> None:
    """Drop the lifecycle scaffolds (tests use this to force rebuilds)."""
    _VERSIONED_CACHE.clear()


@register(
    "q_time_travel",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
    tags=("versioned", "time-travel", "catalog", "materialize"),
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read version 1 of the versioned lifecycle table AFTER an append and
    a rollback have committed on top of it — the time-travel guarantee:
    a historical snapshot is byte-addressable and bit-identical to the
    data as of its commit, regardless of what later versions did. Oracle
    = the source table itself.

    Scale: the read is an explicit-file-list scan of v1's files (no
    manifest reader ever lists the directory); history depth costs one
    small JSON read, never data IO."""
    catalog, rel = _lifecycle_table(spark, sf_dir)
    return read_versioned(spark, catalog, rel, version=1).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@register(
    "q_version_history",
    oracle="""
    WITH c AS (SELECT COUNT(*) AS n FROM documents),
    a AS (SELECT COUNT(*) AS na FROM documents WHERE doc_id % 13 = 0)
    SELECT CAST(1 AS BIGINT) AS version, 'replace' AS op,
           CAST(NULL AS BIGINT) AS parent, CAST(n AS BIGINT) AS rows_at,
           FALSE AS is_current
    FROM c
    UNION ALL
    SELECT 2, 'append', 1, n + na, FALSE FROM c, a
    UNION ALL
    SELECT 3, 'rollback', 1, n, TRUE FROM c
    """,
    tags=("versioned", "catalog", "audit"),
)
def q_version_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table's commit log as a DataFrame: (version, op, parent,
    rows_at, is_current) for the replace -> append -> rollback lifecycle —
    row counts come from the staged parquet footers at commit time (pure
    metadata), so the whole history is exact and the oracle recomputes it
    from the source table with plain COUNTs."""
    catalog, rel = _lifecycle_table(spark, sf_dir)
    hist = version_history(catalog, rel)
    return spark.createDataFrame(
        [
            (h["version"], h["op"], h["parent"], h["rows"], h["is_current"])
            for h in hist
        ],
        "version bigint, op string, parent bigint, rows_at bigint, is_current boolean",
    )


SKIP_LO, SKIP_HI = 100, 199  # the q_versioned_skipping predicate window


@register(
    "q_versioned_skipping",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE doc_id BETWEEN {SKIP_LO} AND {SKIP_HI}
    """,
    tags=("versioned", "data-skipping", "pruning", "catalog"),
)
def q_versioned_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-side data skipping, driver-checked: read the versioned
    lifecycle table's CURRENT snapshot (= v1 via the rollback) with a
    doc_id range predicate — the manifest's per-file [min, max] stats drop
    non-intersecting files from the explicit list before any footer is
    opened (v1 is range-clustered into 8 files, so most never reach
    Spark; the file-count shrink is pinned in tests/test_versioned.py),
    then the exact predicate filters the pruned scan. Oracle = the same
    WHERE over the source table."""
    catalog, rel = _lifecycle_table(spark, sf_dir)
    pruned = read_versioned(
        spark, catalog, rel, where={"doc_id": (SKIP_LO, SKIP_HI)}
    )
    return pruned.filter(
        (F.col("doc_id") >= SKIP_LO) & (F.col("doc_id") <= SKIP_HI)
    ).select("doc_id", "lang", "source", "n_chars")


# Merge scaffold: its own memoized table (separate from the time-travel
# lifecycle — registered queries must be idempotent across bench reps, so
# the merge happens ONCE per session and the query just reads the result).
_MERGE_CACHE: dict[tuple[str, str], tuple[FilesystemCatalog, Relation]] = {}

MERGE_INSERT_OFFSET = 20_000_000


def _merge_table(
    spark: SparkSession, sf_dir: str
) -> tuple[FilesystemCatalog, Relation]:
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _MERGE_CACHE.get(key)
    if hit is not None:
        return hit
    catalog = FilesystemCatalog(tempfile.mkdtemp(prefix="versioned_merge_db_"))
    catalog.create_schema("vt")
    rel = catalog.relation("docs_merge", "vt")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    write_versioned(
        spark, catalog, rel, docs.repartitionByRange(8, "doc_id"),
        mode="replace", stats_cols=("doc_id",),
    )
    updates = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.lit("merged").alias("source"), "n_chars")
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + MERGE_INSERT_OFFSET).alias("doc_id"),
                F.lit("inserted").alias("source"),
                "n_chars",
            )
        )
    )
    merge_versioned(spark, catalog, rel, updates, key="doc_id")
    _MERGE_CACHE[key] = (catalog, rel)
    return catalog, rel


@register(
    "q_versioned_merge",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN doc_id % 10 = 0 THEN 'merged' ELSE source END AS source,
           n_chars
    FROM documents
    UNION ALL
    SELECT doc_id + {MERGE_INSERT_OFFSET}, 'inserted', n_chars
    FROM documents WHERE doc_id % 17 = 0
    """,
    tags=("versioned", "merge", "upsert", "catalog"),
)
def q_versioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE, driver-checked: upsert a deterministic update
    set (every doc_id % 10 == 0 re-sourced to 'merged'; doc_id % 17 == 0
    re-keyed copies inserted) into a range-clustered versioned table and
    read the committed result. File granularity is pinned in
    tests/test_versioned.py: the inserted keys land far above the base
    range, yet only candidate files (stats-overlapping the update range —
    here all 8, since modified keys span the corpus) are rewritten, and
    the pre-merge snapshot stays addressable. Oracle = the same upsert in
    plain SQL over the source table."""
    catalog, rel = _merge_table(spark, sf_dir)
    return read_versioned(spark, catalog, rel).select("doc_id", "source", "n_chars")


# Delete scaffold: its own memoized table (same idempotence discipline as
# the merge scaffold — the CoW delete happens ONCE per session, the
# registered query just reads the committed result).
_DELETE_CACHE: dict[tuple[str, str], tuple[FilesystemCatalog, Relation]] = {}

DELETE_LO, DELETE_HI = 300, 399  # the deleted doc_id window


def _delete_table(
    spark: SparkSession, sf_dir: str
) -> tuple[FilesystemCatalog, Relation]:
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _DELETE_CACHE.get(key)
    if hit is not None:
        return hit
    catalog = FilesystemCatalog(tempfile.mkdtemp(prefix="versioned_delete_db_"))
    catalog.create_schema("vt")
    rel = catalog.relation("docs_delete", "vt")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    write_versioned(
        spark, catalog, rel, docs.repartitionByRange(8, "doc_id"),
        mode="replace", stats_cols=("doc_id",),
    )
    delete_versioned(
        spark, catalog, rel,
        F.col("doc_id").between(DELETE_LO, DELETE_HI),
        prune={"doc_id": (DELETE_LO, DELETE_HI)},
    )
    _DELETE_CACHE[key] = (catalog, rel)
    return catalog, rel


@register(
    "q_versioned_delete",
    oracle=f"""
    SELECT doc_id, source, n_chars FROM documents
    WHERE doc_id NOT BETWEEN {DELETE_LO} AND {DELETE_HI}
    """,
    tags=("versioned", "delete", "copy-on-write", "catalog"),
)
def q_versioned_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE, driver-checked: delete a doc_id window from a
    range-clustered versioned table with a prune range and read the
    committed result — only files whose skipping stats intersect the
    window are rewritten (their surviving rows), every other file carries
    into the new version by reference, and the pre-delete snapshot stays
    addressable. Oracle = the complementary WHERE over the source table."""
    catalog, rel = _delete_table(spark, sf_dir)
    return read_versioned(spark, catalog, rel).select("doc_id", "source", "n_chars")


# Schema-evolution scaffold: v1 = the even-doc_id half at the NARROW shape
# (n_chars int, no lang); v2 = evolved append of the odd half that both
# WIDENS n_chars (int -> bigint) and ADDS lang — the full r12 evolution
# surface (additive + widening) in one committed lineage.
_EVOLUTION_CACHE: dict[tuple[str, str], tuple[FilesystemCatalog, Relation]] = {}


def _evolution_table(
    spark: SparkSession, sf_dir: str
) -> tuple[FilesystemCatalog, Relation]:
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _EVOLUTION_CACHE.get(key)
    if hit is not None:
        return hit
    catalog = FilesystemCatalog(tempfile.mkdtemp(prefix="versioned_evolve_db_"))
    catalog.create_schema("vt")
    rel = catalog.relation("docs_evolve", "vt")
    docs = load_table(spark, sf_dir, "documents")
    narrow = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.col("n_chars").cast("int").alias("n_chars")
    )
    write_versioned(
        spark, catalog, rel, narrow.repartitionByRange(4, "doc_id"),
        mode="replace", stats_cols=("doc_id",),
    )
    wide = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"), "lang"
    )
    write_versioned(spark, catalog, rel, wide, mode="append", evolve=True)
    _EVOLUTION_CACHE[key] = (catalog, rel)
    return catalog, rel


@register(
    "q_schema_evolution",
    oracle="""
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CASE WHEN doc_id % 2 = 1 THEN lang ELSE NULL END AS lang
    FROM documents
    """,
    tags=("versioned", "schema-evolution", "widening", "catalog"),
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive + widening schema evolution, driver-checked end-to-end:
    the evolved snapshot reads with the version's PINNED schema, so
    pre-evolution files upcast n_chars (int -> bigint) and null-fill lang
    while post-evolution files carry real values — bit-identical to the
    oracle's CAST + CASE over the source table. Time travel back to the
    narrow v1 (old shape AND old types) is pinned in
    tests/test_versioned.py's widening test."""
    catalog, rel = _evolution_table(spark, sf_dir)
    return read_versioned(spark, catalog, rel).select("doc_id", "n_chars", "lang")

"""End-to-end CLI lifecycle over the animals example (the reference's
`dbt seed && dbt run && dbt test` flow, reference tests/functional/)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "dbt_parquet_spark", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )


def test_cli_full_lifecycle(tmp_path):
    db = str(tmp_path / "db")
    os.makedirs(db)
    seed = _cli("seed", "--database", db, "--csv", "examples/animals/seeds/animals.csv")
    assert seed.returncode == 0 and "OK seed animals: 4 rows" in seed.stdout

    run = _cli("run", "--database", db, "--models-dir", "examples/animals/models", "--single-file")
    assert run.returncode == 0
    assert "OK animals_str: 4 rows" in run.stdout
    assert "OK leg_stats: 4 rows" in run.stdout
    assert os.path.isfile(os.path.join(db, "animals_str.parquet"))

    docs = _cli("docs", "--database", db)
    assert docs.returncode == 0
    assert any("animals_str" in l and "n_legs" in l for l in docs.stdout.splitlines())

    test = _cli(
        "test", "--database", db, "--models-dir", "examples/animals/models",
        "--model", "animals_str", "--unique", "animals", "--not-null", "n_legs",
    )
    assert test.returncode == 0 and "PASS" in test.stdout

    # the other two dbt generic tests: accepted_values + relationships (FK)
    test2 = _cli(
        "test", "--database", db, "--models-dir", "examples/animals/models",
        "--model", "animals_str",
        "--accepted-values", "n_legs=2,4,5,100",
        "--relationships", "n_legs=leg_stats.n_legs",
    )
    assert test2.returncode == 0
    assert "accepted_values(animals_str.n_legs): PASS" in test2.stdout
    assert "relationships(animals_str.n_legs -> leg_stats.n_legs): PASS" in test2.stdout

    # violation path: a constrained accepted list must FAIL with a count
    test3 = _cli(
        "test", "--database", db, "--models-dir", "examples/animals/models",
        "--model", "animals_str", "--accepted-values", "n_legs=2,4",
    )
    assert test3.returncode == 1 and "FAIL (2)" in test3.stdout


def test_cli_shell_escape_hatch(tmp_path):
    """The reference's run-operation duckdb escape hatch (impl.py:225-249):
    `shell` opens DuckDB with every catalog relation registered as a view.
    Driven non-interactively via stdin."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    db = str(tmp_path / "db")
    os.makedirs(db)
    pq.write_table(
        pa.table({"x": pa.array([1, 2, 3], pa.int64())}),
        os.path.join(db, "nums.parquet"),
    )
    proc = subprocess.run(
        [sys.executable, "-m", "dbt_parquet_spark", "shell", "--database", db],
        input=".tables\nSELECT SUM(x) AS s FROM nums\nSELECT bogus FROM nowhere\nSELECT COUNT(*) AS n FROM nums\n.exit\n",
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "1 relation(s) registered" in proc.stdout
    assert "nums" in proc.stdout          # .tables listing
    assert "6" in proc.stdout             # SUM over the view
    assert "error:" in proc.stdout        # bad SQL survives the session
    assert "3" in proc.stdout             # shell still live afterwards


def test_cli_maintain(tmp_path):
    db = str(tmp_path / "db")
    os.makedirs(db)
    seed = _cli("seed", "--database", db, "--csv", "examples/animals/seeds/animals.csv")
    assert seed.returncode == 0

    stats = _cli("maintain", "--database", db, "--stats")
    assert stats.returncode == 0
    assert any("animals" in l and "rows=4" in l for l in stats.stdout.splitlines())

    cl = _cli("maintain", "--database", db, "--table", "animals", "--cluster-by", "n_legs")
    assert cl.returncode == 0 and "OK cluster animals by n_legs (sorted): 4 rows" in cl.stdout

    cp = _cli("maintain", "--database", db, "--table", "animals", "--compact")
    assert cp.returncode == 0 and "OK compact animals: 4 rows" in cp.stdout

    bad = _cli("maintain", "--database", db)
    assert bad.returncode == 2


def test_cli_shard_write_and_append(tmp_path):
    db = str(tmp_path / "db")
    os.makedirs(db)
    src = "/root/testdata/sf0.001/documents.parquet"
    out = _cli("shard", "--database", db, "--table", "corpus", "--from-path", src)
    assert out.returncode == 0, out.stderr[-1500:]
    assert "OK shard corpus:" in out.stdout
    assert os.path.isdir(os.path.join(db, "corpus.parquet"))
    assert os.path.isfile(os.path.join(db, "corpus_manifest.parquet"))
    n_before = sum(
        int(l.split("\t")[1].split("=")[1])
        for l in out.stdout.splitlines()
        if l.startswith("shard=")
    )

    # append the same corpus as a delta: manifest doubles exactly
    app = _cli(
        "shard", "--database", db, "--table", "corpus", "--from-path", src, "--append"
    )
    assert app.returncode == 0, app.stderr[-1500:]
    n_after = sum(
        int(l.split("\t")[1].split("=")[1])
        for l in app.stdout.splitlines()
        if l.startswith("shard=")
    )
    assert n_after == 2 * n_before > 0


def test_corpus_release_example_runs(tmp_path):
    out = str(tmp_path / "release")
    proc = subprocess.run(
        [sys.executable, "examples/corpus_release.py", "--out", out],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "OK corpus release complete" in proc.stdout
    assert os.path.isdir(os.path.join(out, "released_corpus.parquet"))
    assert os.path.isfile(os.path.join(out, "release_shards_manifest.parquet"))


def test_cli_snapshot_both_strategies(tmp_path, spark):
    """`snapshot` runs end-to-end for both strategies: timestamp strategy
    accretes a version when the source row is strictly newer; check
    strategy closes on content change at the caller's as_of."""
    db = str(tmp_path / "db")
    os.makedirs(db)
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100)], "id BIGINT, v STRING, updated BIGINT"
    ).write.parquet(src1)
    spark.createDataFrame(
        [(1, "a2", 200), (2, "b", 100)], "id BIGINT, v STRING, updated BIGINT"
    ).write.parquet(src2)

    for s, want in ((src1, "2 versions (2 open)"), (src2, "3 versions (2 open)")):
        r = _cli(
            "snapshot", "--database", db, "--from", s,
            "--table", "dim_ts", "--key", "id", "--updated-col", "updated",
        )
        assert r.returncode == 0, r.stderr
        assert want in r.stdout

    for s, asof, want in (
        (src1, "2024-01-01 00:00:00", "2 versions (2 open)"),
        (src2, "2024-02-01 00:00:00", "3 versions (2 open)"),
    ):
        r = _cli(
            "snapshot", "--database", db, "--from", s,
            "--table", "dim_chk", "--key", "id",
            "--check-cols", "v", "--as-of", asof,
        )
        assert r.returncode == 0, r.stderr
        assert want in r.stdout

    # missing strategy args is a usage error, not a crash
    r = _cli("snapshot", "--database", db, "--from", src1, "--table", "x", "--key", "id")
    assert r.returncode == 2


def test_rag_prep_example_runs(tmp_path):
    out = str(tmp_path / "rag")
    r = subprocess.run(
        [sys.executable, "examples/rag_prep.py", "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "chunks:" in r.stdout and "vectors:" in r.stdout
    assert "clustered rag_chunks" in r.stdout
    assert os.path.isdir(os.path.join(out, "rag_chunks.parquet")) or os.path.isfile(
        os.path.join(out, "rag_chunks.parquet")
    )


def test_lm_filter_example_runs(tmp_path):
    out = str(tmp_path / "lm")
    r = subprocess.run(
        [sys.executable, "examples/lm_filter.py", "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "model: top bigrams" in r.stdout
    assert "held-out docs" in r.stdout and "published:" in r.stdout
    assert "drift (chi2 ppm" in r.stdout
    assert os.path.exists(os.path.join(out, "lm_filtered_docs.parquet"))


def test_ann_index_example_runs(tmp_path):
    out = str(tmp_path / "ann")
    r = subprocess.run(
        [sys.executable, "examples/ann_index.py", "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "index published at" in r.stdout
    assert "delta appended" in r.stdout
    assert "recall audit over" in r.stdout
    assert "OK ann index lifecycle complete" in r.stdout
    assert os.path.isdir(os.path.join(out, "ann_index.parquet")) or os.path.isdir(
        os.path.join(out, "ann_index")
    )


def test_cli_versioned_model_lifecycle(tmp_path):
    """A versioned model through the CLI: run commits v1, an edited rerun
    commits v2, `versions` prints the history, --rollback points current
    back at v1 (metadata commit), --vacuum reaps dropped snapshots."""
    db = str(tmp_path / "db")
    os.makedirs(db)
    models = tmp_path / "models"
    models.mkdir()
    (models / "kept.sql").write_text(
        "{{ config(materialized='versioned') }}\n"
        "SELECT * FROM {{ source('', 'animals') }} WHERE n_legs <= 5\n"
    )
    seed = _cli("seed", "--database", db, "--csv", "examples/animals/seeds/animals.csv")
    assert seed.returncode == 0

    run1 = _cli("run", "--database", db, "--models-dir", str(models))
    assert run1.returncode == 0 and "OK kept: 3 rows" in run1.stdout

    (models / "kept.sql").write_text(
        "{{ config(materialized='versioned') }}\n"
        "SELECT * FROM {{ source('', 'animals') }} WHERE n_legs = 2\n"
    )
    run2 = _cli("run", "--database", db, "--models-dir", str(models))
    assert run2.returncode == 0 and "OK kept: 1 rows" in run2.stdout

    hist = _cli("versions", "--database", db, "--table", "kept")
    assert hist.returncode == 0
    assert "v1\treplace" in hist.stdout and "rows=3" in hist.stdout
    assert "v2\treplace" in hist.stdout and "v2" in [
        l.split("\t")[0] for l in hist.stdout.splitlines() if "<- current" in l
    ]

    back = _cli("versions", "--database", db, "--table", "kept", "--rollback", "1")
    assert back.returncode == 0 and "OK rollback" in back.stdout
    assert any(
        l.startswith("v3\trollback") and "rows=3" in l and "<- current" in l
        for l in back.stdout.splitlines()
    )

    vac = _cli("versions", "--database", db, "--table", "kept", "--vacuum", "1")
    assert vac.returncode == 0 and "reaped" in vac.stdout
    hist2 = _cli("versions", "--database", db, "--table", "kept")
    # v3 (current, = v1's files) survives; v1/v2 entries pruned
    assert "v3\trollback" in hist2.stdout and "v2\treplace" not in hist2.stdout


def test_cli_versions_optimize(tmp_path):
    """versions --optimize compacts the current snapshot as a new version."""
    db = str(tmp_path / "db")
    os.makedirs(db)
    models = tmp_path / "models"
    models.mkdir()
    (models / "m.sql").write_text(
        "{{ config(materialized='versioned') }}\n"
        "SELECT * FROM {{ source('', 'animals') }}\n"
    )
    assert _cli("seed", "--database", db, "--csv",
                "examples/animals/seeds/animals.csv").returncode == 0
    assert _cli("run", "--database", db, "--models-dir", str(models)).returncode == 0
    out = _cli("versions", "--database", db, "--table", "m", "--optimize")
    assert out.returncode == 0 and "OK optimize" in out.stdout
    assert any(
        l.startswith("v2\toptimize") and "rows=4" in l and "<- current" in l
        for l in out.stdout.splitlines()
    )


def test_versioned_lake_example_runs(tmp_path):
    out = str(tmp_path / "vlake")
    r = subprocess.run(
        [sys.executable, "examples/versioned_lake.py", "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "skipping: " in r.stdout and " of " in r.stdout
    assert "merged: 500 rows" in r.stdout
    assert "time travel: v1 still reads 400 rows" in r.stdout
    assert "OK versioned lake lifecycle complete" in r.stdout


def test_cli_versions_diff(tmp_path):
    """versions --diff N M: value-level diff of two committed snapshots —
    the time-travel debugging loop (what changed between v1 and v2?)."""
    db = str(tmp_path / "db")
    os.makedirs(db)
    models = tmp_path / "models"
    models.mkdir()
    (models / "d.sql").write_text(
        "{{ config(materialized='versioned') }}\n"
        "SELECT * FROM {{ source('', 'animals') }} WHERE n_legs <= 5\n"
    )
    assert _cli("seed", "--database", db, "--csv",
                "examples/animals/seeds/animals.csv").returncode == 0
    assert _cli("run", "--database", db, "--models-dir", str(models)).returncode == 0
    (models / "d.sql").write_text(
        "{{ config(materialized='versioned') }}\n"
        "SELECT * FROM {{ source('', 'animals') }} WHERE n_legs = 2\n"
    )
    assert _cli("run", "--database", db, "--models-dir", str(models)).returncode == 0
    out = _cli("versions", "--database", db, "--table", "d", "--diff", "1", "2")
    assert out.returncode == 0
    # v1 has 3 rows, v2 has 1 (a strict subset): 2 rows differ, count gap 2
    assert "row_count_difference=2" in out.stdout
    assert "num_mismatched=2" in out.stdout
    same = _cli("versions", "--database", db, "--table", "d", "--diff", "1", "1")
    assert "row_count_difference=0" in same.stdout
    assert "num_mismatched=0" in same.stdout


def test_cli_versions_vacuum_dry_run(tmp_path):
    """versions --vacuum --dry-run previews the reap set without
    committing or deleting; a real vacuum afterwards actually reaps."""
    db = str(tmp_path / "db")
    os.makedirs(db)
    models = tmp_path / "models"
    models.mkdir()
    (models / "v.sql").write_text(
        "{{ config(materialized='versioned') }}\n"
        "SELECT * FROM {{ source('', 'animals') }} WHERE n_legs <= 5\n"
    )
    assert _cli("seed", "--database", db, "--csv",
                "examples/animals/seeds/animals.csv").returncode == 0
    assert _cli("run", "--database", db, "--models-dir", str(models)).returncode == 0
    (models / "v.sql").write_text(
        "{{ config(materialized='versioned') }}\n"
        "SELECT * FROM {{ source('', 'animals') }} WHERE n_legs = 2\n"
    )
    assert _cli("run", "--database", db, "--models-dir", str(models)).returncode == 0
    dry = _cli("versions", "--database", db, "--table", "v",
               "--vacuum", "1", "--dry-run")
    assert dry.returncode == 0 and "would reap" in dry.stdout
    assert "dry run" in dry.stdout
    # history untouched by the dry run: v1 still listed
    assert "v1\treplace" in dry.stdout
    real = _cli("versions", "--database", db, "--table", "v", "--vacuum", "1")
    assert real.returncode == 0 and "reaped" in real.stdout
    assert "v1\treplace" not in real.stdout


def test_cli_versions_changes(tmp_path):
    """versions --changes N M prints the change-data-feed summary between
    two snapshots (file-set-diff CDF; r13)."""
    db = str(tmp_path / "db")
    os.makedirs(db)
    models = tmp_path / "models"
    models.mkdir()
    (models / "m.sql").write_text(
        "{{ config(materialized='versioned') }}\n"
        "SELECT * FROM {{ source('', 'animals') }} WHERE n_legs <= 5\n"
    )
    assert _cli("seed", "--database", db, "--csv",
                "examples/animals/seeds/animals.csv").returncode == 0
    assert _cli("run", "--database", db, "--models-dir", str(models)).returncode == 0
    (models / "m.sql").write_text(
        "{{ config(materialized='versioned') }}\n"
        "SELECT * FROM {{ source('', 'animals') }} WHERE n_legs = 2\n"
    )
    assert _cli("run", "--database", db, "--models-dir", str(models)).returncode == 0
    out = _cli("versions", "--database", db, "--table", "m", "--changes", "1", "2")
    assert out.returncode == 0
    # v1 kept 3 rows, v2 kept 1 of those: the replace staged a new file set,
    # so the bag diff is 2 deletes, 0 inserts
    assert "changes m v1 -> v2: inserts=0 deletes=2" in out.stdout


def test_cli_versions_clone_constraint_apply(tmp_path):
    """The r14 versioned surface through the CLI: --clone (zero-copy),
    --as-of-ts resolution, --set-constraint (violating writes refused at
    the library level; the CLI records it), --drop-constraint, and
    --apply-changes replica maintenance with the exactly-once skip."""
    db = str(tmp_path / "db")
    os.makedirs(db)
    models = tmp_path / "models"
    models.mkdir()
    (models / "src.sql").write_text(
        "{{ config(materialized='versioned') }}\n"
        "SELECT * FROM {{ source('', 'animals') }}\n"
    )
    assert _cli("seed", "--database", db, "--csv",
                "examples/animals/seeds/animals.csv").returncode == 0
    assert _cli("run", "--database", db, "--models-dir", str(models)).returncode == 0

    # clone: metadata-only, history independent
    cl = _cli("versions", "--database", db, "--table", "src", "--clone", "twin")
    assert cl.returncode == 0 and "OK clone" in cl.stdout
    hist = _cli("versions", "--database", db, "--table", "twin")
    assert "v1\tclone" in hist.stdout and "rows=4" in hist.stdout

    # as-of-ts: any time >= v1's commit resolves to v1
    import time as _time

    ts = _time.time() + 60
    aso = _cli("versions", "--database", db, "--table", "src",
               "--as-of-ts", str(ts))
    assert aso.returncode == 0 and "version 1" in aso.stdout

    # constraints: add validates the snapshot; a violated add refuses
    ok = _cli("versions", "--database", db, "--table", "src",
              "--set-constraint", "legs_nonneg", "n_legs >= 0")
    assert ok.returncode == 0 and "OK constraint" in ok.stdout
    bad = _cli("versions", "--database", db, "--table", "src",
               "--set-constraint", "legs_many", "n_legs >= 100")
    assert bad.returncode != 0  # existing rows violate: refused loudly
    dropped = _cli("versions", "--database", db, "--table", "src",
                   "--drop-constraint", "legs_nonneg")
    assert dropped.returncode == 0 and "dropped" in dropped.stdout

    # apply-changes: advance src (rollback makes a v2), replica follows
    assert _cli("versions", "--database", db, "--table", "src",
                "--rollback", "1").returncode == 0
    ac = _cli("versions", "--database", db, "--table", "twin",
              "--apply-changes", "src", "animals", "1")
    assert ac.returncode == 0 and "OK apply-changes" in ac.stdout
    again = _cli("versions", "--database", db, "--table", "twin",
                 "--apply-changes", "src", "animals", "1")
    assert again.returncode == 0 and "exactly-once skip" in again.stdout

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

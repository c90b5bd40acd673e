"""'Switch and run': a reference user's DuckDB-dialect model SQL executes
unchanged through the project runner."""

from __future__ import annotations

import pytest

from dbt_parquet_spark.catalog import FilesystemCatalog
from dbt_parquet_spark.dialect import register_duckdb_compat
from dbt_parquet_spark.materialize import create_table_as
from dbt_parquet_spark.project import Model, Project


@pytest.fixture()
def db(tmp_path):
    return FilesystemCatalog(str(tmp_path))


def test_reference_animals_model_verbatim(spark, db):
    """The reference's flagship model SQL, byte-for-byte
    (reference examples/animals/models/animals_str.sql): `n_legs::VARCHAR`."""
    db.create_schema("source_schema")
    animals = spark.createDataFrame(
        [(2, "Flamingo"), (4, "Horse"), (5, "Brittle stars"), (100, "Centipede")],
        "n_legs: long, animals: string",
    )
    create_table_as(spark, db, db.relation("animals", "source_schema"), animals, single_file=True)
    project = Project(db)
    project.add(
        Model(
            "animals_str",
            "select\n    n_legs::VARCHAR as n_legs,\n    animals\n"
            "from {{ source('source_schema', 'animals') }}\n",
        )
    )
    project.run(spark)
    out = spark.table("animals_str")
    assert dict(out.dtypes) == {"n_legs": "string", "animals": "string"}
    assert {r.n_legs for r in out.collect()} == {"2", "4", "5", "100"}


def test_duckdb_idioms_in_models(spark, db):
    """ORDER BY ALL / GROUP BY ALL / len / string_split / list_distinct /
    regexp_matches — the catalog-macro idioms (reference macros/catalog.sql)."""
    project = Project(db)
    project.add(
        Model(
            "words",
            "SELECT 'a b c b' AS text, 2 AS grp UNION ALL SELECT 'x y', 1",
        )
    )
    project.add(
        Model(
            "word_stats",
            """
            SELECT grp,
                   len(string_split(text, ' ')) AS n_tokens,
                   size(list_distinct(string_split(text, ' '))) AS n_distinct,
                   regexp_matches(text, 'a.*c') AS has_abc
            FROM {{ ref('words') }}
            GROUP BY ALL
            ORDER BY ALL
            """,
        )
    )
    project.run(spark)
    rows = {r.grp: r for r in spark.table("word_stats").collect()}
    assert rows[2].n_tokens == 4 and rows[2].n_distinct == 3 and rows[2].has_abc
    assert rows[1].n_tokens == 2 and not rows[1].has_abc


def test_string_split_literal_separator(spark):
    register_duckdb_compat(spark)
    row = spark.sql("SELECT string_split('a.b.c', '.') AS parts").first()
    assert row.parts == ["a", "b", "c"]  # literal '.', not regex any-char

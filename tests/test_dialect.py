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


# --- 1-based subscript rewriting ------------------------------------------


def test_subscript_rewrite_forms():
    from dbt_parquet_spark.dialect import translate_sql

    assert (
        translate_sql("file_parts[num_parts - 1]")
        == "try_element_at(file_parts, num_parts - 1)"
    )
    assert translate_sql("select [1, 2] as xs") == "select array(1, 2) as xs"
    assert translate_sql("ARRAY[1, 2]") == "array(1, 2)"
    assert translate_sql("m['k']") == "try_element_at(m, 'k')"
    assert translate_sql("a[2:4]") == "slice(a, 2, (4)-(2)+1)"
    assert translate_sql("a[2:]") == "slice(a, 2, size(a)-(2)+1)"
    assert translate_sql("'lit [x]'") == "'lit [x]'"  # literals untouched
    # chained + nested
    assert (
        translate_sql("string_split(p, '/')[2]")
        == "try_element_at(string_split(p, '/'), 2)"
    )
    assert translate_sql("a[b[1]]") == "try_element_at(a, try_element_at(b, 1))"


def test_subscript_is_one_based_and_null_out_of_bounds(spark):
    """DuckDB subscripts are 1-based and NULL when out of range; the rewrite
    must preserve BOTH (Spark's native arr[i] is 0-based, and element_at
    raises under ANSI mode)."""
    from dbt_parquet_spark.dialect import translate_sql

    row = spark.sql(
        translate_sql("SELECT split('a b c', ' ')[1] AS first, split('a b c', ' ')[9] AS oob")
    ).first()
    assert row.first == "a"
    assert row.oob is None


def test_reference_catalog_macro_idiom_matches_duckdb(spark, oracle_con):
    """The reference's own catalog macro extracts schema/table from file
    paths with 1-based subscripts (reference macros/catalog.sql:17-18).
    Run those expressions VERBATIM through the dialect layer and check the
    values against DuckDB executing the original text."""
    from dbt_parquet_spark.dialect import register_duckdb_compat, translate_sql

    register_duckdb_compat(spark)
    paths = [
        ("/db/main/orders.parquet",),
        ("/db/staging/lineitem.parquet",),
        ("/db/a/b/events.parquet",),
    ]
    body = """
    SELECT file_parts[num_parts - 1] AS table_schema,
           string_split(file_parts[num_parts], '.parquet')[1] AS table_name
    FROM (
        SELECT string_split(file_name, '/') AS file_parts,
               len(string_split(file_name, '/')) AS num_parts
        FROM paths_v
    )
    """
    spark.createDataFrame(paths, "file_name: string").createOrReplaceTempView("paths_v")
    got = {tuple(r) for r in spark.sql(translate_sql(body)).collect()}
    con = oracle_con.cursor()
    con.execute("CREATE OR REPLACE TEMP TABLE paths_v(file_name VARCHAR)")
    con.executemany("INSERT INTO paths_v VALUES (?)", [list(p) for p in paths])
    want = set(map(tuple, con.execute(body).fetchall()))
    assert got == want
    assert ("staging", "lineitem") in got


def test_star_exclude_rewrites():
    from dbt_parquet_spark.dialect import translate_sql

    assert translate_sql("SELECT * EXCLUDE (b) FROM t") == "SELECT * EXCEPT (b) FROM t"
    assert translate_sql("SELECT * EXCLUDE b FROM t") == "SELECT * EXCEPT (b) FROM t"
    assert (
        translate_sql("SELECT t.* EXCLUDE (b, c) FROM t")
        == "SELECT t.* EXCEPT (b, c) FROM t"
    )
    # string literals and non-star EXCLUDE are untouched
    assert translate_sql("SELECT '* EXCLUDE (b)' AS s") == "SELECT '* EXCLUDE (b)' AS s"


def test_qualify_rewrite_matches_duckdb(spark):
    import duckdb

    from dbt_parquet_spark.dialect import translate_sql

    spark.range(12).selectExpr("id", "id % 3 AS g", "id * 10 AS v").createOrReplaceTempView(
        "qualify_t"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE qualify_t AS SELECT i AS id, i % 3 AS g, i * 10 AS v FROM range(12) r(i)")
    cases = [
        # alias-referencing predicate
        "SELECT id, g, row_number() OVER (PARTITION BY g ORDER BY id) AS rn "
        "FROM qualify_t QUALIFY rn = 1",
        # direct window predicate with ORDER BY / LIMIT tail kept outside
        "SELECT id, g FROM qualify_t "
        "QUALIFY row_number() OVER (PARTITION BY g ORDER BY id DESC) = 1 ORDER BY id LIMIT 2",
        # window over an aggregate, after GROUP BY
        "SELECT g, MAX(v) AS mv FROM qualify_t GROUP BY g "
        "QUALIFY rank() OVER (ORDER BY MAX(v) DESC) <= 2",
        # QUALIFY inside a subquery
        "SELECT * FROM (SELECT id, g, v FROM qualify_t "
        "QUALIFY row_number() OVER (PARTITION BY g ORDER BY v DESC) = 1) WHERE g < 2",
    ]
    for sql in cases:
        got = sorted(tuple(r) for r in spark.sql(translate_sql(sql)).collect())
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, sql


def test_qualify_untouched_in_strings():
    from dbt_parquet_spark.dialect import translate_sql

    assert translate_sql("SELECT 'QUALIFY x' AS s FROM t") == "SELECT 'QUALIFY x' AS s FROM t"


def test_comments_with_apostrophes_do_not_break_rewrites():
    from dbt_parquet_spark.dialect import translate_sql

    sql = (
        "-- keep each sensor's latest reading\n"
        "SELECT sensor FROM readings\n"
        "QUALIFY row_number() OVER (PARTITION BY sensor ORDER BY ts DESC) = 1"
    )
    out = translate_sql(sql)
    assert "QUALIFY" not in out and "__qualify" in out
    # a '--' inside a string literal is data, not a comment
    assert translate_sql("SELECT '--x' AS s FROM t") == "SELECT '--x' AS s FROM t"
    # block comments are stripped string-awarely
    assert translate_sql("SELECT /* don't */ 1 AS x") == "SELECT   1 AS x"

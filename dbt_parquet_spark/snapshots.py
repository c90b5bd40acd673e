"""SCD Type-2 snapshots — dbt's history-tracking materialization, which the
reference explicitly does not support ("snapshots … not supported for
parquet files", reference tests/functional/basic/test_basic.py:94-99).

A snapshot table carries every version of every key with validity bounds:
  (business columns…, dbt_valid_from TIMESTAMP, dbt_valid_to TIMESTAMP|NULL)
On each run against the current source state:
  - new keys     → inserted, valid_from = as_of, valid_to = NULL
  - changed rows → old version closed (valid_to = as_of), new version opened
  - vanished keys→ current version closed
Change detection is a content hash over tracked columns (check strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import FilesystemCatalog, Relation
from .materialize import create_table_as
from .sources.readers import read_parquet

VALID_FROM, VALID_TO = "dbt_valid_from", "dbt_valid_to"


def _hashed(df: DataFrame, key: str, tracked: list[str]) -> DataFrame:
    return df.select(
        key, *tracked, F.md5(F.to_json(F.struct(*tracked))).alias("_content_hash")
    )


def snapshot(
    spark: SparkSession,
    catalog: FilesystemCatalog,
    rel: Relation,
    source: DataFrame,
    key: str,
    tracked: list[str],
    as_of: str,
) -> DataFrame:
    """Apply one snapshot pass at timestamp ``as_of`` (ISO string — caller
    provides it, keeping runs reproducible). Returns the updated history.

    Scale: one join of history-current vs source on the key; history cold
    versions (valid_to set) pass through untouched — with the history
    partitioned by validity status only the current slice is read.
    """
    ts = F.lit(as_of).cast("timestamp")
    src = _hashed(source, key, tracked)

    if not catalog.exists(rel):
        first = src.select(
            key, *tracked, "_content_hash", ts.alias(VALID_FROM), F.lit(None).cast("timestamp").alias(VALID_TO)
        )
        return create_table_as(spark, catalog, rel, first, single_file=False)

    hist = read_parquet(spark, rel.path)
    closed = hist.filter(F.col(VALID_TO).isNotNull())
    current = hist.filter(F.col(VALID_TO).isNull())

    cur = current.alias("cur")
    new = src.alias("new")
    joined = cur.join(new, F.col(f"cur.{key}") == F.col(f"new.{key}"), "full_outer")

    still_current = joined.filter(
        F.col(f"new.{key}").isNotNull()
        & F.col(f"cur.{key}").isNotNull()
        & (F.col("cur._content_hash") == F.col("new._content_hash"))
    ).select("cur.*")
    newly_closed = joined.filter(
        F.col(f"cur.{key}").isNotNull()
        & (F.col(f"new.{key}").isNull() | (F.col("cur._content_hash") != F.col("new._content_hash")))
    ).select(*[F.col(f"cur.{c}") for c in hist.columns if c != VALID_TO], ts.alias(VALID_TO))
    opened = joined.filter(
        F.col(f"new.{key}").isNotNull()
        & (F.col(f"cur.{key}").isNull() | (F.col("cur._content_hash") != F.col("new._content_hash")))
    ).select(
        *[F.col(f"new.{c}") for c in [key, *tracked, "_content_hash"]],
        ts.alias(VALID_FROM),
        F.lit(None).cast("timestamp").alias(VALID_TO),
    )

    updated = closed.unionByName(newly_closed).unionByName(still_current).unionByName(opened)
    return create_table_as(spark, catalog, rel, updated, single_file=False)


def current_view(history: DataFrame) -> DataFrame:
    return history.filter(F.col(VALID_TO).isNull())


def as_of_view(history: DataFrame, at: str) -> DataFrame:
    """Point-in-time reconstruction: rows valid at ``at``."""
    t = F.lit(at).cast("timestamp")
    return history.filter(
        (F.col(VALID_FROM) <= t) & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > t))
    )

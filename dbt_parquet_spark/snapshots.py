"""dbt-style snapshots: type-2 slowly-changing-dimension history on plain
parquet.

``dbt snapshot`` (timestamp strategy) is the other thing reference users
run besides models and seeds: re-running it against a mutating source
accretes a full change history — each key's versions carry
[valid_from, valid_to) intervals, the open version has valid_to NULL.
``snapshot_scd2`` implements that merge against a catalog table with the
same atomic write-then-swap publish as every other materialization
(materialize.create_table_as), and ``q_scd2_history`` states the SCD2
semantics as a driver-verified query: collapse an event stream into
validity intervals per entity.

Scale: one snapshot run = one equi-join of the source against the OPEN
versions on the unique key (closed history is read and re-written but
never joined; at petabyte history, partition the snapshot table by
open/closed so the rewrite touches the open partition only — noted in the
docstring), plus key-anti-joins for unchanged/new rows. No windows, no
corpus-sized driver state.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import FilesystemCatalog, Relation
from .materialize import create_table_as
from .registry import register
from .sources.readers import load_table

VALID_FROM, VALID_TO = "valid_from", "valid_to"


def snapshot_scd2(
    spark: SparkSession,
    catalog: FilesystemCatalog,
    rel: Relation,
    source_df: DataFrame,
    key_col: str,
    updated_col: str,
) -> DataFrame:
    """Run one snapshot pass (dbt timestamp strategy): for each source row
    whose ``updated_col`` is strictly newer than the key's open version,
    close the open version (valid_to = the new timestamp) and insert the
    new one; unknown keys insert as open versions; everything else is
    carried unchanged. Requires ``key_col`` unique in ``source_df`` (the
    dbt snapshot contract). Idempotent: re-running against the same source
    changes nothing.

    At 100 TB: the join side is only the OPEN versions (one row per live
    key); closed history rides through the rewrite untouched — partition
    the physical table by ``valid_to IS NULL`` if rewriting history
    dominates."""
    payload = [c for c in source_df.columns]
    vto_type = source_df.schema[updated_col].dataType

    def _open(df: DataFrame, qual: str = "") -> DataFrame:
        pre = f"{qual}." if qual else ""
        return df.select(
            *[F.col(f"{pre}{c}") for c in payload],
            F.col(f"{pre}{updated_col}").alias(VALID_FROM),
            F.lit(None).cast(vto_type).alias(VALID_TO),
        )

    if not catalog.io.exists(catalog.fs_path(rel)):
        return create_table_as(spark, catalog, rel, _open(source_df))

    old = spark.read.parquet(rel.path)
    cur = old.filter(F.col(VALID_TO).isNull())
    hist = old.filter(F.col(VALID_TO).isNotNull())

    src = source_df.alias("s")
    match = src.join(cur.alias("c"), F.col(f"s.{key_col}") == F.col(f"c.{key_col}"))
    newer = match.filter(F.col(f"s.{updated_col}") > F.col(f"c.{VALID_FROM}"))
    new_versions = _open(newer, "s")
    closed = newer.select(
        *[F.col(f"c.{c}") for c in payload + [VALID_FROM]],
        F.col(f"s.{updated_col}").alias(VALID_TO),
    )
    changed_keys = newer.select(F.col(f"s.{key_col}").alias(key_col))
    carried_open = cur.join(changed_keys, key_col, "left_anti")
    brand_new = _open(source_df.join(cur.select(key_col), key_col, "left_anti"))
    snap = hist.unionByName(closed).unionByName(carried_open).unionByName(new_versions).unionByName(brand_new)
    return create_table_as(spark, catalog, rel, snap)


@register(
    "q_scd2_history",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                         IS NOT DISTINCT FROM event_type
                    THEN 0 ELSE 1 END AS chg
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, ts,
               SUM(chg) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM marked
    ),
    versions AS (
        SELECT user_id, event_type, run_id,
               CAST(MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS valid_from_us
        FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT user_id, event_type, valid_from_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us) AS valid_to_us
    FROM versions
    """,
    tags=("snapshot", "scd2", "history", "window"),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 change history derived from an event stream: consecutive equal
    event_type rows per user collapse into one version row with
    [valid_from_us, valid_to_us) validity (open version: NULL valid_to) —
    exactly what snapshot_scd2 accretes across runs, stated as one query so
    the driver value-checks the interval semantics. Timestamps surface as
    BIGINT epoch-micros on both engines (events.ts is parquet
    TIMESTAMP(NANOS); the reader lands it as micro-precision TimestampType,
    and the oracle's CAST(ts AS TIMESTAMP) truncates identically — the
    established batch_windows.py idiom).

    Scale: two user_id-keyed windows (per-entity partitions) and one
    (user, run) aggregate — one shuffle; versions ≈ change points, far
    fewer than events."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("chg"),
    ).select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_id"),
    )
    versions = marked.groupBy("user_id", "event_type", "run_id").agg(
        F.min(F.unix_micros("ts")).alias("valid_from_us")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us")
    return versions.select(
        "user_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w2).alias("valid_to_us"),
    )

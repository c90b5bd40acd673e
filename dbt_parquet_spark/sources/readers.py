"""Parquet/CSV source readers.

Reference equivalents: ``parquet_scan('{path}')`` (reference relation.py:101-102)
and ``read_csv_auto`` seed ingestion (reference impl.py:151-163). Spark's
vectorized parquet reader + Catalyst pushdown replace DuckDB's scan; the
declarative ``spark.read`` keeps projection pruning / predicate pushdown free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver's testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table_names(sf_dir: str) -> list[str]:
    return [t for t in TESTDATA_TABLES if os.path.exists(table_path(sf_dir, t))]


def _ns_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — footer-only probe.

    Resolves through pyarrow.fs so the probe works on any path spelling the
    engine reads (bare local path, file://, s3a://...); an unreachable or
    unlistable location degrades to "no nanos columns" rather than failing
    the read — Spark itself will surface a real IO error with context."""
    import pyarrow as pa
    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    try:
        if "://" in path:
            uri = path.replace("s3a://", "s3://", 1)
            fs, fpath = pafs.FileSystem.from_uri(uri)
        else:
            fs, fpath = pafs.LocalFileSystem(), path
        info = fs.get_file_info(fpath)
        if info.type == pafs.FileType.Directory:
            # recursive: hive-partitioned sources nest their part files
            # under col=value/ directories (read_partitioned)
            sel = pafs.FileSelector(fpath, recursive=True)
            parts = sorted(
                i.path for i in fs.get_file_info(sel) if i.path.endswith(".parquet")
            )
            if not parts:
                return []
            fpath = parts[0]
        with fs.open_input_file(fpath) as f:
            pf = pq.ParquetFile(f)
            return _ns_cols_of(pf)
    except (OSError, pa.lib.ArrowException):
        # ArrowException covers ArrowInvalid AND ArrowNotImplementedError —
        # from_uri raises the latter for schemes without compiled filesystem
        # support (hdfs:// without libhdfs, gs:// without gcsfs); the probe
        # must defer to Spark's own reader there, not crash the read.
        return []


def _ns_cols_of(pf) -> list[str]:
    import pyarrow.types as pat
    # INT96 legacy timestamps surface as ns in Arrow but Spark reads them
    # natively — only true INT64 TIMESTAMP(NANOS) needs the escape hatch.
    physical = {
        pf.schema.column(i).name: pf.schema.column(i).physical_type
        for i in range(len(pf.schema))
    }
    return [
        f.name
        for f in pf.schema_arrow
        if pat.is_timestamp(f.type)
        and f.type.unit == "ns"
        and physical.get(f.name) == "INT64"
    ]


def read_parquet(spark: SparkSession, path: str, merge_schema: bool = False) -> DataFrame:
    """Parquet scan with timestamp normalization (ns and NTZ).

    ``merge_schema=True`` unions the schemas of all part files (columns
    absent in older files read as NULL) — the read side of append-time
    schema evolution (incremental.incremental_append). Off by default:
    schema merging footer-reads every file, which is wasted work on
    stable-schema tables.

    Spark 4 rejects parquet TIMESTAMP(NANOS) outright; with the
    ``nanosAsLong`` escape hatch it surfaces as a raw long. We convert to
    TimestampType by integer-dividing to µs — exactly DuckDB's ns→µs
    truncation, so oracle comparisons are well-defined (SURVEY §7 risk
    register). Integer ``div``, NOT ``/``: float division loses precision at
    ns-since-epoch magnitudes.

    Spark 4 also infers parquet timestamps without ``isAdjustedToUTC`` as
    TIMESTAMP_NTZ (``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults
    true), and NTZ columns reject ``withWatermark`` / ``cast(long)``. The
    engine cannot assume its own session configs (callers pass their own
    SparkSession), so this reader casts any NTZ column to TIMESTAMP. The
    cast interprets the naive wall clock in the session timezone and the
    naive rendering the oracle harness compares converts back in the same
    timezone — wall-clock-preserving under ANY session tz (unlike disabling
    NTZ inference, which reinterprets stored micros as UTC instants and
    shifts the rendering under non-UTC sessions).
    """
    from pyspark.sql import functions as F

    ns_cols = _ns_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_partitioned(spark: SparkSession, path: str, base_path: str | None = None) -> DataFrame:
    """Read an externally-produced hive-partitioned parquet directory
    (``col=value/.../part-*.parquet``) — the layout every existing lake
    hands this engine first. Spark's partition discovery turns the directory
    names into a real column, and any filter on it becomes PartitionFilters
    at the scan: unselected directories are never opened, not even their
    footers (plan-gated in tests/test_plans.py). The reference cannot read
    these at all (single-file tables, reference README.md:49).

    ``base_path`` pins partition-column discovery when ``path`` points
    INSIDE the partition tree (e.g. reading one ``date=2024-01-01/``
    subtree while keeping ``date`` as a column). Timestamp normalization
    (ns/NTZ) matches read_parquet — the probe walks the tree recursively."""
    from pyspark.sql import functions as F

    ns_cols = _ns_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    df = reader.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. A 'table' is a parquet path (file OR directory of part
    files — Spark handles both layouts; the reference is restricted to single
    files, reference relation.py:26-32 / README.md:49)."""
    return read_parquet(spark, table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    if not names:
        names = tuple(table_names(sf_dir))
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Expose tables as temp views — the Spark analog of the reference's
    view-registration-on-connect (reference connections.py:79-88)."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)

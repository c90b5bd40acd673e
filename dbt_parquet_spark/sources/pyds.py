"""Custom Python DataSource (Spark 4 datasource API) — the source
extensibility point: implement `DataSource`/`DataSourceReader` and any
`spark.read.format(...)` consumer can use it like a built-in.

This one generates deterministic synthetic documents partition-parallel
(seeded per partition) — the pattern for wrapping any external system
(an HTTP corpus API, a proprietary store) as a first-class, partitioned,
schema-typed Spark source.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class SyntheticDocsDataSource(DataSource):
    """spark.read.format("synthetic_docs").option("rows", N).option("partitions", P)"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string"

    def reader(self, schema: StructType) -> "SyntheticDocsReader":
        return SyntheticDocsReader(
            rows=int(self.options.get("rows", 100)),
            partitions=int(self.options.get("partitions", 4)),
        )


class SyntheticDocsReader(DataSourceReader):
    VOCAB = ("table", "row", "scan", "join", "sort", "value", "key", "fast", "query", "data")
    LANGS = ("en", "de", "fr")

    def __init__(self, rows: int, partitions: int):
        self.rows = rows
        self.n_parts = partitions

    def partitions(self):
        # one InputPartition per split → Spark schedules them in parallel
        per = self.rows // self.n_parts
        bounds = []
        for i in range(self.n_parts):
            start = i * per
            end = self.rows if i == self.n_parts - 1 else (i + 1) * per
            bounds.append(InputPartition((start, end)))
        return bounds

    def read(self, partition: InputPartition):
        # deterministic per doc_id — independent of partitioning/scheduling
        import random

        start, end = partition.value
        for doc_id in range(start, end):
            rng = random.Random(doc_id)
            n = rng.randint(8, 24)
            text = " ".join(rng.choice(self.VOCAB) for _ in range(n))
            yield (doc_id, text, rng.choice(self.LANGS))

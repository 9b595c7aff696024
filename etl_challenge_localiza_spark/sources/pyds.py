"""Custom connector surface: a Spark 4 Python DataSource.

The reference reads one CSV (flows/pipeline.py:41-47); real deployments
also pull from services/queues with no built-in reader. Spark 4's
Python DataSource API is the sanctioned way to add one: the driver
plans :meth:`DataSourceReader.partitions` (how the source SHARDS — the
unit of parallel fetch), each executor runs :meth:`read` for its split,
and Arrow batches carry rows to the JVM. This module implements a
deterministic row-generating source so the partition protocol is
exercised end-to-end and the output is oracle-checkable in closed form
(the same pattern a REST/paginated-API connector follows: one
InputPartition per page range).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticRowsDataSource(DataSource):
    """``spark.read.format("synth_rows").option("n", N).option("parts", P)``
    → rows (id, bucket=id%10, value=id*0.5) for id in [0, N), generated
    in P independent partitions."""

    @classmethod
    def name(cls) -> str:
        return "synth_rows"

    def schema(self) -> str:
        return "id long, bucket int, value double"

    def reader(self, schema) -> "SyntheticRowsReader":
        return SyntheticRowsReader(self.options)


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        # contiguous id ranges — the shard plan a paginated connector
        # would build; each executor fetches only its slice
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        i = partition.value
        lo = self.n * i // self.parts
        hi = self.n * (i + 1) // self.parts
        for j in range(lo, hi):
            # id*0.5 is exactly representable → engine-identical sums
            yield (j, j % 10, j * 0.5)


def register(spark) -> None:
    """Idempotently register the source with the session."""
    spark.dataSource.register(SyntheticRowsDataSource)

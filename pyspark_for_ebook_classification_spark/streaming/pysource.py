"""Custom STREAMING Python Data Source (Spark 4
`SimpleDataSourceStreamReader`) — the streaming half of sources/pyds.py:
a deterministic, finite micro-batch source whose offsets are plain row
indices, so every batch's contents are an exact function of the offset
range and a batch-twin computation can verify the collected output.

Shape notes for 100 TB streams: offsets here are a single integer, but
the same three-method contract (initialOffset / read(start) /
readBetweenOffsets) carries partitioned offset dicts (e.g. one watermark
per shard) — the planner calls read() on the driver only to DECIDE the
range; row materialization happens on executors via the returned
iterator's serialized form.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

_MULT = 2654435761
_MOD = 1000003


def synth_row(i: int) -> tuple[int, int, int]:
    """The shared row function: id, bucket, hashed value (same math as
    the batch synth_corpus source — exact int64 in every engine)."""
    return (i, i % 10, (i * _MULT) % _MOD)


class SynthStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.total = int(options.get("rows", 500))
        self.batch = int(options.get("batch", 100))

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start: dict):
        # iterator over a CONCRETE list: the contract wants an iterator,
        # and the prefetched batch is pickled driver→executor — list
        # iterators pickle, generators don't
        lo = start["idx"]
        hi = min(lo + self.batch, self.total)
        return iter([synth_row(i) for i in range(lo, hi)]), {"idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_row(i) for i in range(start["idx"], end["idx"])])


class SynthStreamDataSource(DataSource):
    """`spark.readStream.format("synth_stream").option("rows", N).load()`."""

    @classmethod
    def name(cls):
        return "synth_stream"

    def schema(self):
        return "id bigint, bucket bigint, val bigint"

    def simpleStreamReader(self, schema):
        return SynthStreamReader(self.options)


def register(spark) -> None:
    """By-value module pickling (see sources/pyds.py): workers replay
    offset ranges without importing this package."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SynthStreamDataSource)

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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

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
    spark.dataSource.register(JsonlStreamSinkDataSource)


# ---------------------------------------------------------- stream writer

class _EpochCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming custom sink (`DataSourceStreamWriter`): one part file per
    (epoch, partition), a per-epoch manifest written on commit — so a
    restarted query that replays an epoch overwrites its manifest instead
    of double-publishing (idempotent publish, the streaming analogue of
    the batch sink's publish-on-commit)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_stream_sink requires a 'path' option")

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.jsonl"
        )
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _EpochCommit(part, n)

    def commit(self, messages, batchId):
        import json
        import os

        manifest = {
            "batch": batchId,
            "parts": sorted(m.path for m in messages if m is not None),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, f"_MANIFEST-{batchId}.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlStreamSinkDataSource(DataSource):
    """`df.writeStream.format("jsonl_stream_sink").option("path", d)`."""

    @classmethod
    def name(cls):
        return "jsonl_stream_sink"

    def schema(self):
        return "id bigint, bucket bigint, val bigint"

    def streamWriter(self, schema, overwrite):
        return JsonlStreamWriter(self.options)

"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource`) —
SURVEY.md §2.1 extension: the engine can mount arbitrary external systems
as first-class, partition-parallel Spark sources in pure Python.

The demo source is a deterministic synthetic corpus generator ("synth"):
given `rows` and `parts` options it plans `parts` input partitions, each
yielding its own contiguous id range executor-side — the exact shape a
100 TB connector needs (driver plans splits; workers stream rows; no
driver-side materialization). All emitted values are pure integer hash
math, so a SQL oracle over generate_series reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

#: Knuth's multiplicative-hash constant and a prime modulus — exact in
#: int64 for every id this source can emit (id < ~3.4e9 keeps the product
#: under 2^63; the driver tables stay far below that).
_MULT = 2654435761
_MOD = 1000003


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 8))
        #: pushdown state: id range [lo, hi) clipped at PLANNING time,
        #: bucket equality turned into a stride at READ time
        self.lo = 0
        self.hi = self.rows
        self.bucket_eq: int | None = None

    def pushFilters(self, filters):
        """Spark 4.1 filter pushdown (SupportsPushDownFilters for Python
        sources). Range predicates on `id` clip the split plan — whole
        partitions are never planned, the connector equivalent of
        partition pruning; `bucket = k` becomes a modular STRIDE inside
        read() (bucket ≡ id mod 10 by construction), so non-matching
        rows are never generated rather than generated-then-filtered.
        Everything else is yielded back for Spark to evaluate — the
        contract is AND-semantics, handle a subset, return the rest."""
        for f in filters:
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)) and f.attribute == ("id",):
                bound = f.value + 1 if isinstance(f, GreaterThan) else f.value
                self.lo = max(self.lo, int(bound))
            elif isinstance(f, (LessThan, LessThanOrEqual)) and f.attribute == ("id",):
                bound = f.value if isinstance(f, LessThan) else f.value + 1
                self.hi = min(self.hi, int(bound))
            elif isinstance(f, EqualTo) and f.attribute == ("id",):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo) and f.attribute == ("bucket",):
                v = f.value
                if isinstance(v, int) and 0 <= v <= 9 and self.bucket_eq in (None, v):
                    self.bucket_eq = v
                else:
                    # out-of-domain (bucket is always id % 10 ∈ [0, 9]) or
                    # contradicting an earlier bucket equality: the result
                    # is provably empty — claim the filter and plan nothing,
                    # never remap the value into the domain
                    self.hi = self.lo
            else:
                yield f

    def partitions(self):
        """Driver-side split planning over the (possibly clipped) id
        range: O(parts) split objects, never row data. Splits fully
        outside pushed id bounds simply do not exist."""
        lo, hi = self.lo, max(self.lo, self.hi)
        n = hi - lo
        if n == 0:
            return [_RangePartition(lo, lo)]
        step = max(1, -(-n // self.parts))
        return [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition):
        """Executor-side row stream for one split — pure generator, so
        rows flow straight into Arrow batches without buffering the
        partition in memory. A pushed bucket equality advances by 10s
        from the first matching id instead of testing every row."""
        if self.bucket_eq is None:
            ids = range(partition.start, partition.end)
        else:
            first = partition.start + (self.bucket_eq - partition.start) % 10
            ids = range(first, partition.end, 10)
        for i in ids:
            yield (i, i % 10, (i * _MULT) % _MOD)


class SynthCorpusDataSource(DataSource):
    """`spark.read.format("synth_corpus").option("rows", N).load()`."""

    @classmethod
    def name(cls):
        return "synth_corpus"

    def schema(self):
        return "id bigint, bucket bigint, val bigint"

    def reader(self, schema):
        return SynthCorpusReader(self.options)


def register(spark) -> None:
    """Register the source, forcing this module to pickle BY VALUE: the
    DataSource class ships inside the serialized plan, so Python workers
    never need this package on their import path (the driver harness may
    run from any cwd — same constraint the pandas-UDF closures solve)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    # SynthCorpusReader implements pushFilters(); Spark 4.1 gates Python-
    # source pushdown behind this conf and raises (not ignores) when a
    # reader defines pushFilters with the conf off — so enabling it here,
    # at the only entry point that makes these sources exist, IS the
    # narrowest possible scope. It affects Python data sources only.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthCorpusDataSource)
    spark.dataSource.register(JsonlSinkDataSource)


# ------------------------------------------------------------- write path

class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JsonlSinkWriter(DataSourceWriter):
    """Partition-parallel JSONL sink: each task streams its partition to
    one part file and reports a commit message; the driver's commit()
    writes the manifest LAST, so readers treat half-written jobs as
    absent (the same publish-on-commit protocol every atomic 100 TB sink
    uses)."""

    def __init__(self, options, overwrite=False):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires a 'path' option")
        # Deletion of prior data is DEFERRED to commit(): clearing at plan
        # time would destroy the committed dataset before any task ran, so
        # a failed overwrite job would leave the directory empty — exactly
        # the non-atomicity this sink's publish-on-commit protocol exists
        # to prevent. Until commit(), the old parts and old manifest stay
        # valid; abort() removes only this job's (uuid-suffixed) parts.
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.jsonl")
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(part, n)

    def commit(self, messages):
        import glob
        import json
        import os

        new_parts = sorted(m.path for m in messages if m is not None)
        new_rows = sum(m.rows for m in messages if m is not None)
        target_prev = os.path.join(self.path, "_MANIFEST.json")
        if not self.overwrite and os.path.exists(target_prev):
            # append mode: the manifest is cumulative — keep the committed
            # parts of prior jobs alongside this job's.
            with open(target_prev) as f:
                prev = json.load(f)
            new_parts = sorted(set(prev.get("parts", [])) | set(new_parts))
            new_rows += prev.get("rows", 0)
        manifest = {"parts": new_parts, "rows": new_rows}
        # Publish atomically: write-then-rename the manifest FIRST, then
        # (overwrite mode) clear superseded parts. A crash between the two
        # leaves a correct manifest plus orphaned old parts — visible only
        # to readers that glob the directory instead of honoring the
        # manifest, and cleaned by the next successful overwrite. The
        # reverse order would leave a manifest referencing deleted files.
        target = os.path.join(self.path, "_MANIFEST.json")
        tmp = target + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, target)
        if self.overwrite:
            keep = set(new_parts)
            for stale in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                if stale not in keep:
                    os.remove(stale)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlSinkDataSource(DataSource):
    """`df.write.format("jsonl_sink").option("path", dir).save()`."""

    @classmethod
    def name(cls):
        return "jsonl_sink"

    def writer(self, schema, overwrite):
        return JsonlSinkWriter(self.options, overwrite=overwrite)

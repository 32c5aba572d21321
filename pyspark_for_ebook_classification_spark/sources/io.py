"""Sources & sinks (SURVEY.md §2.1).

S1 parquet scan, S2 text/CSV, S3 JSON lines, S4 in-memory rows, S5 parquet
sink. All loaders take explicit paths/schemas — schema inference is a
full-scan trap at 100 TB (SURVEY.md §1.2), and the driver's test tables are
parquet with embedded schemas so `spark.read.parquet` is already
inference-free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: the ten driver tables (TESTDATA.md / FIXTURES.md)
TABLES = (
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

#: tiny dimension tables that should always broadcast in star joins
#: (region=5, nation=25, supplier≈10·sf rows — FIXTURES.md)
BROADCAST_DIMS = ("region", "nation", "supplier", "part")


_SCRATCH_CLEANUP_REGISTERED = False


def scratch_dir(label: str) -> str:
    """Per-process-unique scratch directory for sink round-trips.

    Keyed by pid so concurrent runs (two driver harnesses, pytest + bench)
    never collide on a shared path, yet stable within a process so a lazy
    reader returned by a round-trip query still sees the files its own run
    wrote when the driver later triggers the action. The whole per-pid
    tree is removed at interpreter exit — without that, every run leaks
    its table copies into the temp dir (new pid, new directory, forever).
    """
    import atexit
    import shutil
    import tempfile

    root = os.path.join(tempfile.gettempdir(), f"spark_graft_{os.getpid()}")
    # register exactly once per PROCESS (module flag), never keyed on
    # directory existence: a recycled pid can inherit a stale tree from a
    # SIGKILLed prior run, and skipping registration then would leak this
    # process's scratch output too.
    global _SCRATCH_CLEANUP_REGISTERED
    if not _SCRATCH_CLEANUP_REGISTERED:
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _SCRATCH_CLEANUP_REGISTERED = True
    d = os.path.join(root, label)
    os.makedirs(d, exist_ok=True)
    return d


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S1: columnar parquet scan of one driver table.

    Catalyst handles predicate pushdown / column pruning on top of this —
    callers chain .select/.filter freely and the parquet reader only
    materializes what the plan needs.

    ``events.ts`` has shipped as two physical types across driver testdata
    generations: INT64 TIMESTAMP(NANOS) — which Spark's reader rejects
    outright (PARQUET_TYPE_ILLEGAL) unless read via the ``nanosAsLong``
    legacy conf and rebuilt with ``ts div 1000`` (floor division,
    byte-identical to DuckDB's ns→µs cast truncation) — and plain
    ``timestamp[us]``, which Spark reads as TIMESTAMP_NTZ. We normalize
    both to session-zoned TIMESTAMP (session TZ is pinned UTC, so the
    NTZ→TZ cast is value-identity and oracle parity holds either way).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T
        from pyspark.errors import AnalysisException

        try:
            df = spark.read.parquet(path)
        except AnalysisException:
            # Foreign session (e.g. the driver's own) reading the INT64
            # TIMESTAMP(NANOS) generation: the legacy conf is the only way
            # in, and it must stay set for the session because the lazy
            # scan consults it again at execution. get_spark() sessions set
            # it at build time and never reach this branch.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Expose every table as a temp view so operators can use spark.sql."""
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """S5: parquet sink. At scale, partition by low-cardinality date/key
    columns so downstream reads get static + dynamic partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    n_buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """S5 scale path: bucketed (and bucket-sorted) external table.

    Two tables bucketed by the same key with the same bucket count join
    WITHOUT a shuffle — the killer optimization for repeated fact⋈fact
    joins at 100 TB (write once, co-located forever). Verified by
    tests/test_scale.py asserting zero Exchange nodes in the joined plan.

    Composite keys: pass a list when downstream joins use a multi-column
    equi-key — since Spark 3.3, EnsureRequirements only treats a table
    as co-partitioned when the bucket keys cover ALL join keys
    (spark.sql.requireAllClusterKeysForCoPartition=true), so bucketing
    by a subset of the join key no longer removes the exchange.
    """
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, keys[0], *keys[1:])
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_csv(spark: SparkSession, path: str, schema, header: bool = True) -> DataFrame:
    """S2: CSV corpus load with an explicit schema (never inferSchema in
    production — it triggers an extra full scan)."""
    return spark.read.csv(path, header=header, schema=schema)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """S3: JSON-lines load with explicit schema."""
    return spark.read.schema(schema).json(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S2: raw text load — one row per line, column ``value``."""
    return spark.read.text(path)

"""SparkSession factory.

Scale stance (SURVEY.md §4): AQE on (runtime re-plan, skew-join splitting,
partition coalescing), Arrow on (any pandas boundary is batched), session
timezone pinned to UTC (oracle parity — DuckDB timestamps are UTC-naive),
shuffle partitions sized to cores for local mode (on a real cluster this is
set to ~2-3× total cores / targeting ~128-256 MB shuffle blocks).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "pyspark_for_ebook_classification_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned local SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, then ``*`` (all cores).
    Note: if a session already exists in this JVM, static confs
    (master, driver memory) are inherited from it.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle = str(
        shuffle_partitions
        or os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        or DEFAULT_SHUFFLE_PARTITIONS
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 4g, deliberately NOT sized to the machine: with a 16g G1 heap the
        # md5/explode-heavy queries showed erratic 20-60s GC spikes
        # (measured); the sf0.1 working set is tens of MB and 4g is stable.
        # Override with SPARK_GRAFT_DRIVER_MEMORY for bigger local runs.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "4g"))
        .config("spark.ui.enabled", "false")
        # local mode: shuffle spills to local disk; keep broadcast threshold
        # generous so every dim table in the star schema broadcasts.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # some driver testdata generations ship events.ts as INT64
        # TIMESTAMP(NANOS), which the parquet reader rejects without this;
        # set once at session build so sources/io.load never has to mutate
        # session conf mid-query (foreign sessions get a guarded fallback).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

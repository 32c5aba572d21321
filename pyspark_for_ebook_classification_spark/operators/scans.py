"""Scan / source operators (SURVEY.md §2.1: S1–S6).

S1 (parquet) is exercised by every other query; here it gets an explicit
checksum-style declared query. S4 (in-memory VALUES) is declared. S2/S3
(CSV/JSON round-trips) and S5/S6 (sinks, streams) are side-effecting, so
they are covered by pytest golden tests (tests/test_sources.py) instead of
oracle queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load


@query(
    "scan_parquet_checksum",
    survey_ref="S1",
    oracle="""
        SELECT
            COUNT(*) AS n_rows,
            CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey,
            CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey,
            COUNT(DISTINCT l_suppkey) AS n_suppliers,
            CAST(SUM(l_orderkey) AS BIGINT) AS sum_orderkey
        FROM lineitem
    """,
)
def scan_parquet_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan integrity summary of the largest table. Only the three
    referenced columns are read (column pruning: ReadSchema shows exactly
    l_orderkey, l_suppkey)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.sum("l_orderkey").alias("sum_orderkey"),
    )


#: fixed in-memory dimension: order-value bands (also feeds the range join)
PRICE_BANDS = [
    ("small", 0.0, 50_000.0),
    ("medium", 50_000.0, 150_000.0),
    ("large", 150_000.0, 1e12),
]

BANDS_SCHEMA = T.StructType(
    [
        T.StructField("band", T.StringType(), False),
        T.StructField("lo", T.DoubleType(), False),
        T.StructField("hi", T.DoubleType(), False),
    ]
)

BANDS_SQL_VALUES = (
    "(VALUES ('small', 0.0, 50000.0), ('medium', 50000.0, 150000.0), "
    "('large', 150000.0, 1e12)) AS bands(band, lo, hi)"
)


def price_bands_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(PRICE_BANDS, BANDS_SCHEMA)


@query(
    "scan_inline_values",
    survey_ref="S4",
    oracle=f"""
        SELECT band, lo, hi, hi - lo AS width
        FROM {BANDS_SQL_VALUES}
    """,
)
def scan_inline_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory rows via createDataFrame (the S4 path used for dims,
    configs, and test fixtures)."""
    bands = price_bands_df(spark)
    return bands.select("band", "lo", "hi", (F.col("hi") - F.col("lo")).alias("width"))

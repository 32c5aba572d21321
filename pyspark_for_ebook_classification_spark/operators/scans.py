"""Scan / source operators (SURVEY.md §2.1: S1–S6).

S1 (parquet) is exercised by every other query; here it gets an explicit
checksum-style declared query. S4 (in-memory VALUES) is declared. S2/S3
are declared as sink→source ROUND-TRIPS (write CSV/JSON-lines to /tmp,
read back with an explicit schema, oracle = the original table — the
round-trip is the assertion), which also drives the S5 sink half; richer
sink coverage (partitioned/bucketed parquet, streams) stays in pytest
(tests/test_sources.py, tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load, scratch_dir


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


@query(
    "scan_csv_roundtrip",
    survey_ref="S2,S5",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 as a driver-verified query: parquet → CSV sink → CSV source with
    an explicit schema (never inferSchema — a second full scan at 100 TB)
    must reproduce the table byte-for-byte, quoting/escaping included.
    The oracle reads the original table: the round-trip IS the assertion."""
    from pyspark_for_ebook_classification_spark.sources.io import read_csv

    path = scratch_dir("s2_nation_csv")
    n = load(spark, sf_dir, "nation")
    n.write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    return read_csv(spark, path, schema=schema, header=True).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "scan_jsonl_roundtrip",
    survey_ref="S3,S5",
    oracle="""
        SELECT s_suppkey, s_name, s_nationkey,
               CAST(s_acctbal AS DOUBLE) AS s_acctbal
        FROM supplier
    """,
)
def scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 as a driver-verified query: parquet → JSON-lines sink → schema'd
    JSON source round-trip on the supplier dim (strings + doubles). Double
    round-trip is exact: Spark writes shortest-repr doubles and reads them
    back to the identical bit pattern."""
    from pyspark_for_ebook_classification_spark.sources.io import read_jsonl

    path = scratch_dir("s3_supplier_jsonl")
    s = load(spark, sf_dir, "supplier")
    s.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal").write.mode(
        "overwrite"
    ).json(path)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    )
    return read_jsonl(spark, path, schema=schema).select(
        "s_suppkey", "s_name", "s_nationkey", F.col("s_acctbal").cast("double").alias("s_acctbal")
    )


@query(
    "scan_partitioned_pruned_roundtrip",
    survey_ref="S5,S1,P2",
    oracle="""
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE lang = 'en'
        GROUP BY source
    """,
)
def scan_partitioned_pruned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 + partition pruning, driver-verified: documents written
    ``partitionBy('lang')`` (the layout a 100 TB corpus store uses — one
    directory per language), then read back with a ``lang = 'en'`` filter
    that must prune to that single directory: the scan's PartitionFilters
    carry the predicate, so the other languages' files are never opened
    (asserted in tests/test_plans.py). The oracle reads the original
    unpartitioned table — the round-trip plus pruning IS the assertion."""
    path = scratch_dir("s5_docs_partitioned")
    d = load(spark, sf_dir, "documents")
    d.write.mode("overwrite").partitionBy("lang").parquet(path)
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "scan_orc_roundtrip",
    survey_ref="S2,S5",
    oracle="""
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM customer
    """,
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S5 third columnar format: parquet → ORC sink → ORC source must
    reproduce the customer dim exactly (ORC is self-describing, so no
    explicit schema needed — and like parquet it carries min/max stripe
    stats, so the same predicate-pushdown guarantees hold at 100 TB)."""
    path = scratch_dir("s5_customer_orc")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    c.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "scan_python_datasource",
    survey_ref="S1,S4",
    oracle=f"""
        SELECT
            CAST(bucket AS BIGINT) AS bucket,
            COUNT(*) AS n,
            CAST(SUM(val) AS BIGINT) AS sum_val,
            CAST(MIN(val) AS BIGINT) AS min_val,
            CAST(MAX(val) AS BIGINT) AS max_val
        FROM (
            SELECT i % 10 AS bucket, (i * 2654435761) % 1000003 AS val
            FROM generate_series(0, 4999) t(i)
        )
        GROUP BY bucket
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source (Spark 4 API, sources/pyds.py): a
    partition-parallel synthetic source planned as 8 independent splits,
    aggregated downstream like any table. The oracle regenerates the same
    integer hash math over generate_series — proving the connector's rows,
    split boundaries included, are exactly the declared function of id."""
    from pyspark_for_ebook_classification_spark.sources.pyds import register

    register(spark)
    src = (
        spark.read.format("synth_corpus")
        .option("rows", 5000)
        .option("parts", 8)
        .load()
    )
    return src.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").alias("sum_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


@query(
    "scan_xml_roundtrip",
    survey_ref="S2,S5",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S5 fourth format, Spark-4 native XML: parquet → XML sink
    (rowTag-per-record) → schema'd XML source must reproduce the table
    exactly. Same explicit-schema rule as CSV/JSON — XML inference adds a
    full extra scan at 100 TB."""
    path = scratch_dir("s5_nation_xml")
    n = load(spark, sf_dir, "nation")
    n.write.mode("overwrite").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).format("xml").save(path)
    return (
        spark.read.option("rowTag", "nation")
        .schema(n.schema)
        .format("xml")
        .load(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@query(
    "scan_python_ds_pushdown",
    survey_ref="S1,S4,P2,P3",
    oracle="""
        SELECT i AS id, CAST(i % 10 AS BIGINT) AS bucket,
               CAST((i * 2654435761) % 1000003 AS BIGINT) AS val
        FROM generate_series(0, 4999) t(i)
        WHERE i >= 1200 AND i < 3800 AND i % 10 = 7
    """,
)
def scan_python_ds_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.1 Python Data Source FILTER PUSHDOWN (pyds.pushFilters):
    the id range predicates clip the connector's split plan (splits
    outside [1200, 3800) are never created — connector-side partition
    pruning) and the bucket equality becomes a modular stride inside
    read(), so of 5,000 plannable rows only the 260 matching ones are
    ever GENERATED, not generated-then-filtered. The oracle applies the
    same predicates to the same integer hash math; equal values prove
    the pushdown is semantics-preserving (tests/test_sources.py
    additionally proves it actually prunes: clipped splits + strided
    generation observed on the reader, pushed filters visible in the
    scan plan)."""
    from pyspark_for_ebook_classification_spark.sources.pyds import register

    register(spark)
    src = (
        spark.read.format("synth_corpus")
        .option("rows", 5000)
        .option("parts", 8)
        .load()
    )
    return src.filter(
        (F.col("id") >= 1200) & (F.col("id") < 3800) & (F.col("bucket") == 7)
    )


@query(
    "scan_schema_evolution_merge",
    survey_ref="S1,S5,F8",
    oracle="""
        SELECT doc_id, lang, n_chars,
               CAST(NULL AS BIGINT) AS quality_tier
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, lang, n_chars,
               CAST(n_chars % 5 AS BIGINT) AS quality_tier
        FROM documents WHERE doc_id % 2 = 1
    """,
)
def scan_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the source layer — the situation every
    long-lived corpus store hits: an old snapshot written WITHOUT a
    column and a new snapshot written WITH it must read back as ONE
    table. Two generations land in the same directory tree (old = even
    doc_ids, no quality_tier; new = odd doc_ids, with it), and
    ``mergeSchema=true`` unions the footers so old rows surface the new
    column as NULL — no backfill rewrite of the old petabytes. The
    oracle states the contract directly: old rows NULL, new rows
    populated.

    Scale note: mergeSchema reads every file footer at planning time —
    fine per-snapshot-directory, expensive across 10⁶ files, which is
    why production tables pin the merged schema in a catalog after one
    evolution; this query demonstrates the read-side semantics that
    catalog entry encodes."""
    base = scratch_dir("s5_docs_evolving")
    d = load(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "n_chars")
    new = (
        d.filter(F.col("doc_id") % 2 == 1)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            (F.col("n_chars") % 5).cast("bigint").alias("quality_tier"),
        )
    )
    old.write.mode("overwrite").parquet(base + "/gen=1")
    new.write.mode("overwrite").parquet(base + "/gen=2")
    back = spark.read.option("mergeSchema", "true").parquet(
        base + "/gen=1", base + "/gen=2"
    )
    return back.select("doc_id", "lang", "n_chars", "quality_tier")

"""Projection / filter / predicate operators (SURVEY.md §2.2: P1–P5).

Scale notes: every predicate here stays on raw columns (never wrapped in
UDFs), so Catalyst pushes it into the parquet scan — at 100 TB the
difference between `PushedFilters: [...]` and a post-scan Filter node is
reading row groups vs reading the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load


@query(
    "project_compute",
    survey_ref="P1,F3",
    oracle="""
        SELECT
            l_orderkey AS orderkey,
            l_linenumber AS line_no,
            l_extendedprice * (1 - l_discount) AS disc_price,
            round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charge_rounded,
            CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'retail' END AS qty_class
        FROM lineitem
        WHERE l_orderkey % 500 = 0
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure projection: rename + derived columns, no shuffle at all.
    The `% 500` predicate keeps the declared result small; the projection
    itself is whole-stage-codegen'd over the scan."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(F.col("l_orderkey") % 500 == 0).select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("line_no"),
        disc_price.alias("disc_price"),
        F.round(disc_price * (1 + F.col("l_tax")), 2).alias("charge_rounded"),
        F.when(F.col("l_quantity") >= 25, "bulk").otherwise("retail").alias("qty_class"),
    )


@query(
    "filter_complex",
    survey_ref="P2,F8",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus = 'F' AND o_totalprice > 200000.0)
           OR (o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_totalprice < 20000.0)
           OR NULLIF(o_orderstatus, 'P') IS NULL
    """,
)
def filter_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive, IN-list, and NULL-aware predicates in one
    filter — Catalyst folds it into a single pushed scan predicate."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000.0))
        | (
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_totalprice") < 20000.0)
        )
        | F.nullif(F.col("o_orderstatus"), F.lit("P")).isNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "filter_date_range",
    survey_ref="P3,F2",
    oracle="""
        SELECT
            CAST(year(l_shipdate) AS INT) AS ship_year,
            COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 23:59:59'
        GROUP BY year(l_shipdate)
    """,
)
def filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN on the shipdate — min/max row-group statistics prune most
    of a date-partitioned table at scale."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1996-12-31 23:59:59").cast("timestamp"),
            )
        )
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "filter_like_regexp",
    survey_ref="P4,F1",
    oracle="""
        SELECT
            lang,
            COUNT(*) AS n_docs,
            COUNT(CASE WHEN text LIKE '%merge%' THEN 1 END) AS n_like_merge,
            COUNT(CASE WHEN regexp_matches(text, 'scan [a-z]+ sort') THEN 1 END) AS n_regex
        FROM documents
        GROUP BY lang
    """,
)
def filter_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("text").like("%merge%"), 1)).alias("n_like_merge"),
        F.count(F.when(F.col("text").rlike("scan [a-z]+ sort"), 1)).alias("n_regex"),
    )


@query(
    "distinct_segments",
    survey_ref="P5",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate on all columns; partial aggregation makes
    the shuffle proportional to distinct pairs (125), not rows."""
    return load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "dedup_by_key_keep_first",
    survey_ref="P5,W1",
    oracle="""
        SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate
        FROM orders
        QUALIFY row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ) = 1
    """,
)
def dedup_by_key_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup by key. dropDuplicates() keeps an ARBITRARY row —
    unacceptable for reproducible pipelines — so this is the deterministic
    row_number()=1 formulation with a total tie-break (orderdate, orderkey).
    One shuffle on the dedup key; no skew concern (keys ~uniform)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_orderdate").alias("first_orderdate"),
        )
    )


@query(
    "merge_upsert_emulation",
    survey_ref="J2,F8,S5",
    doc="MERGE INTO (upsert) emulated: updates win, inserts append.",
    oracle="""
        WITH updates AS (
            SELECT o_orderkey, o_totalprice * 1.1 AS new_price
            FROM orders WHERE o_orderkey % 100 = 0
            UNION ALL
            SELECT 900000000 + o_orderkey, 42.0
            FROM orders WHERE o_orderkey % 1000 = 0
        )
        SELECT
            coalesce(u.o_orderkey, t.o_orderkey) AS o_orderkey,
            coalesce(u.new_price, t.o_totalprice) AS o_totalprice,
            CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                 WHEN u.o_orderkey IS NULL THEN 'carry'
                 ELSE 'update' END AS merge_action
        FROM orders t
        FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey
    """,
)
def merge_upsert_emulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on vanilla Spark (no Delta/Iceberg in this container):
    target FULL OUTER JOIN updates on the key; matched rows take the
    update's values, unmatched-target rows carry through, unmatched-update
    rows insert. The per-row double arithmetic (×1.1) is IEEE-identical in
    both engines, so no rounding is needed.

    Scale shape: one shuffle on the merge key for each side (or zero for
    the target if the table is bucketed by key — see write_bucketed); at
    100 TB the same plan writes back with dynamic partition overwrite so
    only partitions containing touched keys rewrite. The merge_action
    column is the audit trail a CDC pipeline keeps."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = (
        o.filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", (F.col("o_totalprice") * 1.1).alias("new_price"))
        .unionByName(
            o.filter(F.col("o_orderkey") % 1000 == 0).select(
                (F.col("o_orderkey") + 900000000).alias("o_orderkey"),
                F.lit(42.0).alias("new_price"),
            )
        )
    )
    t = o.alias("t")
    u = updates.alias("u")
    return t.join(u, F.col("t.o_orderkey") == F.col("u.o_orderkey"), "full").select(
        F.coalesce("u.o_orderkey", "t.o_orderkey").alias("o_orderkey"),
        F.coalesce("u.new_price", "t.o_totalprice").alias("o_totalprice"),
        F.when(F.col("t.o_orderkey").isNull(), "insert")
        .when(F.col("u.o_orderkey").isNull(), "carry")
        .otherwise("update")
        .alias("merge_action"),
    )

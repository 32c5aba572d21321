"""Sort / limit / top-k and set operators (SURVEY.md §2.6–2.7: O1–O3, U1–U3).

Determinism: the driver's value hash is order-insensitive, but LIMIT/OFFSET
change the *row set*, so every limited query sorts by a total order ending
in a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load


@query(
    "sort_multi_nulls",
    survey_ref="O1,F8",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS priority_or_null,
               o_totalprice
        FROM orders
        ORDER BY priority_or_null ASC NULLS LAST, o_totalprice DESC, o_orderkey
        LIMIT 50
    """,
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with explicit null placement; '4-NOT SPECIFIED'
    is mapped to NULL to exercise it. Global sorts range-partition
    (exchange on sampled range bounds) — fine here, avoided in hot paths."""
    o = load(spark, sf_dir, "orders")
    pr = F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED"))
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            pr.alias("priority_or_null"),
            "o_totalprice",
        )
        .orderBy(
            F.asc_nulls_last("priority_or_null"),
            F.desc("o_totalprice"),
            F.asc("o_orderkey"),
        )
        .limit(50)
    )


@query(
    "limit_offset_page",
    survey_ref="O2,O1",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
    """,
)
def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: deterministic only under the total order (price, key).
    offset() is a global operation — cheap here, an anti-pattern for deep
    pages at scale (prefer keyset pagination on the sort key)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(40)
        .limit(20)
    )


@query(
    "topk_global_lineitems",
    survey_ref="O3",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 15
    """,
)
def topk_global_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy().limit(k) plans as TakeOrderedAndProject —
    per-partition heaps of k rows, no full sort, no full shuffle. THE
    top-k pattern for 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(15)
    )


def _nation_keys(spark: SparkSession, sf_dir: str, table: str, col: str) -> DataFrame:
    return load(spark, sf_dir, table).select(F.col(col).alias("nationkey"))


@query(
    "set_union_all",
    survey_ref="U1",
    oracle="""
        SELECT nationkey, COUNT(*) AS n
        FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey FROM supplier
        )
        GROUP BY nationkey
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) — unionByName is a zero-shuffle concat."""
    c = _nation_keys(spark, sf_dir, "customer", "c_nationkey")
    s = _nation_keys(spark, sf_dir, "supplier", "s_nationkey")
    return c.unionByName(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_union_distinct",
    survey_ref="U1",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _nation_keys(spark, sf_dir, "customer", "c_nationkey")
    s = _nation_keys(spark, sf_dir, "supplier", "s_nationkey")
    return c.unionByName(s).distinct()


@query(
    "set_intersect",
    survey_ref="U2",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations that have BOTH customers and suppliers."""
    c = _nation_keys(spark, sf_dir, "customer", "c_nationkey")
    s = _nation_keys(spark, sf_dir, "supplier", "s_nationkey")
    return c.intersect(s)


@query(
    "set_except_all",
    survey_ref="U3",
    oracle="""
        SELECT nationkey, COUNT(*) AS n FROM (
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL
            SELECT s_nationkey AS nationkey FROM supplier
        )
        GROUP BY nationkey
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference — each supplier occurrence cancels
    one customer occurrence per nation)."""
    c = _nation_keys(spark, sf_dir, "customer", "c_nationkey")
    s = _nation_keys(spark, sf_dir, "supplier", "s_nationkey")
    return c.exceptAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_intersect_all",
    survey_ref="U2",
    oracle="""
        SELECT nationkey, COUNT(*) AS n FROM (
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT ALL
            SELECT s_nationkey AS nationkey FROM supplier
        )
        GROUP BY nationkey
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _nation_keys(spark, sf_dir, "customer", "c_nationkey")
    s = _nation_keys(spark, sf_dir, "supplier", "s_nationkey")
    return c.intersectAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))

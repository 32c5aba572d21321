"""Classic OLAP query shapes (SURVEY.md §3 entry point 3, §2.3 J2, A5):
the SQL-string path (spark.sql over registered views — same Catalyst plan
as the DataFrame API), correlated and scalar subqueries (exercising
Catalyst's decorrelation rules), full outer join, and unpivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.functions.numeric import sql_dsum
from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load

#: TPC-H-Q3-shaped SQL, valid in BOTH Spark SQL and DuckDB — the Spark
#: side literally executes this text via spark.sql (entry point 3).
_Q3_SQL = f"""
    SELECT
        l_orderkey,
        {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
        o_orderdate,
        o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@query("sql_shipping_priority_q3", survey_ref="J1,A1,O3,§3-EP3", oracle=_Q3_SQL)
def sql_shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape through the SQL STRING path: identical text runs on
    both engines, and Catalyst produces the same plan it would for the
    DataFrame formulation. LIMIT is deterministic (revenue DESC, orderkey)."""
    for t in ("customer", "orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q3_SQL)


@query(
    "agg_revenue_delta_q6",
    survey_ref="A1,P3,F3",
    oracle=f"""
        SELECT
            {sql_dsum('l_extendedprice * l_discount', 'revenue_delta')},
            COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
)
def agg_revenue_delta_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — the best-case scan
    query (every predicate pushes into the parquet reader; no shuffle at
    all beyond the final single-row combine)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,6)")
            )
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "subquery_priority_counts_q4",
    survey_ref="J3,A1",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
    """,
)
def subquery_priority_counts_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inter-table predicate
    (l_shipdate > o_orderdate). Catalyst decorrelates it into a left-semi
    join; written via the SQL path to exercise exactly that rewrite."""
    for t in ("orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        """
    )


#: shared text: the scalar subquery computes the cut line with the
#: decimal-stable avg, so BOTH engines filter on the identical double —
#: a plain AVG's accumulation order could flip the cut line's last ulp
#: and change row membership for values sitting exactly on it.
_ABOVE_AVG_SQL = """
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / COUNT(c_acctbal)
        FROM customer
    )
"""


@query("subquery_above_avg_balance", survey_ref="J3,A1", oracle=_ABOVE_AVG_SQL)
def subquery_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: Catalyst plans the inner aggregate once and
    broadcasts the scalar into the filter."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_ABOVE_AVG_SQL)


@query(
    "join_full_outer_nation_presence",
    survey_ref="J2,F8",
    oracle="""
        WITH c AS (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1),
             s AS (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1)
        SELECT
            COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
            CAST(COALESCE(n_customers, 0) AS BIGINT) AS n_customers,
            CAST(COALESCE(n_suppliers, 0) AS BIGINT) AS n_suppliers,
            CASE WHEN c.c_nationkey IS NULL THEN 'suppliers_only'
                 WHEN s.s_nationkey IS NULL THEN 'customers_only'
                 ELSE 'both' END AS presence
        FROM c FULL OUTER JOIN s ON c.c_nationkey = s.s_nationkey
    """,
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (J2) with NULL-aware coalescing."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return j.select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).cast("bigint").alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).cast("bigint").alias("n_suppliers"),
        F.when(F.col("c_nationkey").isNull(), "suppliers_only")
        .when(F.col("s_nationkey").isNull(), "customers_only")
        .otherwise("both")
        .alias("presence"),
    )


@query(
    "unpivot_lineitem_measures",
    survey_ref="P1,U1",
    oracle="""
        SELECT l_orderkey, l_linenumber, measure, value
        FROM (
            SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
            FROM lineitem WHERE l_orderkey % 1000 = 0
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
            FROM lineitem WHERE l_orderkey % 1000 = 0
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount', l_discount
            FROM lineitem WHERE l_orderkey % 1000 = 0
        )
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via stack() — the inverse of A9's pivot. One
    pass, rows×3 output, no shuffle."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 1000 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount) AS (measure, value)"
        ),
    )

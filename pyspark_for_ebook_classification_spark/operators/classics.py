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


#: TPC-H-Q5-shaped SQL (local supplier volume): six-table star join where
#: the customer and supplier must share a nation — valid in both engines.
_Q5_SQL = f"""
    SELECT
        n_name,
        {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
"""


@query("sql_local_supplier_volume_q5", survey_ref="J1,J4,A1,§3-EP3", oracle=_Q5_SQL)
def sql_local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the deepest join tree in the suite (6 tables).
    Catalyst broadcast-joins the three dims (region 5 / nation 25 /
    supplier ~100·sf rows) and shuffle-joins only the two fact tables —
    exactly the plan a 1000-executor cluster wants, with the region filter
    pruning nations before any fact row is touched."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q5_SQL)


@query(
    "join_returned_items_q10",
    survey_ref="J1,A1,O3",
    oracle=f"""
        SELECT
            c_custkey, c_name, n_name,
            {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def join_returned_items_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter. The returnflag + date filters push to the scans; the limit is
    deterministic (revenue DESC then unique custkey)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    from pyspark_for_ebook_classification_spark.functions.numeric import dsum

    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


#: Q14 numerator/denominator both decimal-accumulated; the final
#: (100 * num) / den is one IEEE double expression, identical per engine.
_PROMO_DEC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))"


@query(
    "agg_promo_share_q14",
    survey_ref="A1,A5,J1,F3",
    oracle=f"""
        SELECT
            100 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_PROMO_DEC}
                          ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                / CAST(SUM({_PROMO_DEC}) AS DOUBLE) AS promo_revenue_pct,
            COUNT(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-06-01 00:00:00'
    """,
)
def agg_promo_share_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregate ratio
    over a fact⋈dim join, date filter pushed to the fact scan."""
    dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-06-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    num = F.sum(
        F.when(F.col("p_type") == "PROMO", dec).otherwise(F.lit(0).cast("decimal(28,6)"))
    ).cast("double")
    den = F.sum(dec).cast("double")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100) * num / den).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


#: TPC-H-Q18-shaped SQL (large-volume orders), shared text for both engines.
_Q18_SQL = """
    SELECT
        c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 180
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""


@query("sql_big_order_customers_q18", survey_ref="J1,J3,A1,O3,§3-EP3", oracle=_Q18_SQL)
def sql_big_order_customers_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a grouped HAVING — Catalyst plans
    the subquery as a semi-join against the aggregated lineitem, so the
    fact table is scanned twice but shuffled on the same key both times
    (AQE reuses the exchange). Quantity sums accumulate in decimal so the
    HAVING cut line is engine-exact."""
    for t in ("customer", "orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q18_SQL)


@query(
    "filter_disjunctive_bands_q19",
    survey_ref="P2,J1,A1,F3",
    oracle=f"""
        SELECT
            {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
            COUNT(*) AS n_items
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def filter_disjunctive_bands_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst's
    CNF conversion extracts the common per-side conjuncts (brand ∈ {...},
    quantity ≤ 30) below the join, so each scan is pre-filtered even though
    the full predicate can only be evaluated after the join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    from pyspark_for_ebook_classification_spark.functions.numeric import dsum

    return j.filter(band).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


#: TPC-H-Q7-shaped SQL, valid in BOTH Spark SQL and DuckDB (the Spark side
#: executes this text via spark.sql). Nation pair adapted to the driver's
#: NATION_1/NATION_2; ship-year window 1995-1996 as in the spec.
_Q7_SQL = f"""
    SELECT
        supp_nation,
        cust_nation,
        l_year,
        {sql_dsum('volume', 'revenue')}
    FROM (
        SELECT
            n1.n_name AS supp_nation,
            n2.n_name AS cust_nation,
            CAST(year(l_shipdate) AS INT) AS l_year,
            l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


@query("sql_volume_shipping_q7", survey_ref="J1,J4,J8,A1,§3-EP3", oracle=_Q7_SQL)
def sql_volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the nation dimension joined TWICE under different
    aliases (supplier's vs customer's nation) with a disjunctive pair
    predicate — the self-aliased dim join Catalyst must keep separate.
    Both nation sides broadcast; the fact path is one shuffle to the
    group-by."""
    for t in ("supplier", "lineitem", "orders", "customer", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q7_SQL)


#: TPC-H-Q8-shaped SQL (market share), shared text for both engines.
#: Region AMERICA, part type ECONOMY, supplier nation NATION_3; the share
#: is a ratio of two exact decimal sums so it is order-independent.
_Q8_SQL = """
    SELECT
        o_year,
        round(
            CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                          AS DECIMAL(28,6))) AS DOUBLE)
            / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE),
            6) AS mkt_share
    FROM (
        SELECT
            CAST(year(o_orderdate) AS INT) AS o_year,
            l_extendedprice * (1 - l_discount) AS volume,
            n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
"""


@query("sql_market_share_q8", survey_ref="J1,J4,A5,F3,§3-EP3", oracle=_Q8_SQL)
def sql_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: an 8-table star join (nation twice) feeding a
    conditional-share aggregate. Every dim side broadcasts; lineitem is
    the only shuffled input, and the share ratio divides two decimal-exact
    sums per year."""
    for t in ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q8_SQL)


#: TPC-H-Q15-shaped SQL: quarterly per-supplier revenue CTE used twice —
#: once as the join input, once under a scalar MAX subquery. Decimal-exact
#: revenue makes the max equality deterministic.
_Q15_SQL = f"""
    WITH revenue AS (
        SELECT
            l_suppkey AS supplier_no,
            {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("sql_top_supplier_q15", survey_ref="J1,A1,O3,§3-EP3", oracle=_Q15_SQL)
def sql_top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a grouped CTE consumed twice — as a join side and
    inside a scalar MAX subquery. Catalyst evaluates the scalar subquery
    as its own stage and broadcasts the single-row result into the filter;
    the CTE's exact decimal revenue makes `= MAX(...)` well-defined over
    doubles."""
    for t in ("supplier", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q15_SQL)


#: TPC-H-Q17-shaped SQL: correlated aggregate subquery (per-part average
#: quantity threshold). The avg is decimal-exact so the 0.2·avg boundary
#: comparison is engine-identical.
_Q17_SQL = """
    SELECT
        round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0, 4)
            AS avg_yearly,
        COUNT(*) AS n_small_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < 0.2 * (
          SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
"""


@query("sql_small_qty_revenue_q17", survey_ref="J1,J3,A1,§3-EP3", oracle=_Q17_SQL)
def sql_small_qty_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part aggregate subquery. Catalyst
    decorrelates it into an aggregate-then-join (one extra pass over
    lineitem grouped by partkey) instead of a per-row subquery — the plan
    that scales; the decimal-exact average keeps the `< 0.2·avg` boundary
    bit-identical across engines."""
    for t in ("lineitem", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q17_SQL)


#: TPC-H-Q13-shaped SQL: customer order-count distribution. The classic
#: "left join then count, then histogram the counts" double aggregate;
#: the priority filter stands in for Q13's comment-pattern exclusion
#: (orders lacks o_comment in the driver schema).
_Q13_SQL = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
"""


@query("sql_customer_distribution_q13", survey_ref="J2,A1,§3-EP3", oracle=_Q13_SQL)
def sql_customer_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join preserved under aggregation — customers
    with zero qualifying orders must surface as c_count = 0, so the filter
    lives in the JOIN condition, not WHERE (where it would turn the outer
    join inner). Two aggregations: the first shuffles by custkey (already
    the join key, so AQE coalesces join+agg into one exchange); the second
    groups a histogram whose cardinality is tiny regardless of scale."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q13_SQL)


#: TPC-H-Q22-shaped SQL: global-sales-opportunity — rich-balance customers
#: with no URGENT orders, grouped by country (every driver-data
#: customer has SOME order, so the classic no-orders predicate would be
#: vacuously empty — the urgent variant keeps the anti-join non-trivial). The driver schema has no c_phone,
#: so c_nationkey stands in for the country code prefix. The average
#: threshold goes through the decimal-exact davg pattern so the
#: `c_acctbal > avg` boundary is the identical double in both engines.
_Q22_SQL = f"""
    SELECT
        c_nationkey AS cntrycode,
        COUNT(*) AS numcust,
        {sql_dsum('c_acctbal', 'totacctbal')}
    FROM customer
    WHERE c_nationkey < 13
      AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(c_acctbal)
          FROM customer
          WHERE c_acctbal > 0.0 AND c_nationkey < 13
      )
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
"""


@query("sql_sales_opportunity_q22", survey_ref="J3,A1,F3,§3-EP3", oracle=_Q22_SQL)
def sql_sales_opportunity_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery as a filter threshold +
    anti-join (NOT EXISTS). Catalyst evaluates the scalar subquery once
    (one-row broadcast into the predicate) and plans the NOT EXISTS as a
    left-anti hash join on o_custkey — at scale the orders side shuffles
    once; no per-row subquery execution anywhere."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q22_SQL)

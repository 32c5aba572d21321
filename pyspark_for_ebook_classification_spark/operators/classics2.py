"""Remaining classic TPC-H query shapes (SURVEY.md §3 entry point 3),
adapted to the driver's reduced schema (no partsupp / commitdate /
receiptdate / shipmode — lineitem stands in as the part↔supplier relation
and ship-delay vs o_orderdate stands in for commit/receipt lateness).

All of these use the SQL-string path: the SAME text runs via spark.sql and
as the DuckDB oracle, so every double is produced by an identical
expression tree in both engines (decimal-exact accumulation per
functions/numeric.py keeps sums order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.functions.numeric import sql_dsum
from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


#: TPC-H-Q2-shaped SQL (min-cost supplier). partsupp's supply cost is
#: emulated by the observed mean unit price each supplier charged for the
#: part — an exact double (decimal sums, one IEEE division) in both
#: engines, so the `= MIN(...)` equality is bit-deterministic.
_Q2_SQL = """
    WITH cost AS (
        SELECT
            l_partkey,
            l_suppkey,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
              / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_name, s_name, n_name, unit_cost AS best_unit_cost
    FROM part
    JOIN cost ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND p_size <= 15
      AND unit_cost = (
          SELECT MIN(c2.unit_cost)
          FROM cost c2
          JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE c2.l_partkey = p_partkey AND r2.r_name = 'ASIA'
      )
"""


@query("sql_min_cost_supplier_q2", survey_ref="J1,J4,J3,A1,§3-EP3", oracle=_Q2_SQL)
def sql_min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN subquery over the same CTE the
    outer query joins. Catalyst decorrelates the per-part MIN into an
    aggregate + equi-join (one extra pass over the CTE, reused exchange)
    rather than a per-row loop; region/nation/supplier dims broadcast."""
    _views(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    return spark.sql(_Q2_SQL)


#: TPC-H-Q9-shaped SQL (product-type profit). ps_supplycost is emulated as
#: 60% of the part's retail price; profit = revenue − cost·qty.
_Q9_SQL = f"""
    SELECT nation, o_year, {sql_dsum('amount', 'sum_profit')}
    FROM (
        SELECT
            n_name AS nation,
            CAST(year(o_orderdate) AS INT) AS o_year,
            l_extendedprice * (1 - l_discount)
              - 0.6 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
"""


@query("sql_product_profit_q9", survey_ref="J1,J4,A1,F1,§3-EP3", oracle=_Q9_SQL)
def sql_product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: five-table join with a LIKE filter on the part dim
    and a two-key rollup (nation × order-year). The part filter prunes
    before the fact join; nation/supplier/part broadcast; lineitem⋈orders
    is the only shuffled pair."""
    _views(spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation")
    return spark.sql(_Q9_SQL)


#: TPC-H-Q11-shaped SQL (important stock). Inventory value per part held
#: by one nation's suppliers, kept when above a fixed fraction of that
#: nation's total — scalar subquery repeats the same aggregate pipeline.
_Q11_SQL = f"""
    SELECT
        l_partkey AS ps_partkey,
        {sql_dsum('l_extendedprice * (1 - l_discount)', 'part_value')}
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE)
         > 0.001 * (
               SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(28,6))) AS DOUBLE)
               FROM lineitem
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN nation ON s_nationkey = n_nationkey
               WHERE n_name = 'NATION_1'
           )
"""


@query("sql_important_stock_q11", survey_ref="J1,J4,A1,§3-EP3", oracle=_Q11_SQL)
def sql_important_stock_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped HAVING against an uncorrelated scalar
    subquery (the national total). Catalyst runs the scalar aggregate once
    and broadcasts the single value into the HAVING filter; at scale both
    passes share the nation-filtered lineitem scan shape."""
    _views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q11_SQL)


#: TPC-H-Q12-shaped SQL (shipping modes / priority). l_shipmode doesn't
#: exist; a ship-latency bucket (days from order to ship) stands in.
_Q12_SQL = """
    SELECT
        ship_bucket,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM (
        SELECT
            o_orderpriority,
            CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'FAST'
                 WHEN l_shipdate <= o_orderdate + INTERVAL 75 DAY THEN 'MEDIUM'
                 ELSE 'SLOW' END AS ship_bucket
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    ) shipping
    GROUP BY ship_bucket
"""


@query("sql_ship_priority_split_q12", survey_ref="J1,A5,F2,§3-EP3", oracle=_Q12_SQL)
def sql_ship_priority_split_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: derived categorical (ship-latency bucket) with two
    complementary conditional counts. One fact⋈fact join, the date filter
    pushed to the lineitem scan, and a 3-row output regardless of scale."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q12_SQL)


#: TPC-H-Q16-shaped SQL (supplier relationship count). The complaints
#: exclusion becomes a NOT IN over negative-balance suppliers.
_Q16_SQL = """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'MEDIUM'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p_brand, p_type, p_size
"""


@query("sql_parts_supplier_cnt_q16", survey_ref="J1,J3,A2,§3-EP3", oracle=_Q16_SQL)
def sql_parts_supplier_cnt_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN subquery (null-aware anti-join — supplier
    keys are non-null so it degenerates to a plain anti) feeding a
    COUNT(DISTINCT) over a three-attribute group. The part predicates all
    push to the dim scan; distinct-count shuffles once on the group keys."""
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(_Q16_SQL)


#: TPC-H-Q20-shaped SQL (potential part promotion). partsupp availability
#: is emulated by shipped-quantity aggregates; a supplier qualifies when
#: its 1996 shipped quantity of a 'small%' part exceeds 30% of that part's
#: total 1996 volume.
_Q20_SQL = """
    WITH shipped AS (
        SELECT
            l_suppkey,
            l_partkey,
            CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    ),
    part_total AS (
        SELECT
            l_partkey AS pk,
            CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM shipped
          JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE 'small%'
            AND qty > 0.3 * (SELECT total_qty FROM part_total WHERE pk = l_partkey)
      )
"""


@query("sql_excess_stock_suppliers_q20", survey_ref="J1,J3,A1,§3-EP3", oracle=_Q20_SQL)
def sql_excess_stock_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN-subquery whose body carries a correlated scalar
    subquery against a second aggregate CTE. Catalyst decorrelates the
    scalar into an equi-join on partkey (both CTEs shuffle on the same key
    so AQE lines the exchanges up), then plans the IN as a left-semi."""
    _views(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    return spark.sql(_Q20_SQL)


#: TPC-H-Q21-shaped SQL (suppliers who kept orders waiting). "Late" =
#: shipped more than 60 days after the order date (no receipt/commit
#: dates in the driver schema). The lateness join inside the NOT EXISTS
#: body re-derives o_orderdate via an equi-join so the correlation to the
#: outer block stays pure-equality (decorrelates to hash semi/anti joins,
#: never a per-row loop).
_Q21_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name = 'NATION_1'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1
          FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
"""


@query("sql_waiting_suppliers_q21", survey_ref="J1,J3,J8,A1,O3,§3-EP3", oracle=_Q21_SQL)
def sql_waiting_suppliers_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the hardest correlated query in the suite — a semi
    AND an anti self-join on the same fact correlation key. Catalyst plans
    EXISTS as a left-semi and NOT EXISTS as a left-anti hash join, both
    shuffling lineitem on l_orderkey (the exchange is reused across the
    two), with `<>` as a residual join filter. Top-10 tie-broken by name
    for determinism."""
    _views(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    return spark.sql(_Q21_SQL)


#: Correlated LATERAL subquery (top-2 customers per nation) — identical
#: text in Spark SQL and DuckDB (comma-LATERAL syntax).
_LATERAL_SQL = """
    SELECT n_name, c.c_custkey, c.c_acctbal
    FROM nation, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) c
"""


@query("join_lateral_topn_per_nation", survey_ref="J1,J3,W4,O3,§3-EP3", oracle=_LATERAL_SQL)
def join_lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: a per-row dependent subquery with its own
    ORDER BY + LIMIT. Catalyst rewrites it as a DomainJoin → window-rank
    (the same plan as W4 top-N per group) rather than executing the inner
    block per nation row — the only shape that survives a dim with 10^6
    rows. Tie-broken by custkey so the LIMIT is deterministic."""
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_SQL)


#: Modern-SQL GROUP BY ALL (Spark ≥3.4 and DuckDB agree on semantics:
#: every non-aggregate select item becomes a grouping key).
_GROUP_BY_ALL_SQL = """
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(year(l_shipdate) AS INT) AS ship_year,
        COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ALL
"""


@query("agg_group_by_all", survey_ref="A1,F2,§3-EP3", oracle=_GROUP_BY_ALL_SQL)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL: the analyzer derives the grouping keys from the
    select list (every non-aggregate item). Same text, same inferred keys,
    in both engines — physically identical to the explicit A1 group-by."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_GROUP_BY_ALL_SQL)


#: Boolean/conditional aggregate family — identical text in both engines.
_BOOL_AGG_SQL = """
    SELECT
        o_orderstatus,
        CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
        bool_and(o_totalprice > 0) AS all_positive,
        bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
        CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderstatus
"""


@query("agg_bool_count_if", survey_ref="A5,F8,§3-EP3", oracle=_BOOL_AGG_SQL)
def agg_bool_count_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family (count_if / bool_and / bool_or): the
    predicate-counting shortcuts a monitoring pipeline leans on. All are
    single-pass partial-aggregable (each carries O(1) state), so the plan
    is the same map-side-combined hash aggregate as any A1 sum."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_BOOL_AGG_SQL)


#: Robust statistics: per-segment median + median-absolute-deviation
#: against the global median (scalar-subquery CTE). median() interpolates
#: identically in both engines (proved by agg_percentile_median).
_MAD_SQL = """
    WITH med AS (SELECT median(c_acctbal) AS m FROM customer)
    SELECT
        c_mktsegment,
        median(c_acctbal) AS seg_median,
        median(abs(c_acctbal - (SELECT m FROM med))) AS mad_vs_global,
        COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
"""


@query("agg_robust_median_mad", survey_ref="A7,A1,§3-EP3", oracle=_MAD_SQL)
def agg_robust_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/spread statistics: per-segment exact median and
    MAD relative to the global median. The global median is one scalar
    subquery (evaluated once, broadcast into the projection); exact
    medians need a per-group sort but the group count is fixed (5
    segments), so at 100 TB this is one shuffle + bounded per-group
    state — or swap to approx_percentile when a 1e-3 error is fine."""
    _views(spark, sf_dir, "customer")
    return spark.sql(_MAD_SQL)


#: Year-over-year growth: window functions OVER an aggregate — the
#: standard BI reporting shape (lag across ordered aggregate rows).
_YOY_SQL = f"""
    WITH yearly AS (
        SELECT
            n_name,
            CAST(year(o_orderdate) AS INT) AS o_year,
            {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, CAST(year(o_orderdate) AS INT)
    )
    SELECT
        n_name,
        o_year,
        revenue,
        lag(revenue) OVER (PARTITION BY n_name ORDER BY o_year) AS prev_revenue,
        round(
            100.0 * (revenue - lag(revenue) OVER (PARTITION BY n_name ORDER BY o_year))
                / lag(revenue) OVER (PARTITION BY n_name ORDER BY o_year),
            4) AS yoy_pct
    FROM yearly
"""


@query("window_yoy_revenue_growth", survey_ref="W2,A1,J1,§3-EP3", oracle=_YOY_SQL)
def window_yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth: lag() across the rows of an AGGREGATE — the
    canonical BI report. The window partitions by nation over a ~25-row
    aggregate regardless of input scale, so the fact tables do all their
    work in the decimal-exact groupBy and the window stage is trivial."""
    _views(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    return spark.sql(_YOY_SQL)


#: Percent-of-total: an unpartitioned window sum over aggregate rows.
_SHARE_SQL = f"""
    WITH seg AS (
        SELECT
            c_mktsegment,
            {sql_dsum('o_totalprice', 'segment_revenue')}
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    )
    SELECT
        c_mktsegment,
        segment_revenue,
        round(100.0 * segment_revenue
              / CAST(SUM(CAST(segment_revenue AS DECIMAL(28,6))) OVER () AS DOUBLE),
              6) AS pct_of_total
    FROM seg
"""


@query("window_pct_of_total_share", survey_ref="W3,A1,§3-EP3", oracle=_SHARE_SQL)
def window_pct_of_total_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total via an unpartitioned window over aggregate rows.
    The empty OVER () is safe ONLY because its input is the 5-row segment
    aggregate — on raw fact rows it would funnel everything to one task.
    The window denominator accumulates in decimal (like every other sum
    here) so its value is independent of the engines' frame iteration
    order."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_SHARE_SQL)


#: Share-within-group: each nation's fraction of ITS region's revenue —
#: the partitioned variant of window_pct_of_total_share.
_REGION_SHARE_SQL = f"""
    WITH nat AS (
        SELECT
            r_name,
            n_name,
            {sql_dsum('o_totalprice', 'nation_revenue')}
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    )
    SELECT
        r_name,
        n_name,
        nation_revenue,
        round(100.0 * nation_revenue
              / CAST(SUM(CAST(nation_revenue AS DECIMAL(28,6)))
                     OVER (PARTITION BY r_name) AS DOUBLE),
              6) AS pct_of_region
    FROM nat
"""


@query("window_share_within_region", survey_ref="W3,A1,J4,§3-EP3", oracle=_REGION_SHARE_SQL)
def window_share_within_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ratio_to_report shape: each nation's share of its region's revenue
    via a PARTITION BY window over the 25-row aggregate. Decimal-exact
    denominator per partition; the window stage is trivial at any input
    scale because it runs on aggregate rows."""
    _views(spark, sf_dir, "orders", "customer", "nation", "region")
    return spark.sql(_REGION_SHARE_SQL)


#: Cumulative distinct users per day: first-seen flag + running sum — the
#: scalable rewrite of COUNT(DISTINCT) OVER (ORDER BY ...) which neither
#: engine supports directly.
_CUM_USERS_SQL = """
    WITH firsts AS (
        SELECT
            user_id,
            CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING) AS day,
            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    daily AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM firsts WHERE rn = 1
        GROUP BY day
    )
    SELECT
        day,
        new_users,
        CAST(SUM(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cumulative_users
    FROM daily
"""


@query("window_cumulative_distinct_users", survey_ref="W1,W3,A1,§3-EP3", oracle=_CUM_USERS_SQL)
def window_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-dashboard staple.
    COUNT(DISTINCT) OVER a running frame isn't supported by either engine
    (and would be quadratic anyway); the scalable rewrite marks each
    user's FIRST event (row_number = 1), aggregates new users per day,
    and runs one tiny running sum over the 30-row daily series."""
    _views(spark, sf_dir, "events")
    return spark.sql(_CUM_USERS_SQL)


#: Interval-overlap self-join: order "activity windows" (orderdate,
#: orderdate + 30 days) that overlap for the SAME customer. Equi-key on
#: custkey bounds the pair count per customer; the overlap predicate is
#: the residual condition.
_OVERLAP_SQL = """
    WITH win AS (
        SELECT
            o_custkey,
            o_orderkey,
            o_orderdate AS start_ts,
            o_orderdate + INTERVAL 30 DAY AS end_ts
        FROM orders
    )
    SELECT
        a.o_custkey AS custkey,
        a.o_orderkey AS order_a,
        b.o_orderkey AS order_b,
        CAST(CASE WHEN a.end_ts < b.end_ts THEN a.end_ts
                  ELSE b.end_ts END AS TIMESTAMP) AS overlap_end,
        CAST(CASE WHEN a.start_ts > b.start_ts THEN a.start_ts
                  ELSE b.start_ts END AS TIMESTAMP) AS overlap_start
    FROM win a
    JOIN win b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.start_ts <= b.end_ts
     AND b.start_ts <= a.end_ts
    WHERE a.o_custkey % 10 = 0
"""


@query("join_interval_overlap_windows", survey_ref="J5,J8,F2,§3-EP3", oracle=_OVERLAP_SQL)
def join_interval_overlap_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP self-join (ranges × ranges — harder than the
    point-in-range J5 shapes): which of a customer's 30-day order windows
    overlap. The custkey equi-key keeps it a hash join with the overlap
    inequality as residual — pair count is bounded per customer, never
    corpus-quadratic, exactly how a 100 TB interval join must be keyed.
    b.start <= a.end uses the symmetric form so the predicate stays
    sargable on both sides. The overlap window itself is emitted as
    [overlap_start, overlap_end] = [greatest of the starts, least of
    the ends] — symmetric CASE expressions that parse and evaluate
    identically in the two engines. (o_orderkey order does NOT imply
    date order, so the start must be computed, not taken from b.)"""
    _views(spark, sf_dir, "orders")
    return spark.sql(_OVERLAP_SQL)


#: Min-max feature normalization per group — window min/max are exact
#: (no accumulation), so the scaled value is one IEEE division on
#: identical operands in both engines.
_MINMAX_SQL = """
    SELECT
        c_custkey,
        c_mktsegment,
        c_acctbal,
        CASE WHEN MAX(c_acctbal) OVER (PARTITION BY c_mktsegment)
                  = MIN(c_acctbal) OVER (PARTITION BY c_mktsegment)
             THEN 0.0
             ELSE (c_acctbal - MIN(c_acctbal) OVER (PARTITION BY c_mktsegment))
                  / (MAX(c_acctbal) OVER (PARTITION BY c_mktsegment)
                     - MIN(c_acctbal) OVER (PARTITION BY c_mktsegment))
        END AS acctbal_scaled
    FROM customer
    WHERE c_custkey % 5 = 0
"""


@query("window_minmax_normalize", survey_ref="W3,F3,§3-EP3", oracle=_MINMAX_SQL)
def window_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment min-max normalization — the distributed feature-scaling
    primitive (MinMaxScaler's relational core). Window MIN/MAX carry no
    accumulation error, so the scaled double is bit-identical across
    engines with no rounding crutch; the degenerate all-equal partition
    maps to 0. One shuffle on the partition key at any scale."""
    _views(spark, sf_dir, "customer")
    return spark.sql(_MINMAX_SQL)


#: Geometric mean via exp(avg(ln x)) — the log-domain aggregate trick
#: (product of 60k doubles would overflow; the log sum doesn't). ln/exp
#: are libm-dependent, so the log terms AND the final value are rounded
#: per the registry determinism contract.
_GEOMEAN_SQL = """
    SELECT
        l_returnflag,
        COUNT(*) AS n_items,
        round(
            exp(CAST(SUM(CAST(round(ln(l_extendedprice), 9) AS DECIMAL(28,12)))
                     AS DOUBLE) / COUNT(*)),
            4) AS geomean_price
    FROM lineitem
    WHERE l_extendedprice > 0
    GROUP BY l_returnflag
"""


@query("agg_geometric_mean_log", survey_ref="A7,F3,§3-EP3", oracle=_GEOMEAN_SQL)
def agg_geometric_mean_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean in the log domain: exp(mean(ln x)) — the only shape
    that survives 100 TB (a direct product overflows past ~300 values).
    Each ln is rounded to 9 decimals before the decimal-exact sum (libm
    independence), and the final exp is rounded to 4 — well above the
    accumulated 1e-9·n error at any driver scale factor."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_GEOMEAN_SQL)


#: Recursive-CTE month spine (Spark 4 WITH RECURSIVE — SPARK-24497) with a
#: monthly order rollup left-joined on: the gap-preserving report shape.
#: The text runs UNCHANGED on DuckDB; decimal sum keeps revenue exact.
_RECURSIVE_SPINE_SQL = """
    WITH RECURSIVE spine AS (
        SELECT CAST('1995-01-01' AS DATE) AS month_start
        UNION ALL
        SELECT CAST(month_start + INTERVAL '1' MONTH AS DATE) AS month_start
        FROM spine WHERE month_start < CAST('2000-12-01' AS DATE)
    ),
    monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS revenue
        FROM orders
        GROUP BY CAST(date_trunc('month', o_orderdate) AS DATE)
    )
    SELECT CAST(spine.month_start AS TIMESTAMP) AS month_start,
           CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(revenue, 0.0) AS DOUBLE) AS revenue
    FROM spine LEFT JOIN monthly ON monthly.m = spine.month_start
"""


@query(
    "sql_recursive_month_spine",
    survey_ref="F2,A1,J2,§3-EP3",
    oracle=_RECURSIVE_SPINE_SQL,
    doc="WITH RECURSIVE month spine LEFT JOIN monthly order rollup (gap-preserving).",
)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4): a 72-month date spine generated by
    recursion — no table scan, no sequence()+explode — left-joined to the
    monthly order rollup so empty months survive with zero rows, the shape
    sequence-gap reports need. The recursion is driver-cheap (UnionLoop of
    72 one-row steps); the only real work is the orders group-by, which
    aggregates BEFORE the join so the spine join moves one row per month.
    Identical SQL text runs on DuckDB — recursion syntax, interval month
    arithmetic, and date_trunc agree across engines."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_RECURSIVE_SPINE_SQL)


_RFM_SQL = """
    WITH base AS (
        SELECT o_custkey AS custkey,
               date_diff('day', MAX(o_orderdate),
                         (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey
    )
    SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
           frequency, round(monetary, 6) AS monetary,
           CAST(5 - ntile(4) OVER (ORDER BY recency_days, custkey) AS INT)
               AS r_score,
           CAST(ntile(4) OVER (ORDER BY frequency, custkey) AS INT) AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary, custkey) AS INT) AS m_score
    FROM base
"""


@query(
    "window_rfm_segments",
    survey_ref="W1,A1,F2,§3-EP3",
    doc="RFM customer scoring: recency/frequency/monetary quartiles per "
    "customer, every quartile computed with the scalable two-pass "
    "global rank instead of a single-task ntile window.",
    oracle=_RFM_SQL,
)
def window_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic customer-value segmentation, engineered for scale:
    each of the three quartile columns needs a GLOBAL ntile, and a bare
    `ntile(4) OVER (ORDER BY metric)` single-tasks the customer table —
    so all three go through functions/ranks.with_global_rank +
    ntile_from_rank (range partition → rank within → integer tile
    arithmetic), the same machinery the curriculum query pins. Recency
    is inverted (recent = high score) per RFM convention; every order
    key ends in custkey so tile assignment is total. The oracle keeps
    plain ntile windows — single-node DuckDB has no single-task trap —
    and equality proves the reconstruction exact. Monetary sums are
    decimal-stabilized."""
    from pyspark_for_ebook_classification_spark.functions.ranks import (
        ntile_from_rank,
        with_global_rank,
    )

    o = load(spark, sf_dir, "orders")
    maxd = o.groupBy().agg(F.max("o_orderdate").alias("maxd"))
    base = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("lastd"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "custkey",
            F.datediff("maxd", "lastd").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    n = base.groupBy().agg(F.count(F.lit(1)).alias("n_cust"))
    ranked = with_global_rank(base, ["recency_days", "custkey"], out="rr")
    ranked = with_global_rank(ranked, ["frequency", "custkey"], out="fr")
    ranked = with_global_rank(ranked, ["monetary", "custkey"], out="mr").join(
        F.broadcast(n)
    )
    return ranked.select(
        "custkey",
        "recency_days",
        "frequency",
        F.round("monetary", 6).alias("monetary"),
        (5 - ntile_from_rank("rr", "n_cust", 4)).cast("int").alias("r_score"),
        ntile_from_rank("fr", "n_cust", 4).cast("int").alias("f_score"),
        ntile_from_rank("mr", "n_cust", 4).cast("int").alias("m_score"),
    )


@query(
    "sql_pivot_clause",
    survey_ref="A9,A1,§3-EP3",
    doc="The SQL PIVOT clause (vs the DataFrame .pivot of "
    "agg_pivot_status_priority): per-priority order counts and decimal "
    "value sums spread across status columns.",
    oracle="""
        SELECT o_orderpriority,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)
                    AS BIGINT) AS F_n,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0)
                    AS BIGINT) AS O_n,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)
                    AS BIGINT) AS P_n,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
                        THEN CAST(o_totalprice AS DECIMAL(28,6)) END), 0)
                    AS DOUBLE) AS F_value,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
                        THEN CAST(o_totalprice AS DECIMAL(28,6)) END), 0)
                    AS DOUBLE) AS O_value,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
                        THEN CAST(o_totalprice AS DECIMAL(28,6)) END), 0)
                    AS DOUBLE) AS P_value
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`FROM ... PIVOT (aggs FOR col IN (values))` — the SQL-clause form
    with an EXPLICIT value list and multiple aggregates per cell
    (count + decimal sum). Catalyst compiles it to exactly the
    conditional-aggregate plan the oracle spells out, which is the
    point worth pinning: PIVOT is syntax, not a new operator, and the
    explicit IN list keeps it one pass (omitting it would cost a
    distinct-scan planning job — the same rule the DataFrame-API pivot
    query documents)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COALESCE(F_n, 0) AS F_n,
               COALESCE(O_n, 0) AS O_n,
               COALESCE(P_n, 0) AS P_n,
               CAST(COALESCE(F_value, 0) AS DOUBLE) AS F_value,
               CAST(COALESCE(O_value, 0) AS DOUBLE) AS O_value,
               CAST(COALESCE(P_value, 0) AS DOUBLE) AS P_value
        FROM (
            SELECT o_orderpriority, o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(28,6)) AS price
            FROM orders
        )
        PIVOT (
            COUNT(*) AS n, SUM(price) AS value
            FOR o_orderstatus IN ('F' AS F, 'O' AS O, 'P' AS P)
        )
        """
    )


_ORDER_GAP_SQL = """
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey,
           CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_days) AS BIGINT) AS min_gap_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
           round(CAST(SUM(CAST(gap_days AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(gap_days), 6) AS avg_gap_days
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
"""


@query(
    "window_order_gap_stats",
    survey_ref="W2,A1,F2,§3-EP3",
    doc="Inter-purchase intervals: per-customer gap statistics between "
    "consecutive orders — the repurchase-cadence metric.",
    oracle=_ORDER_GAP_SQL,
)
def window_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag over (custkey, orderdate, orderkey) — the unique orderkey
    tiebreak makes same-day order sequences total, so every gap is
    deterministic — then one partial-aggregated groupBy for the
    cadence stats. The window and the aggregate share a single
    custkey exchange. Average accumulates in decimal; gaps are
    integer day arithmetic, identical in both engines."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        F.count("gap_days").cast("bigint").alias("n_gaps"),
        F.min("gap_days").cast("bigint").alias("min_gap_days"),
        F.max("gap_days").cast("bigint").alias("max_gap_days"),
        F.round(
            F.sum(F.col("gap_days").cast("decimal(28,6)")).cast("double")
            / F.count("gap_days"),
            6,
        ).alias("avg_gap_days"),
    )


_PARETO_SQL = """
    WITH rev AS (
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS revenue
        FROM orders GROUP BY o_custkey
    ),
    tiled AS (
        SELECT custkey, revenue,
               ntile(10) OVER (ORDER BY revenue DESC, custkey) AS decile
        FROM rev
    ),
    tot AS (
        SELECT CAST(SUM(CAST(revenue AS DECIMAL(28,6))) AS DOUBLE) AS t
        FROM rev
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(revenue AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           round(CAST(SUM(CAST(revenue AS DECIMAL(28,6))) AS DOUBLE)
                 / (SELECT t FROM tot), 6) AS revenue_share
    FROM tiled GROUP BY decile
"""


@query(
    "agg_pareto_deciles",
    survey_ref="W1,A1,A7,§3-EP3",
    doc="Pareto analysis: customer revenue deciles with each decile's "
    "share of total — computed with the scalable global rank, not a "
    "single-task ntile.",
    oracle=_PARETO_SQL,
)
def agg_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 report: rank all customers by revenue (two-pass global
    rank — at a billion customers a bare ntile window is one task),
    derive the decile with exact integer arithmetic, aggregate each
    decile's revenue and share of the decimal-exact total. Ten output
    rows at any scale; the share denominator is a one-row broadcast."""
    from pyspark_for_ebook_classification_spark.functions.ranks import (
        ntile_from_rank,
        with_global_rank,
    )

    o = load(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .cast("double")
        .alias("revenue")
    )
    n = rev.groupBy().agg(F.count(F.lit(1)).alias("n_cust"))
    tot = rev.groupBy().agg(
        F.sum(F.col("revenue").cast("decimal(28,6)")).cast("double").alias("t")
    )
    ranked = (
        with_global_rank(
            rev.withColumn("neg_rev", -F.col("revenue")),
            ["neg_rev", "custkey"],
            out="rk",
        )
        .join(F.broadcast(n))
        .withColumn("decile", ntile_from_rank("rk", "n_cust", 10).cast("int"))
    )
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(F.col("revenue").cast("decimal(28,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            "revenue",
            F.round(F.col("revenue") / F.col("t"), 6).alias("revenue_share"),
        )
    )


#: TPC-H-Q4-shaped SQL (order priority checking). "Late" = any line
#: shipped more than 30 days after the order date (the driver schema
#: carries no commit/receipt dates — same adaptation as Q21's lateness).
_Q4_SQL = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
"""


@query("sql_order_priority_q4", survey_ref="J3,A1,F2,§3-EP3", oracle=_Q4_SQL)
def sql_order_priority_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS against the fact table with a correlated
    date comparison. Catalyst decorrelates to a left-semi hash join on
    orderkey (the date predicate rides along as a join condition), so the
    quarter's orders probe one shuffled build of late lines — no per-row
    subquery. The quarter filter pushes into the orders scan."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4_SQL)


#: TPC-H-Q10-shaped SQL (returned item reporting): top 20 customers by
#: revenue lost to returns in a quarter.
_Q10_SQL = """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           c_acctbal, n_name, c_mktsegment
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@query("sql_returned_items_q10", survey_ref="J1,J4,A1,O3,§3-EP3", oracle=_Q10_SQL)
def sql_returned_items_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact⋈fact (orders⋈lineitem) with two broadcast
    dims, a selective flag + date-window filter pushed to both fact
    scans, decimal-exact revenue, and a global top-20 planned as
    TakeOrderedAndProject (custkey tiebreak keeps the cut
    deterministic). The returns-audit classic."""
    _views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_Q10_SQL)


# --------------------------- r12: Spark-4 SQL surface — session variables

#: SQL session variables + EXECUTE IMMEDIATE (F3/classics): the
#: parameterized-script shape ETL jobs use — compute a corpus statistic
#: once into a variable, then drive a dependent query through the
#: variable (EXECUTE IMMEDIATE ... USING). Variables are session-scoped;
#: DECLARE OR REPLACE keeps the query idempotent under re-runs in one
#: session (the drive_entry/pytest reuse pattern).
_VARIABLES_FINAL_SQL = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_big,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                 / ?, 6) AS total_over_avg
    FROM orders
    WHERE o_totalprice > ?
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query(
    "fn_sql_variables_suite",
    survey_ref="F3,A1,P3",
    doc="Spark 4 SQL session variables: DECLARE/SET VARIABLE from a "
    "scalar subquery, then EXECUTE IMMEDIATE a parameterized aggregate "
    "USING the variable twice (filter threshold + normalizer).",
    oracle="""
        WITH avgp AS (
            SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS a
            FROM orders
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_big,
               round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                     / (SELECT a FROM avgp), 6) AS total_over_avg
        FROM orders, avgp
        WHERE o_totalprice > a
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def fn_sql_variables_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (SPARK-44444) + EXECUTE IMMEDIATE
    (SPARK-44838): the parameterized-ETL shape — DECLARE a variable,
    SET it from a scalar subquery over the data (the mean order price,
    computed ONCE), then EXECUTE IMMEDIATE a dependent aggregate that
    binds the variable twice via USING (as the filter threshold and as
    the normalizer). The oracle inlines the same scalar through a CTE.
    Scale shape: the statistic is one partial-agg scan reduced to a
    SCALAR on the driver (exactly what a session variable is for — no
    re-evaluation per consumer, no broadcast join for a 1-row frame),
    then one filtered hash aggregate."""
    _views(spark, sf_dir, "orders")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE spark_graft_avg_price DOUBLE DEFAULT 0.0"
    )
    spark.sql(
        "SET VARIABLE spark_graft_avg_price = "
        "(SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) "
        "FROM orders)"
    )
    return spark.sql(
        f"EXECUTE IMMEDIATE '{_VARIABLES_FINAL_SQL}' "
        "USING spark_graft_avg_price, spark_graft_avg_price"
    )


# --------------------------------- r12: Spark-4 SQL pipe syntax (|>)

#: SQL pipe syntax (SPARK-49555, new in Spark 4.0): linear dataflow
#: SQL — each |> stage consumes the previous one top-to-bottom, the
#: composition order a DataFrame user already thinks in. The pipe form
#: parses to the IDENTICAL logical plan as nested standard SQL, so
#: Catalyst optimizations (pushdown, partial agg) apply unchanged — the
#: oracle below is the standard-SQL spelling of the same query.
_PIPE_SQL = """
    FROM lineitem
    |> WHERE l_shipdate >= DATE '1996-01-01' AND l_discount > 0.02
    |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
    |> EXTEND CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'retail' END
              AS order_class
    |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_lines,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                     AS sum_qty,
                 CAST(SUM(CAST(disc_price AS DECIMAL(28,6))) AS DOUBLE)
                     AS revenue
       GROUP BY l_returnflag, order_class
    |> ORDER BY l_returnflag, order_class
"""


@query(
    "sql_pipe_syntax_flagship",
    survey_ref="F3,A1,P3,O1,§3-EP1",
    doc="Spark 4 SQL pipe syntax: filter -> EXTEND computed columns -> "
    "AGGREGATE ... GROUP BY -> ORDER BY as a linear |> dataflow; "
    "decimal-stabilized revenue, standard-SQL oracle.",
    oracle="""
        SELECT l_returnflag, order_class,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                   AS sum_qty,
               CAST(SUM(CAST(disc_price AS DECIMAL(28,6))) AS DOUBLE)
                   AS revenue
        FROM (
            SELECT l_returnflag, l_quantity,
                   l_extendedprice * (1 - l_discount) AS disc_price,
                   CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'retail' END
                       AS order_class
            FROM lineitem
            WHERE l_shipdate >= DATE '1996-01-01' AND l_discount > 0.02
        )
        GROUP BY l_returnflag, order_class
        ORDER BY l_returnflag, order_class
    """,
)
def sql_pipe_syntax_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (SPARK-49555, Spark 4.0): the filter → derive →
    aggregate → order dataflow written as |> stages in execution order
    — the SQL surface for users who think in DataFrame chains. Pipe
    stages parse into the same logical operators as the nested-SELECT
    oracle, so this query ALSO asserts the two syntaxes are
    plan-equivalent where it matters: the shipdate/discount predicates
    reach the parquet scan as PushedFilters and the AGGREGATE stage
    partial-aggregates map-side exactly as the standard form does
    (same Catalyst plan → same physical plan). Revenue follows the dsum
    discipline (decimal cast of the double product BEFORE the sum) so
    the value is order-independent and bit-identical across engines."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_PIPE_SQL)


# ------------------------------ r13: Spark-4 SQL scripting (SPARK-48338)

#: SQL scripting (BEGIN...END compound statements, new in Spark 4.0):
#: procedural SQL — local variables, WHILE loops, IF/ELSE — executed by
#: the engine one statement at a time, each statement a full Catalyst
#: plan. The natural fit is an ITERATED SCALAR the declarative layer
#: cannot express without unrolling: here the 3-step "iterated mean"
#: fixpoint (mean -> mean of the above-mean tail -> mean of THAT tail),
#: a classic heavy-tail threshold estimator. Each loop iteration is ONE
#: aggregation scan reduced to a driver-side scalar (exactly what a
#: scripting variable is for — the 100 TB shape is K sequential
#: partial-agg passes, no join, no re-evaluation per consumer), then a
#: single filtered hash aggregate consumes the converged threshold. The
#: oracle unrolls the identical three iterations as nested CTEs with
#: the same decimal-sum/count-divide expression, so the double is
#: bit-identical across engines at every step.
_SCRIPTING_SQL = """
BEGIN
  DECLARE thr DOUBLE DEFAULT 0.0;
  DECLARE i INT DEFAULT 0;
  DECLARE tier STRING;
  WHILE i < 3 DO
    SET thr = (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE)
               FROM orders WHERE o_totalprice > thr);
    SET i = i + 1;
  END WHILE;
  IF thr > 100000.0 THEN
    SET tier = 'high';
  ELSE
    SET tier = 'low';
  END IF;
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
         round(thr, 6) AS threshold,
         tier AS tier
  FROM orders
  WHERE o_totalprice > thr
  GROUP BY o_orderpriority
  ORDER BY o_orderpriority;
END
"""


@query(
    "sql_scripting_compound",
    survey_ref="F3,A1,P3,O1,§3-EP1",
    doc="Spark 4 SQL scripting (BEGIN...END, SPARK-48338): DECLARE + "
    "WHILE loop iterating a scalar threshold from the data + IF/ELSE "
    "tiering + a final filtered aggregate; oracle unrolls the loop as "
    "nested CTEs.",
    oracle="""
        WITH t1 AS (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS a
            FROM orders WHERE o_totalprice > 0.0
        ), t2 AS (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS a
            FROM orders, t1 WHERE o_totalprice > t1.a
        ), t3 AS (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS a
            FROM orders, t2 WHERE o_totalprice > t2.a
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS sum_price,
               round(t3.a, 6) AS threshold,
               CASE WHEN t3.a > 100000.0 THEN 'high' ELSE 'low' END AS tier
        FROM orders, t3 WHERE o_totalprice > t3.a
        GROUP BY o_orderpriority, t3.a
        ORDER BY o_orderpriority
    """,
)
def sql_scripting_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scripting (SPARK-48338, compound BEGIN...END): the
    engine executes DECLARE / SET / WHILE / IF statements sequentially,
    re-planning each enclosed query with the current variable bindings
    — probed green on this 4.1.2 build (r12 verdict task 3). The WHILE
    body SETs a local variable from a scalar subquery that READS the
    variable it updates (the iterated-mean tail threshold), which no
    single declarative query can express without manual unrolling; the
    IF/ELSE tiers the converged scalar. Scale shape: each iteration is
    one partial-aggregated scan -> one scalar on the driver (K=3 scans
    total, sequential by construction), and the final statement is one
    filtered hash aggregate with the threshold folded in as a literal —
    no join, no broadcast, no per-row Python. The oracle unrolls the
    identical iterations as nested CTEs sharing the decimal-sum /
    count-divide expression, so the threshold double is bit-identical
    in both engines and the > comparison admits identical rows."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_SCRIPTING_SQL)

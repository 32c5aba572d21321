"""Join operators (SURVEY.md §2.3: J1–J8).

Physical strategy notes for 100 TB:
  * Fact⋈dim joins broadcast the dim side explicitly (region 5 rows,
    nation 25, supplier/part O(sf)) — zero shuffle of the fact table.
  * Fact⋈fact joins (orders⋈lineitem) shuffle both sides on the join key;
    at scale these tables would be bucketed by orderkey at write time so
    the join is co-located (sources/io.py write path supports it).
  * The as-of join is a window emulation — no native Spark as-of —
    shuffling once on (user_id) and sorting within partitions; semantics
    pinned to DuckDB's ASOF JOIN (match: greatest ts <=, inner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.functions.numeric import dsum, sql_dsum
from pyspark_for_ebook_classification_spark.operators.scans import (
    BANDS_SQL_VALUES,
    price_bands_df,
)
from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load


@query(
    "join_inner_revenue_by_customer",
    survey_ref="J1",
    oracle=f"""
        SELECT
            c_custkey,
            c_name,
            {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
            COUNT(*) AS n_items
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_custkey, c_name
        HAVING COUNT(*) >= 30
    """,
)
def join_inner_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact⋈dim inner join chain. lineitem⋈orders shuffles on
    orderkey; customer is small relative to the facts and AQE promotes it
    to broadcast at runtime."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("n_items") >= 30)
    )


@query(
    "join_left_outer_order_counts",
    survey_ref="J2,F8",
    oracle="""
        SELECT
            c_custkey,
            CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
            CASE WHEN n_orders IS NULL THEN 'inactive' ELSE 'active' END AS status
        FROM customer
        LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
        ) o ON c_custkey = o_custkey
    """,
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER preserving customers with zero orders. Aggregate-then-join
    (not join-then-aggregate): the shuffle moves one row per customer, not
    one per order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.when(F.col("n_orders").isNull(), "inactive").otherwise("active").alias("status"),
    )


@query(
    "join_semi_customers_with_urgent",
    survey_ref="J3",
    oracle="""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        )
    """,
)
def join_semi_customers_with_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI = EXISTS. Only the key column of the right side crosses
    the shuffle, and each left row is emitted at most once."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_anti_parts_never_ordered",
    survey_ref="J3",
    oracle="""
        SELECT p_partkey, p_brand
        FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
    empty_ok="every part at the driver's sf0.01/sf0.1 IS ordered at least "
    "once (verified via DuckDB, r7 verdict) — 0 rows is the true answer; "
    "tests/test_nonemptiness.py plants an unordered part and proves the "
    "anti-join emits it",
)
def join_anti_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI = NOT EXISTS."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_brand"
    )


@query(
    "join_broadcast_star_revenue",
    survey_ref="J4,J1,A1",
    oracle=f"""
        SELECT
            r_name,
            n_name,
            {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
            COUNT(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
)
def join_broadcast_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped star join with every dim explicitly broadcast: the
    fact table is scanned exactly once with zero shuffle before the final
    (tiny) aggregation — the canonical 100 TB star-join plan."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "join_range_price_bands",
    survey_ref="J5,S4",
    oracle=f"""
        SELECT band, COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice', 'band_value')}
        FROM orders
        JOIN {BANDS_SQL_VALUES}
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
    """,
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range) join against an in-memory band dim. Non-equi joins
    can't hash-partition; broadcasting the 3-row band table makes it a
    broadcast-nested-loop scan — the only sane physical plan at scale."""
    o = load(spark, sf_dir, "orders")
    bands = price_bands_df(spark)
    cond = (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi)
    return (
        o.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "band_value"))
    )


@query(
    "join_cross_region_status",
    survey_ref="J6",
    oracle="""
        SELECT r_name, o_orderstatus, COUNT(*) AS n_pairs
        FROM region
        CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
        CROSS JOIN nation
        WHERE n_regionkey = r_regionkey
        GROUP BY r_name, o_orderstatus
    """,
)
def join_cross_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join — restricted to tiny dims (5 × 3 × 25); at scale
    cross joins only ever appear LSH-pruned (see similarity.py)."""
    r = load(spark, sf_dir, "region")
    statuses = load(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    n = load(spark, sf_dir, "nation")
    return (
        r.crossJoin(statuses)
        .join(n, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_self_supplier_pairs",
    survey_ref="J8",
    oracle="""
        SELECT
            a.l_suppkey AS supp_a,
            b.l_suppkey AS supp_b,
            COUNT(*) AS n_shared_orders
        FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        GROUP BY a.l_suppkey, b.l_suppkey
    """,
)
def join_self_supplier_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: supplier co-occurrence within an order. Distinct-reduce
    BEFORE the self-join so the join input is (order, supplier) pairs, not
    raw line items — at scale this is the difference between joining 600M
    and 150M rows."""
    li = load(spark, sf_dir, "lineitem")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    a = pairs.alias("a")
    b = pairs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("supp_a"), F.col("b.l_suppkey").alias("supp_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_orders"))
    )


@query(
    "join_salted_skew",
    survey_ref="J1,§4-skew",
    doc="Salted fact⋈dim join — physically skew-proof, logically identical to the plain join.",
    oracle=f"""
        SELECT o_orderpriority,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual skew salting (functions/skew.py): the lineitem side is
    salted into 8 sub-keys and orders is replicated per salt, so a hot
    orderkey would spread over 8 tasks. The oracle is the PLAIN join —
    salting must not change a single row."""
    from pyspark_for_ebook_classification_spark.functions.skew import salted_join

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = salted_join(li, o, li.l_orderkey == o.o_orderkey, n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items")
    )


@query(
    "join_asof_purchase_last_click",
    survey_ref="J7,W2",
    doc="As-of join: each purchase event matched to the user's latest click at-or-before it.",
    oracle="""
        WITH purchases AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS click_event_id
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, CAST(ts AS TIMESTAMP)
        )
        SELECT
            p.event_id,
            p.user_id,
            p.ts,
            c.ts AS click_ts,
            c.click_event_id
        FROM purchases p
        ASOF JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join emulation (Spark has no native ASOF — SURVEY.md §4).

    Semantics pinned to DuckDB ASOF JOIN: inner, match = greatest click.ts
    with click.ts <= purchase.ts per user; clicks pre-deduped to one per
    (user, ts) (max event_id) so ties are impossible.

    Plan: union both sides tagged, one shuffle on user_id, in-partition
    sort by (ts, is_purchase), last_value(ignorenulls) carries the latest
    click onto each purchase row. O(n log n) per partition, single
    shuffle — scales linearly with events, no range explosion.
    """
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )

    tagged = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("click_event_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ts",
            F.lit(0).alias("is_purchase"),
            F.lit(None).cast("long").alias("event_id"),
            "click_event_id",
            F.col("ts").alias("click_ts"),
        )
    )
    # clicks sort before purchases at equal ts (is_purchase 0 < 1), so a
    # click at exactly purchase.ts IS matched — DuckDB ASOF `>=` semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("last_click_id", F.last("click_event_id", ignorenulls=True).over(w))
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter((F.col("is_purchase") == 1) & F.col("last_click_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("last_click_ts").alias("click_ts"),
            F.col("last_click_id").alias("click_event_id"),
        )
    )


@query(
    "join_asof_forward_next_error",
    survey_ref="J7,W2",
    doc="Forward as-of join: each purchase matched to the user's first error strictly after it.",
    oracle="""
        WITH purchases AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase'
        ),
        errors AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CAST(min(event_id) AS BIGINT) AS error_event_id
            FROM events WHERE event_type = 'error'
            GROUP BY user_id, CAST(ts AS TIMESTAMP)
        )
        SELECT
            p.event_id,
            p.user_id,
            p.ts,
            e.ts AS error_ts,
            e.error_event_id
        FROM purchases p
        ASOF JOIN errors e
          ON p.user_id = e.user_id AND p.ts < e.ts
    """,
)
def join_asof_forward_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of (J7's other direction): first error STRICTLY after
    each purchase per user — DuckDB ``ASOF JOIN ... ON p.ts < e.ts``.

    Same union+window emulation as the backward as-of, mirrored: one
    shuffle on user_id, in-partition sort by (ts, is_purchase), and
    first_value(ignorenulls) over the FOLLOWING frame pulls the earliest
    error onto each purchase. Errors sort before purchases at equal ts
    (is_purchase 0 < 1), so an error at exactly purchase.ts is NOT in the
    following frame — strict `<` semantics preserved."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("error_event_id"))
    )

    tagged = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("error_event_id"),
        F.lit(None).cast("timestamp").alias("error_ts"),
    ).unionByName(
        errors.select(
            "user_id",
            "ts",
            F.lit(0).alias("is_purchase"),
            F.lit(None).cast("long").alias("event_id"),
            "error_event_id",
            F.col("ts").alias("error_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    return (
        tagged.withColumn(
            "next_error_id", F.first("error_event_id", ignorenulls=True).over(w)
        )
        .withColumn("next_error_ts", F.first("error_ts", ignorenulls=True).over(w))
        .filter((F.col("is_purchase") == 1) & F.col("next_error_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("next_error_ts").alias("error_ts"),
            F.col("next_error_id").alias("error_event_id"),
        )
    )


@query(
    "join_null_safe_eq",
    survey_ref="J1,F8",
    doc="Null-safe equi-join (<=>): NULL keys match NULL keys instead of vanishing.",
    oracle="""
        WITH tagged AS (
            SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
            FROM customer
        ),
        seg_counts AS (
            SELECT nullif(c_mktsegment, 'BUILDING') AS seg, COUNT(*) AS seg_n
            FROM customer GROUP BY 1
        )
        SELECT t.c_custkey, t.seg, s.seg_n
        FROM tagged t JOIN seg_counts s ON t.seg IS NOT DISTINCT FROM s.seg
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark ``<=>`` (eqNullSafe) == SQL ``IS NOT DISTINCT FROM``: a plain
    equi-join drops NULL keys on both sides; the null-safe variant keeps
    them AND stays a hash-joinable equality (Catalyst plans
    BroadcastHashJoin here, not a nested loop) — the difference between
    losing every null-keyed row and a correct outer-dimension rollup."""
    c = load(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    tagged = c.select("c_custkey", seg.alias("seg"))
    seg_counts = c.groupBy(seg.alias("seg")).agg(F.count(F.lit(1)).alias("seg_n"))
    return tagged.join(
        F.broadcast(seg_counts), tagged.seg.eqNullSafe(seg_counts.seg)
    ).select(tagged.c_custkey, tagged.seg, seg_counts.seg_n)


@query(
    "join_pit_scd2_state",
    survey_ref="J5,J7,W2",
    doc="Point-in-time join: each purchase matched to the user's SCD2 state interval.",
    oracle="""
        WITH states AS (
            SELECT user_id, event_type,
                   CAST(ts AS TIMESTAMP) AS valid_from,
                   lead(CAST(ts AS TIMESTAMP)) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ) AS valid_to
            FROM events
            WHERE event_type <> 'purchase' AND user_id % 10 = 0
        )
        SELECT p.event_id, p.user_id,
               CAST(p.ts AS TIMESTAMP) AS purchase_ts,
               s.event_type AS state_at_purchase,
               s.valid_from AS state_since
        FROM events p
        JOIN states s
          ON s.user_id = p.user_id
         AND CAST(p.ts AS TIMESTAMP) >= s.valid_from
         AND (s.valid_to IS NULL OR CAST(p.ts AS TIMESTAMP) < s.valid_to)
        WHERE p.event_type = 'purchase' AND p.user_id % 10 = 0
    """,
)
def join_pit_scd2_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join — the feature-store lookup pattern: probe
    rows (purchases) land in exactly one validity interval of the SCD2
    state table built from the user's OTHER events (lead() intervals
    partition each user's timeline, so the match is unique and the range
    predicate can't double-count). Equi-key on user_id carries the join;
    the interval bounds are post-join filters — at 100 TB both sides
    shuffle once on user_id and the per-user sort is bounded by that
    user's history. Purchases before a user's first non-purchase event
    have no state and drop out (inner semantics), identically in both
    engines."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    states = (
        ev.filter(F.col("event_type") != "purchase")
        .select(
            F.col("user_id").alias("s_user_id"),
            F.col("event_type").alias("state_at_purchase"),
            F.col("ts").alias("state_since"),
            F.lead("ts").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ).alias("valid_to"),
        )
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    return p.join(
        states,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("purchase_ts") >= F.col("state_since"))
        & (F.col("valid_to").isNull() | (F.col("purchase_ts") < F.col("valid_to"))),
    ).select(
        "event_id",
        "user_id",
        "purchase_ts",
        "state_at_purchase",
        "state_since",
    )


@query(
    "join_basket_part_pairs",
    survey_ref="J8,A1",
    doc="Market-basket mining: part pairs co-occurring in the same order.",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_orders_together
        FROM items a
        JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING COUNT(*) >= 3
    """,
)
def join_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence (market-basket) mining: the self-join that powers
    "frequently bought together" — distinct (order, part) pairs joined on
    the order key with part_a < part_b so each unordered pair appears
    once, then support counted. HAVING >= 3 keeps only pairs with real
    support, mirrored in both engines.

    Scale shape: the dedup and the self-join share the l_orderkey shuffle
    (AQE reuses the exchange); per-order pair fan-out is quadratic in
    ORDER SIZE (bounded, ~lines-per-order²), never in table size — the
    same bound that makes per-bucket pair generation safe in the LSH
    dedup path. Skewed mega-orders would be capped the same way
    (MAX_BUCKET) before pairing."""
    li = load(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
        .filter(F.col("n_orders_together") >= 3)
    )


#: blocked fuzzy self-join: supplier names within edit distance 1,
#: candidates pruned by (length, 12-char prefix) blocking.
_FUZZY_SQL = """
    SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INT) AS edit_dist
    FROM supplier a
    JOIN supplier b
      ON length(a.s_name) = length(b.s_name)
     AND substring(a.s_name, 1, 12) = substring(b.s_name, 1, 12)
     AND a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 1
"""


@query(
    "join_fuzzy_supplier_names",
    survey_ref="J8,F1,§3-EP3",
    oracle=_FUZZY_SQL,
    doc="Entity-resolution fuzzy join: edit-distance ≤ 1 name pairs via prefix blocking.",
)
def join_fuzzy_supplier_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-string (entity-resolution) self-join: supplier name
    pairs within Levenshtein distance 1. The join is BLOCKED on
    (length, 12-char prefix) equality — an equi-key Catalyst hash-joins —
    so the O(n·m) edit-distance kernel only ever runs on in-block
    candidates, never all pairs.

    The blocking is part of the operator's DEFINITION, not a lossless
    optimization: a distance-1 substitution landing inside the first 12
    chars puts the pair in different blocks and it is (intentionally)
    not emitted. For this fixture's names ('Supplier#' + zero-padded
    key, keys < 10^6 at the tested SFs) every varying char sits past
    position 12, so no pair is lost here — but at key widths ≥ 7 digits
    the block boundary would start dropping true pairs. Radius-complete
    blocking swaps the prefix key for q-gram prefix filtering (PPJoin
    style) over the same dataflow. Both engines share one SQL text, so
    the oracle checks exactly these blocked semantics; levenshtein
    agrees exactly (integer DP)."""
    for t in ("supplier",):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_FUZZY_SQL)


@query(
    "join_asof_nearest_click",
    survey_ref="J7,W2,F2",
    doc="Nearest as-of join: each purchase matched to its closest click "
    "in either time direction (tie -> the earlier click).",
    oracle="""
        WITH purchases AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   max(event_id) AS click_event_id
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, CAST(ts AS TIMESTAMP)
        ),
        tagged AS (
            SELECT user_id, ts, 1 AS is_purchase, event_id,
                   NULL::BIGINT AS click_event_id, NULL::TIMESTAMP AS click_ts
            FROM purchases
            UNION ALL BY NAME
            SELECT user_id, ts, 0 AS is_purchase, NULL::BIGINT AS event_id,
                   click_event_id, ts AS click_ts
            FROM clicks
        ),
        ctx AS (
            SELECT *,
                   last_value(click_ts IGNORE NULLS) OVER wprev AS prev_ts,
                   last_value(click_event_id IGNORE NULLS) OVER wprev AS prev_id,
                   first_value(click_ts IGNORE NULLS) OVER wnext AS next_ts,
                   first_value(click_event_id IGNORE NULLS) OVER wnext AS next_id
            FROM tagged
            WINDOW
              wprev AS (PARTITION BY user_id ORDER BY ts, is_purchase
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              wnext AS (PARTITION BY user_id ORDER BY ts, is_purchase
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        )
        SELECT event_id, user_id, ts,
               CASE WHEN next_ts IS NULL THEN prev_ts
                    WHEN prev_ts IS NULL THEN next_ts
                    WHEN epoch_us(ts) - epoch_us(prev_ts)
                         <= epoch_us(next_ts) - epoch_us(ts)
                    THEN prev_ts ELSE next_ts END AS click_ts,
               CASE WHEN next_ts IS NULL THEN prev_id
                    WHEN prev_ts IS NULL THEN next_id
                    WHEN epoch_us(ts) - epoch_us(prev_ts)
                         <= epoch_us(next_ts) - epoch_us(ts)
                    THEN prev_id ELSE next_id END AS click_event_id,
               CAST(CASE WHEN next_ts IS NULL
                         THEN epoch_us(ts) - epoch_us(prev_ts)
                    WHEN prev_ts IS NULL THEN epoch_us(next_ts) - epoch_us(ts)
                    ELSE least(epoch_us(ts) - epoch_us(prev_ts),
                               epoch_us(next_ts) - epoch_us(ts))
                    END AS BIGINT) AS gap_us
        FROM ctx
        WHERE is_purchase = 1 AND (prev_ts IS NOT NULL OR next_ts IS NOT NULL)
    """,
)
def join_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of: completes the family (backward =
    join_asof_purchase_last_click, forward = join_asof_forward_next_error).

    Same single-shuffle union-merge plan as the backward variant, with
    BOTH context windows over the one (user_id, ts, is_purchase) sort:
    the preceding frame carries the latest click forward, the following
    frame carries the next click backward, and a branchless comparison
    on microsecond-exact BIGINT gaps (unix_micros / epoch_us — never
    truncated seconds) picks the nearer side, ties to the earlier
    click. Spark plans ONE exchange + one sort for both frames. A
    range-join formulation would need an interval blow-up; this stays
    O(n) rows with two frame passes."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    tagged = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
        "event_id",
        F.lit(None).cast("long").alias("click_event_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ts",
            F.lit(0).alias("is_purchase"),
            F.lit(None).cast("long").alias("event_id"),
            "click_event_id",
            F.col("ts").alias("click_ts"),
        )
    )
    base = Window.partitionBy("user_id").orderBy("ts", "is_purchase")
    wprev = base.rowsBetween(Window.unboundedPreceding, 0)
    wnext = base.rowsBetween(1, Window.unboundedFollowing)
    ctx = tagged.select(
        "*",
        F.last("click_ts", ignorenulls=True).over(wprev).alias("prev_ts"),
        F.last("click_event_id", ignorenulls=True).over(wprev).alias("prev_id"),
        F.first("click_ts", ignorenulls=True).over(wnext).alias("next_ts"),
        F.first("click_event_id", ignorenulls=True).over(wnext).alias("next_id"),
    )
    gp = F.unix_micros("ts") - F.unix_micros("prev_ts")
    gn = F.unix_micros("next_ts") - F.unix_micros("ts")
    prev_wins = F.col("next_ts").isNull() | (
        F.col("prev_ts").isNotNull() & (gp <= gn)
    )
    return (
        ctx.filter(
            (F.col("is_purchase") == 1)
            & (F.col("prev_ts").isNotNull() | F.col("next_ts").isNotNull())
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(prev_wins, F.col("prev_ts")).otherwise(F.col("next_ts")).alias(
                "click_ts"
            ),
            F.when(prev_wins, F.col("prev_id")).otherwise(F.col("next_id")).alias(
                "click_event_id"
            ),
            F.when(prev_wins, gp).otherwise(gn).cast("bigint").alias("gap_us"),
        )
    )


#: time-proximity window for the banded self-join (seconds)
_BAND_S = 600


@query(
    "join_time_band_pairs",
    survey_ref="J5,J8,F2,A1",
    doc="Banded temporal self-join: pairs of purchases by different "
    "users within 10 minutes of each other, found via time-bucket "
    "blocking (never an all-pairs range join).",
    oracle=f"""
        WITH p AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                       // {_BAND_S} AS b
            FROM events WHERE event_type = 'purchase'
        ),
        probe AS (
            SELECT event_id, user_id, ts, b + g.i AS key
            FROM p, generate_series(0, 1) g(i)
        ),
        hits AS (
            SELECT least(a.event_id, c.event_id) AS event_a,
                   greatest(a.event_id, c.event_id) AS event_b,
                   abs(epoch_us(a.ts) - epoch_us(c.ts)) AS gap_us
            FROM probe a JOIN p c ON c.b = a.key
            WHERE a.event_id <> c.event_id
              AND a.user_id <> c.user_id
              AND abs(epoch_us(a.ts) - epoch_us(c.ts)) <= {_BAND_S} * 1000000
        )
        SELECT DISTINCT event_a, event_b, CAST(gap_us AS BIGINT) AS gap_us
        FROM hits
    """,
)
def join_time_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal proximity pairs via bucket blocking — the scale-safe
    form of ``|t1 - t2| <= T`` self-joins.

    A naive range self-join is quadratic; the banded form buckets time
    into T-second cells and probes each event against its OWN cell and
    the NEXT one (two join keys per probe row cover every pair within
    T, because such a pair spans at most adjacent cells). The range
    predicate then runs only inside matched cells: work is
    Σ per-bucket count² — linear for time-uniform streams — and the
    join is a plain shuffle-hash equi-join on the bucket key, skew-safe
    under AQE. least/greatest + DISTINCT canonicalizes the pair
    regardless of which side probed. Same blocking idea as the LSH
    bucket joins, applied to the time axis; microsecond-exact BIGINT
    gaps as in join_asof_nearest_click."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.expr(f"CAST(floor(unix_micros(ts) / 1000000) AS BIGINT) div {_BAND_S}").alias(
            "b"
        ),
    )
    probe = p.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("key"),
    )
    gap = F.abs(F.unix_micros("a_ts") - F.unix_micros("ts"))
    return (
        probe.join(p, probe.key == p.b)
        .filter(
            (F.col("a_id") != F.col("event_id"))
            & (F.col("a_user") != F.col("user_id"))
            & (gap <= _BAND_S * 1_000_000)
        )
        .select(
            F.least("a_id", "event_id").alias("event_a"),
            F.greatest("a_id", "event_id").alias("event_b"),
            gap.cast("bigint").alias("gap_us"),
        )
        .distinct()
    )

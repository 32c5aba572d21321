"""Window-function operators (SURVEY.md §2.5: W1–W4).

Determinism rule: every ORDER BY inside a window ends with a unique key
(orderkey / event_id), so rankings and frame contents never depend on
partition-order tie-breaks — required for the order-insensitive hash gate
and for run-to-run reproducibility on a cluster.

Scale: one shuffle per distinct partitionBy clause; within-partition sort
spills via UnsafeExternalSorter if a key is hot. None of these windows is
unbounded-unpartitioned (the classic single-task trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.functions.numeric import dsum
from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load


@query(
    "window_rank_orders",
    survey_ref="W1",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER w AS rn,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        QUALIFY rn <= 5
    """,
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over each customer's orders by value."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "window_lag_lead_events",
    survey_ref="W2,F2",
    oracle="""
        SELECT event_id, user_id,
               lag(event_type) OVER w AS prev_type,
               lead(event_type) OVER w AS next_type,
               CAST(date_diff('second', lag(CAST(ts AS TIMESTAMP)) OVER w,
                              CAST(ts AS TIMESTAMP)) AS BIGINT) AS gap_seconds
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        QUALIFY user_id % 25 = 0
    """,
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event timeline — the sessionization
    primitive. (user_id % 25 trims the declared output, not the window.)"""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
            .cast("bigint")
            .alias("gap_seconds"),
        )
        .filter(F.col("user_id") % 25 == 0)
    )


@query(
    "window_running_sum",
    survey_ref="W3",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
                    OVER (PARTITION BY l_suppkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS running_qty
        FROM lineitem
        WHERE l_suppkey % 10 = 0
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per supplier in ship order. The frame ORDER BY ends in
    (orderkey, linenumber) so the prefix — and therefore every running
    value — is uniquely determined; accumulation in DECIMAL keeps it
    bit-stable across engines."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") % 10 == 0)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).over(w).cast("double").alias(
            "running_qty"
        ),
    )


@query(
    "window_moving_avg_range",
    survey_ref="W3,F2",
    oracle="""
        SELECT o_custkey, o_orderkey, day_no,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                    OVER (PARTITION BY o_custkey ORDER BY day_no
                          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS spend_30d
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS day_no
            FROM orders
        )
        QUALIFY o_custkey % 25 = 0
    """,
)
def window_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric day offset: trailing-30-day spend per
    customer. RANGE (unlike ROWS) aggregates ALL peers at equal day_no, so
    ties don't affect the value — no tie-break needed."""
    o = load(spark, sf_dir, "orders")
    day_no = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("bigint")
    w = Window.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-30, 0)
    return (
        o.withColumn("day_no", day_no)
        .select(
            "o_custkey",
            "o_orderkey",
            "day_no",
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .over(w)
            .cast("double")
            .alias("spend_30d"),
        )
        .filter(F.col("o_custkey") % 25 == 0)
    )


@query(
    "window_topn_revenue_per_segment",
    survey_ref="W4,J1,A1",
    oracle="""
        WITH seg_orders AS (
            SELECT c_mktsegment, o_orderkey, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        SELECT c_mktsegment, o_orderkey, o_totalprice, rn
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY c_mktsegment
                ORDER BY o_totalprice DESC, o_orderkey
            ) AS rn
            FROM seg_orders
        )
        WHERE rn <= 3
    """,
)
def window_topn_revenue_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group — Spark's WindowGroupLimit pushes the limit into
    the sort so each partition keeps only N rows (no full per-group sort
    materialization at scale)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    seg = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return seg.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@query(
    "window_percent_rank_cume",
    survey_ref="W1",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume,
               CAST(ntile(10) OVER w AS BIGINT) AS decile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        QUALIFY c_custkey % 10 = 0
    """,
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile over customer balances. Both are
    rank/count ratios (exact integer divisions) — rounding guards only the
    engines' division-expression shape."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(10).over(w).cast("bigint").alias("decile"),
        )
        .filter(F.col("c_custkey") % 10 == 0)
    )


@query(
    "window_first_last_value",
    survey_ref="W2",
    oracle="""
        SELECT DISTINCT
            l_suppkey,
            first_value(l_orderkey) OVER w AS first_order,
            last_value(l_orderkey) OVER (
                PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
            ) AS last_order
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over the full partition frame, reduced with DISTINCT to
    one row per supplier."""
    li = load(spark, sf_dir, "lineitem")
    order_cols = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w = Window.partitionBy("l_suppkey").orderBy(*order_cols)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        li.select(
            "l_suppkey",
            F.first("l_orderkey").over(w).alias("first_order"),
            F.last("l_orderkey").over(w_full).alias("last_order"),
        )
        .distinct()
    )


@query(
    "window_ntile_quartiles",
    survey_ref="W1",
    oracle="""
        SELECT c_mktsegment, c_custkey,
               CAST(ntile(4) OVER (
                   PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
               ) AS INT) AS quartile
        FROM customer
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) balance quartiles per market segment. The ordering ends in
    the unique c_custkey so tile assignment is total-order deterministic in
    both engines."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment", "c_custkey", F.ntile(4).over(w).alias("quartile")
    )


@query(
    "window_funnel_conversion",
    survey_ref="W2,A5,F2",
    oracle="""
        WITH stage AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
                       AS first_view,
                   MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END)
                       AS first_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)
                       AS first_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT
            COUNT(*) AS n_users,
            CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_viewed,
            CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_view_then_click,
            CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                          AND first_purchase > first_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        FROM stage
    """,
)
def window_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (view → click → purchase, time-ordered): per-user
    first-touch timestamps via conditional MIN — one hash aggregate on
    user_id, no window state, no self-joins (the n-stage funnel stays a
    single shuffle at any scale). NULL semantics do the late-stage gating:
    a missing earlier stage makes the > comparison NULL → not counted."""
    ev = load(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    stage = ev.groupBy("user_id").agg(
        first_of("view").alias("first_view"),
        first_of("click").alias("first_click"),
        first_of("purchase").alias("first_purchase"),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    purchased = clicked & (F.col("first_purchase") > F.col("first_click"))
    as_cnt = lambda c, name: F.sum(F.when(c, 1).otherwise(0)).cast("bigint").alias(name)
    return stage.agg(
        F.count(F.lit(1)).alias("n_users"),
        as_cnt(viewed, "n_viewed"),
        as_cnt(clicked, "n_view_then_click"),
        as_cnt(purchased, "n_full_funnel"),
    )


@query(
    "window_nth_value_frames",
    survey_ref="W2,W3",
    oracle="""
        SELECT DISTINCT
            l_suppkey,
            nth_value(l_orderkey, 2) OVER (
                PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
            ) AS second_order,
            nth_value(l_orderkey, 3) OVER (
                PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
            ) AS third_order
        FROM lineitem
        WHERE l_orderkey % 10 = 0
    """,
)
def window_nth_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full-partition frame (NULL when the partition is
    shorter than n — identical NULL semantics in both engines), reduced
    with DISTINCT to one row per supplier."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return li.select(
        "l_suppkey",
        F.nth_value("l_orderkey", 2).over(w).alias("second_order"),
        F.nth_value("l_orderkey", 3).over(w).alias("third_order"),
    ).distinct()


@query(
    "window_cohort_retention",
    survey_ref="W1,F2,A2",
    doc="Cohort retention: users active N days after their first-seen day.",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events
        ), coh AS (
            SELECT user_id, day,
                   MIN(day) OVER (PARTITION BY user_id) AS cohort_day
            FROM days
        )
        SELECT cohort_day,
               CAST(datediff('day', cohort_day, day) AS INT) AS day_offset,
               COUNT(DISTINCT user_id) AS n_users
        FROM coh
        GROUP BY cohort_day, datediff('day', cohort_day, day)
    """,
)
def window_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the product-analytics staple: each user joins the
    cohort of their first active day; the grid (cohort_day, day_offset)
    counts distinct users still active at that offset.

    Scale shape: the distinct (user, day) pass collapses raw events to at
    most users × days rows BEFORE any window math (that's the 100 TB→GB
    reduction); the min-over-user window and the distinct both shuffle on
    user_id, so AQE reuses one exchange. Output is calendar-bounded
    (days²), independent of event volume."""
    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    coh = ev.withColumn(
        "cohort_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    return coh.groupBy(
        "cohort_day",
        F.datediff("day", "cohort_day").alias("day_offset"),
    ).agg(F.count_distinct("user_id").alias("n_users"))


@query(
    "window_gapfill_daily",
    survey_ref="W3,F2,J2,J4",
    doc="Zero-filled daily activity grid per user (calendar gap-fill).",
    oracle="""
        WITH cal AS (
            SELECT unnest(generate_series(
                (SELECT MIN(date_trunc('day', ts)) FROM events),
                (SELECT MAX(date_trunc('day', ts)) FROM events),
                INTERVAL 1 DAY)) AS day
        ), users AS (
            SELECT DISTINCT user_id FROM events
        ), daily AS (
            SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS cnt
            FROM events GROUP BY user_id, date_trunc('day', ts)
        )
        SELECT u.user_id, c.day,
               CAST(coalesce(d.cnt, 0) AS BIGINT) AS n_events
        FROM users u
        CROSS JOIN cal c
        LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = c.day
    """,
)
def window_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill — the time-series prep step that turns sparse
    event days into a dense per-user daily grid with explicit zeros (what
    any rolling-average or retention model consumes). The calendar is ONE
    row of sequence() exploded — generated, never scanned — and broadcast
    to the user list; actual counts left-join onto the grid.

    Scale shape: grid cardinality is users × days — linear in users,
    independent of event volume; the only event-volume-sized work is the
    daily pre-aggregate, which partial-aggregates map-side. Both the
    calendar (≤ a few thousand rows for decades) and nothing else are
    broadcast; the grid-to-daily join shuffles on (user_id, day), the
    minimum possible key."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    cal = (
        ev.agg(
            F.min(F.date_trunc("day", "ts")).alias("lo"),
            F.max(F.date_trunc("day", "ts")).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day")
        )
    )
    users = ev.select("user_id").distinct()
    daily = ev.groupBy("user_id", day).agg(F.count(F.lit(1)).alias("cnt"))
    grid = users.crossJoin(F.broadcast(cal))
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_events"),
    )


@query(
    "window_scd2_intervals",
    survey_ref="W2,F2",
    doc="SCD2 validity intervals: each event valid [ts, next event ts).",
    oracle="""
        SELECT event_id, user_id, event_type,
               CAST(ts AS TIMESTAMP) AS valid_from,
               lead(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               ) AS valid_to,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               ) IS NULL AS is_current
        FROM events
        WHERE user_id % 10 = 0
    """,
)
def window_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval construction: each
    state row is valid from its own timestamp until the user's next event
    (NULL = still current) — lead() over a total order (ts, event_id), so
    interval edges are deterministic even with equal timestamps. One
    shuffle on user_id; interval width computation and as-of lookups then
    become range predicates on (valid_from, valid_to)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "window_anomaly_zscore",
    survey_ref="A7,F2,W3",
    doc="Daily-volume anomaly detection: z-score per (event_type, day).",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ), stats AS (
            SELECT event_type,
                   CAST(SUM(CAST(n AS DECIMAL(28,6))) AS DOUBLE) / COUNT(n)
                       AS mu,
                   sqrt((CAST(SUM(CAST(n * n AS DECIMAL(28,6))) AS DOUBLE)
                         - CAST(SUM(CAST(n AS DECIMAL(28,6))) AS DOUBLE)
                           * CAST(SUM(CAST(n AS DECIMAL(28,6))) AS DOUBLE)
                           / COUNT(n))
                        / (COUNT(n) - 1)) AS sigma
            FROM daily GROUP BY event_type
        )
        SELECT d.event_type, d.day, d.n AS n_events,
               round((d.n - s.mu) / s.sigma, 6) AS zscore,
               CAST(abs((d.n - s.mu) / s.sigma) > 2.0 AS INT) AS is_anomaly
        FROM daily d JOIN stats s USING (event_type)
    """,
)
def window_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection — the monitoring query every event
    pipeline runs: daily counts per type, z-scored against that type's
    own mean/stddev (textbook formula over decimal-exact sums, so both
    engines produce identical doubles — built-in stddev_samp streams
    engine-specifically and would diverge in the last ulp).

    Scale shape: raw events collapse to (types × days) rows in one
    partial-aggregated pass; the stats join is a broadcast of
    types-many rows. Nothing downstream of the first aggregate scales
    with event volume."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    n = F.col("n")
    cnt = F.count("n")
    s1 = F.sum(n.cast("decimal(28,6)")).cast("double")
    s2 = F.sum((n * n).cast("decimal(28,6)")).cast("double")
    stats = daily.groupBy("event_type").agg(
        (s1 / cnt).alias("mu"),
        F.sqrt((s2 - s1 * s1 / cnt) / (cnt - 1)).alias("sigma"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            F.col("n").alias("n_events"),
            F.round(z, 6).alias("zscore"),
            (F.abs(z) > 2.0).cast("int").alias("is_anomaly"),
        )
    )


@query(
    "window_streak_islands",
    survey_ref="W1,F2,A1",
    doc="Gaps-and-islands: longest consecutive-day activity streak per user.",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events
        ), islands AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY day
                   ) AS INT) AS grp
            FROM days
        ), streaks AS (
            SELECT user_id, grp, COUNT(*) AS streak_len
            FROM islands GROUP BY user_id, grp
        )
        SELECT user_id,
               CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
               CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
               COUNT(*) AS n_streaks
        FROM streaks
        GROUP BY user_id
    """,
)
def window_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands — the streak query: consecutive active days share
    the invariant (day − row_number) because both advance by one per day,
    so that difference keys each island; two aggregates later every user
    has their longest streak. All date arithmetic is integer-exact.

    Scale shape: raw events collapse to distinct (user, day) first — the
    volume reduction — then every step shuffles on user_id only (AQE
    reuses the exchange across the window and both groupBys)."""
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    islands = days.withColumn("grp", F.date_sub("day", rn))
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("streak_len").cast("bigint").alias("n_active_days"),
        F.max("streak_len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@query(
    "window_rolling_median",
    survey_ref="W3,A7",
    doc="Rolling 7-row median per supplier (frame collect + middle-element math).",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(median(l_quantity) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS rolling_median_qty
        FROM lineitem
        WHERE l_suppkey % 20 = 0
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over a 7-row frame — the robust-smoothing primitive
    (moving AVERAGES are skew-poisoned by outliers; ops dashboards want
    the median). Spark refuses median() with a frame, so the engine
    composes it: collect the frame (bounded — 7 values, never a whole
    partition), sort, take the middle (odd) or mean of the two middles
    (even) — exactly DuckDB's interpolating frame median, verified
    value-identical. The frame list is O(frame) per row, so memory is flat
    regardless of partition size; one shuffle on the partition key."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") % 20 == 0)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-6, 0)
    )
    arr = F.sort_array(F.collect_list("l_quantity").over(w))
    n = F.size(arr)
    mid_hi = ((n + 1) / 2).cast("int")
    half = (n / 2).cast("int")
    med = F.when(n % 2 == 1, F.element_at(arr, mid_hi)).otherwise(
        (F.element_at(arr, half) + F.element_at(arr, half + 1)) / 2
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        med.cast("double").alias("rolling_median_qty"),
    )


@query(
    "window_ewma_quantity",
    survey_ref="W3,F4,F3",
    doc="Exponentially-weighted moving average over a 10-row frame (higher-order fold).",
    oracle="""
        WITH f AS (
            SELECT l_suppkey, l_orderkey, l_linenumber,
                   list(l_quantity) OVER (
                       PARTITION BY l_suppkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber
                       ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
                   ) AS arr
            FROM lineitem WHERE l_suppkey % 25 = 0
        )
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(
                   CAST(list_reduce(list_transform(arr,
                            (x, i) -> x * pow(0.8, length(arr) - i)),
                        (a, b) -> a + b) AS DOUBLE)
                 / CAST(list_reduce(list_transform(arr,
                            (x, i) -> pow(0.8, length(arr) - i)),
                        (a, b) -> a + b) AS DOUBLE),
               6) AS ewma_qty
        FROM f
    """,
)
def window_ewma_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (decay 0.8) over the last 10 rows per supplier — the smoothing
    primitive dashboards and anomaly baselines use where a plain moving
    average lags too hard. EWMA's recurrence is inherently sequential, so
    the distributed form collects the BOUNDED frame (10 values — never a
    whole partition) and evaluates the weighted fold with higher-order
    array lambdas: transform assigns pow(α, age) weights by position,
    aggregate folds left-to-right — the same element order and fold order
    DuckDB's list_transform/list_reduce use, so the doubles agree to the
    rounding guard. One shuffle on the partition key; O(frame) memory per
    row at any scale."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") % 25 == 0)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-9, 0)
    )
    return (
        li.withColumn("arr", F.collect_list("l_quantity").over(w))
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.expr(
                    """
                    aggregate(transform(arr, (x, i) -> x * pow(0.8, size(arr) - 1 - i)),
                              CAST(0 AS DOUBLE), (a, x) -> a + x)
                    / aggregate(transform(arr, (x, i) -> pow(0.8, size(arr) - 1 - i)),
                              CAST(0 AS DOUBLE), (a, x) -> a + x)
                    """
                ),
                6,
            ).alias("ewma_qty"),
        )
    )


@query(
    "window_interpolate_linear",
    survey_ref="W2,W3,F2,A7",
    doc="Linear interpolation over a dense daily grid: gap days get the "
    "line between the surrounding observations, edges carry the nearest "
    "one (LOCF/NOCB).",
    oracle="""
        WITH cal AS (
            SELECT unnest(generate_series(
                (SELECT MIN(date_trunc('day', ts)) FROM events),
                (SELECT MAX(date_trunc('day', ts)) FROM events),
                INTERVAL 1 DAY)) AS day
        ), users AS (
            SELECT DISTINCT user_id FROM events WHERE user_id % 10 = 0
        ), daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v
            FROM events WHERE user_id % 10 = 0
            GROUP BY user_id, date_trunc('day', ts)
        ), grid AS (
            SELECT u.user_id, c.day, d.v
            FROM users u CROSS JOIN cal c
            LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = c.day
        ), ctx AS (
            SELECT user_id, day, v,
                   last_value(v IGNORE NULLS) OVER w_back AS prev_v,
                   last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                       OVER w_back AS prev_day,
                   first_value(v IGNORE NULLS) OVER w_fwd AS next_v,
                   first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                       OVER w_fwd AS next_day
            FROM grid
            WINDOW
                w_back AS (PARTITION BY user_id ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                w_fwd AS (PARTITION BY user_id ORDER BY day
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT user_id, day,
               CASE
                   WHEN v IS NOT NULL THEN round(v, 6)
                   WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                       round(prev_v + (next_v - prev_v)
                             * date_diff('day', prev_day, day)
                             / date_diff('day', prev_day, next_day), 6)
                   ELSE round(coalesce(prev_v, next_v), 6)
               END AS value_filled,
               CASE WHEN v IS NOT NULL THEN 'obs'
                    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN 'interp'
                    WHEN prev_v IS NOT NULL THEN 'locf'
                    ELSE 'nocb'
               END AS src
        FROM ctx
    """,
)
def window_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with LINEAR interpolation — what the
    zero-fill grid (window_gapfill_daily) is not: gap days take the
    straight line between their surrounding observations, leading and
    trailing gaps carry the nearest observation (NOCB/LOCF). This is the
    sensor/finance resample primitive; a `src` column labels every cell
    (obs / interp / locf / nocb) so downstream models can weight
    imputed points.

    Determinism across engines: observed daily values are
    decimal-stabilized sums cast back to double, gap offsets are integer
    day differences, and the one interpolation divide is a single IEEE
    double op on identical operands — identical in both engines — with
    round(.,6) as the standard output contract.

    Scale shape: same grid economics as gapfill (users × days, linear in
    users, event volume only touches the map-side daily pre-aggregate);
    the four ignore-nulls context windows all share ONE partitioning
    (user_id, ordered by day), so Spark computes them in a single Window
    operator pass after one shuffle — no per-window exchanges."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    day = F.date_trunc("day", "ts").alias("day")
    cal = (
        ev.agg(
            F.min(F.date_trunc("day", "ts")).alias("lo"),
            F.max(F.date_trunc("day", "ts")).alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"))
    )
    daily = ev.groupBy("user_id", day).agg(dsum("value", "v"))
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(cal))
        .join(daily, ["user_id", "day"], "left")
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = grid.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("prev_day"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("next_day"),
    )
    interp = F.round(
        F.col("prev_v")
        + (F.col("next_v") - F.col("prev_v"))
        * F.datediff("day", "prev_day")
        / F.datediff("next_day", "prev_day"),
        6,
    )
    return ctx.select(
        "user_id",
        "day",
        F.when(F.col("v").isNotNull(), F.round("v", 6))
        .when(F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(), interp)
        .otherwise(F.round(F.coalesce("prev_v", "next_v"), 6))
        .alias("value_filled"),
        F.when(F.col("v").isNotNull(), F.lit("obs"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.lit("interp"),
        )
        .when(F.col("prev_v").isNotNull(), F.lit("locf"))
        .otherwise(F.lit("nocb"))
        .alias("src"),
    )


_SESSIONIZE_SQL = """
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 21600
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_id, ts, value,
               SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_idx
        FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_idx
"""


@query(
    "window_sessionize_gap",
    survey_ref="W2,W3,A1,ST3",
    doc="Batch gap-based sessionization (6h inactivity gap): the batch "
    "twin of the streaming session window, built from lag + running sum.",
    oracle=_SESSIONIZE_SQL,
)
def window_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize the event log with a 6-hour inactivity gap.

    The canonical islands construction: flag a session break where the
    gap to the previous event (lag over (user_id, ts, event_id))
    exceeds the threshold, then a running SUM of break flags numbers the
    sessions, then one group-by emits per-session aggregates.

    Scale shape: both windows and the final aggregate share the ONE
    shuffle on user_id — Spark plans a single exchange and sorts once
    (the second window and the partial agg reuse the sort order). This
    is the batch-side equivalent of ST3's session_window streaming
    operator (streaming/twins.py), useful for backfills over years of
    history where no watermark/state machinery is needed. Epoch-second
    arithmetic on BIGINT; the value sum is decimal-stabilized."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(gap_s.isNull() | (gap_s > 21600), 1).otherwise(0).alias("new_s"),
    )
    numbered = flagged.withColumn(
        "session_idx", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return numbered.groupBy("user_id", F.col("session_idx").cast("bigint").alias("session_idx")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts").alias("session_start"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("bigint")
        .alias("duration_s"),
        dsum(F.col("value"), "session_value"),
    )


_SLIDING_DISTINCT_SQL = """
    WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
        FROM events
    ),
    contrib AS (
        SELECT user_id, d + g.i * INTERVAL 1 DAY AS win_end
        FROM ud, generate_series(0, 6) g(i)
    ),
    days AS (SELECT DISTINCT d AS day FROM ud)
    SELECT days.day,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS distinct_users_7d
    FROM contrib c JOIN days ON c.win_end = days.day
    GROUP BY days.day
"""


@query(
    "window_sliding_distinct_users_7d",
    survey_ref="W3,A2,F2",
    doc="Trailing-7-day distinct users per day via explode-to-windows — "
    "exact windowed COUNT(DISTINCT), which no sliding frame can "
    "incrementally maintain.",
    oracle=_SLIDING_DISTINCT_SQL,
)
def window_sliding_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each active day D: |distinct users with an event in [D-6, D]|.

    Why not a window frame: COUNT(DISTINCT) is not subtractable — a
    RANGE BETWEEN 6 PRECEDING frame cannot retire a user leaving the
    window without re-scanning it, and Spark (correctly) rejects
    DISTINCT aggregates over frames. The scalable exact formulation is
    explode-to-windows: dedup to (user, day) FIRST (one partial-agg
    pass — this is what bounds the explode: at most one row per user
    per day, not per event), fan each row to the 7 window-ends it
    feeds, and run one distinct count per window end. Work is
    7 × |user-days|, linear in data with a constant window factor —
    the standard trade for exact sliding distincts; the approximate
    alternative (mergeable HLL per day, union over the window —
    sketch_hll_registers shows the machinery) trades exactness for the
    7× factor when windows get long."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.expr("transform(sequence(0, 6), i -> timestampadd(DAY, i, d))")
        ).alias("win_end"),
    )
    days = ud.select(F.col("d").alias("day")).distinct()
    return (
        contrib.join(days, contrib.win_end == days.day)
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("distinct_users_7d"))
    )


_INTERVAL_FRAME_SQL = """
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS value_7d
    FROM events
    WHERE user_id % 25 = 0
"""


@query(
    "window_interval_range_frame",
    survey_ref="W3,F2",
    doc="Time-interval RANGE frame: trailing-7-day running sum directly "
    "over the timestamp ordering — no day-number scaffolding.",
    oracle=_INTERVAL_FRAME_SQL,
)
def window_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN INTERVAL 7 DAYS PRECEDING over the raw timestamp:
    the frame boundary is computed per row from the ORDER BY value, so
    no derived day_no column is needed (contrast
    window_moving_avg_range, which demonstrates the numeric-offset
    form). RANGE semantics make ties (equal ts) share one frame, so no
    unique tiebreak is required for determinism; the sum is
    decimal-stabilized. One shuffle on user_id; within-partition sort
    by ts — the same single-exchange shape as every other per-user
    window here. Identical SQL text runs on both engines."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_INTERVAL_FRAME_SQL)


_USER_PATHS_SQL = """
    WITH ordered AS (
        SELECT user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events
    ),
    paths AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ordered WHERE rn <= 5
        GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths
    GROUP BY path
"""


@query(
    "window_user_paths",
    survey_ref="W1,W2,A6,A1",
    doc="Path mining: each user's first five event types as an ordered "
    "path string, counted across users — the onboarding-flow analysis.",
    oracle=_USER_PATHS_SQL,
)
def window_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path analysis: rank each user's events by (ts,
    event_id) — the unique tiebreak keeps every path deterministic —
    keep the first 5, concatenate in order, count identical paths.
    The rank-filter plans as WindowGroupLimit (map tasks keep 5 rows
    per user before the shuffle), and the ordered concatenation uses
    sort_array over (rn, type) structs so the aggregation itself stays
    order-insensitive — the ORDER is encoded in the data, not in row
    arrival, which is what makes this exact on a cluster where arrival
    order is never guaranteed. Path cardinality is bounded by
    |event_types|^5, not user count, so the final count table is small
    at any scale."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first5 = (
        ev.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )
    paths = first5.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


_FUNNEL_STEP_DAYS = 7


@query(
    "window_funnel_strict_order",
    survey_ref="W2,W3,A5,A1",
    doc="Ordered event funnel view→click→purchase per user, each step "
    "within 7 days of the previous; emits per-stage user counts and "
    "conversion rates from the previous stage and from the top.",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   MIN(ts) FILTER (WHERE event_type = 'view') AS t1
            FROM events GROUP BY user_id
        ),
        step2 AS (
            SELECT p.user_id, p.t1,
                   MIN(e.ts) FILTER (
                       WHERE e.event_type = 'click' AND e.ts > p.t1
                         AND e.ts <= p.t1 + INTERVAL {_FUNNEL_STEP_DAYS} DAY
                   ) AS t2
            FROM per_user p LEFT JOIN events e ON e.user_id = p.user_id
            GROUP BY p.user_id, p.t1
        ),
        step3 AS (
            SELECT s.user_id, s.t1, s.t2,
                   MIN(e.ts) FILTER (
                       WHERE e.event_type = 'purchase' AND e.ts > s.t2
                         AND e.ts <= s.t2 + INTERVAL {_FUNNEL_STEP_DAYS} DAY
                   ) AS t3
            FROM step2 s LEFT JOIN events e ON e.user_id = s.user_id
            GROUP BY s.user_id, s.t1, s.t2
        ),
        agg AS (
            SELECT COUNT(t1) AS n1, COUNT(t2) AS n2, COUNT(t3) AS n3
            FROM step3
        )
        SELECT 'view' AS stage, CAST(n1 AS BIGINT) AS n_users,
               round(CAST(n1 AS DOUBLE) / nullif(n1, 0), 6) AS conv_from_prev,
               round(CAST(n1 AS DOUBLE) / nullif(n1, 0), 6) AS conv_from_first
        FROM agg
        UNION ALL
        SELECT 'click', CAST(n2 AS BIGINT),
               round(CAST(n2 AS DOUBLE) / nullif(n1, 0), 6),
               round(CAST(n2 AS DOUBLE) / nullif(n1, 0), 6)
        FROM agg
        UNION ALL
        SELECT 'purchase', CAST(n3 AS BIGINT),
               round(CAST(n3 AS DOUBLE) / nullif(n2, 0), 6),
               round(CAST(n3 AS DOUBLE) / nullif(n1, 0), 6)
        FROM agg
    """,
)
def window_funnel_strict_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel — the product-analytics classic that
    needs SEQUENCE, not mere co-occurrence: a user converts at stage k
    only via an event strictly after their stage-(k-1) time and within
    _FUNNEL_STEP_DAYS of it, and each stage anchors on the EARLIEST
    qualifying event (min, not any), so a click before the first view
    never counts and re-orderings can't double-convert.

    Scale shape: ONE exchange on user_id, then three stacked whole-frame
    window aggregates — t1 = min(view ts), t2 = min(click ts in
    (t1, t1+7d]), t3 = min(purchase ts in (t2, t2+7d]) — each referencing
    the previous stage's column on the SAME partitioning, so Catalyst
    stacks three Window operators on one sort with no further shuffle
    (the oracle's LEFT JOIN + re-aggregate per stage is the relational
    spelling of the same computation for an engine without stacked
    windows). The per-user reduce then rides the existing partitioning
    (partial agg, no new exchange) and the final 3-row stage table is
    driver-free stack(). Event-time skew is per-user bounded; no
    collect_list anywhere."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    step = F.expr(f"INTERVAL {_FUNNEL_STEP_DAYS} DAY")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + step),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + step),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        staged.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3"))
    )
    agg = per_user.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    # nullif guards: Spark double 0/0 is NaN while DuckDB yields NULL —
    # an empty funnel stage must be NULL on BOTH engines (parity hazard
    # caught in the r6 self-review before the driver could)
    return agg.selectExpr(
        "stack(3, "
        "'view', CAST(n1 AS BIGINT), round(CAST(n1 AS DOUBLE)/nullif(n1, 0), 6), "
        "        round(CAST(n1 AS DOUBLE)/nullif(n1, 0), 6), "
        "'click', CAST(n2 AS BIGINT), round(CAST(n2 AS DOUBLE)/nullif(n1, 0), 6), "
        "        round(CAST(n2 AS DOUBLE)/nullif(n1, 0), 6), "
        "'purchase', CAST(n3 AS BIGINT), round(CAST(n3 AS DOUBLE)/nullif(n2, 0), 6), "
        "        round(CAST(n3 AS DOUBLE)/nullif(n1, 0), 6)"
        ") AS (stage, n_users, conv_from_prev, conv_from_first)"
    )


# ---------------------------------------------------------------------------
# Rolling correlation over a row frame — the quant/BI composite of the
# frame-spec (W3) and decimal-exact moment (A7) idioms.

_ROLLCORR_N = 15

_ROLLCORR_SQL = f"""
    SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round((n * sxy - sx * sy)
                           / (sqrt(n * sxx - sx * sx)
                              * sqrt(n * syy - sy * sy)), 6)
           END AS corr_qty_price
    FROM (
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
               CAST(COUNT(*) OVER w AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) OVER w
                    AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) OVER w
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) OVER w
                    AS DOUBLE) AS syy,
               COUNT(*) OVER w AS frame_n
        FROM lineitem
        WHERE l_suppkey % 20 = 0
        WINDOW w AS (
            PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN {_ROLLCORR_N - 1} PRECEDING AND CURRENT ROW
        )
    )
    WHERE frame_n = {_ROLLCORR_N}
"""


@query(
    "window_rolling_corr",
    survey_ref="W3,A7,F3",
    doc="Rolling 15-row Pearson correlation of quantity vs extendedprice "
    "per supplier series — frame-spec moments, decimal-exact.",
    oracle=_ROLLCORR_SQL,
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling correlation the distributed way: six frame-spec moment
    sums over ONE window pass (count, Σx, Σy, Σxy, Σx², Σy² — each
    summand rounded to decimal(28,6) pre-sum so the frame accumulation
    is order- and engine-exact), then the Pearson closed form with a
    zero-variance guard (a constant-quantity frame yields NULL, not an
    ANSI division error). Identical SQL text runs on both engines.

    Scale notes: the partition key is l_suppkey — supplier count grows
    with the corpus, so no partition is ever data-sized (the
    with_global_rank lesson: never PARTITION BY a 3-value flag for a
    data-sized window). Full frames only (frame_n = N) keeps the
    statistic well-defined; the `l_suppkey % 20` sample bounds the
    result set, and that predicate pushes into the parquet scan.

    Analytical ceiling (r7 verdict item 5, the 3.20× SCALING tail): one
    output row per full-frame input row — out = Σ_s max(0, n_s−14) —
    and per-row work is the constant 15-row frame; conservation
    recomputed in pure Python by
    tests/test_scaling_bounds.py::test_rolling_corr_row_conservation."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_ROLLCORR_SQL)


# ---------------------------------------------------------------------------
# Interval concurrency via boundary sweep — the "max concurrent sessions"
# classic, done as pure relational algebra (no self-join on overlap).

_PEAK_ORACLE = """
    WITH iv AS (
        SELECT date_trunc('day', ts) AS day, ts AS t0,
               ts + INTERVAL (CAST(floor(value) AS INT)) MINUTE AS t1
        FROM events
    ), b AS (
        SELECT day, t0 AS t, 1 AS delta FROM iv
        UNION ALL
        SELECT day, t1 AS t, -1 AS delta FROM iv
    ), run AS (
        SELECT day,
               SUM(delta) OVER (PARTITION BY day ORDER BY t, delta) AS c
        FROM b
    )
    SELECT day,
           CAST(COUNT(*) // 2 AS BIGINT) AS n_intervals,
           CAST(MAX(c) AS BIGINT) AS peak_concurrent
    FROM run
    GROUP BY day
"""


@query(
    "window_peak_concurrency",
    survey_ref="W3,U1,A1",
    doc="Peak concurrent intervals per day via a +1/-1 boundary sweep — "
    "no overlap self-join; each event holds floor(value) whole minutes.",
    oracle=_PEAK_ORACLE,
)
def window_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-concurrency the sweep-line way: every interval contributes a
    +1 boundary at its start and a -1 at its end, a per-day running sum
    walks the boundaries in time order, and the day's max is the peak.
    O(n log n) against the O(n²) overlap self-join a naive formulation
    would shuffle. Tie rule: equal timestamps order -1 before +1 (delta
    ascending), so back-to-back intervals never double-count; the
    default peer-inclusive RANGE frame makes each row's running value
    the post-tie-group count — deterministic on both engines regardless
    of physical row order within a tie. Intervals belong to their START
    day (the standard daily-report convention; the few that drain past
    midnight still sum to zero inside their partition).

    Portability note: the duration is floor(value) — an EXPLICIT floor,
    because CAST(double AS INT) truncates in Spark but banker-rounds in
    DuckDB (6.55 → 6 vs 7); any double→int conversion in an oracle-
    checked query must spell out floor/round/trunc.

    Scale: partitioned by day — the calendar bounds partition count and
    daily volume bounds partition size; finer grains (hour) need the
    two-pass offset-carry dance of functions/ranks.with_global_cumsum
    run per day, which is the documented upgrade path."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"),
        F.col("ts").alias("t0"),
        F.expr("timestampadd(MINUTE, CAST(floor(value) AS INT), ts)").alias("t1"),
    )
    b = ev.select(
        "day", F.col("t0").alias("t"), F.lit(1).alias("delta")
    ).unionByName(ev.select("day", F.col("t1").alias("t"), F.lit(-1).alias("delta")))
    w = Window.partitionBy("day").orderBy("t", "delta")
    run = b.withColumn("c", F.sum("delta").over(w))
    return run.groupBy("day").agg(
        F.expr("CAST(count(1) DIV 2 AS BIGINT)").alias("n_intervals"),
        F.max("c").cast("bigint").alias("peak_concurrent"),
    )


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over per-user event sequences.

_TRANSITIONS_ORACLE = """
    WITH seq AS (
        SELECT user_id, event_type AS etype_from,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS etype_to
        FROM events
    ), pairs AS (
        SELECT etype_from, etype_to, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE etype_to IS NOT NULL
        GROUP BY etype_from, etype_to
    )
    SELECT etype_from, etype_to, n,
           round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY etype_from), 6)
               AS p_next
    FROM pairs
"""


@query(
    "window_event_transitions",
    survey_ref="W2,A1",
    doc="First-order Markov transition matrix over per-user event "
    "sequences: counts and conditional next-event probabilities.",
    oracle=_TRANSITIONS_ORACLE,
)
def window_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence analytics: each user's events in (ts, event_id) order
    yield (current → next) bigrams via lead(); grouping the bigrams and
    normalizing within each source state gives the Markov transition
    matrix P(next | current) — the session-model / anomaly-baseline
    input. The lead window is user-partitioned (scalable — no global
    order), the bigram aggregate partial-combines map-side, and the
    normalizing window runs over the domain²-bounded transition table
    (|event_type|² rows), never the data. The order key ends in the
    unique event_id so ties are deterministic; p_next is an exact-
    BIGINT quotient rounded per the determinism contract."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("etype_from"),
        F.lead("event_type").over(w).alias("etype_to"),
    ).filter(F.col("etype_to").isNotNull())
    pairs = seq.groupBy("etype_from", "etype_to").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wnorm = Window.partitionBy("etype_from")
    return pairs.select(
        "etype_from",
        "etype_to",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wnorm), 6).alias(
            "p_next"
        ),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection — recursive on paper, pure window algebra
# via the prefix-sum identity.

_CUSUM_T = 450  # alarm when cusum exceeds T·n_days (avg excess of T units)

_CUSUM_ORACLE = f"""
    WITH daily AS (
        SELECT l_suppkey AS sk, date_trunc('day', l_shipdate) AS day,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY l_suppkey, date_trunc('day', l_shipdate)
    ), tot AS (
        SELECT sk, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(q) AS BIGINT) AS total_q
        FROM daily GROUP BY sk
    ), d AS (
        SELECT daily.sk, day, n_days, total_q, n_days * q - total_q AS dev
        FROM daily JOIN tot ON tot.sk = daily.sk
    ), p AS (
        SELECT sk, day, n_days, total_q,
               SUM(dev) OVER (PARTITION BY sk ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pf
        FROM d
    ), c AS (
        SELECT sk, day, n_days, total_q,
               pf - LEAST(MIN(pf) OVER (PARTITION BY sk ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                   AS cusum
        FROM p
    )
    SELECT sk AS l_suppkey, CAST(n_days AS BIGINT) AS n_days,
           CAST(total_q AS BIGINT) AS total_q,
           CAST(MAX(cusum) AS BIGINT) AS max_cusum,
           CAST(COUNT(*) FILTER (WHERE cusum > {_CUSUM_T} * n_days)
                AS BIGINT) AS n_alarm_days,
           MIN(CASE WHEN cusum > {_CUSUM_T} * n_days THEN day END)
               AS first_alarm_day
    FROM c
    GROUP BY sk, n_days, total_q
"""


@query(
    "window_cusum_alarm",
    survey_ref="W3,A1,F3",
    doc="CUSUM changepoint detector per supplier daily-quantity series — "
    "the recursive statistic computed as prefix-sum minus running-min, "
    "exact integer arithmetic throughout.",
    oracle=_CUSUM_ORACLE,
)
def window_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper CUSUM over each supplier's daily shipped quantity: the
    textbook statistic s_t = max(0, s_{t-1} + (x_t − k)) looks
    recursive (and un-SQL-able), but with P_t the prefix sum of
    deviations and P_0 = 0 it equals P_t − min_{i≤t} P_i — one running
    sum window and one running min window, both partitioned by series.
    The reference level k is the series' own mean; to keep everything
    in BIGINTs the deviation is scaled by n_days (dev = n_days·x_t −
    total), so cusum is n_days× the unscaled statistic and the alarm
    rule cusum > T·n_days means "average excess of T units since the
    change" — zero divisions, zero doubles, bit-identical on both
    engines. Declared output is the per-series summary (max statistic,
    alarm-day count, first alarm date).

    Scale: daily pre-aggregation collapses fact rows before any window;
    both windows and the final agg share the supplier partitioning
    (series-keyed — cardinality grows with data, never a constant-key
    window); threshold math is a map-side expression."""
    li = load(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_suppkey").alias("sk"),
        F.date_trunc("day", "l_shipdate").alias("day"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"))
    # per-series totals as FULL-FRAME windows over the same sk
    # partitioning the running windows need — one exchange serves the
    # totals, both running windows, and (via partitioning reuse) the
    # final aggregate; a groupBy+join formulation would scan and
    # aggregate the dailies twice
    wall = Window.partitionBy("sk").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = daily.select(
        "sk",
        "day",
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n_days"),
        F.sum("q").over(wall).cast("bigint").alias("total_q"),
        "q",
    ).withColumn("dev", F.col("n_days") * F.col("q") - F.col("total_q"))
    wrun = (
        Window.partitionBy("sk")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = d.withColumn("pf", F.sum("dev").over(wrun))
    c = p.withColumn(
        "cusum", F.col("pf") - F.least(F.min("pf").over(wrun), F.lit(0))
    )
    alarm = F.col("cusum") > _CUSUM_T * F.col("n_days")
    # group by sk alone (n_days/total_q are functionally dependent —
    # max() recovers them) so the final aggregate reuses the window's
    # hashpartitioning(sk) instead of re-exchanging on a 3-column key
    return c.groupBy(F.col("sk").alias("l_suppkey")).agg(
        F.max("n_days").cast("bigint").alias("n_days"),
        F.max("total_q").cast("bigint").alias("total_q"),
        F.max("cusum").cast("bigint").alias("max_cusum"),
        F.count_if(alarm).cast("bigint").alias("n_alarm_days"),
        F.min(F.when(alarm, F.col("day"))).alias("first_alarm_day"),
    )


# ---------------------------------------------------------------------------
# Funnel time-to-convert — the latency distribution behind the counts.

_FUNNEL_TTC_ORACLE = f"""
    WITH per_user AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'view') AS t1
        FROM events GROUP BY user_id
    ),
    step2 AS (
        SELECT p.user_id, p.t1,
               MIN(e.ts) FILTER (
                   WHERE e.event_type = 'click' AND e.ts > p.t1
                     AND e.ts <= p.t1 + INTERVAL {{d}} DAY
               ) AS t2
        FROM per_user p LEFT JOIN events e ON e.user_id = p.user_id
        GROUP BY p.user_id, p.t1
    ),
    step3 AS (
        SELECT s.user_id, s.t1, s.t2,
               MIN(e.ts) FILTER (
                   WHERE e.event_type = 'purchase' AND e.ts > s.t2
                     AND e.ts <= s.t2 + INTERVAL {{d}} DAY
               ) AS t3
        FROM step2 s LEFT JOIN events e ON e.user_id = s.user_id
        GROUP BY s.user_id, s.t1, s.t2
    ),
    gaps AS (
        SELECT 'view_to_click' AS transition,
               CAST(date_diff({{u}}, t1, t2) AS BIGINT) AS gap_s
        FROM step3 WHERE t2 IS NOT NULL
        UNION ALL
        SELECT 'click_to_purchase',
               CAST(date_diff({{u}}, t2, t3) AS BIGINT)
        FROM step3 WHERE t3 IS NOT NULL
    )
    SELECT transition,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(MIN(gap_s) AS BIGINT) AS min_s,
           round(CAST(quantile_cont(gap_s, 0.5) AS DOUBLE), 4) AS p50_s,
           round(CAST(quantile_cont(gap_s, 0.9) AS DOUBLE), 4) AS p90_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_s,
           round(CAST(SUM(gap_s) AS DOUBLE) / COUNT(*), 6) AS mean_s
    FROM gaps
    GROUP BY transition
"""


@query(
    "window_funnel_time_to_convert",
    survey_ref="W2,A7,F2",
    doc="Funnel latency distribution: seconds between consecutive "
    "completed funnel stages (view→click, click→purchase) — min/p50/"
    "p90/max/mean per transition.",
    oracle=_FUNNEL_TTC_ORACLE.replace("{d}", str(_FUNNEL_STEP_DAYS)).replace(
        "{u}", "'second'"
    ),
)
def window_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other half of the funnel report: not HOW MANY convert
    (window_funnel_strict_order) but HOW FAST — the latency
    distribution of each completed stage transition, on the identical
    strictly-ordered re-anchored stage timestamps (earliest qualifying
    event after the previous stage, 7-day step window), so the two
    queries describe the same cohort. Gaps are exact integer seconds;
    the percentiles are the engines' shared linear interpolation,
    rounded per contract.

    Scale: same shape as the funnel — per-user anchors from one
    user-keyed aggregate, each step one user-keyed join+aggregate
    (exchange reused across steps), and the final stats run over the
    converted-user-sized gap table grouped into TWO rows."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1")
    )
    e2 = ev.select(F.col("user_id").alias("u2"), "event_type", "ts")
    step2 = (
        per_user.join(e2, per_user.user_id == e2.u2, "left")
        .groupBy("user_id", "t1")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1"))
                    & (
                        F.col("ts")
                        <= F.expr(f"t1 + INTERVAL {_FUNNEL_STEP_DAYS} DAY")
                    ),
                    F.col("ts"),
                )
            ).alias("t2")
        )
    )
    step3 = (
        step2.join(e2, step2.user_id == e2.u2, "left")
        .groupBy("user_id", "t1", "t2")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2"))
                    & (
                        F.col("ts")
                        <= F.expr(f"t2 + INTERVAL {_FUNNEL_STEP_DAYS} DAY")
                    ),
                    F.col("ts"),
                )
            ).alias("t3")
        )
    )
    g12 = step3.filter(F.col("t2").isNotNull()).select(
        F.lit("view_to_click").alias("transition"),
        (F.unix_timestamp("t2") - F.unix_timestamp("t1")).alias("gap_s"),
    )
    g23 = step3.filter(F.col("t3").isNotNull()).select(
        F.lit("click_to_purchase").alias("transition"),
        (F.unix_timestamp("t3") - F.unix_timestamp("t2")).alias("gap_s"),
    )
    gaps = g12.unionByName(g23)
    return gaps.groupBy("transition").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.min("gap_s").cast("bigint").alias("min_s"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 4).alias("p50_s"),
        F.round(F.percentile("gap_s", F.lit(0.9)), 4).alias("p90_s"),
        F.max("gap_s").cast("bigint").alias("max_s"),
        F.round(F.sum("gap_s").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_s"
        ),
    )

"""Batch twins of the streaming operators (SURVEY.md §2.10: ST1–ST7).

Each Structured Streaming job in streaming/jobs.py has a batch-mode twin
declared here so the DuckDB oracle can check the *semantics* (bucket
boundaries, session gaps, dedup keeps, join results); the streaming
runners themselves are exercised by tests/test_streaming.py, which asserts
stream output == batch twin on the same input.

Window-boundary parity notes:
  * Spark ``window('ts', '1 hour')`` buckets are epoch-aligned [start,end)
    — identical to DuckDB ``date_trunc('hour', ts)``.
  * Sliding windows (1h every 15min): each event belongs to exactly 4
    windows whose starts are time_bucket(15min, ts) - {0,15,30,45}min —
    both engines epoch-align, verified by the parity gate.
  * Session windows: Spark merges an event into a session iff
    ts < prev_end (= prev_ts + gap); equivalently a NEW session starts iff
    µs(ts) - µs(prev_ts) >= gap. The twin implements exactly that with
    lag + cumulative sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.functions.numeric import dsum, sql_dsum
from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load

SESSION_GAP_MIN = 30


def tumbling_hourly(events: DataFrame) -> DataFrame:
    """ST1 logic, shared by the batch twin and the streaming runner."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_tumbling_hourly_twin",
    survey_ref="ST1,A1",
    oracle=f"""
        SELECT
            date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
            event_type,
            COUNT(*) AS n_events,
            {sql_dsum('value', 'sum_value')}
        FROM events
        GROUP BY 1, 2
    """,
)
def stream_tumbling_hourly_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_hourly(load(spark, sf_dir, "events"))


def sliding_hourly(events: DataFrame) -> DataFrame:
    """ST2 logic: 1-hour windows sliding every 15 minutes."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding_quarter_twin",
    survey_ref="ST2",
    oracle=f"""
        WITH slid AS (
            SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
                       - offs.o * INTERVAL 15 MINUTE AS window_start,
                   event_type, value
            FROM events
            CROSS JOIN (VALUES (0), (1), (2), (3)) AS offs(o)
        )
        SELECT window_start, event_type,
               COUNT(*) AS n_events,
               {sql_dsum('value', 'sum_value')}
        FROM slid
        GROUP BY 1, 2
    """,
)
def stream_sliding_quarter_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_hourly(load(spark, sf_dir, "events"))


def session_windows(events: DataFrame) -> DataFrame:
    """ST3 logic: per-user session windows with a 30-minute gap."""
    return (
        events.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_session_window_twin",
    survey_ref="ST3,W2",
    oracle=f"""
        WITH e AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        ),
        marked AS (
            SELECT *,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                >= {SESSION_GAP_MIN} * 60 * 1000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT *, SUM(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS sess_id
            FROM marked
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
               COUNT(*) AS n_events,
               {sql_dsum('value', 'sum_value')}
        FROM sess
        GROUP BY user_id, sess_id
    """,
)
def stream_session_window_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(load(spark, sf_dir, "events"))


def dedup_first_event(events: DataFrame) -> DataFrame:
    """ST5 batch semantics: earliest event per (user_id, event_type),
    deterministic tie-break on event_id (dropDuplicates keeps an arbitrary
    row — never acceptable in a reproducible pipeline)."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@query(
    "stream_dedup_twin",
    survey_ref="ST5,P5",
    oracle="""
        SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id, event_type
            ORDER BY CAST(ts AS TIMESTAMP), event_id
        ) = 1
    """,
)
def stream_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_first_event(load(spark, sf_dir, "events"))


def stateful_runmax_final(events: DataFrame) -> DataFrame:
    """ST6 batch semantics: the FINAL state of the running-max stateful op
    (jobs.run_stateful_running_max) per user — max event value + event
    count. max/count are order-independent, so the twin is an exact oracle
    for the state the stream converges to regardless of micro-batching."""
    return events.groupBy("user_id").agg(
        F.max("value").alias("max_value"), F.count(F.lit(1)).alias("n_events")
    )


@query(
    "stream_stateful_runmax_twin",
    survey_ref="ST6,A1",
    doc="Batch twin of the applyInPandasWithState running-max (final state).",
    oracle="""
        SELECT user_id, max(value) AS max_value, COUNT(*) AS n_events
        FROM events
        GROUP BY user_id
    """,
)
def stream_stateful_runmax_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stateful_runmax_final(load(spark, sf_dir, "events"))


def enrich_with_customer(events: DataFrame, customer: DataFrame) -> DataFrame:
    """ST7 logic: stream-static dimension join (static side broadcasts)."""
    return (
        events.join(F.broadcast(customer), events.user_id == customer.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
    )


@query(
    "stream_static_join_twin",
    survey_ref="ST7,J1,J4",
    oracle=f"""
        SELECT c_mktsegment, event_type,
               COUNT(*) AS n_events,
               {sql_dsum('value', 'sum_value')}
        FROM events
        JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment, event_type
    """,
)
def stream_static_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enrich_with_customer(
        load(spark, sf_dir, "events"), load(spark, sf_dir, "customer")
    )


def click_purchase_pairs(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """ST8 logic (stream-stream interval join), shared by the batch twin
    and the streaming runner: every (click, purchase) pair of the same
    user where the purchase lands within 30 minutes of the click. The
    interval bound is what makes this runnable as a stream-stream join —
    it lets the engine evict click state once the watermark passes
    click.ts + 30min."""
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            "click_ts",
            "purchase_ts",
            (
                F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
            ).alias("lag_us"),
        )
    )


@query(
    "stream_stream_join_twin",
    survey_ref="ST8,J5,W2",
    doc="Batch twin of the watermarked stream-stream interval join (click→purchase).",
    oracle="""
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               CAST(c.ts AS TIMESTAMP) AS click_ts,
               CAST(p.ts AS TIMESTAMP) AS purchase_ts,
               epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP))
                   AS lag_us
        FROM events c
        JOIN events p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts
         AND p.ts < c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_stream_join_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch semantics of the stream-stream join: both sides are the same
    events table filtered by type; the equi-key (user_id) plus the time
    interval is exactly what Structured Streaming's symmetric hash join
    keeps state for. At 100 TB the equi-key shuffles both sides once and
    the interval predicate bounds state — no unbounded buffering."""
    ev = load(spark, sf_dir, "events")
    return click_purchase_pairs(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )


def chained_daily_peak(events: DataFrame) -> DataFrame:
    """ST9 logic (chained time-window aggregation, Spark 3.4+): hourly
    event counts per type, then per (day, type) the PEAK hourly count —
    shared by the batch twin and the streaming runner. The second groupBy
    windows over the first's ``window`` struct column, which is what makes
    the chained-aggregation streaming plan legal (event-time lineage is
    preserved through the struct)."""
    hourly = events.groupBy(
        F.window("ts", "1 hour").alias("hw"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        hourly.groupBy(F.window("hw", "1 day").alias("dw"), "event_type")
        .agg(
            F.max("n_events").alias("peak_hourly_events"),
            F.count(F.lit(1)).alias("n_active_hours"),
        )
        .select(
            F.col("dw.start").alias("day_start"),
            "event_type",
            "peak_hourly_events",
            "n_active_hours",
        )
    )


@query(
    "stream_chained_window_twin",
    survey_ref="ST9,A1,W4",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
                   event_type,
                   COUNT(*) AS n_events
            FROM events
            GROUP BY 1, 2
        )
        SELECT date_trunc('day', h) AS day_start,
               event_type,
               CAST(MAX(n_events) AS BIGINT) AS peak_hourly_events,
               COUNT(*) AS n_active_hours
        FROM hourly
        GROUP BY 1, 2
    """,
)
def stream_chained_window_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST9 batch twin: two-level time aggregation (hourly → daily peak).
    In streaming this is the CHAINED windowed aggregation Spark supports
    from 3.4: the second agg consumes the first's window column and the
    watermark propagates through both stateful stages; the run itself is
    checked by tests/test_streaming.py against this twin. Both levels
    partial-aggregate map-side; state per stage is bounded by (buckets ×
    types), never raw events."""
    return chained_daily_peak(load(spark, sf_dir, "events"))


def countmin_user_grid(events: DataFrame) -> DataFrame:
    """ST-sketch logic: 4×256 Count-Min grid of per-user event counts.

    The streaming-native sketch build: no pre-collapse groupBy (a stream
    cannot wait for "all of a user's events"), each event folds its 4
    cells directly into the grid aggregation — the running state IS the
    sketch, bounded at 1,024 cells regardless of user cardinality or
    stream length, and two grids (two streams, or stream + backfill
    batch) merge by cell-wise addition."""
    seeded = events.select(
        F.explode(F.array(*[F.lit(t) for t in range(4)])).alias("t"), "user_id"
    ).withColumn(
        "bucket",
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(t AS STRING), ':',"
            " CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % 256"
        ),
    )
    return seeded.groupBy("t", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cell")
    )


@query(
    "stream_countmin_grid_twin",
    survey_ref="ST1,A3,F7",
    doc="Count-Min sketch maintained AS the streaming aggregation state: "
    "batch twin of the 4×256 per-user-event-count grid.",
    oracle="""
        SELECT t,
               CAST(('0x' || substring(md5(CAST(t AS VARCHAR) || ':' ||
                    CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 256
                   AS bucket,
               COUNT(*) AS cell
        FROM events, (VALUES (0), (1), (2), (3)) s(t)
        GROUP BY 1, 2
    """,
)
def stream_countmin_grid_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return countmin_user_grid(load(spark, sf_dir, "events"))


def hourly_type_counts(events: DataFrame) -> DataFrame:
    """ST10 stage 1 (streamable): plain tumbling hourly counts per type."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events")
    )


def topk_types_per_hour(counts: DataFrame, k: int = 3) -> DataFrame:
    """ST10 stage 2 (sink-side): rank each hour's types, keep the top k.

    Ranking needs the hour to be complete, so in streaming it runs OVER
    THE SINK TABLE (or a foreachBatch), not as a third stateful operator
    — the standard "aggregate in the stream, rank at the edge" split.
    row_number with an event_type tiebreak keeps the result total."""
    w = Window.partitionBy("hour_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("hour_start", "event_type", "n_events", F.col("rnk").cast("int").alias("rnk"))
    )


@query(
    "stream_hourly_topk_twin",
    survey_ref="ST1,W4,O3",
    doc="Top-3 event types per hour: streamable hourly counts + sink-side "
    "ranking (ST10 — windowed top-k, beyond §2.10).",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT hour_start, event_type, n_events, CAST(rnk AS INT) AS rnk
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY hour_start ORDER BY n_events DESC, event_type
            ) AS rnk
            FROM hourly
        )
        WHERE rnk <= 3
    """,
)
def stream_hourly_topk_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the windowed top-k stream. The stateful half
    (hourly_type_counts) is exactly what the streaming runner executes;
    the rank is applied to the completed window table on both paths, so
    runner output == twin output row-for-row
    (tests/test_streaming.py::test_hourly_topk_stream_equals_twin).
    Scale: per-hour state is |event_types| rows; the rank is a
    WindowGroupLimit over the already-tiny aggregate table."""
    return topk_types_per_hour(
        hourly_type_counts(load(spark, sf_dir, "events"))
    )


# ----------------------- r13: watermark late-drop semantics (ST4) twin

#: Deterministic micro-batch fixture for the ST4 watermark twin: events
#: "arrive" mostly in event-time order with a small per-event jitter,
#: except every STRAGGLER_EVERY-th event is a multi-day straggler — the
#: production late-data shape (bulk in-order ingest + rare stragglers
#: from a delayed upstream partition). Arrival order is cut into
#: contiguous micro-batches by ntile. Registered-twin defaults:
WM_BATCHES = 6
WM_DELAY_MIN = 120
WM_STRAGGLER_EVERY = 50
WM_STRAGGLER_MIN = 10080  # 7 days
WM_JITTER_MOD = 240


def _wm_arrival_expr(
    straggler_every: int, straggler_min: int, jitter_mod: int
) -> str:
    """Arrival-time expression, shared verbatim between the twin's
    batcher and the streaming runner's batch writer."""
    return (
        f"timestampadd(MINUTE, CAST(CASE WHEN event_id % {straggler_every}"
        f" = 0 THEN {straggler_min} ELSE 0 END + event_id % {jitter_mod}"
        " AS INT), ts)"
    )


def watermark_batched(
    events: DataFrame,
    *,
    batches: int = WM_BATCHES,
    straggler_every: int = WM_STRAGGLER_EVERY,
    straggler_min: int = WM_STRAGGLER_MIN,
    jitter_mod: int = WM_JITTER_MOD,
) -> DataFrame:
    """(event_id, ts, value, arrival_ts, batch_id): the deterministic
    arrival log. The global ntile is FIXTURE plumbing — it simulates the
    ingest layer's file sequence, which production gets for free from
    the object-store listing; nothing here runs against corpus-scale
    data (the twin's per-batch stats reduce to ``batches`` rows)."""
    if batches < 3:
        raise ValueError(
            f"watermark_batched: need batches >= 3 for the one-batch "
            f"propagation lag to ever take effect, got {batches}"
        )
    if straggler_every < 1 or jitter_mod < 1 or straggler_min < 0:
        raise ValueError(
            "watermark_batched: straggler_every/jitter_mod must be >= 1 "
            f"and straggler_min >= 0, got ({straggler_every}, "
            f"{jitter_mod}, {straggler_min})"
        )
    order = Window.orderBy("arrival_ts", "event_id")
    return (
        events.select("event_id", "ts", "value")
        .withColumn(
            "arrival_ts",
            F.expr(_wm_arrival_expr(straggler_every, straggler_min, jitter_mod)),
        )
        .withColumn("batch_id", F.ntile(batches).over(order))
    )


def watermark_replay(
    events: DataFrame,
    *,
    batches: int = WM_BATCHES,
    delay_min: int = WM_DELAY_MIN,
    straggler_every: int = WM_STRAGGLER_EVERY,
    straggler_min: int = WM_STRAGGLER_MIN,
    jitter_mod: int = WM_JITTER_MOD,
) -> DataFrame:
    """PRODUCTION entry — Structured Streaming's watermark semantics as
    a BATCH replay of the deterministic arrival log (ST4, r13): exactly
    what a `withWatermark(ts, delay) + tumbling-hour agg + APPEND sink`
    stream emits over these micro-batches on this 4.1.2 build. Encodes
    (and tests/test_streaming.py verifies against a REAL
    maxFilesPerTrigger=1 run, at the registered dials AND at the
    library router's non-default dials):
      * per-batch event-time stats M_i = max(ts), floored to
        MILLISECONDS (Spark tracks event-time stats in ms);
      * ONE-BATCH propagation lag — the watermark filtering batch N is
        max(M_1..M_{N-2}) - delay;
      * late-row drop iff the row's hour-window END <= that batch's
        watermark;
      * availableNow's final no-data batch emits exactly the windows
        whose end <= max(M_1..M_K) - delay; later windows stay open.

    Scale shape: one groupBy to ``batches`` stats rows, a broadcast of
    those rows back onto the events, one filter, one hash aggregate —
    a single-pass shape at any corpus size (the arrival-log ntile is
    fixture plumbing; production reads arrival order off the ingest
    file sequence)."""
    if delay_min < 0:
        raise ValueError(f"watermark_replay: need delay_min >= 0, got {delay_min}")
    delay_ms = delay_min * 60 * 1000
    ev = watermark_batched(
        events,
        batches=batches,
        straggler_every=straggler_every,
        straggler_min=straggler_min,
        jitter_mod=jitter_mod,
    )
    stats = ev.groupBy("batch_id").agg(F.max("ts").alias("m"))
    orderb = Window.orderBy("batch_id")
    runs = stats.withColumn(
        "runmax",
        F.max("m").over(orderb.rowsBetween(Window.unboundedPreceding, 0)),
    )
    wm = runs.withColumn(
        "wm_us",
        (
            F.floor(F.unix_micros(F.lag("runmax", 2).over(orderb)) / 1000)
            - F.lit(delay_ms)
        )
        * 1000,
    ).select("batch_id", "wm_us")
    fw = stats.agg(
        (
            (F.floor(F.unix_micros(F.max("m")) / 1000) - F.lit(delay_ms)) * 1000
        ).alias("fw_us")
    )
    win_start = F.date_trunc("hour", F.col("ts"))
    tagged = (
        ev.join(F.broadcast(wm), "batch_id")
        .withColumn("window_start", win_start)
        .withColumn("wend_us", F.unix_micros(win_start) + F.lit(3_600_000_000))
    )
    kept = tagged.filter(
        F.col("wm_us").isNull() | (F.col("wend_us") > F.col("wm_us"))
    )
    return (
        kept.groupBy("window_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
            F.max("wend_us").alias("wend_us"),
        )
        .crossJoin(F.broadcast(fw))
        .filter(F.col("wend_us") <= F.col("fw_us"))
        .select("window_start", "n_events", "sum_value")
    )


def _wm_replay_sql(
    batches: int,
    delay_min: int,
    straggler_every: int,
    straggler_min: int,
    jitter_mod: int,
) -> str:
    """DuckDB oracle for :func:`watermark_replay` at the given dials —
    one shared builder so the registered twin and the library router
    check the SAME semantics at different parameters (the _nb_ctes
    precedent)."""
    delay_ms = delay_min * 60 * 1000
    return f"""
        WITH batched AS (
            SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   ntile({batches}) OVER (
                       ORDER BY CAST(ts AS TIMESTAMP)
                                + INTERVAL ((CASE WHEN event_id % {straggler_every} = 0
                                             THEN {straggler_min} ELSE 0 END
                                             + event_id % {jitter_mod})) MINUTE,
                                event_id
                   ) AS batch_id
            FROM events
        ), stats AS (
            SELECT batch_id, max(ts) AS m FROM batched GROUP BY batch_id
        ), runs AS (
            SELECT batch_id,
                   max(m) OVER (ORDER BY batch_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS runmax
            FROM stats
        ), wm AS (
            SELECT batch_id,
                   (epoch_us(lag(runmax, 2) OVER (ORDER BY batch_id))
                    // 1000 - {delay_ms}) * 1000 AS wm_us
            FROM runs
        ), final_wm AS (
            SELECT (epoch_us(max(m)) // 1000 - {delay_ms}) * 1000 AS fw_us
            FROM stats
        ), kept AS (
            SELECT b.value,
                   date_trunc('hour', b.ts) AS window_start,
                   epoch_us(date_trunc('hour', b.ts)) + 3600000000 AS wend_us
            FROM batched b JOIN wm w USING (batch_id)
            WHERE w.wm_us IS NULL OR
                  epoch_us(date_trunc('hour', b.ts)) + 3600000000 > w.wm_us
        )
        SELECT window_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {sql_dsum('value', 'sum_value')}
        FROM kept
        GROUP BY window_start
        HAVING max(wend_us) <= (SELECT fw_us FROM final_wm)
    """


@query(
    "stream_watermark_close_twin",
    survey_ref="ST4,ST1,A1",
    doc="ST4 watermark semantics as a BATCH query: deterministic "
    "micro-batch arrival log, per-batch max-event-time stats, the "
    "one-batch-lag watermark (verified on 4.1.2), late-row drop, and "
    "append-mode emission of closed windows only — proven row-identical "
    "to a real maxFilesPerTrigger=1 streaming run by "
    "tests/test_streaming.py.",
    oracle=_wm_replay_sql(
        WM_BATCHES, WM_DELAY_MIN, WM_STRAGGLER_EVERY, WM_STRAGGLER_MIN,
        WM_JITTER_MOD,
    ),
)
def stream_watermark_close_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 at the registered dials — one :func:`watermark_replay` call
    (6 batches, 120-min delay, every-50th-event 7-day stragglers,
    240-min jitter). Non-vacuous at both gate SFs: 6/1000 rows dropped
    and 3 windows withheld at sf0.001; 51/10000 and 3 at sf0.01."""
    return watermark_replay(load(spark, sf_dir, "events"))


@query(
    "stream_watermark_library_replay",
    survey_ref="ST4,ST1,A1",
    doc="watermark_replay routed at NON-DEFAULT dials (9 batches, "
    "45-min delay, every-37th-event 9-day stragglers, 180-min jitter) "
    "— the oracle checks the parameter plumbing end to end; the same "
    "dials also run through the REAL stream in tests/test_streaming.py.",
    oracle=_wm_replay_sql(9, 45, 37, 12960, 180),
)
def stream_watermark_library_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ST4 library router (r13; the r10 MMR-lambda precedent): ONE
    production :func:`watermark_replay` call at dials the registered
    twin does not use — a faster 45-min watermark over 9 micro-batches
    with more frequent (every 37th) and later (9-day) stragglers — so
    the driver's hash attests the dial plumbing (batch count, delay
    arithmetic, straggler/jitter arrival shape), not just the default
    path. Non-vacuous at both gate SFs: 22/1000 dropped, 2 withheld at
    sf0.001; 212/10000 dropped, 1 withheld at sf0.01."""
    return watermark_replay(
        load(spark, sf_dir, "events"),
        batches=9,
        delay_min=45,
        straggler_every=37,
        straggler_min=12960,
        jitter_mod=180,
    )

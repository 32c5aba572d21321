"""Streaming semantics tests: (1) every streaming runner's output equals
its declared batch twin on the same input; (2) watermark late-data drop
behavior on a crafted two-batch file sequence (the one thing no batch twin
can express).
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark_for_ebook_classification_spark.sources.io import load
from pyspark_for_ebook_classification_spark.streaming import jobs, twins
from tests.compare import assert_frames_match


@pytest.mark.parametrize(
    "runner,twin",
    [
        (jobs.run_tumbling_stream, twins.stream_tumbling_hourly_twin),
        (jobs.run_sliding_stream, twins.stream_sliding_quarter_twin),
        (jobs.run_session_stream, twins.stream_session_window_twin),
        (jobs.run_stream_static_join, twins.stream_static_join_twin),
        (jobs.run_stream_stream_join, twins.stream_stream_join_twin),
    ],
    ids=["tumbling", "sliding", "session", "static_join", "stream_stream_join"],
)
def test_stream_equals_batch_twin(runner, twin, spark, sf_dir):
    stream_pdf = runner(spark, sf_dir).toPandas()
    batch_pdf = twin(spark, sf_dir).toPandas()
    assert_frames_match(stream_pdf, batch_pdf, runner.__name__)


def test_stream_stream_join_runner_at_oracle_scale(spark, sf_dir):
    """ST8 at the driver's oracle scale (sf0.01, 10× the default test sf):
    the stream-stream interval join's state handling must not diverge when
    batches carry 10× the keys — runner output equals the batch twin.
    The sf0.01 dir is resolved as a SIBLING of the fixture's sf dir so the
    test follows the testdata root wherever it lives (a hardcoded absolute
    path would silently skip on any other layout)."""
    sf01 = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    if not os.path.isdir(sf01):
        pytest.skip("sf0.01 testdata not present")
    stream_pdf = jobs.run_stream_stream_join(spark, sf01).toPandas()
    batch_pdf = twins.stream_stream_join_twin(spark, sf01).toPandas()
    assert_frames_match(stream_pdf, batch_pdf, "run_stream_stream_join@sf0.01")


def test_dedup_by_id_stream_row_count(spark, sf_dir):
    """ST5 primitive: id-keyed dropDuplicatesWithinWatermark keeps exactly
    one row per distinct event_id."""
    out = jobs.run_dedup_by_id_stream(spark, sf_dir)
    n_distinct = load(spark, sf_dir, "events").select("event_id").distinct().count()
    assert out.count() == n_distinct


def test_dedup_stream_equals_twin(spark, sf_dir):
    """ST5: streaming keep-earliest dedup converges to the batch twin —
    the last update-mode emission per (user_id, event_type) is the same
    (event_id, ts) row stream_dedup_twin keeps."""
    out = jobs.run_dedup_stream(spark, sf_dir).toPandas()
    batch = twins.stream_dedup_twin(spark, sf_dir).toPandas()
    final = out.groupby(["user_id", "event_type"]).tail(1)
    merged = final.merge(batch, on=["user_id", "event_type"], suffixes=("_s", "_b"))
    assert len(merged) == len(batch) == len(final)
    assert (merged["event_id_s"] == merged["event_id_b"]).all()
    assert (merged["ts_s"] == merged["ts_b"]).all()


def test_stateful_running_max(spark, sf_dir):
    out = jobs.run_stateful_running_max(spark, sf_dir).toPandas()

    batch = twins.stateful_runmax_final(load(spark, sf_dir, "events")).toPandas()
    # update-mode sink may emit several rows per user; the LAST per user is final
    final = out.groupby("user_id").tail(1)
    merged = final.merge(batch, on="user_id", suffixes=("_s", "_b"))
    assert len(merged) == len(batch)
    assert (merged["max_value_s"] == merged["max_value_b"]).all()
    assert (merged["n_events_s"] == merged["n_events_b"]).all()


def test_tws_event_counts_matches_batch(spark, sf_dir):
    """ST6 (transformWithStateInPandas): final per-key state equals the
    batch groupBy counts/sums. The API's state-server protocol requires
    google.protobuf, which this container lacks — skip there; the runner
    itself is environment-gated the same way."""
    pytest.importorskip("google.protobuf")

    out = jobs.run_tws_event_counts(spark, sf_dir).toPandas()
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .toPandas()
    )
    final = out.groupby(["user_id", "event_type"]).tail(1)
    merged = final.merge(batch, on=["user_id", "event_type"], suffixes=("_s", "_b"))
    assert len(merged) == len(batch) == len(final)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (abs(merged["sum_value_s"] - merged["sum_value_b"]) < 1e-6).all()


def test_foreachbatch_sink_writes_epochs(spark, sf_dir, tmp_path):
    """ST sink depth: foreachBatch — the custom/exactly-once sink hook —
    writes each micro-batch as a parquet epoch; union of epochs == input."""
    out = tmp_path / "epochs"
    epochs = []

    def write_epoch(batch_df, epoch_id: int):
        epochs.append(epoch_id)
        batch_df.write.mode("overwrite").parquet(str(out / f"epoch={epoch_id}"))

    ev = jobs.events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    q = ev.writeStream.foreachBatch(write_epoch).trigger(availableNow=True).start()
    q.awaitTermination()
    assert epochs, "no micro-batches ran"
    back = spark.read.parquet(str(out / "epoch=*"))
    assert back.count() == load(spark, sf_dir, "events").count()


def test_watermark_drops_late_rows(spark, tmp_path):
    """ST4: a row older than the advanced watermark must be dropped.

    Note Spark's watermark propagation lag: the watermark filtering batch
    N's input derives from event-time stats of earlier batches and becomes
    effective one batch later (verified empirically on 4.1.2). Hence the
    filler batches between the watermark-advancing event (12:00) and the
    late row (10:06): by the time the late row arrives, the effective
    watermark is 11:50, its [10:00, 11:00) window is closed, and it must
    NOT be merged in.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    src = tmp_path / "stream_src"
    src.mkdir()
    pa_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),  # us: ns would trip nanosAsLong handling
            ("user_id", pa.int64()),
            ("value", pa.float64()),
        ]
    )
    seq = [0]

    def write_file(timestamps):
        seq[0] += 1
        pdf = pd.DataFrame(
            {
                "event_id": list(range(len(timestamps))),
                "ts": pd.to_datetime(timestamps),
                "user_id": [1] * len(timestamps),
                "value": [1.0] * len(timestamps),
            }
        )
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=pa_schema), str(src / f"b{seq[0]}.parquet")
        )
        time.sleep(1.1)  # distinct mod-times -> deterministic batch order

    write_file(["2024-01-01 10:05:00", "2024-01-01 10:20:00"])  # on time
    write_file(["2024-01-01 12:00:00"])  # advances watermark to 11:50
    write_file(["2024-01-01 12:10:00"])  # filler: watermark becomes effective
    write_file(["2024-01-01 10:06:00", "2024-01-01 14:00:00"])  # LATE + on-time
    write_file(["2024-01-01 14:10:00"])  # filler: evict + emit closed windows

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["window_start"].isoformat(): r["n"] for r in spark.table("wm_sink").collect()
    }
    # the [10:00, 11:00) window closed with ONLY the 2 on-time rows — the
    # late 10:06 row was dropped, not merged; [12:00, 13:00) closed with 2.
    assert got.get("2024-01-01T10:00:00") == 2, got
    assert got.get("2024-01-01T12:00:00") == 2, got


def test_chained_window_stream_matches_closed_days(spark, sf_dir):
    """ST9: hourly→daily chained aggregation inside one streaming query.
    Append mode only emits windows the watermark has closed, so the final
    (still-open) day is withheld — the twin restricted to days before the
    twin's own max day must match the stream output exactly."""
    stream_pdf = jobs.run_chained_window_stream(spark, sf_dir).toPandas()
    batch_pdf = twins.stream_chained_window_twin(spark, sf_dir).toPandas()
    last_day = batch_pdf["day_start"].max()
    closed = batch_pdf[batch_pdf["day_start"] < last_day].reset_index(drop=True)
    assert_frames_match(stream_pdf, closed, "chained_window_closed_days")
    # and the only difference is that withheld last day
    assert set(batch_pdf["day_start"]) - set(stream_pdf["day_start"]) == {last_day}


def test_python_stream_source_replays_exactly(spark):
    """Custom streaming Python Data Source (streaming/pysource.py): the
    finite synthetic stream must deliver every offset-range row exactly
    once across micro-batches — the at-least-once + replay-determinism
    contract a checkpointed 100 TB ingest needs."""
    import uuid

    from pyspark_for_ebook_classification_spark.streaming.pysource import (
        register,
        synth_row,
    )

    register(spark)
    src = (
        spark.readStream.format("synth_stream")
        .option("rows", 500)
        .option("batch", 100)
        .load()
    )
    name = "sink_" + uuid.uuid4().hex[:8]
    q = src.writeStream.outputMode("append").format("memory").queryName(name).start()
    deadline = time.time() + 120
    while time.time() < deadline and spark.table(name).count() < 500:
        time.sleep(0.5)
    q.stop()
    rows = sorted(tuple(r) for r in spark.table(name).collect())
    assert rows == sorted(synth_row(i) for i in range(500))


def test_python_stream_source_checkpoint_resume(spark, tmp_path):
    """Checkpointed restart through the fault-tolerant FILE sink: stop the
    finite synth stream mid-flight, start a NEW query on the SAME
    checkpoint + output dir — it must resume from the committed offset
    and the final output must be EXACTLY-ONCE: all 500 rows, no
    duplicates (file-sink commits are transactional with the offset log
    via _spark_metadata)."""
    from pyspark_for_ebook_classification_spark.streaming.pysource import (
        register,
        synth_row,
    )

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(stop_at):
        src = (
            spark.readStream.format("synth_stream")
            .option("rows", 500)
            .option("batch", 50)
            .load()
        )
        q = (
            src.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= stop_at:
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.25)
        q.stop()

    run(stop_at=100)  # crash partway (≥2 of 10 batches committed)
    n_first = spark.read.parquet(out).count()
    assert 100 <= n_first < 500

    run(stop_at=500)  # resume from the SAME checkpoint
    final = [r["id"] for r in spark.read.parquet(out).collect()]
    assert sorted(final) == [synth_row(i)[0] for i in range(500)]  # no dupes


def test_python_stream_sink_epochs_and_manifests(spark, tmp_path):
    """End-to-end custom Python connector: synth_stream source → custom
    jsonl_stream_sink — every synthetic row lands exactly once across the
    per-epoch part files, and each committed epoch published a manifest
    whose row counts sum to the total."""
    import glob
    import json
    import os

    from pyspark_for_ebook_classification_spark.streaming.pysource import (
        register,
        synth_row,
    )

    register(spark)
    out = str(tmp_path / "stream_out")
    src = (
        spark.readStream.format("synth_stream")
        .option("rows", 300)
        .option("batch", 100)
        .load()
    )
    q = (
        src.writeStream.outputMode("append")
        .format("jsonl_stream_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    deadline = time.time() + 120
    def _rows():
        return sum(
            1
            for p in glob.glob(os.path.join(out, "part-*.jsonl"))
            for _ in open(p)
        )
    while time.time() < deadline and _rows() < 300:
        time.sleep(0.5)
    q.stop()

    ids = sorted(
        json.loads(line)["id"]
        for p in glob.glob(os.path.join(out, "part-*.jsonl"))
        for line in open(p)
    )
    assert ids == [synth_row(i)[0] for i in range(300)]
    manifests = [
        json.load(open(p)) for p in glob.glob(os.path.join(out, "_MANIFEST-*.json"))
    ]
    assert sum(m["rows"] for m in manifests) == 300


def test_rate_source_smoke(spark):
    """S6's built-in load-generator source: rate emits (timestamp, value)
    rows at a fixed rps — the standard synthetic-load harness for sizing
    a streaming job before pointing it at real 100 TB/day traffic."""
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .option("numPartitions", 2)
        .load()
    )
    import uuid

    name = "sink_" + uuid.uuid4().hex[:8]
    q = (
        src.selectExpr("value", "value % 10 AS bucket")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and spark.table(name).count() < 50:
        time.sleep(0.5)
    q.stop()
    rows = spark.table(name).collect()
    assert len(rows) >= 50
    assert all(r["bucket"] == r["value"] % 10 for r in rows)


def test_countmin_stream_equals_batch_twin(spark, sf_dir):
    """The streaming Count-Min grid must equal the batch-built grid
    cell-for-cell — the merge-across-micro-batches law, exercised through
    a real streaming query."""
    stream_pdf = jobs.run_countmin_stream(spark, sf_dir).toPandas()
    batch_pdf = twins.stream_countmin_grid_twin(spark, sf_dir).toPandas()
    assert_frames_match(stream_pdf, batch_pdf, "run_countmin_stream")


def test_hourly_topk_stream_equals_twin(spark, sf_dir):
    """ST10: windowed top-k = streamed hourly counts (complete mode, so
    every hour is present after availableNow drains) + the same sink-side
    rank the batch twin applies. Exact row equality, no tolerance."""
    stream_pdf = jobs.run_hourly_topk_stream(spark, sf_dir).toPandas()
    batch_pdf = twins.stream_hourly_topk_twin(spark, sf_dir).toPandas()
    assert_frames_match(stream_pdf, batch_pdf, "hourly_topk")


def test_custom_sessionize_stream_matches_batch_closed_sessions(spark, sf_dir):
    """ST6 custom gap sessionizer == the batch islands twin for every
    CLOSED session (each user's final session stays open in state and is
    deliberately unemitted). Bit-exact, including the decimal value sums."""
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    stream_pdf = jobs.run_custom_sessionize_stream(spark, sf_dir).toPandas()
    batch_pdf = all_queries()["window_sessionize_gap"].fn(spark, sf_dir).toPandas()
    last = batch_pdf.groupby("user_id")["session_idx"].transform("max")
    closed = batch_pdf[batch_pdf["session_idx"] < last].reset_index(drop=True)
    assert_frames_match(stream_pdf, closed, "custom_sessionize_closed")


def test_incremental_gate_stream_matches_declared_query(spark, sf_dir):
    """The streaming ingest gate (stream-static band joins + one
    complete-mode aggregation) must equal the declared
    dedup_incremental_gate batch query row for row — the §2.10 twin
    discipline applied to the L2 ingest pass."""
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries
    from pyspark_for_ebook_classification_spark.streaming.jobs import (
        run_incremental_gate_stream,
    )

    got = {
        tuple(r)
        for r in run_incremental_gate_stream(spark, sf_dir).collect()
    }
    want = {
        tuple(r)
        for r in all_queries()["dedup_incremental_gate"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_gopher_gate_stream_matches_declared_query(spark, sf_dir):
    """The streaming quality gate (stateless projection, append mode)
    must equal the declared text_gopher_library_gate batch query row
    for row — a second S6 runner transitively under the driver's gate."""
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries
    from pyspark_for_ebook_classification_spark.streaming.jobs import (
        run_gopher_gate_stream,
    )

    got = {tuple(r) for r in run_gopher_gate_stream(spark, sf_dir).collect()}
    want = {
        tuple(r)
        for r in all_queries()["text_gopher_library_gate"].fn(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0
    assert any(r[-1] for r in want) and any(not r[-1] for r in want)


def test_watermark_close_stream_equals_twin(spark, sf_dir):
    """ST4 transitively under the driver's oracle gate (r13; the S6
    runner precedent): a REAL maxFilesPerTrigger=1 streaming run over
    the deterministic arrival log — one-batch watermark propagation
    lag, late-row drops, append-mode closed-window emission and all —
    must equal the declared hash-green stream_watermark_close_twin
    row for row. Plus non-vacuity: the fixture's 7-day stragglers
    must actually be dropped, and the tail windows actually withheld
    (an all-kept / all-emitted run would attest nothing)."""
    stream_pdf = (
        jobs.run_watermark_close_stream(spark, sf_dir)
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    twin_pdf = (
        twins.stream_watermark_close_twin(spark, sf_dir)
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert_frames_match(stream_pdf, twin_pdf, "watermark_close_semantics")

    import pyspark.sql.functions as F

    ev = load(spark, sf_dir, "events")
    total_events = ev.count()
    total_windows = ev.select(F.date_trunc("hour", "ts")).distinct().count()
    assert int(twin_pdf["n_events"].sum()) < total_events  # rows were dropped
    assert len(twin_pdf) < total_windows  # tail windows withheld (open state)


def test_watermark_library_replay_stream_equal_at_router_dials(spark, sf_dir):
    """The ST4 library router's dials (9 batches, 45-min delay,
    every-37th-event 9-day stragglers, 180-min jitter) through the REAL
    stream must equal the declared stream_watermark_library_replay —
    the oracle checks the dial plumbing, this test checks the dials
    against the engine itself."""
    stream_pdf = (
        jobs.run_watermark_close_stream(
            spark,
            sf_dir,
            batches=9,
            delay_min=45,
            straggler_every=37,
            straggler_min=12960,
            jitter_mod=180,
        )
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    twin_pdf = (
        twins.stream_watermark_library_replay(spark, sf_dir)
        .toPandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert_frames_match(stream_pdf, twin_pdf, "watermark_router_dials")
    ev = load(spark, sf_dir, "events")
    assert int(twin_pdf["n_events"].sum()) < ev.count()  # drops happened

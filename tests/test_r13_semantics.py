"""Round-13 semantics: conservation / output-ceiling pins.

(1) sql_pipe_syntax_flagship (r12 verdict task 7): the query's 2.66x
SCALING ratio is split-twin-explained (the single-row-group scan
artifact) — pin the AGGREGATE stage's output bound and line-mass
conservation so a future EXTEND-stage regression (a row-multiplying
stage, a dropped predicate) cannot hide inside that artifact
explanation. The other >2.5x SCALING entrants all carry an analogous
ceiling/conservation test.

(2) sql_scripting_compound (new r13): the WHILE-iterated threshold is
a TAIL mean, so each iteration must strictly raise it and the admitted
slice must shrink monotonically — pinned against the base table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.operators.classics2 import (
    sql_pipe_syntax_flagship,
    sql_scripting_compound,
)
from pyspark_for_ebook_classification_spark.sources.io import load


def test_pipe_syntax_output_ceiling_and_conservation(spark, sf_dir):
    """The |> AGGREGATE stage groups by (l_returnflag, order_class):
    output rows are bounded by the KEY SPACE — |returnflag| x 2 classes
    — independent of data scale, and sum(n_lines) must equal the direct
    filtered line count (every surviving line lands in exactly ONE
    group; an EXTEND stage that multiplied or dropped rows breaks the
    equality before any timing table would notice)."""
    out = sql_pipe_syntax_flagship(spark, sf_dir)
    rows = out.collect()

    li = load(spark, sf_dir, "lineitem")
    pred = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date")) & (
        F.col("l_discount") > 0.02
    )
    n_flags = li.select("l_returnflag").distinct().count()
    assert 0 < len(rows) <= n_flags * 2  # ceiling: the key space

    expected_lines = li.filter(pred).count()
    assert sum(r["n_lines"] for r in rows) == expected_lines  # conservation

    # and the quantity mass is conserved through the EXTEND stages
    direct_qty = li.filter(pred).agg(
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("q")
    ).collect()[0]["q"]
    assert abs(sum(r["sum_qty"] for r in rows) - direct_qty) < 1e-6


def test_scripting_iterated_threshold_monotone(spark, sf_dir):
    """sql_scripting_compound's WHILE loop iterates thr = mean(price >
    thr): each step is a TAIL mean, so the converged threshold must
    exceed the plain mean, the admitted slice must be a strict subset
    of the above-mean slice, and the per-priority n_orders must sum to
    the direct count at the converged threshold (the loop's scalar and
    the final aggregate saw the same data)."""
    out = sql_scripting_compound(spark, sf_dir).collect()
    assert len(out) > 0
    thr = out[0]["threshold"]
    assert all(r["threshold"] == thr for r in out)  # one converged scalar

    # Re-run the identical 3-step recurrence with the same decimal-sum /
    # count-divide expression (the output's threshold is round(.,6), so
    # the exact scalar is recomputed here for the boundary-safe filter).
    o = load(spark, sf_dir, "orders")

    def tail_mean(lo: float) -> float:
        return (
            o.filter(F.col("o_totalprice") > lo)
            .agg(
                (
                    F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1)).cast("double")
                ).alias("a")
            )
            .collect()[0]["a"]
        )

    t1 = tail_mean(0.0)
    t2 = tail_mean(t1)
    t3 = tail_mean(t2)
    assert t1 < t2 < t3  # each tail mean strictly raises the threshold
    assert round(t3, 6) == thr  # the scripting loop converged to the same scalar

    n_above = o.filter(F.col("o_totalprice") > t3).count()
    assert sum(r["n_orders"] for r in out) == n_above  # conservation
    assert n_above < o.filter(F.col("o_totalprice") > t1).count()
    assert {r["tier"] for r in out} <= {"high", "low"}


def test_curate_incremental_materialize_knob_is_plan_only(spark, sf_dir):
    """r13: curate_incremental's shared batch-side materialization
    (localCheckpoint of the gopher survivors + exact-admitted survivors)
    is a PLAN optimization — the admitted verdicts must be identical
    with and without it."""
    from pyspark_for_ebook_classification_spark.operators.dedup import (
        curate_incremental,
    )

    d = load(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 4 == 0)
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    on = {
        r["doc_id"]: (r["quality_keep"], r["exact_admit"], r["final_admit"])
        for r in curate_incremental(batch, corpus, materialize=True).collect()
    }
    off = {
        r["doc_id"]: (r["quality_keep"], r["exact_admit"], r["final_admit"])
        for r in curate_incremental(batch, corpus, materialize=False).collect()
    }
    assert on == off
    assert any(v[2] for v in on.values())  # non-vacuous: some admits
    assert not all(v[2] for v in on.values())  # ... and some rejections

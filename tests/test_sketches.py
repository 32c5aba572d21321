"""Sketch-operator guarantees (operators/sketches.py): the properties
that make a sketch usable at 100 TB — no false negatives (bloom),
one-sided error (count-min), linear mergeability across shards
(count-min), and the no-row-explosion plan shapes — asserted on real
data, not just claimed in docstrings. The gram block is additionally
cross-checked against numpy's float64 X'X, an implementation the Spark
and DuckDB sides share nothing with.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.operators.sketches import (
    cm_cells,
    cm_token_counts,
)
from pyspark_for_ebook_classification_spark.operators.similarity import (
    _GRAM_DIMS,
)
from pyspark_for_ebook_classification_spark.plans.explain import audit
from pyspark_for_ebook_classification_spark.plans.registry import all_queries
from pyspark_for_ebook_classification_spark.sources.io import load


def test_bloom_has_no_false_negatives(spark, sf_dir):
    row = (
        all_queries()["sketch_bloom_semijoin"].fn(spark, sf_dir).collect()[0].asDict()
    )
    # every exact member must pass the filter: passes = members + false pos
    assert row["n_bloom_pass"] - row["n_false_pos"] == row["n_exact_match"], row
    assert row["n_bloom_pass"] >= row["n_exact_match"], row


def test_bloom_probe_is_broadcast_only(spark, sf_dir):
    rep = audit(all_queries()["sketch_bloom_semijoin"].fn(spark, sf_dir))
    # 3 bitmap-word lookups + 1 membership join, all broadcast; the fact
    # side must never sort-merge or expand into probe rows.
    assert rep["broadcast_joins"] >= 4, rep["plan"]
    assert rep["sortmerge_joins"] == 0, rep["plan"]
    assert rep["cartesian"] == 0, rep["plan"]
    assert rep["python_workers"] == 0, rep["plan"]


def test_countmin_error_is_one_sided(spark, sf_dir):
    rows = all_queries()["sketch_countmin_topk"].fn(spark, sf_dir).collect()
    assert rows, "top-k report empty"
    for r in rows:
        assert r["cm_estimate"] >= r["exact_cnt"], r
        assert r["overcount"] == r["cm_estimate"] - r["exact_cnt"], r


def test_countmin_grid_merges_linearly(spark, sf_dir):
    """CM grids built from disjoint shards must add cell-wise to the
    whole-corpus grid — the property that lets each of 1000 executors
    sketch its shard independently."""
    docs = load(spark, sf_dir, "documents")
    whole = {
        (r["t"], r["bucket"]): r["cell"]
        for r in cm_cells(cm_token_counts(docs)).collect()
    }
    merged: dict = {}
    for half in (docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)):
        for r in cm_cells(cm_token_counts(half)).collect():
            k = (r["t"], r["bucket"])
            merged[k] = merged.get(k, 0) + r["cell"]
    assert merged == whole


def test_gram_block_matches_numpy(spark, sf_dir):
    out = {
        (r["i"], r["j"]): r["gram"]
        for r in all_queries()["sim_gram_matrix_block"].fn(spark, sf_dir).collect()
    }
    emb = load(spark, sf_dir, "embeddings").select("embedding").collect()
    X = np.array([r["embedding"][:_GRAM_DIMS] for r in emb], dtype=np.float64)
    G = X.T @ X
    assert len(out) == _GRAM_DIMS * (_GRAM_DIMS + 1) // 2
    for (i, j), v in out.items():
        assert abs(v - G[i, j]) <= 1e-9 + 1e-9 * abs(G[i, j]), (i, j, v, G[i, j])


def test_gram_block_aggregates_without_row_explosion(spark, sf_dir):
    rep = audit(all_queries()["sim_gram_matrix_block"].fn(spark, sf_dir))
    assert rep["partial_agg"], rep["plan"]  # map-side combine of the 136 cells
    # one single-partition exchange for the final agg; the scan side must
    # not explode the array before aggregating (the only Generate allowed
    # is the post-agg `stack` unpivot of the one 136-cell row, which sits
    # above the aggregate in the plan text).
    assert rep["shuffles"] <= 1, rep["plan"]
    plan = rep["plan"]
    gen_pos = plan.find("Generate")
    agg_pos = plan.find("HashAggregate")
    assert gen_pos != -1 and agg_pos != -1 and gen_pos < agg_pos, plan
    assert rep["python_workers"] == 0, rep["plan"]


def test_kmv_merges_shards_and_matches_python(spark, sf_dir):
    """KMV sketch laws, via a shared-nothing Python implementation:
    (a) k-min of (k-min(shard A) ∪ k-min(shard B)) == k-min(whole) — the
    merge rule 1000 executors would use; (b) the operator's estimates
    equal hashlib-computed ones exactly (third engine agreement)."""
    import hashlib

    from pyspark_for_ebook_classification_spark.operators.sketches import (
        _KMV_K,
        _KMV_RANGE,
    )

    rows = (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_custkey")
        .distinct()
        .collect()
    )
    groups: dict = {}
    for r in rows:
        h = int(hashlib.md5(f"k:{r['o_custkey']}".encode()).hexdigest()[:13], 16)
        groups.setdefault(r["o_orderpriority"], []).append((h, r["o_custkey"]))

    expected = {}
    for g, pairs in groups.items():
        whole = sorted(pairs)[:_KMV_K]
        # shard by key parity, sketch each shard, merge, re-take k-min
        shard_a = sorted(p for p in pairs if p[1] % 2 == 0)[:_KMV_K]
        shard_b = sorted(p for p in pairs if p[1] % 2 == 1)[:_KMV_K]
        merged = sorted(shard_a + shard_b)[:_KMV_K]
        assert merged == whole, f"merge law broken for {g}"
        est = (
            len(whole)
            if len(whole) < _KMV_K
            else (_KMV_K - 1) * _KMV_RANGE // whole[-1][0]
        )
        expected[g] = (len(pairs), est)

    got = {
        r["o_orderpriority"]: (r["n_exact"], r["kmv_estimate"])
        for r in all_queries()["sketch_kmv_distinct"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_kmv_pushes_group_limit(spark, sf_dir):
    rep = audit(all_queries()["sketch_kmv_distinct"].fn(spark, sf_dir))
    # rn <= k over the rank window must compile to WindowGroupLimit so map
    # tasks keep only their local 64 smallest before the exchange
    assert "WindowGroupLimit" in rep["plan"], rep["plan"]
    assert rep["python_workers"] == 0, rep["plan"]


def test_theta_overlap_estimates_within_pinned_error(spark, sf_dir):
    """Theta set-algebra accuracy, pinned deterministically (fixed hashes,
    fixed data): both estimates within 25% of exact — k=64 theory gives
    ~1/sqrt(64) = 12.5% typical error — and trivially sane (union >=
    intersection >= 0)."""
    row = (
        all_queries()["sketch_theta_set_overlap"].fn(spark, sf_dir).collect()[0]
    ).asDict()
    exact_union = (
        row["n_exact_a"] + row["n_exact_b"] - row["n_exact_inter"]
    )
    assert row["est_inter"] >= 0 and row["est_union"] >= row["est_inter"], row
    assert abs(row["est_inter"] - row["n_exact_inter"]) <= 0.25 * row["n_exact_inter"], row
    assert abs(row["est_union"] - exact_union) <= 0.25 * exact_union, row


def test_theta_kmin_uses_take_ordered(spark, sf_dir):
    rep = audit(all_queries()["sketch_theta_set_overlap"].fn(spark, sf_dir))
    # each side's 64-minimum must be a distributed TakeOrderedAndProject,
    # never a single-partition global window over the whole key set
    assert rep["plan"].count("TakeOrderedAndProject") >= 2, rep["plan"]
    assert "Window" not in rep["plan"], rep["plan"]
    assert rep["python_workers"] == 0, rep["plan"]


def test_histogram_quantile_bound_is_one_sided(spark, sf_dir):
    """The reported upper bin edge must bound the exact quantile from
    above, and tighten as q grows (monotone non-decreasing edges)."""
    rows = sorted(
        (r["q"], r["est_upper_edge"], r["exact_value"])
        for r in all_queries()["sketch_histogram_quantiles"].fn(spark, sf_dir).collect()
    )
    assert [q for q, _, _ in rows] == [0.5, 0.9, 0.99]
    for q, est, exact in rows:
        assert est >= exact, (q, est, exact)
    edges = [e for _, e, _ in rows]
    assert edges == sorted(edges)


def test_histogram_cells_merge_linearly(spark, sf_dir):
    """Histograms from disjoint shards add cell-wise — same merge law as
    Count-Min, checked over a parity split of orders (bins computed
    against the SHARED global extent, as a production merge would)."""
    from pyspark_for_ebook_classification_spark.operators.sketches import _HG_BINS

    o = load(spark, sf_dir, "orders")
    ext = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )

    def cells(df):
        binned = df.crossJoin(F.broadcast(ext)).select(
            F.least(
                F.lit(_HG_BINS - 1),
                F.floor(
                    (F.col("o_totalprice") - F.col("lo"))
                    * _HG_BINS
                    / (F.col("hi") - F.col("lo"))
                ).cast("int"),
            ).alias("bin")
        )
        return {
            r["bin"]: r["cnt"]
            for r in binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }

    whole = cells(o)
    merged: dict = {}
    for half in (o.filter(F.col("o_orderkey") % 2 == 0), o.filter(F.col("o_orderkey") % 2 == 1)):
        for b, c in cells(half).items():
            merged[b] = merged.get(b, 0) + c
    assert merged == whole


def test_hll_registers_match_pure_python(spark, sf_dir):
    """Third engine for the HLL build: hashlib md5 + int bit-length over
    the collected key list must reproduce every register exactly."""
    import hashlib

    from pyspark_for_ebook_classification_spark.sources.io import load

    keys = [r["c_custkey"] for r in load(spark, sf_dir, "customer").collect()]
    regs = [0] * 64
    for k in keys:
        v = int(hashlib.md5(f"h:{k}".encode()).hexdigest()[:15], 16)
        reg, w = v % 64, v // 64
        rho = 55 if w == 0 else 55 - w.bit_length()
        regs[reg] = max(regs[reg], rho)

    got = {
        r["register_idx"]: r["rho"]
        for r in all_queries()["sketch_hll_registers"].fn(spark, sf_dir).collect()
    }
    assert got == {i: regs[i] for i in range(64)}


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """m=64 gives ~13% standard error (1.04/sqrt(m)); assert every
    segment estimate lands within 4 sigma of its exact count."""
    rows = all_queries()["sketch_hll_estimate"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        rel = abs(r["hll_estimate"] - r["n_exact"]) / max(r["n_exact"], 1)
        assert rel <= 4 * 1.04 / (64**0.5), (r["c_mktsegment"], rel)

"""Round-11: the incremental curation pipeline (r10 verdict task 4) —
funnel monotonicity on the driver fixture, a planted fixture covering
every rejection reason, and the corpus-wins admission rule."""

from __future__ import annotations

import pytest

from pyspark_for_ebook_classification_spark.operators.dedup import (
    curate_incremental,
    data_curation_incremental,
)
from pyspark_for_ebook_classification_spark.sources.io import load


def test_incremental_funnel_is_monotone(spark, sf_dir):
    """final ⇒ exact ⇒ quality for every batch doc, and the funnel
    counts are non-increasing; the query is non-vacuous at gate scale."""
    out = data_curation_incremental(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert not (r.exact_admit and not r.quality_keep), r
        assert not (r.final_admit and not r.exact_admit), r
    q = sum(r.quality_keep for r in out)
    e = sum(r.exact_admit for r in out)
    f = sum(r.final_admit for r in out)
    assert q >= e >= f
    assert f > 0, "no batch doc admitted — vacuous workload"


_BASE = (
    "the quick brown fox jumps over a lazy dog while the farmer walks "
    "to the old market and buys fresh bread with butter and honey for "
    "the long winter months ahead of the village in the quiet valley"
)
_FRESH = (
    "a small boat drifts on the calm lake at dawn and the fisherman "
    "waits in silence for the first bite of the day while mist rises "
    "slowly over the water and the distant hills turn gold in the sun"
)
_PAIR_A = (
    "the engineers met in the main hall to review the design of the "
    "new bridge and the senior architect explained the load limits "
    "while the city planner asked about the cost of the steel beams"
)


def test_incremental_planted_rejection_reasons(spark):
    """One planted batch doc per rejection reason, plus the admissions:
    - 200 near-copy of corpus doc (suffix chosen so the deterministic
      2x6 banding surfaces the pair - "tonight" is a measured miss) -> final_admit False (corpus wins)
    - 204 exact copy of corpus doc -> exact_admit False
    - 208 gibberish -> quality_keep False
    - 212 fresh unique doc -> admitted end-to-end
    - 224 exact copy of 212 -> exact_admit False (within-batch keep-first)
    - 216/220 near-copies of each other -> min (216) admitted, 220 not
    """
    corpus = spark.createDataFrame(
        [(101, _BASE), (105, "the cat sat on a warm mat in the sun and it purred softly for hours")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [
            (200, _BASE + " today"),
            (204, _BASE),
            (208, "zzzz qqqq %%%% #### @@@@"),
            (212, _FRESH),
            (224, _FRESH),
            (216, _PAIR_A + " tonight"),
            (220, _PAIR_A + " today"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in curate_incremental(batch, corpus).collect()}
    assert set(out) == {200, 204, 208, 212, 216, 220, 224}

    assert out[208].quality_keep is False and out[208].final_admit is False
    assert out[204].quality_keep is True and out[204].exact_admit is False
    assert out[224].quality_keep is True and out[224].exact_admit is False
    # near-copy of corpus: passes gate + exact, rejected at the near stage
    assert out[200].exact_admit is True and out[200].final_admit is False
    # fresh doc sails through
    assert out[212].final_admit is True
    # within-batch near-pair: keep-first admits the minimum id only
    assert out[216].final_admit is True
    assert out[220].exact_admit is True and out[220].final_admit is False
    # monotone everywhere
    for r in out.values():
        assert not (r.exact_admit and not r.quality_keep)
        assert not (r.final_admit and not r.exact_admit)


def test_incremental_empty_corpus_reduces_to_batch_dedup(spark):
    """With no standing corpus, admission = the batch's own curation."""
    corpus = spark.createDataFrame([], "doc_id bigint, text string")
    batch = spark.createDataFrame(
        [(1, _FRESH), (2, _FRESH), (3, _BASE)], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in curate_incremental(batch, corpus).collect()}
    assert out[1].final_admit is True
    assert out[2].exact_admit is False  # exact dup of 1, keep-first
    assert out[3].final_admit is True


def test_incremental_validate_disjoint_rejects_overlap(spark):
    """ADVICE r11: overlapping batch/corpus ids must fail loudly under
    the validate flag instead of silently mislabeling the corpus row."""
    corpus = spark.createDataFrame([(7, _BASE)], "doc_id bigint, text string")
    batch = spark.createDataFrame(
        [(7, _FRESH), (9, _PAIR_A)], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="overlap"):
        curate_incremental(batch, corpus, validate_disjoint=True)
    # disjoint ids pass the guard untouched
    ok = curate_incremental(
        spark.createDataFrame([(9, _FRESH)], "doc_id bigint, text string"),
        corpus,
        validate_disjoint=True,
    ).collect()
    assert len(ok) == 1 and ok[0].final_admit is True


def test_incremental_near_stage_is_index_at_rest(spark, sf_dir, monkeypatch):
    """r11 verdict task 3's Done criterion, pinned structurally: the
    near stage consumes the corpus through gate_static_index (built on
    CORPUS rows only) and clusters via neardup_dedup over the BATCH
    only — no corpus ∪ batch signature pass anywhere. (The plan-text
    form of this check is AQE/SF-dependent — broadcast reuse at sf0.01
    duplicates scan subtrees textually — so the dataflow is asserted at
    the call boundary instead.)"""
    import pyspark_for_ebook_classification_spark.operators.dedup as dd

    # r14: within-batch clustering runs neardup_dedup's tail
    # (_neardup_cluster) over the SHARED batch signature pass, so the
    # spied boundary is the tail call — the invariant is unchanged:
    # the index is built on CORPUS rows only, the clustering input is
    # BATCH rows only, no corpus ∪ batch signature pass anywhere.
    calls = {"index": [], "cluster_ids": [], "cluster_sh": []}
    real_index, real_cluster = dd.gate_static_index, dd._neardup_cluster

    def spy_index(corpus, **kw):
        calls["index"].append(corpus)
        return real_index(corpus, **kw)

    def spy_cluster(ids, shingled, cand, threshold, **kw):
        calls["cluster_ids"].append(ids)
        calls["cluster_sh"].append(shingled)
        return real_cluster(ids, shingled, cand, threshold, **kw)

    monkeypatch.setattr(dd, "gate_static_index", spy_index)
    monkeypatch.setattr(dd, "_neardup_cluster", spy_cluster)
    out = dd.data_curation_incremental(spark, sf_dir)
    out.collect()
    assert len(calls["index"]) == 1 and len(calls["cluster_ids"]) == 1
    idx_ids = {r[0] for r in calls["index"][0].select("doc_id").collect()}
    nd_ids = {r[0] for r in calls["cluster_ids"][0].select("doc_id").collect()}
    sh_ids = {r[0] for r in calls["cluster_sh"][0].select("doc_id").collect()}
    assert idx_ids and all(i % 4 != 0 for i in idx_ids), "index saw batch rows"
    assert nd_ids and all(i % 4 == 0 for i in nd_ids), "cluster saw corpus rows"
    assert sh_ids and all(i % 4 == 0 for i in sh_ids), (
        "shared signature pass saw corpus rows"
    )

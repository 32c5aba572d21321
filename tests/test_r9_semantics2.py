"""Round-9 composition proof: sim_retrieval_stack_topk (BM25 → RRF → MMR)
against its REGISTERED constituents (r8 verdict task 6) — the fused pool
agrees with sim_rrf_hybrid_fusion row-for-row, and a pure-Python greedy
MMR over the collected pool reproduces every pick exactly.
"""

from __future__ import annotations

import math
import os

import pytest

# The driver's gate scale (sf0.01 — 6 BM25 queries), derived from the same
# env override the rest of the suite uses (r9 ADVICE: a hardcoded absolute
# path fails on any host without it) — keep the sf0.01 pin, swap the base.
_BASE = os.path.dirname(
    os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001").rstrip("/")
)
SF = os.path.join(_BASE, "sf0.01")


@pytest.fixture(scope="module")
def stack_rows(spark):
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    return all_queries()["sim_retrieval_stack_topk"].fn(spark, SF).collect()


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)  # spark_dot's sequential left fold
    return acc


def test_stack_stage2_pool_matches_registered_rrf_query(spark, stack_rows):
    """Constituent pin #1: the composition's fused pool, truncated to the
    registered RRF query's top-5, must equal sim_rrf_hybrid_fusion's
    output (query_id, neighbor_id, rrf_score, rank) row-for-row — the
    composed stage-2 IS the registered stage, not a lookalike."""
    from pyspark_for_ebook_classification_spark.operators.similarity import (
        _rrf_fused,
    )
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    fused = {
        (r["query_id"], r["neighbor_id"]): r["rrf"]
        for r in _rrf_fused(spark, SF).collect()
    }
    rrf_q = all_queries()["sim_rrf_hybrid_fusion"].fn(spark, SF).collect()
    assert rrf_q, "registered RRF query is empty at the gate scale"
    # re-rank the raw fused table in Python and compare to the query
    by_query: dict = {}
    for (q, n), s in fused.items():
        by_query.setdefault(q, []).append((n, s))
    expect = {}
    for q, cands in by_query.items():
        ranked = sorted(cands, key=lambda ns: (-ns[1], ns[0]))[:5]
        for i, (n, s) in enumerate(ranked, 1):
            expect[(q, n)] = (s, i)
    got = {
        (r["query_id"], r["neighbor_id"]): (r["rrf_score"], r["rank"])
        for r in rrf_q
    }
    assert got == expect
    # and every composition pick carries the fused table's own rrf score
    for r in stack_rows:
        assert fused[(r["query_id"], r["cand_id"])] == r["rrf_score"]


def test_stack_rank1_is_rrf_rank1(spark, stack_rows):
    """Constituent pin #2: MMR step 1 takes the relevance argmax, and
    relevance is the normalized fusion score — so each query's rank-1
    pick must be the registered RRF query's rank-1 neighbor."""
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    rrf1 = {
        r["query_id"]: r["neighbor_id"]
        for r in all_queries()["sim_rrf_hybrid_fusion"].fn(spark, SF).collect()
        if r["rank"] == 1
    }
    stack1 = {r["query_id"]: r["cand_id"] for r in stack_rows if r["rank"] == 1}
    assert stack1 == rrf1
    assert len(stack1) >= 5, "gate scale should carry >=5 queries"


def test_stack_mmr_matches_pure_python_greedy(spark, stack_rows):
    """Constituent pin #3 (third engine): greedy MMR in pure Python —
    normalized-rrf relevance, sequential-fold cosines, λ=0.5, cand_id
    tie-breaks, portable floor rounding — over the collected stage-2 pool
    must reproduce EVERY pick (query, cand, relevance, mmr_score, rank)."""
    from pyspark_for_ebook_classification_spark.operators.similarity import (
        _STACK_POOL,
        _MMR_K,
        _rrf_fused,
    )
    from pyspark_for_ebook_classification_spark.sources.io import load

    fused = _rrf_fused(spark, SF).collect()
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load(spark, SF, "embeddings").collect()
    }
    by_query: dict = {}
    for r in fused:
        by_query.setdefault(r["query_id"], []).append((r["neighbor_id"], r["rrf"]))

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect = []
    for q, cands in by_query.items():
        pool = sorted(cands, key=lambda ns: (-ns[1], ns[0]))[:_STACK_POOL]
        mx = max(s for _, s in pool)
        rel = {n: s / float(mx) for n, s in pool}
        nrm = {n: math.sqrt(_dot(emb[n], emb[n])) for n, _ in pool}
        sim = {
            (a, b): _dot(emb[a], emb[b]) / (nrm[a] * nrm[b])
            for a, _ in pool
            for b, _ in pool
            if a != b
        }
        sel: list = []
        for rank in range(1, _MMR_K + 1):
            best = None
            for n, _ in pool:
                if n in sel:
                    continue
                mmr = (
                    0.5 * rel[n]
                    if not sel
                    else 0.5 * rel[n] - 0.5 * max(sim[(n, s)] for s in sel)
                )
                if best is None or mmr > best[1] or (mmr == best[1] and n < best[0]):
                    best = (n, mmr)
            if best is None:
                break
            sel.append(best[0])
            expect.append((q, best[0], r6(rel[best[0]]), r6(best[1]), rank))
    got = [
        (r["query_id"], r["cand_id"], r["relevance"], r["mmr_score"], r["rank"])
        for r in stack_rows
    ]
    assert sorted(got) == sorted(expect)
    # diversification is real on this corpus: at least one query's picks
    # deviate from pure relevance order (else the MMR stage is vacuous)
    rel_order = {}
    for q, cands in by_query.items():
        pool = sorted(cands, key=lambda ns: (-ns[1], ns[0]))[:_MMR_K]
        rel_order[q] = [n for n, _ in pool]
    mmr_order: dict = {}
    for q, n, _, _, rank in sorted(expect, key=lambda t: (t[0], t[4])):
        mmr_order.setdefault(q, []).append(n)
    assert any(mmr_order[q] != rel_order[q] for q in mmr_order), (
        "MMR never reordered any query's pool — diversification vacuous"
    )


def test_mmr_rerank_production_form(spark):
    """The parameterized mmr_rerank must reproduce a pure-Python greedy
    (sequential-fold cosines, λ balance, id tie-breaks) on a synthetic
    pool at two λ settings; λ=1 degenerates to pure relevance order and
    bad entries raise."""
    import math

    from pyspark_for_ebook_classification_spark.operators.similarity import (
        mmr_rerank,
    )

    # two queries; candidates on a plane so cosine structure is obvious
    rows = []
    vecs = {
        1: [1.0, 0.0, 0.0], 2: [0.99, 0.14, 0.0], 3: [0.0, 1.0, 0.0],
        4: [0.0, 0.98, 0.2], 5: [0.6, 0.8, 0.0], 6: [0.0, 0.0, 1.0],
    }
    rels = {1: 0.95, 2: 0.94, 3: 0.90, 4: 0.89, 5: 0.85, 6: 0.50}
    for q in (10, 20):
        for c, v in vecs.items():
            rows.append((q, c, rels[c], v))
    pool = spark.createDataFrame(
        rows, "query_id bigint, cand_id bigint, rel double, embedding array<double>"
    )

    def py_greedy(lam, k):
        def dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + float(x) * float(y)
            return acc

        nrm = {c: math.sqrt(dot(v, v)) for c, v in vecs.items()}
        out = []
        for q in (10, 20):
            sel = []
            for rank in range(1, k + 1):
                best = None
                for c in vecs:
                    if c in sel:
                        continue
                    if not sel:
                        m = lam * rels[c]
                    else:
                        mx = max(
                            dot(vecs[c], vecs[s]) / (nrm[c] * nrm[s]) for s in sel
                        )
                        m = lam * rels[c] - (1.0 - lam) * mx
                    if best is None or m > best[1] or (m == best[1] and c < best[0]):
                        best = (c, m)
                sel.append(best[0])
                out.append((q, best[0], rels[best[0]], best[1], rank))
        return sorted(out)

    for lam in (0.5, 0.3):
        got = sorted(
            (r["query_id"], r["cand_id"], r["rel"], r["mmr"], r["rank"])
            for r in mmr_rerank(pool, lam=lam, k=4).collect()
        )
        assert got == py_greedy(lam, 4), f"lam={lam}"
    # diversification is visible: at λ=0.5 the near-duplicate of the top
    # pick (cand 2, cosine ~0.99 to cand 1) must NOT be pick 2
    order = {
        r["rank"]: r["cand_id"]
        for r in mmr_rerank(pool, lam=0.5, k=3).collect()
        if r["query_id"] == 10
    }
    assert order[1] == 1 and order[2] != 2
    # λ=1 is pure relevance order
    pure = {
        r["rank"]: r["cand_id"]
        for r in mmr_rerank(pool, lam=1.0, k=3).collect()
        if r["query_id"] == 10
    }
    assert pure == {1: 1, 2: 2, 3: 3}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="lam"):
        mmr_rerank(pool, lam=1.5)
    with _pytest.raises(ValueError, match="k >= 1"):
        mmr_rerank(pool, k=0)


def test_mmr_rerank_lam_zero_first_pick_is_most_relevant(spark):
    """r14 ADVICE: at λ=0 (allowed by the 0 ≤ λ ≤ 1 validation) the
    emitted score λ·rel collapses to 0 for every candidate, and the r14
    aggregate's argmax fell through to the cand_id tie-break — picking
    the LOWEST ID instead of the most relevant, where the pre-r14 loop
    (and the docstring: 'Step 1 takes the relevance argmax') picked by
    rel DESC. Relevances here are arranged so argmax-rel ≠ min-id, which
    the production-form test's pool masked. Later λ=0 steps are pure
    max-diversity; emitted mmr values are 0 and −max-cosine."""
    import math

    from pyspark_for_ebook_classification_spark.operators.similarity import (
        mmr_rerank,
    )

    vecs = {
        1: [1.0, 0.0, 0.0], 2: [0.99, 0.14, 0.0], 3: [0.0, 1.0, 0.0],
        4: [0.0, 0.98, 0.2], 5: [0.6, 0.8, 0.0], 6: [0.0, 0.0, 1.0],
    }
    # most relevant is cand 5 (not the lowest id)
    rels = {1: 0.50, 2: 0.60, 3: 0.70, 4: 0.65, 5: 0.95, 6: 0.55}
    pool = spark.createDataFrame(
        [(10, c, rels[c], v) for c, v in vecs.items()],
        "query_id bigint, cand_id bigint, rel double, embedding array<double>",
    )

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    nrm = {c: math.sqrt(dot(v, v)) for c, v in vecs.items()}
    sel, expect = [], []
    for rank in range(1, 4):
        best = None
        for c in vecs:
            if c in sel:
                continue
            if not sel:
                key, m = rels[c], 0.0  # argmax by rel; emitted 0·rel
            else:
                mx = max(dot(vecs[c], vecs[s]) / (nrm[c] * nrm[s]) for s in sel)
                m = -mx
                key = m
            if best is None or key > best[2] or (key == best[2] and c < best[0]):
                best = (c, m, key)
        sel.append(best[0])
        expect.append((10, best[0], rels[best[0]], best[1], rank))

    got = sorted(
        (r["query_id"], r["cand_id"], r["rel"], r["mmr"], r["rank"])
        for r in mmr_rerank(pool, lam=0.0, k=3).collect()
    )
    assert got == sorted(expect)
    assert expect[0][1] == 5  # the fixture really separates rel from id

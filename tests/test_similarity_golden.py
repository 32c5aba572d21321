"""Golden semantics for the approximate similarity paths: approximations
must (a) be deterministic and (b) return a subset of the exact answer's
quality, quantified as recall vs brute force.
"""

from __future__ import annotations

import pandas as pd

from pyspark_for_ebook_classification_spark.plans.registry import all_queries


def _topk_sets(pdf: pd.DataFrame) -> dict:
    return {
        qid: set(grp["neighbor_id"]) for qid, grp in pdf.groupby("query_id")
    }


def test_ann_variants_recall_vs_bruteforce(spark, sf_dir):
    qs = all_queries()
    exact = _topk_sets(qs["sim_topk_bruteforce"].fn(spark, sf_dir).toPandas())
    for name in ("sim_ann_lsh_bucketed", "sim_ann_ivf_kmeans"):
        approx_pdf = qs[name].fn(spark, sf_dir).toPandas()
        approx = _topk_sets(approx_pdf)
        # determinism
        again = _topk_sets(qs[name].fn(spark, sf_dir).toPandas())
        assert approx == again, f"{name} is nondeterministic"
        # sanity: every query answered with ≤ k neighbors, ids from corpus
        assert set(approx) <= set(exact)
        # recall: approximate neighbors that ARE true top-k neighbors.
        # Loose floor — the bucketing is allowed to miss, not to invent:
        # every returned neighbor must rank correctly WITHIN its bucket,
        # which the oracle (LSH) / rerank (IVF) already guarantees.
        hits = sum(len(approx[q] & exact[q]) for q in approx)
        total = sum(len(exact[q]) for q in approx)
        recall = hits / total if total else 1.0
        assert recall >= 0.2, f"{name} recall {recall:.2f} suspiciously low"


def test_ivf_label_cells_recall_floor(spark, sf_dir):
    """Mirror of the kmeans-IVF recall floor for the oracle-checked IVF:
    against a numpy-exact full-corpus top-k (same query set, same k), the
    single-probe label-cell IVF must be deterministic and keep recall
    above the floor — it may miss out-of-cell neighbors, never invent."""
    import numpy as np

    from pyspark_for_ebook_classification_spark.operators.similarity import (
        _IVF_QUERY_MOD,
        _IVF_TOP_K,
    )
    from pyspark_for_ebook_classification_spark.sources.io import load

    qs = all_queries()
    approx_pdf = qs["sim_ann_ivf_label_cells"].fn(spark, sf_dir).toPandas()
    again_pdf = qs["sim_ann_ivf_label_cells"].fn(spark, sf_dir).toPandas()
    approx = _topk_sets(approx_pdf)
    assert approx == _topk_sets(again_pdf), "label-cell IVF is nondeterministic"

    emb = load(spark, sf_dir, "embeddings").toPandas()
    mat = np.array(emb["embedding"].tolist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    exact = {}
    for qi in np.flatnonzero(ids % _IVF_QUERY_MOD == 0):
        cos = mat @ mat[qi]
        cos[qi] = -np.inf  # exclude self
        top = np.argsort(-cos, kind="stable")[:_IVF_TOP_K]
        exact[ids[qi]] = set(ids[top])
    assert set(approx) == set(exact)
    hits = sum(len(approx[q] & exact[q]) for q in approx)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # Measured 0.10 at sf0.001: the label cells are NOT embedding-geometry
    # clusters (labels ≈ random w.r.t. cosine neighbors here), so single-
    # probe recall sits at the 1/n_cells chance line — the variant exists
    # to oracle-check the IVF *dataflow* (assign → probe one cell → exact
    # in-cell top-k). Retrieval quality comes from LEARNED cells: the
    # kmeans IVF above carries the 0.2 floor (measured 0.38).
    assert recall >= 0.05, f"label-cell IVF recall {recall:.2f} below chance floor"


def test_cosine_scores_bounded(spark, sf_dir):
    pdf = all_queries()["sim_topk_bruteforce"].fn(spark, sf_dir).toPandas()
    assert ((pdf["cosine"] <= 1.000001) & (pdf["cosine"] >= -1.000001)).all()
    # ranks are 1..k per query with no gaps
    for _, grp in pdf.groupby("query_id"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))


def test_random_projection_preserves_geometry(spark, sf_dir):
    """JL sanity on real data, scaled to what k=8 planes can deliver on a
    near-random corpus: for unit-ish 64-dim vectors, pairwise dots are
    ~N(0, 1/64) while an 8-plane projection adds variance ~k·E[w²]² —
    SNR ≈ 0.35, so the achievable pair-dot correlation is ~0.2-0.35, not
    0.9. The test pins a deterministic floor (fixed planes, fixed data)
    as a regression guard: a sign error, plane reuse, or dropped
    dimension pushes r to ~0. It also spot-checks one projection against
    the LCG weights directly (exact, not statistical)."""
    import numpy as np

    from pyspark_for_ebook_classification_spark.functions.vectors import (
        DIM,
        _weight,
    )
    from pyspark_for_ebook_classification_spark.operators.similarity import (
        _RP_DIMS,
        _RP_OFFSET,
    )
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries
    from pyspark_for_ebook_classification_spark.sources.io import load

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    proj = {
        r["vec_id"]: np.array([r[f"rp{p}"] for p in range(_RP_DIMS)])
        for r in all_queries()["sim_random_projection_reduce"]
        .fn(spark, sf_dir)
        .collect()
    }
    # spot-check one projection against the LCG weights directly
    vid = min(emb)
    W = np.array(
        [[_weight(_RP_OFFSET + p, j) for j in range(DIM)] for p in range(_RP_DIMS)]
    )
    np.testing.assert_allclose(proj[vid], W @ emb[vid], atol=1e-6)

    ids = sorted(emb)
    orig, red = [], []
    for i in range(len(ids) - 1):
        a, b = ids[i], ids[i + 1]
        orig.append(float(emb[a] @ emb[b]))
        red.append(float(proj[a] @ proj[b]))
    r = np.corrcoef(orig, red)[0, 1]
    assert r > 0.15, f"JL correlation below pinned floor: {r:.3f}"


def test_random_projection_is_shuffle_free(spark, sf_dir):
    from pyspark_for_ebook_classification_spark.plans.explain import audit
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    rep = audit(all_queries()["sim_random_projection_reduce"].fn(spark, sf_dir))
    assert rep["shuffles"] == 0, rep["plan"]
    assert rep["python_workers"] == 0, rep["plan"]
    assert rep["read_schema_columns"] == 2, rep["plan"]  # vec_id + embedding


def test_product_quantization_matches_numpy(spark, sf_dir):
    """Recompute codes and reconstruction error with numpy from the raw
    embeddings; codes must match exactly and errors to 1e-9."""
    import numpy as np

    from pyspark_for_ebook_classification_spark.sources.io import load

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    mat = np.stack([emb[k] for k in sorted(emb)])
    dmin, dmax = mat.min(axis=0), mat.max(axis=0)
    mid = (dmin + dmax) / 2

    rows = all_queries()["sim_product_quantization"].fn(spark, sf_dir).collect()
    assert len(rows) == len(emb)
    for r in rows:
        v = emb[r["vec_id"]]
        bits = (v > mid).astype(np.int64)
        for s in range(8):
            code = int((bits[s * 8 : s * 8 + 8] << np.arange(8)).sum())
            assert r[f"code_s{s}"] == code, (r["vec_id"], s)
        centroid = dmin + (1 + 2 * bits) * (dmax - dmin) / 4
        err = float(((v - centroid) ** 2).sum())
        assert abs(r["recon_err"] - err) < 1e-6, r["vec_id"]


def test_product_quantization_error_bounded_by_grid(spark, sf_dir):
    """Every per-dim residual is at most range/4, so the total squared
    error is bounded by sum((range/4)^2) — the grid's worst case."""
    import numpy as np

    from pyspark_for_ebook_classification_spark.sources.io import load

    mat = np.stack(
        [
            np.array(r["embedding"], dtype=np.float64)
            for r in load(spark, sf_dir, "embeddings").collect()
        ]
    )
    bound = float((((mat.max(axis=0) - mat.min(axis=0)) / 4) ** 2).sum()) + 1e-9
    rows = all_queries()["sim_product_quantization"].fn(spark, sf_dir).collect()
    assert all(0 <= r["recon_err"] <= bound for r in rows)


def test_pq_adc_matches_numpy_and_has_recall(spark, sf_dir):
    """Recompute the ADC distances in numpy from the raw embeddings
    (exact agreement) and measure recall@5 of the codes-only search
    against exact euclidean top-5 — must beat the random-chance floor
    decisively and the pinned measured floor."""
    import numpy as np

    from pyspark_for_ebook_classification_spark.sources.io import load

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    ids = sorted(emb)
    mat = np.stack([emb[i] for i in ids])
    dmin, dmax = mat.min(axis=0), mat.max(axis=0)
    mid = (dmin + dmax) / 2
    bits = (mat > mid).astype(np.int64)
    centroids = dmin + (1 + 2 * bits) * (dmax - dmin) / 4  # per (vec, dim)

    rows = all_queries()["sim_pq_adc_topk"].fn(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(r)
        q = emb[r["query_id"]]
        c = centroids[ids.index(r["neighbor_id"])]
        expected = float(((q - c) ** 2).sum())
        assert abs(r["adc_dist"] - expected) < 1e-6, (r["query_id"], r["neighbor_id"])

    hits = total = 0
    for qid, rs in got.items():
        assert len(rs) == 5
        q = emb[qid]
        exact = sorted(
            (float(((q - emb[j]) ** 2).sum()), j) for j in ids if j != qid
        )[:5]
        exact_ids = {j for _, j in exact}
        hits += len(exact_ids & {r["neighbor_id"] for r in rs})
        total += 5
    recall = hits / total
    # random chance at k=5 over ~500 vectors is ~0.01; measured 0.30 at
    # sf0.001 and 0.36 at sf0.01 (1-bit/dim codes — the coarsest PQ).
    # Pin below measurement, far above chance.
    assert recall >= 0.15, recall


def test_grid_multiprobe_recall_matches_srp_theory(spark, sf_dir):
    """sim_grid_recall_report: on the near-random driver embeddings the
    true top-5 neighbors sit near cosine 0.32 (theta ~ 71 deg), so
    per-plane sign agreement is p = 1 - theta/pi ~ 0.60 and the
    Hamming<=1 capture probability over 8 planes is p^8 + 8p^7(1-p) ~
    0.11. Measured macro recall@5: 0.14 at sf0.01, 0.06 at sf0.1. Pin a
    loose band around theory — well above the 3.5% blind-probe floor
    (9/256 cells), well below the 0.5 a clustered corpus would show —
    so a plane-family or probe-set regression shifts it out of band.
    Also reconcile the report against its constituents: n_hits <= k and
    every ground-truth query id is present exactly once."""
    from pyspark_for_ebook_classification_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        sim_grid_recall_report,
    )

    rows = sim_grid_recall_report(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES
    assert {r["query_id"] for r in rows} == set(range(N_QUERIES))
    for r in rows:
        assert 0 <= r["n_hits"] <= TOP_K
        assert abs(r["recall_at_k"] - round(r["n_hits"] / TOP_K, 6)) < 1e-9
    macro = sum(r["recall_at_k"] for r in rows) / len(rows)
    assert 0.02 <= macro <= 0.45, macro


def test_mmr_matches_pure_python_greedy(spark, sf_dir):
    """sim_mmr_diversified_topk vs a literal python transcription of the
    MMR greedy (pool from the operator's own checkpointed stage would be
    circular — recompute relevance and pool from raw embeddings with
    numpy instead), including the argmax tie-break on cand_id. Also pins
    the semantic invariants: rank 1 is the relevance argmax and the 5
    selections are distinct pool members."""
    import numpy as np

    from pyspark_for_ebook_classification_spark.operators.similarity import (
        _MMR_K,
        _MMR_POOL,
        N_QUERIES,
        sim_mmr_diversified_topk,
    )
    from pyspark_for_ebook_classification_spark.sources.io import load

    rows = load(spark, sf_dir, "embeddings").collect()
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    nrm = {k: float(np.sqrt(v @ v)) for k, v in emb.items()}

    def cos(a, b):
        return float(emb[a] @ emb[b]) / (nrm[a] * nrm[b])

    expected = {}
    for qid in range(N_QUERIES):
        rel = {c: cos(qid, c) for c in emb if c != qid}
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:_MMR_POOL]
        sel = [max(pool, key=lambda c: (rel[c], -c))]
        for _ in range(_MMR_K - 1):
            rest = [c for c in pool if c not in sel]
            score = {
                c: 0.5 * rel[c] - 0.5 * max(cos(c, s) for s in sel) for c in rest
            }
            sel.append(max(rest, key=lambda c: (score[c], -c)))
        expected[qid] = sel

    got: dict = {}
    for r in sorted(
        sim_mmr_diversified_topk(spark, sf_dir).collect(),
        key=lambda r: (r["query_id"], r["rank"]),
    ):
        got.setdefault(r["query_id"], []).append(r["cand_id"])
    assert got == expected
    for qid, sel in got.items():
        assert len(set(sel)) == _MMR_K


def test_ivfpq_composition_and_recall(spark, sf_dir):
    """sim_ivfpq_adc_topk must be EXACTLY the composition of its two
    registered constituents: every returned neighbor lies in the
    query's Hamming<=1 probe cells (coarse quantizer respected), its
    adc_dist equals the numpy ADC recomputation bit-for-bit (fine
    quantizer respected), and within each query the returned set is the
    true ADC top-5 over the candidate set. Recall vs exact euclidean
    top-5 is measured and floored above chance."""
    import numpy as np

    from pyspark_for_ebook_classification_spark.operators.similarity import (
        _GRID_BITS,
        _GRID_PLANE_OFFSET,
        _normed,
    )
    from pyspark_for_ebook_classification_spark.functions.vectors import (
        spark_srp_code,
    )
    from pyspark_for_ebook_classification_spark.sources.io import load

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    ids = sorted(emb)
    mat = np.stack([emb[i] for i in ids])
    dmin, dmax = mat.min(axis=0), mat.max(axis=0)
    mid = (dmin + dmax) / 2
    bits = (mat > mid).astype(np.int64)
    centroids = dmin + (1 + 2 * bits) * (dmax - dmin) / 4
    codes = {
        r["vec_id"]: r["code"]
        for r in _normed(spark, sf_dir)
        .select(
            "vec_id",
            spark_srp_code(
                "embedding", _GRID_BITS, 64, _GRID_PLANE_OFFSET
            ).alias("code"),
        )
        .collect()
    }

    def adc(qid, nid):
        q = emb[qid]
        c = centroids[ids.index(nid)]
        return float(((q - c) ** 2).sum())

    rows = all_queries()["sim_ivfpq_adc_topk"].fn(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(r)
        # coarse quantizer: neighbor reachable within Hamming<=1 probes
        ham = bin(codes[r["query_id"]] ^ codes[r["neighbor_id"]]).count("1")
        assert ham <= 1, (r["query_id"], r["neighbor_id"], ham)
        # fine quantizer: ADC distance exact vs numpy
        assert abs(r["adc_dist"] - adc(r["query_id"], r["neighbor_id"])) < 1e-6

    hits = total = 0
    for qid, rs in got.items():
        # the returned set must be the ADC top-|rs| over ALL candidates
        cand = [
            j
            for j in ids
            if j != qid and bin(codes[qid] ^ codes[j]).count("1") <= 1
        ]
        best = sorted((adc(qid, j), j) for j in cand)[: len(rs)]
        assert {j for _, j in best} == {r["neighbor_id"] for r in rs}, qid
        exact = sorted(
            (float(((emb[qid] - emb[j]) ** 2).sum()), j)
            for j in ids
            if j != qid
        )[:5]
        hits += len({j for _, j in exact} & {r["neighbor_id"] for r in rs})
        total += 5
    # cell pruning keeps ~3.5% of the corpus per query, ADC is 1-bit/dim:
    # random chance at k=5 over ~500 vectors is ~0.01. Measured 0.04 at
    # sf0.001 — the product of the grid's Hamming<=1 capture (~0.11, see
    # test_grid_multiprobe_recall_matches_srp_theory) and ADC ranking
    # quality, as composition predicts. Floor above the chance line.
    assert total > 0
    recall = hits / total
    assert recall >= 0.02, recall


def test_prefix_rerank_is_exact_cascade(spark, sf_dir):
    """sim_prefix_rerank_topk must be EXACTLY the two-stage cascade: the
    pool is the true prefix-cosine top-20 (numpy recomputation), the
    output is the true full-cosine top-5 OF that pool, and recall vs
    full brute force is measured — the number that justifies shipping
    prefix columns at scale."""
    import numpy as np

    from pyspark_for_ebook_classification_spark.operators.similarity import (
        _PR_POOL,
        _PR_PREFIX,
    )
    from pyspark_for_ebook_classification_spark.sources.io import load

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    ids = sorted(emb)

    def cos(a, b, d=None):
        a = a[:d] if d else a
        b = b[:d] if d else b
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    rows = all_queries()["sim_prefix_rerank_topk"].fn(spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(r)
    hits = total = 0
    for qid, rs in got.items():
        assert len(rs) == 5
        q = emb[qid]
        pool = sorted(
            ((-cos(q, emb[j], _PR_PREFIX), j) for j in ids if j != qid),
        )[:_PR_POOL]
        pool_ids = [j for _, j in pool]
        # every returned neighbor came from the prefix pool, at its
        # claimed prefix rank
        for r in rs:
            assert r["neighbor_id"] in pool_ids, (qid, r["neighbor_id"])
            assert pool_ids.index(r["neighbor_id"]) + 1 == r["prefix_rank"]
        # and the returned 5 are the full-cosine top-5 of the pool
        best = sorted(((-cos(q, emb[j]), j) for j in pool_ids))[:5]
        assert {j for _, j in best} == {r["neighbor_id"] for r in rs}, qid
        exact = sorted(((-cos(q, emb[j]), j) for j in ids if j != qid))[:5]
        hits += len({j for _, j in exact} & {r["neighbor_id"] for r in rs})
        total += 5
    recall = hits / total
    # measured 0.38 at sf0.001: 16 of 64 near-random dims carry ~1/4 of
    # the signal, and the 4x-deep pool recovers part of the remainder —
    # comfortably above the kmeans-IVF 0.2 floor. Chance is ~0.01.
    assert recall >= 0.1, recall

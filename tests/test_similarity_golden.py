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


def test_cosine_scores_bounded(spark, sf_dir):
    pdf = all_queries()["sim_topk_bruteforce"].fn(spark, sf_dir).toPandas()
    assert ((pdf["cosine"] <= 1.000001) & (pdf["cosine"] >= -1.000001)).all()
    # ranks are 1..k per query with no gaps
    for _, grp in pdf.groupby("query_id"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))

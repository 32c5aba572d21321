"""Round-10: production ann_topk library entry — pinned against the
registered brute-force and LSH queries at the default parameters, plus a
planted fixture, parameter validation, and banding behavior.
"""

from __future__ import annotations

import pytest

from pyspark_for_ebook_classification_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    ann_topk,
)
from pyspark_for_ebook_classification_spark.plans.registry import all_queries
from pyspark_for_ebook_classification_spark.sources.io import load


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.cosine, r.rank) for r in df.collect()
    )


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def test_bruteforce_matches_registered_query(spark, sf_dir, emb):
    """ann_topk(bruteforce) on the registry workload must equal
    sim_topk_bruteforce row-for-row — the production path IS the
    declared plan."""
    expected = _rows(all_queries()["sim_topk_bruteforce"].fn(spark, sf_dir))
    q = emb.filter(f"vec_id < {N_QUERIES}")
    got = _rows(ann_topk(emb, q, k=TOP_K, method="bruteforce"))
    assert got == expected


def test_lsh_matches_registered_query(spark, sf_dir, emb):
    """ann_topk(lsh) at the registered banding (4 tables × 4 planes,
    offset 0) must equal sim_ann_lsh_bucketed row-for-row."""
    expected = _rows(all_queries()["sim_ann_lsh_bucketed"].fn(spark, sf_dir))
    q = emb.filter(f"vec_id < {N_QUERIES}")
    got = _rows(
        ann_topk(
            emb, q, k=TOP_K, method="lsh", n_tables=4, planes_per_table=4
        )
    )
    assert got == expected


def test_planted_identical_vector_is_top1(spark):
    """A query identical to a corpus vector must return it at rank 1 with
    cosine 1.0 (exclude_self off — disjoint id spaces)."""
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.70710678, 0.70710678, 0.0, 0.0]),
        ],
        "vec_id int, embedding array<double>",
    )
    q = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "vec_id int, embedding array<double>"
    )
    out = {
        r.rank: (r.neighbor_id, r.cosine)
        for r in ann_topk(corpus, q, k=2, exclude_self=False).collect()
    }
    assert out[1] == (1, 1.0)
    assert out[2][0] == 3  # 45° vector beats the orthogonal one


def test_lsh_candidates_subset_of_bruteforce_order(spark, sf_dir, emb):
    """LSH is exact-reranked: any (query, neighbor) it returns must carry
    the same cosine as brute force computes for that pair, and rank
    within LSH results must be consistent with cosine order."""
    q = emb.filter(f"vec_id < {N_QUERIES}")
    bf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_topk(emb, q, k=1_000_000, method="bruteforce").collect()
    }
    lsh = ann_topk(emb, q, k=TOP_K, method="lsh").collect()
    assert lsh, "LSH returned nothing at the registered banding"
    for r in lsh:
        assert bf[(r.query_id, r.neighbor_id)] == r.cosine


def test_single_table_more_planes_returns_fewer_candidates(spark, sf_dir, emb):
    """Banding behavior: one 8-plane table buckets far sharper than four
    4-plane tables — measured recall 0.00 vs 0.38 on this near-random
    corpus (sim_ann_lsh_bucketed docstring); at minimum it cannot return
    MORE result rows."""
    q = emb.filter(f"vec_id < {N_QUERIES}")
    wide = ann_topk(emb, q, k=TOP_K, method="lsh", n_tables=4, planes_per_table=4)
    sharp = ann_topk(emb, q, k=TOP_K, method="lsh", n_tables=1, planes_per_table=8)
    assert sharp.count() <= wide.count()


@pytest.mark.parametrize(
    "kwargs",
    [
        {"k": 0},
        {"method": "ivf"},
        {"method": "lsh", "n_tables": 0},
        {"method": "lsh", "planes_per_table": 0},
    ],
)
def test_parameter_validation(spark, kwargs):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError):
        ann_topk(df, df, **kwargs)


def test_srp_multiprobe_matches_registered_query(spark, sf_dir, emb):
    """ann_topk(srp_multiprobe) at the registered grid (8 bits, plane
    family 48) must equal sim_ann_grid_multiprobe row-for-row."""
    expected = _rows(all_queries()["sim_ann_grid_multiprobe"].fn(spark, sf_dir))
    q = emb.filter(f"vec_id < {N_QUERIES}")
    got = _rows(
        ann_topk(
            emb,
            q,
            k=TOP_K,
            method="srp_multiprobe",
            grid_bits=8,
            plane_offset=48,
        )
    )
    assert got == expected


def test_srp_multiprobe_results_are_exact_cosines(spark, sf_dir, emb):
    """Multi-probe is exact-reranked: every returned cosine equals the
    brute-force value for that pair."""
    q = emb.filter(f"vec_id < {N_QUERIES}")
    bf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_topk(emb, q, k=1_000_000, method="bruteforce").collect()
    }
    mp = ann_topk(
        emb, q, k=TOP_K, method="srp_multiprobe", grid_bits=8, plane_offset=48
    ).collect()
    assert mp, "multi-probe returned nothing at the registered grid"
    for r in mp:
        assert bf[(r.query_id, r.neighbor_id)] == r.cosine


def test_srp_multiprobe_validation(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError):
        ann_topk(df, df, method="srp_multiprobe", grid_bits=0)
    with pytest.raises(ValueError):
        ann_topk(df, df, method="srp_multiprobe", grid_bits=63)

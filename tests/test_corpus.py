"""Semantic invariants for the corpus-curation operators
(operators/corpus.py) and batch sessionization (windows.py) beyond the
exact oracle parity the shared sweep already enforces."""

from __future__ import annotations

from collections import Counter

from pyspark_for_ebook_classification_spark.plans.registry import all_queries
from pyspark_for_ebook_classification_spark.sources.io import load


def test_containment_bounds_and_reference(spark, sf_dir):
    """Containment is in (0, 1]; spot-check values against a pure-python
    shingle-set recomputation for every reported pair."""
    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load(spark, sf_dir, "documents").collect()
    }
    shingles = {
        d: {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        for d, toks in docs.items()
        if len(toks) >= 3
    }
    rows = all_queries()["text_minhash_containment"].fn(spark, sf_dir).collect()
    for r in rows:
        a, b = shingles[r["doc_a"]], shingles[r["doc_b"]]
        expected = len(a & b) / len(a)
        assert expected >= 0.5
        assert abs(r["containment"] - round(expected, 6)) < 1e-9
        assert 0 < r["containment"] <= 1


def test_containment_pair_budget_within_ceiling(spark, sf_dir):
    """Pin the analytical pair-count ceiling from the containment
    docstring (r6 verdict item 4): the bucket expansion emits
    Σ C(df,2) ≤ OCC·(SHINGLE_DF_MAX−1)/2 triangular pairs — LINEAR in
    kept occurrences with a gate-bounded constant — and no surviving
    bucket exceeds the gate. A third, pure-Python recount of both sides
    from the raw documents guards the Spark arithmetic itself. If the
    HAVING gate is dropped/loosened, max_df (and eventually the ceiling)
    trips; if expansion goes non-triangular, pairs trips."""
    from pyspark_for_ebook_classification_spark.operators.corpus import (
        SHINGLE_DF_MAX,
        containment_pair_budget,
    )

    row = containment_pair_budget(spark, sf_dir).collect()[0]
    assert row["max_df"] <= SHINGLE_DF_MAX
    assert row["pairs"] <= row["ceiling"]
    assert row["ceiling"] == row["occ_kept"] * (SHINGLE_DF_MAX - 1) // 2

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load(spark, sf_dir, "documents").collect()
    }
    df = Counter()
    for toks in docs.values():
        if len(toks) < 3:
            continue
        for sh in {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}:
            df[sh] += 1
    kept = [c for c in df.values() if 2 <= c <= SHINGLE_DF_MAX]
    assert row["occ_kept"] == sum(kept)
    assert row["pairs"] == sum(c * (c - 1) // 2 for c in kept)


def test_containment_is_directional(spark, sf_dir):
    """(a,b) may clear the threshold while (b,a) does not — containment
    is not symmetric, and no pair may pair a doc with itself."""
    rows = all_queries()["text_minhash_containment"].fn(spark, sf_dir).collect()
    assert all(r["doc_a"] != r["doc_b"] for r in rows)


def test_token_entropy_bounds(spark, sf_dir):
    """0 <= H <= log2(n_distinct) (uniform max), and a doc with a single
    distinct token has H = 0."""
    import math

    rows = all_queries()["text_token_entropy"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["entropy_bits"] <= math.log2(r["n_distinct"]) + 1e-6
        assert r["n_distinct"] <= r["n_tokens"]


def test_curriculum_is_permutation_and_stage_ordered(spark, sf_dir):
    """Positions are exactly 1..N, and stages are non-decreasing along
    the global order (shuffling happens only within a stage)."""
    rows = sorted(
        all_queries()["data_curriculum_order"].fn(spark, sf_dir).collect(),
        key=lambda r: r["global_pos"],
    )
    n_docs = load(spark, sf_dir, "documents").count()
    assert [r["global_pos"] for r in rows] == list(range(1, n_docs + 1))
    stages = [r["stage"] for r in rows]
    assert stages == sorted(stages)
    assert set(stages) == {1, 2, 3, 4}


def test_sessionize_partitions_events(spark, sf_dir):
    """Sessions tile the event log: per-user event counts add up, session
    indexes are contiguous from 1, and durations are non-negative."""
    rows = all_queries()["window_sessionize_gap"].fn(spark, sf_dir).collect()
    ev_per_user = Counter(
        r["user_id"] for r in load(spark, sf_dir, "events").collect()
    )
    got_per_user: Counter = Counter()
    sessions_per_user: dict = {}
    for r in rows:
        got_per_user[r["user_id"]] += r["n_events"]
        sessions_per_user.setdefault(r["user_id"], []).append(r["session_idx"])
        assert r["duration_s"] >= 0
        assert r["n_events"] >= 1
    assert got_per_user == ev_per_user
    for user, idxs in sessions_per_user.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1)), user


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    """The decimal-moment closed form must agree with numpy's QR-based
    lstsq on the raw rows to ~1e-6 (the output rounding contract)."""
    import numpy as np

    rows = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    got = {
        r["l_returnflag"]: r
        for r in all_queries()["agg_ols_two_features"].fn(spark, sf_dir).collect()
    }
    flags = sorted({r["l_returnflag"] for r in rows})
    assert set(got) == set(flags)
    for flag in flags:
        sub = [r for r in rows if r["l_returnflag"] == flag]
        X = np.array([[1.0, r["l_quantity"], r["l_discount"]] for r in sub])
        y = np.array([r["l_extendedprice"] for r in sub])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        g = got[flag]
        assert g["n_rows"] == len(sub)
        assert abs(g["b_intercept"] - beta[0]) < 2e-5, flag
        assert abs(g["b_quantity"] - beta[1]) < 2e-6, flag
        assert abs(g["b_discount"] - beta[2]) < 2e-4, flag


def test_sliding_distinct_matches_bruteforce(spark, sf_dir):
    """Recompute each day's trailing-7-day distinct-user set directly."""
    import datetime

    ev = [
        (r["user_id"], r["ts"].date())
        for r in load(spark, sf_dir, "events").collect()
    ]
    days = sorted({d for _, d in ev})
    expected = {}
    for d in days:
        lo = d - datetime.timedelta(days=6)
        expected[d] = len({u for u, ed in ev if lo <= ed <= d})
    got = {
        r["day"].date(): r["distinct_users_7d"]
        for r in all_queries()["window_sliding_distinct_users_7d"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expected


def test_with_global_rank_is_exact_total_order(spark, sf_dir):
    """The two-pass rank must equal the single-process sorted position
    for an arbitrary total order, regardless of partition boundaries."""
    from pyspark_for_ebook_classification_spark.functions.ranks import (
        with_global_rank,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = with_global_rank(docs, ["n_chars", "doc_id"], out="pos").collect()
    expected = sorted(
        ((r["n_chars"], r["doc_id"]) for r in ranked),
    )
    for r in ranked:
        assert expected[r["pos"] - 1] == (r["n_chars"], r["doc_id"])
    assert sorted(r["pos"] for r in ranked) == list(range(1, len(ranked) + 1))


def test_asof_nearest_picks_true_minimum_gap(spark, sf_dir):
    """For every purchase: the reported click is the global-minimum
    |gap| click for that user (ties to the earlier click)."""
    from collections import defaultdict

    ev = load(spark, sf_dir, "events").collect()
    clicks = defaultdict(list)
    for r in ev:
        if r["event_type"] == "click":
            clicks[r["user_id"]].append(r["ts"])
    got = all_queries()["join_asof_nearest_click"].fn(spark, sf_dir).collect()
    purchases = [r for r in ev if r["event_type"] == "purchase"]
    expect_n = sum(1 for p in purchases if clicks[p["user_id"]])
    assert len(got) == expect_n
    by_event = {r["event_id"]: r for r in got}
    for p in purchases:
        cs = clicks[p["user_id"]]
        if not cs:
            continue
        # min |gap|, tie -> earlier click ts
        best = min(cs, key=lambda c: (abs((p["ts"] - c).total_seconds()), c))
        r = by_event[p["event_id"]]
        assert r["click_ts"] == best, (p["event_id"], r["click_ts"], best)
        td = p["ts"] - best if p["ts"] >= best else best - p["ts"]
        assert r["gap_us"] == td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds


def test_contrastive_pairs_shape_and_determinism(spark, sf_dir):
    """1 positive + N_NEGATIVES negatives per doc; positives aligned
    (vec_id == doc_id); negatives never hit the anchor; and a second
    run emits the identical pair set."""
    from pyspark_for_ebook_classification_spark.operators.datapipe import (
        N_NEGATIVES,
    )

    fn = all_queries()["data_contrastive_pairs"].fn
    rows = fn(spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs * (1 + N_NEGATIVES)
    for r in rows:
        if r["pair_type"] == "pos":
            assert r["vec_id"] == r["doc_id"] and r["neg_rank"] == 0
        else:
            assert r["vec_id"] != r["doc_id"] and 1 <= r["neg_rank"] <= N_NEGATIVES
    again = {(r["doc_id"], r["pair_type"], r["neg_rank"], r["vec_id"]) for r in fn(spark, sf_dir).collect()}
    assert again == {(r["doc_id"], r["pair_type"], r["neg_rank"], r["vec_id"]) for r in rows}


def test_ntile_from_rank_matches_sql_ntile(spark):
    """The integer reconstruction must equal SQL ntile(n) for every rank
    at many total sizes, including N < n, N % n == 0, and N % n != 0."""
    from pyspark_for_ebook_classification_spark.functions.ranks import (
        ntile_from_rank,
    )

    rows = [(n, r) for n in (1, 2, 3, 4, 5, 7, 8, 12, 97) for r in range(1, n + 1)]
    df = spark.createDataFrame(rows, "n_rows bigint, rank bigint")
    got = {
        (r["n_rows"], r["rank"]): r["tile"]
        for r in df.select(
            "n_rows", "rank", ntile_from_rank("rank", "n_rows", 4).alias("tile")
        ).collect()
    }

    def sql_ntile(rank, n_rows, n_tiles=4):
        q, rem = divmod(n_rows, n_tiles)
        big = (q + 1) * rem
        if rank <= big:
            return (rank - 1) // (q + 1) + 1
        return rem + (rank - big - 1) // q + 1

    # cross-check the reference itself against a literal bucket layout
    for n_rows in (5, 8, 97):
        sizes = [0] * 4
        for r in range(1, n_rows + 1):
            sizes[sql_ntile(r, n_rows) - 1] += 1
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)
        assert sum(sizes) == n_rows

    for (n_rows, rank), tile in got.items():
        assert tile == sql_ntile(rank, n_rows), (n_rows, rank)


def test_time_band_pairs_blocking_is_lossless(spark, sf_dir):
    """The bucket blocking must find EXACTLY the brute-force pair set:
    every cross-user purchase pair within 10 minutes, each once."""
    purchases = [
        (r["event_id"], r["user_id"], r["ts"])
        for r in load(spark, sf_dir, "events").collect()
        if r["event_type"] == "purchase"
    ]
    expected = set()
    for i, (ida, ua, ta) in enumerate(purchases):
        for idb, ub, tb in purchases[i + 1 :]:
            if ua == ub:
                continue
            td = ta - tb if ta >= tb else tb - ta
            gap = td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds
            if gap <= 600 * 1_000_000:
                expected.add((min(ida, idb), max(ida, idb), gap))
    got = {
        (r["event_a"], r["event_b"], r["gap_us"])
        for r in all_queries()["join_time_band_pairs"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_approx_percentile_within_rank_error(spark, sf_dir):
    """GK sketches guarantee rank error <= n/accuracy; translate that to
    a value interval from the exact sorted data and assert membership."""
    vals_by_status: dict = {}
    for r in load(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_extendedprice"
    ).collect():
        vals_by_status.setdefault(r["l_linestatus"], []).append(
            r["l_extendedprice"]
        )
    got = {
        r["l_linestatus"]: r
        for r in all_queries()["agg_approx_percentile"].fn(spark, sf_dir).collect()
    }
    for status, vals in vals_by_status.items():
        vals.sort()
        n = len(vals)
        slack = max(2, n // 10000 + 1)
        for q, col in ((0.5, "p50_approx"), (0.99, "p99_approx")):
            rank = int(q * (n - 1))
            lo = vals[max(0, rank - slack)]
            hi = vals[min(n - 1, rank + slack)]
            assert lo <= got[status][col] <= hi, (status, col)


def test_lsh_calibration_numbers_in_theory_range(spark, sf_dir):
    """Banding capture at j >= 0.7 has probability >= 1-(1-0.7^6)^2 ~ 0.22
    per pair and >= 0.87 at j >= 0.95; the measured recall (0.86 at
    sf0.001, 1.0 at sf0.01) must stay above a conservative floor, and
    every estimator error must stay within ~4 sigma of its Jaccard."""
    rec = all_queries()["dedup_lsh_candidate_recall"].fn(spark, sf_dir).collect()[0]
    assert rec["n_true_pairs"] >= 1
    assert rec["candidate_recall"] >= 0.5
    assert 0 <= rec["n_captured"] <= rec["n_true_pairs"]

    for r in all_queries()["dedup_minhash_estimate_error"].fn(spark, sf_dir).collect():
        j = r["exact_jaccard"]
        sigma = (j * (1 - j) / 12) ** 0.5
        assert r["abs_err"] <= max(4 * sigma, 0.26), (r["doc_a"], r["doc_b"])
        assert 0 <= r["minhash_estimate"] <= 1


def test_cluster_size_distribution_reconciles(spark, sf_dir):
    """Σ(size × clusters) must equal the corpus count, and removable =
    Σ(size-1 × clusters) must equal corpus − number of components."""
    rows = (
        all_queries()["dedup_cluster_size_distribution"].fn(spark, sf_dir).collect()
    )
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    n_components = sum(r["n_clusters"] for r in rows)
    assert sum(r["docs_removable"] for r in rows) == n_docs - n_components


def test_containment_guard_rejects_unpackable_doc_ids(spark, tmp_path):
    """The bit-packed pair key is exact only for doc_id < 2^32; beyond
    that, packing would silently collide pairs (the r5 ADVICE finding —
    data_snapshot_diff legitimately mints ids near 10^12, so large ids
    are in-universe). The per-bucket assert_true must fail fast instead.
    Also pin the positive side: ids ABOVE 2^31 (sign bit of the packed
    key set) still round-trip exactly."""
    import pandas as pd
    import pytest

    text = "alpha beta gamma delta epsilon zeta eta theta"
    big, bigger = 3_000_000_000, 3_000_000_001  # > 2^31: sign-bit path
    pd.DataFrame(
        {"doc_id": [big, bigger], "text": [text, text]}
    ).to_parquet(str(tmp_path / "documents.parquet"))
    q = all_queries()["text_minhash_containment"]
    rows = {(r["doc_a"], r["doc_b"]) for r in q.fn(spark, str(tmp_path)).collect()}
    assert rows == {(big, bigger), (bigger, big)}

    pd.DataFrame(
        {"doc_id": [1, 2**32], "text": [text, text]}
    ).to_parquet(str(tmp_path / "documents.parquet"))
    with pytest.raises(Exception, match="cannot bit-pack"):
        q.fn(spark, str(tmp_path)).collect()


def test_cdc_chunks_reconstruct_payload(spark, sf_dir):
    """Losslessness invariant of the CDC chunker: concatenating a doc's
    chunks in order must reproduce the payload byte-for-byte (boundaries
    partition, never drop or overlap), and every chunk must be non-empty
    with start positions strictly increasing. Checked in pure Python
    against the same start-position expression the query uses."""
    from pyspark_for_ebook_classification_spark.operators.multimodal import (
        cdc_starts,
    )

    docs = cdc_starts(
        load(spark, sf_dir, "documents")
        .where("length(text) >= 1")  # the operator's own guard
        .select("doc_id", "text")
    ).collect()
    assert docs
    for r in docs:
        text, bpos = r["text"], r["bpos"]
        assert bpos[0] == 1 and list(bpos) == sorted(set(bpos))
        chunks = [
            text[bpos[j] - 1 : (bpos[j + 1] - 1 if j + 1 < len(bpos) else len(text))]
            for j in range(len(bpos))
        ]
        assert "".join(chunks) == text, r["doc_id"]
        assert all(chunks), r["doc_id"]

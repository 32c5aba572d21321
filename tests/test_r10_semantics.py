"""Round-10 semantic third engines: the BPE decode/round-trip identity
(L6's train → encode → decode loop closure) re-derived by the sequential
Python scanner, plus the lossless-decode invariant itself.
"""

from __future__ import annotations

from collections import Counter

from pyspark_for_ebook_classification_spark.operators.textops import (
    BPE_EOW,
    BPE_ROUNDS,
)
from pyspark_for_ebook_classification_spark.plans.registry import all_queries
from pyspark_for_ebook_classification_spark.sources.io import load


def _scanner_encoded_words(docs: dict[int, list[str]]):
    """The tests/test_r8_semantics.py textbook BPE scanner run to its
    final word→symbol-stream state (the encoded corpus over word types)."""
    wt = Counter(t for toks in docs.values() for t in toks)
    words = {w: (list(w) + [BPE_EOW], c) for w, c in wt.items()}
    for _ in range(BPE_ROUNDS):
        pc: Counter = Counter()
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        (l, r), _c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        new = {}
        for w, (syms, cnt) in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new[w] = (merged, cnt)
        words = new
    return words


def test_bpe_decode_roundtrip_matches_scanner(spark, sf_dir):
    """Third engine: the scanner's encoded word table, decoded and
    bucketed by encoded length, must reproduce every output bucket —
    word-type count, count-weighted token mass, and exact-round-trip
    count — of the declared query."""
    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load(spark, sf_dir, "documents").collect()
    }
    words = _scanner_encoded_words(docs)
    expect: dict[int, list[int]] = {}
    for w, (syms, cnt) in words.items():
        b = expect.setdefault(len(syms), [0, 0, 0])
        b[0] += 1
        b[1] += cnt
        b[2] += int("".join(syms) == w + BPE_EOW)
    got = {
        r["n_symbols"]: [
            r["word_types"],
            r["corpus_tokens"],
            r["roundtrip_exact_types"],
        ]
        for r in all_queries()["text_bpe_decode_roundtrip"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_bpe_decode_is_lossless(spark, sf_dir):
    """THE tokenizer guarantee: every word type round-trips exactly
    (roundtrip_exact_types == word_types in every bucket) — BPE merges
    only concatenate adjacent symbols, so decode is lossless. A merge
    bug that corrupted the stream (dropped/duplicated a position) would
    break this before it broke any count."""
    rows = all_queries()["text_bpe_decode_roundtrip"].fn(spark, sf_dir).collect()
    assert rows, "no buckets — empty word-type table?"
    for r in rows:
        assert r["roundtrip_exact_types"] == r["word_types"], (
            f"bucket n_symbols={r['n_symbols']}: "
            f"{r['roundtrip_exact_types']}/{r['word_types']} round-trip"
        )
    # conservation: bucketed token mass re-adds to the corpus token count
    d = load(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    n_tokens = d.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda t: t != "")))
    ).collect()[0][0]
    assert sum(r["corpus_tokens"] for r in rows) == n_tokens


def test_winnow_search_floor_pair_budget(spark, sf_dir):
    """Containment treatment for the full-corpus floor query (its
    sf0.01→sf0.1 ratio sits at the 2.5× watch boundary): the df-capped
    index bounds TOTAL shared-fingerprint mass analytically — Σ n_shared
    over ALL pairs (pre-floor) ≤ Σ C(df,2) over kept fingerprints ≤
    OCC·(cap−1)/2 — so pair work is linear in kept occurrences by
    construction, at any corpus size. The min_shared floor only prunes
    further."""
    from pyspark.sql import functions as F

    from pyspark_for_ebook_classification_spark.operators.textops import (
        WINNOW_FP_DF_MAX,
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )
    from pyspark_for_ebook_classification_spark.sources.io import load as _load

    d = _load(spark, sf_dir, "documents")
    fps = winnow_fingerprints(d, k=WINNOW_K, w=WINNOW_W).select(
        "doc_id", "fp"
    ).distinct()
    dfr = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= WINNOW_FP_DF_MAX))
        .collect()
    )
    pair_slots = sum(r.df * (r.df - 1) // 2 for r in dfr)
    occ = sum(r.df for r in dfr)
    assert pair_slots <= occ * (WINNOW_FP_DF_MAX - 1) // 2
    # the floor query's total shared mass is within the pre-floor budget
    floor_rows = all_queries()["text_winnow_search_floor"].fn(
        spark, sf_dir
    ).collect()
    assert floor_rows, "floor query vacuous at the gate scale"
    assert sum(r.n_shared for r in floor_rows) <= pair_slots
    assert all(r.n_shared >= 2 for r in floor_rows)


def test_curation_pipeline_funnel_is_monotone_and_stagewise_consistent(spark, sf_dir):
    """Composition proof for data_curation_pipeline: verdict flags are a
    monotone funnel (final => exact => quality), each stage's keep-set
    equals the corresponding library call run stage-by-stage, and the
    quality stage actually drops documents at the gate scale (the funnel
    is non-vacuous)."""
    from pyspark_for_ebook_classification_spark.operators.dedup import (
        exact_dedup,
        neardup_dedup,
    )
    from pyspark_for_ebook_classification_spark.operators.textops import gopher_gate
    from pyspark_for_ebook_classification_spark.sources.io import load as _load

    rows = all_queries()["data_curation_pipeline"].fn(spark, sf_dir).collect()
    d = _load(spark, sf_dir, "documents")
    assert len(rows) == d.count()
    for r in rows:
        assert not (r.final_keep and not r.exact_keep)
        assert not (r.exact_keep and not r.quality_keep)
    q_set = {r.doc_id for r in rows if r.quality_keep}
    e_set = {r.doc_id for r in rows if r.exact_keep}
    f_set = {r.doc_id for r in rows if r.final_keep}
    assert f_set <= e_set <= q_set
    assert len(q_set) < len(rows), "quality stage dropped nothing — vacuous funnel"

    # stage-by-stage recomputation through the library entries
    assert q_set == {
        r.doc_id for r in gopher_gate(d).collect() if r.keep
    }
    surv_q = d.join(spark.createDataFrame([(i,) for i in q_set], "doc_id long"), "doc_id")
    assert e_set == {r.doc_id for r in exact_dedup(surv_q).collect() if r.keep}
    surv_e = surv_q.join(
        spark.createDataFrame([(i,) for i in e_set], "doc_id long"), "doc_id"
    )
    assert f_set == {r.doc_id for r in neardup_dedup(surv_e).collect() if r.keep}

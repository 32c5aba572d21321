"""Semantic third-engine checks for the round-8 additions. Parity says
Spark == DuckDB; these say both == the intended algorithm, via a pure-
Python reimplementation (the sequential scanner the window algebra
re-expresses).
"""

from __future__ import annotations

from collections import Counter

from pyspark_for_ebook_classification_spark.operators.textops import (
    BPE_EOW,
    BPE_ROUNDS,
)
from pyspark_for_ebook_classification_spark.plans.registry import all_queries
from pyspark_for_ebook_classification_spark.sources.io import load


def _py_bpe(docs: dict[int, list[str]]):
    """Textbook BPE trainer: greedy left-to-right scanner over the
    frequency-weighted word-type table. Returns one tuple per round:
    (round, left, right, pair_count, n_symbols_after, n_positions_after)."""
    wt = Counter(t for toks in docs.values() for t in toks)
    words = {w: (list(w) + [BPE_EOW], c) for w, c in wt.items()}
    out = []
    for k in range(1, BPE_ROUNDS + 1):
        pc = Counter()
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
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
        n_sym = len({s for syms, _ in words.values() for s in syms})
        n_pos = sum(len(syms) for syms, _ in words.values())
        out.append((k, l, r, c, n_sym, n_pos))
    return out


def test_bpe_merge_train_matches_pure_python(spark, sf_dir):
    """The window-algebra merge (gaps-and-islands run selection) must
    reproduce the sequential scanner's merge table and vocabulary
    trajectory exactly, round for round."""
    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load(spark, sf_dir, "documents").collect()
    }
    expected = _py_bpe(docs)
    got = [
        (
            r["round"],
            r["left_sym"],
            r["right_sym"],
            r["pair_count"],
            r["n_symbols_after"],
            r["n_positions_after"],
        )
        for r in all_queries()["text_bpe_merge_train"].fn(spark, sf_dir).collect()
    ]
    assert got == expected


def test_bpe_merge_train_trajectory_invariants(spark, sf_dir):
    """Structural BPE invariants, data-independent: each merge shrinks
    the positional stream by exactly pair_count-merged occurrences'
    consumed successors (positions strictly decrease), the vocabulary
    never shrinks (a merge ADDS one symbol and removes none until a
    constituent disappears), merge frequencies are non-increasing in a
    greedy trainer ONLY per identical stream — so we assert the weaker
    monotone-positions + bounded-vocab-growth pair that holds always."""
    rows = sorted(
        (
            (r["round"], r["pair_count"], r["n_symbols_after"], r["n_positions_after"])
            for r in all_queries()["text_bpe_merge_train"].fn(spark, sf_dir).collect()
        )
    )
    assert [k for k, *_ in rows] == list(range(1, BPE_ROUNDS + 1))
    for (_, c0, v0, p0), (_, c1, v1, p1) in zip(rows, rows[1:]):
        assert p1 < p0  # every merge consumes at least one position
        assert v0 <= v1 + 1 and v1 <= v0 + 1  # vocab moves by at most 1
        assert c1 > 0


def test_ccnet_buckets_match_pure_python(spark, sf_dir):
    """Third engine for the CCNet split: a pure-Python add-one bigram LM
    trained on the reference source must reproduce every candidate
    doc's average NLL (through the same decimal accumulation) and the
    per-language tercile labels."""
    import math
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark_for_ebook_classification_spark.operators.textops import (
        CCNET_REF_SOURCE,
    )

    def d6(x):
        return Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)

    rows = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    ).collect()
    docs = {
        r["doc_id"]: (r["lang"], r["source"], [t for t in r["text"].split(" ") if t])
        for r in rows
    }
    big_cnt, left_cnt, vocab = Counter(), Counter(), set()
    for lang, src, toks in docs.values():
        if src != CCNET_REF_SOURCE or len(toks) < 2:
            continue
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            big_cnt[(a, b)] += 1
            left_cnt[a] += 1
    v = len(vocab)

    scored = {}
    for doc_id, (lang, src, toks) in docs.items():
        if src == CCNET_REF_SOURCE or len(toks) < 2:
            continue
        acc, n = Decimal(0), 0
        for a, b in zip(toks, toks[1:]):
            nll = -math.log(
                (big_cnt.get((a, b), 0) + 1.0) / (left_cnt.get(a, 0) + v)
            )
            acc += d6(nll)
            n += 1
        scored[doc_id] = (lang, n, float(acc) / n)

    # per-lang terciles, (avg_nll, doc_id) order — SQL ntile semantics:
    # first (n mod 3) buckets get the extra rows
    expected_bucket = {}
    by_lang: dict = {}
    for doc_id, (lang, _, nll) in scored.items():
        by_lang.setdefault(lang, []).append((nll, doc_id))
    for lang, lst in by_lang.items():
        lst.sort()
        n = len(lst)
        base, extra = divmod(n, 3)
        sizes = [base + (1 if i < extra else 0) for i in range(3)]
        labels = ["head", "middle", "tail"]
        i = 0
        for b, size in enumerate(sizes):
            for _ in range(size):
                expected_bucket[lst[i][1]] = labels[b]
                i += 1

    got = {
        r["doc_id"]: (r["lang"], r["n_bigrams"], r["avg_nll"], r["bucket"])
        for r in all_queries()["text_ccnet_perplexity_buckets"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(scored)
    for doc_id, (lang, n, nll) in scored.items():
        glang, gn, gnll, gbucket = got[doc_id]
        assert (glang, gn) == (lang, n)
        assert abs(gnll - nll) < 1e-12
        assert gbucket == expected_bucket[doc_id]
    # every language splits into all three buckets when it has >= 3 docs
    for lang, lst in by_lang.items():
        if len(lst) >= 3:
            assert {got[d][3] for _, d in lst} == {"head", "middle", "tail"}


def _py_winnow(tokens: list[str]):
    """Textbook winnowing scanner: k-gram md5 hashes, sliding window of
    w, min selected with rightmost tie, selections deduplicated."""
    import hashlib

    from pyspark_for_ebook_classification_spark.operators.textops import (
        WINNOW_K,
        WINNOW_W,
    )

    m = len(tokens) - WINNOW_K + 1
    hs = [
        hashlib.md5(" ".join(tokens[p : p + WINNOW_K]).encode()).hexdigest()
        for p in range(m)
    ]
    out = set()
    for t in range(WINNOW_W - 1, m):
        window = hs[t - WINNOW_W + 1 : t + 1]
        mn = min(window)
        # rightmost occurrence of the min inside this window
        off = max(i for i, h in enumerate(window) if h == mn)
        out.add((t - WINNOW_W + 1 + off + 1, mn))  # 1-based position
    return out


def test_winnowing_matches_pure_python(spark, sf_dir):
    """The string-packed window argmin must reproduce the sequential
    winnowing scanner's fingerprint set exactly, per document."""
    from pyspark_for_ebook_classification_spark.operators.textops import (
        WINNOW_K,
        WINNOW_W,
    )

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load(spark, sf_dir, "documents").collect()
        if r["doc_id"] % 10 == 0
    }
    expected = {
        d: _py_winnow(toks)
        for d, toks in docs.items()
        if len(toks) >= WINNOW_K + WINNOW_W - 1
    }
    got: dict = {}
    for r in all_queries()["text_winnowing_fingerprints"].fn(spark, sf_dir).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    assert got == expected
    # density guarantee: at least one fingerprint per w-window, at most
    # one per window => count in [ceil(n_windows/w)... n_windows]
    for d, fps in expected.items():
        n_windows = len(docs[d]) - WINNOW_K + 1 - (WINNOW_W - 1)
        assert 1 <= len(fps) <= n_windows


def test_winnowing_shared_substring_guarantee(spark, tmp_path, sf_dir):
    """The detection-floor guarantee: two documents sharing a run of
    k+w-1 (= 6) tokens MUST share at least one fingerprint — planted
    fixture, end-to-end through the Spark query."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    shared = "alpha beta gamma delta epsilon zeta"
    texts = [
        "one two three " + shared + " four five six",
        "seven eight nine ten " + shared + " eleven",
    ]
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    rows = pa.table(
        {
            "doc_id": pa.array([1000000, 1000010], type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en", "en"], type=pa.string()),
            "source": pa.array(["srcX", "srcX"], type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    ).cast(src.schema.remove_metadata())
    pq.write_table(rows, os.path.join(tmp_path, "documents.parquet"))
    out: dict = {}
    for r in (
        all_queries()["text_winnowing_fingerprints"].fn(spark, str(tmp_path)).collect()
    ):
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    assert set(out) == {1000000, 1000010}
    assert out[1000000] & out[1000010], "shared 6-token run produced no shared fingerprint"


def test_bpe_train_and_winnow_parameterized_forms(spark):
    """The production entry points on ad-hoc frames: bpe_train must
    agree with the pure scanner on a tiny corpus at a NON-declared round
    count, and winnow_fingerprints must honor caller k/w (a window of 2
    selects every local min — denser than the declared w=4)."""
    from pyspark_for_ebook_classification_spark.operators.textops import (
        bpe_train,
        winnow_fingerprints,
    )

    rows = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new lower"),
        (3, "low new low new low"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(docs, rounds=3).collect()
    ]
    expected = [
        (k, l, r, c) for k, l, r, c, _, _ in _py_bpe({d: t.split() for d, t in rows})
    ][:3]
    assert got == expected

    fp2 = winnow_fingerprints(docs, k=2, w=2)
    fp4 = winnow_fingerprints(docs, k=2, w=4)
    n2 = {r["doc_id"]: 0 for r in fp2.collect()}
    for r in fp2.collect():
        n2[r["doc_id"]] += 1
    n4 = {d: 0 for d in n2}
    for r in fp4.collect():
        n4[r["doc_id"]] += 1
    # smaller window => denser (or equal) fingerprint index
    assert all(n2[d] >= n4.get(d, 0) for d in n2)
    assert all(v >= 1 for v in n2.values())


def test_winnowing_overlap_pairs_match_pure_python(spark, sf_dir):
    """Third engine for the overlap search: pure-Python fingerprints →
    df-capped pair counts → containment ratio (floor-form rounding) must
    match exactly, and the pair budget holds: pairs ≤ Σ C(df,2) over
    kept fingerprints ≤ OCC·(cap−1)/2."""
    import math
    from collections import Counter

    from pyspark_for_ebook_classification_spark.operators.textops import (
        WINNOW_FP_DF_MAX,
        WINNOW_K,
        WINNOW_W,
    )

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load(spark, sf_dir, "documents").collect()
        if r["doc_id"] % 10 == 0
    }
    fps = {
        d: {fp for _, fp in _py_winnow(toks)}
        for d, toks in docs.items()
        if len(toks) >= WINNOW_K + WINNOW_W - 1
    }
    df = Counter(fp for s in fps.values() for fp in s)
    kept = {
        d: {fp for fp in s if 2 <= df[fp] <= WINNOW_FP_DF_MAX}
        for d, s in fps.items()
    }
    expected = {}
    ids = sorted(kept)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = len(kept[a] & kept[b])
            if shared:
                ratio = shared / min(len(fps[a]), len(fps[b]))
                expected[(a, b)] = (
                    shared,
                    math.floor(ratio * 1000000.0 + 0.5) / 1000000.0,
                )

    got = {
        (r["doc_a"], r["doc_b"]): (r["n_shared"], r["overlap"])
        for r in all_queries()["text_winnowing_overlap_pairs"].fn(spark, sf_dir).collect()
    }
    assert got == expected

    kept_df = [c for c in df.values() if 2 <= c <= WINNOW_FP_DF_MAX]
    occ = sum(kept_df)
    assert sum(v[0] for v in got.values()) == sum(c * (c - 1) // 2 for c in kept_df)
    assert sum(v[0] for v in got.values()) <= occ * (WINNOW_FP_DF_MAX - 1) // 2

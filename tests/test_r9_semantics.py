"""Round-9 semantics: the production MOSS overlap search
(winnow_overlap_search) — detection-floor guarantee on planted quotes,
min_shared suppression, a pure-Python third-engine recount, and the
r8-ADVICE entry validations (k/w >= 1, the 9-digit position pad bound).
"""

from __future__ import annotations

import hashlib

import pytest

from pyspark_for_ebook_classification_spark.operators.textops import (
    WINNOW_FP_DF_MAX,
    winnow_fingerprints,
    winnow_overlap_search,
)


def _py_winnow_fps(tokens: list[str], k: int, w: int) -> set[tuple[int, str]]:
    """Textbook winnowing scanner, parameterized: md5 k-gram hashes,
    window of w grams, keep the min, ties to the RIGHTMOST, dedupe."""
    m = len(tokens) - k + 1
    if len(tokens) < k + w - 1:
        return set()
    grams = [
        (p, hashlib.md5(" ".join(tokens[p - 1 : p - 1 + k]).encode()).hexdigest())
        for p in range(1, m + 1)
    ]
    out: set[tuple[int, str]] = set()
    for t in range(w, m + 1):
        win = grams[t - w : t]
        best = min(win, key=lambda g: (g[1], -g[0]))
        out.add(best)
    return out


def _py_overlap_search(
    docs: dict[int, list[str]], k: int, w: int, min_shared: int, cap: int
) -> dict[tuple[int, int], tuple[int, float]]:
    """Pure-Python recount of the full search: fingerprint index →
    df-cap → pair count → min_shared floor → containment overlap."""
    import math

    fps = {d: {fp for _, fp in _py_winnow_fps(t, k, w)} for d, t in docs.items()}
    fps = {d: s for d, s in fps.items() if s}
    df: dict[str, int] = {}
    for s in fps.values():
        for fp in s:
            df[fp] = df.get(fp, 0) + 1
    kept = {d: {fp for fp in s if 2 <= df[fp] <= cap} for d, s in fps.items()}
    out = {}
    ids = sorted(kept)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            n = len(kept[a] & kept[b])
            if n >= min_shared:
                ov = math.floor(n / min(len(fps[a]), len(fps[b])) * 1e6 + 0.5) / 1e6
                out[(a, b)] = (n, ov)
    return out


def _mkdocs(spark, docs: dict[int, list[str]]):
    return spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], "doc_id bigint, text string"
    )


def _uniq(doc: int, n: int, start: int = 0) -> list[str]:
    return [f"d{doc}w{start + i}" for i in range(n)]


@pytest.mark.parametrize("k,w", [(3, 4), (2, 2), (5, 8)])
def test_planted_quote_floor_always_detected(spark, k, w):
    """The Schleimer guarantee, end-to-end through the SEARCH: a verbatim
    shared run of EXACTLY k + w - 1 tokens (the detection floor — one
    full window of w grams) must always surface the pair with
    min_shared=1, at any (k, w)."""
    quote = [f"q{i}" for i in range(k + w - 1)]
    docs = {
        # quote embedded mid-document between unique filler
        1: _uniq(1, 20) + quote + _uniq(1, 20, start=100),
        2: _uniq(2, 35) + quote + _uniq(2, 5, start=100),
        # bystander with no shared content
        3: _uniq(3, 60),
    }
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_overlap_search(_mkdocs(spark, docs), k=k, w=w).collect()
    }
    assert (1, 2) in got, f"floor-length quote missed at k={k} w={w}"
    assert got[(1, 2)] >= 1
    assert all(p == (1, 2) for p in got), f"false pairs: {got}"


def test_longer_quote_meets_fingerprint_floor_and_min_shared(spark):
    """A quote of L tokens yields >= floor((L - k + 1) / w) shared
    fingerprints (one per disjoint full window), so min_shared=s is a
    ~(s*w + k - 1)-token run floor: the long-quote pair survives
    min_shared=3 while a floor-length single-window quote is suppressed."""
    k, w = 3, 4
    long_quote = [f"L{i}" for i in range(k + 4 * w - 1)]  # >= 4 shared fps
    short_quote = [f"s{i}" for i in range(k + w - 1)]
    docs = {
        1: _uniq(1, 15) + long_quote + _uniq(1, 15, start=100),
        2: _uniq(2, 25) + long_quote + _uniq(2, 8, start=100),
        3: _uniq(3, 30) + short_quote + _uniq(3, 10, start=100),
        4: short_quote + _uniq(4, 40),
    }
    frame = _mkdocs(spark, docs)
    loose = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_overlap_search(frame, k=k, w=w, min_shared=1).collect()
    }
    assert loose[(1, 2)] >= (len(long_quote) - k + 1) // w
    assert (3, 4) in loose
    strict = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_overlap_search(frame, k=k, w=w, min_shared=3).collect()
    }
    assert (1, 2) in strict, "long quote must survive the min_shared floor"
    assert (3, 4) not in strict, "single-window coincidence must be suppressed"
    # min_shared only FILTERS: surviving pairs keep identical scores
    assert all(strict[p] == loose[p] for p in strict)


def test_overlap_search_matches_pure_python(spark):
    """Third engine: the full Spark search (index, df cap, pair count,
    min_shared, floor-rounded containment) must reproduce the pure-Python
    recount exactly on a mixed fixture — quotes, boilerplate hitting the
    df cap, and clean docs."""
    k, w = 3, 4
    quote = [f"Q{i}" for i in range(k + 2 * w - 1)]
    boiler = [f"B{i}" for i in range(k + w - 1)]  # in EVERY doc → df-capped out
    docs = {
        d: boiler + _uniq(d, 10 + 3 * d) + (quote if d in (2, 5, 8) else [])
        for d in range(1, 9)
    }
    cap = 2  # tight cap: boilerplate fp (df=8) dies, quote fps (df=3) die too
    expect = _py_overlap_search(docs, k, w, min_shared=1, cap=cap)
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["overlap"])
        for r in winnow_overlap_search(
            _mkdocs(spark, docs), k=k, w=w, min_shared=1, fp_df_max=cap
        ).collect()
    }
    assert got == expect
    # and with the default cap (16) the df=3 quote triple shows up
    expect16 = _py_overlap_search(docs, k, w, min_shared=1, cap=WINNOW_FP_DF_MAX)
    got16 = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["overlap"])
        for r in winnow_overlap_search(
            _mkdocs(spark, docs), k=k, w=w, min_shared=1
        ).collect()
    }
    assert got16 == expect16
    assert {(2, 5), (2, 8), (5, 8)} <= set(got16)


def test_winnow_entry_validation(spark):
    """r8 ADVICE: w < 1 (or k < 1) must raise — Spark's sequence(a, b)
    with a > b yields a DESCENDING sequence, so an unvalidated w=0 would
    silently emit spurious windows; bad min_shared/fp_df_max likewise."""
    frame = _mkdocs(spark, {1: _uniq(1, 30)})
    with pytest.raises(ValueError, match="w >= 1"):
        winnow_fingerprints(frame, k=3, w=0)
    with pytest.raises(ValueError, match="k >= 1"):
        winnow_fingerprints(frame, k=0, w=4)
    with pytest.raises(ValueError, match="min_shared"):
        winnow_overlap_search(frame, min_shared=0)
    with pytest.raises(ValueError, match="fp_df_max"):
        winnow_overlap_search(frame, fp_df_max=1)


def test_winnow_fingerprints_match_python_at_custom_kw(spark):
    """The parameterized index itself (not just the search) matches the
    textbook scanner at a non-default (k, w) — guards the m/position
    plumbing the r8-ADVICE when()-guard now sits on."""
    k, w = 4, 6
    docs = {
        7: [f"x{i % 17}" for i in range(60)],  # repeating tokens → hash ties
        8: _uniq(8, 45),
    }
    expect = {
        d: _py_winnow_fps(t, k, w) for d, t in docs.items()
    }
    got: dict[int, set] = {7: set(), 8: set()}
    for r in winnow_fingerprints(_mkdocs(spark, docs), k=k, w=w).collect():
        got[r["doc_id"]].add((r["pos"], r["fp"]))
    assert got == expect


def test_bpe_encode_matches_scanner(spark, sf_dir):
    """Third engine for text_bpe_encode_vocab (the ENCODE half of L6's
    loop): run the sequential Python scanner's 6 merges, then aggregate
    its final symbol stream per symbol — corpus occurrences (Σ word
    count) and word-type spread must match the query exactly, and total
    occurrences must conserve the corpus token-position count."""
    from collections import Counter

    from pyspark_for_ebook_classification_spark.operators.textops import (
        BPE_EOW,
        BPE_ROUNDS,
    )
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries
    from pyspark_for_ebook_classification_spark.sources.io import load

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load(spark, sf_dir, "documents").collect()
    }
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
    occ: Counter = Counter()
    types: Counter = Counter()
    for _w, (syms, cnt) in words.items():
        for s in syms:
            occ[s] += cnt
        for s in set(syms):
            types[s] += 1
    got = {
        r["symbol"]: (r["occurrences"], r["word_types"])
        for r in all_queries()["text_bpe_encode_vocab"].fn(spark, sf_dir).collect()
    }
    assert got == {s: (occ[s], types[s]) for s in occ}
    # conservation: encoded positions = Σ over word types of len(syms)·cnt
    assert sum(occ.values()) == sum(len(s) * c for s, c in words.values())

"""Round-12: a COMPLETE pure-Python replica of curate_incremental's
declared semantics (gopher defaults → exact keep-first + corpus
anti-join → index-at-rest near stage: static-capped cross contact +
batch-only capped clusters, corpus-wins admission), run against the
Spark library entry on seeded randomized corpora.

This is the third engine for the r12 index-at-rest rework (r11 verdict
task 3): the DuckDB oracle shares SQL builders with the Spark side, so
an error in the shared MATH would pass the hash gate — this replica
shares nothing (hashlib md5 / int arithmetic / union-find)."""

from __future__ import annotations

import hashlib
import random
import re

from pyspark_for_ebook_classification_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    MAX_BUCKET,
    MERSENNE_P,
    N_BANDS,
    N_HASHES,
    _lcg_seeds,
    curate_incremental,
)

BAND_ROWS = N_HASHES // N_BANDS
_A, _B = _lcg_seeds(N_HASHES)

_STOP = {"the", "of", "and", "a", "to", "in", "is", "it", "on", "for"}


def _tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


def _shingles(tokens: list[str]) -> list[str]:
    n = len(tokens)
    out, seen = [], set()
    for i in range(1, max(n - 2, 1) + 1):  # 1-based, least() padding
        s = " ".join(
            tokens[min(i + j, n) - 1] for j in range(3)
        )
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _sig(shingles: list[str]) -> list[int]:
    hms = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MERSENNE_P
        for s in shingles
    ]
    return [min((_A[i] * hm + _B[i]) % MERSENNE_P for hm in hms) for i in range(N_HASHES)]


def _bands_of(sig: list[int]) -> list[str]:
    return [
        "|".join(str(sig[b * BAND_ROWS + r]) for r in range(BAND_ROWS))
        for b in range(N_BANDS)
    ]


def _gopher_keep(text: str) -> bool:
    toks = _tokens(text)
    wc = len(toks)
    if wc == 0:
        return False
    mean_len = sum(len(t) for t in toks) / wc
    spw = len(re.findall(r"[#.]{3,}|[0-9]", text)) / wc
    awr = sum(1 for t in toks if re.search(r"[a-zA-Z]", t)) / wc
    nstop = len({t for t in toks if t in _STOP})
    return (
        5 <= wc <= 100000
        and 2.0 <= mean_len <= 12.0
        and spw < 0.3
        and awr > 0.6
        and nstop >= 1
    )


def _jac(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    return len(sa & sb) / len(sa | sb)


def _replica(batch: dict[int, str], corpus: dict[int, str]) -> dict[int, tuple]:
    qk = {i for i, t in batch.items() if _gopher_keep(t)}
    # exact: within-batch keep-first + corpus hash anti-join
    bh = {i: hashlib.sha256(batch[i].encode()).hexdigest() for i in qk}
    ch = {hashlib.sha256(t.encode()).hexdigest() for t in corpus.values()}
    first = {}
    for i in sorted(bh):
        first.setdefault(bh[i], i)
    ek = {i for i in qk if first[bh[i]] == i and bh[i] not in ch}
    # signatures (zero-token docs never reach here: gopher requires wc>0)
    bsig = {i: _shingles(_tokens(batch[i])) for i in ek}
    csig = {i: _shingles(_tokens(t)) for i, t in corpus.items() if _tokens(t)}
    bbands = {i: _bands_of(_sig(s)) for i, s in bsig.items() if s}
    cbands = {i: _bands_of(_sig(s)) for i, s in csig.items() if s}
    # static-side cap: corpus bucket population per (band_id, hash)
    pop: dict[tuple, int] = {}
    for bands in cbands.values():
        for b, h in enumerate(bands):
            pop[(b, h)] = pop.get((b, h), 0) + 1
    ok = {k for k, n in pop.items() if n <= MAX_BUCKET}
    # cross contact: any shared surviving bucket + exact jaccard
    hit = set()
    for ni, nb in bbands.items():
        for ci, cb in cbands.items():
            if any(
                nb[b] == cb[b] and (b, cb[b]) in ok for b in range(N_BANDS)
            ) and _jac(bsig[ni], csig[ci]) >= JACCARD_THRESHOLD:
                hit.add(ni)
                break
    # within-batch: capped buckets over the batch, verify, union-find
    bpop: dict[tuple, list[int]] = {}
    for i, bands in bbands.items():
        for b, h in enumerate(bands):
            bpop.setdefault((b, h), []).append(i)
    parent = {i: i for i in ek}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in bpop.values():
        if len(members) > MAX_BUCKET:
            continue
        for x in members:
            for y in members:
                if x < y and _jac(bsig[x], bsig[y]) >= JACCARD_THRESHOLD:
                    parent[find(x)] = find(y)
    clusters: dict[int, list[int]] = {}
    for i in ek:
        clusters.setdefault(find(i), []).append(i)
    nk = set()
    for members in clusters.values():
        if not any(m in hit for m in members):
            nk.add(min(members))
    return {
        i: (i in qk, i in ek, i in nk) for i in batch
    }


def _random_docs(rng: random.Random):
    vocab = [
        "the", "of", "and", "a", "to", "in", "is", "it", "on", "for",
        "river", "mountain", "harvest", "lantern", "quiet", "voyage",
        "amber", "signal", "meadow", "circuit", "winter", "basket",
    ]
    def sentence(n):
        return " ".join(rng.choice(vocab) for _ in range(n))
    corpus, batch = {}, {}
    base_docs = [sentence(rng.randint(8, 30)) for _ in range(6)]
    nid = 0
    for t in base_docs:
        corpus[nid * 4 + 1] = t  # ids ≢ 0 mod 4 by construction
        nid += 1
    bid = 0
    def next_bid():
        nonlocal bid
        bid += 4
        return bid  # multiples of 4
    for t in base_docs[:3]:
        # near-copy of corpus (suffix mutation), exact copy, fresh docs
        batch[next_bid()] = t + " " + rng.choice(vocab)
        batch[next_bid()] = t
    for _ in range(5):
        batch[next_bid()] = sentence(rng.randint(8, 30))
    # a within-batch near pair + an exact batch dup + junk
    t = sentence(rng.randint(12, 25))
    batch[next_bid()] = t + " winter"
    batch[next_bid()] = t + " amber"
    dup_src = min(batch)
    batch[next_bid()] = batch[dup_src]
    batch[next_bid()] = "#### 1234 %%%% 5678 !!!!"
    return batch, corpus


def test_incremental_curation_matches_pure_python_replica(spark):
    for seed in (7, 23, 99):
        rng = random.Random(seed)
        batch, corpus = _random_docs(rng)
        bdf = spark.createDataFrame(
            sorted(batch.items()), "doc_id bigint, text string"
        )
        cdf = spark.createDataFrame(
            sorted(corpus.items()), "doc_id bigint, text string"
        )
        got = {
            r.doc_id: (r.quality_keep, r.exact_admit, r.final_admit)
            for r in curate_incremental(bdf, cdf).collect()
        }
        want = _replica(batch, corpus)
        assert got == want, f"seed {seed}: {got} != {want}"
        # non-vacuity: each seed must exercise an admit AND a rejection
        assert any(v[2] for v in want.values()), f"seed {seed}: nothing admitted"
        assert any(not v[2] for v in want.values()), f"seed {seed}: nothing rejected"

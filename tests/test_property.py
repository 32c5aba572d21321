"""Property-based tests (SURVEY.md §5.4): scalar string/array functions
cross-checked against plain-Python reference implementations on
hypothesis-generated inputs. Each example ships a whole batch of strings
through ONE Spark job (per-example jobs would be prohibitively slow).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# ASCII-printable minus the quote-escaping troublemakers; unicode casing
# rules differ between JVM and Python, which is a known non-goal here.
TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=60,
)

PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _python_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@PROP_SETTINGS
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_string_functions_match_python(spark, strings):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i long, s string")
    rows = df.select(
        "i",
        F.length("s").alias("ln"),
        F.upper("s").alias("up"),
        F.lower("s").alias("lo"),
        F.reverse("s").alias("rev"),
        F.substring("s", 2, 3).alias("sub"),
        F.sha2("s", 256).alias("sha"),
        F.md5("s").alias("md5"),
    ).collect()
    for r in rows:
        s = strings[r["i"]]
        assert r["ln"] == len(s)
        assert r["up"] == s.upper()
        assert r["lo"] == s.lower()
        assert r["rev"] == s[::-1]
        assert r["sub"] == s[1:4]
        assert r["sha"] == hashlib.sha256(s.encode()).hexdigest()
        assert r["md5"] == hashlib.md5(s.encode()).hexdigest()


@PROP_SETTINGS
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=15))
def test_levenshtein_matches_python(spark, pairs):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "i long, a string, b string"
    )
    rows = df.select("i", F.levenshtein("a", "b").alias("lev")).collect()
    for r in rows:
        a, b = pairs[r["i"]]
        assert r["lev"] == _python_levenshtein(a, b)


@PROP_SETTINGS
@given(st.lists(st.lists(st.integers(-1000, 1000), max_size=30), min_size=1, max_size=20))
def test_array_functions_match_python(spark, arrays):
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i long, arr array<long>"
    )
    rows = df.select(
        "i",
        F.size("arr").alias("sz"),
        F.sort_array("arr").alias("sorted"),
        F.array_distinct("arr").alias("dedup"),
        F.slice(F.col("arr"), 1, 5).alias("head5"),
        F.array_max("arr").alias("mx"),
        F.array_min("arr").alias("mn"),
    ).collect()
    for r in rows:
        a = arrays[r["i"]]
        assert r["sz"] == len(a)
        assert r["sorted"] == sorted(a)
        assert r["dedup"] == list(dict.fromkeys(a))  # first-occurrence order
        assert r["head5"] == a[:5]
        assert r["mx"] == (max(a) if a else None)
        assert r["mn"] == (min(a) if a else None)


@PROP_SETTINGS
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_split_tokenize_matches_python(spark, strings):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i long, s string")
    rows = df.select(
        "i", F.split("s", " ").alias("toks"), F.split("s", ",", 2).alias("lim")
    ).collect()
    for r in rows:
        s = strings[r["i"]]
        assert r["toks"] == s.split(" ")
        assert r["lim"] == s.split(",", 1)  # Spark limit=2 ≡ Python maxsplit=1


# --- sparse shared-shingle Jaccard == brute-force set Jaccard ------------

WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
DOC = st.lists(WORDS, min_size=3, max_size=12).map(lambda ws: " ".join(ws))


def _brute_jaccard_pairs(texts):
    """Reference: exact trigram-set Jaccard over same-(lang,len-bucket)
    blocks, threshold 0.2 — the declared dedup_ngram_jaccard contract."""
    docs = []
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        if len(toks) < 3:
            continue
        sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        docs.append((i, int(len(toks) / 10), sh))
    out = {}
    for x in range(len(docs)):
        for y in range(x + 1, len(docs)):
            ia, ba, sa = docs[x]
            ib, bb, sb = docs[y]
            if ba != bb:
                continue
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= 0.2:
                out[(ia, ib)] = jac
    return out


@PROP_SETTINGS
@given(st.lists(DOC, min_size=2, max_size=15))
def test_sparse_jaccard_equals_bruteforce(spark, tmp_path_factory, texts):
    """The sparse shared-shingle join (dedup.py _ngram_pairs) must emit
    exactly the brute-force blocked Jaccard pairs — losslessness of the
    ≥1-shared-shingle prune on arbitrary corpora, not just driver data."""
    import os

    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    tmp = tmp_path_factory.mktemp("jacprop")
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(str(tmp), "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"]): r["trigram_jaccard"]
        for r in all_queries()["dedup_ngram_jaccard"].fn(spark, str(tmp)).collect()
    }
    want = _brute_jaccard_pairs(texts)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - round(v, 6)) < 1e-9


@PROP_SETTINGS
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 32) - 1), min_size=2, max_size=40
    )
)
def test_simhash_banding_lossless_within_radius(fingerprints):
    """Pigeonhole guarantee of dedup_simhash_hamming_pairs: 4 bands × 8
    bits over a 32-bit fingerprint find EVERY pair at Hamming distance ≤ 3
    (ignoring the boilerplate bucket cap, which these tiny sets never hit).
    Pure-Python model of the banding — no Spark needed."""
    fps = [format(v, "032b") for v in fingerprints]
    # brute-force truth
    truth = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            ham = sum(a != b for a, b in zip(fps[i], fps[j]))
            if ham <= 3:
                truth.add((i, j))
    # banded candidates (the query's generator)
    candidates = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            if any(fps[i][8 * b : 8 * b + 8] == fps[j][8 * b : 8 * b + 8] for b in range(4)):
                candidates.add((i, j))
    # banding may over-generate (verified away by the exact distance
    # filter) but must never miss a within-radius pair
    assert truth <= candidates


# --- containment == brute-force directional containment ------------------


def _brute_containment(texts, df_max=50, cmin=0.5):
    """Reference: directional |A∩B|/|A| over distinct-trigram sets with
    the document-frequency stop-shingle gate applied BEFORE pairing and
    denominators taken PRE-gate — the text_minhash_containment contract."""
    from collections import Counter

    sets = {}
    for i, t in enumerate(texts):
        toks = [w for w in t.split(" ") if w]
        if len(toks) < 3:
            continue
        sets[i] = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
    dfc = Counter(s for sh in sets.values() for s in sh)
    kept = {i: {s for s in sh if dfc[s] <= df_max} for i, sh in sets.items()}
    out = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(kept[a] & kept[b])
            if inter and inter / len(sets[a]) >= cmin:
                out[(a, b)] = inter / len(sets[a])
    return out


@PROP_SETTINGS
@given(st.lists(DOC, min_size=2, max_size=15))
def test_containment_equals_bruteforce(spark, tmp_path_factory, texts):
    """The bucket-expansion containment (r5 rebuild: triangular packed
    pairs, both directions re-emitted post-aggregation) must equal the
    brute-force directional containment on arbitrary corpora — including
    the df gate and the PRE-gate denominators."""
    import os

    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    tmp = tmp_path_factory.mktemp("contprop")
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp), "documents.parquet")
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in all_queries()["text_minhash_containment"].fn(spark, str(tmp)).collect()
    }
    want = _brute_containment(texts)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - round(v, 6)) < 1e-9


def test_containment_df_gate_truncates_hot_shingle(spark, tmp_path_factory):
    """SHINGLE_DF_MAX is the quadratic-blowup guard: a shingle shared by
    MORE than SHINGLE_DF_MAX docs must generate no pairs at all (its
    bucket never materializes), while denominators stay pre-gate. Build
    51+ docs sharing one boilerplate trigram plus two genuine near-dups
    — only the genuine pair may survive."""
    import os

    from pyspark_for_ebook_classification_spark.operators.corpus import (
        SHINGLE_DF_MAX,
    )
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    hot = "all rights reserved"
    texts = [f"{hot} filler{i} pad{i} tail{i}" for i in range(SHINGLE_DF_MAX + 1)]
    # two genuine near-dups whose shared trigrams are BELOW the gate
    texts.append("unique shared trigram body one")
    texts.append("unique shared trigram body two")
    tmp = tmp_path_factory.mktemp("contgate")
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp), "documents.parquet")
    )
    rows = all_queries()["text_minhash_containment"].fn(spark, str(tmp)).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    n_hot = SHINGLE_DF_MAX + 1
    # no pair involves two hot-only docs (their ONLY shared shingle is gated)
    assert not any(a < n_hot and b < n_hot for a, b in pairs), pairs
    # the genuine near-dup pair survives in both directions
    assert (n_hot, n_hot + 1) in pairs and (n_hot + 1, n_hot) in pairs, pairs


# --- substring spans == brute-force anchor coverage -----------------------


def _python_substring_spans(texts, k=8):
    """Literal transcription of the dedup_substring_spans contract: a
    position is duplicated iff its k-gram occurs >= 2 times corpus-wide
    (self-repeats included); spans merge overlapping/adjacent anchor
    intervals; report (n_tokens, dup_spans, dup_tokens) per doc."""
    from collections import Counter

    toks = [[t for t in text.split(" ") if t] for text in texts]
    grams: Counter = Counter()
    for tt in toks:
        for i in range(len(tt) - k + 1):
            grams[tuple(tt[i : i + k])] += 1
    out = {}
    for d, tt in enumerate(toks):
        hits = [
            i
            for i in range(len(tt) - k + 1)
            if grams[tuple(tt[i : i + k])] >= 2
        ]
        spans: list[list[int]] = []
        for p in hits:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            else:
                spans.append([p, p + k - 1])
        if spans:
            out[d] = (
                len(tt),
                len(spans),
                sum(e - s + 1 for s, e in spans),
            )
    return out


#: tiny vocabulary so duplicated 8-grams actually arise in short docs
_SPAN_DOC = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=30
).map(" ".join)


@PROP_SETTINGS
@given(st.lists(_SPAN_DOC, min_size=1, max_size=12))
def test_substring_spans_equal_bruteforce(spark, tmp_path_factory, texts):
    """dedup_substring_spans must equal the pure-Python anchor-coverage
    reference on arbitrary corpora — including all-identical docs (full
    coverage), heavy within-doc repetition from the 4-token vocabulary,
    and sub-K docs (no row). Pins the island-merge arithmetic and the
    hash-vs-string k-gram grouping equivalence far from driver data."""
    import os

    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    tmp = tmp_path_factory.mktemp("spanprop")
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp), "documents.parquet")
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["dup_tokens"])
        for r in all_queries()["dedup_substring_spans"].fn(spark, str(tmp)).collect()
    }
    assert got == _python_substring_spans(texts)

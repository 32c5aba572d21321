"""Round-10: exact_dedup and gopher_gate production entries — pinned
against their declared fixed-workload queries, planted fixtures, and
threshold validation.
"""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark_for_ebook_classification_spark.operators.dedup import exact_dedup
from pyspark_for_ebook_classification_spark.operators.textops import gopher_gate
from pyspark_for_ebook_classification_spark.plans.registry import all_queries
from pyspark_for_ebook_classification_spark.sources.io import load


def test_exact_dedup_matches_registered_query(spark, sf_dir):
    """Grouping the library output by content hash must reproduce the
    declared dedup_exact_sha rows (keep-first id + copy count) exactly."""
    expected = {
        r.content_hash: (r.keep_doc_id, r.n_copies)
        for r in all_queries()["dedup_exact_sha"].fn(spark, sf_dir).collect()
    }
    out = exact_dedup(load(spark, sf_dir, "documents")).collect()
    keeps = {r.content_hash: r.doc_id for r in out if r.keep}
    counts = Counter(r.content_hash for r in out)
    assert {h: (keeps[h], counts[h]) for h in counts} == expected
    # exactly one keeper per hash, and it is the min id
    by_hash: dict[str, list[int]] = {}
    for r in out:
        by_hash.setdefault(r.content_hash, []).append(r.doc_id)
    for h, ids in by_hash.items():
        assert keeps[h] == min(ids)


def test_exact_dedup_planted(spark):
    docs = spark.createDataFrame(
        [(3, "same text"), (1, "same text"), (2, "different")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r.keep for r in exact_dedup(docs).collect()}
    assert out == {1: True, 3: False, 2: True}


def test_gopher_gate_matches_registered_query(spark, sf_dir):
    """At the registry thresholds over the declared 1/5 sample, the
    library must reproduce text_gopher_quality_rules row-for-row."""
    expected = sorted(
        tuple(r) for r in all_queries()["text_gopher_quality_rules"].fn(
            spark, sf_dir
        ).collect()
    )
    d = load(spark, sf_dir, "documents").filter("doc_id % 5 = 0")
    got = sorted(tuple(r) for r in gopher_gate(d).collect())
    assert got == expected


def test_gopher_gate_thresholds_move_the_gate(spark, sf_dir):
    """Re-gating at stricter thresholds keeps a subset; features are
    threshold-independent."""
    d = load(spark, sf_dir, "documents").filter("doc_id % 5 = 0")
    base = gopher_gate(d)
    strict = gopher_gate(d, min_words=30)
    kept_base = {r.doc_id for r in base.collect() if r.keep}
    kept_strict = {r.doc_id for r in strict.collect() if r.keep}
    assert kept_strict <= kept_base
    f_base = {r.doc_id: r.word_count for r in base.collect()}
    f_strict = {r.doc_id: r.word_count for r in strict.collect()}
    assert f_base == f_strict


def test_gopher_gate_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on a mat and it is warm today for sure"),  # keep
            (2, "x y"),  # too few words
            (3, "000 111 222 333 444 555 666 777 888 999"),  # symbols, no alpha
            (4, ""),  # zero tokens -> dropped entirely
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r.keep for r in gopher_gate(docs).collect()}
    assert rows == {1: True, 2: False, 3: False}


@pytest.mark.parametrize(
    "kwargs",
    [
        {"min_words": 10, "max_words": 5},
        {"min_mean_word_len": 5.0, "max_mean_word_len": 2.0},
        {"min_alpha_word_ratio": 1.5},
        {"max_symbol_per_word": -0.1},
        {"min_distinct_stopwords": 99},
    ],
)
def test_gopher_gate_validation(spark, kwargs):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError):
        gopher_gate(docs, **kwargs)


def test_semdedup_matches_registered_query(spark, sf_dir):
    """At the defaults on the labeled embeddings table, the library must
    reproduce dedup_semantic_embedding row-for-row."""
    from pyspark_for_ebook_classification_spark.operators.similarity import semdedup

    expected = sorted(
        tuple(r)
        for r in all_queries()["dedup_semantic_embedding"].fn(spark, sf_dir).collect()
    )
    got = sorted(
        tuple(r) for r in semdedup(load(spark, sf_dir, "embeddings")).collect()
    )
    assert got == expected


def test_semdedup_planted_and_unlabeled(spark):
    """Identical vectors share every SRP bit (same cell at any depth):
    the higher id is dropped at tau below 1.0; an orthogonal vector is
    kept even when co-celled. label_col=None cells purely by prefix."""
    from pyspark_for_ebook_classification_spark.operators.similarity import semdedup

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),   # exact duplicate of 1
            (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
        ],
        "vec_id int, embedding array<double>",
    )
    out = {
        r.vec_id: r.keep
        for r in semdedup(vecs, tau=0.9, label_col=None, dim=4).collect()
    }
    assert out[1] is True
    assert out[2] is False  # cos 1.0 >= 0.9 to lower-id 1
    assert out[3] is True   # max cos to any lower-id vector is 0.0


def test_semdedup_tau_moves_the_gate(spark, sf_dir):
    """Lower tau drops MORE (tau is a cosine floor): keep-set at tau=0.2
    must be a subset of the keep-set at tau=0.3."""
    from pyspark_for_ebook_classification_spark.operators.similarity import semdedup

    e = load(spark, sf_dir, "embeddings")
    keep_03 = {r.vec_id for r in semdedup(e, tau=0.3).collect() if r.keep}
    keep_02 = {r.vec_id for r in semdedup(e, tau=0.2).collect() if r.keep}
    assert keep_02 <= keep_03
    assert len(keep_02) < len(keep_03)


@pytest.mark.parametrize(
    "kwargs",
    [{"tau": 0.0}, {"tau": 1.5}, {"target_cell": 0}, {"max_refine": -1}, {"max_refine": 31}],
)
def test_semdedup_validation(spark, kwargs):
    from pyspark_for_ebook_classification_spark.operators.similarity import semdedup

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError):
        semdedup(vecs, label_col=None, **kwargs)


def test_nb_classify_matches_registered_twin(spark, sf_dir):
    """nb_classify at alpha=1.0 on the twin's own md5-band split must
    reproduce ml_nb_relational_twin's predictions and scores exactly."""
    from pyspark.sql import functions as F

    from pyspark_for_ebook_classification_spark.ml.queries import (
        _NB_CUT,
        _NB_SEED,
        nb_classify,
    )

    expected = {
        r.doc_id: (r.pred_lang, r.nb_log_score)
        for r in all_queries()["ml_nb_relational_twin"].fn(spark, sf_dir).collect()
    }
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "#", F.col("doc_id").cast("string"), F.lit(str(_NB_SEED))
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    train = d.filter(bucket < _NB_CUT)
    test = d.filter(bucket >= _NB_CUT)
    got = {
        r.doc_id: (r.pred_lang, r.nb_log_score)
        for r in nb_classify(train, test, alpha=1.0).collect()
    }
    assert got == expected


def test_nb_classify_planted(spark):
    """Obvious two-class separation: test docs built from one class's
    vocabulary classify to that class; an all-OOV doc emits no row."""
    from pyspark_for_ebook_classification_spark.ml.queries import nb_classify

    train = spark.createDataFrame(
        [
            (1, "spam", "buy cheap pills now buy now"),
            (2, "spam", "cheap pills cheap offer"),
            (3, "ham", "meeting notes agenda project"),
            (4, "ham", "project meeting tomorrow agenda"),
        ],
        "doc_id int, lang string, text string",
    )
    test = spark.createDataFrame(
        [
            (10, "buy pills cheap"),
            (11, "project agenda meeting"),
            (12, "zzz qqq www"),  # fully out-of-vocab
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r.pred_lang for r in nb_classify(train, test).collect()}
    assert out == {10: "spam", 11: "ham"}


def test_nb_classify_custom_columns_and_alpha(spark):
    from pyspark_for_ebook_classification_spark.ml.queries import nb_classify

    train = spark.createDataFrame(
        [("a", "pos", "good great fine"), ("b", "neg", "bad awful poor")],
        "uri string, sentiment string, body string",
    )
    test = spark.createDataFrame(
        [("x", "good fine"), ("y", "awful bad")], "uri string, body string"
    )
    out = {
        r.uri: r.pred_sentiment
        for r in nb_classify(
            train,
            test,
            alpha=0.5,
            id_col="uri",
            label_col="sentiment",
            text_col="body",
        ).collect()
    }
    assert out == {"x": "pos", "y": "neg"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        nb_classify(train, test, alpha=0.0)


def test_bpe_apply_of_trained_merges_matches_encode_query(spark, sf_dir):
    """bpe_train -> collect merge table -> bpe_apply must reproduce the
    declared text_bpe_encode_vocab aggregate exactly — the library-level
    train->apply loop equals the oracle-gated one."""
    from collections import Counter

    from pyspark_for_ebook_classification_spark.operators.textops import (
        BPE_ROUNDS,
        bpe_apply,
        bpe_train,
    )

    d = load(spark, sf_dir, "documents")
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_train(d, rounds=BPE_ROUNDS).orderBy("round").collect()
    ]
    applied = bpe_apply(d, merges).collect()
    occ: Counter = Counter()
    types: Counter = Counter()
    for r in applied:
        for s in r.symbols:
            occ[s] += r.cnt
        for s in set(r.symbols):
            types[s] += 1
    expected = {
        r.symbol: (r.occurrences, r.word_types)
        for r in all_queries()["text_bpe_encode_vocab"].fn(spark, sf_dir).collect()
    }
    assert {s: (occ[s], types[s]) for s in occ} == expected
    # decode identity at the library level: symbols re-concatenate to
    # the original word (+ the end-of-word marker)
    for r in applied:
        assert "".join(r.symbols) == r.word + "</w>"
        assert r.n_symbols == len(r.symbols)


def test_bpe_apply_planted_fixed_merges(spark):
    """Replaying a hand-written merge table (not trained on this corpus)
    must match the sequential scanner with the same fixed merges —
    greedy left-to-right non-overlapping per pair, in table order."""
    from pyspark_for_ebook_classification_spark.operators.textops import bpe_apply

    docs = spark.createDataFrame(
        [(1, "abab abba aaaa")], "doc_id int, text string"
    )
    merges = [("a", "b"), ("ab", "ab")]

    def scan(word, table):
        syms = list(word) + ["</w>"]
        for l, r in table:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {r.word: list(r.symbols) for r in bpe_apply(docs, merges).collect()}
    assert got == {w: scan(w, merges) for w in ("abab", "abba", "aaaa")}


def test_bpe_apply_long_table_crosses_lineage_cut(spark):
    """r15 (r14 ADVICE): replaying a merge table longer than the 32-merge
    lineage-cut interval must give the same answer as the sequential
    scanner — the periodic localCheckpoint bounds plan depth for
    production-scale tables and must be invisible to the result. The
    table interleaves real merges across both sides of the cut boundary
    (merge 40 consumes the output of merge 1) with inert padding pairs."""
    from pyspark_for_ebook_classification_spark.operators.textops import bpe_apply

    docs = spark.createDataFrame(
        [(1, "abab abba aaaa"), (2, "baba cabc")], "doc_id int, text string"
    )
    # 1 real + 38 inert + 1 real-cascading + 5 inert = 45 merges (two cuts)
    merges = (
        [("a", "b")]
        + [(f"x{i}", f"y{i}") for i in range(38)]
        + [("ab", "ab")]
        + [(f"p{i}", f"q{i}") for i in range(5)]
    )

    def scan(word, table):
        syms = list(word) + ["</w>"]
        for l, r in table:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {r.word: list(r.symbols) for r in bpe_apply(docs, merges).collect()}
    words = ("abab", "abba", "aaaa", "baba", "cabc")
    assert got == {w: scan(w, merges) for w in words}


def test_bpe_apply_validation(spark):
    from pyspark_for_ebook_classification_spark.operators.textops import bpe_apply

    docs = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bpe_apply(docs, [("a", "")])
    with _pytest.raises(ValueError):
        bpe_apply(docs, [("a",)])
    # empty merge table is the identity tokenizer (chars + eow)
    out = {r.word: list(r.symbols) for r in bpe_apply(docs, []).collect()}
    assert out == {"a": ["a", "</w>"], "b": ["b", "</w>"]}


def test_curate_matches_declared_pipeline(spark, sf_dir):
    """curate() at the defaults must equal data_curation_pipeline
    row-for-row — the convenience wrapper IS the declared query."""
    from pyspark_for_ebook_classification_spark.operators.dedup import curate

    expected = sorted(
        tuple(r)
        for r in all_queries()["data_curation_pipeline"].fn(spark, sf_dir).collect()
    )
    got = sorted(
        tuple(r) for r in curate(load(spark, sf_dir, "documents")).collect()
    )
    assert got == expected


def test_curate_thresholds_move_stages(spark, sf_dir):
    """Stricter quality thresholds shrink the whole funnel; verdicts stay
    monotone at any parameters."""
    from pyspark_for_ebook_classification_spark.operators.dedup import curate

    d = load(spark, sf_dir, "documents")
    base = curate(d).collect()
    strict = curate(d, gopher_params={"min_words": 30}).collect()
    kept = {r.doc_id for r in base if r.final_keep}
    kept_strict = {r.doc_id for r in strict if r.final_keep}
    assert kept_strict <= kept
    for r in strict:
        assert not (r.final_keep and not r.exact_keep)
        assert not (r.exact_keep and not r.quality_keep)

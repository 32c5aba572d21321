"""Round-11: decontaminate + tokenize_pack production entries — default
pins against the registered queries, parameter validation, and planted
fixtures."""

from __future__ import annotations

import pytest

from pyspark_for_ebook_classification_spark.operators.datapipe import (
    _LIB_PACK_SEQ,
    decontaminate,
    tokenize_pack,
)
from pyspark_for_ebook_classification_spark.plans.registry import all_queries
from pyspark_for_ebook_classification_spark.sources.io import load

QUERIES = all_queries()


def test_decontaminate_default_matches_registered_query(spark, sf_dir):
    """decontaminate at n=8 on the registered source split must equal
    data_decontaminate_ngram row for row."""
    from pyspark.sql import functions as F

    from pyspark_for_ebook_classification_spark.operators.datapipe import (
        _EVAL_SOURCES,
    )

    d = load(spark, sf_dir, "documents")
    is_eval = F.col("source").isin(*_EVAL_SOURCES)
    lib = {
        tuple(r)
        for r in decontaminate(d.filter(~is_eval), d.filter(is_eval)).collect()
    }
    reg = {
        tuple(r)
        for r in QUERIES["data_decontaminate_ngram"].fn(spark, sf_dir).collect()
    }
    assert lib == reg and len(lib) > 0


def test_decontaminate_planted_leak(spark):
    """A train doc quoting an eval passage verbatim is flagged; an
    unrelated doc is not; a doc shorter than n emits no row."""
    evals = spark.createDataFrame(
        [(900, "the secret benchmark answer is forty two exactly here")],
        "doc_id bigint, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "intro text then the secret benchmark answer is forty two exactly here and more"),
            (2, "a completely different document about boats and rivers flowing south"),
            (3, "too short"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in decontaminate(train, evals, n=8).collect()}
    assert 3 not in out  # < n tokens -> no n-grams -> no row
    assert out[1].is_contaminated == 1 and out[1].n_hits > 0
    assert out[2].is_contaminated == 0 and out[2].n_hits == 0


def test_decontaminate_validation(spark):
    d = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        decontaminate(d, d, n=0)


def test_tokenize_pack_matches_declared_query(spark, sf_dir):
    """The declared pipeline IS tokenize_pack(partition_col='lang') at
    the defaults."""
    lib = {
        tuple(r)
        for r in tokenize_pack(
            load(spark, sf_dir, "documents"), partition_col="lang"
        ).collect()
    }
    reg = {
        tuple(r)
        for r in QUERIES["data_tokenize_pack_pipeline"].fn(spark, sf_dir).collect()
    }
    assert lib == reg and len(lib) > 0


def test_tokenize_pack_layout_invariants(spark, sf_dir):
    """The greedy layout is exact: within each (lang), walking docs in
    doc_id order, each doc's (pack_id, pack_offset) equals the running
    token total div/mod seq_len — recomputed in pure Python."""
    rows = sorted(
        QUERIES["data_tokenize_pack_pipeline"].fn(spark, sf_dir).collect(),
        key=lambda r: (r.lang, r.doc_id),
    )
    cum: dict[str, int] = {}
    for r in rows:
        start = cum.get(r.lang, 0)
        assert r.pack_id == start // _LIB_PACK_SEQ, r
        assert r.pack_offset == start % _LIB_PACK_SEQ, r
        cum[r.lang] = start + r.n_bpe_tokens
    assert sum(cum.values()) > 0


def test_tokenize_pack_counts_bpe_not_words(spark):
    """A word the 5-merge tokenizer splits into k symbols contributes k,
    not 1 — the whole point vs data_pack_sequences. 'scan' encodes to
    ['scan', '</w>'] (2 symbols) under merges s+c, a+n, sc+an; an
    unmergeable word of length L contributes L+1."""
    docs = spark.createDataFrame(
        [(1, "scan scan"), (2, "xyz")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in tokenize_pack(docs, seq_len=8).collect()}
    assert out[1].n_bpe_tokens == 4  # 2 symbols x 2 occurrences
    assert out[2].n_bpe_tokens == 4  # x,y,z,</w> — no merge applies
    # and the layout: doc 1 fills [0,4), doc 2 starts at offset 4
    assert (out[1].pack_id, out[1].pack_offset) == (0, 0)
    assert (out[2].pack_id, out[2].pack_offset) == (0, 4)


def test_tokenize_pack_empty_docs_count_zero_and_keep_position(spark):
    """Docs whose text yields no words (empty, whitespace-only, NULL)
    count 0 BPE tokens and still receive a pack position — pinned
    because the r15 single-scan form routes doc identity through an
    explode_outer word stream instead of a join-back, and an inner
    explode would silently drop exactly these rows."""
    docs = spark.createDataFrame(
        [(1, "scan"), (2, ""), (3, "   "), (4, None), (5, "xyz")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in tokenize_pack(docs, seq_len=4).collect()}
    assert sorted(out) == [1, 2, 3, 4, 5]
    assert out[1].n_bpe_tokens == 2  # ['scan', '</w>'] under sc+an
    assert out[2].n_bpe_tokens == 0
    assert out[3].n_bpe_tokens == 0
    assert out[4].n_bpe_tokens == 0
    assert out[5].n_bpe_tokens == 4  # x,y,z,</w>
    # layout: cum sums 2,2,2,2,6 → doc 5 starts at offset 2 of pack 0,
    # empty docs sit where the running sum left them
    assert (out[1].pack_id, out[1].pack_offset) == (0, 0)
    assert (out[2].pack_id, out[2].pack_offset) == (0, 2)
    assert (out[3].pack_id, out[3].pack_offset) == (0, 2)
    assert (out[4].pack_id, out[4].pack_offset) == (0, 2)
    assert (out[5].pack_id, out[5].pack_offset) == (0, 2)


def test_tokenize_pack_validation(spark):
    d = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        tokenize_pack(d, seq_len=0)


def test_lang_id_default_aggregates_to_registered_confusion(spark, sf_dir):
    """lang_id at vocab_k=20 (the registered default), self-trained on
    the corpus, must aggregate per (true, pred) to exactly the
    text_lang_id_ngram confusion matrix."""
    from collections import Counter

    from pyspark_for_ebook_classification_spark.operators.textops import lang_id

    d = load(spark, sf_dir, "documents")
    preds = {r.doc_id: r.pred_lang for r in lang_id(d, d).collect()}
    truth = {r.doc_id: r.lang for r in d.select("doc_id", "lang").collect()}
    got = Counter((truth[i], p) for i, p in preds.items())
    want = {
        (r.true_lang, r.pred_lang): r.n_docs
        for r in QUERIES["text_lang_id_ngram"].fn(spark, sf_dir).collect()
    }
    assert dict(got) == want and sum(want.values()) > 0


def test_lang_id_planted_and_validation(spark):
    """A doc made of language-A vocabulary classifies to A; a doc with
    no vocabulary token emits no row; vocab_k must be >= 1."""
    import pytest as _pytest

    from pyspark_for_ebook_classification_spark.operators.textops import lang_id

    labeled = spark.createDataFrame(
        [
            (1, "aa", "alpha beta gamma delta"),
            (2, "bb", "uno dos tres cuatro"),
        ],
        "doc_id bigint, lang string, text string",
    )
    docs = spark.createDataFrame(
        [(10, "beta gamma"), (11, "dos uno uno"), (12, "zzz qqq")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in lang_id(docs, labeled, vocab_k=4).collect()}
    assert out[10].pred_lang == "aa" and out[10].hits == 2
    assert out[11].pred_lang == "bb" and out[11].hits == 2  # distinct tokens
    assert 12 not in out
    with _pytest.raises(ValueError):
        lang_id(docs, labeled, vocab_k=0)

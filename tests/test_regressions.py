"""Regression tests for latent semantic bugs found by the r3/r4 audits —
each one builds a tiny adversarial fixture the driver's testdata can't
express (mixed-case keys, 7-digit ids) and runs the REGISTERED query fn
against the DuckDB oracle over the same parquet, so the exact failure
mode that parity-on-fixture-data could never catch is pinned forever.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from pyspark_for_ebook_classification_spark.plans.registry import get
from tests.compare import assert_frames_match


def _oracle(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    return con.sql(sql).df()


@pytest.fixture()
def duck_tmp():
    con = duckdb.connect()
    yield con
    con.close()


def test_map_hof_suite_mixed_case_keys(spark, tmp_path, duck_tmp):
    """fn_map_hof_suite once looked up share_map/freq_map (keyed by the
    ORIGINAL event_type) with lower(upper(event_type)) — correct only
    while every fixture event type was lowercase: mixed-case input made
    share NULL and is_frequent false while the oracle returned values.
    Writing this test also surfaced a second failure mode — upper-casing
    inside transform_keys throws Spark's duplicate-map-key error when two
    raw types collide after normalization ('buy'/'Buy'), where the
    relational oracle just merges the group. The contract is now: case
    normalization happens at aggregation time in BOTH engines, map keys
    are unique by construction, lookups use the carried key."""
    rows = []
    # user 0: 12 'Click' (mixed case → is_frequent TRUE), 3 'VIEW'
    rows += [(0, "Click", 1.5)] * 12 + [(0, "VIEW", 2.0)] * 3
    # user 25: 2 'buy' + 2 'Buy' — collide after normalization; both
    # engines must merge them into one BUY group (n=4)
    rows += [(25, "buy", 10.0)] * 2 + [(25, "Buy", 4.0)] * 2
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "value"])
    # load() normalizes the events ts column across testdata generations —
    # the fixture must carry one even though the query never reads it
    pdf["ts"] = pd.Timestamp("2024-01-01", tz="UTC") + pd.to_timedelta(
        pdf.index, unit="min"
    )
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)
    duck_tmp.sql(
        f"CREATE OR REPLACE VIEW events AS SELECT * FROM read_parquet('{path}')"
    )
    q = get("fn_map_hof_suite")
    # the query fn loads f"{sf_dir}/events.parquet" — both engines read
    # the identical file
    spark_pdf = q.fn(spark, str(tmp_path)).toPandas()
    # sanity: mixed-case keys must not produce NULL shares
    assert spark_pdf["share"].notna().all(), spark_pdf
    assert bool(
        spark_pdf.loc[spark_pdf["etype"] == "CLICK", "is_frequent"].iloc[0]
    )
    # case-colliding raws merged, not thrown on and not duplicated
    buy = spark_pdf[spark_pdf["etype"] == "BUY"]
    assert len(buy) == 1 and int(buy["n"].iloc[0]) == 4, buy
    oracle_pdf = _oracle(duck_tmp, q.oracle)
    assert_frames_match(spark_pdf, oracle_pdf, "fn_map_hof_suite[mixed-case]")


def test_snapshot_diff_large_ids_no_remint_collision(spark, tmp_path, duck_tmp):
    """data_snapshot_diff once re-minted ids as doc_id + 1e6 — colliding
    with GENUINE ids once the corpus exceeds a million documents, and the
    oracle mirrored the arithmetic so parity alone could never catch it.
    With the 1e12 offset, a corpus holding both doc_id=19 (re-minted) and
    doc_id=1_000_019 (genuine) must keep them distinct."""
    pdf = pd.DataFrame(
        {
            "doc_id": [19, 1_000_019, 5, 13],
            "text": ["remint me", "genuine big id", "stable", "changes"],
        }
    )
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)
    duck_tmp.sql(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    q = get("data_snapshot_diff")
    spark_pdf = q.fn(spark, str(tmp_path)).toPandas()
    oracle_pdf = _oracle(duck_tmp, q.oracle)
    assert_frames_match(spark_pdf, oracle_pdf, "data_snapshot_diff[large-id]")
    by_id = dict(zip(spark_pdf["doc_id"], spark_pdf["status"]))
    # old doc 19 is gone (removed) and reappears re-minted far above any
    # real id; genuine 1_000_019 is untouched (absent from the diff)
    assert by_id.get(19) == "removed"
    assert by_id.get(19 + 10**12) == "added"
    assert 1_000_019 not in by_id
    assert 19 + 10**6 not in by_id  # the old colliding remint scheme


def test_no_expensive_expression_beside_explode():
    """Static lint for the Generate-recompute hazard: Catalyst evaluates
    projections above a Generate once per OUTPUT row, so any non-trivial
    expression projected in the same .select() as an F.explode /
    F.posexplode re-runs per exploded element — measured 12× on the
    _ngram_pairs shingle stage before the r5 fix. Operator code must
    carry only plain columns (or pre-computed scalars) through a
    Generate; sizes/hashes join back on the post-aggregation (pair- or
    group-sized) side instead. F.size over a COLLECTED array column
    (post-groupBy attr) is O(1) and allowed — the hazard is F.size /
    F.transform / hash functions applied to a COMPUTED alias from the
    producing select, which this lint detects per select block.

    The scanner is tokenize-based (r5 ADVICE: the old bounded-depth regex
    both skipped deeply nested select blocks and flagged expensive calls
    that are ARGUMENTS to the explode — evaluated once per input row, not
    per output row). Tokens make paren balancing exact regardless of
    nesting and immune to unbalanced parens inside SQL strings; an
    expensive call is an offender only when it lies OUTSIDE every
    explode(...) argument span in the same select block."""
    import glob
    import io
    import re
    import tokenize

    root = os.path.join(os.path.dirname(__file__), "..",
                        "pyspark_for_ebook_classification_spark")
    EXPENSIVE = {
        "size", "transform", "aggregate", "slice",
        "sha2", "md5", "xxhash64", "array_distinct",
    }
    EXPLODE = {"explode", "posexplode", "explode_outer", "posexplode_outer"}
    expensive_str_re = re.compile(
        r"\b(" + "|".join(EXPENSIVE) + r")\s*\("
    )  # also catch F.expr('... size(...)') smuggling in a sibling arg

    def _select_blocks(toks):
        """Yield (line, [token indices]) for each .select(...) call,
        exact paren balancing on OP tokens (strings are atomic)."""
        for i, t in enumerate(toks):
            if (
                t.type == tokenize.NAME
                and t.string == "select"
                and i >= 1
                and toks[i - 1].string == "."
                and i + 1 < len(toks)
                and toks[i + 1].string == "("
            ):
                depth, j = 0, i + 1
                while j < len(toks):
                    if toks[j].string in "([{":
                        depth += 1
                    elif toks[j].string in ")]}":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                yield t.start[0], list(range(i + 2, j))

    def _call_spans(toks, idxs, names):
        """Index ranges covering the argument list of F.<name>(...) calls."""
        spans = []
        for k in idxs:
            if (
                toks[k].type == tokenize.NAME
                and toks[k].string in names
                and k >= 2
                and toks[k - 1].string == "."
                and toks[k - 2].string == "F"
                and k + 1 <= idxs[-1]
                and toks[k + 1].string == "("
            ):
                depth, j = 0, k + 1
                while j <= idxs[-1]:
                    if toks[j].string in "([{":
                        depth += 1
                    elif toks[j].string in ")]}":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                spans.append((k, j))
        return spans

    offenders = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        src = open(path).read()
        toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
        rel = os.path.relpath(path, root)
        for line, idxs in _select_blocks(toks):
            if not idxs:
                continue
            explode_spans = _call_spans(toks, idxs, EXPLODE)
            if not explode_spans:
                continue

            def _inside_explode(k):
                return any(a < k <= b for a, b in explode_spans)

            for k, _ in _call_spans(toks, idxs, EXPENSIVE):
                if not _inside_explode(k):
                    offenders.append(f"{rel}:{line} (F.{toks[k].string})")
            # STRING covers plain/f-strings on 3.11; on 3.12+ f-strings
            # tokenize as FSTRING_START/MIDDLE/END, so include those or
            # the smuggling arm goes silently dead (r6 self-review)
            string_types = {tokenize.STRING} | {
                getattr(tokenize, n)
                for n in ("FSTRING_START", "FSTRING_MIDDLE", "FSTRING_END")
                if hasattr(tokenize, n)
            }
            for k in idxs:
                if (
                    toks[k].type in string_types
                    and expensive_str_re.search(toks[k].string)
                    and not _inside_explode(k)
                ):
                    offenders.append(f"{rel}:{line} (string expr)")
    assert not offenders, (
        "expensive expression projected beside an explode (evaluated per "
        f"OUTPUT row of the Generate): {offenders}"
    )


def test_boilerplate_segments_reconstruction(spark, tmp_path, duck_tmp):
    """dedup_boilerplate_segments on an adversarial fixture the driver
    testdata can't express: three docs share an identical 3-token header
    (boilerplate at BOILER_MIN_DOCS=3), one doc consists ONLY of that
    header (must survive as a row with cleaned_text=''), and one unique
    doc repeats a segment INTERNALLY (within-doc repetition alone is not
    boilerplate — the count is DISTINCT docs)."""
    header = "terms of service"
    docs = [
        (0, f"{header} alpha beta gamma"),
        (1, f"{header} delta epsilon zeta"),
        (2, header),  # all boilerplate → cleaned_text = ''
        (3, f"one two three one two three"),  # internal repeat, 2 distinct? no - 1 doc
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)
    duck_tmp.sql(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    q = get("dedup_boilerplate_segments")
    spark_pdf = q.fn(spark, str(tmp_path)).toPandas().set_index("doc_id")
    # header shared by docs 0,1,2 → boilerplate; trailing words survive
    assert spark_pdf.loc[0, "cleaned_text"] == "alpha beta gamma"
    assert spark_pdf.loc[1, "cleaned_text"] == "delta epsilon zeta"
    # doc 2 is pure boilerplate but must keep its row, text emptied
    assert spark_pdf.loc[2, "cleaned_text"] == ""
    assert int(spark_pdf.loc[2, "n_boiler"]) == 1
    # doc 3's internally-repeated segment appears in ONE distinct doc →
    # not boilerplate, text unchanged
    assert spark_pdf.loc[3, "cleaned_text"] == "one two three one two three"
    assert int(spark_pdf.loc[3, "n_boiler"]) == 0
    oracle_pdf = _oracle(duck_tmp, q.oracle)
    assert_frames_match(
        spark_pdf.reset_index(), oracle_pdf, "dedup_boilerplate_segments[fixture]"
    )


def test_semantic_dedup_keep_lowest_id(spark, tmp_path, duck_tmp):
    """dedup_semantic_embedding policy pin: two near-parallel vectors in
    one cell → the lower vec_id is kept and the higher dropped; an
    orthogonal cell-mate is kept; a lone vector in another cell is kept
    with max_lower_cos NULL. One-shot semantics: vec 3, similar ONLY to
    the dropped vec 2 (not to kept vec 1), is still dropped — the
    documented conservative superset of the chained greedy."""
    import numpy as np

    e = np.eye(4, dtype=np.float32)
    rows = [
        (1, e[0], 7),                       # keep (first in cell)
        (2, (e[0] * 0.8 + e[1] * 0.6), 7),  # cos 0.8 to vec 1 → drop
        (3, e[1], 7),                       # cos 0 to kept vec 1, cos 0.6 to
        #                                     DROPPED vec 2 → one-shot drops it
        #                                     (chained greedy would keep it)
        (4, e[2], 7),                       # orthogonal to all → keep
        (5, e[3], 9),                       # other cell → keep, NULL
    ]
    pdf = pd.DataFrame(
        [(v, list(map(float, emb)), lbl) for v, emb, lbl in rows],
        columns=["vec_id", "embedding", "label"],
    )
    path = str(tmp_path / "embeddings.parquet")
    pdf.to_parquet(path)
    duck_tmp.sql(
        f"CREATE OR REPLACE VIEW embeddings AS SELECT * FROM read_parquet('{path}')"
    )
    q = get("dedup_semantic_embedding")
    spark_pdf = q.fn(spark, str(tmp_path)).toPandas().set_index("vec_id")
    assert bool(spark_pdf.loc[1, "keep"]) and bool(spark_pdf.loc[4, "keep"])
    assert not bool(spark_pdf.loc[2, "keep"]) and not bool(spark_pdf.loc[3, "keep"])
    assert bool(spark_pdf.loc[5, "keep"]) and pd.isna(
        spark_pdf.loc[5, "max_lower_cos"]
    )
    oracle_pdf = _oracle(duck_tmp, q.oracle)
    assert_frames_match(
        spark_pdf.reset_index(), oracle_pdf, "dedup_semantic_embedding[fixture]"
    )


def test_strict_funnel_differs_from_first_touch(spark, tmp_path, duck_tmp):
    """window_funnel_strict_order's reason to exist, pinned: a user who
    clicked BEFORE their first view and again after it converts under
    strict re-anchoring (the earliest qualifying click strictly after
    t1) but NOT under the first-touch approximation (min(click) <
    min(view) fails the > test). Fixture: user 1 = click, view, click,
    purchase in order; user 2 = view only; user 3 = view then a click 8
    days later (outside the 7-day step window → stalls at view under
    strict order)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        (1, "click", t0),
        (1, "view", t0 + h),
        (1, "click", t0 + 2 * h),
        (1, "purchase", t0 + 3 * h),
        (2, "view", t0),
        (3, "view", t0),
        (3, "click", t0 + dt.timedelta(days=8)),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)
    duck_tmp.sql(
        f"CREATE OR REPLACE VIEW events AS SELECT * FROM read_parquet('{path}')"
    )
    strict = get("window_funnel_strict_order")
    got = {
        r["stage"]: r
        for r in strict.fn(spark, str(tmp_path)).collect()
    }
    assert got["view"]["n_users"] == 3
    assert got["click"]["n_users"] == 1  # only user 1: user 3 is out of window
    assert got["purchase"]["n_users"] == 1
    oracle_pdf = _oracle(duck_tmp, strict.oracle)
    spark_pdf = strict.fn(spark, str(tmp_path)).toPandas()
    assert_frames_match(spark_pdf, oracle_pdf, "window_funnel_strict_order[fixture]")

    # the first-touch approximation disagrees in BOTH directions: it
    # misses user 1 (min(click) precedes min(view)) yet counts user 3
    # (it has no step window), so its click stage is {user 3} where the
    # strict funnel's is {user 1}
    ft = get("window_funnel_conversion").fn(spark, str(tmp_path)).collect()[0]
    assert ft["n_view_then_click"] == 1  # user 3, not user 1
    assert ft["n_full_funnel"] == 0  # user 1's purchase invisible to it

    # empty-stage parity (r6 self-review): with zero qualifying clicks,
    # Spark 0/0 is NaN but DuckDB is NULL — the nullif guard must make
    # both engines emit NULL conversion rates for the starved stages
    pd.DataFrame(
        [(9, "view", t0), (9, "view", t0 + h)],
        columns=["user_id", "event_type", "ts"],
    ).to_parquet(path)
    starved = strict.fn(spark, str(tmp_path)).toPandas().set_index("stage")
    assert int(starved.loc["click", "n_users"]) == 0
    assert pd.isna(starved.loc["purchase", "conv_from_prev"])
    assert_frames_match(
        starved.reset_index(),
        _oracle(duck_tmp, strict.oracle),
        "window_funnel_strict_order[starved]",
    )


def test_hard_negative_mining_salt_invariant(spark, sf_dir, monkeypatch):
    """The salted two-phase top-k must be lossless: results are identical
    for any _HN_SALT (1 = the unsalted single-partition plan, 7 = a
    non-power-of-two fan-out, 32 = production default). Pins the claim
    that salting is a parallelism dial, never a semantics knob."""
    from pyspark_for_ebook_classification_spark.operators import similarity as sim

    def run():
        return sorted(
            (
                r["query_id"],
                r["negative_id"],
                r["rank"],
                r["neg_cosine"],
                r["best_pos_cosine"],
            )
            for r in sim.sim_hard_negative_mining(spark, sf_dir).collect()
        )

    base = run()
    assert base, "empty mining result"
    for salt in (1, 7):
        monkeypatch.setattr(sim, "_HN_SALT", salt)
        assert run() == base, f"salt={salt} changed results"


def test_bit_packed_pair_key_roundtrips_randomized(spark):
    """Vectorized randomized round-trip for the containment pair key:
    10k (x, y) pairs spanning the full unsigned 32-bit range (including
    sign-bit-setting x >= 2^31) must decode exactly after
    shiftleft|or packing — the DIV/% decode this replaced corrupts
    every pair with x >= 2^31."""
    df = spark.range(10_000).selectExpr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS BIGINT) AS x",
        "CAST(conv(substring(md5(CAST(id + 1000000 AS STRING)), 1, 8), 16, 10) AS BIGINT) AS y",
    )
    bad = (
        df.selectExpr(
            "x", "y", "shiftleft(x, 32) | y AS pk"
        )
        .selectExpr(
            "x", "y",
            "shiftrightunsigned(pk, 32) AS dx",
            "pk & 4294967295 AS dy",
        )
        .filter("dx <> x OR dy <> y")
        .count()
    )
    assert bad == 0


def test_cdc_chunk_dedup_adversarial_payloads(spark, tmp_path, duck_tmp):
    """multimodal_cdc_chunk_dedup on payloads the driver corpus can't
    express: empty text (filtered identically by both engines), payloads
    shorter than the 3-byte hash window (single whole-payload chunk),
    exactly window-sized, and a degenerate payload where EVERY position
    is a rolling-hash boundary ('0' = ascii 48; 993·48 ≡ 0 mod 16 →
    maximal chunk fragmentation, all 1-byte chunks past the first).
    Reconciles totals (total_bytes = sum of payload lengths) and exact
    oracle parity."""
    docs = [
        (0, "srcA", ""),                     # filtered out by both engines
        (1, "srcA", "abc"),                  # < window → one chunk
        (2, "srcA", "0000"),                 # == window, boundary at 4
        (3, "srcB", "0" * 20),               # boundary at every i >= 4
        (4, "srcB", "the quick brown fox jumps over the lazy dog"),
        (5, "srcB", "the quick brown fox jumps over the lazy dog"),  # dup doc
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "source", "text"])
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)
    duck_tmp.sql(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    q = get("multimodal_cdc_chunk_dedup")
    spark_pdf = q.fn(spark, str(tmp_path)).toPandas().set_index("source")
    # byte conservation: chunking is a partition of each payload
    assert int(spark_pdf.loc["srcA", "total_bytes"]) == 3 + 4
    assert int(spark_pdf.loc["srcB", "total_bytes"]) == 20 + 2 * len(docs[4][2])
    # srcB: the duplicated doc means unique bytes < total bytes
    assert int(spark_pdf.loc["srcB", "unique_bytes"]) < int(
        spark_pdf.loc["srcB", "total_bytes"]
    )
    # the all-'0' payload fragments into 1-byte chunks past the first →
    # srcB's chunk count well above its doc count
    assert int(spark_pdf.loc["srcB", "n_chunks"]) >= 18
    oracle_pdf = _oracle(duck_tmp, q.oracle)
    assert_frames_match(
        spark_pdf.reset_index(), oracle_pdf, "multimodal_cdc_chunk_dedup[fixture]"
    )


@pytest.mark.parametrize("ansi", ["true", "false"])
def test_ansi_mode_portability_smoke(spark, sf_dir, ansi):
    """The driver runs DEFAULT session confs, so every query must be
    correct under Spark 4's ANSI-on default AND with ANSI off (a cluster
    that disabled it for legacy jobs). Smoke the operators that touch
    ANSI-sensitive territory — element_at bounds (shingles, CDC chunks),
    integer overflow wrap (bit-packed pair keys), CAST strictness
    (boilerplate segmenter, sketches) — under both settings."""
    sensitive = (
        "dedup_minhash_lsh",
        "text_minhash_containment",
        "dedup_boilerplate_segments",
        "multimodal_cdc_chunk_dedup",
        "dedup_semantic_embedding",
        "sketch_kmv_distinct",
    )
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    qs = all_queries()
    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        for name in sensitive:
            assert qs[name].fn(spark, sf_dir).count() >= 0, name
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_substring_spans_island_semantics(spark, tmp_path, duck_tmp):
    """dedup_substring_spans on a hand-built corpus pinning every edge of
    the span definition the synthetic testdata can't isolate: cross-doc
    shared runs trim to the shared region only, a WITHIN-doc repeat is
    duplicated text (training-time semantics — unlike boilerplate's
    distinct-doc count), back-to-back duplicated anchors at exact
    adjacency (p == prev_end + 1) merge into ONE span, and a fully
    unique doc emits no row at all."""
    x = " ".join(f"x{i}" for i in range(8))  # 8-token run shared F↔G
    y = " ".join(f"y{i}" for i in range(8))  # 8-token run shared F↔H
    shared12 = " ".join(f"s{i}" for i in range(12))  # 12-token run A↔B
    rep8 = " ".join(f"r{i}" for i in range(8))  # internal repeat in C
    docs = [
        (0, f"{shared12} a0 a1 a2 a3"),  # span = the 12 shared tokens
        (1, f"b0 b1 b2 b3 {shared12}"),  # same, offset by 4
        (2, f"{rep8} c0 {rep8}"),  # self-repeat → 2 spans, gap at c0
        (3, " ".join(f"u{i}" for i in range(10))),  # unique → no row
        (4, f"{x} {y}"),  # anchors at p=0 and p=8: exact adjacency → 1 span
        (5, f"{x} g0 g1"),  # donor of x
        (6, f"{y} h0 h1"),  # donor of y
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)
    duck_tmp.sql(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    q = get("dedup_substring_spans")
    got = q.fn(spark, str(tmp_path)).toPandas().set_index("doc_id")
    assert 3 not in got.index  # unique doc produces no span row
    assert (int(got.loc[0, "dup_spans"]), int(got.loc[0, "dup_tokens"])) == (1, 12)
    assert (int(got.loc[1, "dup_spans"]), int(got.loc[1, "dup_tokens"])) == (1, 12)
    assert got.loc[0, "dup_frac"] == 0.75  # 12 of 16
    # within-doc repeat: both copies covered, c0 uncovered → two spans
    assert (int(got.loc[2, "dup_spans"]), int(got.loc[2, "dup_tokens"])) == (2, 16)
    # adjacency merge: [0,7] + [8,15] fuse into one 16-token span
    assert (int(got.loc[4, "dup_spans"]), int(got.loc[4, "dup_tokens"])) == (1, 16)
    assert got.loc[4, "dup_frac"] == 1.0
    oracle_pdf = _oracle(duck_tmp, q.oracle)
    assert_frames_match(
        got.reset_index(), oracle_pdf, "dedup_substring_spans[fixture]"
    )


def test_phash_neardup_finds_reencode_only(spark, tmp_path, duck_tmp):
    """multimodal_phash_neardup on a hand-built media store: doc 0's
    re-encoded variant (first byte perturbed) must pair with its
    original at small Hamming distance, while visually-distinct media
    (disjoint character planes → disjoint intensity profiles) must NOT
    pair even though every signature shares the 4-band structure."""
    docs = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "0123456789 " * 6),  # digit plane — far from letters
        (2, "ZZZZ YYYY XXXX WWWW VVVV UUUU TTTT SSSS RRRR QQQQ PPPP OOOO"),
        (3, "mnopqr " * 9),
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)
    duck_tmp.sql(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    q = get("multimodal_phash_neardup")
    got = q.fn(spark, str(tmp_path)).toPandas()
    # only doc 0 (doc_id % 7 == 0) has a variant; its original (media 0)
    # and re-encode (media 1) are the single expected near-dup pair
    assert len(got) == 1, got
    assert (int(got.iloc[0]["media_a"]), int(got.iloc[0]["media_b"])) == (0, 1)
    assert int(got.iloc[0]["hamming"]) <= 3
    oracle_pdf = _oracle(duck_tmp, q.oracle)
    assert_frames_match(got, oracle_pdf, "multimodal_phash_neardup[fixture]")


def test_substring_removal_keeps_earliest_copy(spark, tmp_path, duck_tmp):
    """dedup_substring_removal keep-first arbitration on a hand corpus:
    byte-identical docs collapse to {original, ''}; a doc quoting
    another doc's run loses exactly the quote; the quoted SOURCE (the
    earliest occurrence) stays byte-identical; unique docs pass through
    untouched — including docs shorter than the anchor width."""
    shared12 = " ".join(f"s{i}" for i in range(12))
    docs = [
        (0, shared12),                                  # earliest owner
        (1, " ".join(f"u{i}" for i in range(10))),      # unique
        (2, shared12),                                  # exact dup → ''
        (3, f"p0 p1 p2 p3 {shared12}"),                 # quote → loses it
        (4, "tiny doc here"),                           # < K tokens
        (5, ""),                                        # zero tokens
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)
    duck_tmp.sql(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    q = get("dedup_substring_removal")
    got = q.fn(spark, str(tmp_path)).toPandas().set_index("doc_id")
    assert got.loc[0, "cleaned_text"] == shared12  # earliest copy intact
    assert got.loc[1, "cleaned_text"] == docs[1][1]
    assert got.loc[2, "cleaned_text"] == ""  # whole-doc dedup degenerate case
    assert int(got.loc[2, "removed_tokens"]) == 12
    assert got.loc[3, "cleaned_text"] == "p0 p1 p2 p3"
    assert int(got.loc[3, "removed_tokens"]) == 12
    assert got.loc[4, "cleaned_text"] == "tiny doc here"
    # a zero-token doc must still get its output row (the contract is one
    # row per input doc), with nothing removed and nothing rebuilt
    assert got.loc[5, "cleaned_text"] == ""
    assert int(got.loc[5, "removed_tokens"]) == 0
    oracle_pdf = _oracle(duck_tmp, q.oracle)
    assert_frames_match(
        got.reset_index(), oracle_pdf, "dedup_substring_removal[fixture]"
    )


def test_skew_audit_top_key_survives_pipe_in_key(spark):
    """The skew audit's heavy-hitter arg-max packs lpad(cnt,20)|key and
    unpacks with substring(22): a split on '|' truncated a KEY that
    itself contains '|' ('click|mobile' reported as 'click'). Pin the
    fixed-width unpack on exactly that shape, tie included."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("click|mobile", 7), ("view", 7), ("buy", 3)], "k string, cnt long"
    )
    packed = F.concat(
        F.lpad(F.col("cnt").cast("string"), 20, "0"), F.lit("|"), F.col("k")
    )
    top = df.select(packed.alias("packed")).agg(
        F.expr("substring(max(packed), 22)").alias("top_key")
    )
    assert top.collect()[0]["top_key"] == "view"  # max cnt, tie → max key
    only = df.filter(F.col("k") == "click|mobile").select(packed.alias("packed"))
    got = only.agg(F.expr("substring(max(packed), 22)").alias("top_key"))
    assert got.collect()[0]["top_key"] == "click|mobile"

"""Semantic third-engine checks for the round-6 operator additions.
Parity says Spark == DuckDB; these say both == the intended math, via a
pure-Python/numpy reimplementation (the "third engine") or via closed
invariants the result must satisfy regardless of engine.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.operators.aggregates import (
    agg_basket_affinity,
    agg_gini_revenue,
)
from pyspark_for_ebook_classification_spark.operators.datapipe import (
    _SHARD_BUDGET,
    data_packing_efficiency_report,
    data_shard_token_balanced,
)
from pyspark_for_ebook_classification_spark.operators.graphs import (
    _sparse_strongtie_und,
    graph_jaccard_link_prediction,
)
from pyspark_for_ebook_classification_spark.operators.windows import (
    _CUSUM_T,
    window_cusum_alarm,
    window_event_transitions,
    window_peak_concurrency,
)
from pyspark_for_ebook_classification_spark.sources.io import load


def test_cusum_matches_recursive_definition(spark, sf_dir):
    """The prefix-sum identity must equal the textbook recursion
    s_t = max(0, s_{t-1} + dev_t) replayed in pure Python per series."""
    li = load(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(
            F.col("l_suppkey").alias("sk"),
            F.date_trunc("day", "l_shipdate").alias("day"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r.sk].append((r.day, r.q))
    expect = {}
    for sk, rows in series.items():
        rows.sort()
        n, total = len(rows), sum(q for _, q in rows)
        s, mx, alarms, first = 0, 0, 0, None
        for day, q in rows:
            s = max(0, s + (n * q - total))
            mx = max(mx, s)
            if s > _CUSUM_T * n:
                alarms += 1
                first = first or day
        expect[sk] = (n, total, mx, alarms, first)
    got = {r.l_suppkey: r for r in window_cusum_alarm(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for sk, (n, total, mx, alarms, first) in expect.items():
        g = got[sk]
        assert (g.n_days, g.total_q, g.max_cusum) == (n, total, mx), sk
        assert g.n_alarm_days == alarms and g.first_alarm_day == first, sk


def test_peak_concurrency_matches_bruteforce(spark, sf_dir):
    """Sweep-line peak == brute-force point-in-time max, sampled at every
    interval start (the max concurrency is always attained at a start)."""
    ev = (
        load(spark, sf_dir, "events")
        .select(
            F.date_trunc("day", "ts").alias("day"),
            F.col("ts").alias("t0"),
            F.expr("timestampadd(MINUTE, CAST(floor(value) AS INT), ts)").alias("t1"),
        )
        .collect()
    )
    per_day = defaultdict(list)
    for r in ev:
        per_day[r.day].append((r.t0, r.t1))
    got = {r.day: r for r in window_peak_concurrency(spark, sf_dir).collect()}
    assert set(got) == set(per_day)
    for day, iv in per_day.items():
        # closed-open [t0, t1): ends at the same instant don't overlap
        peak = max(sum(1 for a, b in iv if a <= t0 < b) for t0, _ in iv)
        assert got[day].peak_concurrent == peak, day
        assert got[day].n_intervals == len(iv), day


def test_gini_matches_mean_absolute_difference(spark, sf_dir):
    """Rank-weighted closed form == the O(n²) mean-absolute-difference
    definition G = Σᵢⱼ|xᵢ−xⱼ| / (2n²·mean)."""
    rows = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev"))
        .collect()
    )
    xs = sorted(float(r.rev) for r in rows)
    n = len(xs)
    total = sum(xs)
    mad = sum(abs(a - b) for a in xs for b in xs)
    gini_bruteforce = mad / (2 * n * n * (total / n))
    got = agg_gini_revenue(spark, sf_dir).collect()[0]
    assert got.n_customers == n
    assert abs(got.gini - gini_bruteforce) < 1e-6
    assert abs(got.total_revenue - total) < 1e-3


def test_link_prediction_matches_set_algebra(spark, sf_dir):
    """Jaccard candidates == pure-Python set algebra over the same
    strong-tie backbone: non-adjacent pairs, |N(a)∩N(b)| ≥ 2, exact
    score."""
    und = {(r.a, r.b) for r in _sparse_strongtie_und(spark, sf_dir).collect()}
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    expect = {}
    for u in nbrs:
        for v in nbrs:
            if u < v and (u, v) not in und:
                cn = len(nbrs[u] & nbrs[v])
                if cn >= 2:
                    expect[(u, v)] = (
                        cn,
                        len(nbrs[u]),
                        len(nbrs[v]),
                        round(cn / (len(nbrs[u]) + len(nbrs[v]) - cn), 6),
                    )
    got = {
        (r.u, r.v): (r.common_neighbors, r.deg_u, r.deg_v, r.jaccard)
        for r in graph_jaccard_link_prediction(spark, sf_dir).collect()
    }
    assert got == expect


def test_event_transitions_rows_are_distributions(spark, sf_dir):
    """Each source state's outgoing probabilities sum to ~1 and counts
    equal the lead-bigram total."""
    rows = window_event_transitions(spark, sf_dir).collect()
    by_from = defaultdict(list)
    for r in rows:
        by_from[r.etype_from].append(r)
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users  # one bigram less per user
    for etype, out in by_from.items():
        assert abs(sum(r.p_next for r in out) - 1.0) < 1e-4, etype


def test_shard_plan_contiguous_and_budget_bounded(spark, sf_dir):
    """Shards are contiguous in doc_id order, cover every doc exactly
    once, and no shard exceeds budget + one doc's tokens."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    toks = {r.doc_id: -(-r.n_chars // 4) for r in docs}
    max_doc = max(toks.values())
    shards = sorted(
        data_shard_token_balanced(spark, sf_dir).collect(), key=lambda r: r.shard_id
    )
    assert sum(r.n_docs for r in shards) == len(docs)
    assert sum(r.shard_tokens for r in shards) == sum(toks.values())
    prev_max = None
    for s in shards:
        assert s.doc_id_min <= s.doc_id_max
        if prev_max is not None:
            assert s.doc_id_min > prev_max  # contiguous, non-overlapping
        prev_max = s.doc_id_max
        assert s.shard_tokens < _SHARD_BUDGET + max_doc
    # every shard but the last starts a doc past the budget boundary
    for s in shards[:-1]:
        assert s.shard_tokens >= _SHARD_BUDGET - max_doc


def test_basket_affinity_marginal_identities(spark, sf_dir):
    """Pair counts are bounded by both marginals; lift reproduces from
    the published integers; support sums to the expected pair mass."""
    rows = agg_basket_affinity(spark, sf_dir).collect()
    assert rows
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    n_orders = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey")
        .distinct()
        .count()
    )
    for r in rows:
        assert r.brand_a < r.brand_b
        assert 1 <= r.n_ab <= min(r.n_a, r.n_b)
        assert abs(r.support - round(r.n_ab / n_orders, 6)) < 1e-9
        assert abs(r.lift - round(r.n_ab * n_orders / (r.n_a * r.n_b), 6)) < 1e-9


def test_packing_report_conservation(spark, sf_dir):
    """kept + truncated == total; packed_seqs == ceil(kept/ctx);
    utilization == kept/(n_docs·ctx)."""
    for r in data_packing_efficiency_report(spark, sf_dir).collect():
        kept = r.total_tokens - r.tokens_truncated
        assert r.packed_seqs == -(-kept // r.ctx)
        assert kept + r.pad_waste_doc_per_seq == r.n_docs * r.ctx
        assert abs(r.doc_per_seq_utilization - round(kept / (r.n_docs * r.ctx), 6)) < 1e-9
        assert 0 < r.doc_per_seq_utilization <= 1.0


def test_zorder_matches_python_morton(spark, sf_dir):
    """The SQL bit-interleave == Python's int-based Morton encode, and
    z-order must dominate lex on the day dimension while staying
    competitive on custkey (the whole point of the layout)."""
    from pyspark_for_ebook_classification_spark.operators.datapipe import (
        _Z_BUCKETS,
        data_zorder_layout,
    )

    rows = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate").collect()
    import datetime

    epoch = datetime.datetime(1995, 1, 1)
    pts = [(r.o_custkey, (r.o_orderdate - epoch).days) for r in rows]
    ck0, ck1 = min(p[0] for p in pts), max(p[0] for p in pts)
    dy0, dy1 = min(p[1] for p in pts), max(p[1] for p in pts)

    def enc(x, y):
        xr = (x - ck0) * 65535 // (ck1 - ck0)
        yr = (y - dy0) * 65535 // (dy1 - dy0)
        z = 0
        for i in range(16):
            z |= ((xr >> i) & 1) << (2 * i + 1)
            z |= ((yr >> i) & 1) << (2 * i)
        return xr, yr, z

    zb, lb = defaultdict(list), defaultdict(list)
    for x, y in pts:
        xr, yr, z = enc(x, y)
        zb[z * _Z_BUCKETS // 2**32].append((xr, yr))
        lb[xr * _Z_BUCKETS // 65536].append((xr, yr))

    def spans(buckets):
        xs = [max(p[0] for p in v) - min(p[0] for p in v) for v in buckets.values()]
        ys = [max(p[1] for p in v) - min(p[1] for p in v) for v in buckets.values()]
        return (
            len(buckets),
            round(sum(xs) / len(xs), 6),
            round(sum(ys) / len(ys), 6),
        )

    expect = {"zorder": spans(zb), "lex": spans(lb)}
    got = {
        r.layout: (r.n_buckets, r.avg_cust_span, r.avg_day_span)
        for r in data_zorder_layout(spark, sf_dir).collect()
    }
    assert got == expect
    # the layout property itself: z-order prunes the second dimension,
    # lex cannot (its per-bucket day span ≈ the whole domain)
    assert got["zorder"][2] < got["lex"][2] / 3


def test_psi_matches_python_reimplementation(spark, sf_dir):
    """Band edges, band assignment, and smoothed PSI terms all reproduce
    from a sorted-list Python reimplementation."""
    import math

    from pyspark_for_ebook_classification_spark.operators.datapipe import (
        _PSI_BANDS,
        data_psi_drift,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    base = sorted(
        (r.n_chars, r.doc_id) for r in docs if r.doc_id % 2 == 0
    )
    n = len(base)
    edges = sorted(
        {base[math.ceil(k * n / _PSI_BANDS) - 1][0] for k in range(1, _PSI_BANDS)}
    )

    def band(v):
        return 1 + sum(1 for e in edges if e < v)

    n_base, n_comp = defaultdict(int), defaultdict(int)
    for r in docs:
        (n_base if r.doc_id % 2 == 0 else n_comp)[band(r.n_chars)] += 1
    tb, tc = sum(n_base.values()), sum(n_comp.values())
    sm = _PSI_BANDS * 0.5
    got = {r.band: r for r in data_psi_drift(spark, sf_dir).collect()}
    assert set(got) == set(n_base) | set(n_comp)
    total_psi = 0.0
    for b, r in got.items():
        assert r.n_base == n_base.get(b, 0) and r.n_comp == n_comp.get(b, 0), b
        pa = (r.n_base + 0.5) / (tb + sm)
        pb = (r.n_comp + 0.5) / (tc + sm)
        assert abs(r.psi_term - round((pa - pb) * math.log(pa / pb), 6)) < 1e-9, b
        total_psi += r.psi_term
    # identical halves of the same corpus should not scream drift
    assert total_psi < 0.25


def test_with_global_cumsum_exactness_shapes(spark, sf_dir):
    """The two-pass prefix sum must equal a Python running sum under the
    same total order — across skewed values, negatives, ties on the
    value column, and a 1-row frame."""
    from pyspark_for_ebook_classification_spark.functions.ranks import (
        with_global_cumsum,
    )

    rows = [(i, ((i * 2654435761) % 97) - 48) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "id bigint, v bigint").repartition(13)
    out = {
        r.id: r.cs
        for r in with_global_cumsum(df, [F.col("v"), F.col("id")], "v", "cs").collect()
    }
    run = 0
    for v, i in sorted((v, i) for i, v in rows):
        run += v
        assert out[i] == run, (i, v)
    one = spark.createDataFrame([(7, 42)], "id bigint, v bigint")
    got = with_global_cumsum(one, [F.col("id")], "v", "cs").collect()
    assert got[0].cs == 42


def test_nucleus_vocab_matches_python(spark, sf_dir):
    """Nucleus sizes reproduce from a Counter-based reimplementation of
    the smallest-covering-set rule."""
    from collections import Counter

    from pyspark_for_ebook_classification_spark.operators.textops import (
        _NUCLEUS_P,
        text_nucleus_vocab,
    )

    docs = load(spark, sf_dir, "documents").select("lang", "text").collect()
    freqs = defaultdict(Counter)
    for r in docs:
        freqs[r.lang].update(t for t in r.text.split(" ") if t)
    got = {r.lang: r for r in text_nucleus_vocab(spark, sf_dir).collect()}
    assert set(got) == set(freqs)
    for lang, c in freqs.items():
        total = sum(c.values())
        order = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        cum, nucleus = 0, 0
        for _, tf in order:
            if cum < _NUCLEUS_P * total:
                nucleus += 1
            cum += tf
        g = got[lang]
        assert (g.vocab_size, g.total_tokens, g.nucleus_size) == (
            len(c),
            total,
            nucleus,
        ), lang


def test_multimodal_token_budget_accounting(spark, sf_dir):
    """Token accounting reproduces from a pure-Python reimplementation of
    the tile/frame/audio formulas over the same fake-codec metadata."""
    from pyspark_for_ebook_classification_spark.operators.multimodal import (
        _TILE,
        _TOK_AUDIO_PER_SEC,
        _TOK_IMG_BASE,
        _TOK_PER_FRAME,
        _TOK_PER_TILE,
        multimodal_token_budget,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        mod = ("image", "video", "audio")[r.doc_id % 3]
        w = 64 + ord(r.text[0]) % 192
        h = 64 + ord(r.text[-1]) % 192
        if mod == "image":
            mt = ((w + _TILE - 1) // _TILE) * (
                (h + _TILE - 1) // _TILE
            ) * _TOK_PER_TILE + _TOK_IMG_BASE
        elif mod == "video":
            mt = ((1 + len(r.text) % 7 + 1) // 2) * _TOK_PER_FRAME
        else:
            mt = (10 + len(r.text) % 300) * _TOK_AUDIO_PER_SEC
        tt = (r.n_chars + 3) // 4
        agg[mod][0] += 1
        agg[mod][1] += mt
        agg[mod][2] += tt
    grand = sum(v[1] + v[2] for v in agg.values())
    got = {r.modality: r for r in multimodal_token_budget(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for mod, (n, mt, tt) in agg.items():
        g = got[mod]
        assert (g.n_items, g.media_tokens, g.text_tokens) == (n, mt, tt), mod
        assert g.total_tokens == mt + tt
        assert abs(g.budget_share - round((mt + tt) / grand, 6)) < 1e-9


def test_bloom_fpr_within_binomial_band(spark, sf_dir):
    """Realized false positives must sit inside a wide binomial band
    around the bitmap's own fill³ prediction — a silent hash-family
    break (correlated positions) would blow the band."""
    from pyspark_for_ebook_classification_spark.operators.sketches import (
        sketch_bloom_fpr_calibration,
    )

    r = sketch_bloom_fpr_calibration(spark, sf_dir).collect()[0]
    assert r.n_probes > 0 and 0.0 < r.fill_ratio < 1.0
    expected_fp = r.n_probes * r.fpr_predicted
    # 5-sigma Poisson band plus absolute slack for tiny expectations
    slack = 5 * (expected_fp ** 0.5) + 3
    assert abs(r.n_false_pos - expected_fp) <= slack, (
        r.n_false_pos,
        expected_fp,
    )
    assert abs(r.fpr_realized - round(r.n_false_pos / r.n_probes, 6)) < 1e-9

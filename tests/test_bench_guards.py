"""bench.py auto-remeasure guards (r8 verdict item 3).

r8 shipped +16% host-contaminated headline numbers because the only guard
was a 20% canary-drift trigger. These tests pin the hardened double guard
over RECORDED fixtures — the actual r8 episode (canary +16%, per-query
BENCH-vs-SCALING disagreements of 8-41%) must now trip BOTH tripwires,
while the r7 quiet-host pass must trip neither.
"""

from __future__ import annotations

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location("bench", os.path.join(ROOT, "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


# Recorded r8 episode: BENCH_r08 per-query times (host-contaminated pass)
# vs the same-round SCALING.md sf0.1 column (quiet re-measure minutes
# apart). Subset of the queries the verdict called out.
R8_BENCH = {
    "join_inner_revenue_by_customer": 1.570,
    "sim_topk_bruteforce": 0.679,   # +41% vs its r7 number
    "text_tfidf_vocab": 0.699,      # +40%
    "sim_ann_lsh_bucketed": 1.167,  # +39%
    "graph_kcore_hindex": 2.905,
}
R8_SCALING = {
    "join_inner_revenue_by_customer": 1.447,
    "sim_topk_bruteforce": 0.481,
    "text_tfidf_vocab": 0.500,
    "sim_ann_lsh_bucketed": 0.839,
    "graph_kcore_hindex": 2.605,
}
R8_CANARY_DRIFT = 0.16

# Recorded r7 quiet-host pass: BENCH_r07 ≈ SCALING within jitter.
R7_BENCH = {
    "join_inner_revenue_by_customer": 1.386,
    "sim_topk_bruteforce": 0.482,
    "text_tfidf_vocab": 0.498,
}
R7_SCALING = {
    "join_inner_revenue_by_customer": 1.447,
    "sim_topk_bruteforce": 0.481,
    "text_tfidf_vocab": 0.500,
}
R7_CANARY_DRIFT = -0.13


def test_r8_episode_trips_both_guards():
    reasons = bench.second_pass_reasons(R8_CANARY_DRIFT, R8_BENCH, R8_SCALING, 0.1)
    assert any("canary" in r for r in reasons), "canary 16% must now trip (>10%)"
    flagged = [r for r in reasons if "SCALING reference" in r]
    # sim_topk +41%, tfidf +40%, lsh +39% all exceed the 25% disagreement bar
    assert len(flagged) >= 3, f"expected >=3 SCALING disagreements, got {reasons}"
    assert any("sim_topk_bruteforce" in r for r in flagged)


def test_r7_quiet_pass_trips_nothing():
    reasons = bench.second_pass_reasons(R7_CANARY_DRIFT, R7_BENCH, R7_SCALING, 0.1)
    assert reasons == [], f"quiet-host pass must not re-measure: {reasons}"


def test_scaling_guard_only_applies_at_sf01():
    # SCALING.md's reference column is sf0.1; at any other SF the
    # disagreement guard must stay silent (the canary one still works).
    reasons = bench.second_pass_reasons(0.0, R8_BENCH, R8_SCALING, 0.01)
    assert reasons == []


def test_missing_or_partial_reference_is_safe():
    # Queries absent from SCALING.md (new this round) never trigger.
    reasons = bench.second_pass_reasons(0.0, {"brand_new_query": 9.9}, {}, 0.1)
    assert reasons == []
    # parse on a missing path → empty dict, not an exception
    assert bench.parse_scaling_reference("/nonexistent/SCALING.md") == {}


def test_parse_scaling_reference_reads_real_file():
    ref = bench.parse_scaling_reference(os.path.join(ROOT, "SCALING.md"))
    assert len(ref) > 50, "SCALING.md table should parse to per-query times"
    assert all(v > 0 for v in ref.values())
    assert "join_inner_revenue_by_customer" in ref


def test_boundary_just_under_triggers_nothing():
    # 9.9% drift and +24.9% disagreement sit just under both bars.
    reasons = bench.second_pass_reasons(
        0.099, {"q": 1.249}, {"q": 1.0}, 0.1
    )
    assert reasons == []
    # and just over both bars trips both
    reasons = bench.second_pass_reasons(0.101, {"q": 1.251}, {"q": 1.0}, 0.1)
    assert len(reasons) == 2


def test_comparable_subtotal_over_fixture():
    # r10: the emitted `comparable` block must subtotal exactly the
    # intersection with the previous round's headline list, in that
    # list's order, ignoring queries new this round.
    timings = {"a": 1.0, "b": 2.25, "new_this_round": 9.0}
    names, total = bench.comparable_subtotal(timings, ["b", "a", "dropped"])
    assert names == ["b", "a"]
    assert total == 3.25
    # full identity when the lists coincide
    names, total = bench.comparable_subtotal({"a": 1.111}, ["a"])
    assert (names, total) == (["a"], 1.111)
    assert bench.comparable_subtotal({}, ["a"]) == ([], 0.0)


def test_prev_round_headline_is_r11s_21(tmp_path):
    # the literal list must be BENCH_r11's exact query set (unchanged
    # r9-r11; the driver's BENCH_r11.json tail is truncated, so pin
    # against the same-code builder artifact AND the r9 driver record)
    import json

    r09 = json.load(open(os.path.join(ROOT, "BENCH_r09.json")))
    r11b = json.load(open(os.path.join(ROOT, "BENCH_r11_builder.json")))
    assert set(bench.PREV_ROUND_HEADLINE) == set(r11b["queries"])
    assert set(bench.PREV_ROUND_HEADLINE) == set(r09["parsed"]["queries"])
    assert len(bench.PREV_ROUND_HEADLINE) == 21
    # the four r12 promotions are tracked in HEADLINE but excluded from
    # the comparable block by construction
    promoted = {
        "data_curation_incremental",
        "data_tokenize_pack_pipeline",
        "text_bpe_library_apply",
        "dedup_incremental_gate",
    }
    assert promoted <= set(bench.HEADLINE)
    assert not promoted & set(bench.PREV_ROUND_HEADLINE)
    # 25 r12-r14 + data_curation_pipeline (promoted r15, verdict item 6)
    assert len(bench.HEADLINE) == 26
    assert "data_curation_pipeline" in bench.HEADLINE
    assert "data_curation_pipeline" not in bench.PREV_ROUND_HEADLINE


def test_parse_scaling_reference_locates_column_by_header(tmp_path):
    # r9 ADVICE: a reordered/extended table must still read 'sf0.1 (s)'
    p = tmp_path / "SCALING.md"
    p.write_text(
        "# title\n\nprose\n\n"
        "| query | extra_col | sf0.01 (s) | sf0.1 (s) | ratio |\n"
        "| --- | --- | --- | --- | --- |\n"
        "| q1 | 9.999 | 0.100 | 1.500 | 15.00× |\n"
        "| q2 | 8.888 | 0.200 | 2.500 | 12.50× |\n"
    )
    ref = bench.parse_scaling_reference(str(p))
    assert ref == {"q1": 1.5, "q2": 2.5}
    # a table WITHOUT the expected header parses to nothing (guard skips)
    p.write_text("| query | wall (s) |\n| --- | --- |\n| q1 | 1.5 |\n")
    assert bench.parse_scaling_reference(str(p)) == {}


def test_parse_scaling_reference_real_file_matches_known_cell():
    # pin a known query's parsed value to its literal sf0.1 cell so a
    # future column change cannot silently shift the guard's reference
    path = os.path.join(ROOT, "SCALING.md")
    ref = bench.parse_scaling_reference(path)
    with open(path) as fh:
        for line in fh:
            if line.startswith("| join_inner_revenue_by_customer "):
                cells = [c.strip() for c in line.strip().strip("|").split("|")]
                assert ref["join_inner_revenue_by_customer"] == float(cells[2])
                break
        else:
            raise AssertionError("known query missing from SCALING.md")


def test_parse_scaling_provenance(tmp_path):
    p = tmp_path / "SCALING.md"
    p.write_text("# t\n\nCanary: pre 0.210 s, post 0.215 s, drift +2.4% — guard-clean (trigger 10%).\n")
    assert bench.parse_scaling_provenance(str(p)) == 0.024
    p.write_text("# t\n\nCanary: pre 0.210 s, post 0.180 s, drift -14.3% — guard-clean (trigger 10%).\n")
    assert abs(bench.parse_scaling_provenance(str(p)) - (-0.143)) < 1e-12
    p.write_text("# no provenance line here\n")
    assert bench.parse_scaling_provenance(str(p)) is None
    assert bench.parse_scaling_provenance("/nonexistent/SCALING.md") is None


def test_canary_rule_is_directional():
    """r10 verdict task 6: the BENCH canary's ±10% band is asymmetric by
    design — a DEGRADATION beyond the bar trips the second pass, a
    faster-direction drift (warm-up, e.g. r10's observed -27.7%) does
    not. Pin the rule so a future edit can't silently invert it."""
    # r10's literal benign episode: -27.7% drift, quiet timings
    assert bench.second_pass_reasons(-0.277, {"q": 1.0}, {"q": 1.0}, 0.1) == []
    # the mirrored degradation MUST trip
    reasons = bench.second_pass_reasons(0.277, {"q": 1.0}, {"q": 1.0}, 0.1)
    assert any("canary degraded" in r for r in reasons)
    # boundary: just under in both directions is quiet
    assert bench.second_pass_reasons(-0.099, {}, {}, 0.1) == []
    assert bench.second_pass_reasons(0.099, {}, {}, 0.1) == []


def test_scaling_trust_is_symmetric():
    """r10 ADVICE: the SCALING-reference trust decision (unlike the
    canary rule above) is SYMMETRIC — a large negative drift means the
    pre bracket ran cold and the whole reference table is inflated,
    which is the inflated-reference direction that suppresses the
    disagree guard."""
    assert bench.scaling_reference_trusted(0.05)
    assert bench.scaling_reference_trusted(-0.05)
    assert not bench.scaling_reference_trusted(0.15)
    # the r9 cold-JVM episode direction the old <= comparison trusted
    assert not bench.scaling_reference_trusted(-0.476)
    assert not bench.scaling_reference_trusted(None)


def test_parse_scaling_reference_stops_at_first_table(tmp_path):
    """r11: SCALING.md gained a second table (the splittable-scan twin)
    whose column at the reference index is a DIFFERENT measurement —
    the parser must stop at the first table's end or split-scan times
    would silently poison the disagree guard's reference."""
    p = tmp_path / "SCALING.md"
    p.write_text(
        "# t\n\n"
        "| query | sf0.01 (s) | sf0.1 (s) | ratio |\n"
        "| --- | --- | --- | --- |\n"
        "| q1 | 0.5 | 1.5 | 3.00× |\n"
        "\n"
        "## Splittable-scan twin\n\n"
        "| query | headline ratio | single-group sf0.1 (s) | split-scan sf0.1 (s) | split speedup |\n"
        "| --- | --- | --- | --- | --- |\n"
        "| q1 | 3.00× | 1.5 | 0.2 | 7.50× |\n"
    )
    ref = bench.parse_scaling_reference(str(p))
    assert ref == {"q1": 1.5}, ref


def test_parse_scaling_provenance_cell_based_line(tmp_path):
    """r11: the provenance line now leads with the cell-vs-post drift
    (the standalone pre-probe is informational) — the parser must pick
    the REAL drift, not be confused by the extra prose."""
    p = tmp_path / "SCALING.md"
    p.write_text(
        "# t\n\nCanary: table cell 0.178 s, post 0.175 s, drift -1.7% — "
        "guard-clean (trigger 10%; standalone pre-probe 0.227 s, "
        "informational).\n"
    )
    assert abs(bench.parse_scaling_provenance(str(p)) - (-0.017)) < 1e-12


def test_compact_payload_fits_driver_tail():
    """r14 verdict item 1: BENCH_r12/r13 parsed as null because the
    stdout JSON line (~3 KB of verbose guard strings + both comparable
    lists) outran the driver's tail capture. The stdout form must keep
    the contract fields byte-identical, summarize the bulky blocks by
    count, carry the parallelism proof, and stay well under the old
    line's size even with a 25-query table."""
    queries = {f"query_name_{i:02d}_long_enough": 1.234 for i in range(25)}
    full = {
        "metric": "headline_queries_total_wall",
        "value": 30.85,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "parallelism": {
            "master": "local[32]",
            "default_parallelism": 32,
            "shuffle_partitions": 32,
            "cpus_env": "32",
        },
        "comparable": {
            "prev_round_queries": [f"q{i}" for i in range(21)],
            "shared_queries": [f"q{i}" for i in range(21)],
            "total": 24.75,
        },
        "canary": {
            "query": "scan_parquet_checksum",
            "pre_sec": 0.31,
            "post_sec": 0.27,
            "drift_pct": -13.6,
            "first_pass_drift_pct": -25.8,
        },
        "guards": {
            "canary_trigger_pct": 10.0,
            "scaling_disagree_trigger_pct": 25.0,
            "scaling_reference_trusted": True,
            "scaling_reference_drift_pct": -1.5,
            "second_pass_reasons": [
                "query_name %ds exceeds SCALING reference by %d%%" % (i, i)
                for i in range(16)
            ],
        },
    }
    import json as _json

    compact = bench.compact_payload(full)
    # contract fields byte-identical
    for key in ("metric", "value", "unit", "queries", "sf", "parallelism"):
        assert compact[key] == full[key]
    # bulky blocks summarized, not dropped silently
    assert compact["comparable"] == {"total": 24.75, "n_shared": 21}
    assert compact["guards"]["second_pass_reason_count"] == 16
    assert "second_pass_reasons" not in compact["guards"]
    # the full record is NOT mutated (it goes to BENCH.json verbatim)
    assert len(full["guards"]["second_pass_reasons"]) == 16
    assert "shared_queries" in full["comparable"]
    # size budget: the r12/r13 failures were ~3 KB lines; stay under 2 KB
    line = _json.dumps(compact)
    assert len(line) < 2000, len(line)

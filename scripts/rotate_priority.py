#!/usr/bin/env python3
"""Recompute the driver-facing verification rotation (plans/registry.py
``_PRIORITY``) from the evidence on disk — the bookkeeping that was
hand-maintained through r6 and twice drifted from reality (r4's wasted
re-verification round; the r5 comment claiming rows-only verdicts that
never happened). This tool makes the r7+ recompute mechanical:

  python scripts/rotate_priority.py

prints, in order:
  1. the evidence summary (per-CORRECTNESS-file verdicts, union size,
     never-verified names);
  2. the suggested 50-slot front block under the registry's documented
     policy — all never-verified oracle-backed names first, then
     never-verified rows-only, then the freshness rotation: the standing
     high-risk families (pair pipelines, decimal-heavy aggregates,
     global-rank consumers), then oldest-verdict-first round-robin;
  3. the exact ``_ROTATION_BASIS`` tuple tests/test_oracle_parity.py
     must pin when the block is adopted.

The derivation is a PURE function of (registry, CORRECTNESS files) —
``front_block()`` below — so tests/test_oracle_parity.py::
test_priority_matches_rotation_script can recompute it and assert the
pasted ``_PRIORITY`` front block equals it exactly: since r7 the script
is the only way the block changes. It NEVER edits files — the human
pastes the block and re-runs pytest, whose rotation guards then
re-derive the same facts independently.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Post-closure policy tier (1) — "any query whose implementation changed
#: since its last verdict" (plans/registry.py bookkeeping note) — plus
#: verdict-ordered re-attestations. These jump the whole freshness queue:
#: the driver's standing verdict for them is KNOWN-STALE, the one place the
#: hard signal contradicts the repo. Each entry is (name, satisfied_round):
#: the pin AUTO-PRUNES once the name carries a driver verdict from
#: ``satisfied_round`` or later, so stale pins cannot burn freshness slots
#: and the next round's paste stays fully mechanical. r9 pins (VERDICT r8
#: task 1; satisfied by any CORRECTNESS_r09+ verdict):
#:   * text_bm25_topk / sim_rrf_hybrid_fusion — repaired in r8 (corpus-
#:     adaptive posting budget; genuine two-modality fusion) but absent
#:     from CORRECTNESS_r08, so their standing driver verdicts are r7's
#:     vacuous 0-row greens. MUST lead the r9 block.
#:   * the seven r8 first-greens (LR twins, eval twin, BPE trainer, CCNet
#:     split, winnowing pair) — verdict-ordered second attestation.
PINNED = (
    ("text_bm25_topk", 9),
    ("sim_rrf_hybrid_fusion", 9),
    ("ml_lr_scoring_twin", 9),
    ("ml_lr_confusion_twin", 9),
    ("ml_eval_relational_twin", 9),
    ("text_bpe_merge_train", 9),
    ("text_ccnet_perplexity_buckets", 9),
    ("text_winnowing_fingerprints", 9),
    ("text_winnowing_overlap_pairs", 9),
    # r12 implementation changes (policy tier 1 — the standing verdicts
    # are KNOWN-STALE): the incremental curation near stage went
    # index-at-rest (oracle rewritten to match) and the batch curation
    # pipeline now routes through the `curate` wrapper. Satisfied by
    # any CORRECTNESS_r12+ verdict.
    # r13: curate_incremental gained the shared batch-side
    # materialization + survivor-slice final joins (verdict task 4) —
    # known-stale again until a CORRECTNESS_r13+ verdict lands.
    ("data_curation_incremental", 13),
    ("data_curation_pipeline", 12),
    # r13 implementation change: dedup_incremental_gate's standing index
    # materialization flipped eager=True -> eager=False (r12 ADVICE —
    # plan-only consumers stop paying a real job; timed runs identical).
    # Satisfied by any CORRECTNESS_r13+ verdict.
    ("dedup_incremental_gate", 13),
)

#: standing high-risk families for post-closure freshness rotation
#: (registry bookkeeping note, r7+ policy): pair pipelines, global-rank
#: consumers, decimal-heavy aggregates. Order within the tuple is the
#: standing-cycle order.
HIGH_RISK = (
    "dedup_ngram_jaccard",
    "agg_weighted_median",
    "agg_ols_two_features",
    "window_rfm_segments",
    "agg_pareto_deciles",
    "dedup_simhash_hamming_pairs",
    "dedup_minhash_estimate_error",
    "dedup_lsh_candidate_recall",
    "text_minhash_containment",
    "agg_histogram_width_bucket",
    "data_curriculum_order",
    "data_shuffle_deterministic",
)


def correctness_files(root: str = ROOT) -> list[str]:
    return sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    )


def round_of(path: str) -> int:
    digits = "".join(c for c in path if c.isdigit())
    return int(digits) if digits else 0


def last_verdicts(root: str = ROOT) -> dict[str, int]:
    """name -> highest round number in which the driver issued a verdict."""
    out: dict[str, int] = {}
    for f in correctness_files(root):
        names = json.load(open(os.path.join(root, f)))
        for n in names:
            out[n] = max(out.get(n, 0), round_of(f))
    return out


def front_block(queries, verdicts: dict[str, int], slots: int = 50) -> list[str]:
    """The deterministic front-block policy. ``queries`` is the registry
    dict (name -> Query, insertion-ordered); ``verdicts`` maps name ->
    last driver-verdict round (absent = never verified).

    Order: (1) never-verified oracle-backed, registry order; (2) never-
    verified rows-only, registry order; (3) PINNED names in tuple order —
    repaired-since-verdict / verdict-ordered re-attestations, the one
    tier where the standing driver verdict is known-stale; (4) freshness
    — HIGH_RISK names in standing-cycle order (the tuple order is
    authoritative; rank is unique so the verdict-age key never fires for
    them), then everything else oldest-verdict-first (ties: registry
    order). No git state enters the computation, so tests can re-derive
    it exactly.
    """
    unverified_oracle = [
        n for n, q in queries.items() if q.oracle is not None and n not in verdicts
    ]
    unverified_rows = [
        n for n, q in queries.items() if q.oracle is None and n not in verdicts
    ]
    front: list[str] = unverified_oracle[:slots]
    if len(front) < slots:
        front += unverified_rows[: slots - len(front)]
    if len(front) < slots:
        active = [
            n
            for n, satisfied in PINNED
            if n in queries and n not in front and verdicts.get(n, 0) < satisfied
        ]
        front += active[: slots - len(front)]
    if len(front) < slots:
        risk_rank = {n: i for i, n in enumerate(HIGH_RISK)}

        def freshness_key(n: str):
            return (
                0 if n in risk_rank else 1,
                risk_rank.get(n, 0),
                verdicts.get(n, 0),
            )

        rest = sorted((n for n in queries if n not in front), key=freshness_key)
        front += rest[: slots - len(front)]
    return front


def main() -> None:
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    queries = all_queries()
    files = correctness_files()
    verdicts = last_verdicts()
    for f in files:
        names = json.load(open(os.path.join(ROOT, f)))
        print(f"{f}: {len(names)} verdicts")
    print(f"union: {len(verdicts)} of {len(queries)} registered")

    n_oracle = sum(
        1 for n, q in queries.items() if q.oracle is not None and n not in verdicts
    )
    n_rows = sum(
        1 for n, q in queries.items() if q.oracle is None and n not in verdicts
    )
    print(f"never-verified: {n_oracle} oracle-backed, {n_rows} rows-only")

    front = front_block(queries, verdicts)
    print("\n# ==== suggested _PRIORITY front block (paste into registry) ====")
    for n in front:
        tag = "" if queries[n].oracle is not None else "  # rows-only"
        print(f'    "{n}",{tag}')
    print("\n# ==== pin in tests/test_oracle_parity.py ====")
    print("_ROTATION_BASIS = (")
    for f in files:
        print(f'    "{f}",')
    print(")")


if __name__ == "__main__":
    main()

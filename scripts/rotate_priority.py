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
     never-verified rows-only, then (post-closure) the freshness
     rotation: queries whose operator module changed since their last
     verdict, the standing high-risk families, then oldest-verdict-first
     round-robin;
  3. the exact ``_ROTATION_BASIS`` tuple tests/test_oracle_parity.py
     must pin when the block is adopted.

It NEVER edits files — the human pastes the block and re-runs pytest,
whose rotation guards then re-derive the same facts independently.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: standing high-risk families for post-closure freshness rotation
#: (registry bookkeeping note, r7+ policy): pair pipelines, global-rank
#: consumers, decimal-heavy aggregates.
HIGH_RISK = (
    "dedup_minhash_estimate_error",
    "dedup_lsh_candidate_recall",
    "dedup_ngram_jaccard",
    "text_minhash_containment",
    "dedup_simhash_hamming_pairs",
    "window_rfm_segments",
    "agg_pareto_deciles",
    "data_curriculum_order",
    "data_shuffle_deterministic",
    "agg_histogram_width_bucket",
    "agg_ols_two_features",
    "agg_weighted_median",
)


def correctness_files() -> list[str]:
    return sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
    )


def round_of(path: str) -> int:
    digits = "".join(c for c in path if c.isdigit())
    return int(digits) if digits else 0


def main() -> None:
    from pyspark_for_ebook_classification_spark.plans.registry import all_queries

    queries = all_queries()
    files = correctness_files()
    last_verdict: dict[str, int] = {}
    for f in files:
        names = json.load(open(os.path.join(ROOT, f)))
        for n in names:
            last_verdict[n] = max(last_verdict.get(n, 0), round_of(f))
        print(f"{f}: {len(names)} verdicts")
    print(f"union: {len(last_verdict)} of {len(queries)} registered")

    unverified_oracle = [
        n for n, q in queries.items() if q.oracle is not None and n not in last_verdict
    ]
    unverified_rows = [
        n for n, q in queries.items() if q.oracle is None and n not in last_verdict
    ]
    print(f"never-verified: {len(unverified_oracle)} oracle-backed, "
          f"{len(unverified_rows)} rows-only")

    front: list[str] = list(unverified_oracle[:50])
    if len(front) < 50:
        front += unverified_rows[: 50 - len(front)]
    if len(front) < 50:
        # post-closure freshness rotation: changed-since-verdict first
        # (git log on the operator module since the verdict round is a
        # human judgment; approximate with files changed in the last
        # round's commits), then high-risk, then oldest verdict first
        changed = set()
        try:
            out = subprocess.run(
                ["git", "-C", ROOT, "diff", "--name-only", "HEAD~25..HEAD"],
                capture_output=True, text=True, check=True,
            ).stdout.split()
            changed = {os.path.basename(p) for p in out}
        except Exception:
            pass

        def freshness_key(n):
            q = queries[n]
            mod = getattr(q.fn, "__module__", "") or ""
            mod_file = mod.rsplit(".", 1)[-1] + ".py"
            return (
                0 if mod_file in changed else 1,
                0 if n in HIGH_RISK else 1,
                last_verdict.get(n, 0),
            )

        rest = sorted((n for n in queries if n not in front), key=freshness_key)
        front += rest[: 50 - len(front)]

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

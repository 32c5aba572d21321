#!/usr/bin/env python3
"""A/B re-time of the 21-query comparable set across two checkouts —
the BENCHNOTES bisection discipline, automated (r11 verdict task 2:
settle a driver-artifact swing by measurement, not narrative).

    python scripts/ab_retime.py /tmp/ab_r10 /tmp/ab_r11 [sf_dir] [q1,q2,...]

The optional 4th arg narrows the timed set to a comma-separated query
list (r13: targeted A/B of a single changed query without paying the
full 21-query protocol); the scan canary is always appended for the
drift bracket.

Protocol: ONE Spark session and ONE Python process host both trees'
query functions (imported sequentially with a sys.modules purge between
trees, so JVM/JIT warmth and parquet-reader state are shared — the two
sides differ by CODE only). A full untimed warm pass runs over both
trees' query sets, then the timed passes ALTERNATE A,B,A,B,A,B (each
pass times every query once; per-query result is the min over the three
passes), bracketed by the standard scan-canary min-of-3 on each side.
Alternation means any host-load episode lands on both trees
symmetrically instead of biasing whichever side ran later.

Safe because the comparable-set queries are pure DataFrame/SQL plans
(no Python UDFs — pinned by the PLANS.md audit), so nothing in a tree's
Python closure crosses to executors by module reference.
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

PKG = "pyspark_for_ebook_classification_spark"

#: the identical-set list both rounds share — BENCH's HEADLINE, which
#: did not change between r9 and r11.
COMPARABLE = [
    "agg_pricing_summary",
    "scan_parquet_checksum",
    "join_broadcast_star_revenue",
    "join_inner_revenue_by_customer",
    "join_asof_purchase_last_click",
    "window_topn_revenue_per_segment",
    "dedup_exact_sha",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "sim_ann_lsh_bucketed",
    "text_tfidf_vocab",
    "text_lang_id_ngram",
    "stream_session_window_twin",
    "text_minhash_containment",
    "dedup_minhash_estimate_error",
    "graph_triangle_count",
    "dedup_semantic_embedding",
    "agg_ols_two_features",
    "graph_kcore_hindex",
    "sim_mmr_diversified_topk",
    "sim_retrieval_stack_topk",
]

CANARY = "scan_parquet_checksum"


def load_tree(path: str, names: list[str]) -> dict:
    """Import ``path``'s registry and snapshot its query fns; the
    snapshot stays valid after the module purge (function objects
    outlive their sys.modules entries)."""
    for name in [m for m in sys.modules if m == PKG or m.startswith(PKG + ".")]:
        del sys.modules[name]
    sys.path.insert(0, path)
    try:
        reg = importlib.import_module(f"{PKG}.plans.registry")
        qs = reg.all_queries()
        # unknown names are reported by the caller with a usable message
        return {n: qs[n].fn for n in names if n in qs}
    finally:
        sys.path.remove(path)


def main() -> int:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = list(COMPARABLE)
    if len(sys.argv) > 4:
        names = [n for n in sys.argv[4].split(",") if n]
        if CANARY not in names:
            names.append(CANARY)

    fns = {"A": load_tree(tree_a, names), "B": load_tree(tree_b, names)}
    for label, tree in fns.items():
        unknown = sorted(set(names) - set(tree))
        if unknown:
            print(f"unknown query names in tree {label}: {', '.join(unknown)}")
            return 2

    # the session helper is identical in both trees; take B's (current)
    sys.path.insert(0, tree_b)
    from pyspark_for_ebook_classification_spark.session import get_spark

    spark = get_spark("ab_retime")

    def run_once(side: str, name: str) -> float:
        t0 = time.perf_counter()
        fns[side][name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # bench.py's JVM warmup + full untimed warm pass over BOTH sides
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(
        50_000
    ).groupBy("l_returnflag").agg({"l_quantity": "sum"}).collect()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for side in ("A", "B"):
        for name in names:
            run_once(side, name)

    canary_pre = min(run_once("B", CANARY) for _ in range(3))
    t: dict[str, dict[str, float]] = {"A": {}, "B": {}}
    for rep in range(3):
        for side in ("A", "B"):
            for name in names:
                v = run_once(side, name)
                cur = t[side].get(name)
                t[side][name] = v if cur is None else min(cur, v)
        print(f"# pass {rep + 1} done", file=sys.stderr)
    canary_post = min(run_once("B", CANARY) for _ in range(3))
    drift = (canary_post - canary_pre) / max(canary_pre, 1e-9)

    out = {
        "metric": "ab_comparable_total_wall",
        "sf_dir": sf_dir,
        "trees": {"A": tree_a, "B": tree_b},
        "totals": {s: round(sum(t[s].values()), 3) for s in ("A", "B")},
        "queries": {
            n: {"A": round(t["A"][n], 3), "B": round(t["B"][n], 3)}
            for n in names
        },
        "canary": {
            "pre_sec": round(canary_pre, 3),
            "post_sec": round(canary_post, 3),
            "drift_pct": round(100 * drift, 1),
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

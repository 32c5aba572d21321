"""Registry-wide guard against the vacuous-green class (r7 verdict items
1-3): an oracle hash-match on 0 rows cannot distinguish a correct empty
answer from a dead pipeline. text_bm25_topk shipped exactly that in r7 —
its df stopword ceiling emptied the workload on the driver's 31-token
corpus at sf0.01 AND sf0.1, so its driver green, SCALING ratio, and plan
pin were all evidence about an EmptyRelation. Three layers make the
class structurally dead (the Generate-recompute-lint treatment):

  1. evidence mining — any oracle-backed query whose LATEST driver
     verdict recorded spark_rows == 0 and that carries no ``empty_ok``
     annotation must produce rows NOW at the driver's gate scale
     (sf0.01). A query that dies after a code change is caught the
     pytest after the next driver round records it; a query dead at
     annotation time (the BM25 case) is caught immediately.
  2. annotation hygiene — ``empty_ok`` is a pinned exceptional list;
     every entry carries a planted-fixture companion test here proving
     the operator emits rows when the data contains what it looks for
     (a 0-row green plus a planted-fixture pass together DO verify the
     operator; either alone does not).
  3. repaired-query pins — BM25 and RRF fusion are asserted non-vacuous
     at the gate scale, per-modality (the r7 failure cannot silently
     return, including the all-NULL-lexical-leg form).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.plans.registry import all_queries

QUERIES = all_queries()
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The driver's oracle-gate scale. Guards that pin gate-scale behavior run
#: here regardless of the suite's SF_DIR (sf0.001 by default) — the whole
#: r7 defect was a query green at one scale and dead at the others.
GATE_SF_DIR = "/root/testdata/sf0.01"

needs_gate_sf = pytest.mark.skipif(
    not os.path.isdir(GATE_SF_DIR), reason="driver gate-scale testdata absent"
)


def _latest_verdicts() -> dict[str, dict]:
    latest: dict[str, dict] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        for name, v in json.load(open(f)).items():
            latest[name] = v
    return latest


def test_empty_ok_annotations_are_pinned_and_justified():
    """The exceptional list must not grow silently: a new empty_ok entry
    requires updating this pin AND adding a planted-fixture companion
    test below."""
    annotated = {n for n, q in QUERIES.items() if q.empty_ok}
    assert annotated == {
        "join_anti_parts_never_ordered",
        "sim_cosine_neardup_pairs",
    }, f"empty_ok set changed: {sorted(annotated)} — add/remove the companion fixture test"
    for n in annotated:
        assert "test_nonemptiness" in QUERIES[n].empty_ok, (
            f"{n}: empty_ok must cite its companion fixture test"
        )


@needs_gate_sf
def test_no_vacuous_driver_greens(spark):
    """Mine the CORRECTNESS history: every oracle-backed query whose
    latest driver verdict recorded 0 rows must either be annotated
    empty_ok or produce rows at the gate scale today (i.e. the 0-row
    evidence is stale because the workload was repaired — the r8 BM25
    state until the driver re-verifies it)."""
    latest = _latest_verdicts()
    stale_zero = [
        n
        for n, v in latest.items()
        if n in QUERIES
        and QUERIES[n].oracle is not None
        and not QUERIES[n].empty_ok
        and v.get("spark_rows") == 0
    ]
    dead = []
    for n in stale_zero:
        if QUERIES[n].fn(spark, GATE_SF_DIR).count() == 0:
            dead.append(n)
    assert not dead, (
        f"vacuously green queries (0 rows at the gate scale, no empty_ok "
        f"annotation): {dead}"
    )


@needs_gate_sf
def test_bm25_workload_nonempty_at_gate_scale(spark):
    """r7 verdict item 1 done-criterion: the declared BM25 query must
    return rows at the driver's gate scale (it returned 0 under the r7
    df ceiling; the r8 Σdf posting budget restores the workload)."""
    n = QUERIES["text_bm25_topk"].fn(spark, GATE_SF_DIR).count()
    assert n > 0, "text_bm25_topk is vacuous again at the gate scale"


@needs_gate_sf
def test_rrf_fusion_fuses_both_modalities_at_gate_scale(spark):
    """r7 verdict item 2 done-criterion: at the gate scale at least one
    fused row must carry BOTH a lexical and a vector rank — otherwise
    the full-outer 'fusion' is a single-modality passthrough (the r7
    state: the entire BM25 side projected as NULL literals)."""
    out = QUERIES["sim_rrf_hybrid_fusion"].fn(spark, GATE_SF_DIR)
    both = out.filter(
        F.col("lex_rank").isNotNull() & F.col("vec_rank").isNotNull()
    ).count()
    assert both >= 1, "no fused row carries both modality ranks — fusion is vacuous"


def _bump_ids(table: pa.Table, col: str, new_ids: list[int]) -> pa.Table:
    """len(new_ids) copies of row 0 with ``col`` rewritten — schema- and
    type-preserving so Spark reads the planted file exactly like the
    driver's."""
    idx = table.schema.get_field_index(col)
    rows = []
    for nid in new_ids:
        r = table.slice(0, 1)
        rows.append(
            r.set_column(
                idx, r.schema.field(idx), pa.array([nid], type=r.schema.field(idx).type)
            )
        )
    return pa.concat_tables(rows)


def test_anti_join_finds_planted_unordered_part(spark, sf_dir, tmp_path):
    """Companion fixture for join_anti_parts_never_ordered's empty_ok:
    plant a part absent from lineitem and prove the anti-join emits it —
    the 0-row gate-scale green plus this pass verify the operator."""
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"))
    new_id = pc.max(part["p_partkey"]).as_py() + 1
    pq.write_table(
        pa.concat_tables([part, _bump_ids(part, "p_partkey", [new_id])]),
        os.path.join(tmp_path, "part.parquet"),
    )
    shutil.copy(
        os.path.join(sf_dir, "lineitem.parquet"),
        os.path.join(tmp_path, "lineitem.parquet"),
    )
    out = QUERIES["join_anti_parts_never_ordered"].fn(spark, str(tmp_path))
    got = {r["p_partkey"] for r in out.collect()}
    assert new_id in got, "anti-join failed to surface the planted unordered part"


def test_neardup_finds_planted_identical_pair(spark, sf_dir, tmp_path):
    """Companion fixture for sim_cosine_neardup_pairs' empty_ok: plant
    two ids sharing one identical embedding (same LSH bucket by
    construction, cosine exactly 1.0) and prove the pair emerges."""
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    base = pc.max(emb["vec_id"]).as_py()
    pair = (base + 1, base + 2)
    pq.write_table(
        pa.concat_tables([emb, _bump_ids(emb, "vec_id", list(pair))]),
        os.path.join(tmp_path, "embeddings.parquet"),
    )
    out = QUERIES["sim_cosine_neardup_pairs"].fn(spark, str(tmp_path))
    got = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in out.collect()}
    assert pair in got, "near-dup pass failed to surface the planted identical pair"
    assert got[pair] == 1.0

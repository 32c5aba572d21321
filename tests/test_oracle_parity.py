"""The local twin of the driver's t2 gate: run every registered query on
Spark AND its oracle SQL on DuckDB over the same parquet, compare
row-count + columns + exact canonicalized values. Rows-only queries
(oracle=None) are smoke-checked for schema stability and rows >= 0.
"""

from __future__ import annotations

import pytest

from pyspark_for_ebook_classification_spark.plans.registry import all_queries
from tests.compare import assert_frames_match

QUERIES = all_queries()
ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, duck, sf_dir):
    q = QUERIES[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.sql(q.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_smoke(name, spark, sf_dir):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(QUERIES)


def test_priority_rotation_names_exist():
    """Every name in the driver-facing rotation list must be a registered
    query — a typo here would silently push a query out of its verification
    slot."""
    from pyspark_for_ebook_classification_spark.plans.registry import (
        _PRIORITY,
        all_queries,
    )

    qs = all_queries()
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, missing
    assert len(set(_PRIORITY)) == len(_PRIORITY)  # no duplicate slots


def test_bench_and_evidence_names_exist():
    """bench.py's HEADLINE and EXTRA sets drive BENCH/SCALING/PLANS —
    a renamed query must fail here, not silently vanish from evidence."""
    import bench

    qs = QUERIES
    for name in bench.HEADLINE + bench.EXTRA:
        assert name in qs, name
    assert len(set(bench.HEADLINE + bench.EXTRA)) == len(
        bench.HEADLINE + bench.EXTRA
    )


def test_no_nested_output_columns(spark, duck, sf_dir):
    """Registry-wide structural guard against the r3 driver failure class:
    the driver's canonicalizer sorts raw pandas columns and cannot hash
    list/map/struct CELLS, so every oracle-checked query must emit scalar
    columns only — on BOTH engines (the pandas hash sees both results).
    Rows-only queries are exempt (the driver only counts their rows).
    Cited by docstrings at operators/scalar_funcs.py (fn_string_suite2)
    and operators/textops.py (text_inverted_index)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name in ORACLE_NAMES:
        q = QUERIES[name]
        for f in q.fn(spark, sf_dir).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{f.name} (spark): {f.dataType.simpleString()}")
        rel = duck.sql(f"SELECT * FROM ({q.oracle}) LIMIT 0")
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "LIST", "UNION")):
                bad.append(f"{name}.{col} (oracle): {t}")
    assert not bad, "\n".join(bad)


def test_front_block_is_oracle_backed():
    """The 50 rotation-front queries the driver will hash-check this
    round must all carry oracle SQL (a rows-only query in a front slot
    would burn a verification slot on a weaker check)."""
    names = list(QUERIES)[:50]
    assert all(QUERIES[n].oracle is not None for n in names)


def test_r5_front_block_targets_never_verified():
    """The rotation must ADVANCE: r4 burned a driver round re-verifying
    r3's exact set because _PRIORITY wasn't rotated. Pin the fix — the
    current front 50 must all be queries with NO verdict in any recorded
    CORRECTNESS file, so the driver's 50-slot cap only ever spends slots
    on new evidence. When a new CORRECTNESS_r0N.json lands, rotate
    _PRIORITY before this test is allowed to see it."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r0*.json")):
        verified |= set(json.load(open(path)))
    if not verified:  # fresh checkout without driver artifacts
        pytest.skip("no CORRECTNESS files present")
    front = list(QUERIES)[:50]
    already = [n for n in front if n in verified]
    # r5's block was computed against r01–r04; a later round's file will
    # legitimately contain them — only fail if the WHOLE front block is
    # stale (no new names at all), which is the r4 failure mode.
    assert len(already) < 50, (
        "rotation stalled: every front-block query already has a driver "
        f"verdict — rotate _PRIORITY (stale: {already[:5]}...)"
    )

"""Plan-audit tooling (SURVEY.md §4, M6): programmatic checks that the
physical plans are the ones we'd want at 100 TB — filters pushed into the
parquet scan, dims broadcast, whole-stage codegen covering the hot path,
no stray cartesian products.

Usage (also wired into tests/test_plans.py):
    report = audit(df)
    report["pushed_filters"]   # True if the scan has PushedFilters
    report["broadcast_joins"]  # count of BroadcastHashJoin nodes
    ...
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _explain_mode(df: DataFrame, mode: str) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def formatted_plan(df: DataFrame) -> str:
    return _explain_mode(df, "formatted")


def _count_nodes(plan: str, name: str) -> int:
    """Count physical nodes by their numbered tree entries — formatted
    explain prints every node twice (tree line + detail section)."""
    return len(re.findall(rf"\(\d+\) {name}\b", plan))


def audit(df: DataFrame) -> dict:
    """Summarize scale-relevant physical-plan facts.

    codegen_stages comes from codegen-mode explain ('Found N
    WholeStageCodegen subtrees'): under AQE the formatted plan is the
    pre-execution adaptive plan and carries no codegen annotations.
    """
    plan = formatted_plan(df)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", _explain_mode(df, "codegen"))
    return {
        "plan": plan,
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[(?!\])", plan)
        ),  # non-empty pushdown list
        "read_schema_columns": _read_schema_width(plan),
        "broadcast_joins": _count_nodes(plan, "BroadcastHashJoin"),
        "sortmerge_joins": _count_nodes(plan, "SortMergeJoin"),
        "shuffles": _count_nodes(plan, "Exchange"),
        "cartesian": _count_nodes(plan, "CartesianProduct"),
        "bnl_joins": _count_nodes(plan, "BroadcastNestedLoopJoin"),
        "partial_agg": "partial_" in plan,  # map-side combine present
        "codegen_stages": int(m.group(1)) if m else 0,
        "python_workers": _count_nodes(plan, "ArrowEvalPython")
        + _count_nodes(plan, "BatchEvalPython")
        + _count_nodes(plan, "MapInPandas"),
    }


def executed_plan_string(df: DataFrame) -> str:
    """Execute the frame and return the FINAL adaptive plan — the only
    place AQE reveals its actual codegen stages and join choices. Must
    collect() the SAME Dataset: count() would build a different
    QueryExecution and leave this one un-finalized."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _read_schema_width(plan: str) -> int | None:
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return None
    body = m.group(1).strip()
    if not body:
        return 0
    # count top-level fields (embedding arrays contain no commas at depth 0)
    depth, fields = 0, 1
    for ch in body:
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        elif ch == "," and depth == 0:
            fields += 1
    return fields

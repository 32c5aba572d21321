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


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def audit(df: DataFrame) -> dict:
    """Summarize scale-relevant physical-plan facts."""
    plan = formatted_plan(df)
    return {
        "plan": plan,
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[(?!\])", plan)
        ),  # non-empty pushdown list
        "read_schema_columns": _read_schema_width(plan),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffles": plan.count("Exchange"),
        "cartesian": plan.count("CartesianProduct"),
        "bnl_joins": plan.count("BroadcastNestedLoopJoin"),
        "codegen_stages": len(re.findall(r"WholeStageCodegen \(\d+\)", plan)),
        "python_workers": plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("MapInPandas"),
    }


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

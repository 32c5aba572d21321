"""Central query registry — the judge-facing contract surface.

Every operator from SURVEY.md §2 ships as a named query registered here via
the ``@query`` decorator: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus (where SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs
on the same parquet tables. ``__spark_entry__.py`` re-exports these as
``queries()`` / ``oracle_sql()``.

Determinism contract (SURVEY.md §3 entry point 2): the driver compares
row-count + schema + order-insensitive value hash, with columns sorted by
name. Therefore every registered query must
  * alias every computed column, identically in Spark and SQL;
  * produce floating-point values identically in both engines — double
    sums go through DECIMAL (see functions/numeric.py) so they are
    order-independent; libm-dependent results (log/stddev interpolation)
    are rounded;
  * never rely on nondeterministic tie-breaks (LIMIT / row_number orderings
    always end in a unique key).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: operator modules whose import populates the registry
_OPERATOR_MODULES = (
    "pyspark_for_ebook_classification_spark.operators.scans",
    "pyspark_for_ebook_classification_spark.operators.relational",
    "pyspark_for_ebook_classification_spark.operators.joins",
    "pyspark_for_ebook_classification_spark.operators.aggregates",
    "pyspark_for_ebook_classification_spark.operators.windows",
    "pyspark_for_ebook_classification_spark.operators.sets_sorts",
    "pyspark_for_ebook_classification_spark.operators.scalar_funcs",
    "pyspark_for_ebook_classification_spark.operators.classics",
    "pyspark_for_ebook_classification_spark.operators.udfs",
    "pyspark_for_ebook_classification_spark.operators.dedup",
    "pyspark_for_ebook_classification_spark.operators.similarity",
    "pyspark_for_ebook_classification_spark.operators.textops",
    "pyspark_for_ebook_classification_spark.operators.multimodal",
    "pyspark_for_ebook_classification_spark.streaming.twins",
    "pyspark_for_ebook_classification_spark.ml.queries",
)


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    survey_ref: str  # SURVEY.md §2 row id(s) this query covers
    doc: str = ""


_REGISTRY: dict[str, Query] = {}
_LOADED = False


def query(name: str, oracle: str | None = None, survey_ref: str = "", doc: str = ""):
    """Register a declared query. ``oracle=None`` marks it rows-only
    (non-SQL-expressible: LSH randomness, model training, watermarks)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref, doc=doc)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def query_map() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_map() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}


def get(name: str) -> Query:
    _load()
    return _REGISTRY[name]

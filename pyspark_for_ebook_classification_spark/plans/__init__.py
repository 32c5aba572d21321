from pyspark_for_ebook_classification_spark.plans.registry import (
    Query,
    all_queries,
    get,
    oracle_map,
    query,
    query_map,
)

__all__ = ["Query", "all_queries", "get", "oracle_map", "query", "query_map"]

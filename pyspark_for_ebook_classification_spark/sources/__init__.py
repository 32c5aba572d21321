from pyspark_for_ebook_classification_spark.sources.io import (
    TABLES,
    load,
    register_views,
)

__all__ = ["TABLES", "load", "register_views"]

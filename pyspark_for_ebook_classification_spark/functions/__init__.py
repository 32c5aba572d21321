from pyspark_for_ebook_classification_spark.functions.numeric import davg, dsum

__all__ = ["davg", "dsum"]

"""Declared queries for the ML surface (SURVEY.md §2.12).

Model training is not SQL-expressible, so these are rows-only checks for
the driver (oracle=None); their *semantics* are pinned by golden pytest
tests (tests/test_ml.py) on frozen tiny corpora, and the relational half
of the feature engineering is fully oracle-checked in operators/textops.py
(text_tfidf_vocab et al.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.ml.pipeline import (
    TextClassifierConfig,
    evaluate,
    fit_text_classifier,
    split_train_test,
)
from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load


def _text_predictions(spark: SparkSession, sf_dir: str, classifier: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    train, test = split_train_test(docs)
    model = fit_text_classifier(train, TextClassifierConfig(classifier=classifier))
    return model.transform(test).select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.col("label").cast("int").alias("true_label"),
        F.col("prediction").cast("int").alias("pred_label"),
    )


@query(
    "ml_nb_text_predictions",
    survey_ref="M1-M9",
    oracle=None,
    doc="Tokenize→stopwords→HashingTF→IDF→NaiveBayes predictions on held-out docs.",
)
def ml_nb_text_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text_predictions(spark, sf_dir, "nb")


@query(
    "ml_lr_confusion_matrix",
    survey_ref="M7,M10,A9",
    oracle=None,
    doc="LogisticRegression text classifier, confusion matrix via pivot (A9).",
)
def ml_lr_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    preds = _text_predictions(spark, sf_dir, "lr")
    # labels are alphabetAsc-indexed langs: 0..4 (de,en,es,fr,zh)
    return (
        preds.groupBy("true_label")
        .pivot("pred_label", list(range(5)))
        .count()
        .na.fill(0)
    )


@query(
    "ml_cv_grid_best",
    survey_ref="M11",
    oracle=None,
    doc="CrossValidator grid search over NaiveBayes smoothing (2-fold, seeded).",
)
def ml_cv_grid_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11: seeded 2-fold cross-validation over a small smoothing grid.
    Each fold×param fit is an independent Spark job — on a cluster,
    CrossValidator(parallelism=N) runs them concurrently."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    from pyspark_for_ebook_classification_spark.ml.pipeline import build_text_pipeline

    docs = load(spark, sf_dir, "documents").select("text", "lang")
    pipeline = build_text_pipeline()
    nb = pipeline.getStages()[-1]
    grid = ParamGridBuilder().addGrid(nb.smoothing, [0.5, 1.0]).build()
    cv = CrossValidator(
        estimator=pipeline,
        estimatorParamMaps=grid,
        evaluator=MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName="f1"
        ),
        numFolds=2,
        seed=42,
        parallelism=2,
    )
    model = cv.fit(docs)
    best_smoothing = model.bestModel.stages[-1].getSmoothing()
    rows = [
        (float(best_smoothing), float(model.avgMetrics[i]), float(g[nb.smoothing]))
        for i, g in enumerate(grid)
    ]
    return spark.createDataFrame(
        rows, "best_smoothing double, avg_f1 double, grid_smoothing double"
    )


@query(
    "ml_eval_metrics",
    survey_ref="M10,M11",
    oracle=None,
    doc="Accuracy + weighted F1 of the NB text classifier (single-row frame).",
)
def ml_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("text", "lang")
    train, test = split_train_test(docs)
    model = fit_text_classifier(train)
    metrics = evaluate(model.transform(test))
    return spark.createDataFrame(
        [(float(metrics["accuracy"]), float(metrics["f1"]))], "accuracy double, f1 double"
    )

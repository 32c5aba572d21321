"""Declared queries for the ML surface (SURVEY.md §2.12).

Model training is not SQL-expressible, so these are rows-only checks for
the driver (oracle=None); their *semantics* are pinned by golden pytest
tests (tests/test_ml.py) on frozen tiny corpora, and the relational half
of the feature engineering is fully oracle-checked in operators/textops.py
(text_tfidf_vocab et al.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


# ------------------------------------------- relational NB twin (oracle)

_NB_CUT = 8000  # md5 bucket < 8000 -> train (the split_train_test 0.8 band)
_NB_SEED = 42

_NB_SQL = f"""
    WITH docs AS (
        SELECT doc_id, lang,
               list_filter(string_split(text, ' '), t -> t <> '') AS tokens,
               CAST(('0x' || substring(
                   md5(CAST(doc_id AS VARCHAR) || '#{_NB_SEED}'), 1, 15)
               ) AS BIGINT) % 10000 AS bucket
        FROM documents
    ),
    train AS (SELECT * FROM docs WHERE bucket < {_NB_CUT}),
    test  AS (SELECT * FROM docs WHERE bucket >= {_NB_CUT}),
    tr_tok AS (SELECT lang, unnest(tokens) AS token FROM train),
    cnt_lt AS (SELECT lang, token, COUNT(*) AS c FROM tr_tok GROUP BY lang, token),
    tot_l AS (SELECT lang, COUNT(*) AS tot FROM tr_tok GROUP BY lang),
    vocab AS (SELECT DISTINCT token FROM tr_tok),
    vsize AS (SELECT COUNT(*) AS v FROM vocab),
    prior AS (
        SELECT lang, COUNT(*) AS n_docs,
               (SELECT COUNT(*) FROM train) AS n_train
        FROM train GROUP BY lang
    ),
    te_tok AS (
        SELECT t.doc_id, t.lang AS true_lang, x.token, COUNT(*) AS tf
        FROM (SELECT doc_id, lang, unnest(tokens) AS token FROM test) x
        JOIN test t ON t.doc_id = x.doc_id
        JOIN vocab ON vocab.token = x.token
        GROUP BY t.doc_id, t.lang, x.token
    ),
    scored AS (
        SELECT e.doc_id, e.true_lang, p.lang AS cand_lang,
               CAST(round(ln(p.n_docs / CAST(p.n_train AS DOUBLE)), 6)
                    AS DECIMAL(28,6))
               + SUM(CAST(
                     e.tf * round(ln((COALESCE(c.c, 0) + 1.0)
                                     / (t.tot + s.v)), 6)
                 AS DECIMAL(28,6))) AS score
        FROM te_tok e
        CROSS JOIN prior p
        JOIN tot_l t ON t.lang = p.lang
        CROSS JOIN vsize s
        LEFT JOIN cnt_lt c ON c.lang = p.lang AND c.token = e.token
        GROUP BY e.doc_id, e.true_lang, p.lang, p.n_docs, p.n_train
    )
    SELECT doc_id, true_lang, cand_lang AS pred_lang,
           CAST(score AS DOUBLE) AS nb_log_score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, cand_lang ASC
        ) AS rn
        FROM scored
    )
    WHERE rn = 1
"""


@query(
    "ml_nb_relational_twin",
    survey_ref="M7,M9,M10,L6",
    doc="Oracle-checked relational multinomial Naive Bayes: add-one "
    "smoothing over whitespace tokens, md5 hash split, argmax per "
    "held-out doc.",
    oracle=_NB_SQL,
)
def ml_nb_relational_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENGINE-NATIVE half of M7/M10 that a DuckDB oracle CAN check:
    textbook multinomial Naive Bayes, trained and scored relationally.
    The MLlib queries above stay the production classifier surface
    (HashingTF features aren't SQL-expressible), but were rows-only for
    the driver; this twin pins the NB math itself — priors, add-one
    likelihoods, log-sum scoring, argmax — under the exact-value hash
    gate, and a pure-Python third engine re-derives it in
    tests/test_ml.py.

    Semantics: split = the SAME md5(doc_id#42) mod 10000 < 8000 band as
    ml/pipeline.split_train_test; features = whitespace token counts
    (the corpus's native tokens — no hashing, no IDF: NB takes raw
    counts); likelihood log((c+1)/(tot_lang+V)) over the train vocab,
    test tokens outside the train vocab dropped (standard NB scoring);
    prediction = argmax over the train languages, ties to the
    alphabetically first lang. Each log factor rounds to decimal(28,6)
    pre-sum (libm-independence) and the per-(doc,lang) sum accumulates
    in DECIMAL — the text_bigram_lm_score discipline.

    Scale shape: the model is two vocabulary-sized tables (per-lang
    token counts, per-lang totals) plus two scalars — at 100 TB these
    BROADCAST and scoring is one map-side join over the test token
    stream followed by a (doc,lang)-keyed partial agg; training is one
    token-keyed combine. No corpus self-join anywhere."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("doc_id").cast("string"), F.lit(str(_NB_SEED)))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    docs = d.select(
        "doc_id",
        "lang",
        F.filter(F.split("text", " "), lambda t: t != "").alias("tokens"),
        bucket.alias("bucket"),
    )
    train = docs.filter(F.col("bucket") < _NB_CUT)
    test = docs.filter(F.col("bucket") >= _NB_CUT)
    tr_tok = train.select("lang", F.explode("tokens").alias("token"))
    cnt_lt = tr_tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    tot_l = tr_tok.groupBy("lang").agg(F.count(F.lit(1)).alias("tot"))
    vocab = tr_tok.select("token").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    prior = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(n_train))
    )
    te_tok = (
        test.select("doc_id", F.col("lang").alias("true_lang"), F.explode("tokens").alias("token"))
        .join(vocab, "token")
        .groupBy("doc_id", "true_lang", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    log_lik = F.round(
        F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("tot") + F.col("v"))), 6
    )
    log_prior = F.round(
        F.log(F.col("n_docs") / F.col("n_train").cast("double")), 6
    )
    scored = (
        te_tok.crossJoin(
            F.broadcast(prior.select(F.col("lang").alias("cand_lang"), "n_docs", "n_train"))
        )
        .join(
            F.broadcast(tot_l.select(F.col("lang").alias("cand_lang"), "tot")),
            "cand_lang",
        )
        .crossJoin(F.broadcast(vsize))
        .join(
            cnt_lt.select(F.col("lang").alias("cand_lang"), "token", "c"),
            ["cand_lang", "token"],
            "left",
        )
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(
            (
                F.first(log_prior).cast("decimal(28,6)")
                + F.sum((F.col("tf") * log_lik).cast("decimal(28,6)"))
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand_lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "true_lang",
            F.col("cand_lang").alias("pred_lang"),
            F.col("score").cast("double").alias("nb_log_score"),
        )
    )

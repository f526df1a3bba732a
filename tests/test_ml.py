"""Learned document classifier (operators/ml.py): planted separability
and determinism. Model scores are not SQL-expressible, so x19 is
rows-only on the driver contract and bounded here instead."""

from __future__ import annotations

from pyspark.sql import functions as F


def _planted_corpus(spark, n=300):
    # two disjoint vocabularies -> linearly separable bag-of-words
    good = "clean prose paragraph citation reference structured article"
    spam = "click winner casino jackpot free prize lottery urgent"
    rows = [
        (i, (good if i % 2 == 0 else spam) + f" filler{i % 7} pad{i % 11}", float(i % 2 == 0))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_classifier_separates_planted_vocabularies(spark):
    from nagios_custom_etl_spark.operators.ml import score_documents, train_text_classifier

    corpus = _planted_corpus(spark)
    train = corpus.filter("doc_id % 5 != 0")
    holdout = corpus.filter("doc_id % 5 = 0")
    model = train_text_classifier(train, "text", "label")
    scored = score_documents(model, holdout, "doc_id", "text")
    joined = scored.join(holdout.select("doc_id", "label"), "doc_id")
    n = joined.count()
    n_correct = joined.filter(F.col("prediction") == F.col("label").cast("int")).count()
    assert n_correct == n, f"{n_correct}/{n}"
    # calibrated direction: P(label=1) higher for the positive class
    avg = {
        int(r["l"]): r["s"]
        for r in joined.groupBy(F.col("label").cast("int").alias("l"))
        .agg(F.avg("score").alias("s"))
        .collect()
    }
    assert avg[1] > 0.9 > 0.1 > avg[0]


def test_classifier_deterministic_across_layouts(spark):
    from nagios_custom_etl_spark.operators.ml import score_documents, train_text_classifier

    corpus = _planted_corpus(spark, n=120)
    m1 = train_text_classifier(corpus, "text", "label")
    m2 = train_text_classifier(corpus.repartition(7), "text", "label")
    s1 = {r["doc_id"]: r["prediction"] for r in score_documents(m1, corpus, "doc_id", "text").collect()}
    s2 = {r["doc_id"]: r["prediction"] for r in score_documents(m2, corpus, "doc_id", "text").collect()}
    assert s1 == s2


def test_x19_contract_query_confusion_matrix(spark):
    from nagios_custom_etl_spark.plans import all_queries

    out = all_queries()["x19_quality_classifier"].fn(spark, "/root/testdata/sf0.001")
    rows = {(r["label"], r["prediction"]): r["n"] for r in out.collect()}
    total = sum(rows.values())
    correct = rows.get((0, 0), 0) + rows.get((1, 1), 0)
    assert total > 0 and correct / total > 0.85, rows

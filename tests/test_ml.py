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


def test_kmeans_lattice_separated_blobs_converge(spark):
    """Two well-separated integer blobs with centers planted at (10,10)
    and (90,90): from deliberately-bad inits the lattice centroids must
    land exactly on the blob means (closed-form: each blob is symmetric
    around its center, so sum DIV n is the center)."""
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.ml import kmeans_lattice

    rows = []
    i = 0
    for cx, cy in ((10, 10), (90, 90)):
        for dx in (-2, -1, 0, 1, 2):
            for dy in (-2, 0, 2):
                rows.append((i, cx + dx, cy + dy))
                i += 1
    df = spark.createDataFrame(rows, "id long, x long, y long")
    assigned, cents = kmeans_lattice(df, "x", "y", [(0, 0), (30, 30)], iterations=4)
    assert cents == [(0, 10, 10), (1, 90, 90)]
    # every point assigned to its own blob's centroid
    got = {(r.id, r.cid) for r in assigned.select("id", "cid").collect()}
    assert got == {(j, 0 if j < 15 else 1) for j in range(30)}


def test_kmeans_lattice_tie_breaks_to_lowest_cid(spark):
    from nagios_custom_etl_spark.operators.ml import kmeans_lattice

    # a point equidistant from both inits must take cid 0; one round,
    # so the assignment is directly against the inits
    df = spark.createDataFrame([(0, 5, 0)], "id long, x long, y long")
    assigned, _ = kmeans_lattice(df, "x", "y", [(0, 0), (10, 0)], iterations=0)
    assert assigned.collect()[0].cid == 0


def test_kmeans_lattice_empty_cluster_drops(spark):
    from nagios_custom_etl_spark.operators.ml import kmeans_lattice

    # all mass near (0,0); the far init never wins a point and vanishes
    df = spark.createDataFrame([(i, i % 3, 0) for i in range(9)], "id long, x long, y long")
    _, cents = kmeans_lattice(df, "x", "y", [(1, 0), (99, 99)], iterations=2)
    assert cents == [(0, 1, 0)]

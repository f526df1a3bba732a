"""Model-based document scoring (SURVEY §2.12 extension surface).

Production data-curation stacks pair the heuristic quality signals
(functions/text.py) with a learned classifier (fastText-style quality /
language models scoring every document). The container has no external
model runtimes, so the engine ships the Spark-native equivalent:
RegexTokenizer → HashingTF → IDF → LogisticRegression from ``pyspark.ml``
— every stage distributed, no Python UDFs.

Scale notes:
  * HashingTF is map-only (feature index = murmur3 of the token — no
    vocabulary broadcast, no OOV);
  * IDF is one treeAggregate over document frequencies;
  * LogisticRegression is L-BFGS with one treeAggregate per iteration —
    gradient traffic is O(numFeatures), independent of corpus size;
  * scoring is map-only: the fitted model broadcasts its coefficient
    vector (2^15 doubles here) to executors.
All stages are deterministic: murmur3 hashing, zero-initialized L-BFGS,
no sampling anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_text_classifier(
    train: DataFrame,
    text_col: str,
    label_col: str,
    num_features: int = 1 << 15,
    max_iter: int = 20,
    reg_param: float = 0.01,
):
    """Fit tokenize→hashTF→IDF→logistic-regression on ``train`` (binary
    ``label_col`` in {0.0, 1.0}); returns the fitted PipelineModel."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    stages = [
        RegexTokenizer(inputCol=text_col, outputCol="_toks", pattern=r"\s+"),
        HashingTF(inputCol="_toks", outputCol="_tf", numFeatures=num_features),
        IDF(inputCol="_tf", outputCol="_features"),
        LogisticRegression(
            featuresCol="_features",
            labelCol=label_col,
            maxIter=max_iter,
            regParam=reg_param,
        ),
    ]
    return Pipeline(stages=stages).fit(train)


def score_documents(model, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Map-only scoring: (id, score, prediction) per document, where score
    is P(label=1). vector_to_array keeps the output a plain double column
    (no VectorUDT leaking into sinks)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df.select(id_col, text_col))
    return scored.select(
        F.col(id_col),
        vector_to_array("probability").getItem(1).alias("score"),
        F.col("prediction").cast("int").alias("prediction"),
    )


def kmeans_lattice(
    df: DataFrame,
    x_col: str,
    y_col: str,
    init: list[tuple[int, int]],
    iterations: int = 3,
) -> tuple[DataFrame, list[tuple[int, int, int]]]:
    """Lloyd's k-means over INTEGER 2-D points with centroids snapped to
    the integer lattice each round (floor-divided means) — the variant
    chosen, like :func:`~nagios_custom_etl_spark.operators.graph.pagerank`'s
    ignore-dangling choice, because every step is exact integer
    arithmetic and therefore bit-identically replayable by an oracle:
    squared distances are integers (no ulp-order argmin flips), ties
    break to the lowest cluster id, and the centroid update
    ``sum DIV n`` floors identically in every engine. An empty cluster
    drops (its centroid vanishes from the next round), the standard
    restart-free handling.

    Scale design — exactly Spark MLlib's own k-means loop: per round
    ONE map pass assigns each point to the nearest of K broadcast
    centroid literals (a static CASE expression, codegen'd — K is
    small) and ONE groupBy(K) aggregate produces the next centroids;
    only K rows ever reach the driver (bounded metadata, the same
    budget as pagerank's node count). No per-round shuffle of the
    points themselves; lineage stays flat because each round's
    assignment recomputes from the (cached) source, not from the prior
    assignment.

    Returns (assignments DataFrame with ``cid`` added, final centroids
    as ``[(cid, cx, cy), ...]``).
    """
    pts = df.select(df["*"], F.col(x_col).alias("_x"), F.col(y_col).alias("_y")).cache()
    cents = [(i, int(cx), int(cy)) for i, (cx, cy) in enumerate(init)]

    def assign_expr(cs: list[tuple[int, int, int]]):
        # chained CASE "WHEN d_i <= d_j for every j > i THEN i": the
        # first taken branch is the LOWEST-id global argmin (any lower
        # id that lost was beaten by some higher id, failing its own
        # branch) — a deterministic, engine-replicable tie-break.
        dists = [
            (cid, (F.col("_x") - cx) * (F.col("_x") - cx) + (F.col("_y") - cy) * (F.col("_y") - cy))
            for cid, cx, cy in cs
        ]
        expr = F.lit(dists[-1][0])
        for i in range(len(dists) - 2, -1, -1):
            cid, d = dists[i]
            cond = None
            for _cid2, d2 in dists[i + 1 :]:
                c = d <= d2
                cond = c if cond is None else (cond & c)
            expr = F.when(cond, F.lit(cid)).otherwise(expr)
        return expr

    for _ in range(iterations):
        assigned = pts.withColumn("cid", assign_expr(cents))
        rows = (
            assigned.groupBy("cid")
            .agg(
                F.expr("sum(_x) DIV count(*)").alias("cx"),
                F.expr("sum(_y) DIV count(*)").alias("cy"),
            )
            .collect()  # bounded: K rows of centroid metadata
        )
        cents = sorted((r.cid, int(r.cx), int(r.cy)) for r in rows)
    final = pts.withColumn("cid", assign_expr(cents)).drop("_x", "_y")
    return final, cents

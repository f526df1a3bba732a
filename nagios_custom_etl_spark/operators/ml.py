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

"""Python UDTF escape hatch (SURVEY §2.11): Spark 4 user-defined table
functions — one input row to N output rows with imperative Python.

The reference has no UDTF surface (SURVEY §2.13); this completes the
engine's escape-hatch family next to pandas_udf / applyInPandas /
mapInPandas / applyInPandasWithState. Like all Python evaluation it is
the SLOW path: row-at-a-time pickling, no codegen — everything this demo
does is also expressed as codegen'd generators in operators/dedup.py
(``_exploded_shingles``), which is what hot paths must use. A UDTF is
the right tool only when per-row fan-out needs real Python (a parser, a
tokenizer library, a decoder) that no builtin or Arrow-batched form can
express.

Scale notes: UDTFs run per-partition inside Python workers, so
parallelism follows the input partitioning like any map-side op; there
is no shuffle. Keep emitted rows narrow — every byte crosses the
JVM<->Python boundary pickled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.functions import udtf


@udtf(returnType="pos bigint, bigram string")
class BigramUDTF:
    """Emit (position, word-bigram) rows for one whitespace-tokenized
    text value. Tokenization matches functions.text.tokens (split on
    single spaces, drop empties)."""

    def eval(self, text: str):  # noqa: D102 — interface fixed by Spark
        toks = [t for t in (text or "").split(" ") if t]
        for i in range(len(toks) - 1):
            yield i, f"{toks[i]} {toks[i + 1]}"


def bigrams_via_udtf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, bigram): the UDTF applied laterally to each input row."""
    spark = df.sparkSession
    spark.udtf.register("nces_bigrams", BigramUDTF)
    view = "_nces_udtf_in"
    df.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT {id_col}, t.pos, t.bigram "
        f"FROM {view}, LATERAL nces_bigrams({text_col}) AS t"
    )

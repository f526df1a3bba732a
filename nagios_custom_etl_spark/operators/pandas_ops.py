"""Grouped-map pandas escape hatch (SURVEY §2.11).

The engine keeps Python off every hot path, but exposes the standard
vectorized escape hatches for semantics built-ins can't express cheaply.
``robust_zscore`` is the worked example: per-group median/MAD
normalization — rank statistics per group are a natural grouped-map
(one Arrow batch per group, pandas vectorized inside).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "user_id long, event_id long, robust_z double"


def robust_zscore(df: DataFrame, key: str = "user_id", value: str = "value") -> DataFrame:
    """Per-key robust z-score: (x - median) / (1.4826 * MAD).

    MAD = median(|x - median|); the 1.4826 factor makes it a consistent
    sigma estimator under normality. Groups with MAD == 0 yield null.
    At scale: one shuffle on the key; each group is one pandas batch, so
    the largest group must fit an executor (salt or approximate for
    pathological keys).
    """

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf[value].median()
        mad = (pdf[value] - med).abs().median()
        denom = 1.4826 * mad
        z = (pdf[value] - med) / denom if denom > 0 else pd.Series([None] * len(pdf))
        return pd.DataFrame(
            {"user_id": pdf[key], "event_id": pdf["event_id"], "robust_z": z}
        )

    return df.groupBy(key).applyInPandas(per_group, schema=OUT_SCHEMA)

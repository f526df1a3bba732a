"""Expectations-gate tests (x121): NULL predicates count as
violations, quarantine carries the full diagnosis, fail aborts
eagerly, refusals on malformed rule sets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nagios_custom_etl_spark.operators.quality import (
    ExpectationFailed,
    expectations_apply,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, -3.0, "a"),  # violates nonneg (drop)
            (3, None, "b"),  # NULL predicate -> violation (drop)
            (4, 7.0, None),  # violates cat_present (warn) only
        ],
        "id int, v double, cat string",
    )


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return [
        ("nonneg", F.col("v") >= 0, "drop"),
        ("cat_present", F.col("cat").isNotNull(), "warn"),
    ]


def test_routing_metrics_and_null_semantics(spark):
    kept, quar, metrics = expectations_apply(_df(spark), _rules())
    assert sorted(r.id for r in kept.collect()) == [1, 4]
    q = {r.id: sorted(r._violations) for r in quar.collect()}
    assert q == {2: ["nonneg"], 3: ["nonneg"]}
    m = {r.rule: (r.action, r.n_violations) for r in metrics.collect()}
    assert m == {"nonneg": ("drop", 2), "cat_present": ("warn", 1)}
    # warn violations ride along in kept (DLT expect): row 4 kept
    assert "_violations" not in kept.columns


def test_quarantine_carries_full_diagnosis(spark):
    df = spark.createDataFrame([(9, -1.0, None)], "id int, v double, cat string")
    _kept, quar, _m = expectations_apply(df, _rules())
    [row] = quar.collect()
    assert sorted(row._violations) == ["cat_present", "nonneg"]


def test_fail_aborts_eagerly_with_counts(spark):
    rules = _rules() + [("id_small", F.col("id") < 3, "fail")]
    with pytest.raises(ExpectationFailed) as ei:
        expectations_apply(_df(spark), rules)
    assert ei.value.counts == {"id_small": 2}


def test_rule_set_refusals(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="no rules"):
        expectations_apply(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        expectations_apply(df, [("r", F.lit(True), "warn"), ("r", F.lit(True), "drop")])
    with pytest.raises(ValueError, match="unknown action"):
        expectations_apply(df, [("r", F.lit(True), "quarantine")])

"""Pins for the MV automatic query rewrite (operators/mv_rewrite.py,
x85): rewrite-vs-base equivalence for every derivable aggregate
(including NULL measures, where avg must divide by the nonnull count),
conservative fallback on non-derivable aggregates and unknown grains,
and the physical proof that a rewritten plan scans the MV files rather
than the base table."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nagios_custom_etl_spark.operators.mv_rewrite import (
    AggSpec,
    SummaryView,
    build_summary,
    rewrite_aggregate,
)

MEASURES = {"v": (18, 6)}

AGGS = [
    AggSpec("count", None, "n"),
    AggSpec("sum", "v", "sum_v"),
    AggSpec("avg", "v", "avg_v"),
    AggSpec("min", "v", "min_v"),
    AggSpec("max", "v", "max_v"),
]


@pytest.fixture(scope="module")
def base(spark):
    # two dims, a NULL measure inside group 'a', and a group of all-NULLs:
    # the avg derivation (sum / NONNULL count) is what separates a correct
    # rewrite from the tempting sum/count(*)
    rows = [
        ("a", "x", 1.5),
        ("a", "x", None),
        ("a", "y", 2.25),
        ("b", "x", -3.5),
        ("b", "y", 0.75),
        ("b", "y", 10.0),
        ("c", "x", None),
    ]
    return spark.createDataFrame(rows, "g string, h string, v double")


@pytest.fixture(scope="module")
def mv(spark, base):
    summary, kwargs = build_summary(base, ["g", "h"], MEASURES)
    path = os.path.join(tempfile.gettempdir(), f"nagios_etl_test_mv_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    summary.write.mode("overwrite").parquet(path)
    yield {"daily": SummaryView(df=spark.read.parquet(path), **kwargs)}, path
    shutil.rmtree(path, ignore_errors=True)


def _sorted(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("dims", [["g"], ["h"], ["g", "h"]])
def test_rewrite_equals_base_on_every_subsumed_grain(spark, base, mv, dims):
    views, _ = mv
    plan, prov = rewrite_aggregate(base, dims, AGGS, views, MEASURES)
    assert prov == "mv:daily"
    direct, prov2 = rewrite_aggregate(base, dims, AGGS, {}, MEASURES)
    assert prov2 == "base"
    assert _sorted(plan) == _sorted(direct)


def test_avg_divides_by_nonnull_count(spark, base, mv):
    views, _ = mv
    plan, prov = rewrite_aggregate(base, ["g"], AGGS, views, MEASURES)
    assert prov == "mv:daily"
    got = {r["g"]: r for r in plan.collect()}
    # group 'a': 3 rows, 2 nonnull values (1.5, 2.25) -> avg 1.875, not 1.25
    assert got["a"]["n"] == 3
    assert got["a"]["avg_v"] == pytest.approx(1.875)
    # all-NULL group: sum/avg/min/max NULL, count still 1
    assert got["c"]["n"] == 1
    assert got["c"]["sum_v"] is None and got["c"]["avg_v"] is None


def test_count_distinct_falls_back_to_base(spark, base, mv):
    views, _ = mv
    aggs = AGGS + [AggSpec("count_distinct", "v", "nd_v")]
    plan, prov = rewrite_aggregate(base, ["g"], aggs, views, MEASURES)
    assert prov == "base"  # a distinct set cannot re-aggregate from counts
    got = {r["g"]: r["nd_v"] for r in plan.collect()}
    assert got == {"a": 2, "b": 3, "c": 0}


def test_unknown_grain_falls_back_to_base(spark, base, mv):
    views, _ = mv
    wide = base.withColumn("k", F.col("g"))
    plan, prov = rewrite_aggregate(wide, ["k"], AGGS, views, MEASURES)
    assert prov == "base"  # 'k' is not a dim of the summary


def test_rewritten_plan_scans_mv_files_not_base(spark, base, mv):
    views, path = mv
    plan, prov = rewrite_aggregate(base, ["h"], AGGS, views, MEASURES)
    assert prov == "mv:daily"
    physical = plan._sc._jvm.PythonSQLUtils.explainString(
        plan._jdf.queryExecution(), "formatted"
    )
    assert os.path.basename(path) in physical
    # the base relation is an in-memory LocalRelation here; the rewritten
    # plan must reference only the MV scan — no exchange back to base rows
    assert "LocalTableScan" not in physical and "Scan ExistingRDD" not in physical


def test_approx_distinct_rewrite_bit_identical_to_base(spark):
    """The register map stored at the summary grain re-max-merges to the
    SAME registers as sketching the base rows — so the rewritten
    estimate equals the base-path estimate exactly, not approximately;
    provenance flips mv/base as the view does or does not derive it."""
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.mv_rewrite import (
        AggSpec,
        SummaryView,
        build_summary,
        rewrite_aggregate,
    )

    base = spark.range(0, 4000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 5).cast("string").alias("h"),
        (F.col("id") % 700).alias("u"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    sdf, kw = build_summary(base, ["g", "h"], {"v": (18, 6)}, hll_cols=["u"])
    views = {"gh": SummaryView(df=sdf, **kw)}
    aggs = [
        AggSpec("count", None, "n"),
        AggSpec("approx_count_distinct", "u", "du_est"),
    ]
    mv_plan, prov = rewrite_aggregate(base, ["g"], aggs, views, {"v": (18, 6)})
    assert prov == "mv:gh"
    base_plan, prov2 = rewrite_aggregate(base, ["g"], aggs, {}, {"v": (18, 6)})
    assert prov2 == "base"
    a = {r.g: (r.n, r.du_est) for r in mv_plan.collect()}
    b = {r.g: (r.n, r.du_est) for r in base_plan.collect()}
    assert a == b  # bit-identical, not approximately equal
    # sanity: the estimate is in the right ballpark of the true distinct
    exact = {
        r.g: r.d
        for r in base.groupBy("g").agg(F.count_distinct("u").alias("d")).collect()
    }
    for g, (_, est) in a.items():
        assert abs(est - exact[g]) / exact[g] < 0.25


def test_exact_distinct_still_falls_back_and_empty_grain_refused(spark):
    import pytest
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.mv_rewrite import (
        AggSpec,
        SummaryView,
        build_summary,
        rewrite_aggregate,
    )

    base = spark.range(0, 100).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 7).alias("u"),
        F.col("id").cast("double").alias("v"),
    )
    sdf, kw = build_summary(base, ["g"], {"v": (18, 6)}, hll_cols=["u"])
    views = {"g": SummaryView(df=sdf, **kw)}
    plan, prov = rewrite_aggregate(
        base, ["g"], [AggSpec("count_distinct", "u", "d")], views, {"v": (18, 6)}
    )
    assert prov == "base"  # exact distinct is never derivable
    assert {r.g: r.d for r in plan.collect()} == {"0": 7, "1": 7}
    with pytest.raises(ValueError, match="non-empty grain"):
        rewrite_aggregate(
            base, [], [AggSpec("approx_count_distinct", "u", "d")], views, {}
        )

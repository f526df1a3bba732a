"""Relational-operator assertions beyond the oracle harness: approximate
aggregates bounded against exact values, and physical-plan quality (the
plans we'd want at 100 TB, not just plans that pass)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import load_table
from nagios_custom_etl_spark.plans import all_queries


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    """a3 emits (exact, within-bound flag) so its oracle can hash-check
    the HLL contract; the exact column must equal an independent
    count_distinct and every flag must be True."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count_distinct("l_orderkey").alias("n")).collect()
    }
    rows = all_queries()["a3_approx_distinct"].fn(spark, sf_dir).collect()
    assert {r["l_returnflag"]: r["exact_orders"] for r in rows} == exact
    assert all(r["approx_within_rsd"] is True for r in rows), rows


def test_approx_percentile_within_bounds(spark, sf_dir):
    """a8 emits (exact interpolated median, within-5% flag) so its oracle
    can hash-check the sketch contract; exact must match an independent
    percentile and every flag must be True."""
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["m"]
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", 0.5).alias("m"))
        .collect()
    }
    rows = all_queries()["a8_approx_percentile"].fn(spark, sf_dir).collect()
    assert {r["l_returnflag"]: r["exact_median_price"] for r in rows} == exact
    assert all(r["approx_within_eps"] is True for r in rows), rows


# ---------------------------------------------------------------------------
# plan quality — the .explain discipline
# ---------------------------------------------------------------------------


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(all_queries()["q1_pricing_summary"].fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan reads only q1's columns PLUS l_orderkey —
    # the fact-spread key (catalog._FACT_SPREAD_KEYS): one extra bigint
    # per row buys the hash distribution that parallelizes this agg and
    # pre-satisfies every orderkey join. Everything else stays pruned.
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    assert "l_comment" not in read_schema  # widest column stays pruned
    assert "hashpartitioning(l_orderkey" in plan  # the spread that reads it
    assert "HashAggregate" in plan  # partial+final hash agg, not sort-based


def test_j5_dimensions_broadcast(spark, sf_dir):
    plan = plan_of(all_queries()["j5_multiway_revenue_by_nation"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # customer/nation/region never shuffle the fact side
    assert "CartesianProduct" not in plan


def test_w4_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(all_queries()["w4_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no global sort


def test_semi_and_anti_join_physical(spark, sf_dir):
    semi = plan_of(all_queries()["j1_semi_join"].fn(spark, sf_dir))
    anti = plan_of(all_queries()["j3_anti_join"].fn(spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_lsh_candidate_join_is_equi_not_cross(spark, sf_dir):
    from nagios_custom_etl_spark.operators.dedup import lsh_candidate_pairs

    d = load_table(spark, sf_dir, "documents")
    plan = plan_of(lsh_candidate_pairs(d, "doc_id", "text"))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_no_query_poisons_the_table_cache(spark, sf_dir):
    """Regression: a registry query must not cache() a shared base table.

    Spark's cache manager is plan-keyed — a cached full-table scan silently
    replaces every later parquet scan of that table in the session, which
    drops PushedFilters (and would mean caching the whole fact table at
    scale). Build + run the subquery-family plans, then assert a fresh
    lineitem scan still pushes its filter into the parquet reader.
    """
    qs = all_queries()
    for name in ("q17_small_quantity_revenue", "q21_sole_late_supplier", "q15_top_supplier"):
        qs[name].fn(spark, sf_dir).collect()
    plan = plan_of(all_queries()["q1_pricing_summary"].fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_x87_runtime_bloom_filter_is_injected_and_confs_restored(spark, sf_dir):
    """x87's contract: the fact-side scan carries a might_contain guard
    fed by a bloom_filter_agg over the filtered dim keys (the no-
    broadcast semi-join pruning path), and the forced-shuffle confs the
    query sets are restored afterwards."""
    from tests.conftest import SF_ORACLE

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    df = all_queries()["x87_bloom_pruned_join"].fn(spark, SF_ORACLE)
    # 1/5 region selectivity over >=100 suppliers: nonempty at sf0.01
    # under any fixture regeneration (P(empty) ~ 0.8^100)
    assert df.count() > 0
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    # the in-fn provenance assertion is live: with injection disabled
    # the query must refuse to run rather than silently fall back
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "0")
    try:
        import pytest

        with pytest.raises(AssertionError, match="bloom"):
            all_queries()["x87_bloom_pruned_join"].fn(spark, SF_ORACLE)
    finally:
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")

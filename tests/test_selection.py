"""Planted-frontier tests for operators/selection.py (x96): the
distributed bucketed skyline must equal the brute-force dominance
definition, including tie and duplicate-point edges."""

from __future__ import annotations

import random

import pytest  # noqa: F401 — parity with sibling test modules

from nagios_custom_etl_spark.operators.selection import (
    pareto_skyline,
    pareto_skyline_points,
)


def _brute(points):
    out = []
    for p in points:
        if not any(
            (o[0] >= p[0] and o[1] >= p[1] and (o[0] > p[0] or o[1] > p[1]))
            for o in points
        ):
            out.append(p)
    return sorted(set(out))


def test_skyline_matches_brute_force_random(spark):
    rnd = random.Random(13)
    pts = [(rnd.randrange(100), rnd.randrange(100)) for _ in range(500)]
    df = spark.createDataFrame(pts, "a int, b int")
    got = sorted({(r.a, r.b) for r in pareto_skyline_points(df, "a", "b").collect()})
    assert got == _brute(pts)


def test_skyline_ties_and_duplicates_all_survive(spark):
    # (5,5) twice: equal points never dominate each other — both rows keep
    rows = [(5, 5, "x"), (5, 5, "y"), (5, 4, "dom"), (4, 6, "keep"), (3, 3, "dom2")]
    df = spark.createDataFrame(rows, "a int, b int, tag string")
    got = sorted((r.a, r.b, r.tag) for r in pareto_skyline(df, "a", "b").collect())
    assert got == [(4, 6, "keep"), (5, 5, "x"), (5, 5, "y")]


def test_skyline_single_value_axis(spark):
    # degenerate: every point shares a — only the max-b survivors remain
    df = spark.createDataFrame([(1, 1), (1, 9), (1, 9)], "a int, b int")
    got = sorted((r.a, r.b) for r in pareto_skyline(df, "a", "b").collect())
    assert got == [(1, 9), (1, 9)]


def _brute_nd(points):
    out = []
    for p in points:
        if not any(
            all(o[i] >= p[i] for i in range(len(p)))
            and any(o[i] > p[i] for i in range(len(p)))
            for o in points
        ):
            out.append(p)
    return sorted(set(out))


def test_skyline_nd_matches_brute_force_3d(spark):
    from nagios_custom_etl_spark.operators.selection import pareto_skyline_points_nd

    rnd = random.Random(29)
    pts = [
        (rnd.randrange(60), rnd.randrange(60), rnd.randrange(60)) for _ in range(600)
    ]
    df = spark.createDataFrame(pts, "a int, b int, c int")
    got = sorted(
        {(r.a, r.b, r.c) for r in pareto_skyline_points_nd(df, ["a", "b", "c"]).collect()}
    )
    assert got == _brute_nd(pts)


def test_skyline_nd_agrees_with_2d_scan(spark):
    from nagios_custom_etl_spark.operators.selection import pareto_skyline_points_nd

    rnd = random.Random(31)
    pts = [(rnd.randrange(100), rnd.randrange(100)) for _ in range(400)]
    df = spark.createDataFrame(pts, "a int, b int")
    nd = sorted({(r.a, r.b) for r in pareto_skyline_points_nd(df, ["a", "b"]).collect()})
    sc = sorted({(r.a, r.b) for r in pareto_skyline_points(df, "a", "b").collect()})
    assert nd == sc


def test_skyline_nd_4d_and_degenerate_axis(spark):
    from nagios_custom_etl_spark.operators.selection import pareto_skyline_points_nd

    rnd = random.Random(37)
    # one axis constant: dominance reduces to the remaining 3
    pts = [
        (rnd.randrange(20), 7, rnd.randrange(20), rnd.randrange(20))
        for _ in range(300)
    ]
    df = spark.createDataFrame(pts, "a int, b int, c int, d int")
    got = sorted(
        {
            (r.a, r.b, r.c, r.d)
            for r in pareto_skyline_points_nd(df, ["a", "b", "c", "d"]).collect()
        }
    )
    assert got == _brute_nd(pts)


def test_skyline_nd_correlated_anticorrelated(spark):
    from nagios_custom_etl_spark.operators.selection import pareto_skyline_points_nd

    # anti-correlated axes -> big frontier (stress the verify join);
    # correlated -> tiny frontier (stress wholesale cell pruning)
    anti = [(i, 1000 - i, (i * 7) % 97) for i in range(0, 1000, 3)]
    df = spark.createDataFrame(anti, "a int, b int, c int")
    got = sorted(
        {(r.a, r.b, r.c) for r in pareto_skyline_points_nd(df, ["a", "b", "c"]).collect()}
    )
    assert got == _brute_nd(anti)
    corr = [(i, i + 5, i % 11) for i in range(400)]
    df2 = spark.createDataFrame(corr, "a int, b int, c int")
    got2 = sorted(
        {(r.a, r.b, r.c) for r in pareto_skyline_points_nd(df2, ["a", "b", "c"]).collect()}
    )
    assert got2 == _brute_nd(corr)

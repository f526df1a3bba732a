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

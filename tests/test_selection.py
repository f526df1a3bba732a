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


def test_nd_bucket_cap_bounds_pair_relation():
    """The worst-case cell-pair relation (fully anti-correlated data)
    is b^(2d); the per-d cap keeps it metadata-sized BY CONSTRUCTION,
    so the broadcast claim holds against adversarial distributions."""
    from nagios_custom_etl_spark.operators.selection import _nd_buckets

    for d in (2, 3, 4, 6, 8):
        b = _nd_buckets(d, 1000)
        assert b ** (2 * d) <= 1 << 20
        assert (b + 1) ** (2 * d) > 1 << 20 or b == 1000
        assert b >= 2
    # defaults survive un-clamped where they already fit
    assert _nd_buckets(2, 8) == 8
    assert _nd_buckets(3, 8) == 8
    assert _nd_buckets(4, 8) == 5  # clamped: 8^8 pairs would be 16M


def test_skyline_4d_anticorrelated_stress(spark):
    """d=4 fully anti-correlated points (the worst case for grid
    pruning: the whole diagonal shell survives): result still equals
    brute-force dominance, and the clamped grid keeps the plan's
    broadcast side bounded."""
    import itertools
    import random

    from nagios_custom_etl_spark.operators.selection import pareto_skyline_points_nd

    rnd = random.Random(7)
    rows = []
    for _ in range(400):
        a, b, c = rnd.randint(0, 50), rnd.randint(0, 50), rnd.randint(0, 50)
        d = 160 - a - b - c + rnd.randint(-2, 2)  # near-simplex: anti-correlated
        rows.append((a, b, c, d))
    df = spark.createDataFrame(rows, "a int, b int, c int, d int")
    got = {
        tuple(r) for r in pareto_skyline_points_nd(df, ["a", "b", "c", "d"]).collect()
    }
    pts = set(rows)

    def dominated(p):
        return any(
            all(q[i] >= p[i] for i in range(4)) and any(q[i] > p[i] for i in range(4))
            for q in pts
        )

    want = {p for p in pts if not dominated(p)}
    assert got == want

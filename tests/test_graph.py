"""Triangle counting (operators/graph.py): closed-form fixtures and
orientation invariance. The x86 oracle additionally hash-pins the full
co-purchase pipeline against a naive id-ordered DuckDB construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nagios_custom_etl_spark.operators.graph import (
    cooccurrence_edges,
    triangle_participation,
    triangles,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(u), int(v)) for u, v in pairs], "u long, v long")


def test_k4_has_four_triangles_each_vertex_in_three(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tri = triangles(_edges_df(spark, k4)).collect()
    assert len(tri) == 4
    # each emitted once: the 4 vertex triples of K4, unordered-unique
    triples = {frozenset((r["a"], r["b"], r["c"])) for r in tri}
    assert triples == {frozenset(t) for t in [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]}
    part = {r["node"]: r["n_triangles"] for r in triangle_participation(_edges_df(spark, k4)).collect()}
    assert part == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_free_graph_is_empty(spark):
    # C4 (4-cycle) + a pendant edge: no triangles
    c4 = [(0, 1), (1, 2), (2, 3), (0, 3), (3, 4)]
    assert triangles(_edges_df(spark, c4)).count() == 0


def test_hub_graph_orientation_invariance(spark):
    """A hub (vertex 0) adjacent to all of 1..9, plus ring edges among
    the leaves: degree orientation points every hub edge AWAY from the
    leaves (hub has max degree), yet the triangle set must equal the
    naive id-ordered enumeration."""
    hub = [(0, i) for i in range(1, 10)]
    ring = [(i, i + 1) for i in range(1, 9)] + [(1, 9)]
    edges = _edges_df(spark, hub + ring)
    got = {
        frozenset((r["a"], r["b"], r["c"])) for r in triangles(edges).collect()
    }
    # naive: every ring edge (i,j) closes with the hub -> 9 triangles
    expected = {frozenset((0, i, j)) for i, j in ring}
    assert got == expected


def test_cooccurrence_edges_support_threshold(spark):
    rows = [
        (1, 10), (1, 11), (1, 12),  # order 1: pairs (10,11) (10,12) (11,12)
        (2, 10), (2, 11),           # order 2: pair (10,11) again
        (2, 10),                    # duplicate line: must not double-count
    ]
    df = spark.createDataFrame(rows, "ok long, item long")
    e1 = {(r["u"], r["v"]) for r in cooccurrence_edges(df, "ok", "item").collect()}
    assert e1 == {(10, 11), (10, 12), (11, 12)}
    e2 = {(r["u"], r["v"]) for r in cooccurrence_edges(df, "ok", "item", min_support=2).collect()}
    assert e2 == {(10, 11)}


def test_random_graphs_match_bruteforce(spark):
    """Property pin across arbitrary topologies: the degree-ordered
    forward algorithm equals brute-force triple enumeration on seeded
    Erdos-Renyi graphs (hubs, ties, isolated vertices, all of it)."""
    import itertools
    import random

    for seed, n, p in [(1, 12, 0.4), (2, 18, 0.25), (3, 25, 0.15)]:
        rng = random.Random(seed)
        pairs = [(u, v) for u in range(n) for v in range(u + 1, n) if rng.random() < p]
        adj = set(pairs)
        expected = {
            frozenset(t)
            for t in itertools.combinations(range(n), 3)
            if (t[0], t[1]) in adj and (t[0], t[2]) in adj and (t[1], t[2]) in adj
        }
        got = {
            frozenset((r["a"], r["b"], r["c"]))
            for r in triangles(_edges_df(spark, pairs)).collect()
        }
        assert got == expected, f"seed={seed}: {len(got)} vs {len(expected)}"


def test_pagerank_star_and_cycle(spark):
    from nagios_custom_etl_spark.operators.graph import pagerank

    # star: 2->1, 3->1 — the hub collects mass, the leaves keep the floor
    star = spark.createDataFrame([(2, 1), (3, 1)], "src long, dst long")
    r = {x.node: x.pr for x in pagerank(star, iterations=10).collect()}
    assert r[2] == pytest.approx(r[3])
    assert r[1] > r[2]
    assert r[2] == pytest.approx(0.15 / 3)  # leaves have no in-edges
    # 3-cycle: symmetric, every node converges to 1/3
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    for row in pagerank(cyc, iterations=20).collect():
        assert row.pr == pytest.approx(1 / 3, abs=1e-9)


def test_pagerank_dangling_mass_ignored(spark):
    from nagios_custom_etl_spark.operators.graph import pagerank

    # 1->2, 2 dangles: the documented variant lets 2's mass vanish
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    r = {x.node: x.pr for x in pagerank(e, iterations=3).collect()}
    base = 0.15 / 2
    assert r[1] == pytest.approx(base)  # no in-edges, every round
    assert r[2] == pytest.approx(base + 0.85 * base)  # receives 1's full rank


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.graph import pagerank

    # 1->2, 2->3, 3 dangles; 4 isolated? (no edges -> not a node). Use a
    # chain with a dangling sink: without redistribution total mass
    # decays; with it, sum(pr) == 1 every round (stochastic fixpoint).
    e = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    lossy = pagerank(e, iterations=8).agg(F.sum("pr")).first()[0]
    full = pagerank(e, iterations=8, dangling=True).agg(F.sum("pr")).first()[0]
    assert lossy < 0.999
    assert full == pytest.approx(1.0, abs=1e-9)


def test_pagerank_tol_early_stop_matches_long_run(spark):
    from nagios_custom_etl_spark.operators.graph import pagerank

    # symmetric 3-cycle converges in one round: rank is exactly 1/3 from
    # the start, so tol stops it well before the requested 50 rounds
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    stats = {}
    r = {
        x.node: x.pr
        for x in pagerank(cyc, iterations=50, tol=1e-12, stats=stats).collect()
    }
    assert stats["rounds"] < 50 and stats["delta"] < 1e-12
    for v in r.values():
        assert v == pytest.approx(1 / 3, abs=1e-9)
    # early-stopped result equals the full fixed-K run
    r_full = {x.node: x.pr for x in pagerank(cyc, iterations=50).collect()}
    for k in r:
        assert r[k] == pytest.approx(r_full[k], abs=1e-9)


def test_pagerank_dangling_chain_values(spark):
    from nagios_custom_etl_spark.operators.graph import pagerank

    # hand-checked 2-node chain 1->2 (2 dangles), one round from uniform:
    # D0 = r0(2) = 1/2
    # r1(1) = 0.075 + 0.85*(0 + 0.25) = 0.2875
    # r1(2) = 0.075 + 0.85*(0.5 + 0.25) = 0.7125
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    r = {x.node: x.pr for x in pagerank(e, iterations=1, dangling=True).collect()}
    assert r[1] == pytest.approx(0.075 + 0.85 * 0.25, abs=1e-12)
    assert r[2] == pytest.approx(0.075 + 0.85 * 0.75, abs=1e-12)


def test_label_propagation_matches_python_replication(spark):
    """The deterministic (plurality, min-label) sync update replicated
    in plain Python over a random graph must agree round-for-round —
    the same checkability property the oracle uses."""
    import random
    from collections import Counter

    from nagios_custom_etl_spark.operators.graph import label_propagation

    rnd = random.Random(43)
    fwd = {(rnd.randrange(30), 30 + rnd.randrange(30)) for _ in range(120)}
    und = {}
    for u, v in fwd:
        und.setdefault(u, set()).add(v)
        und.setdefault(v, set()).add(u)
    labels = {n: n for n in und}
    for _ in range(3):
        nxt = {}
        for n, nbrs in und.items():
            c = Counter(labels[m] for m in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = min(l for l, k in c.items() if k == best[1])
        labels = nxt
    df = spark.createDataFrame(sorted(fwd), "u long, v long")
    got = {r.node: r.label for r in label_propagation(df, iterations=3).collect()}
    assert got == labels


def test_label_propagation_checkpoint_invariant(spark):
    """A long LPA run localCheckpoints its label vector every
    checkpoint_every rounds; checkpointing must not change the result
    (same rounds, same deterministic tie-break)."""
    import random

    from nagios_custom_etl_spark.operators.graph import label_propagation

    rnd = random.Random(3)
    edges = {(rnd.randint(0, 60), rnd.randint(0, 60)) for _ in range(150)}
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "u long, v long")
    fast = {
        (r.node, r.label)
        for r in label_propagation(df, iterations=12, checkpoint_every=4).collect()
    }
    plain = {
        (r.node, r.label)
        for r in label_propagation(df, iterations=12, checkpoint_every=99).collect()
    }
    assert fast == plain and fast

"""Graph analytics over co-occurrence relations: co-purchase edge
extraction and distributed triangle counting.

The reference's nearest capability is the hostgroup/servicegroup
membership fan-out (extract.py:56-78 walks group->member edges one REST
page at a time); this module treats the same "items sharing a
container" relation as a graph and computes a second-order structure
(triangles = cliques of 3 mutually co-occurring items) that no
single-pass script can: which parts form stable co-purchase cliques.

Scale design (the part that matters at 100 TB):

* **Edges** come from a self-join of (container, item) pairs on the
  container key — the shuffle is on ``l_orderkey``, which
  ``catalog.load_table`` already hash-distributes, and per-container
  pair fan-out is C(items_per_container, 2), bounded by the order size
  (TPC-H: <= 7 -> <= 21 pairs).
* **Triangles** use the degree-ordered orientation (Suri &
  Vassilvitskii's MR triangle counting; also Schank's forward
  algorithm): orient every undirected edge from its (degree, id)-lesser
  endpoint to its greater, then count wedges only at each edge's SOURCE
  and close them with a hash join back to the oriented edge set. Wedge
  work is sum_v C(outdeg(v), 2) with outdeg bounded by O(sqrt(m)) —
  a heavy hub of degree d contributes O(m) wedges instead of the
  O(d^2) the naive id-ordering pays when low ids happen to be hubs.
  Every join here is an equi-join on (src) or (src, dst): plain
  shuffle-hash territory, no broadcast of anything unbounded, no
  cartesian step anywhere.
* The triangle SET is orientation-invariant: each triangle {a,b,c} is
  emitted exactly once whatever total order is used, so a naive
  id-ordered construction (the DuckDB oracle's) produces the identical
  result — pinned by the x86 oracle hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    pairs: DataFrame,
    container_col: str,
    item_col: str,
    min_support: int = 1,
) -> DataFrame:
    """Undirected co-occurrence edges ``(u, v, support)`` with u < v.

    ``support`` = number of distinct containers in which both items
    appear; one shuffle on the container key + one on the (u, v) pair.
    """
    p = pairs.select(container_col, item_col).distinct()
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(b, on=container_col)
        .where(F.col(f"a.{item_col}") < F.col(f"b.{item_col}"))
        .groupBy(
            F.col(f"a.{item_col}").alias("u"),
            F.col(f"b.{item_col}").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= int(min_support))
        .select("u", "v")
    )


def _orient(edges: DataFrame) -> DataFrame:
    """Orient undirected (u, v) edges by the (degree, id) total order.

    Returns ``(src, dst, dst_key)`` where src precedes dst in the
    order and ``dst_key`` is dst's sort key struct (carried so wedge
    enumeration can order the two endpoints without re-joining degrees).
    """
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    def key(deg_col: Column, id_col: Column) -> Column:
        return F.struct(deg_col.alias("d"), id_col.alias("i"))

    # the degree table is |V| rows — broadcast it so annotating the |E|
    # edge rows (the big side) never shuffles them; at graphs where |V|
    # itself is huge, drop the hint and let AQE pick the join
    du = F.broadcast(deg.select(F.col("x").alias("u"), F.col("deg").alias("deg_u")))
    dv = F.broadcast(deg.select(F.col("x").alias("v"), F.col("deg").alias("deg_v")))
    e = edges.join(du, "u").join(dv, "v")
    ku, kv = key(F.col("deg_u"), F.col("u")), key(F.col("deg_v"), F.col("v"))
    return e.select(
        F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(ku < kv, kv).otherwise(ku).alias("dst_key"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles ``(a, b, c)`` of the undirected graph, each once.

    Degree-ordered forward algorithm: wedges are enumerated only at the
    orientation-minimal vertex and closed against the oriented edge set
    with an equi-join on (src, dst).
    """
    # the edge set feeds the degree aggregate AND both orientation
    # joins; the oriented set feeds the wedge self-join and the closing
    # join. localCheckpoint (not cache): its MEMORY_AND_DISK blocks
    # SPILL under memory pressure where plain cached blocks evict and
    # force the upstream co-occurrence self-join to recompute per
    # consumer — a 3x replan in a storage-starved session (measured:
    # 41s -> ~8s in the 1g/200-partition bare verify at sf0.01)
    oe = _orient(edges.localCheckpoint())
    oe = oe.localCheckpoint()
    # SHUFFLE_HASH on both wedge-side joins: the wedge stream is the
    # huge side (sum_v C(outdeg,2) rows) and hash-probing it against
    # the edge set skips the sort a merge join would impose on it
    e1, e2 = oe.alias("e1"), oe.hint("SHUFFLE_HASH").alias("e2")
    wedges = e1.join(e2, on="src").where(F.col("e1.dst_key") < F.col("e2.dst_key"))
    closing = oe.select(F.col("src").alias("w1"), F.col("dst").alias("w2"))
    return (
        wedges.select(
            F.col("src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
        .join(
            closing.hint("SHUFFLE_HASH"),
            on=(F.col("b") == F.col("w1")) & (F.col("c") == F.col("w2")),
        )
        .select("a", "b", "c")
    )


def triangle_participation(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle membership counts ``(node, n_triangles)``.

    Each triangle contributes one count to each of its three vertices
    (explode + codegen'd aggregate — no HOF free-ref trap)."""
    tri = triangles(edges)
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    dangling: bool = False,
    tol: float | None = None,
    checkpoint_every: int = 10,
    stats: dict | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list ``(src, dst)``
    — the canonical iterative graph computation, expressed as K rounds
    of the same declarative join+aggregate plan.

    rank_{k+1}(v) = (1-d)/N + d * (Σ_{(u,v)∈E} rank_k(u) / outdeg(u)
                                   [+ D_k / N  with ``dangling=True``])

    With ``dangling=False`` nodes without out-edges simply contribute
    nothing (exactly SQL-expressible, the x95 oracle); with
    ``dangling=True`` their mass D_k = Σ rank_k(u) over dangling u is
    redistributed uniformly — the standard stochastic-matrix fix, kept
    oracle-checkable because D_k is itself one more sum in the unrolled
    recurrence (x95b). The per-round cost of the dangling term is one
    O(nodes) semi-join aggregate producing a 1-ROW DataFrame that is
    broadcast-cross-joined into the update — declarative, no per-round
    driver collect.

    ``tol`` enables convergence early-stopping: after each round the
    max |Δrank| is evaluated (one action per round — this is the price
    of data-dependent iteration counts; the fixed-K path stays fully
    lazy) and the loop exits when it drops below ``tol``. ``stats``
    (optional dict) receives ``{"rounds": k, "delta": last}`` for
    callers that need to observe convergence. Lineage is bounded by a
    ``localCheckpoint`` of the rank vector every ``checkpoint_every``
    rounds (and every round under ``tol``, where the vector is
    materialized by the delta action anyway).

    Scale design: each round is ONE equi-join of the edge list with the
    current rank vector on ``src`` followed by ONE aggregate on ``dst``
    — both shuffle on a graph key, no broadcast of anything
    unbounded, no driver-side loop over data (the Python ``for`` builds
    the plan; Spark executes K chained stages). The edge list and the
    out-degree join are computed once and cached; at 100 TB the edge
    relation would be bucketed on ``src`` so every round's join is
    co-located and only the rank vector (O(nodes)) moves. The
    reference's nearest behavior is the group->member fan-out walk
    (extract.py:56-78), which this generalizes to a fixpoint over the
    whole membership graph.
    """
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
    )
    # Cache the edge relation PRE-PARTITIONED AND PRE-SORTED on src: the
    # InMemoryRelation advertises its hash partitioning + ordering, so
    # every round's sort-merge join reuses the cached layout and the only
    # thing exchanged per round is the O(nodes) rank vector — the
    # in-session equivalent of bucketing the edges (x72) at 100 TB.
    e = (
        e.join(e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg")), "src")
        .repartition("src")
        .sortWithinPartitions("src")
        .cache()
    )
    nodes = nodes.cache()
    n_nodes = nodes.count()  # scalar: the (1-d)/N baseline
    base = (1.0 - damping) / n_nodes
    dangle = None
    if dangling:
        dangle = nodes.join(
            e.select("src").distinct(), nodes.node == F.col("src"), "left_anti"
        ).cache()
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    rounds, delta = 0, None
    for k in range(iterations):
        contribs = e.join(ranks, e.src == ranks.node).select(
            F.col("dst").alias("node"), (F.col("pr") / F.col("_deg")).alias("_c")
        )
        summed = contribs.groupBy("node").agg(F.sum("_c").alias("_s"))
        inflow = F.coalesce(F.col("_s"), F.lit(0.0))
        nxt = nodes.join(summed, "node", "left")
        if dangling:
            dmass = ranks.join(dangle, "node", "left_semi").agg(
                F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm")
            )
            nxt = nxt.crossJoin(F.broadcast(dmass))
            inflow = inflow + F.col("_dm") / F.lit(float(n_nodes))
        prev, ranks = ranks, nxt.select(
            "node", (F.lit(base) + F.lit(damping) * inflow).alias("pr")
        )
        rounds = k + 1
        if dangling and tol is None:
            # the dangling branch makes each round consume the rank
            # vector TWICE (contribs + mass sum); left lazy, the plan
            # tree doubles per round — exponential analysis/execution
            # blowup (measured 23s vs 1s at K=5). Materializing the
            # O(nodes) vector per round is the standard iterative-graph
            # shape (GraphX does the same); localCheckpoint also keeps
            # lineage depth constant.
            ranks = ranks.localCheckpoint()
        if tol is not None:
            ranks = ranks.localCheckpoint()
            delta = (
                ranks.alias("a")
                .join(prev.alias("b"), "node")
                .agg(F.max(F.abs(F.col("a.pr") - F.col("b.pr"))).alias("d"))
                .first()["d"]
            )
            if delta is not None and delta < tol:
                break
        elif (k + 1) % max(1, checkpoint_every) == 0:
            ranks = ranks.localCheckpoint()
    if stats is not None:
        stats.update({"rounds": rounds, "delta": delta})
    return ranks


def label_propagation(
    edges: DataFrame, iterations: int = 3, checkpoint_every: int = 10
) -> DataFrame:
    """Synchronous label propagation (community detection) over an
    undirected edge list ``(u, v)`` — K rounds of: every node adopts the
    label carried by the PLURALITY of its neighbors, ties broken by the
    SMALLEST label. The deterministic tie-break is what makes an
    otherwise notoriously order-sensitive heuristic exactly
    oracle-checkable (the x111 oracle unrolls the same rounds with
    ROW_NUMBER OVER (ORDER BY cnt DESC, label) — the identical total
    order), the same trick the lattice k-means (x101) and PageRank
    (x95) fixpoints use. Labels start as node ids.

    Scale shape per round: ONE equi-join of the (cached, pre-partitioned
    on the neighbor key) directed edge relation with the O(nodes) label
    vector + ONE count aggregate + ONE row_number window, all keyed on
    the node — three shuffles of label-vector size, never of the edge
    list (the edges stay put, exactly the x95 layout argument; at
    100 TB bucket the edges on ``v``). Complements the connected-
    components family (x13/x46: reachability) with density-based
    communities — CC merges everything touching, LPA splits dense
    regions joined by thin bridges. Lineage is K joins deep, so the
    label vector is localCheckpointed every ``checkpoint_every`` rounds
    (the x95 guard, implemented rather than footnoted: a K=50 run must
    not carry a 50-join plan into round 51)."""
    from pyspark.sql import Window

    fwd = edges.select("u", "v")
    und = (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .dropDuplicates(["u", "v"])
        .repartition("v")
        .sortWithinPartitions("v")
        .cache()
    )
    nodes = und.select(F.col("u").alias("node")).dropDuplicates(["node"]).cache()
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
    for k in range(iterations):
        cand = (
            und.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
        )
        if (k + 1) % max(1, checkpoint_every) == 0 and k + 1 < iterations:
            labels = labels.localCheckpoint()
    return labels

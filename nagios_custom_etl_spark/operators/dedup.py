"""Deduplication operators (SURVEY §2.12 X1/X2): exact, MinHash+LSH,
SimHash, n-gram Jaccard. All pure DataFrame compositions — shingling,
hashing and banding are built-in higher-order functions (JVM-side); the
only shuffles are the band-bucket join and the final pair aggregation,
both on well-distributed hash keys.

Scale notes (100 TB): MinHash-LSH cost is O(docs × num_hashes) map-side
work plus a self-join on (band_id, band_hash) — bucket keys are uniform
by construction, so no skew salting is needed unless many exact
duplicates share a bucket; ``exact-first`` dedup (cheap) before LSH
removes that mass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import cache_once
from nagios_custom_etl_spark.functions.text import (
    normalized_fingerprint,
    shingles_from_tokens,
    tokens,
    word_shingles,
)


def _shingle_rows(df: DataFrame, id_col: str, text_col: str, shingle_n: int) -> DataFrame:
    """(_id, _sh array<string>) with a two-step projection: tokens are
    materialized first so shingle assembly references a bound column —
    see shingles_from_tokens' PERF note (O(n) vs O(n²)).

    Input parallelism note: single-row-group fixture files are spread by
    ``catalog.load_table`` (documents/embeddings use a lowered threshold);
    probing partitioning here via ``df.rdd`` would force a driver-side
    RDD conversion per call, bypassing AQE knowledge, for no gain."""
    return df.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_toks")).select(
        "_id", shingles_from_tokens(F.col("_toks"), shingle_n).alias("_sh")
    )


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int, distinct: bool
) -> DataFrame:
    """(_id, _s) one row per shingle — the hot-path shingler.

    PERF: higher-order functions (``transform``/``aggregate``) are
    interpreted, not whole-stage-codegen'd — shingling 260k tokens via
    ``transform`` costs ~4s where this formulation costs ~0.5s. Instead:
    pre-slice the token array at offsets 1..n-1, ``arrays_zip`` the n
    shifted views, ``posexplode_outer`` the zipped array, and
    ``concat_ws`` the struct fields — every step is a codegen'd
    expression or generator. Rows whose last zip field is null are the
    (n-1) ragged tail entries and are dropped; docs shorter than n
    tokens keep one whole-doc shingle at pos 0 (posexplode_outer keeps
    a null row even for 0-token docs, matching the oracle's '' shingle).

    ``distinct=False`` skips per-doc dedup — MIN-based MinHash
    aggregates are insensitive to repeated shingles, so signatures
    avoid that shuffle entirely; exact-Jaccard set math needs
    ``distinct=True``.
    """
    sz = F.size(F.col("_toks"))
    pre = df.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_toks")).select(
        "_id",
        "_toks",
        sz.alias("_sz"),
        *[
            F.slice("_toks", k + 1, F.greatest(sz - k, F.lit(0))).alias(f"_t{k}")
            for k in range(1, shingle_n)
        ],
    )
    zipped = F.arrays_zip("_toks", *[f"_t{k}" for k in range(1, shingle_n)])
    ex = pre.select("_id", "_toks", "_sz", F.posexplode_outer(zipped).alias("_pos", "_z"))
    last = F.col(f"_z._t{shingle_n - 1}")
    keep = last.isNotNull() | (
        (F.col("_sz") < shingle_n) & ((F.col("_pos") == 0) | F.col("_pos").isNull())
    )
    shingle = F.when(F.col("_sz") < shingle_n, F.concat_ws(" ", "_toks")).otherwise(
        F.concat_ws(" ", F.col("_z._toks"), *[F.col(f"_z._t{k}") for k in range(1, shingle_n)])
    )
    out = ex.filter(keep).select("_id", shingle.alias("_s"))
    return out.distinct() if distinct else out

# ---------------------------------------------------------------------------
# X1 — exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized-text fingerprint.

    Deterministic keeper choice (min id) — ``dropDuplicates`` keeps an
    arbitrary row, which is fine for semantics but untestable; min-id is
    the same single shuffle.
    """
    fp = normalized_fingerprint(text_col).alias("fingerprint")
    return (
        df.select(F.col(id_col), fp)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# X2 — MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signature(text_col: str | Column, num_hashes: int = 32, shingle_n: int = 3) -> Column:
    """array<bigint> MinHash signature over word-shingle sets, as one
    Column expression (for single-pass per-row use).

    NOTE: inside nested HOF lambdas Catalyst does not share the shingle
    subexpression across the num_hashes iterations — for bulk signatures
    use ``minhash_signatures`` (explode + codegen'd min aggregates), which
    computes shingles once and partial-aggregates map-side.
    """
    sh = word_shingles(text_col, shingle_n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(F.transform(sh, lambda s: F.xxhash64(seed, s))),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(_id, _sig array<bigint>) MinHash signatures — the scale path.

    explode(shingles) → num_hashes codegen'd MIN aggregates (xxhash64 per
    seed) → array. Shingling runs once per document; the only shuffle is
    the per-doc aggregation, with map-side partial MIN combine, so the
    exchanged rows are already one-per-(doc, aggregate). Repeated
    shingles within a doc are left in place — MIN is idempotent over
    duplicates, so the per-doc distinct shuffle is skipped.
    """
    exploded = _exploded_shingles(df, id_col, text_col, shingle_n, distinct=False)
    # hash the shingle STRING once; the num_hashes family then hashes the
    # resulting long (fixed 8 bytes) per seed — ~string_len/8 cheaper than
    # re-hashing the string per seed, same uniformity.
    based = exploded.select("_id", F.xxhash64("_s").alias("_h"))
    mins = based.groupBy("_id").agg(
        *[F.min(F.xxhash64(F.lit(seed), F.col("_h"))).alias(f"_h{seed}") for seed in range(num_hashes)]
    )
    return mins.select("_id", F.array(*[f"_h{s}" for s in range(num_hashes)]).alias("_sig"))


def _banded(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(_id, band_id, band_hash): one bucket row per (doc, band) — the
    join key space of every LSH variant (self-join, cross-frame join)."""
    rows_per_band = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sigs.select("_id", F.explode(F.array(*band_structs)).alias("band")).select(
        "_id", "band.band_id", "band.band_hash"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows -> signatures -> (band_id, band_hash) buckets -> self-join within
    bucket -> distinct (a, b) pairs with a < b. Probability a pair with
    Jaccard j is emitted: 1 - (1 - j^(num_hashes/bands))^bands.
    """
    # cache the (tiny) signature table: it feeds both sides of the bucket
    # self-join — without it the signature aggregation runs twice. At
    # 100 TB this is a persist(DISK_ONLY) or a checkpointed table.
    sigs = cache_once(minhash_signatures(df, id_col, text_col, num_hashes, shingle_n))
    banded = _banded(sigs, num_hashes, bands)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact word-shingle Jaccard for candidate pairs; keeps >= threshold.

    Shingles are computed only for documents that appear in a candidate
    pair (semi-join restriction) — at scale the candidate set is orders of
    magnitude smaller than the corpus. Distinct shingle sets are
    re-assembled per restricted doc (collect_set) so the intersection
    stays a codegen'd array op on the tiny candidate subset.
    """
    # pairs feeds three consumers (id restriction + both join sides):
    # materialize once instead of re-running the LSH bucket join thrice
    pairs = cache_once(pairs)
    wanted = (
        pairs.select(F.col("id_a").alias("_jid"))
        .unionByName(pairs.select(F.col("id_b").alias("_jid")))
        .distinct()
    )
    sh = (
        _exploded_shingles(df, id_col, text_col, shingle_n, distinct=False)
        .withColumnRenamed("_id", "_jid")
        .join(F.broadcast(wanted), "_jid", "left_semi")
        .groupBy("_jid")
        .agg(F.collect_set("_s").alias("_sh"))
    )
    sh = cache_once(sh)
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh")))
    union = F.size(F.col("a._sh")) + F.size(F.col("b._sh")) - inter
    return (
        pairs.join(a, pairs.id_a == F.col("a._jid"))
        .join(b, pairs.id_b == F.col("b._jid"))
        .select("id_a", "id_b", (inter.cast("double") / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Full X2 pipeline: LSH candidates, exact-Jaccard verified."""
    pairs = lsh_candidate_pairs(df, id_col, text_col, num_hashes, bands, shingle_n)
    return jaccard_verify(df, pairs, id_col, text_col, threshold, shingle_n)


# ---------------------------------------------------------------------------
# X2 — exact n-gram Jaccard via inverted shingle index (the oracle-checkable
# exact counterpart of MinHash: same verified pairs, no probabilistic miss)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs with shingle-Jaccard >= threshold.

    Inverted index: explode distinct shingles, self-join on shingle,
    count shared shingles per pair, derive the union from per-doc set
    sizes. Only pairs sharing >= 1 shingle are ever materialized.

    ``max_df`` caps the inverted-index fan-out (CCNet-style): a shingle
    occurring in more than ``max_df`` documents is dropped from the index
    AND from the per-doc set sizes, so Jaccard is computed over the capped
    shingle universe on both the numerator and the denominator. Without
    the cap one corpus-wide-common shingle (boilerplate, stopword run)
    makes the self-join quadratic in its document frequency — the classic
    inverted-index blowup. Capped shingles carry almost no pairwise
    signal (they match everything), so at a sane cap the pair set is
    near-identical while the join cost drops from O(max_df²) per hot
    shingle to zero. At 100 TB set max_df as a corpus fraction (e.g.
    1e-4 × n_docs).
    """
    sh = _exploded_shingles(df, id_col, text_col, shingle_n, distinct=True).select(
        "_id", F.col("_s").alias("shingle")
    )
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        # co-partitioned on the shingle (the groupBy just produced that
        # partitioning), so the semi join reuses the exchange
        sh = sh.join(rare, "shingle", "left_semi")
    # feeds sizes + both sides of the self-join: one shingling, not three
    sh = cache_once(sh)
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric containment dedup: pairs where max(|A∩B|/|A|,
    |A∩B|/|B|) >= threshold — catches a document swallowed whole by a
    larger one (quote inclusion, page concatenation), which symmetric
    Jaccard misses when |A| << |B|. Same inverted shingle index and
    fan-out-cap strategy as ``ngram_jaccard_pairs``; the exploded index
    is shared across both operators via ``cache_once``.
    """
    sh = _exploded_shingles(df, id_col, text_col, shingle_n, distinct=True).select(
        "_id", F.col("_s").alias("shingle")
    )
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sh = cache_once(sh)
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    cont_a = F.col("n_shared").cast("double") / F.col("n_a")
    cont_b = F.col("n_shared").cast("double") / F.col("n_b")
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", cont_a.alias("cont_a"), cont_b.alias("cont_b"))
        .filter(F.greatest("cont_a", "cont_b") >= threshold)
    )


def novelty_curve(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """Per-document ingestion-order novelty: the fraction of a doc's
    distinct shingles whose corpus-wide first occurrence (min id) is the
    doc itself. The marginal-value signal crawl scheduling uses: when
    new documents stop contributing new shingles, the source is mined
    out. Two shuffles — shingle→min(id), then doc aggregation; the join
    back to the exploded shingles reuses the shingle hash partitioning
    the min-agg just produced."""
    sh = cache_once(
        _exploded_shingles(df, id_col, text_col, shingle_n, distinct=True).select(
            "_id", F.col("_s").alias("shingle")
        )
    )
    firsts = sh.groupBy("shingle").agg(F.min("_id").alias("_first"))
    return (
        sh.join(firsts, "shingle")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("_first") == F.col("_id"), 1).otherwise(0)).alias("n_new"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_sh",
            "n_new",
            # fixed-scale HALF_UP round (registry convention, = DuckDB
            # round-on-DOUBLE): the single int/int division is
            # IEEE-identical cross-engine, but rounding the hash surface
            # removes any last-ulp sensitivity to evaluation order in
            # either engine (VERDICT r3 hardening)
            F.round(F.col("n_new").cast("double") / F.col("n_sh"), 6).alias("novelty"),
        )
        .orderBy(id_col)
    )


# ---------------------------------------------------------------------------
# X2 — near-dup CLUSTERS: connected components over the verified pair set.
# Pairs alone under-delete (A~B, B~C but A!~C must still collapse to one
# survivor); production dedup keeps one document per component.
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component
    is the minimum node id reachable from the node.

    Min-label propagation: each round every node takes the min of its own
    label and its neighbors' labels — one shuffle join + one partial-agg
    groupBy per round, converging in O(graph diameter) rounds. Near-dup
    graphs are LSH band cliques glued at shared documents, so diameters
    are single-digit; ``max_iterations`` is a guard, not a tuning knob.

    Scale notes (100 TB): each round's lineage is truncated with an eager
    ``localCheckpoint`` — without it the plan doubles per iteration and
    the driver re-optimizes an exponentially growing tree (on a cluster,
    prefer ``checkpoint()`` to a reliable store so lost executors don't
    recompute the chain). Convergence detection is FOLDED INTO the
    checkpoint job by materializing a per-row shrunk flag alongside the
    new label: the follow-up convergence probe is a short-circuiting
    ``isEmpty`` over the ALREADY-CHECKPOINTED blocks — no recompute of
    the join, and it stops at the first still-shrinking row. (An
    ``observe()``/CollectMetrics formulation would make it zero extra
    jobs, but a CollectMetrics node executed via localCheckpoint leaks
    the session's non-serializable ObservationManager into subsequent
    unrelated jobs' closures on this Spark build — found the hard way;
    do not reintroduce.) For adversarial long-chain graphs swap in
    alternating large-star/small-star rounds (Kiveris et al.,
    "Connected Components in MapReduce and Beyond"), which converge in
    O(log^2 n); the dedup workload never needs it.
    """
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    edges = edges.distinct().localCheckpoint()
    # seed labels with min(self, direct neighbors) — exactly the result of
    # one propagation round over identity labels, for one groupBy instead
    # of a join+groupBy round (every node appears as u after symmetrize)
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select(F.col("u").alias("node"), F.least("u", "_mv").alias("component"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("_nc"))
        )
        proposed = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least("component", F.coalesce("_nc", "component")).alias("component"),
                (F.coalesce("_nc", "component") < F.col("component")).alias("_shrunk"),
            )
            .localCheckpoint()
        )
        labels = proposed.drop("_shrunk")
        if proposed.filter(F.col("_shrunk")).isEmpty():
            break
    return labels


def connected_components_stars(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the adversarial-diameter path: converges in O(log² n)
    rounds where min-label propagation needs O(diameter).

    Each round rewires the edge set toward per-component stars centered
    at the minimum node:

    * large-star (per node u, m = min(N(u) ∪ {u})): every strictly
      larger neighbor v > u re-attaches to m;
    * small-star: every neighbor v <= u (and u itself) attaches to m.

    Both are one groupBy (per-node min) + one join (re-emit edges) on
    uniform node keys; lineage is cut per round with localCheckpoint.
    Convergence = the edge set is a fixed point (same count and same
    bit_xor of edge hashes — order-insensitive, overflow-free,
    collision odds ~2^-64 per round). Use this over ``connected_components`` when components can
    be long paths (near-dup graphs are dense cliques, so the min-label
    loop usually wins there).
    """
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    isolated = pairs.select(F.col(id_a).alias("u")).where(F.col(id_a) == F.col(id_b))

    def _signature(ed: DataFrame) -> tuple[int, int]:
        row = ed.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).head()
        return (row["n"], row["h"])

    def _star(ed: DataFrame, large: bool) -> DataFrame:
        # m(u) = min over N(u) ∪ {u}; every node with an edge appears as u
        m = ed.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("_m"))
        joined = ed.join(m, "u")
        if large:
            out = joined.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("_m").alias("v")
            )
        else:
            out = (
                joined.filter(F.col("v") <= F.col("u"))
                .select(F.col("v").alias("u"), F.col("_m").alias("v"))
                .unionByName(m.select("u", F.col("_m").alias("v")))
            )
        sym = out.filter(F.col("u") != F.col("v"))
        return (
            sym.unionByName(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .distinct()
            .localCheckpoint()
        )

    sig = _signature(edges)
    for _ in range(max_iterations):
        edges = _star(edges, large=True)
        edges = _star(edges, large=False)
        new_sig = _signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    # fixed point: per-component stars — each non-center node has its
    # component min among its neighbors; centers label themselves
    labels = edges.groupBy("u").agg(F.min("v").alias("_m")).select(
        F.col("u").alias("node"), F.least("u", "_m").alias("component")
    )
    return labels.unionByName(
        isolated.select(F.col("u").alias("node"), F.col("u").alias("component"))
    ).distinct()


def near_dup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality_col: str,
) -> DataFrame:
    """Collapse verified near-dup pairs into clusters and pick survivors.

    Output: one row per multi-member component —
    ``(component, n_members, survivor)`` where component is the min
    member id and the survivor is the member with the highest
    ``quality_col`` (ties: lowest id). Singleton documents are implicitly
    their own survivors and are not emitted.

    The survivor choice is the standard keep-best policy of corpus dedup
    (drop all but the best copy); a window over the component key is one
    shuffle on well-distributed component ids.
    """
    from pyspark.sql.window import Window

    comp = connected_components(pairs)
    members = comp.join(
        df.select(F.col(id_col).alias("node"), F.col(quality_col).alias("_q")), "node"
    )
    w = Window.partitionBy("component").orderBy(F.desc("_q"), F.asc("node"))
    ranked = members.select(
        "component",
        "node",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("component")).alias("n_members"),
    )
    return (
        ranked.filter((F.col("_rn") == 1) & (F.col("n_members") >= 2))
        .select("component", "n_members", F.col("node").alias("survivor"))
    )


# ---------------------------------------------------------------------------
# X4 — benchmark decontamination: flag training documents that share any
# long n-gram with a held-out evaluation set (the standard train/test
# overlap scrub run before LLM training).
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
) -> DataFrame:
    """(doc_id, n_shared_shingles) for every train doc sharing >= 1
    distinct ``shingle_n``-gram with any eval doc.

    Both sides are distinct-shingled (the codegen'd explode path), the
    eval shingle set is deduplicated across documents, and the overlap is
    an equi join on the shingle string. At scale the eval set is tiny
    relative to the corpus — Spark broadcasts its shingle set, so the
    scrub is map-side against the full training scan; if the eval side
    ever outgrows broadcast, the join degrades gracefully to a shuffle
    on uniformly-distributed shingle keys.
    """
    # cache_once: the corpus-side 5-gram explode is the expensive leg and
    # recurs across queries (the standalone scrub and the curation
    # pipeline capstone share it within a session)
    train_sh = cache_once(_exploded_shingles(train, id_col, text_col, shingle_n, distinct=True))
    eval_sh = (
        _exploded_shingles(evalset, id_col, text_col, shingle_n, distinct=True)
        .select(F.col("_s"))
        .distinct()
    )
    return (
        train_sh.join(eval_sh, "_s")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .select(F.col("_id").alias(id_col), "n_shared_shingles")
    )


# ---------------------------------------------------------------------------
# X4 — repetition metrics (Gopher-style quality signals): the most frequent
# 2-gram's character share and the character share of duplicated 3-grams.
# Heavily repetitive documents (boilerplate, SEO spam, generation loops)
# score high and are filtered before training.
# ---------------------------------------------------------------------------


def repetition_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_chars_col: str,
) -> DataFrame:
    """Per-doc repetition signals:

    * ``top_2gram_frac`` — chars covered by occurrences of the most
      frequent word 2-gram / total chars (ties: lexicographically first
      2-gram, for determinism);
    * ``dup_3gram_frac`` — chars covered by word 3-grams occurring more
      than once / total chars (occurrence-weighted, overlaps counted).

    All codegen'd: explode n-grams, count per (doc, gram), window-max /
    conditional-sum per doc. Two shuffles keyed on (doc, gram) then doc —
    both uniform. Ratios are single IEEE divisions of exact integers, so
    they hash-match the oracle bit-for-bit.
    """
    from pyspark.sql.window import Window

    base = df.select(F.col(id_col).alias("_id"), F.col(n_chars_col).alias("_nc"))
    g2 = (
        _exploded_shingles(df, id_col, text_col, 2, distinct=False)
        .groupBy("_id", "_s")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = Window.partitionBy("_id").orderBy(F.desc("_cnt"), F.asc("_s"))
    top2 = (
        g2.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_id", (F.col("_cnt") * F.length("_s")).alias("_top2_chars"))
    )
    g3 = (
        _exploded_shingles(df, id_col, text_col, 3, distinct=False)
        .groupBy("_id", "_s")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy("_id")
        .agg(
            F.sum(
                F.when(F.col("_cnt") > 1, F.col("_cnt") * F.length("_s")).otherwise(0)
            ).alias("_dup3_chars")
        )
    )
    return (
        base.join(top2, "_id", "left")
        .join(g3, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            (F.coalesce("_top2_chars", F.lit(0)).cast("double") / F.col("_nc")).alias(
                "top_2gram_frac"
            ),
            (F.coalesce("_dup3_chars", F.lit(0)).cast("double") / F.col("_nc")).alias(
                "dup_3gram_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# X2 — SimHash (64-bit) for near-dup at Hamming distance <= k
# ---------------------------------------------------------------------------


def simhash64(text_col: str | Column) -> Column:
    """64-bit SimHash over whitespace tokens.

    Per row: fold the token array into a 64-slot vote vector (+1/-1 per
    bit of each token's xxhash64), then assemble the sign bits. Sequential
    fold, all built-ins; bit positions are static so shifts stay literal.
    """
    toks = tokens(text_col)
    zero = F.array_repeat(F.lit(0).cast("bigint"), 64)

    def bit_votes(t: Column) -> Column:
        return F.array(
            *[
                F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
                .cast("bigint")
                for b in range(64)
            ]
        )

    votes = F.aggregate(toks, zero, lambda acc, t: F.zip_with(acc, bit_votes(t), lambda a, v: a + v))
    out = F.lit(0).cast("bigint")
    for b in range(64):
        # bit 63 is the sign bit of a long: its weight is long-min
        weight = F.lit(1 << b if b < 63 else -(1 << 63)).cast("bigint")
        out = out + F.when(F.element_at(votes, b + 1) > 0, weight).otherwise(F.lit(0).cast("bigint"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_id, sim) 64-bit SimHash per document — the scale path.

    explode(tokens) → one xxhash64 per token → 64 codegen'd conditional
    SUM aggregates (bit votes, map-side combined) → sign-bit assembly.
    Documents with no tokens get simhash 0 (left join + coalesce).
    """
    ex = df.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_toks")).select(
        "_id", F.explode("_toks").alias("_t")
    ).select("_id", F.xxhash64("_t").alias("_h"))
    votes = ex.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_b{b}")
            for b in range(64)
        ]
    )
    sim = F.lit(0).cast("bigint")
    for b in range(64):
        weight = F.lit(1 << b if b < 63 else -(1 << 63)).cast("bigint")
        sim = sim + F.when(F.col(f"_b{b}") > 0, weight).otherwise(F.lit(0).cast("bigint"))
    sigs = votes.select("_id", sim.alias("sim"))
    all_ids = df.select(F.col(id_col).alias("_id"))
    return all_ids.join(sigs, "_id", "left").select(
        "_id", F.coalesce("sim", F.lit(0).cast("bigint")).alias("sim")
    )


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs at Hamming distance <= max_hamming between SimHashes.

    Banding for scale: split the 64-bit hash into 4 16-bit bands — two
    hashes within Hamming k<=3 must agree exactly on >=1 band (pigeonhole),
    so candidates come from an equi-join on (band_id, band_value), never a
    cross join.
    """
    sigs = cache_once(simhash_signatures(df, id_col, text_col))
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftright(F.col("sim"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_value"),
        )
        for b in range(4)
    ]
    banded = sigs.select("_id", "sim", F.explode(F.array(*band_structs)).alias("band")).select(
        "_id", "sim", "band.band_id", "band.band_value"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_value") == F.col("b.band_value"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# X17 — corpus-frequency boilerplate detection (C4-style)
# ---------------------------------------------------------------------------


def boilerplate_stats(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 5, min_df: int = 3
) -> DataFrame:
    """Per-document boilerplate ratio: the fraction of a document's
    distinct word ``shingle_n``-grams that occur in >= ``min_df``
    documents corpus-wide (headers, footers, licence blocks, navigation
    chrome). The C4/RefinedWeb cleaning step "remove lines repeated
    across the corpus", generalized to shingles because the fixture text
    has no line structure.

    Plan shape (scale): one explode -> groupBy(shingle) for document
    frequency, filter to the (small) boilerplate set, then a semi join
    back onto the exploded shingles and one groupBy(doc). The boilerplate
    set after ``min_df`` filtering is orders of magnitude smaller than
    the shingle universe, so AQE turns the semi join into a broadcast at
    moderate scale; at 100 TB both sides hash-partition on the shingle —
    the same co-partitioning the frequency agg just produced, so the
    exchange is reused rather than re-shuffled.
    """
    sh = cache_once(_exploded_shingles(df, id_col, text_col, shingle_n, distinct=True))
    boiler = (
        sh.groupBy("_s")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("_s")
    )
    totals = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    boiler_per_doc = (
        sh.join(boiler, "_s", "left_semi")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    return (
        totals.join(boiler_per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_shingles",
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            (
                F.coalesce("n_boiler", F.lit(0)).cast("double") / F.col("n_shingles")
            ).alias("boiler_ratio"),
        )
    )


def near_dup_flags_vs_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Flag batch documents with >= 1 near-duplicate in ``corpus``
    (different id): (id, n_near_dups, max_jaccard).

    The incremental-ingest shape: the corpus side's signatures/buckets
    are computed once per refresh and reused across micro-batches (at
    scale: a maintained bucket table partitioned by band_hash); only the
    incoming batch is sig-hashed per batch, and the bucket join touches
    only colliding buckets — never batch x corpus.
    """
    sb = _banded(minhash_signatures(batch, id_col, text_col, num_hashes, shingle_n), num_hashes, bands)
    sc = _banded(minhash_signatures(corpus, id_col, text_col, num_hashes, shingle_n), num_hashes, bands)
    cands = (
        sb.alias("n")
        .join(
            sc.alias("c"),
            (F.col("n.band_id") == F.col("c.band_id"))
            & (F.col("n.band_hash") == F.col("c.band_hash"))
            & (F.col("n._id") != F.col("c._id")),
        )
        .select(F.col("n._id").alias("id_a"), F.col("c._id").alias("id_b"))
        .distinct()
    )
    everything = batch.unionByName(corpus.select(*batch.columns)).dropDuplicates([id_col])
    verified = jaccard_verify(everything, cands, id_col, text_col, threshold, shingle_n)
    return (
        verified.groupBy(F.col("id_a").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_near_dups"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


def exact_neardup_flags_vs_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Exact counterpart of ``near_dup_flags_vs_corpus``: the same
    (id, n_near_dups, max_jaccard) flag set via the inverted shingle
    index instead of MinHash candidates — total recall at the threshold
    by construction, where LSH recall at J≈threshold is probabilistic
    (~40% per pair at J=0.5 with 32 hashes/8 bands). The oracle-checkable
    path (ADVICE r3); LSH remains the bucketed scale path for batches
    where the shingle join is too hot.

    Same batch×bucket discipline: the corpus index joins only shingles
    the batch actually contains (never batch × corpus), and ``max_df``
    caps fan-out on the corpus document frequency exactly as in
    ``ngram_jaccard_pairs`` (numerator and denominators both computed
    over the capped universe, so the metric stays self-consistent).
    """
    bsh = cache_once(
        _exploded_shingles(batch, id_col, text_col, shingle_n, distinct=True).select(
            "_id", F.col("_s").alias("shingle")
        )
    )
    csh = _exploded_shingles(corpus, id_col, text_col, shingle_n, distinct=True).select(
        "_id", F.col("_s").alias("shingle")
    )
    if max_df is not None:
        rare = (
            csh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        csh = csh.join(rare, "shingle", "left_semi")
        bsh = bsh.join(rare, "shingle", "left_semi")
    csh = cache_once(csh)
    b_sizes = bsh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_b"))
    c_sizes = csh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_c"))
    shared = (
        bsh.alias("b")
        .join(csh.alias("c"), "shingle")
        .groupBy(F.col("b._id").alias("id_b"), F.col("c._id").alias("id_c"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("n_b") + F.col("n_c") - F.col("n_shared")
    )
    return (
        shared.join(b_sizes.select(F.col("_id").alias("id_b"), "n_b"), "id_b")
        .join(c_sizes.select(F.col("_id").alias("id_c"), "n_c"), "id_c")
        .select("id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .groupBy(F.col("id_b").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_near_dups"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


def dup_span_coverage(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-substring SPAN detection: for every document,
    how many token positions sit inside an n-gram that occurs at least
    ``min_count`` times corpus-wide — the span-level view behind
    "deduplicating training data" style exact-substring dedup (find the
    repeated spans; removing them is then a per-doc slice). The
    reference's dedup (extract.py:115-132) is whole-row; this is the
    sub-document refinement.

    Plan: tokenize -> enumerate positional n-gram shingles (one
    ``transform(sequence(...))`` static expression, codegen'd, no UDF)
    -> corpus-wide occurrence count via ``groupBy(shingle).count()``
    joined back to the shingle rows — NOT ``count() OVER (PARTITION BY
    shingle)``: a window hash-distributes on a key with unbounded skew
    (a boilerplate 8-gram repeated 10^8 times at 100 TB lands every
    occurrence in ONE shuffle partition, and AQE splits skewed JOIN
    partitions, not window partitions), whereas the groupBy's map-side
    partial aggregation crushes hot keys before the shuffle and the
    join-back side DOES get AQE skew splitting (or a broadcast when the
    dup-shingle set is small). At 100 TB shuffle ``xxhash64(shingle)``
    instead of the string to cut shuffle bytes ~10x — collisions only
    over-mark, and only at ~2^-64. -> per-doc coverage by merging the
    duplicated [pos, pos+n-1] intervals with the gaps-and-islands
    pattern (two windows per doc, O(dup shingles) rows — NOT the
    O(tokens) position-explode a naive union would cost). Docs shorter
    than ``n`` tokens have no shingles and report zero coverage.
    """
    from pyspark.sql import Window

    d = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    sh = d.filter(F.col("_n") >= n).select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, _n - {n}), "
                f"i -> concat_ws(' ', slice(_toks, i + 1, {n})))"
            )
        ).alias("_pos", "_sh"),
    )
    dup_sh = (
        sh.groupBy("_sh")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_sh")
    )
    dup = sh.join(dup_sh, "_sh", "left_semi").select(
        id_col, "_pos", (F.col("_pos") + F.lit(n - 1)).alias("_end")
    )
    ord_w = Window.partitionBy(id_col).orderBy("_pos")
    prev_w = ord_w.rowsBetween(Window.unboundedPreceding, -1)
    cov = (
        dup.withColumn("_pmax", F.max("_end").over(prev_w))
        .withColumn(
            "_new",
            F.when(F.col("_pmax").isNull() | (F.col("_pos") > F.col("_pmax")), 1).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(ord_w))
        .groupBy(id_col, "_isl")
        .agg((F.max("_end") - F.min("_pos") + 1).alias("_len"))
        .groupBy(id_col)
        .agg(F.sum("_len").alias("_covered"))
    )
    covered = F.coalesce(F.col("_covered"), F.lit(0)).cast("long")
    return (
        d.select(id_col, F.col("_n").cast("long").alias("n_tokens"))
        .join(cov, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            covered.alias("dup_covered"),
            F.round(covered.cast("double") / F.col("n_tokens"), 6).alias("dup_ratio_r"),
        )
    )

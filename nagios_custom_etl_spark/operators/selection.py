"""Multi-objective data selection: the 2-D Pareto skyline (maximize
both objectives), fully distributed.

A training-data curator constantly trades objectives off — length vs
lexical diversity, quality score vs novelty — and "keep the documents
no other document beats on BOTH axes" is the skyline query from the
classic BNL/SFS literature. The reference has no analog (its filters
are single-column thresholds, extract.py:53-61); this is the
multi-objective generalization those thresholds approximate.

Scale design — no single-partition pass over the data anywhere:

1. **Same-x domination** collapses first: ``groupBy(a).max(b)`` — any
   point sharing ``a`` with a higher-``b`` point is dominated by it.
   One shuffle, and the survivor set is at most |distinct a|.
2. **Bucket pruning**: survivors bucketize by equal-width ranges of
   ``a`` (bounds from one 2-value aggregate). Per bucket, the max
   ``b`` is a tiny B-row summary; the suffix-max of those summaries
   over strictly-higher buckets is computed with a window over B rows
   (bounded by construction — B is a constant, not data-sized) and
   broadcast back. A point dominated by ANY higher bucket's best
   ``b`` dies without ever being compared row-to-row.
3. **Within-bucket scan**: a window partitioned by bucket, ordered by
   ``a`` descending, takes the running max of ``b`` over strictly
   preceding rows — exactly the sort-filter-skyline (SFS) scan, but
   parallel per bucket.

A point survives iff its ``b`` beats both the within-bucket running
max and the higher-bucket suffix max. Ties on (a, b) all survive
(equal points do not dominate each other — dominance needs strict
improvement in one coordinate), which the caller gets back by joining
the returned skyline POINT set to the source rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_skyline_points(df: DataFrame, a: str, b: str, buckets: int = 64) -> DataFrame:
    """Skyline point set (columns ``a``, ``b``) of ``df`` maximizing
    both columns. Join the result back on (a, b) to recover the rows
    that sit on the frontier. Rows with a NULL objective never reach
    the frontier (dominance is undefined on NULL; they drop at the
    bucket join) — filter or impute upstream if they should compete."""
    pts = df.groupBy(a).agg(F.max(b).alias(b))
    lo, hi = pts.agg(F.min(a), F.max(a)).first()
    if lo is None:
        return pts.limit(0)
    if hi == lo:
        bucket = F.lit(0)
    else:
        raw = F.width_bucket(F.col(a).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(buckets)) - 1
        bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1))
    pts = pts.withColumn("_bk", bucket)
    suf_w = Window.orderBy(F.desc("_bk")).rowsBetween(Window.unboundedPreceding, -1)
    bmax = (
        pts.groupBy("_bk")
        .agg(F.max(b).alias("_bm"))
        .withColumn("_suf", F.max("_bm").over(suf_w))  # B rows: bounded window
        .select("_bk", "_suf")
    )
    pts = pts.join(F.broadcast(bmax), "_bk")
    scan_w = (
        Window.partitionBy("_bk").orderBy(F.desc(a)).rowsBetween(Window.unboundedPreceding, -1)
    )
    pts = pts.withColumn("_pm", F.max(b).over(scan_w))
    keep = (F.col("_pm").isNull() | (F.col(b) > F.col("_pm"))) & (
        F.col("_suf").isNull() | (F.col(b) > F.col("_suf"))
    )
    return pts.filter(keep).select(a, b)


def pareto_skyline(df: DataFrame, a: str, b: str, buckets: int = 64) -> DataFrame:
    """All rows of ``df`` whose (a, b) lies on the maximizing skyline
    — the frontier point set joined back (broadcast: a 2-D skyline of
    n points has expected O(log n) size on independent dimensions)."""
    return df.join(F.broadcast(pareto_skyline_points(df, a, b, buckets)), [a, b])


def _nd_buckets(d: int, buckets: int, pair_cap: int = 1 << 20) -> int:
    """Largest per-axis bucket count whose worst-case cell-pair relation
    (buckets^(2d) — fully anti-correlated data, every diagonal cell
    surviving) stays within ``pair_cap`` rows, clamped to [2, buckets].
    This makes the 'broadcast is metadata-sized' claim true by
    construction instead of by distributional luck."""
    b = int(pair_cap ** (1.0 / (2 * d)))
    while (b + 1) ** (2 * d) <= pair_cap:  # float-root safety
        b += 1
    while b > 2 and b ** (2 * d) > pair_cap:
        b -= 1
    return max(2, min(buckets, b))


def pareto_skyline_points_nd(
    df: DataFrame, cols: list[str], buckets: int = 8
) -> DataFrame:
    """Skyline point set maximizing ALL of ``cols`` (any dimension d >= 2)
    via grid-cell dominance pruning — the d>2 generalization the 2-D
    suffix-max scan above cannot express (its one-axis ordering argument
    only works when "all other axes" is a single value).

    Dominance: point q dominates p iff q >= p on every objective and
    q > p on at least one; equal points never dominate each other.

    Plan (every stage bounded or grid-pruned — no raw all-pairs):

    1. **Distinct points** (one shuffle at point-set cardinality).
    2. **Grid**: each objective equal-width-bucketized into ``buckets``
       cells (bounds from ONE 2d-value aggregate). A cell's coordinate
       vector lower-bounds every point in it.
    3. **Cell-level pruning**: nonempty cell C drops WHOLESALE when some
       nonempty cell D has D_i >= C_i + 1 on every axis — then every
       point of D exceeds every point of C on every axis (bucket
       intervals are [lo, hi)), so all of C is dominated. The cell
       relation is <= buckets^d rows — metadata-sized — so the
       pairwise cell check is a broadcast nested-loop over it, never
       over data.
    4. **Verification**: candidates (points in surviving cells) check
       only against points in cells that COULD dominate theirs
       (D_i >= C_i on every axis). By transitivity of dominance, any
       dominated point is dominated by a point in a SURVIVING cell, so
       the dominator side is also grid-pruned. The (cell, dominator-
       cell) pair relation is broadcast and both row-level joins are
       hash equi-joins on cell ids; the residual quadratic work is
       confined to compatible cell pairs (the SFS literature's grid
       filter).

    At 100 TB step 3 eliminates the bulk of cells outright — only the
    upper-staircase shell of the grid survives — so the verification
    join touches O(shell) points, not the corpus. ``buckets`` trades
    pruning power (larger = finer shell) against cell-pair relation
    size. The relation's WORST case (fully anti-correlated data: every
    diagonal cell survives) is buckets^(2d) rows, which is NOT metadata
    at large d — so the effective bucket count is capped per d such
    that buckets^(2d) <= 2^20 by construction (d=2 -> <=32, d=3 -> <=10,
    d=4 -> <=5): the broadcast stays ~1M short rows even against an
    adversarial distribution, and the typical staircase shell is far
    smaller. A caller-passed ``buckets`` above the cap is clamped, not
    refused (finer grids only ever help pruning, never correctness)."""
    if len(cols) < 2:
        raise ValueError("need at least 2 objectives")
    buckets = _nd_buckets(len(cols), buckets)
    pts = df.select(*cols).dropDuplicates(cols)
    bounds = pts.agg(
        *[f(c).alias(f"{p}_{c}") for c in cols for p, f in (("lo", F.min), ("hi", F.max))]
    ).first()
    if bounds[f"lo_{cols[0]}"] is None:
        return pts.limit(0)
    bcols = []
    for c in cols:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        if lo is None or hi == lo:
            bcols.append(F.lit(0).alias(f"_b_{c}"))
        else:
            raw = (
                F.width_bucket(
                    F.col(c).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(buckets)
                )
                - 1
            )
            bcols.append(
                F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1)).alias(f"_b_{c}")
            )
    bnames = [f"_b_{c}" for c in cols]
    pts = pts.select(*cols, *bcols)
    cells = pts.groupBy(*bnames).agg(F.count(F.lit(1)).alias("_n")).select(*bnames)
    # 3. wholesale cell drop: exists D with D_i >= C_i + 1 on every axis
    dom_cells = [F.col(f"d.{b}") >= F.col(f"c.{b}") + 1 for b in bnames]
    strict_dominator = cells.alias("d")
    survivors = (
        cells.alias("c")
        .join(
            F.broadcast(strict_dominator),
            on=reduce(lambda x, y: x & y, dom_cells),
            how="left_anti",
        )
        .select(*bnames)
    )
    # 4. row-level verify, routed through compatible (cell, dom-cell) pairs
    comp = [F.col(f"d.{b}") >= F.col(f"c.{b}") for b in bnames]
    pairs = (
        survivors.alias("c")
        .join(F.broadcast(survivors.alias("d")), on=reduce(lambda x, y: x & y, comp))
        .select(
            *[F.col(f"c.{b}").alias(f"c{b}") for b in bnames],
            *[F.col(f"d.{b}").alias(f"d{b}") for b in bnames],
        )
    )
    cand = pts.join(survivors, bnames, "left_semi")
    doms = cand.select(
        *[F.col(c).alias(f"_o_{c}") for c in cols],
        *[F.col(b).alias(f"d{b}") for b in bnames],
    )
    ge_all = reduce(
        lambda x, y: x & y, [F.col(f"_o_{c}") >= F.col(c) for c in cols]
    )
    gt_any = reduce(
        lambda x, y: x | y, [F.col(f"_o_{c}") > F.col(c) for c in cols]
    )
    dominated = (
        cand.join(
            F.broadcast(pairs),
            on=[F.col(b) == F.col(f"c{b}") for b in bnames],
        )
        .join(doms, [f"d{b}" for b in bnames])
        .where(ge_all & gt_any)
        .select(*cols)
        .dropDuplicates(cols)
    )
    return cand.join(dominated, cols, "left_anti").select(*cols)

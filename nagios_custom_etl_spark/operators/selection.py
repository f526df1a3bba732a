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

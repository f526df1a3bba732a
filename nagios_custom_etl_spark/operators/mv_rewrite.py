"""Materialized-view automatic query rewrite — the read-side complement
of the incremental maintenance in :mod:`operators.merge` (x71): an
aggregate query expressed against a BASE table is transparently answered
from a registered summary table whenever the summary's grain subsumes
the query's grouping and every requested aggregate is derivable from the
stored aggregates (Calcite's "aggregate materialized-view substitution";
Oracle QUERY REWRITE; BigQuery/Snowflake smart MV routing).

Why this matters at 100 TB: the dashboard queries a warehouse serves all
day are coarse re-aggregations of a handful of grains. Routing them to a
summary table turns a full fact scan (10^11 rows) into a scan of the
grain's cardinality (10^5 rows) — six orders of magnitude — without the
query author knowing the MV exists. The rewrite is sound because
count/sum/min/max are self-decomposable aggregates: re-aggregating
partial states over a coarser grouping equals aggregating the base
(Gray et al., "Data Cube", the distributive-aggregate argument), and avg
is algebraic — derived as decimal-sum / nonnull-count, never stored.

Derivability rules implemented:
- ``count`` (star)  -> SUM(stored row count)
- ``sum(c)``        -> SUM(stored exact-DECIMAL sum of c)
- ``min(c)/max(c)`` -> MIN/MAX of the stored per-group min/max
- ``avg(c)``        -> CAST(SUM(stored sum) AS DOUBLE) / SUM(stored
                       nonnull count) — deterministic division of an
                       exact numerator, no float re-association
- ``count_distinct(c)`` and anything else -> NOT derivable (a distinct
  set cannot be re-aggregated from counts); the planner falls back to
  the base table, and the fallback is part of the contract (tested).
- ``approx_count_distinct(c)`` -> derivable iff the summary stores an
  md5-HLL register map for ``c`` (operators/sketches.py encoding, kept
  as a ``map<reg, rho>`` column at the summary grain). Registers merge
  by max, so re-aggregating stored registers over a coarser grouping
  yields BIT-IDENTICAL registers — and therefore a bit-identical
  estimate — to sketching the base rows directly: unlike opaque sketch
  blobs, the rewrite is provably lossless and equivalence-testable,
  which is what makes routing a distinct-count dashboard to a summary
  sound. The exact ``count_distinct`` still always falls back.

The matcher is intentionally structural and conservative: dims are
matched by column name against the logical base view (which may carry
derived dim columns like a date_trunc'd day — same convention as the
summary build), and any non-derivable aggregate disqualifies the MV.
A wrong rewrite is a silently wrong answer, so every rule here is
pinned by an equivalence test against the base-table plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["AggSpec", "SummaryView", "build_summary", "rewrite_aggregate"]


@dataclass(frozen=True)
class AggSpec:
    """One requested aggregate: ``kind`` in {'count', 'sum', 'avg',
    'min', 'max', 'count_distinct', 'approx_count_distinct'}, ``col``
    the base column (None for count), ``alias`` the output name.
    ``approx_count_distinct`` is the DETERMINISTIC md5-HLL estimate
    (operators/sketches.py) — same answer from base rows or from a
    summary's stored registers."""

    kind: str
    col: str | None
    alias: str


@dataclass(frozen=True)
class SummaryView:
    """A registered materialized summary: ``df`` the summary relation
    (typically a parquet read-back, so rewritten plans provably scan the
    MV files), ``dims`` its grain, ``count_col`` the stored row count,
    and per-measure stored columns: exact-DECIMAL ``sums``, nonnull
    ``counts``, ``mins``/``maxs``."""

    df: DataFrame
    dims: tuple[str, ...]
    count_col: str
    sums: dict[str, str] = field(default_factory=dict)
    counts: dict[str, str] = field(default_factory=dict)
    mins: dict[str, str] = field(default_factory=dict)
    maxs: dict[str, str] = field(default_factory=dict)
    hlls: dict[str, str] = field(default_factory=dict)  # col -> map<reg,rho> column

    def derives(self, a: AggSpec) -> bool:
        if a.kind == "count":
            return True
        if a.kind == "sum":
            return a.col in self.sums
        if a.kind == "avg":
            return a.col in self.sums and a.col in self.counts
        if a.kind == "min":
            return a.col in self.mins
        if a.kind == "max":
            return a.col in self.maxs
        if a.kind == "approx_count_distinct":
            return a.col in self.hlls
        return False  # exact count_distinct and unknown kinds: never derivable


def build_summary(
    base: DataFrame,
    dims: list[str],
    measures: dict[str, tuple[int, int]],
    hll_cols: list[str] | None = None,
) -> tuple[DataFrame, dict[str, object]]:
    """Aggregate ``base`` to ``dims`` grain with, per measure column, an
    exact DECIMAL(p,s) sum (the x71 carrier convention — re-aggregatable
    without float drift), a nonnull count, and min/max; plus, per
    ``hll_cols`` entry, an md5-HLL register map (``map<reg, rho>``,
    <= 256 entries — kilobytes per group) from which any coarser
    grouping can answer ``approx_count_distinct`` bit-identically to
    the base rows. Returns the summary DataFrame plus the kwargs to
    construct a :class:`SummaryView` over wherever the caller
    materializes it."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    sums: dict[str, str] = {}
    counts: dict[str, str] = {}
    mins: dict[str, str] = {}
    maxs: dict[str, str] = {}
    for c, (p, s) in measures.items():
        aggs.append(F.sum(F.col(c).cast(f"decimal({p},{s})")).alias(f"sum_{c}"))
        aggs.append(F.count(F.col(c)).cast("long").alias(f"nn_{c}"))
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
        sums[c], counts[c], mins[c], maxs[c] = f"sum_{c}", f"nn_{c}", f"min_{c}", f"max_{c}"
    summary = base.groupBy(*dims).agg(*aggs)
    hlls: dict[str, str] = {}
    for c in hll_cols or []:
        from nagios_custom_etl_spark.operators.sketches import hll_register_rows

        mp = (
            hll_register_rows(base, dims, c)
            .groupBy(*dims)
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("reg", "rho"))  # bounded: <= 256 entries
                ).alias(f"hll_{c}")
            )
        )
        summary = summary.join(mp, list(dims))
        hlls[c] = f"hll_{c}"
    view_kwargs = {
        "dims": tuple(dims),
        "count_col": "n_rows",
        "sums": sums,
        "counts": counts,
        "mins": mins,
        "maxs": maxs,
        "hlls": hlls,
    }
    return summary, view_kwargs


def _base_expr(a: AggSpec, measures: dict[str, tuple[int, int]]):
    if a.kind == "count":
        return F.count(F.lit(1)).cast("long").alias(a.alias)
    if a.kind == "count_distinct":
        return F.count_distinct(F.col(a.col)).cast("long").alias(a.alias)
    p, s = measures[a.col]
    dec = F.col(a.col).cast(f"decimal({p},{s})")
    if a.kind == "sum":
        return F.sum(dec).alias(a.alias)
    if a.kind == "avg":
        return (F.sum(dec).cast("double") / F.count(F.col(a.col))).alias(a.alias)
    if a.kind == "min":
        return F.min(a.col).alias(a.alias)
    if a.kind == "max":
        return F.max(a.col).alias(a.alias)
    raise ValueError(f"unknown aggregate kind: {a.kind}")


def _mv_expr(a: AggSpec, mv: SummaryView):
    if a.kind == "count":
        return F.sum(mv.count_col).cast("long").alias(a.alias)
    if a.kind == "sum":
        return F.sum(mv.sums[a.col]).alias(a.alias)
    if a.kind == "avg":
        return (
            F.sum(mv.sums[a.col]).cast("double") / F.sum(mv.counts[a.col])
        ).alias(a.alias)
    if a.kind == "min":
        return F.min(mv.mins[a.col]).alias(a.alias)
    if a.kind == "max":
        return F.max(mv.maxs[a.col]).alias(a.alias)
    raise ValueError(f"non-derivable kind reached _mv_expr: {a.kind}")


def _hll_join(plan: DataFrame, dims: list[str], a: AggSpec, regs: DataFrame) -> DataFrame:
    """Attach one approx-distinct estimate (from (dims, reg, rho) rows)
    to a dims-grain plan."""
    from nagios_custom_etl_spark.operators.sketches import hll_estimate

    est = hll_estimate(regs, dims).select(
        *dims, F.col("est_distinct").alias(a.alias)
    )
    return plan.join(est, dims)


def rewrite_aggregate(
    base: DataFrame,
    dims: list[str],
    aggs: list[AggSpec],
    views: dict[str, SummaryView],
    measures: dict[str, tuple[int, int]],
) -> tuple[DataFrame, str]:
    """Plan ``SELECT dims, aggs FROM base GROUP BY dims``, answering from
    the first registered summary whose grain subsumes ``dims`` and which
    derives every aggregate; otherwise from the base table. Returns
    ``(plan, provenance)`` with provenance ``"mv:<name>"`` or
    ``"base"`` — callers (and tests) assert on it, because a silent
    fallback is a 10^6x perf cliff and a silent rewrite bug is a wrong
    answer.

    ``approx_count_distinct`` plans as a second aggregation stage
    joined on the grain: registers re-max-merged from the summary's
    stored map (MV path) or built from raw rows (base path) — the two
    are BIT-IDENTICAL because register max-merge is lossless, which the
    equivalence tests assert literally. Requires a non-empty ``dims``
    (the join needs a grain)."""
    from nagios_custom_etl_spark.operators.sketches import hll_register_rows

    hll_aggs = [a for a in aggs if a.kind == "approx_count_distinct"]
    norm = [a for a in aggs if a.kind != "approx_count_distinct"]
    if hll_aggs and not dims:
        raise ValueError("approx_count_distinct rewrite needs a non-empty grain")
    for name, mv in views.items():
        if set(dims) <= set(mv.dims) and all(mv.derives(a) for a in aggs):
            if norm:
                plan = mv.df.groupBy(*dims).agg(*[_mv_expr(a, mv) for a in norm])
            else:
                plan = mv.df.select(*dims).distinct()
            for a in hll_aggs:
                ex = mv.df.select(
                    *dims, F.explode(F.col(mv.hlls[a.col])).alias("reg", "rho")
                )
                regs = ex.groupBy(*dims, "reg").agg(F.max("rho").alias("rho"))
                plan = _hll_join(plan, dims, a, regs)
            return plan, f"mv:{name}"
    if norm:
        plan = base.groupBy(*dims).agg(*[_base_expr(a, measures) for a in norm])
    else:
        plan = base.select(*dims).distinct()
    for a in hll_aggs:
        plan = _hll_join(plan, dims, a, hll_register_rows(base, dims, a.col))
    return plan, "base"

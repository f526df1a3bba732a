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
    'min', 'max', 'count_distinct'}, ``col`` the base column (None for
    count), ``alias`` the output name."""

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
        return False  # count_distinct and unknown kinds: never derivable


def build_summary(
    base: DataFrame,
    dims: list[str],
    measures: dict[str, tuple[int, int]],
) -> tuple[DataFrame, dict[str, object]]:
    """Aggregate ``base`` to ``dims`` grain with, per measure column, an
    exact DECIMAL(p,s) sum (the x71 carrier convention — re-aggregatable
    without float drift), a nonnull count, and min/max. Returns the
    summary DataFrame plus the kwargs to construct a :class:`SummaryView`
    over wherever the caller materializes it."""
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
    view_kwargs = {
        "dims": tuple(dims),
        "count_col": "n_rows",
        "sums": sums,
        "counts": counts,
        "mins": mins,
        "maxs": maxs,
    }
    return base.groupBy(*dims).agg(*aggs), view_kwargs


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
    answer."""
    for name, mv in views.items():
        if set(dims) <= set(mv.dims) and all(mv.derives(a) for a in aggs):
            plan = mv.df.groupBy(*dims).agg(*[_mv_expr(a, mv) for a in aggs])
            return plan, f"mv:{name}"
    plan = base.groupBy(*dims).agg(*[_base_expr(a, measures) for a in aggs])
    return plan, "base"

"""Scalable global row-id / running-sum assignment (SURVEY §2.12).

Training-data pipelines need stable, contiguous integer ids and corpus-wide
prefix sums (example indices, shard offsets, pack positions). The naive
``row_number()/SUM() OVER (ORDER BY ...)`` is a single-reducer global sort —
a non-starter at 100 TB. These operators produce the identical numbering
with balanced parallelism via an explicit-boundary two-pass scheme:

  1. collect ≤ ``num_partitions`` range-boundary key tuples from a
     hash-bucketed sample of the order-key columns (one pruned scan with
     map-side partial aggregation — kilobytes shuffled);
  2. assign each row a partition id ``_pid`` by comparing its key against
     the broadcast boundary literals — ``_pid`` is a PURE FUNCTION of the
     row's key values, never of physical layout, sampling, or caching;
  3. per-partition counts/sums (one tiny row per partition) are cumulated
     on the driver into partition offsets;
  4. ``row_number``/``sum`` windowed per ``_pid`` (each window is one
     bounded range, never the whole table) plus the offset = the result.

Correct by construction: because ``_pid`` is a value function, pass 3 and
pass 4 agree on every row's partition even if the upstream plan is
recomputed, evicted from cache, or scanned with a different split layout —
and the final answer is invariant to WHERE the boundaries fall (any
contiguous split of the total order yields the same global prefix). This
replaces a prior design whose correctness depended on a cached
``repartitionByRange`` + ``spark_partition_id()`` staying resident — an
answer must never depend on whether a cache survived.

The order key must be a total order over non-null columns (append a unique
id as tiebreaker) — ties would make ROW_NUMBER nondeterministic in any
engine, and null keys have no boundary-comparison ordering.
"""

from __future__ import annotations

import functools
from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# An order key: "name" (ascending), ("name", "asc"|"desc"), or a plain /
# .asc()/.desc() Column reference (parsed best-effort from its expression).
OrderKey = Union[str, tuple, Column]

def _normalize_keys(order_by: list[OrderKey]) -> list[tuple[str, str]]:
    keys: list[tuple[str, str]] = []
    for k in order_by:
        if isinstance(k, str):
            keys.append((k, "asc"))
        elif isinstance(k, tuple):
            name, direction = k
            direction = direction.lower()
            if direction not in ("asc", "desc"):
                raise ValueError(f"direction must be asc|desc, got {direction!r}")
            keys.append((name, direction))
        elif isinstance(k, Column):
            # a named column ref, optionally wrapped in SortOrder by
            # .asc()/.desc(): "k" / "k DESC NULLS LAST" / "k ASC NULLS FIRST"
            text = k._jc.toString()  # noqa: SLF001 — no public expr accessor
            parts = text.split(" ")
            if len(parts) == 1:
                keys.append((parts[0], "asc"))
            elif len(parts) >= 2 and parts[1] in ("ASC", "DESC"):
                keys.append((parts[0], parts[1].lower()))
            else:
                raise TypeError(
                    f"order key {text!r} is not a plain column reference; pass "
                    "('name', 'asc'|'desc') tuples for computed keys (select "
                    "the expression into a column first)"
                )
        else:
            raise TypeError(f"unsupported order key {k!r}")
    return keys


def _sort_cols(keys: list[tuple[str, str]]) -> list[Column]:
    return [F.col(n).desc() if d == "desc" else F.col(n).asc() for n, d in keys]


def _driver_cmp(keys: list[tuple[str, str]]):
    """Driver-side comparator matching the Spark sort order (non-null keys)."""

    def cmp(a: tuple, b: tuple) -> int:
        for i, (_, d) in enumerate(keys):
            x, y = a[i], b[i]
            if x == y:
                continue
            lt = x < y
            if d == "desc":
                lt = not lt
            return -1 if lt else 1
        return 0

    return cmp


# auto-sized mode targets ~1M rows per range partition: big enough that a
# per-partition sort/window is a real task, small enough to fit executor
# memory; tiny inputs collapse to ONE partition (no boundary ladder at all)
_TARGET_ROWS_PER_PARTITION = 1 << 20


def _collect_boundaries(
    df: DataFrame, keys: list[tuple[str, str]], n: int, auto_n: bool
) -> list[tuple]:
    """≤ n-1 range-boundary key tuples from a hash-bucketed sample, in ONE
    job: group by ``xxhash64(keys) % (32*n)`` and take each bucket's MIN
    key struct as its representative (plus the bucket's row count — the
    total row count comes for free). Map-side partial aggregation reduces
    every input task to ≤ 32*n rows before the (tiny) shuffle, so this is
    a single pruned scan with a kilobyte shuffle — no separate count pass.
    The representatives are hash-uniform over distinct keys (~32 per
    boundary), and because the bucketing is a pure function of the key
    VALUES they are independent of scan splits or physical layout (unlike
    ``df.sample``'s per-partition RNG). Balance is best-effort; caller
    correctness does not depend on boundary placement, only on ``_pid``
    being a value function, so even a degenerate sample yields the exact
    answer.

    With ``auto_n`` (no explicit ``num_partitions``), the partition count
    is clamped to ``ceil(total_rows / 1M)`` — a fixture-scale input gets a
    single range (zero comparison-ladder codegen cost), a 10^9-row input
    still fans out to the requested parallelism.
    """
    key_cols = [F.col(name) for name, _ in keys]
    n_buckets = max(n * 32, 256)  # ~32 representatives per boundary
    reps = (
        df.groupBy(
            F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).alias("_bucket")
        )
        .agg(
            F.min(F.struct(*key_cols)).alias("_rep"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select("_rep", "_n")
        .collect()
    )
    rows = [tuple(r["_rep"]) for r in reps]
    if not rows:  # empty input; single range
        return []
    if auto_n:
        total = sum(r["_n"] for r in reps)
        n = min(n, -(-total // _TARGET_ROWS_PER_PARTITION))
    if n <= 1:
        return []
    for r in rows:
        if any(v is None for v in r):
            raise ValueError(
                "order-by keys must be non-null for global ordering "
                f"(got null in sampled key {r!r})"
            )
    cmp = _driver_cmp(keys)
    rows.sort(key=functools.cmp_to_key(cmp))
    bounds: list[tuple] = []
    for i in range(1, n):
        b = rows[(i * len(rows)) // n]
        if not bounds or cmp(bounds[-1], b) != 0:
            bounds.append(b)
    return bounds


def _pid_expr(keys: list[tuple[str, str]], bounds: list[tuple]) -> Column:
    """Partition id = number of boundaries at-or-before the row's key in
    the total order — a broadcast-literal comparison ladder, fully
    codegen'd, no shuffle and no data dependence beyond the key columns."""

    def at_or_after(b: tuple) -> Column:
        # direction-aware lexicographic (row >= b), built innermost-out:
        # ge_i = gt_i OR (eq_i AND ge_{i+1}); ge beyond last key = true
        cond = F.lit(True)
        for i in reversed(range(len(keys))):
            name, d = keys[i]
            c, lit = F.col(name), F.lit(b[i])
            gt = (c < lit) if d == "desc" else (c > lit)
            cond = gt | ((c == lit) & cond)
        return cond

    pid = F.lit(0)
    for b in bounds:
        pid = pid + F.when(at_or_after(b), 1).otherwise(0)
    return pid.cast("int")


def _two_pass(
    df: DataFrame,
    order_by: list[OrderKey],
    num_partitions: int | None,
    agg_col: Column,
):
    """Shared scaffolding: boundary collection, pid assignment, per-pid
    aggregate offsets. Returns (df_with_pid, offset_expr, sort_cols)."""
    from nagios_custom_etl_spark.catalog import cache_once

    keys = _normalize_keys(order_by)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # perf-only cache (two pruned passes: boundary sample, per-pid aggs) —
    # correctness no longer depends on residency: _pid is a value function
    df = cache_once(df)
    bounds = _collect_boundaries(df, keys, n, auto_n=num_partitions is None)
    with_pid = df.withColumn(
        "_pid", _pid_expr(keys, bounds) if bounds else F.lit(0).cast("int")
    )
    n_pids = len(bounds) + 1
    # offsets must carry the aggregate's OWN type: casting a fractional
    # per-partition double sum to long would silently truncate it
    # (ADVICE r4). The agg schema is available without running a job.
    per_pid_plan = with_pid.groupBy("_pid").agg(agg_col.alias("_agg"))
    agg_type = per_pid_plan.schema["_agg"].dataType.simpleString()
    if n_pids == 1:  # single range: every offset is 0, skip the agg job
        return with_pid, F.lit(0).cast(agg_type), _sort_cols(keys)
    per_pid = {r["_pid"]: r["_agg"] for r in per_pid_plan.collect()}
    offsets, acc = [], 0
    for pid in range(n_pids):
        offsets.append(acc)
        acc += per_pid.get(pid) or 0
    # the ≤ n offsets are driver-side scalars: embed them as an array
    # literal indexed by _pid instead of a broadcast join — one fewer
    # exchange, and the lookup stays inside whole-stage codegen
    offset_expr = F.element_at(
        F.array(*[F.lit(o).cast(agg_type) for o in offsets]), F.col("_pid") + 1
    )
    return with_pid, offset_expr, _sort_cols(keys)


def global_row_ids(
    df: DataFrame,
    order_by: list[OrderKey],
    id_name: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 0-based contiguous ``id_name`` column numbering rows in the
    total order given by ``order_by`` — identical to
    ``ROW_NUMBER() OVER (ORDER BY ...) - 1`` with no single-reducer sort.

    Deterministic by construction: the partition id is a pure function of
    the row's key values (broadcast boundary comparison), so the numbering
    is bit-identical across cluster layouts, parallelism, cache state, and
    retries — see the module docstring.
    """
    with_pid, offset_expr, sort_cols = _two_pass(
        df, order_by, num_partitions, F.count(F.lit(1))
    )
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    return with_pid.withColumn(
        id_name, offset_expr + F.row_number().over(w) - 1
    ).drop("_pid")


def global_running_sum(
    df: DataFrame,
    order_by: list[OrderKey],
    value_col: str,
    sum_name: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add an inclusive global running sum of ``value_col`` in the total
    order given by ``order_by`` — the same explicit-boundary scheme as
    ``global_row_ids``, accumulating per-partition SUMS instead of counts.
    The primitive behind deterministic token-budget sharding and
    curriculum scheduling: a cumulative quantity over a corpus-wide order
    with no single-reducer window, bit-identical across layouts.
    """
    with_pid, offset_expr, sort_cols = _two_pass(
        df, order_by, num_partitions, F.sum(value_col)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_pid.withColumn(
        sum_name, offset_expr + F.sum(value_col).over(w)
    ).drop("_pid")

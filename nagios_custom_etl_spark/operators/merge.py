"""Upsert / MERGE operators: Delta-style ``MERGE INTO`` semantics and
SCD Type 2 dimension maintenance over immutable parquet.

The reference's loader is append-only bulk INSERT into per-type MSSQL
tables (load_to_db.py:33-56) and leans on upstream cross-run dedup
(extract.py:115-132) to avoid re-inserting rows. A warehouse consuming
that feed still needs the mutate-in-place shapes downstream — upsert the
latest reading per host, keep attribute history when a host changes
hostgroup — which relational engines spell ``MERGE INTO`` and
dimensional models spell SCD Type 2. Both are expressed here as ONE
co-partitioned full-outer join plus per-column routing: a single shuffle
on the merge key, no driver-side row loop, no second pass.

100 TB notes: the join shuffles both sides on the key once (AQE handles
skewed keys; a small change-batch side is broadcast automatically under
the join-threshold). Writing the merged result back follows the x55
pattern — partition the table on a key-derived bucket and rewrite only
the partitions the change batch touches via dynamic partition overwrite,
so a 0.1% daily change batch rewrites 0.1% of the table, not 100 TB.
SCD2 emits the changed keys' two rows (close + open) through a single
``explode`` — no self-join, no window over the full dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    when_matched_update: dict[str, Column] | None = None,
    when_matched_delete: Column | None = None,
    insert_not_matched: bool = True,
    insert_values: dict[str, Column] | None = None,
) -> DataFrame:
    """Delta-style MERGE as one full-outer join + column routing.

    * matched and ``when_matched_delete`` holds -> row dropped;
    * matched otherwise -> target row with ``when_matched_update``
      columns replaced (expressions may reference ``t.<col>`` and
      ``s.<col>``);
    * target-only -> row kept unchanged;
    * source-only and ``insert_not_matched`` -> inserted row built from
      ``insert_values`` (default: ``s.<col>`` for every target column).

    Returns a DataFrame with exactly the target's columns. Presence is
    tracked with planted marker literals, not key nullability, so NULL
    join keys never misroute a row (they simply never match, like SQL
    MERGE).
    """
    when_matched_update = when_matched_update or {}
    insert_values = insert_values or {}
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    j = t.join(s, cond, "full_outer")

    matched = F.col("t._t_present").isNotNull() & F.col("s._s_present").isNotNull()
    t_only = F.col("t._t_present").isNotNull() & F.col("s._s_present").isNull()
    if when_matched_delete is not None:
        j = j.filter(~(matched & F.coalesce(when_matched_delete, F.lit(False))))
    if not insert_not_matched:
        j = j.filter(matched | t_only)

    out = []
    for c in target.columns:
        upd = when_matched_update.get(c, F.col(f"t.{c}"))
        ins = insert_values.get(c, F.col(f"s.{c}"))
        out.append(
            F.when(matched, upd).when(t_only, F.col(f"t.{c}")).otherwise(ins).alias(c)
        )
    return j.select(*out)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """SCD Type 2: apply an update batch to a versioned dimension.

    ``dim`` carries the attribute columns plus ``valid_from`` /
    ``valid_to`` (NULL = open) / ``is_current``; ``updates`` carries the
    key and attribute columns only. Per key:

    * update present and any ``tracked`` attribute differs (null-safe)
      -> the open row closes at ``effective_ts`` and a new open row with
      the update's attributes begins there — emitted together via one
      ``explode``, so a changed key costs two rows in one pass;
    * update present but tracked attributes equal -> no new version
      (re-applying the same batch is idempotent);
    * key absent from updates -> open row passes through;
    * brand-new key -> one open row starting at ``effective_ts``.

    Closed history never joins: it is split off by the ``is_current``
    predicate and unioned back untouched — at 100 TB the join touches
    only the current generation (and partition pruning on an
    ``is_current`` / date partitioning keeps the historical read at
    zero).
    """
    attrs = [c for c in dim.columns if c not in (valid_from, valid_to, is_current)]
    for c in updates.columns:
        if c not in attrs:
            raise ValueError(f"updates column {c!r} is not a dimension attribute")
    hist = dim.filter(~F.col(is_current))
    cur = dim.filter(F.col(is_current)).alias("t")
    upd = updates.withColumn("_s_present", F.lit(True)).alias("s")
    j = cur.join(upd, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")

    s_here = F.col("s._s_present").isNotNull()
    t_here = F.col(f"t.{is_current}").isNotNull()
    # ANY tracked attribute differing opens a new version (OR, not AND —
    # a single changed attribute among several must not be dropped)
    any_diff = F.lit(False)
    for c in tracked:
        any_diff = any_diff | ~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
    changed = s_here & t_here & any_diff

    def _struct(values: dict[str, Column]) -> Column:
        return F.struct(*[values[c].alias(c) for c in dim.columns])

    def _from(side: str, c: str) -> Column:
        # inserts/new versions take update values where provided, else
        # carry the current row's attribute (non-tracked passthrough)
        if side == "s" and c not in updates.columns:
            return F.col(f"t.{c}")
        return F.col(f"{side}.{c}")

    keep = _struct({c: F.col(f"t.{c}") for c in dim.columns})
    closed = _struct(
        {
            **{c: F.col(f"t.{c}") for c in attrs},
            valid_from: F.col(f"t.{valid_from}"),
            valid_to: F.lit(effective_ts),
            is_current: F.lit(False),
        }
    )
    opened = _struct(
        {
            **{c: _from("s", c) for c in attrs},
            valid_from: F.lit(effective_ts),
            valid_to: F.lit(None).cast(dim.schema[valid_to].dataType),
            is_current: F.lit(True),
        }
    )
    rows = (
        F.when(changed, F.array(closed, opened))
        .when(t_here, F.array(keep))  # unchanged or no update
        .otherwise(F.array(opened))  # brand-new key
    )
    exploded = j.select(F.explode(rows).alias("_r")).select("_r.*")
    return hist.unionByName(exploded)


def mv_build(
    df: DataFrame,
    keys: list[str],
    count_col: str,
    sum_cols: dict[str, tuple[str, int, int]],
) -> DataFrame:
    """Materialize a per-group aggregate view: COUNT plus exact DECIMAL
    sums (``sum_cols`` maps output name -> (source column, precision,
    scale)). The decimal carrier is what makes incremental maintenance
    exact: decimal addition is associative bit-for-bit, so base + delta
    equals a recompute no matter how the deltas were batched — double
    sums cannot promise that."""
    aggs = [F.count(F.lit(1)).cast("long").alias(count_col)]
    for out, (src, p, s) in sum_cols.items():
        aggs.append(F.sum(F.col(src).cast(f"decimal({p},{s})")).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def mv_apply_delta(
    mv: DataFrame,
    inserts: DataFrame,
    deletes: DataFrame,
    keys: list[str],
    count_col: str,
    sum_cols: dict[str, tuple[str, int, int]],
) -> DataFrame:
    """Incrementally maintain an ``mv_build`` view under a CDC batch of
    inserted AND deleted base rows — never recompute the base.

    Classic signed-delta view maintenance: inserts carry +1, deletes
    -1; ONE aggregation over the (small) change batch produces per-group
    (d_count, d_sums); a full-outer join merges them into the view
    (null-safe on keys, so NULL groups maintain correctly), and groups
    whose count reaches zero are dropped — a group deleted entirely
    disappears exactly as a recompute would make it.

    100 TB notes: cost is O(|delta|) + one co-partitioned join against
    the view (itself |groups|, not |base|); the base table is never
    scanned. This is the maintenance loop behind st7's rollup and every
    warehouse summary table: recomputing a 100 TB base per batch is the
    anti-pattern this operator exists to kill. Counts/sums/decimal sums
    are self-inverting under deletion; MIN/MAX are not (a deleted
    extremum forces a per-group rescan) — deliberately excluded.
    """
    sign = F.col("_sign")
    signed = inserts.withColumn("_sign", F.lit(1)).unionByName(
        deletes.withColumn("_sign", F.lit(-1))
    )
    d_aggs = [F.sum("_sign").cast("long").alias(count_col)]
    for out, (src, p, s) in sum_cols.items():
        d_aggs.append(F.sum(F.col(src).cast(f"decimal({p},{s})") * sign).alias(out))
    delta = signed.groupBy(*keys).agg(*d_aggs)

    t, d = mv.alias("t"), delta.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    j = t.join(d, cond, "full_outer")
    # side-presence from the count column (never NULL on its side)
    t_here = F.col(f"t.{count_col}").isNotNull()
    out = [
        F.when(t_here, F.col(f"t.{k}")).otherwise(F.col(f"d.{k}")).alias(k) for k in keys
    ]
    new_count = F.coalesce(F.col(f"t.{count_col}"), F.lit(0)) + F.coalesce(
        F.col(f"d.{count_col}"), F.lit(0)
    )
    out.append(new_count.cast("long").alias(count_col))
    for c in sum_cols:
        zero = F.lit(0).cast(mv.schema[c].dataType)
        out.append(
            (F.coalesce(F.col(f"t.{c}"), zero) + F.coalesce(F.col(f"d.{c}"), zero)).alias(c)
        )
    return j.select(*out).filter(F.col(count_col) > 0)


def temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Join each fact row to the dimension VERSION valid at its event
    time: ``dim.valid_from <= fact.ts < dim.valid_to`` (NULL valid_to =
    still open). The half-open interval means exactly one version
    matches per (key, ts) for a well-formed SCD2 table (``scd2_apply``
    produces one).

    Plan shape: an equi-join on the key with the interval as a residual
    filter — correct at scale because SCD2 version counts per key are
    small and bounded (attribute-change cardinality), so the fan-out
    before the residual is a few rows per fact, not a range-join blowup.
    Skewed hot keys split under AQE like any equi-join.
    """
    d = dim.alias("d")
    f = facts.alias("f")
    cond = (
        (F.col(f"f.{fact_key}") == F.col(f"d.{dim_key}"))
        & (F.col(f"f.{ts_col}") >= F.col(f"d.{valid_from}"))
        & (F.col(f"d.{valid_to}").isNull() | (F.col(f"f.{ts_col}") < F.col(f"d.{valid_to}")))
    )
    return f.join(d, cond, "inner")


def ivm_join_build(
    a: DataFrame, b: DataFrame, on: list[str]
) -> DataFrame:
    """Materialize an inner equi-join VIEW — the join twin of
    :func:`mv_build`. Both inputs must carry a row-identity column
    (any key unique per side); the view keeps every input column, so
    each view row's provenance (which A row x which B row produced it)
    is recoverable — that provenance is what makes row-level
    incremental maintenance (:func:`ivm_join_apply`) possible at all:
    deleting a base row maps to deleting exactly the view rows carrying
    its id, no join re-evaluation."""
    return a.join(b, on)


def ivm_join_apply(
    view: DataFrame,
    a_new: DataFrame,
    b_new: DataFrame,
    a_ins: DataFrame,
    a_del_ids: DataFrame,
    b_ins: DataFrame,
    b_del_ids: DataFrame,
    on: list[str],
    a_id: str,
    b_id: str,
) -> DataFrame:
    """Incrementally maintain an :func:`ivm_join_build` view under
    inserts AND deletes to BOTH sides — the classic join delta rule
    (dJ = dA |><| B_new  UNION  (A_new \\ dA) |><| dB, deletions as
    row-id anti-joins), never re-joining the old sides:

    1. view rows whose ``a_id`` is in ``a_del_ids`` or whose ``b_id``
       is in ``b_del_ids`` drop via two LEFT ANTI joins — the delete-id
       sets are usually tiny, so AQE converts these to broadcast joins
       at runtime and the view filters map-side with no view shuffle
       (not forced: a backfill-scale delta must be allowed to shuffle
       rather than OOM the driver on a mandatory broadcast);
    2. ``a_ins`` joins the POST-delta ``b_new`` (new-new pairs appear
       here once);
    3. ``b_ins`` joins ``a_new`` MINUS ``a_ins`` (anti on ``a_id``) so
       new-new pairs are not double-counted.

    An UPDATE is a delete + insert of the same row id, exactly as in
    :func:`mv_apply_delta`. Per-batch cost is O(|delta| |><| opposite
    side) plus a map-side filter of the view — the base-x-base join is
    never re-evaluated; at 100 TB bucket both sides and the view on the
    join key (x72) so the delta joins are co-located, and persist the
    view through merge_commit(prune_on=...) so the delete filter
    rewrites only the files that carry deleted ids (x88). Correctness
    is algorithm-independent: the result equals ivm_join_build(a_new,
    b_new) row-for-row (the x109 oracle pins this)."""
    # no forced broadcast: delete/insert id sets are USUALLY tiny (AQE
    # converts these to broadcast joins at runtime from observed sizes),
    # but a backfill-scale delta must be allowed to shuffle instead of
    # OOMing the driver on a mandatory broadcast
    kept = view.join(a_del_ids.select(a_id), a_id, "left_anti").join(
        b_del_ids.select(b_id), b_id, "left_anti"
    )
    add_a = a_ins.join(b_new, on)
    add_b = a_new.join(a_ins.select(a_id), a_id, "left_anti").join(b_ins, on)
    cols = view.columns
    return (
        kept.select(*cols)
        .unionByName(add_a.select(*cols))
        .unionByName(add_b.select(*cols))
    )

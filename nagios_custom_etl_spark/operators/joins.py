"""Join strategies Spark lacks natively or that need scale discipline
(SURVEY §2.4 note on as-of; brief: bucketing for co-location, salting for
skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` on matching keys (ties: the right row wins —
    'at or before', matching DuckDB ASOF semantics).

    Implemented as union + last_value(ignorenulls) over a per-key ordered
    window: ONE shuffle on the key, no range-explosion join, no
    per-group pandas (`merge_asof` would drop to Python). State per key is
    a single running value — this is the 100 TB-safe shape.

    Constraint: non-key column names must not collide between ``left`` and
    ``right`` (both sides are unioned into one schema); rename before
    calling, as with any join producing ambiguous columns.
    """
    overlap = (set(left.columns) & set(right.columns)) - set(key_cols)
    if overlap:
        raise ValueError(f"asof_join_backward: ambiguous non-key columns {sorted(overlap)}")
    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_src", F.lit(1))
    for v in value_cols:
        l_tagged = l_tagged.withColumn(v, F.lit(None).cast(dict(right.dtypes)[v]))
    left_only_cols = [c for c in left.columns if c not in key_cols]
    r_tagged = right.select(
        *key_cols, F.col(right_ts).alias("_ts"), F.lit(0).alias("_src"), *value_cols
    )
    for c in left_only_cols:
        r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.select(*key_cols, "_ts", "_src", *left_only_cols, *value_cols).unionByName(
        r_tagged.select(*key_cols, "_ts", "_src", *left_only_cols, *value_cols)
    )
    w = (
        W.partitionBy(*key_cols)
        .orderBy("_ts", "_src")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned
    for v in value_cols:
        filled = filled.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return filled.filter(F.col("_src") == 1).drop("_src", "_ts")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
    force_shuffle_join: bool = False,
) -> DataFrame:
    """Skew-safe equi join: salt the big side's key, replicate the small
    side across the salt domain. For when one hot key would pin a single
    reducer (AQE skew-join handles moderate skew; salting is the
    deterministic heavy-hammer for pathological keys).

    Cost: small side × salt_buckets rows — keep the small side small.

    ``force_shuffle_join`` pins a sort-merge join via hint — the bench /
    demo lever: at fixture scale Spark would broadcast the small side
    and no skew would ever materialize, which measures nothing. At 100 TB
    the dim that needs salting is exactly the one too big to broadcast.
    """
    # content-hash salt: deterministic (monotonically_increasing_id would
    # re-salt differently on retry/replay)
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    replicated_small = small.select("*", salts)
    if force_shuffle_join:
        replicated_small = replicated_small.hint("merge")
    out = salted_big.join(replicated_small, [key, "_salt"], how)
    return out.drop("_salt")


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Interval join  left.point ∈ [right.lo, right.hi]  without an equi
    key — as an equi join on time buckets.

    Spark plans a bare non-equi join as BroadcastNestedLoopJoin (or a
    cartesian product), which is O(|L|·|R|) and falls over at scale. The
    standard fix (cf. Databricks' range-join optimization): quantize time
    into ``bucket_width`` buckets, explode each interval over the buckets
    it spans, equi-join on the bucket id, and re-apply the exact range
    predicate as a residual. Cost becomes O(|L| + |R|·span/width) rows
    through a *hash* join — pick ``bucket_width`` near the typical
    interval span so the explode fan-out stays small.

    Columns ``left_point``/``right_lo``/``right_hi`` are epoch-seconds
    longs (cast timestamps up front). Output: all left + right columns.
    """
    lo, hi = F.col(right_lo), F.col(right_hi)
    r = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(lo / bucket_width).cast("long"),
                F.floor(hi / bucket_width).cast("long"),
            )
        ),
    )
    point = F.col(left_point)
    l = left.withColumn("_bucket", F.floor(point / bucket_width).cast("long"))
    return (
        l.join(r, "_bucket", how)
        .filter(point.between(lo, hi))
        .drop("_bucket")
    )

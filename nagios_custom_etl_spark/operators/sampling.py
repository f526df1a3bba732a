"""Deterministic sampling / splitting / packing operators for
training-data curation (SURVEY §2.12 extension surface; no reference
implementation exists — the reference's only selection mechanism is the
IN-list host filter, extract.py:140).

Everything here is seed-stable across runs, cluster sizes, and partition
layouts: randomness comes from md5 over a stable row id, never from
`rand()` (which is partition-dependent) — a re-run at 100 TB on a
different cluster produces byte-identical samples. md5 is used (not
xxhash64) because the oracle engine computes the identical digest, making
the sampling decisions themselves oracle-checkable.

Scale notes:
  * ``hash_split`` / ``hash_sample`` are map-only — no shuffle at any
    scale; the predicate pushes below wide transforms when possible.
  * ``stratified_sample`` shuffles once on the strata key (window
    row_number). A giant stratum concentrates on one task; at 100 TB use
    ``hash_sample`` per stratum (map-only, approximate counts) unless
    exact per-stratum counts are required.
  * ``pack_documents`` shuffles once on the group key, then packs each
    group sequentially in pandas (Arrow batches) — groups are
    independent, so parallelism is the number of groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window as W


def _hash_hex(id_col: Column, salt: str) -> Column:
    """Deterministic uniform [0,1)-equivalent as a 32-hex-digit string.

    Lexicographic order on the hex digest == numeric order on the
    128-bit value, so string comparison against a hex threshold is a
    uniform Bernoulli draw both engines evaluate identically.
    """
    return F.md5(F.concat(id_col.cast("string"), F.lit(":"), F.lit(salt)))


def fraction_to_hex_threshold(fraction: float) -> str:
    """32-hex-digit threshold t with P(md5 < t) == fraction (to 2^-64).

    fraction == 1.0 would need a 17th leading hex digit, which breaks the
    fixed-width lexicographic compare ('1000…' sorts BELOW most digests) —
    return 'g', which every hex digest sorts below.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * (1 << 64)), "016x") + "0" * 16


def hash_sample(df: DataFrame, id_col: str, fraction: float, salt: str = "sample") -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on a stable id.

    Map-only (no shuffle); the same ids are kept on every run and every
    cluster. Rate is exact in expectation, ±O(1/sqrt(n)) realized.
    """
    return df.filter(_hash_hex(F.col(id_col), salt) < fraction_to_hex_threshold(fraction))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test...) by hash bucket.

    Deterministic, map-only, disjoint and exhaustive: the [0,1) hash line
    is cut at the cumulative weights. Adding rows never reassigns
    existing rows; changing the salt reshuffles everything.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = _hash_hex(F.col(id_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = h < fraction_to_hex_threshold(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
    salt: str = "strata",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by hash order.

    One shuffle (window partitioned by the strata). Hash-ordered
    row_number makes the choice uniform-without-replacement and
    reproducible — unlike ``df.sampleBy``, which is seed- AND
    partition-layout-dependent.
    """
    w = W.partitionBy(*strata_cols).orderBy(_hash_hex(F.col(id_col), salt), F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Document packing: fill fixed-capacity token bins (sequence packing for
# LLM pretraining batches). Greedy sequential fill in stable id order —
# deterministic, and each group packs independently.
# ---------------------------------------------------------------------------


def pack_documents(
    df: DataFrame,
    group_col: str,
    id_col: str,
    token_count_col: str,
    capacity: int,
) -> DataFrame:
    """(group, id, n_tokens, bin_id) — greedy sequential bin packing.

    Within each group (e.g. source shard), docs are taken in ascending id
    order and appended to the current bin until the next doc would
    overflow ``capacity``; oversized docs (> capacity) get a bin of their
    own. The running fill is inherently sequential, so it runs as an
    ``applyInPandas`` group map — the *only* non-codegen step in this
    module, bounded by the largest group, not the table.
    """
    import pandas as pd

    out_schema = StructType(
        [
            df.schema[group_col],
            df.schema[id_col],
            StructField("n_tokens", LongType(), False),
            StructField("bin_id", LongType(), False),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, fill, cur = [], 0, 0
        for n in pdf["_n"]:
            n = int(n)
            if fill > 0 and fill + n > capacity:
                cur += 1
                fill = 0
            fill += n
            bins.append(cur)
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                id_col: pdf[id_col],
                "n_tokens": pdf["_n"].astype("int64"),
                "bin_id": pd.Series(bins, dtype="int64"),
            }
        )

    prepared = df.select(
        group_col, id_col, F.col(token_count_col).cast("long").alias("_n")
    )
    return prepared.groupBy(group_col).applyInPandas(pack, schema=out_schema)


def packing_efficiency(packed: DataFrame, group_col: str, capacity: int) -> DataFrame:
    """Per-group packing stats: bins used, mean fill ratio, wasted tokens."""
    per_bin = packed.groupBy(group_col, "bin_id").agg(
        F.sum("n_tokens").alias("_fill")
    )
    return per_bin.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_bins"),
        (F.avg("_fill") / F.lit(float(capacity))).alias("mean_fill_ratio"),
        F.sum(F.lit(capacity) - F.col("_fill")).alias("wasted_tokens"),
    )


def mixture_rebalance(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    target_weights: dict[str, float],
    salt: str = "mixture",
) -> DataFrame:
    """Downsample strata so realized proportions approach target weights.

    Computes per-stratum keep-fractions from the current counts: the
    limiting stratum (highest target/current ratio) is kept whole and the
    rest are hash-downsampled to match. Two passes over metadata (one
    count aggregate, broadcast back) + one map-only filter — no shuffle
    of the data itself, and the decisions are md5-deterministic.

    At 100 TB the count pass is a metadata-sized aggregate; the filter
    streams. Strata absent from ``target_weights`` are dropped.
    """
    counts = {r[0]: r[1] for r in df.groupBy(stratum_col).count().collect()}
    missing = [s for s in target_weights if s not in counts]
    if missing:
        raise ValueError(f"strata {missing} not present in data")
    # scale: max achievable total N with per-stratum cap count[s]/weight[s]
    n_total = min(counts[s] / w for s, w in target_weights.items() if w > 0)
    fracs = {
        s: min(1.0, (w * n_total) / counts[s]) for s, w in target_weights.items()
    }
    h = _hash_hex(F.col(id_col), salt)
    keep: Column | None = None
    for s, f in fracs.items():
        cond = (F.col(stratum_col) == s) & (h < fraction_to_hex_threshold(f))
        keep = cond if keep is None else keep | cond
    return df.filter(keep)

"""Mergeable-sketch aggregates (SURVEY §2.5 Ext — the scale path for
distinct counts, quantiles, and set overlap).

At 100 TB, exact COUNT(DISTINCT) is a full shuffle of every distinct
value and exact percentiles are a global sort; both are also
non-reaggregatable (yesterday's per-partition result can't be combined
into this month's). Apache DataSketches aggregates (built into Spark 4:
``hll_sketch_agg``, ``kll_sketch_agg_*``, ``theta_sketch_agg``) fix both:
kilobyte-sized state, map-side combinable, and the *sketch itself* is the
rollup currency — store per-(partition, day) sketches and answer any
coarser grouping with a union, never rescanning the data. Theta sketches
additionally support intersection/difference, i.e. set algebra on
distinct sets (audience overlap, vocabulary sharing) that plain HLL
cannot express.

No reference implementation exists (the reference only counts rows,
e.g. hosts_to_csv.py:21,37); this is the north-star extension surface.
DuckDB has no DataSketches build, so contract queries are rows-only and
accuracy is bounds-tested against exact answers in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vocab_sketch_rollup(docs: DataFrame, lang_col: str = "lang", text_col: str = "text") -> DataFrame:
    """Per-language corpus profile from one pass + an ``__all__`` row
    re-aggregated FROM THE SKETCHES (no second scan): distinct-token
    estimate (HLL), doc count, p50/p95 doc length (KLL).
    """
    toks = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    per_lang = toks.groupBy("lang").agg(F.hll_sketch_agg("tok").alias("hll"))
    # doc-level length sketch must not be inflated by the token explode:
    # aggregate it from the un-exploded frame
    lengths = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.kll_sketch_agg_bigint("n_chars").alias("kll"),
    )
    per = per_lang.join(lengths, "lang")
    per_rows = per.select(
        "lang",
        "n_docs",
        F.hll_sketch_estimate("hll").alias("distinct_tokens_est"),
        F.kll_sketch_get_quantile_bigint("kll", F.lit(0.5)).alias("p50_chars"),
        F.kll_sketch_get_quantile_bigint("kll", F.lit(0.95)).alias("p95_chars"),
    )
    # kll has no merge *aggregate* (only the 2-ary scalar merge); the
    # per-group sketch list is O(groups) kilobytes, so fold it
    merged = per.agg(
        F.sum("n_docs").alias("n_docs"),
        F.hll_union_agg("hll").alias("hll"),
        F.collect_list("kll").alias("klls"),
    ).select(
        "n_docs",
        "hll",
        F.aggregate(
            F.slice("klls", 2, F.greatest(F.size("klls") - 1, F.lit(0))),
            F.element_at("klls", 1),
            lambda acc, x: F.kll_sketch_merge_bigint(acc, x),
        ).alias("kll"),
    ).select(
        F.lit("__all__").alias("lang"),
        "n_docs",
        F.hll_sketch_estimate("hll").alias("distinct_tokens_est"),
        F.kll_sketch_get_quantile_bigint("kll", F.lit(0.5)).alias("p50_chars"),
        F.kll_sketch_get_quantile_bigint("kll", F.lit(0.95)).alias("p95_chars"),
    )
    return per_rows.unionByName(merged).orderBy("lang")


def vocab_overlap_theta(docs: DataFrame, lang_a: str, lang_b: str, text_col: str = "text") -> DataFrame:
    """Estimated distinct-token overlap between two language slices via
    theta sketches: |A|, |B|, |A∩B|, |A∖B| and Jaccard — set algebra on
    sketches, one scan, no distinct-value shuffle."""
    toks = (
        docs.filter(F.col("lang").isin(lang_a, lang_b))
        .select("lang", F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    sketches = toks.groupBy("lang").agg(F.theta_sketch_agg("tok").alias("theta"))
    a = sketches.filter(F.col("lang") == lang_a).select(F.col("theta").alias("ta"))
    b = sketches.filter(F.col("lang") == lang_b).select(F.col("theta").alias("tb"))
    both = a.crossJoin(b)  # two 1-row frames
    inter = F.theta_sketch_estimate(F.theta_intersection("ta", "tb"))
    only_a = F.theta_sketch_estimate(F.theta_difference("ta", "tb"))
    union = F.theta_sketch_estimate(F.theta_union("ta", "tb"))
    return both.select(
        F.lit(lang_a).alias("lang_a"),
        F.lit(lang_b).alias("lang_b"),
        F.theta_sketch_estimate("ta").alias("n_a_est"),
        F.theta_sketch_estimate("tb").alias("n_b_est"),
        inter.alias("n_common_est"),
        only_a.alias("n_only_a_est"),
        (inter / union).alias("jaccard_est"),
    )


def count_min_buckets(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch as a DataFrame: ``(seed, bucket, n)`` counts over
    ``depth`` independent hash rows of ``width`` buckets. The whole
    sketch is depth×width rows regardless of stream size — the
    mergeable, constant-space frequency summary (Cormode & Muthukrishnan
    2005). Bucketing uses md5 (identical across engines, so estimates
    are exactly oracle-checkable) — at production scale swap in
    xxhash64 for speed; the sketch algebra is hash-agnostic.

    Fan-out is depth× the item stream map-side, collapsed by the
    map-side-combined groupBy to depth×width rows on the wire.
    """
    seeded = items.select(F.col(item_col).alias("_it")).select(
        "_it", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("seed"), F.col("_it"))), 1, 8), 16, 10
        ).cast("long")
        % width
    )
    return (
        seeded.select("seed", bucket.alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def count_min_estimates(
    buckets: DataFrame, queries: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-frequency estimates for ``queries`` against a
    ``count_min_buckets`` table: estimate = min over the depth rows of
    the bucket count the item hashes into. Never underestimates; the
    overshoot is bounded by (stream_len / width) per row w.h.p."""
    q = queries.select(F.col(item_col)).distinct().select(
        item_col, F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("seed"), F.col(item_col))), 1, 8), 16, 10
        ).cast("long")
        % width
    )
    return (
        q.select(item_col, "seed", bucket.alias("bucket"))
        .join(F.broadcast(buckets), ["seed", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("cms_n"))
    )


# ---------------------------------------------------------------------------
# Portable register-level HLL: the sketch as a RELATION (group, register,
# rho), built from md5 — bit-identical in any engine that has md5, which is
# what makes it (unlike the DataSketches binaries above) exactly
# cross-engine checkable AND maintainable by any max-merging store.
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def hll_register_rows(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    p: int = 8,
    salt: str = ":hll",
) -> DataFrame:
    """HyperLogLog registers as rows ``group_cols + (reg, rho)`` — one
    row per (group, non-zero register), ``rho`` already max-merged
    within the group. ``2**p`` registers; the hash is md5 (identical
    bytes in Spark, DuckDB, Python — the portability that lets an
    oracle replicate every register exactly, where DataSketches blobs
    (:func:`vocab_sketch_rollup`) can only be bounds-checked).

    The relational representation IS the merge algebra: a coarser
    rollup, a cross-shard union, or an incremental micro-batch merge
    are all ``groupBy(granu, reg).max(rho)`` — max is idempotent,
    commutative and associative, so re-delivery and re-ordering are
    free (the property st24 leans on). Register index = top ``p`` bits
    of the first ``ceil(p/4)`` hex chars (a floor-divide when p is not
    a multiple of 4 — the leftover low bits are discarded), rho = 1 +
    leading zeros of the 64 bits after that hex-char boundary,
    computed with string built-ins only (codegen'd; each hex char is 4
    bits, so a zero-run count plus a 4-way CASE on the first non-zero
    char needs no 128-bit arithmetic anywhere). One shuffle at
    (group, register) cardinality — bounded by ``|groups| * 2**p``
    regardless of data size; the map side pre-aggregates, so at 100 TB
    the shuffle moves kilobytes per group, the HLL promise."""
    reg, rho = hll_reg_rho(key_col, p=p, salt=salt)
    return (
        # NULL keys are skipped, matching COUNT(DISTINCT) in both engines
        # (md5(NULL||salt) is NULL and would otherwise emit a (NULL, NULL)
        # register row that inflates v_zero and breaks map_from_entries).
        df.where(F.col(key_col).isNotNull())
        .select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_reg_rho(key_col: str, p: int = 8, salt: str = ":hll"):
    """The per-ROW half of :func:`hll_register_rows`: pure Column
    expressions ``(reg, rho)`` for one key — what a streaming plan maps
    over its micro-batch before handing (dims, reg, rho) rows to a
    max-merging sink (st24). Kept separate so the stream stays a
    stateless projection and ALL merging happens in the sink's
    idempotent groupBy-max."""
    if not 4 <= p <= 14 or int(p) != p:
        raise ValueError("p must be an integer in [4, 14]")
    hc = (p + 3) // 4  # hex chars consumed by the register index
    shift = 4 * hc - p  # leftover low bits when p is not a hex boundary
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    raw = sum(
        (F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - 1) * (16 ** (hc - 1 - i))
        for i in range(hc)
    )
    # Top p bits of the consumed chars: a floor-divide, so p=4/8/12 stay
    # bit-identical to the historical whole-hex-char path (x100/x105/x107/
    # st24 sketches unchanged) while any p in [4,14] indexes all 2**p
    # registers (the pre-r9 guard let p=6/10 through but only used
    # 2**(4*(p//4)) registers — silently skewed estimates; ADVICE r8).
    idx = raw if shift == 0 else F.floor(raw / F.lit(1 << shift))
    tail = F.substring(h, hc + 1, 16)
    zrun = F.length(F.regexp_extract(tail, "^0*", 0))
    fc = tail.substr(zrun + 1, F.lit(1))
    extra = (
        F.when(fc == "1", 3)
        .when(fc.isin("2", "3"), 2)
        .when(fc.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return idx.cast("int"), (zrun * 4 + extra + 1).cast("int")


def hll_estimate(regs: DataFrame, group_cols: list[str], p: int = 8) -> DataFrame:
    """Distinct-count estimate per group from register rows (any
    max-merged granularity of :func:`hll_register_rows`): the Flajolet
    HLL estimator with the small-range (linear-counting) correction.
    The register sum Σ 2^-rho accumulates EXACTLY — each term is a
    power of two scaled to an integer DECIMAL(38,0), so the sum is
    association-free and bit-identical across engines; the estimate
    does one double division (plus one ln on the linear-counting path)
    per GROUP, not per row."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    scaled = F.pow(F.lit(2.0), 70 - F.col("rho")).cast("decimal(38,0)")
    g = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_n_present"),
        F.sum(scaled).alias("_s"),
    )
    two70 = F.pow(F.lit(2.0), F.lit(70)).cast("decimal(38,0)")
    v_zero = F.lit(m) - F.col("_n_present")
    total = (F.col("_s") + v_zero.cast("decimal(38,0)") * two70).cast("double")
    raw = F.lit(alpha * m * m) * F.pow(F.lit(2.0), F.lit(70)) / total
    est = F.when(
        (raw <= 2.5 * m) & (v_zero > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero)
    ).otherwise(raw)
    return g.select(
        *group_cols,
        v_zero.cast("long").alias("v_zero"),
        est.alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Mergeable equi-width histogram: the quantile analog of the register-level
# HLL above — bin counts are ADDITIVE (a "sum" measure for any partial-
# aggregating store), and every step is replicable cross-engine, where the
# KLL blobs (x20) can only be bounds-checked.
# ---------------------------------------------------------------------------


def hist_bin_counts(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Equi-width histogram as rows ``group_cols + (bin, n)`` over the
    declared domain [lo, hi) — values outside clamp into the edge bins
    (the sketch never drops mass, so merged totals reconcile). Counts
    are ADDITIVE: shard/micro-batch partials re-aggregate by plain SUM,
    which is what lets a percentile MV ride the same incremental
    maintenance as any sum (st23's sink) — the mergeable-quantile story
    without a sketch binary. One shuffle bounded at |groups| * bins
    regardless of data size, map-side combined. The binning expression
    ``floor((x - lo) * bins / (hi - lo))`` is the same IEEE double
    sequence in any engine — bit-identical bins, unlike rank-based
    exact quantiles whose global sort this replaces at 100 TB."""
    if hi <= lo or bins < 1:
        raise ValueError("need hi > lo and bins >= 1")
    raw = F.floor(
        (F.col(val_col).cast("double") - F.lit(float(lo)))
        * bins
        / (F.lit(float(hi)) - F.lit(float(lo)))
    )
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        df.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def hist_quantile(
    hist: DataFrame,
    group_cols: list[str],
    q: float,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Quantile estimate per group from (merged) histogram rows: find
    the bin where the cumulative count crosses ``q * total`` and
    interpolate linearly inside it — error bounded by one bin width.
    Per GROUP this is a bins-row window (constant-size by construction)
    plus scalar double arithmetic; nothing data-sized moves."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("bin")
    width = (hi - lo) / bins
    cum = hist.select(
        *group_cols,
        "bin",
        "n",
        F.sum("n").over(w).alias("_cum"),
        F.sum("n").over(Window.partitionBy(*group_cols)).alias("_tot"),
    )
    target = F.lit(float(q)) * F.col("_tot")
    hit = (
        cum.filter(F.col("_cum") >= target)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    est = F.lit(float(lo)) + (
        F.col("bin") + (target - (F.col("_cum") - F.col("n"))) / F.col("n")
    ) * F.lit(float(width))
    return hit.select(*group_cols, est.alias("quantile_est"))

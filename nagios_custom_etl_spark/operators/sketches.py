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

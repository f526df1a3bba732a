"""Sketch-aggregate accuracy bounds (operators/sketches.py). Estimates
are implementation-defined (no DuckDB oracle), so correctness here means
(a) exact on small cardinalities, (b) within published error bounds on
planted high-cardinality data, (c) the sketch-merged rollup row agrees
with a direct global sketch."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sketch_rollup_exact_on_fixture(spark, sf_dir):
    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators.sketches import vocab_sketch_rollup

    docs = load_table(spark, sf_dir, "documents")
    out = {r["lang"]: r for r in vocab_sketch_rollup(docs).collect()}
    toks = docs.select(
        "lang", F.explode(F.split("text", r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    exact_all = toks.select("tok").distinct().count()
    # tiny vocabulary: HLL is exact there
    assert out["__all__"]["distinct_tokens_est"] == exact_all
    assert out["__all__"]["n_docs"] == docs.count()
    for lang in ("en", "fr"):
        exact = toks.filter(F.col("lang") == lang).select("tok").distinct().count()
        assert out[lang]["distinct_tokens_est"] == exact
    # KLL p50 within rank tolerance of the exact median
    import duckdb

    lo, hi = duckdb.sql(
        f"SELECT quantile_cont(n_chars, 0.45), quantile_cont(n_chars, 0.55) "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()
    assert lo <= out["__all__"]["p50_chars"] <= hi


def test_hll_error_bound_high_cardinality(spark):
    from pyspark.sql import functions as F

    n = 200_000
    df = spark.range(n).select(F.concat(F.lit("tok_"), F.col("id")).alias("tok"))
    est = df.agg(F.hll_sketch_estimate(F.hll_sketch_agg("tok")).alias("e")).collect()[0]["e"]
    # default lgK=12 -> rse ~ 1.04/sqrt(2^12) ~ 1.6%; allow 4 sigma
    assert abs(est - n) / n < 0.065, est


def test_theta_overlap_bounds_planted(spark):
    from nagios_custom_etl_spark.operators.sketches import vocab_overlap_theta

    # en: tokens 0..9999; fr: tokens 5000..14999 -> overlap 5000, union 15000
    rows = []
    en = " ".join(f"w{i}" for i in range(0, 10_000))
    fr = " ".join(f"w{i}" for i in range(5_000, 15_000))
    df = spark.createDataFrame([("en", en), ("fr", fr)], "lang string, text string")
    out = vocab_overlap_theta(df, "en", "fr").collect()[0]
    assert abs(out["n_a_est"] - 10_000) / 10_000 < 0.05
    assert abs(out["n_common_est"] - 5_000) / 5_000 < 0.10
    assert abs(out["n_only_a_est"] - 5_000) / 5_000 < 0.10
    assert abs(out["jaccard_est"] - 1 / 3) < 0.05


def test_count_min_never_underestimates(spark):
    """CMS guarantees estimate >= true count for every item; with a
    planted heavy hitter the estimate is tight (collision overshoot is
    bounded by stream_len/width)."""
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.sketches import (
        count_min_buckets,
        count_min_estimates,
    )

    rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(200)]
    items = spark.createDataFrame(rows, "item string")
    exact = {r["item"]: r["n"] for r in items.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()}
    buckets = count_min_buckets(items, "item", depth=4, width=64)
    est = {
        r["item"]: r["cms_n"]
        for r in count_min_estimates(buckets, items, "item", depth=4, width=64).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # 700 items over 64 buckets: expected overshoot ~11 per row; min over
    # 4 independent rows keeps the heavy hitter's estimate tight
    assert est["hot"] - exact["hot"] <= 60


def test_hll_registers_merge_equals_direct(spark):
    """The relational HLL's whole value: max-merging shard-level
    register rows is LOSSLESS — identical to sketching the union
    directly. Pinned on random data split across 4 shards."""
    import random

    from nagios_custom_etl_spark.operators.sketches import hll_register_rows

    rnd = random.Random(7)
    rows = [(rnd.randrange(4), rnd.randrange(3000)) for _ in range(20_000)]
    df = spark.createDataFrame(rows, "shard int, k long")
    direct = {
        (r.reg, r.rho)
        for r in hll_register_rows(df.select(F.lit(1).alias("g"), "k"), ["g"], "k").collect()
    }
    sharded = hll_register_rows(df, ["shard"], "k")
    merged = {
        (r.reg, r.rho)
        for r in sharded.groupBy("reg").agg(F.max("rho").alias("rho")).collect()
    }
    assert merged == direct


def test_hll_estimate_accuracy_and_linear_counting(spark):
    """Standard error at p=8 is 1.04/sqrt(256) = 6.5%; assert a 3-sigma
    bound on 5000 planted distinct keys (duplicated 3x — duplicates must
    not move a distinct sketch). Tiny cardinalities take the
    linear-counting branch and come back near-exact."""
    from nagios_custom_etl_spark.operators.sketches import (
        hll_estimate,
        hll_register_rows,
    )

    big = spark.range(0, 15000).select(
        F.lit("big").alias("g"), (F.col("id") % 5000).alias("k")
    )
    small = spark.range(0, 500).select(
        F.lit("small").alias("g"), (F.col("id") % 7).alias("k")
    )
    regs = hll_register_rows(big.unionByName(small), ["g"], "k")
    out = {r.g: r.est_distinct for r in hll_estimate(regs, ["g"]).collect()}
    assert abs(out["big"] - 5000) / 5000 < 0.20
    assert abs(out["small"] - 7) < 1.0


def test_hll_register_rows_validates_p(spark):
    import pytest

    from nagios_custom_etl_spark.operators.sketches import hll_register_rows

    df = spark.range(3).select(F.lit(1).alias("g"), F.col("id").alias("k"))
    for bad in (3, 15, 8.5):
        with pytest.raises(ValueError):
            hll_register_rows(df, ["g"], "k", p=bad)


def test_hll_non_hex_boundary_p_uses_all_registers(spark):
    """p=6/10 used to pass validation but index only 2**(4*(p//4))
    registers while the estimator assumed m=2**p (r8 ADVICE). Now the
    floor-divide path must spread keys across the FULL register space
    and keep the estimate inside the HLL error bound at that m."""
    from nagios_custom_etl_spark.operators.sketches import (
        hll_estimate,
        hll_register_rows,
    )

    df = spark.range(0, 20_000).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    for p in (6, 10):
        regs = hll_register_rows(df, ["g"], "k", p=p)
        lo, hi, n = regs.agg(
            F.min("reg"), F.max("reg"), F.count(F.lit(1))
        ).first()
        assert 0 <= lo and hi >= (1 << p) * 3 // 4, (p, lo, hi)
        # 20k distinct keys saturate well past the old truncated space
        assert n > (1 << (4 * (p // 4))), (p, n)
        est = hll_estimate(regs, ["g"], p=p).first().est_distinct
        sigma = 1.04 / (1 << p) ** 0.5
        assert abs(est - 20_000) / 20_000 < 4 * sigma, (p, est)


def test_hll_register_rows_skips_null_keys(spark):
    """NULL keys are ignored (COUNT DISTINCT semantics in both engines);
    previously md5(NULL||salt)=NULL emitted a (NULL reg, NULL rho) row
    that inflated v_zero and crashed map_from_entries (r8 ADVICE)."""
    from nagios_custom_etl_spark.operators.sketches import hll_register_rows

    df = spark.createDataFrame(
        [(1, "a"), (1, None), (1, "b"), (1, None)], "g int, k string"
    )
    rows = hll_register_rows(df, ["g"], "k").collect()
    assert rows and all(r.reg is not None and r.rho is not None for r in rows)
    no_null = hll_register_rows(
        df.where(F.col("k").isNotNull()), ["g"], "k"
    ).collect()
    assert {(r.reg, r.rho) for r in rows} == {(r.reg, r.rho) for r in no_null}


def test_hist_quantiles_error_bounded_by_bin_width(spark):
    """Histogram quantile estimates vs exact percentile: error must be
    <= one bin width on 10k uniform values, and edge clamping must keep
    total mass (values outside [lo, hi) land in the edge bins)."""
    from nagios_custom_etl_spark.operators.sketches import (
        hist_bin_counts,
        hist_quantile,
    )

    df = spark.range(0, 10_000).select(
        F.lit("g").alias("g"), (F.col("id") % 1000).cast("double").alias("v")
    )
    hist = hist_bin_counts(df, ["g"], "v", 0.0, 1000.0, bins=100)
    assert hist.agg(F.sum("n")).first()[0] == 10_000
    for q, exact in ((0.5, 499.5), (0.95, 949.5)):
        est = hist_quantile(hist, ["g"], q, 0.0, 1000.0, bins=100).first().quantile_est
        assert abs(est - exact) <= 10.0, (q, est)
    # out-of-domain values clamp, not drop
    wild = spark.createDataFrame([("g", -5.0), ("g", 4e6)], "g string, v double")
    h2 = hist_bin_counts(wild, ["g"], "v", 0.0, 1000.0, bins=100)
    got = {(r.bin, r.n) for r in h2.collect()}
    assert got == {(0, 1), (99, 1)}


def test_hist_merge_equals_direct(spark):
    """SUM-merging shard partials equals binning the union directly —
    the additivity a percentile MV maintains counts through."""
    import random

    from nagios_custom_etl_spark.operators.sketches import hist_bin_counts

    rnd = random.Random(3)
    rows = [(rnd.randrange(4), rnd.uniform(-10, 1010)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "shard int, v double")
    direct = {
        (r.bin, r.n)
        for r in hist_bin_counts(
            df.select(F.lit(1).alias("g"), "v"), ["g"], "v", 0.0, 1000.0, 64
        ).collect()
    }
    sharded = hist_bin_counts(df, ["shard"], "v", 0.0, 1000.0, 64)
    merged = {
        (r.bin, r.n)
        for r in sharded.groupBy("bin").agg(F.sum("n").alias("n")).collect()
    }
    assert merged == direct

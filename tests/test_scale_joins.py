"""Scale-path join strategies: bucketed co-located joins (no shuffle),
salted skew joins (correctness under replication), as-of join semantics."""

from __future__ import annotations

import contextlib
import io
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import load_table
from nagios_custom_etl_spark.operators.joins import asof_join_backward, salted_join


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """bucketBy(orderkey) both sides → the sort-merge join reads
    co-located buckets with NO Exchange on either side."""
    warehouse = tempfile.mkdtemp(prefix="bucketed_wh_")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").option("path", f"{warehouse}/li").bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").option("path", f"{warehouse}/o").bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").saveAsTable("o_bucketed")
    # disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
        shutil.rmtree(warehouse, ignore_errors=True)


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must not change join semantics — only the partition layout."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    plain = li.join(parts, "l_partkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).head()
    salted = salted_join(li, parts, "l_partkey", salt_buckets=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).head()
    assert plain["n"] == salted["n"]
    assert plain["q"] == pytest.approx(salted["q"])


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00"), (2, 10, "2024-01-01 11:00:00"), (3, 20, "2024-01-01 09:00:00")],
        "event_id long, user_id long, ts_str string",
    ).withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    markers = spark.createDataFrame(
        [(10, "2024-01-01 09:30:00"), (10, "2024-01-01 10:30:00"), (99, "2024-01-01 00:00:00")],
        "user_id long, mts_str string",
    ).withColumn("marker_ts", F.to_timestamp("mts_str")).drop("mts_str")
    out = {
        r["event_id"]: r["marker_ts"]
        for r in asof_join_backward(left, markers, ["user_id"], "ts", "marker_ts", ["marker_ts"]).collect()
    }
    assert str(out[1]) == "2024-01-01 09:30:00"  # latest at-or-before 10:00
    assert str(out[2]) == "2024-01-01 10:30:00"  # advanced to the newer marker
    assert out[3] is None  # no marker before 09:00 for user 20


def test_aqe_skew_join_splits_hot_partition(spark):
    """Scale evidence: with thresholds scaled to fixture size, AQE's
    OptimizeSkewedJoin must split the hot key's oversized partition
    (skew=true in the final adaptive plan) — the runtime complement to
    the explicit salted_join."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1k",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            # half the rows hash to one key: hot partition >> factor x median
            (F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id"))).alias("k"),
            F.concat(F.lit("pad_pad_pad_pad_pad_"), F.col("id")).alias("pad"),
        )
        right = spark.range(0, 50_000).select(F.col("id").alias("k"))
        joined = left.join(right, "k")
        # collect() runs this DataFrame's own QueryExecution (count()/write
        # build a different one whose adaptive plan never finalizes here)
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_order_primitives_partition_invariant(spark, sf_dir):
    """The global-order primitives (row ids / running sums / NTILE-style
    bucketing built on them) must be BIT-identical at any parallelism —
    the property that makes shard assignment reproducible across
    cluster layouts. Run x40's manifest pipeline shape at 3 and 17
    partitions and require equal output."""
    from nagios_custom_etl_spark.operators.ids import global_row_ids, global_running_sum

    df = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("v")
    )
    outs = []
    for n in (3, 17):
        cum = global_running_sum(
            df.repartition(n), [F.col("doc_id")], "v", "running", num_partitions=n
        )
        ids = global_row_ids(
            df.repartition(n), [F.col("doc_id")], "rid", num_partitions=n
        )
        outs.append(
            (
                sorted(map(tuple, cum.select("doc_id", "running").collect())),
                sorted(map(tuple, ids.select("doc_id", "rid").collect())),
            )
        )
    assert outs[0] == outs[1]


def test_x50_skew_twins_plan_and_salt_spread(spark):
    """The registered skew twins (VERDICT r4 task 6) must actually
    exercise the salted shuffle: a sort-merge join (no broadcast of the
    dim) whose exchange keys include the salt, so the planted hot key
    (20% of events on one user) is spread across salt buckets."""
    from nagios_custom_etl_spark.plans.extensions import _skew_join_agg

    out = _skew_join_agg(spark, "/root/testdata/sf0.001", plant_hot_key=True)
    plan = plan_of(out)
    assert "SortMergeJoin" in plan, "dim was broadcast — skew never materializes"
    assert "_salt" in plan and "hashpartitioning" in plan


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """At 100 TB the fact table is partitioned (by day/month) and the
    dim-side filter must prune fact PARTITIONS at runtime — Catalyst's
    dynamic partition pruning. Assert the scan's PartitionFilters carry
    a dynamicpruningexpression derived from the dim subquery, and that
    the pruned plan returns the same rows as the unpartitioned join."""
    from nagios_custom_etl_spark.catalog import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "omonth", F.date_format("o_orderdate", "yyyy-MM")
    )
    d = str(tmp_path / "orders_by_month")
    o.write.mode("overwrite").partitionBy("omonth").parquet(d)
    fact = spark.read.parquet(d)
    dim = (
        o.select("omonth").distinct().filter(F.col("omonth") >= "1998-01")
    )
    joined = fact.join(dim, "omonth").groupBy("omonth").count()
    plan = plan_of(joined)
    assert "dynamicpruningexpression" in plan, "DPP did not fire on the partitioned scan"
    expected = sorted(
        map(tuple, o.filter(F.col("omonth") >= "1998-01").groupBy("omonth").count().collect())
    )
    assert sorted(map(tuple, joined.collect())) == expected


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """At 100 TB a selective dim-side filter should cut the FACT side's
    shuffle before it happens: Catalyst's runtime bloom-filter join
    injects might_contain(bloom(dim keys)) onto the probe side of a
    shuffle join — a semi-join reduction that skips shuffling rows that
    cannot match. Thresholds are lowered to trigger at fixture scale;
    the filtered plan must return exactly the plain join's rows."""
    from nagios_custom_etl_spark.catalog import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        o = load_table(spark, "/root/testdata/sf0.001", "orders").filter(
            F.col("o_totalprice") > 400000
        ).select("o_orderkey")
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        assert "might_contain" in plan_of(j), "runtime bloom filter not injected"
        got = sorted(map(tuple, j.collect()))
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    plain = sorted(map(tuple, li.join(o, li.l_orderkey == o.o_orderkey).collect()))
    assert got == plain and len(got) > 0


def test_fact_spread_is_hash_on_join_key(spark):
    """Starved fact-table scans must spread by HASH on the join key (the
    exchange doubles as the join distribution — poor-man's bucketing),
    heavy text/vector tables by round-robin, and dimensions not at all."""
    from nagios_custom_etl_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"  # lineitem 114 KiB > the 64 KiB threshold
    li_plan = plan_of(load_table(spark, sf, "lineitem").select("l_orderkey"))
    assert "hashpartitioning(l_orderkey" in li_plan, li_plan[:500]
    docs_plan = plan_of(load_table(spark, sf, "documents").select("doc_id"))
    assert "roundrobin" in docs_plan.lower()
    dim_plan = plan_of(load_table(spark, sf, "nation"))
    assert "Exchange" not in dim_plan  # dimensions are never spread


def test_x72_bucketed_join_smj_subtree_exchange_free(spark, sf_dir):
    """The registered x72 query's SortMergeJoin consumes the bucketed
    scans directly — no Exchange anywhere beneath the join (the two
    post-join Exchanges for groupBy/orderBy are expected and cheap:
    they move aggregated rows, not fact rows)."""
    from nagios_custom_etl_spark.plans import all_queries

    df = all_queries()["x72_bucketed_join"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    smj_at = next(i for i, l in enumerate(lines) if "SortMergeJoin" in l)
    assert not any("Exchange" in l for l in lines[smj_at:]), (
        "shuffle below the bucketed join:\n" + "\n".join(lines[smj_at:])
    )


def test_write_bucketed_table_one_file_per_bucket(spark, sf_dir, tmp_path):
    """repartition(buckets, key) aligned with bucketBy => exactly one
    data file per bucket (the precondition for sorted-bucket Sort
    elimination and for bucket pruning to map 1:1 to files)."""
    import os

    from nagios_custom_etl_spark.operators.maintenance import write_bucketed_table

    name = f"x72t_{os.getpid()}"
    try:
        write_bucketed_table(
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
            spark, name, "o_orderkey", str(tmp_path / "t"), buckets=8,
        )
        files = [f for f in os.listdir(tmp_path / "t") if f.endswith(".parquet")]
        assert len(files) == 8  # 8 buckets, one file each
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")

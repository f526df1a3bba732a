"""S1/S2 scans and K1/K2/K3 sinks (SURVEY §2.1-§2.2): CSV and JSON
round-trips with declared schemas — never inference in the pipeline path
(the reference's schema-on-read is the bug class we remove)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nagios_custom_etl_spark.catalog import load_table

HOSTS_SCHEMA = T.StructType(
    [
        T.StructField("host_name", T.StringType(), False),
        T.StructField("host_group", T.StringType(), True),
    ]
)


def test_csv_roundtrip_with_declared_schema(spark):
    """K2 sink (hosts_to_csv.py:48) then S1 scan (extract.py:138-140)."""
    d = tempfile.mkdtemp(prefix="csv_rt_")
    df = spark.createDataFrame(
        [("web01", "linux-servers"), ("win01", "windows-servers")], HOSTS_SCHEMA
    )
    df.write.mode("overwrite").option("header", True).csv(d)
    back = spark.read.schema(HOSTS_SCHEMA).option("header", True).csv(d)
    # file sources surface everything nullable; names+types are the contract
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in HOSTS_SCHEMA.fields
    ]
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
    shutil.rmtree(d, ignore_errors=True)


def test_json_roundtrip_events(spark, sf_dir):
    """K1 JSON sink (extract.py:145-156) then S2 JSON scan
    (load_to_db.py:22-23), declared schema, no inference."""
    d = tempfile.mkdtemp(prefix="json_rt_")
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100).select(
        "event_id", "event_type", "value", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str")
    )
    ev.write.mode("overwrite").json(d)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts_str", T.StringType()),
        ]
    )
    back = spark.read.schema(schema).json(d)
    assert back.count() == 100
    assert {r["event_id"] for r in back.collect()} == {r["event_id"] for r in ev.collect()}
    shutil.rmtree(d, ignore_errors=True)


def test_multiline_json_array_scan(spark):
    """S2's exact reference shape: one pretty-printed JSON *array* file
    (extract.py:156 json.dump of a list)."""
    import json, os

    d = tempfile.mkdtemp(prefix="json_arr_")
    payload = [
        {"host_name": "web01", "timestamp": "2024-01-01 00:00:00", "service_name": "CPU Usage", "percent_used": 40.5},
        {"host_name": "web02", "timestamp": "2024-01-01 00:00:00", "service_name": "CPU Usage", "percent_used": 12.25},
    ]
    with open(os.path.join(d, "data_extract.json"), "w") as f:
        json.dump(payload, f, indent=2)
    schema = T.StructType(
        [
            T.StructField("host_name", T.StringType()),
            T.StructField("timestamp", T.StringType()),
            T.StructField("service_name", T.StringType()),
            T.StructField("percent_used", T.DoubleType()),
        ]
    )
    back = spark.read.schema(schema).option("multiLine", True).json(d)
    assert back.count() == 2
    assert {r["percent_used"] for r in back.collect()} == {40.5, 12.25}
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_parquet_sink_prunes(spark, sf_dir):
    """Scale-path sink: partitionBy(route) parquet; reading one partition
    must scan only that partition's files (PartitionFilters in the plan)."""
    d = tempfile.mkdtemp(prefix="part_sink_")
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("route", F.when(F.col("event_type") == "error", "alerts").otherwise("rest")) \
        .write.mode("overwrite").partitionBy("route").parquet(d)
    one = spark.read.parquet(d).filter(F.col("route") == "alerts")
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "route" in plan
    n_alerts = one.count()
    assert n_alerts == ev.filter(F.col("event_type") == "error").count()
    shutil.rmtree(d, ignore_errors=True)


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC source/sink (S-ext): roundtrip preserves schema and values, and
    filters reach the ORC scan (predicate pushdown) like parquet."""
    from nagios_custom_etl_spark.catalog import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_orc")
    src.write.format("orc").save(path)
    back = spark.read.format("orc").load(path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    q = back.filter(F.col("o_totalprice") > 1000).select("o_orderkey", "o_totalprice")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]
    expect = src.filter(F.col("o_totalprice") > 1000).count()
    assert q.count() == expect


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution at scale: later files add columns; mergeSchema
    unions file schemas and older rows surface nulls (the reference's
    dynamic first-row schema, load_to_db.py:46-47, made declarative)."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.parquet(f"{base}/batch=1")
    spark.createDataFrame(
        [(2, "b", 0.5)], "id long, name string, score double"
    ).write.parquet(f"{base}/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(base)
    assert set(merged.columns) == {"id", "name", "score", "batch"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 0.5


def test_compact_parquet_small_files(spark, tmp_path):
    """Sink maintenance: many small per-batch files compact to the
    size-targeted count; values and hive partitioning survive."""
    from nagios_custom_etl_spark.operators.maintenance import compact_parquet, dir_stats

    src = str(tmp_path / "small")
    # simulate 40 micro-batch leftovers across 2 hive partitions
    for b in range(20):
        spark.createDataFrame(
            [(b * 10 + i, "x" * 200, "r1" if i % 2 else "r2") for i in range(10)],
            "id long, pad string, route string",
        ).repartition(2).write.mode("append").partitionBy("route").parquet(src)
    n_before, total = dir_stats(src)
    assert n_before >= 40
    dest = str(tmp_path / "compacted")
    n_after = compact_parquet(
        spark, src, dest, target_file_bytes=max(total, 1), preserve_partitioning=["route"]
    )
    assert n_after <= 2  # one file per hive partition at this target
    src_df = spark.read.parquet(src)
    dest_df = spark.read.parquet(dest)
    assert dest_df.count() == src_df.count() == 200
    assert sorted(r["id"] for r in dest_df.collect()) == sorted(
        r["id"] for r in src_df.collect()
    )
    # partition pruning still works on the compacted layout
    pruned = dest_df.filter("route = 'r1'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(route" in plan


def test_json_corrupt_record_quarantine(spark, tmp_path):
    """Schema-on-read resilience (the declarative form of the reference's
    expected-keys gate + error log, extract.py:95-99): malformed JSON
    rows land in a corrupt-record column for quarantine instead of
    failing the job or vanishing."""
    p = str(tmp_path / "events.jsonl")
    lines = [
        '{"event_id": 1, "v": 1.5}',
        '{"event_id": 2, "v": "not-a-number"}',  # type mismatch
        "{broken json",                            # unparseable
        '{"event_id": 4, "v": 4.0}',
    ]
    with open(p, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    df = (
        spark.read.schema("event_id long, v double, _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(p)
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt"] is None]
    quarantined = [r for r in rows if r["_corrupt"] is not None]
    assert {r["event_id"] for r in good} == {1, 4}
    assert len(quarantined) == 2  # both the type error and the parse error
    # FAILFAST is the strict gate when quarantine is not acceptable
    import pytest
    from py4j.protocol import Py4JJavaError  # noqa: F401

    strict = spark.read.schema("event_id long, v double").option("mode", "FAILFAST").json(p)
    with pytest.raises(Exception):
        strict.collect()


def test_zorder_write_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """zorder_write must produce files with (1) disjoint Z-ranges (the
    range-partition guarantee) and (2) bounded per-file spans in BOTH
    interleaved dimensions — the property that makes clustered files
    prunable on any clustered column. A linear sort on the first
    dimension is the contrast: its per-file span of the SECOND dimension
    is the full domain."""
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators.maintenance import zorder_key, zorder_write

    o = load_table(spark, sf_dir, "orders")
    day = F.datediff("o_orderdate", F.lit("1970-01-01").cast("date")).cast("long")
    dims = o.select(
        F.col("o_custkey").bitwiseAND(255).alias("a"), day.bitwiseAND(255).alias("b")
    )
    dest = str(tmp_path / "zordered")
    zorder_write(dims, dest, [F.col("a"), F.col("b")], bits=8, n_files=8)

    back = spark.read.parquet(dest)
    assert back.schema == dims.schema  # layout-only pass: schema-identical
    back = back.withColumn("_file", F.input_file_name()).withColumn(
        "_z", zorder_key([F.col("a"), F.col("b")], bits=8)  # recompute on read
    )
    per_file = (
        back.groupBy("_file")
        .agg(
            F.min("_z").alias("zlo"), F.max("_z").alias("zhi"),
            (F.max("a") - F.min("a")).alias("span_a"),
            (F.max("b") - F.min("b")).alias("span_b"),
        )
        .collect()
    )
    assert len(per_file) == 8
    # disjoint z ranges across files
    ranges = sorted((r["zlo"], r["zhi"]) for r in per_file)
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "overlapping Z-ranges between files"
    # both dimensions bounded well under the full 0..255 domain on average
    mean_a = sum(r["span_a"] for r in per_file) / len(per_file)
    mean_b = sum(r["span_b"] for r in per_file) / len(per_file)
    assert mean_a < 200 and mean_b < 200, (mean_a, mean_b)

    # contrast: linear sort on `a` leaves the b-dimension unclustered
    linear = str(tmp_path / "linear")
    dims.repartitionByRange(8, "a").sortWithinPartitions("a").write.mode(
        "overwrite"
    ).parquet(linear)
    lin_spans = (
        spark.read.parquet(linear)
        .withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg((F.max("b") - F.min("b")).alias("span_b"))
        .collect()
    )
    lin_mean_b = sum(r["span_b"] for r in lin_spans) / len(lin_spans)
    assert mean_b < lin_mean_b, (mean_b, lin_mean_b)


def test_zorder_key_rejects_sign_bit_overflow(spark):
    """ADVICE r5: bits * n_cols must fit in the 63 value bits of a signed
    LONG — 8 columns at bits=8 would place a bit at position 63 (the sign
    bit) and silently mis-sort. Both the Column and SQL forms guard."""
    import pytest as _pytest

    from nagios_custom_etl_spark.operators.maintenance import zorder_key, zorder_key_sql

    with _pytest.raises(ValueError, match="63 value bits"):
        zorder_key([f"c{i}" for i in range(8)], bits=8)
    with _pytest.raises(ValueError, match="63 value bits"):
        zorder_key_sql([f"c{i}" for i in range(8)], bits=8)
    # 7 cols x 9 bits = 63 is the widest legal key (top position 62)
    assert zorder_key_sql([f"c{i}" for i in range(7)], bits=9)


def test_file_stats_skipping_prunes_and_is_layout_invariant(spark, tmp_path):
    import datetime

    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators.maintenance import (
        file_stats_manifest,
        stats_pruned_read,
    )

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    li.repartitionByRange(8, "l_shipdate").sortWithinPartitions("l_shipdate").write.parquet(
        clustered
    )
    li.repartition(8).write.parquet(scattered)  # hash layout: ranges overlap

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 12, 31, 23, 59, 59)
    c_df, c_read, c_total = stats_pruned_read(spark, clustered, "l_shipdate", lo, hi)
    s_df, s_read, s_total = stats_pruned_read(spark, scattered, "l_shipdate", lo, hi)

    # clustered layout: the 1-year predicate must skip most of the 8 files
    assert c_total == 8 and c_read < c_total
    # scattered layout reads everything — but the ANSWER is identical
    assert s_read == s_total == 8
    expected = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in li.filter(
            (li.l_shipdate >= lo) & (li.l_shipdate <= hi)
        ).collect()
    )
    for df in (c_df, s_df):
        assert sorted((r.l_orderkey, r.l_linenumber) for r in df.collect()) == expected

    # manifest covers every file and every row exactly once
    manifest = file_stats_manifest(spark, clustered, "l_shipdate")
    assert len(manifest) == 8
    assert sum(r.n_rows for r in manifest) == li.count()


def test_file_stats_skipping_empty_intersection(spark, tmp_path):
    import datetime

    from nagios_custom_etl_spark.catalog import load_table
    from nagios_custom_etl_spark.operators.maintenance import stats_pruned_read

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path / "t")
    li.repartitionByRange(4, "l_shipdate").write.parquet(path)
    df, n_read, n_total = stats_pruned_read(
        spark, path, "l_shipdate", datetime.datetime(1950, 1, 1), datetime.datetime(1950, 12, 31)
    )
    # zero files scheduled, yet a correctly-typed empty result
    assert n_read == 0 and n_total == 4
    assert df.count() == 0
    assert df.schema == li.schema


def test_token_file_index_prunes_and_stays_exact(spark, tmp_path):
    """The posting list plans only files containing the token; the
    pruned answer equals the full scan; an absent token plans nothing."""
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.maintenance import (
        token_file_index,
        token_pruned_search,
    )

    rows = [(i, "common filler " + ("needle" if i in (3, 7) else "hay")) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "toks")
    df.withColumn("g", F.col("doc_id") % 4).repartition(4, "g").write.partitionBy(
        "g"
    ).parquet(path)
    idx = token_file_index(spark, path, "text")
    hit, n = token_pruned_search(spark, idx, "needle", "text")
    assert n == 1  # docs 3 and 7 share group 3 -> one file
    assert sorted(r.doc_id for r in hit.collect()) == [3, 7]
    # the common token plans every file and still answers exactly
    hit_all, n_all = token_pruned_search(spark, idx, "common", "text")
    assert n_all == 4 and hit_all.count() == 8
    # absent token: zero files planned, zero rows, no scan at all
    none, n0 = token_pruned_search(spark, idx, "zzabsent", "text")
    assert n0 == 0 and none.count() == 0


def test_token_pruned_search_refuses_stopword_width_postings(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.maintenance import (
        token_file_index,
        token_pruned_search,
    )

    df = spark.createDataFrame([(i, "common x") for i in range(4)], "doc_id long, text string")
    path = str(tmp_path / "wide")
    df.withColumn("g", F.col("doc_id")).repartition(4, "g").write.partitionBy("g").parquet(path)
    idx = token_file_index(spark, path, "text")
    with pytest.raises(ValueError, match="prunes nothing"):
        token_pruned_search(spark, idx, "common", "text", max_files=2)


def test_bloom_file_index_no_false_negatives_and_prunes(spark, tmp_path):
    """Every present key's file must be planned (blooms have no false
    negatives); a needle key placed in one file must plan far fewer
    than all files; the residual filter keeps the lookup exact."""
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.maintenance import (
        bloom_file_index,
        bloom_pruned_lookup,
    )

    path = str(tmp_path / "bloomtab")
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 16).alias("f")
    )
    df.repartition(16, "f").write.partitionBy("f").parquet(path)
    index = bloom_file_index(spark, path, "k", bits=8192, k=3)
    # needle 37 lives only in file f=5 (37 % 16)
    hit, planned = bloom_pruned_lookup(spark, index, 37, "k", bits=8192, k=3)
    assert [r.k for r in hit.collect()] == [37]
    assert 1 <= planned < 16  # no false negative, real pruning
    # absent key: planning may hit false positives but never wrong rows
    hit2, planned2 = bloom_pruned_lookup(spark, index, 999_999, "k", bits=8192, k=3)
    assert hit2.count() == 0 and planned2 < 16


def test_bloom_pruned_lookup_refuses_saturated_filter(spark, tmp_path):
    """A bloom sized far below the key cardinality saturates and plans
    everything — the lookup must refuse via max_files rather than scan
    the table pretending it pruned."""
    import pytest
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.maintenance import (
        bloom_file_index,
        bloom_pruned_lookup,
    )

    path = str(tmp_path / "satur")
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 8).alias("f")
    )
    df.repartition(8, "f").write.partitionBy("f").parquet(path)
    index = bloom_file_index(spark, path, "k", bits=32, k=3)  # hopeless m
    with pytest.raises(ValueError, match="saturated"):
        bloom_pruned_lookup(spark, index, 7, "k", bits=32, k=3, max_files=4)


def test_bloom_probe_bits_match_engine_hash(spark):
    """hashlib planning and the Spark md5 fold must agree — the
    portability the whole sidecar rests on."""
    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.operators.maintenance import (
        bloom_bit_expr,
        bloom_probe_bits,
    )

    vals = [0, 7, 12345, 999_999_999]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    got = {
        r.k: {(int(b) // 32, int(b) % 32) for b in (r.b0, r.b1, r.b2)}
        for r in df.select(
            "k", *[bloom_bit_expr(F.col("k"), j, 4096).alias(f"b{j}") for j in range(3)]
        ).collect()
    }
    for v in vals:
        assert got[v] == bloom_probe_bits(v, 4096, 3)

"""Hidden-partitioning transform tests (x112/x113): derived column
never reaches readers, the sidecar contract pins the transform, source
predicates prune through it, refusals on unprunable shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nagios_custom_etl_spark.operators import snapshots as S
from nagios_custom_etl_spark.operators import transforms as T


@pytest.fixture
def root(tmp_path):
    return str(tmp_path / "ttab")


def _ev(spark, lo, hi):
    return spark.createDataFrame(
        [Row(i=i, ts=f"2024-02-{(i % 9) + 1:02d} 10:00:00", v=float(i)) for i in range(lo, hi)],
        "i int, ts string, v double",
    ).select("i", F.col("ts").cast("timestamp").alias("ts"), "v")


def test_days_transform_hidden_and_prunes(spark, root):
    T.write_transformed(_ev(spark, 0, 40), root, T.days("ts"), mode="overwrite")
    T.write_transformed(_ev(spark, 40, 60), root, T.days("ts"), mode="append")
    full = S.read_snapshot(spark, root)
    assert set(full.columns) == {"i", "ts", "v"}  # derived column hidden
    assert full.count() == 60
    df, planned, total = T.read_pruned_source_range(
        spark, root, "2024-02-03", "2024-02-04"
    )
    # 9 distinct days x 2 commits = 18 files; 2 days x 2 commits planned
    assert (planned, total) == (4, 18)
    got = sorted(
        r.i for r in df.filter(F.to_date("ts").between("2024-02-03", "2024-02-04")).collect()
    )
    assert got == sorted(i for i in range(60) if (i % 9) + 1 in (3, 4))


def test_transform_sidecar_contract_refuses_mismatch(spark, root):
    T.write_transformed(_ev(spark, 0, 10), root, T.days("ts"), mode="overwrite")
    with pytest.raises(ValueError, match="transform mismatch"):
        T.write_transformed(_ev(spark, 10, 20), root, T.bucket("i", 4), mode="append")
    # same transform appends fine
    T.write_transformed(_ev(spark, 10, 20), root, T.days("ts"), mode="append")
    assert S.read_snapshot(spark, root).count() == 20


def test_bucket_transform_point_lookup_and_range_refusal(spark, root):
    df = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") * 2).alias("p"))
    T.write_transformed(df, root, T.bucket("k", 8), mode="overwrite")
    sub, planned, total = T.read_pruned_source_range(spark, root, 123, 123)
    assert total == 8 and planned == 1
    assert [r.p for r in sub.filter(F.col("k") == 123).collect()] == [246]
    with pytest.raises(ValueError, match="equality only"):
        T.read_pruned_source_range(spark, root, 1, 100)
    # bucket_of agrees with the engine-side fold for the planned file
    b = T.bucket_of(123, 8)
    m = S._read_manifest(spark, root, 1)
    assert any(f"_k_bucket={b}/" in f for f in m["files"])


def test_transform_source_column_missing_refused(spark, root):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="not in batch"):
        T.write_transformed(df, root, T.days("ts"), mode="overwrite")
    with pytest.raises(ValueError, match="n >= 2"):
        T.bucket("k", 1)


def test_spec_evolution_days_to_hours_mixed_plan(spark, root):
    """Partition-spec evolution: old files keep the days layout (never
    rewritten), new writes land at hour granularity, and one pruned
    read plans each file under the spec that wrote it."""
    T.write_transformed(_ev(spark, 0, 30), root, T.days("ts"), mode="overwrite")
    m_before = S._read_manifest(spark, root, S.latest_version(spark, root))
    old_files = set(m_before["files"])
    assert T.evolve_transform(spark, root, T.hours("ts")) == 1
    # writing with the superseded spec now refuses
    with pytest.raises(ValueError, match="evolve_transform"):
        T.write_transformed(_ev(spark, 30, 40), root, T.days("ts"), mode="append")
    T.write_transformed(_ev(spark, 30, 60), root, T.hours("ts"), mode="append")
    m_after = S._read_manifest(spark, root, S.latest_version(spark, root))
    assert old_files <= set(m_after["files"])  # old files never rewritten
    for f in old_files:
        assert m_after["stats"][f] == m_before["stats"][f]
    new_files = set(m_after["files"]) - old_files
    assert all("_ts_hours1=" in f for f in new_files)
    assert all("_ts_days=" in f for f in old_files)
    full = S.read_snapshot(spark, root)
    assert set(full.columns) == {"i", "ts", "v"}  # both pcols hidden
    assert full.count() == 60
    # mixed-spec pruning: day files at day granularity, hour files at
    # hour granularity — all rows live at 10:00, so [03 00:00, 04 09:59]
    # spans two DAY files but only ONE hour file (03-10; 04-10 is past
    # the range end, which day granularity cannot express)
    df, planned, total = T.read_pruned_source_range(
        spark, root, "2024-02-03 00:00:00", "2024-02-04 09:59:59"
    )
    assert total == len(m_after["files"])
    planned_old = {f for f in old_files if "_ts_days=2024-02-03" in f or "_ts_days=2024-02-04" in f}
    assert planned == len(planned_old) + 1  # + the 02-03-10 hour file
    # widening to cover 04 10:xx plans the second hour file too
    df2, planned2, _ = T.read_pruned_source_range(
        spark, root, "2024-02-03 00:00:00", "2024-02-04 10:59:59"
    )
    assert planned2 == planned + 1  # + the 02-04-10 hour file
    got = sorted(
        r.i
        for r in df2.filter(
            F.col("ts").between("2024-02-03 00:00:00", "2024-02-04 10:59:59")
        ).collect()
    )
    assert got == sorted(i for i in range(60) if (i % 9) + 1 in (3, 4))


def test_spec_evolution_bucket_widening(spark, root):
    """bucket(4) -> bucket(8): a point lookup prunes each era's files
    through its OWN bucket count."""
    df1 = spark.range(0, 200).select(F.col("id").alias("k"), (F.col("id") * 2).alias("p"))
    df2 = spark.range(200, 400).select(F.col("id").alias("k"), (F.col("id") * 2).alias("p"))
    T.write_transformed(df1, root, T.bucket("k", 4), mode="overwrite")
    assert T.evolve_transform(spark, root, T.bucket("k", 8)) == 1
    T.write_transformed(df2, root, T.bucket("k", 8), mode="append")
    sub, planned, total = T.read_pruned_source_range(spark, root, 123, 123)
    assert total == 12  # 4 old buckets + 8 new
    assert planned == 2  # one bucket from each era
    assert [r.p for r in sub.filter(F.col("k") == 123).collect()] == [246]
    m = S._read_manifest(spark, root, S.latest_version(spark, root))
    b4, b8 = T.bucket_of(123, 4), T.bucket_of(123, 8)
    assert any(f"_k_bucket={b4}/" in f for f in m["files"])
    assert any(f"_k_bucket1={b8}/" in f for f in m["files"])


def test_spec_evolution_refusals(spark, root):
    with pytest.raises(ValueError, match="no transform declared"):
        T.evolve_transform(spark, root, T.days("ts"))
    T.write_transformed(_ev(spark, 0, 10), root, T.days("ts"), mode="overwrite")
    with pytest.raises(ValueError, match="must change"):
        T.evolve_transform(spark, root, T.days("ts"))
    with pytest.raises(ValueError, match="unknown transform kind"):
        T.evolve_transform(spark, root, {"kind": "months", "source": "ts"})


def test_hours_prune_accepts_iso_t_bounds(spark, root):
    """ISO-8601 'T'-separated probe bounds must prune identically to
    space-separated ones. 'T' > '-' in byte order, so an un-normalized
    '2024-02-03T10' lower bound would sort ABOVE the genuine
    '2024-02-03-10' hour segment and wrongly exclude files holding
    matching rows — a superset-guarantee violation (r10 ADVICE)."""
    T.write_transformed(_ev(spark, 0, 30), root, T.hours("ts"), mode="overwrite")
    df_sp, planned_sp, total = T.read_pruned_source_range(
        spark, root, "2024-02-03 00:00:00", "2024-02-04 23:59:59"
    )
    df_t, planned_t, _ = T.read_pruned_source_range(
        spark, root, "2024-02-03T00:00:00", "2024-02-04T23:59:59"
    )
    assert planned_sp > 0  # the range genuinely holds files
    assert planned_t == planned_sp
    want = sorted(i for i in range(30) if (i % 9) + 1 in (3, 4))
    for df in (df_sp, df_t):
        got = sorted(
            r.i
            for r in df.filter(
                F.col("ts").between("2024-02-03 00:00:00", "2024-02-04 23:59:59")
            ).collect()
        )
        assert got == want
    # date-only bounds still expand to the day's full hour range
    _, planned_d, _ = T.read_pruned_source_range(
        spark, root, "2024-02-03", "2024-02-04"
    )
    assert planned_d == planned_sp

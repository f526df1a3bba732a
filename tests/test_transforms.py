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

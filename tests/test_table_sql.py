"""Tests for operators/table_sql.py — the regex-routed SQL mini-dialect
over the snapshot table layer (r12 verdict 'What's missing' item 4).

Pins the 1:1 routing onto the Python API (same results), the snapshot
view bridge into plain Spark SQL (version + tag forms), the mutation
statements' metrics results, and the refusal contract (unsupported
syntax raises with the grammar in the message — no silent guessing)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nagios_custom_etl_spark.operators import snapshots as S
from nagios_custom_etl_spark.operators.table_sql import table_sql


@pytest.fixture()
def root(tmp_path):
    p = str(tmp_path / "sqltable")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, v int")


def test_merge_into_history_partitions_views(spark, root):
    S.append(
        _df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]),
        root, partition_by="g", stats_cols=["k"],
    )
    S.create_tag(spark, root, "base")
    _df(spark, [(2, "a", 99), (4, "b", 40)]).createOrReplaceTempView("tsql_src")
    out = table_sql(
        spark,
        f"MERGE INTO '{root}' USING tsql_src ON k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * "
        "PRUNE ON k",
    )
    assert out.first()["version"] == 2
    # same result as the Python API would produce: source-wins upsert
    assert sorted(
        (r.k, r.v) for r in S.read_snapshot(spark, root).collect()
    ) == [(1, 10), (2, 99), (3, 30), (4, 40)]
    hist = table_sql(spark, f"DESCRIBE HISTORY '{root}'")
    assert [(r.version, r.op, r.n_rows) for r in hist.orderBy("version").collect()] == [
        (1, "append", 3),
        (2, "merge", 4),
    ]
    parts = table_sql(spark, f"SHOW PARTITIONS '{root}'")
    assert [(r.value, r.n_rows) for r in parts.orderBy("value").collect()] == [
        ("a", 2),
        ("b", 2),
    ]
    # snapshot views bridge into plain Spark SQL: version + tag forms
    table_sql(
        spark,
        f"create or replace temp view tsql_v1 as snapshot of '{root}' "
        "version as of 1",
    )  # keywords are case-insensitive
    assert spark.sql("SELECT SUM(v) AS s FROM tsql_v1").first()["s"] == 60
    table_sql(
        spark,
        f"CREATE OR REPLACE TEMP VIEW tsql_tag AS SNAPSHOT OF '{root}' TAG 'base'",
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM tsql_tag").first()["n"] == 3
    table_sql(
        spark, f"CREATE OR REPLACE TEMP VIEW tsql_cur AS SNAPSHOT OF '{root}'"
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM tsql_cur").first()["n"] == 4


def test_optimize_vacuum_and_refusals(spark, root):
    S.append(_df(spark, [(1, "a", 1)]).coalesce(1), root, stats_cols=["k", "v"])
    S.append(_df(spark, [(2, "a", 2)]).coalesce(1), root, stats_cols=["k", "v"])
    S.append(_df(spark, [(3, "a", 3)]).coalesce(1), root, stats_cols=["k", "v"])
    v = table_sql(spark, f"OPTIMIZE '{root}'").first()["version"]
    assert v == 4
    # no-op second optimize returns NULL version (compact's idempotence)
    assert table_sql(spark, f"OPTIMIZE '{root}'").first()["version"] is None
    # Z-order form routes through compact(cluster_by=)
    vz = table_sql(spark, f"OPTIMIZE '{root}' ZORDER BY (k, v)").first()["version"]
    assert vz == 5
    deleted = table_sql(spark, f"VACUUM '{root}' RETAIN 1 VERSIONS").first()[
        "files_deleted"
    ]
    assert deleted > 0
    assert S._manifest_versions(spark, root) == [5]
    assert sorted(r.k for r in S.read_snapshot(spark, root).collect()) == [1, 2, 3]
    # refusals: unsupported syntax names the supported grammar
    for bad in (
        "SELECT 1",
        f"MERGE INTO '{root}' USING v ON k WHEN MATCHED THEN DELETE",
        f"VACUUM '{root}'",
        f"DESCRIBE HISTORY {root}",  # unquoted root
    ):
        with pytest.raises(ValueError, match="supported grammar"):
            table_sql(spark, bad)

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


def test_dml_delete_update_conditional_merge_restore(spark, root):
    """r13 verdict task 5: the conditional DML forms — DELETE FROM /
    UPDATE ... SET / WHEN MATCHED AND <cond> / TIMESTAMP AS OF snapshot
    views / RESTORE — route 1:1 onto the Python API with Delta's
    semantics (predicate TRUE deletes, condition FALSE/NULL keeps the
    target row), and the still-unsupported grammar keeps refusing."""
    S.append(
        _df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)]),
        root, stats_cols=["k"],
    )
    ts1 = S._manifest_base_field(spark, root, 1, "committed_at")
    # DELETE FROM ... WHERE: file-pruned COW, metrics row = new version
    out = table_sql(spark, f"DELETE FROM '{root}' WHERE v > 25 AND g = 'b'")
    assert out.first()["version"] == 2
    assert sorted(r.k for r in S.read_snapshot(spark, root).collect()) == [1, 2]
    assert S._read_manifest(spark, root, 2)["op"] == "delete-where"
    # UPDATE ... SET (top-level comma split; expressions see columns)
    out = table_sql(
        spark, f"UPDATE '{root}' SET v = v + 100, g = upper(g) WHERE k = 2"
    )
    assert out.first()["version"] == 3
    got = sorted((r.k, r.g, r.v) for r in S.read_snapshot(spark, root).collect())
    assert got == [(1, "a", 10), (2, "A", 120)]
    # MERGE ... WHEN MATCHED AND <cond>: update only where s.v > t.v
    _df(spark, [(1, "z", 5), (2, "z", 999)]).createOrReplaceTempView("tsql_cond")
    table_sql(
        spark,
        f"MERGE INTO '{root}' USING tsql_cond ON k "
        "WHEN MATCHED AND s.v > t.v THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = sorted((r.k, r.g, r.v) for r in S.read_snapshot(spark, root).collect())
    assert got == [(1, "a", 10), (2, "z", 999)]  # k=1 kept (5 < 10)
    # TIMESTAMP AS OF bridges version_as_of into a temp view
    table_sql(
        spark,
        f"CREATE OR REPLACE TEMP VIEW tsql_ts AS SNAPSHOT OF '{root}' "
        f"TIMESTAMP AS OF {ts1}",
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM tsql_ts").first()["n"] == 4
    # RESTORE = rollback-as-commit: history is append-only
    out = table_sql(spark, f"RESTORE '{root}' TO VERSION AS OF 1")
    assert out.first()["version"] == 5
    assert sorted(r.k for r in S.read_snapshot(spark, root).collect()) == [
        1, 2, 3, 4,
    ]
    # still-unsupported grammar keeps refusing loudly
    for bad in (
        f"DELETE FROM '{root}'",  # no WHERE: full-table delete stays refused
        f"UPDATE '{root}' SET v = 1",  # no WHERE
        f"MERGE INTO '{root}' USING v ON k WHEN MATCHED THEN DELETE",
        f"RESTORE '{root}' TO TIMESTAMP AS OF 5",
    ):
        with pytest.raises(ValueError, match="supported grammar"):
            table_sql(spark, bad)
    # malformed SET parts refuse with their own message
    with pytest.raises(ValueError, match="malformed SET"):
        table_sql(spark, f"UPDATE '{root}' SET v WHERE k = 1")

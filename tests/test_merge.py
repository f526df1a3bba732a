"""Unit tests for operators/merge.py — MERGE routing and SCD2 semantics
on planted micro-tables (the registry queries x59/x60 are the
oracle-checked integration surface)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from nagios_custom_etl_spark.operators.merge import merge_upsert, scd2_apply


def _target(spark):
    return spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c"), Row(k=None, v="nullkey")],
        "k int, v string",
    )


def test_merge_all_four_routes(spark):
    source = spark.createDataFrame(
        [
            Row(k=1, v="A", op="U"),  # matched -> update
            Row(k=2, v=None, op="D"),  # matched -> delete
            Row(k=9, v="i", op="I"),  # not matched -> insert
        ],
        "k int, v string, op string",
    )
    out = merge_upsert(
        _target(spark),
        source,
        keys=["k"],
        when_matched_update={"v": F.col("s.v")},
        when_matched_delete=F.col("s.op") == "D",
    )
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: "A", 3: "c", 9: "i", None: "nullkey"}


def test_merge_null_keys_never_match(spark):
    # a NULL source key must not match the NULL target key (SQL MERGE
    # semantics): both survive as independent rows
    source = spark.createDataFrame([Row(k=None, v="ghost")], "k int, v string")
    out = merge_upsert(_target(spark), source, keys=["k"])
    vals = sorted(r.v for r in out.collect())
    assert vals == ["a", "b", "c", "ghost", "nullkey"]


def test_merge_insert_disabled(spark):
    source = spark.createDataFrame([Row(k=9, v="i")], "k int, v string")
    out = merge_upsert(_target(spark), source, keys=["k"], insert_not_matched=False)
    assert out.count() == 4  # target passes through, no insert


def test_merge_schema_is_target_schema(spark):
    source = spark.createDataFrame([Row(k=1, v="A", extra=7)], "k int, v string, extra int")
    out = merge_upsert(_target(spark), source, keys=["k"])
    assert out.columns == ["k", "v"]


def test_merge_no_cartesian_in_plan(spark):
    source = spark.createDataFrame([Row(k=1, v="A")], "k int, v string")
    out = merge_upsert(_target(spark), source, keys=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def _dim(spark):
    return spark.createDataFrame(
        [
            # key 1: one closed + one open version; key 2: open only
            Row(k=1, seg="OLD", valid_from="t0", valid_to="t1", is_current=False),
            Row(k=1, seg="A", valid_from="t1", valid_to=None, is_current=True),
            Row(k=2, seg="B", valid_from="t0", valid_to=None, is_current=True),
        ],
        "k int, seg string, valid_from string, valid_to string, is_current boolean",
    )


def test_scd2_change_close_open_and_insert(spark):
    updates = spark.createDataFrame(
        [Row(k=1, seg="A2"), Row(k=3, seg="C")], "k int, seg string"
    )
    out = scd2_apply(_dim(spark), updates, key="k", tracked=["seg"], effective_ts="t2")
    rows = sorted(
        ((r.k, r.seg, r.valid_from, r.valid_to, r.is_current) for r in out.collect())
    )
    assert rows == [
        (1, "A", "t1", "t2", False),  # old open version closed at t2
        (1, "A2", "t2", None, True),  # new open version
        (1, "OLD", "t0", "t1", False),  # history untouched
        (2, "B", "t0", None, True),  # untouched key passes through
        (3, "C", "t2", None, True),  # brand-new key
    ]


def test_scd2_idempotent_redelivery(spark):
    # re-delivering the current attribute values opens NO new version
    updates = spark.createDataFrame([Row(k=1, seg="A")], "k int, seg string")
    out = scd2_apply(_dim(spark), updates, key="k", tracked=["seg"], effective_ts="t2")
    assert sorted(out.collect(), key=lambda r: (r.k, r.valid_from)) == sorted(
        _dim(spark).collect(), key=lambda r: (r.k, r.valid_from)
    )


def test_scd2_null_safe_change_detection(spark):
    dim = spark.createDataFrame(
        [Row(k=1, seg=None, valid_from="t0", valid_to=None, is_current=True)],
        "k int, seg string, valid_from string, valid_to string, is_current boolean",
    )
    same = spark.createDataFrame([Row(k=1, seg=None)], "k int, seg string")
    out = scd2_apply(dim, same, key="k", tracked=["seg"], effective_ts="t1")
    assert out.count() == 1  # NULL == NULL under eqNullSafe: no version

    changed = spark.createDataFrame([Row(k=1, seg="X")], "k int, seg string")
    out2 = scd2_apply(dim, changed, key="k", tracked=["seg"], effective_ts="t1")
    assert out2.count() == 2  # NULL -> 'X' is a real change


def test_scd2_any_tracked_attribute_change_opens_version(spark):
    """With multiple tracked attributes, a change in ANY ONE of them
    must open a new version (OR semantics). Regression: the detector
    once ANDed per-column differences, silently dropping updates that
    changed only a subset of tracked columns."""
    dim = spark.createDataFrame(
        [Row(k=1, seg="A", tier="gold", valid_from="t0", valid_to=None, is_current=True)],
        "k int, seg string, tier string, valid_from string, valid_to string, is_current boolean",
    )
    # only ONE of the two tracked attributes changes
    upd = spark.createDataFrame([Row(k=1, seg="A", tier="silver")], "k int, seg string, tier string")
    out = scd2_apply(dim, upd, key="k", tracked=["seg", "tier"], effective_ts="t1")
    rows = sorted((r.seg, r.tier, r.valid_to, r.is_current) for r in out.collect())
    assert rows == [("A", "gold", "t1", False), ("A", "silver", None, True)]

    # both unchanged -> still idempotent under OR semantics
    same = spark.createDataFrame([Row(k=1, seg="A", tier="gold")], "k int, seg string, tier string")
    assert scd2_apply(dim, same, key="k", tracked=["seg", "tier"], effective_ts="t1").count() == 1


def test_scd2_rejects_unknown_update_column(spark):
    bad = spark.createDataFrame([Row(k=1, nope="x")], "k int, nope string")
    import pytest

    with pytest.raises(ValueError, match="nope"):
        scd2_apply(_dim(spark), bad, key="k", tracked=["seg"], effective_ts="t1")


def test_temporal_join_half_open_boundaries(spark):
    """A fact AT the version boundary belongs to the NEW version
    (half-open [valid_from, valid_to)); open versions catch everything
    after their start."""
    import datetime

    from nagios_custom_etl_spark.operators.merge import temporal_join

    t0 = datetime.datetime(2020, 1, 1)
    t1 = datetime.datetime(2021, 1, 1)
    dim = spark.createDataFrame(
        [Row(k=1, seg="v1", vf=t0, vt=t1), Row(k=1, seg="v2", vf=t1, vt=None)],
        "k int, seg string, vf timestamp, vt timestamp",
    )
    facts = spark.createDataFrame(
        [
            Row(fid=1, k=1, ts=t0),  # exactly at v1 start -> v1
            Row(fid=2, k=1, ts=t1 - datetime.timedelta(seconds=1)),  # -> v1
            Row(fid=3, k=1, ts=t1),  # exactly at the boundary -> v2
            Row(fid=4, k=1, ts=t1 + datetime.timedelta(days=400)),  # open -> v2
            Row(fid=5, k=1, ts=t0 - datetime.timedelta(seconds=1)),  # before history -> none
            Row(fid=6, k=2, ts=t1),  # unknown key -> none
        ],
        "fid int, k int, ts timestamp",
    )
    got = {
        r.fid: r.seg
        for r in temporal_join(facts, dim, "k", "k", "ts", "vf", "vt").collect()
    }
    assert got == {1: "v1", 2: "v1", 3: "v2", 4: "v2"}


def test_temporal_join_plan_is_equi_not_cartesian(spark):
    import datetime

    from nagios_custom_etl_spark.operators.merge import temporal_join

    t0 = datetime.datetime(2020, 1, 1)
    dim = spark.createDataFrame(
        [Row(k=i, seg="s", vf=t0, vt=None) for i in range(10)],
        "k int, seg string, vf timestamp, vt timestamp",
    )
    facts = spark.createDataFrame(
        [Row(fid=i, k=i % 10, ts=t0) for i in range(100)], "fid int, k int, ts timestamp"
    )
    plan = (
        temporal_join(facts, dim, "k", "k", "ts", "vf", "vt")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# --- incremental MV maintenance (x71) ----------------------------------------


def _mv_fixture(spark):
    from nagios_custom_etl_spark.operators.merge import mv_build

    base = spark.createDataFrame(
        [
            Row(k="a", v=1.5),
            Row(k="a", v=2.5),
            Row(k="b", v=10.0),
            Row(k=None, v=4.0),
        ]
    )
    return base, mv_build(base, ["k"], "n", {"sv": ("v", 18, 6)})


def test_mv_delta_insert_delete_matches_recompute(spark):
    from nagios_custom_etl_spark.operators.merge import mv_apply_delta, mv_build

    base, mv = _mv_fixture(spark)
    inserts = spark.createDataFrame([Row(k="a", v=3.0), Row(k="c", v=7.0)])
    deletes = spark.createDataFrame([Row(k="a", v=1.5)])
    got = mv_apply_delta(mv, inserts, deletes, ["k"], "n", {"sv": ("v", 18, 6)})
    final = base.exceptAll(deletes).unionByName(inserts)
    want = mv_build(final, ["k"], "n", {"sv": ("v", 18, 6)})
    def as_rows(df):
        return sorted(
            ((r.k, r.n, float(r.sv)) for r in df.collect()),
            key=lambda t: (t[0] is not None, t[0] or "", t[1:]),
        )

    assert as_rows(got) == as_rows(want)


def test_mv_delta_group_deleted_to_zero_disappears(spark):
    from nagios_custom_etl_spark.operators.merge import mv_apply_delta

    base, mv = _mv_fixture(spark)
    deletes = spark.createDataFrame([Row(k="b", v=10.0)])
    got = mv_apply_delta(mv, deletes.limit(0), deletes, ["k"], "n", {"sv": ("v", 18, 6)})
    assert "b" not in {r.k for r in got.collect()}


def test_mv_delta_null_key_group_maintained(spark):
    from nagios_custom_etl_spark.operators.merge import mv_apply_delta

    base, mv = _mv_fixture(spark)
    inserts = spark.createDataFrame([Row(k=None, v=6.0)], "k string, v double")
    got = mv_apply_delta(mv, inserts, inserts.limit(0), ["k"], "n", {"sv": ("v", 18, 6)})
    row = next(r for r in got.collect() if r.k is None)
    assert row.n == 2 and float(row.sv) == 10.0


def test_mv_delta_brand_new_group_inserted(spark):
    from nagios_custom_etl_spark.operators.merge import mv_apply_delta

    base, mv = _mv_fixture(spark)
    inserts = spark.createDataFrame([Row(k="z", v=1.0), Row(k="z", v=2.0)])
    got = mv_apply_delta(mv, inserts, inserts.limit(0), ["k"], "n", {"sv": ("v", 18, 6)})
    row = next(r for r in got.collect() if r.k == "z")
    assert row.n == 2 and float(row.sv) == 3.0


def test_ivm_join_apply_equals_recompute(spark):
    """Join-view IVM under random inserts+deletes on both sides must
    equal ivm_join_build over the final sides (the delta rule's
    correctness), including keys whose B row is replaced (update =
    delete + insert of the same id)."""
    import random

    from nagios_custom_etl_spark.operators.merge import (
        ivm_join_apply,
        ivm_join_build,
    )

    rnd = random.Random(41)
    a0 = [(i, rnd.randrange(20), f"a{i}") for i in range(200)]  # (aid, k, pay)
    b0 = [(k, f"b{k}") for k in range(20)]  # (k, pay) — row id IS the key
    a_ins = [(1000 + i, rnd.randrange(20), f"ai{i}") for i in range(40)]
    a_del = [r for r in a0 if r[0] % 9 == 0]
    b_ins = [(k, f"B{k}") for k in range(20, 25)] + [(7, "b7v2")]  # 7: replaced
    b_del = [(7, "b7")]
    A = spark.createDataFrame(a0, "aid long, k long, apay string")
    B = spark.createDataFrame(b0, "k long, bpay string")
    AI = spark.createDataFrame(a_ins, "aid long, k long, apay string")
    AD = spark.createDataFrame(a_del, "aid long, k long, apay string")
    BI = spark.createDataFrame(b_ins, "k long, bpay string")
    BD = spark.createDataFrame(b_del, "k long, bpay string")
    a_new = A.unionByName(AI).join(AD.select("aid"), "aid", "left_anti")
    b_new = B.unionByName(BI.filter("k >= 20")).join(
        BD.select("k"), "k", "left_anti"
    ).unionByName(BI.filter("k < 20"))
    view = ivm_join_build(A, B, ["k"])
    got = ivm_join_apply(
        view, a_new, b_new, AI, AD, BI, BD, on=["k"], a_id="aid", b_id="k"
    )
    exp = ivm_join_build(a_new, b_new, ["k"])
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert rows(got.select("k", "aid", "apay", "bpay")) == rows(
        exp.select("k", "aid", "apay", "bpay")
    )

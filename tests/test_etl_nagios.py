"""ETL-semantics tests on Nagios-shaped synthetic data (SURVEY §5.4,
FIXTURES.md §B): EP1 inventory explode, EP2 pivot + completeness gate +
cross-run dedup, EP3 status points, T5 routing."""

from __future__ import annotations

import pytest

from nagios_custom_etl_spark.etl.nagios import (
    HOSTGROUP_MEMBERS_SCHEMA,
    SERVICE_KEYS,
    cross_run_dedup_batch,
    extract_pipeline,
    host_inventory,
    normalize_customvars,
    route_metric_type,
    rrd_points_to_wide,
    status_points_pipeline,
)


@pytest.fixture(scope="module")
def members_json(spark):
    data = [
        {
            "hostgroup": [
                {
                    "hostgroup_name": "linux-servers",
                    "members": {"host": [{"host_name": "web01"}, {"host_name": "web02"}]},
                },
                {
                    "hostgroup_name": "windows-servers",
                    "members": {"host": [{"host_name": "win01"}]},
                },
                {
                    "hostgroup_name": "other",
                    "members": {"host": [{"host_name": "misc01"}]},
                },
            ]
        }
    ]
    return spark.createDataFrame(data, HOSTGROUP_MEMBERS_SCHEMA)


def test_ep1_host_inventory(members_json):
    rows = host_inventory(members_json, ("linux-servers", "windows-servers")).collect()
    got = {(r["host_name"], r["host_group"]) for r in rows}
    assert got == {
        ("web01", "linux-servers"),
        ("web02", "linux-servers"),
        ("win01", "windows-servers"),
    }


@pytest.fixture(scope="module")
def perf_raw(spark):
    rows = [
        # complete CPU point
        ("web01", "CPU Usage", 1700000000, ["42.5"]),
        # swap point with garbage value → completeness gate drops it
        ("web01", "Swap Usage", 1700000000, ["1.0", "NaN", "3.0"]),
        # complete swap point
        ("web01", "Swap Usage", 1700003600, ["1.0", "2.0", "3.0"]),
        # memory point with too-few values → nulls → dropped
        ("web01", "Memory Usage", 1700000000, ["1", "2", "3"]),
        # complete memory point
        ("web01", "Memory Usage", 1700003600, ["1", "2", "3", "4", "5"]),
        # host outside the selected groups
        ("misc01", "CPU Usage", 1700000000, ["9.9"]),
    ]
    return spark.createDataFrame(
        rows, "host_name string, service_name string, t long, v array<string>"
    )


def test_ep2_pivot_and_completeness_gate(perf_raw):
    wide = rrd_points_to_wide(perf_raw)
    assert set(wide) == set(SERVICE_KEYS)
    cpu = wide["CPU Usage"].collect()
    assert {r["host_name"] for r in cpu} == {"web01", "misc01"}
    assert all(r["percent_used"] is not None for r in cpu)
    swap = wide["Swap Usage"].collect()
    assert len(swap) == 1 and swap[0]["swap_total_GiB"] == 2.0  # NaN row dropped
    mem = wide["Memory Usage"].collect()
    assert len(mem) == 1 and mem[0]["memory_used_GiB"] == 5.0  # short row dropped
    # timestamps are reference-format strings
    assert swap[0]["timestamp"] == "2023-11-14 23:13:20"  # 1700003600 UTC


def test_ep2_full_pipeline_with_dedup(spark, perf_raw):
    hosts = spark.createDataFrame(
        [("web01", "linux-servers"), ("misc01", "other")],
        "host_name string, host_group string",
    )
    run1 = extract_pipeline(hosts, perf_raw)
    assert {r["host_name"] for r in run1["CPU Usage"].collect()} == {"web01"}  # misc01 filtered
    # second run re-delivers the same data → everything dedups away
    run2 = extract_pipeline(hosts, perf_raw, previous_wide=run1)
    assert all(df.count() == 0 for df in run2.values())


def test_cross_run_dedup_partial_overlap(spark):
    cur = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "k string, v int")
    prev = spark.createDataFrame([("a", 1), ("z", 9)], "k string, v int")
    out = {tuple(r) for r in cross_run_dedup_batch(cur, prev).collect()}
    assert out == {("b", 2), ("c", 3)}


def test_t5_route_metric_type(spark):
    df = spark.createDataFrame(
        [(s,) for s in SERVICE_KEYS] + [("Mystery Service",)], "service_name string"
    )
    got = {r["service_name"]: r["route"] for r in df.select("service_name", route_metric_type().alias("route")).collect()}
    assert got["CPU Usage"] == "cpu"
    assert got["Memory Usage"] == "memory"
    assert got["Swap Usage"] == "swap"
    assert all(got[f"Disk Usage {m}"] == "disk" for m in ("root", "tmp", "home"))
    assert got["Mystery Service"] == "unrouted"


@pytest.fixture(scope="module")
def status_inputs(spark):
    statuses = spark.createDataFrame(
        [
            ("web01", "HTTP", "0", "2024-01-01 10:00:00"),
            ("web01", "SSH", "2", "2024-01-01 10:00:00"),
            ("web02", "HTTP", None, "2024-01-01 10:00:00"),  # missing state → UNKNOWN
            ("web01", "DNS", "1", None),  # P5: null last_check dropped
            ("web01", "SMTP", "1", "not-a-date"),  # P6: unparseable dropped
            ("out01", "HTTP", "0", "2024-01-01 10:00:00"),  # not a member
        ],
        "host_name string, service_description string, current_state string, last_check string",
    )
    members = spark.createDataFrame(
        [("web01", "HTTP"), ("web01", "SSH"), ("web02", "HTTP"), ("web01", "DNS"), ("web01", "SMTP")],
        "host_name string, service_description string",
    )
    details_list_variant = spark.createDataFrame(
        [
            (
                "web01",
                "HTTP",
                "Web Frontend",
                [{"name": "FRIENDLYNAME", "value": "frontdoor"}, {"name": "CROWNJEWEL", "value": "yes"}],
            ),
        ],
        "host_name string, service_description string, display_name string, "
        "customvars array<struct<name string, value string>>",
    )
    return statuses, members, details_list_variant


def test_ep3_status_points(status_inputs):
    statuses, members, details = status_inputs
    points = status_points_pipeline(statuses, members, details).collect()
    by_key = {(r["tags"]["host_name"], r["tags"]["service_description"]): r for r in points}
    # P5/P6 rows and non-members dropped
    assert set(by_key) == {("web01", "HTTP"), ("web01", "SSH"), ("web02", "HTTP")}
    http = by_key[("web01", "HTTP")]
    assert http["fields"]["service_status"] == "OK"
    assert http["fields"]["service_status_numeric"] == 0
    assert http["tags"]["friendlyname"] == "frontdoor"
    assert http["tags"]["crownjewel"] == "yes"
    assert http["time"] == 1704103200  # 2024-01-01 10:00:00 UTC
    ssh = by_key[("web01", "SSH")]
    assert ssh["fields"]["service_status"] == "CRITICAL"
    assert ssh["tags"]["display_name"] == "unknown"  # joined-miss default
    unknown = by_key[("web02", "HTTP")]
    assert unknown["fields"]["service_status"] == "UNKNOWN"  # missing state default
    assert unknown["fields"]["service_status_numeric"] == 3


def test_customvars_map_variant_passthrough(spark):
    details_map = spark.createDataFrame(
        [("h", "s", "d", {"FRIENDLYNAME": "x"})],
        "host_name string, service_description string, display_name string, "
        "customvars map<string,string>",
    )
    out = normalize_customvars(details_map)
    assert dict(out.dtypes)["customvars"] == "map<string,string>"
    assert out.head()["customvars"]["FRIENDLYNAME"] == "x"

"""Planted edge-case tests for the event-analytics queries (x34–x39):
ordering and boundary semantics pinned on constructed event streams,
independent of the fixture data the oracles cover."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (event_id, user_id, type, minutes_after_base[, value])"""
    data = [
        (
            r[0],
            BASE + dt.timedelta(minutes=r[3]),
            r[1],
            r[2],
            float(r[4]) if len(r) > 4 else 1.0,
        )
        for r in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_funnel_requires_stage_order(spark):
    """A purchase BEFORE the user's first view must not convert; the
    funnel is ordered, not a bag-of-events co-occurrence."""
    ev = _events(
        spark,
        [
            # user 1: canonical view -> click -> purchase
            (1, 1, "view", 0),
            (2, 1, "click", 5),
            (3, 1, "purchase", 10),
            # user 2: purchase, THEN view + click — must not count as converted
            (4, 2, "purchase", 0),
            (5, 2, "view", 5),
            (6, 2, "click", 10),
            # user 3: view then click, no purchase
            (7, 3, "view", 0),
            (8, 3, "click", 1),
        ],
    )
    # drive the registered query's stage algebra on planted data
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t_view"))
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    assert {r["user_id"] for r in v.collect()} == {1, 2, 3}
    assert {r["user_id"] for r in c.collect()} == {1, 2, 3}
    assert {r["user_id"] for r in p.collect()} == {1}  # user 2's purchase precedes its click


def test_attribution_credits_only_within_window_and_before(spark):
    """Last-touch: a click AFTER the purchase never gets credit; a click
    exactly at the 1h boundary does; one microsecond past does not."""
    one_us = dt.timedelta(microseconds=1)
    data = [
        # user 1: click 30min before purchase -> attributed
        (1, BASE, 1, "click", 1.0),
        (2, BASE + dt.timedelta(minutes=30), 1, "purchase", 10.0),
        # user 2: click AFTER purchase only -> unattributed
        (3, BASE + dt.timedelta(minutes=5), 2, "purchase", 20.0),
        (4, BASE + dt.timedelta(minutes=6), 2, "click", 1.0),
        # user 3: click exactly 1h before -> attributed (<=)
        (5, BASE, 3, "click", 1.0),
        (6, BASE + dt.timedelta(hours=1), 3, "purchase", 40.0),
        # user 4: click 1h + 1µs before -> NOT attributed
        (7, BASE, 4, "click", 1.0),
        (8, BASE + dt.timedelta(hours=1) + one_us, 4, "purchase", 80.0),
    ]
    ev = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w)
    seq = ev.select("user_id", "ts", "event_type", "value", last_click.alias("last_click"))
    attributed = F.col("last_click").isNotNull() & (
        F.unix_micros("ts") - F.unix_micros("last_click") <= 3_600_000_000
    )
    got = {
        r["user_id"]: r["att"]
        for r in seq.filter(F.col("event_type") == "purchase")
        .select("user_id", attributed.alias("att"))
        .collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: False}


def test_rolling_7day_active_window_edges(spark):
    """A user active on day D counts active on D..D+6 inclusive and not
    on D+7; two users on the same day don't double-count."""
    ev = _events(
        spark,
        [
            (1, 1, "view", 0),  # day 0
            (2, 2, "view", 60),  # same day, different user
            (3, 1, "view", 9 * 24 * 60),  # user 1 again on day 9
        ],
    )
    user_days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    contrib = user_days.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"), "d"
    ).select("user_id", F.date_add("d", F.col("o")).alias("day"))
    got = {
        str(r["day"]): r["n"]
        for r in contrib.groupBy("day").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    # days 0-6: both users (no double count); day 7-8: nobody; days 9-15: user 1
    assert got["2024-01-01"] == 2 and got["2024-01-07"] == 2
    assert "2024-01-08" not in got and "2024-01-09" not in got
    assert got["2024-01-10"] == 1 and got["2024-01-16"] == 1


def test_x62_matches_builtin_regr_functions(spark):
    """The integer-sufficient-statistics OLS must agree with Spark's
    built-in regr_slope/regr_intercept/regr_r2 to float precision — the
    exact-int formulation exists only for cross-engine bit determinism."""
    from nagios_custom_etl_spark.plans.registry import all_queries

    fn = all_queries()["x62_trend_regression"].fn
    ours = {r.event_type: r for r in fn(spark, "/root/testdata/sf0.001").collect()}

    from nagios_custom_etl_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    x0 = daily.agg(F.min("d").alias("d0"))
    pts = daily.crossJoin(F.broadcast(x0)).select(
        "event_type", (F.col("d") - F.col("d0")).cast("double").alias("x"), "y"
    )
    builtin = {
        r.event_type: r
        for r in pts.groupBy("event_type")
        .agg(
            F.regr_slope("y", "x").alias("slope"),
            F.regr_intercept("y", "x").alias("intercept"),
            F.regr_r2("y", "x").alias("r2"),
        )
        .collect()
    }
    assert set(ours) == set(builtin) and len(ours) > 0
    for t in ours:
        assert abs(ours[t].slope - builtin[t].slope) < 1e-9
        assert abs(ours[t].intercept - builtin[t].intercept) < 1e-9
        assert abs(ours[t].r2 - builtin[t].r2) < 1e-9


def test_x65_quotas_sum_to_budget_exactly(spark):
    """Largest-remainder apportionment: integer quotas sum EXACTLY to
    the budget (the property float rounding cannot give), and every
    source with positive weight gets floor share or floor+1."""
    from nagios_custom_etl_spark.plans.registry import all_queries

    fn = all_queries()["x65_token_budget_apportionment"].fn
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.quota for r in rows) == 100000
    wsum = sum(r.weight for r in rows)
    for r in rows:
        base = (100000 * r.weight) // wsum
        assert r.quota in (base, base + 1)
        # the fill stops at the first doc crossing the quota: selected
        # chars reach the quota but never by more than one document
        assert r.chars_selected >= min(r.quota, r.weight)


def test_time_weighted_avg_closed_form(spark):
    """x98's operator shape on planted irregular samples: value 10 held
    for 3s then 40 for 1s -> TWAP (10*3 + 40*1)/4 = 17.5 regardless of
    the final observation's value (zero holding weight); a single-
    observation user (no span) is excluded."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(seconds=3), 40.0),
        (1, t0 + dt.timedelta(seconds=4), 999.0),  # last: zero weight
        (2, t0, 5.0),  # lone sample: no span, excluded
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    w = W.partitionBy("user_id").orderBy("ts")
    o = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("t_next"),
    )
    got = (
        o.groupBy("user_id")
        .agg(
            (F.max("t") - F.min("t")).alias("span"),
            (
                F.sum(F.col("v") * (F.col("t_next") - F.col("t"))).cast("double")
                / (F.max("t") - F.min("t")).cast("double")
            ).alias("twap"),
        )
        .filter(F.col("span") > 0)
        .collect()
    )
    assert len(got) == 1 and got[0].user_id == 1
    assert abs(got[0].twap - 17.5) < 1e-12

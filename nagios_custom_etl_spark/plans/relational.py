"""Relational core queries (SURVEY.md §2.3–§2.7) with DuckDB oracles.

Each query exercises one operator family from the SURVEY inventory on the
driver fixture tables. Scale notes accompany the non-obvious plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from nagios_custom_etl_spark.catalog import cache_once, load_table
from nagios_custom_etl_spark.functions.scalar import davg, dec, dsum
from nagios_custom_etl_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — SURVEY §7 Milestone 0.
# Exercises S8 parquet scan, P7 time-range predicate (pushed to the scan),
# hash aggregate with partial (map-side) combine, F1-style exact numeric
# semantics. At 100 TB this is a single scan + one shuffle on a 6-value
# grouping key; AQE coalesces the tiny post-agg partitions.
# ---------------------------------------------------------------------------

Q1_CUTOFF = "2000-09-02"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))
               * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Flagship pricing-summary aggregate (scan+filter+hash agg).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice")
    disc_price = price * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    charge = disc_price.cast("decimal(18,4)") * (F.lit(1).cast("decimal(12,2)") + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 12, 2).alias("sum_qty"),
            dsum("l_extendedprice", 12, 2).alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", 12, 2).alias("avg_qty"),
            davg("l_extendedprice", 12, 2).alias("avg_price"),
            davg("l_discount", 12, 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Filters / projections (SURVEY §2.3). All predicates are Catalyst-pushable
# into the parquet scan — at 100 TB these are scan-time row-group skips,
# not post-scan filters.
# ---------------------------------------------------------------------------


@register(
    "p1_p2_project_inlist",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
    doc="P1 projection + P2 IN-list filter (reference extract.py:140 shape).",
)
def p1_p2_project_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "p3_substring_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE contains(lower(p_name), 'widget') AND p_type = 'PROMO'
    """,
    doc="P3 case-normalized substring filter (reference load_to_db.py:36 shape).",
)
def p3_substring_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.lower(F.col("p_name")).contains("widget") & (F.col("p_type") == "PROMO"))
        .select("p_partkey", "p_name", "p_type")
    )


@register(
    "p5_p6_validity_filter",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE value IS NOT NULL
      AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
      AND event_id % 10 = 0
    """,
    doc="P5 not-null + P6 parse-validity filters + F13 JSON extraction "
    "(reference url_service_status_InfluxDB_insert.py:97-105).",
)
def p5_p6_validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    prop_k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.filter(F.col("value").isNotNull() & prop_k.isNotNull() & (F.col("event_id") % 10 == 0))
        .select("event_id", "event_type", prop_k.alias("prop_k"))
    )


@register(
    "p7_time_range_agg",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS month_total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1
    """,
    doc="P7 time-range predicate pushed to scan (reference extract.py:28-31) + monthly rollup.",
)
def p7_time_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 14, 2).alias("month_total"),
        )
        .orderBy("order_month")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4). Dimension sides are broadcast — no shuffle of the
# fact table; at 100 TB only genuinely large-large joins shuffle, on their
# keys, with AQE skew handling.
# ---------------------------------------------------------------------------


@register(
    "j1_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
    doc="J1 left semi join — set membership (reference url_...py:54,64).",
)
def j1_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")
    )


@register(
    "j2_left_broadcast_enrich",
    oracle="""
    SELECT o_orderkey,
           COALESCE(c.c_name, 'unknown') AS cust_name,
           COALESCE(c.c_mktsegment, 'unknown') AS segment
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
      ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey % 7 = 0
    """,
    doc="J2 broadcast left-outer enrichment with defaults "
    "(reference url_...py:71-95 dict-lookup join).",
)
def j2_left_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey",
        F.coalesce("c_name", F.lit("unknown")).alias("cust_name"),
        F.coalesce("c_mktsegment", F.lit("unknown")).alias("segment"),
    )


@register(
    "j3_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    """,
    doc="J3 anti join — the reference's cross-run dedup mechanism (extract.py:115-132).",
)
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "j4_cross_join",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    doc="J4 cross join — hosts × static services shape (reference extract.py:50,107-111).",
)
def j4_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@register(
    "j5_multiway_revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    doc="J5 multiway equi join (TPC-H Q5 shape): fact table joins broadcast dims.",
)
def j5_multiway_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer/nation/region are dimensions: broadcast, no fact shuffle
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5): hash agg, distinct, rollup/cube/grouping sets.
# ---------------------------------------------------------------------------


@register(
    "a1_count_by_group",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="A1 counts per group + conditional count (reference hosts_to_csv.py:21,37).",
)
def a1_count_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "a2_distinct_count",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="A2 exact distinct count per group (expand+two-phase agg in Spark).",
)
def a2_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "a3_approx_distinct",
    oracle="""
    -- the HLL++ sketch value itself is engine-specific, but its CONTRACT
    -- is not: |approx - exact| / exact <= 5*rsd (rsd=0.02 -> 0.1) is
    -- SQL-predictable as a constant TRUE, so the approximate path is
    -- hash-checked without hashing the sketch output (VERDICT r5 task 2)
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS approx_within_rsd
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="A2-approx: approx_count_distinct (HLL++) — the 100 TB-scale variant "
    "of a2. Emits the exact distinct count plus a within-5*rsd flag over "
    "the sketch estimate, so the oracle hash-checks the approximation "
    "contract itself (a wildly-off sketch flips the flag and the row).",
)
def a3_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("_approx") - F.col("exact_orders"))
                / F.col("exact_orders")
                <= 0.1
            ).alias("approx_within_rsd"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "a4_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="A-ext rollup: hierarchical subtotals (SURVEY §2.5 Ext).",
)
def a4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", 12, 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@register(
    "a5_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="A-ext cube: all grouping combinations (SURVEY §2.5 Ext).",
)
def a5_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


@register(
    "a6_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="A-ext grouping sets via the SQL surface (spark.sql == same Catalyst plan).",
)
def a6_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # engine-private view name: never clobber a caller-registered 'lineitem'
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_nces_lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM _nces_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


# ---------------------------------------------------------------------------
# Windows / sorts / limits (SURVEY §2.6 W1–W4). Window shuffles once on the
# partition key; the per-key sort is local. Top-k is TakeOrderedAndProject —
# no global sort materialization at scale.
# ---------------------------------------------------------------------------


@register(
    "w1_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 ORDER BY user_id
    """,
    doc="W1 latest-per-key (as-of): current status per service (reference README.md:9 intent).",
)
def w1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        )
        .orderBy("user_id")
    )


@register(
    "w2_status_change_detection",
    oracle="""
    SELECT user_id, event_id, prev_type, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ) WHERE prev_type IS NOT NULL AND prev_type <> event_type AND event_id % 5 = 0
    ORDER BY user_id, event_id
    """,
    doc="W2 lag-based status-change detection (state transitions per host/service).",
)
def w2_status_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
            & (F.col("event_id") % 5 == 0)
        )
        .select("user_id", "event_id", "prev_type", "event_type")
        .orderBy("user_id", "event_id")
    )


@register(
    "w3_rolling_avg",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rolling_avg
    FROM events
    WHERE user_id < 3
    ORDER BY user_id, event_id
    """,
    doc="W3 sliding-frame rolling average of a metric (SURVEY §2.6 W3).",
)
def w3_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 3)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return (
        ev.select(
            "user_id",
            "event_id",
            (F.sum(dec("value")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
                "rolling_avg"
            ),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "w4_topk",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    """,
    doc="W4 top-k: TakeOrderedAndProject — per-partition heap + merge, no global sort.",
)
def w4_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name", "c_acctbal").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    ).limit(10)


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7 SO1–SO3).
# ---------------------------------------------------------------------------


@register(
    "so1_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    """,
    doc="SO1 bag difference — the reference's current−last dedup shape (extract.py:119,127).",
)
def so1_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1996-01-01").cast("timestamp")
    early = o.filter(F.col("o_orderdate") < cutoff).select("o_custkey")
    late = o.filter(F.col("o_orderdate") >= cutoff).select("o_custkey")
    return early.exceptAll(late)


@register(
    "so2_union_distinct",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    doc="SO2 union (reference extract.py:111,153 extend) + distinct.",
)
def so2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.unionByName(o).distinct()


@register(
    "so3_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    doc="SO3 set intersection (membership-key mechanics of J1).",
)
def so3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(low)


@register(
    "a7_percentiles",
    oracle="""
    SELECT c_mktsegment,
           quantile_cont(c_acctbal, 0.5) AS median_bal,
           quantile_cont(c_acctbal, 0.9) AS p90_bal,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="A-ext exact percentiles (interpolated), min/max per group "
    "(SURVEY §2.5 Ext; approx variant in a3/a8).",
)
def a7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.percentile("c_acctbal", 0.5).alias("median_bal"),
            F.percentile("c_acctbal", 0.9).alias("p90_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "a8_approx_percentile",
    oracle="""
    -- the GK-sketch median is engine-specific, but its contract is not:
    -- accuracy=1000 bounds the rank error at n/1000, which on this price
    -- distribution keeps the value within 5% relative of the exact
    -- interpolated median — SQL-predictable as TRUE (VERDICT r5 task 2).
    -- The rank-error -> value-error step assumes a non-degenerate value
    -- distribution (behavioral property of the generator, not a pinned
    -- threshold: a 0.1% rank shift moving the median 5% would need a
    -- near-discontinuous price distribution).
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS exact_median_price,
           TRUE AS approx_within_eps
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="A-ext approx_percentile — the sketch path for 100 TB where exact "
    "percentile's full sort is not worth it. Emits the exact interpolated "
    "median plus a within-5%-relative flag over the sketch estimate, so "
    "the oracle hash-checks the approximation contract itself.",
)
def a8_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.5).alias("exact_median_price"),
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_median_price",
            (
                F.abs(F.col("_approx") - F.col("exact_median_price"))
                / F.col("exact_median_price")
                <= 0.05
            ).alias("approx_within_eps"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "w5_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2)))
                  OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL '30 minutes' PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_30m
    FROM events WHERE user_id < 3
    ORDER BY user_id, event_id
    """,
    doc="W3-range: time-range window frame (trailing 30 minutes per key) — "
    "rangeBetween on epoch seconds in Spark, RANGE INTERVAL in the oracle.",
)
def w5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 3)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts") + F.unix_micros("ts") % 1_000_000 / 1_000_000.0)
        .rangeBetween(-1800, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value")).over(w).cast("double").alias("sum_30m"),
    ).orderBy("user_id", "event_id")


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter -> two-hop join -> grouped "
    "revenue -> top-k. Customer is broadcast; only lineitem⋈orders shuffles.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    """,
    doc="TPC-H Q18 shape: aggregate-derived semi join (HAVING subquery -> "
    "left_semi on the fact key) feeding a grouped join.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both lineitem legs (HAVING aggregate + join probe) hash on
    # l_orderkey: one explicit keyed repartition lets the planner reuse a
    # single scan+exchange for both (CollapseRepartition folds the
    # catalog's starvation spread into this), instead of scanning and
    # round-robin-shuffling the fact twice.
    li = load_table(spark, sf_dir, "lineitem").repartition(F.col("l_orderkey"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > F.lit(150).cast("decimal(12,2)"))
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(dsum("l_quantity", 12, 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
    )


@register(
    "q22_dormant_high_balance",
    oracle="""
    -- TPC-H Q22 shape: scalar subquery threshold + anti join
    SELECT c_mktsegment,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: scalar-subquery threshold (above-average balance) "
    "+ anti join (no recent orders) + grouped rollup. The scalar avg is "
    "computed in double on both engines from the same rows — identical.",
)
def q22_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # scalar subquery: tiny aggregate, evaluated once and folded into the
    # filter (Spark runs it as a subquery broadcast — no driver collect
    # needed; here we inline via crossJoin of the 1-row aggregate)
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal", 12, 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "t7_unpivot",
    oracle="""
    -- wide -> long (the inverse of T2): one row per (key, metric, value)
    SELECT p_partkey, metric, val FROM (
      SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
      FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DECIMAL(12,2))::DOUBLE
      FROM part
    ) WHERE p_partkey % 10 = 0
    ORDER BY p_partkey, metric
    """,
    doc="T2-inverse unpivot (wide metric columns -> long (key, metric, "
    "value)) via stack() — the internal long form of SURVEY §1.3(b).",
)
def t7_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    return (
        p.select(
            "p_partkey",
            F.expr(
                "stack(2, 'p_size', CAST(p_size AS DOUBLE), "
                "'p_retailprice', CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE)) "
                "AS (metric, val)"
            ),
        )
        .orderBy("p_partkey", "metric")
    )


@register(
    "w6_ntile_percent_rank",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS bal_quartile,
           round(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey), 6) AS bal_pct_rank
    FROM customer ORDER BY c_custkey
    """,
    doc="W2-ext analytic functions: ntile quartiles + percent_rank over a "
    "deterministic total order.",
)
def w6_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("bal_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
    ).orderBy("c_custkey")


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan-filter-aggregate — every predicate "
    "reaches the parquet scan; no shuffle except the 1-row final agg.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(12,2)))
                    ELSE 0 END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        * 100 AS promo_share_pct,
      COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-07-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional (CASE) aggregation over a broadcast "
    "dimension join — promo revenue share.",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    zero = F.lit(0).cast("decimal(25,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double")
                * 100
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    -- TPC-H Q19 shape: OR-of-ANDs across join sides
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1  AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#21' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#3'  AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-column predicates spanning the "
    "join — single-side conjuncts are pushed below the join by Catalyst.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#21") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Correlated-subquery shapes (SURVEY §2.13: "Spark builtins cover 100%").
# Each is written as the decorrelated DataFrame plan Catalyst would produce
# from the SQL form: EXISTS -> left semi, NOT EXISTS/NOT IN -> left anti,
# correlated scalar agg -> grouped agg + equi join. At 100 TB the grouped
# side is orders-of-magnitude smaller than the fact scan, so the rejoin is
# broadcast where the key domain is small (part/supplier) and a shuffled
# hash join on the fact key otherwise.
# ---------------------------------------------------------------------------


@register(
    "q4_exists_order_priority",
    oracle="""
    -- TPC-H Q4 shape: EXISTS correlated subquery with non-equi conjunct
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '2000-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS with a non-equi correlated conjunct -> left "
    "semi join on the order key with the l_shipdate > o_orderdate residual.",
)
def q4_exists_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q11_supplier_revenue_share",
    oracle="""
    -- TPC-H Q11 shape: HAVING against a global scalar subquery — keep
    -- suppliers whose revenue exceeds 1.05x the average supplier share
    -- (SF-invariant: selects ~15% of suppliers at every fixture scale,
    -- where a fixed 5%-of-total cutoff goes vacuously empty past 20
    -- suppliers). Threshold comparison kept in exact DECIMAL, so the
    -- boundary cannot flip on double association order.
    WITH sup_rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS rev
      FROM lineitem GROUP BY l_suppkey)
    SELECT l_suppkey, CAST(rev AS DOUBLE) AS revenue
    FROM sup_rev
    WHERE rev * (SELECT COUNT(*) FROM sup_rev)
          > CAST(1.05 AS DECIMAL(3,2)) * (SELECT SUM(rev) FROM sup_rev)
    ORDER BY l_suppkey
    """,
    doc="TPC-H Q11 shape: per-key aggregate filtered by share of the global "
    "total (scalar subquery). One shuffle on l_suppkey; the global "
    "(total, count) is a broadcast single-row cross join over the "
    "already-aggregated rows.",
)
def q11_supplier_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev_expr = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    sup_rev = li.groupBy("l_suppkey").agg(F.sum(rev_expr).alias("rev"))
    total = sup_rev.agg(
        F.sum("rev").alias("total_rev"), F.count(F.lit(1)).alias("n_sup")
    )
    return (
        sup_rev.join(F.broadcast(total))
        .filter(
            F.col("rev") * F.col("n_sup")
            > F.lit("1.05").cast("decimal(3,2)") * F.col("total_rev")
        )
        .select("l_suppkey", F.col("rev").cast("double").alias("revenue"))
        .orderBy("l_suppkey")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    -- TPC-H Q13 shape: left outer join with ON-clause filter, two-level agg
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) t
    GROUP BY c_count ORDER BY c_count
    """,
    doc="TPC-H Q13 shape: outer join preserving customers with zero orders "
    "(COUNT(col) skips the null-extended rows), then a distribution over "
    "the per-customer counts. Two shuffles (c_custkey, then c_count) — the "
    "second input is one row per customer, tiny relative to the fact scan.",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist")).orderBy("c_count")


@register(
    "q15_top_supplier",
    oracle="""
    -- TPC-H Q15 shape: aggregated CTE reused by a scalar-max subquery
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '2000-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: max-over-aggregate selection. The revenue CTE is "
    "cached (used by both the max and the join); the scalar max joins back "
    "as a broadcast single row; equality is on exact DECIMAL.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev_expr = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev_expr).alias("total_rev"))
    )
    revenue = cache_once(revenue)
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_cnt_notin",
    oracle="""
    -- TPC-H Q16 shape: NOT IN subquery + grouped COUNT(DISTINCT)
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type ORDER BY p_brand, p_type
    """,
    doc="TPC-H Q16 shape: NOT IN -> left anti against the (non-null-key) "
    "excluded-supplier set, broadcast both the exclusion list and part dim, "
    "then grouped distinct count (two-phase partial-distinct aggregate).",
)
def q16_supplier_cnt_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad_sup = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_sup), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy("p_brand", "p_type")
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
    -- TPC-H Q21 shape: EXISTS + correlated NOT EXISTS on the same fact
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name ORDER BY s_name
    """,
    doc="TPC-H Q21 shape: the supplier who was the *only* late shipper on a "
    "multi-supplier order. EXISTS -> left semi, NOT EXISTS -> left anti, "
    "both on l_orderkey with supplier-inequality residuals; the anti side's "
    "correlation on o_orderdate rides along on the probe row.",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    # NOTE: do NOT cache() the fact table — the cache is plan-keyed, so it
    # would hijack every later lineitem scan in the session (killing parquet
    # pushdown), and a full-fact cache is unpayable at 100 TB. The three
    # lineitem legs all hash on l_orderkey, so one explicit keyed
    # repartition lets the planner reuse a single scan+exchange for all of
    # them (see q18).
    li = load_table(spark, sf_dir, "lineitem").repartition(F.col("l_orderkey"))
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late_cutoff = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > late_cutoff)
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"), F.col("l_shipdate").alias("d3")
    )
    sole_late = (
        l1.join(l2, (l1.l_orderkey == F.col("k2")) & (l1.l_suppkey != F.col("s2")), "left_semi")
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3"))
            & (F.col("d3") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(s), sole_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy("s_name")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    -- TPC-H Q17 shape: correlated scalar AVG subquery per part.
    -- The per-part threshold is DECIMAL-sum / count (deterministic on both
    -- engines), not a double AVG whose association order could differ.
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2'
      AND 5 * CAST(l_quantity AS DECIMAL(12,2))
          < (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
             FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
            / (SELECT COUNT(*) FROM lineitem l3 WHERE l3.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: below-one-fifth-of-part-average filter. "
    "Decorrelated: per-part decimal sum+count aggregate joined back on "
    "l_partkey; the 1/5 threshold is exact (5*qty < sum/cnt as DECIMAL).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both legs (per-part aggregate + probe) hash on l_partkey — one keyed
    # repartition, one shared scan+exchange (see q18)
    li = load_table(spark, sf_dir, "lineitem").repartition(F.col("l_partkey"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(dec("l_quantity")).cast("decimal(18,2)").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"),
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("agg_partkey"))
        .filter(F.lit(5) * dec("l_quantity") < F.col("sum_qty") / F.col("cnt_qty"))
        .agg(
            (dsum("l_extendedprice", 12, 2) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )

# ---------------------------------------------------------------------------
# Multi-hop star-join shapes (TPC-H Q5/Q7/Q8/Q10/Q12 adapted to the fixture
# schema — no partsupp/shipmode columns exist, see FIXTURES.md). At 100 TB
# the dimension chain nation⋈region (and supplier/customer/part after their
# selective filters) broadcasts; only the lineitem⋈orders hop shuffles, on
# the orderkey both sides already share. Reference grounding: these extend
# the hash-lookup enrich joins of url_service_status_InfluxDB_insert.py:54-73
# to multi-hop form (SURVEY §2.4 J5).
# ---------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: 6-table star join with a same-nation residual "
    "(c_nationkey = s_nationkey) and region filter. All dims broadcast; "
    "the only shuffle is lineitem⋈orders on orderkey.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey = o_custkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bi-directional nation-pair trade volume. The "
    "disjunctive nation-pair predicate lands after both broadcast nation "
    "joins; the shipdate range is pushed into the lineitem scan.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS volume,
             n2.n_name AS supp_nation
      FROM part
        JOIN lineitem  ON p_partkey = l_partkey
        JOIN supplier  ON s_suppkey = l_suppkey
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's share of regional market volume per "
    "year. 8-table star; conditional decimal sum over the supplier-nation "
    "flag; exact DECIMAL sums cast to DOUBLE only for the final ratio.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = (
        dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    ).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            F.col("supp_nation"),
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(zero))
                .cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           c_acctbal, n_name, c_mktsegment
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by lost (returned) revenue in a "
    "quarter. Returnflag + date predicates push into the scans; customer "
    "and nation broadcast; TakeOrderedAndProject caps the sort at k=20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > o_orderdate
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="TPC-H Q12 shape (shipmode column absent -> linestatus): priority "
    "class counts over a year of shipments, with a non-equi residual "
    "(l_shipdate > o_orderdate) evaluated post-join. Conditional counts "
    "stay in codegen'd long arithmetic.",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q20_part_share_suppliers",
    oracle="""
    -- TPC-H Q20 shape (no partsupp in the fixture: availqty replaced by a
    -- two-level aggregate share test). Suppliers in two nations that
    -- shipped >20% of some red part's total 2000H2-2001H1 volume.
    -- Threshold exact in DECIMAL (5*qty_sp > qty_p).
    WITH li AS (
      SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(12,2)) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-07-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '2001-07-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    ),
    per_sp AS (SELECT l_partkey, l_suppkey, SUM(qty) AS qty_sp FROM li GROUP BY 1, 2),
    per_p  AS (SELECT l_partkey, SUM(qty) AS qty_p FROM li GROUP BY 1),
    cand AS (
      SELECT DISTINCT l_suppkey
      FROM per_sp JOIN per_p USING (l_partkey)
      WHERE 5 * qty_sp > qty_p
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_7')
      AND s_suppkey IN (SELECT l_suppkey FROM cand)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q20 shape: nested IN-subquery chain decorrelated to semi "
    "joins. The part filter becomes a broadcast semi join pushed below "
    "the fact scan; both aggregation levels (part x supplier, part) "
    "share ONE exchange — a single repartition on l_partkey satisfies "
    "the (l_partkey, l_suppkey) grouping too, so the two-level share "
    "test adds no extra fact shuffle; the candidate supplier set semi "
    "joins (broadcast) into the nation-filtered supplier dim.",
)
def q20_part_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("2000-07-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2001-07-01").cast("timestamp"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_partkey", "l_suppkey", dec("l_quantity").alias("qty"))
        .repartition(F.col("l_partkey"))  # one exchange serves both agg levels
    )
    per_sp = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("qty").alias("qty_sp"))
    per_p = li.groupBy("l_partkey").agg(F.sum("qty").alias("qty_p"))
    cand = (
        per_sp.join(per_p, "l_partkey")
        .filter(F.lit(5) * F.col("qty_sp") > F.col("qty_p"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "inner")
        .join(F.broadcast(cand), s.s_suppkey == cand.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q9 shapes — the last two of the 22 classic shapes, adapted to
# the fixture schema (no partsupp table, FIXTURES.md): the part×supplier
# cost relation `ps` is derived from lineitem as MIN(l_extendedprice) per
# (l_partkey, l_suppkey). MIN over doubles is order-insensitive, so the
# derivation is engine-exact without decimal casts. Reference grounding:
# generalizes the hash-lookup enrich joins of
# url_service_status_InfluxDB_insert.py:54-73 (SURVEY §2.4 J5).
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
    -- TPC-H Q2 shape: correlated scalar-MIN subquery per part over the
    -- region-restricted cost relation.
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
    FROM part
      JOIN ps       ON p_partkey = ps_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size <= 15 AND p_type = 'SMALL' AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
    doc="TPC-H Q2 shape: cheapest-regional-supplier-per-part. Decorrelated "
    "in Spark: one per-(part,supplier) MIN aggregate over lineitem, the "
    "EUROPE supplier→nation→region chain broadcast into it, then a per-part "
    "MIN joined back on (partkey, cost-equality). Both the candidate rows "
    "and the per-part minimum hash on ps_partkey — a single keyed "
    "repartition serves both legs (ReusedExchange), so the fact is "
    "shuffled once at any scale.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sup_eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min("l_extendedprice").alias("ps_supplycost"))
        .join(F.broadcast(sup_eu), F.col("ps_suppkey") == F.col("s_suppkey"))
        .repartition(F.col("ps_partkey"))  # one exchange serves both legs
    )
    min_ps = ps.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("min_cost"))
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL")
    )
    return (
        ps.join(min_ps, "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


@register(
    "q9_product_type_profit",
    oracle="""
    -- TPC-H Q9 shape: per-nation per-year profit. Unit cost proxy is 10%
    -- of p_retailprice (no ps_supplycost in the fixture) — exact DECIMAL
    -- scaling so both engines sum identical exact values.
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(
             CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(28,5))
             - CAST(CAST(CAST(p_retailprice AS DECIMAL(12,2))
                         * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(18,4))
                    * CAST(0.1 AS DECIMAL(2,1)) AS DECIMAL(28,5))
           ) AS DOUBLE) AS sum_profit
    FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN orders   ON o_orderkey = l_orderkey
    WHERE contains(p_name, 'gear')
    GROUP BY n_name, year(o_orderdate)
    ORDER BY n_name, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit = disc. revenue − cost, by supplier nation "
    "and order year. part (substring-filtered), supplier and nation all "
    "broadcast; the only shuffle is lineitem⋈orders on the orderkey, then "
    "a 2-level-key hash agg. The p_name filter semi-prunes the fact via "
    "the broadcast join before the orders shuffle.",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    disc_rev = (
        dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    ).cast("decimal(28,5)")
    cost = (
        (dec("p_retailprice") * dec("l_quantity")).cast("decimal(18,4)")
        * F.lit("0.1").cast("decimal(2,1)")
    ).cast("decimal(28,5)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(disc_rev - cost).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )

"""Scalar function layer + ETL restructuring queries (SURVEY §2.8, §2.10)
with DuckDB oracles, plus composite queries re-creating the reference's
pipeline shapes (SURVEY §3) on the fixture tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import load_table
from nagios_custom_etl_spark.functions.scalar import (
    canonical_row_hash,
    categorical_decode,
    dsum,
    epoch_to_datetime_str,
    map_get_default,
    numeric_normalize,
)
from nagios_custom_etl_spark.plans.registry import register

# ---------------------------------------------------------------------------
# F-family scalar functions (SURVEY §2.8)
# ---------------------------------------------------------------------------


@register(
    "f1_numeric_normalize",
    oracle="""
    SELECT doc_id,
           round_even(n_chars / 7.0, 2) AS chars_per_word_ish,
           CAST(NULL AS DOUBLE) AS bad_cast
    FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id
    """,
    doc="F1 numeric normalize (reference extract.py:53-61): cast→double, "
    "NaN/non-numeric→null, half-even round to 2dp (bround ≡ %.2f).",
)
def f1_numeric_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return d.select(
        "doc_id",
        numeric_normalize(F.col("n_chars") / 7.0).alias("chars_per_word_ish"),
        # non-numeric string → null (the reference's try/except ValueError)
        numeric_normalize(F.col("lang")).alias("bad_cast"),
    ).orderBy("doc_id")


@register(
    "f2_f3_epoch_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           strftime(make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS dt2_str
    FROM events WHERE event_id % 10 = 3 ORDER BY event_id
    """,
    doc="F2+F3 epoch↔'%Y-%m-%d %H:%M:%S' conversions "
    "(reference extract.py:64-67, url_...py:102). Session TZ pinned UTC.",
)
def f2_f3_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 3)
    epoch_s = F.unix_timestamp("ts")
    return ev.select(
        "event_id",
        epoch_s.alias("epoch_s"),
        epoch_to_datetime_str(epoch_s).alias("dt2_str"),
    ).orderBy("event_id")


@register(
    "f6_f7_decode_encode",
    oracle="""
    SELECT event_id,
           CASE event_type WHEN 'error' THEN 2 WHEN 'purchase' THEN 1 ELSE -1 END AS severity,
           CASE CASE event_type WHEN 'error' THEN 2 WHEN 'purchase' THEN 1 ELSE -1 END
                WHEN 0 THEN 'OK' WHEN 1 THEN 'WARNING' WHEN 2 THEN 'CRITICAL'
                ELSE 'UNKNOWN' END AS severity_label
    FROM events WHERE event_id % 10 = 7 ORDER BY event_id
    """,
    doc="F6/F7 categorical decode/encode with defaults "
    "(reference url_...py:26-37: code↔label maps, default UNKNOWN/-1).",
)
def f6_f7_decode_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 7)
    severity = categorical_decode("event_type", {"error": 2, "purchase": 1}, -1)
    label = categorical_decode(severity, {0: "OK", 1: "WARNING", 2: "CRITICAL"}, "UNKNOWN")
    return ev.select(
        "event_id", severity.alias("severity"), label.alias("severity_label")
    ).orderBy("event_id")


@register(
    "f10_array_unpack",
    oracle="""
    SELECT vec_id,
           CASE WHEN length(embedding) >= 3 THEN embedding[1]::DOUBLE END AS dim0,
           CASE WHEN length(embedding) >= 3 THEN embedding[2]::DOUBLE END AS dim1,
           CASE WHEN length(embedding) >= 3 THEN embedding[3]::DOUBLE END AS dim2
    FROM embeddings WHERE vec_id % 20 = 0 ORDER BY vec_id
    """,
    doc="F10/T2 array positional unpack → named columns with size guard "
    "(reference extract.py:86-93 zip(service_keys, point['v'])).",
)
def f10_array_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 20 == 0)
    guard = F.size("embedding") >= 3
    cols = [
        F.when(guard, F.get("embedding", i).cast("double")).alias(f"dim{i}")
        for i in range(3)
    ]
    return em.select("vec_id", *cols).orderBy("vec_id")


@register(
    "f11_f12_map_lookup_default",
    oracle="""
    SELECT event_id,
           COALESCE(json_extract_string(props, '$.k'), 'unknown') AS k_val,
           COALESCE(json_extract_string(props, '$.FRIENDLYNAME'), 'unknown') AS friendly
    FROM events WHERE event_id % 10 = 1 ORDER BY event_id
    """,
    doc="F11 variant→map normalization + F12 map lookup with default "
    "(reference url_...py:89-95 customvars.get(..., 'unknown')).",
)
def f11_f12_map_lookup_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 1)
    props_map = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        map_get_default(props_map, "k", "unknown").alias("k_val"),
        map_get_default(props_map, "FRIENDLYNAME", "unknown").alias("friendly"),
    ).orderBy("event_id")


@register(
    "f14_canonical_row_hash",
    oracle="""
    SELECT doc_id,
           sha256(concat_ws('|', CAST(doc_id AS VARCHAR), lang, source)) AS row_hash
    FROM documents WHERE doc_id % 25 = 7 ORDER BY doc_id
    """,
    doc="F14/T4 canonical row identity hash "
    "(reference extract.py:119,127 json.dumps(sort_keys=True) → sha2 canonical string).",
)
def f14_canonical_row_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 7)
    return d.select(
        "doc_id", canonical_row_hash("doc_id", "lang", "source").alias("row_hash")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T-family restructuring (SURVEY §2.10)
# ---------------------------------------------------------------------------


@register(
    "t1_explode_tokens",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token
          FROM documents WHERE lang = 'en')
    WHERE token <> ''
    GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
    doc="T1 nested explode (reference hosts_to_csv.py:28-44 group→members fanout) "
    "as tokenize+explode+count — also X4 token counting.",
)
def t1_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


PIVOT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "t2_pivot_wide",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="T2 long→wide pivot (reference extract.py:78-93 value-array → named "
    "metric columns, fixed per-family schema not first-row inference).",
)
def t2_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", PIVOT_EVENT_TYPES)  # explicit values: no extra scan
        .agg(F.count(F.lit(1)))
    )
    # pivot emits null for absent combos; the declared-schema contract is 0
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in PIVOT_EVENT_TYPES],
    ).orderBy("user_id")


ROUTES = {"purchase": "revenue", "error": "alerts", "click": "traffic", "view": "traffic"}


@register(
    "t5_content_routing",
    oracle="""
    SELECT CASE WHEN event_type = 'purchase' THEN 'revenue'
                WHEN event_type = 'error' THEN 'alerts'
                WHEN event_type IN ('click','view') THEN 'traffic'
                ELSE 'unrouted' END AS route,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS route_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
    doc="T5 content-based routing (reference load_to_db.py:34-48: fan rows "
    "out to host_{cpu,mem,disk,swap}_usage by service substring; unrouted "
    "rows surface as a route instead of silently vanishing).",
)
def t5_content_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type") == "error", "alerts")
        .when(F.col("event_type").isin("click", "view"), "traffic")
        .otherwise("unrouted")
    )
    return (
        ev.groupBy(route.alias("route"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", 12, 2).alias("route_value"))
        .orderBy("route")
    )


@register(
    "t6_conformance_gate",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN ts IS NOT NULL AND user_id IS NOT NULL
                       AND value IS NOT NULL AND NOT isnan(value)
                       AND json_extract_string(props, '$.k') IS NOT NULL
                      THEN 1 END) AS n_valid
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="T6 schema conformance gate (reference extract.py:78,95-99 "
    "expected-keys + completeness check, declaratively).",
)
def t6_conformance_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    valid = (
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & F.get_json_object("props", "$.k").isNotNull()
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(valid, 1)).alias("n_valid"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Composite pipeline re-creations (SURVEY §3 EP2/EP3 shapes) — each is the
# reference's whole script as ONE lazy Catalyst plan.
# ---------------------------------------------------------------------------


@register(
    "ep2_extract_dedup_pipeline",
    oracle="""
    WITH current_run AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, value
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    previous_run AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, value
      FROM events WHERE event_id < 200 AND value IS NOT NULL AND NOT isnan(value)
    )
    SELECT user_id, event_type, COUNT(*) AS n_new,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS new_value
    FROM (SELECT * FROM current_run EXCEPT ALL SELECT * FROM previous_run)
    GROUP BY user_id, event_type ORDER BY user_id, event_type
    """,
    doc="EP2 (reference extract.py main): completeness gate → canonical rows "
    "→ anti-dedup vs previous run (extract.py:115-132) → summarize, as one plan.",
)
def ep2_extract_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    conformed = ev.filter(F.col("value").isNotNull() & ~F.isnan("value")).select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("epoch_s"),
        "value",
        F.col("event_id"),
    )
    current = conformed.drop("event_id")
    previous = conformed.filter(F.col("event_id") < 200).drop("event_id")
    return (
        current.exceptAll(previous)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_new"), dsum("value", 12, 2).alias("new_value"))
        .orderBy("user_id", "event_type")
    )


@register(
    "ep3_status_enrichment_pipeline",
    oracle="""
    SELECT o.o_orderkey,
           COALESCE(n.n_name, 'unknown') AS nation,
           CASE o.o_orderstatus WHEN 'F' THEN 'OK' WHEN 'O' THEN 'WARNING'
                WHEN 'P' THEN 'CRITICAL' ELSE 'UNKNOWN' END AS status_label,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_check,
           sha256(concat_ws('|', CAST(o.o_orderkey AS VARCHAR),
                            CAST(o.o_custkey AS VARCHAR))) AS point_id
    FROM orders o
    JOIN customer m ON o.o_custkey = m.c_custkey AND m.c_mktsegment = 'MACHINERY'
    LEFT JOIN nation n ON m.c_nationkey = n.n_nationkey AND n.n_nationkey < 20
    WHERE o.o_orderdate IS NOT NULL AND o.o_orderkey % 3 = 0
    ORDER BY o.o_orderkey
    """,
    doc="EP3 (reference url_service_status_InfluxDB_insert.py fetch_data): "
    "semi-style membership join → broadcast left enrich with default → "
    "validity filter → categorical decode → point assembly (tags+time+id).",
)
def ep3_status_enrichment_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0)
    members = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    details = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20)
    status_label = categorical_decode(
        "o_orderstatus", {"F": "OK", "O": "WARNING", "P": "CRITICAL"}, "UNKNOWN"
    )
    return (
        o.join(F.broadcast(members), o.o_custkey == members.c_custkey, "inner")
        .join(F.broadcast(details), members.c_nationkey == details.n_nationkey, "left")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            "o_orderkey",
            F.coalesce("n_name", F.lit("unknown")).alias("nation"),
            status_label.alias("status_label"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("last_check"),
            canonical_row_hash("o_orderkey", "o_custkey").alias("point_id"),
        )
        .orderBy("o_orderkey")
    )


# the demo fetcher is CLOSED-FORM (sources/rest.py::demo_fetcher): value
# j of point i for (host, service) is f"{seed + i + j:.2f}" with
# seed = (crc32(f"{host}|{service}") & 0xFFFF) / 100. The seeds are
# computed here at registration time and embedded as exact integer cents,
# so the s4 REST chain — pushdown → partitioned fetch → pivot → gate —
# is fully oracle-predictable: DuckDB regenerates the same series
# (printf('%.2f') mirrors Python's format-then-parse round trip).
_S4_HOSTS = ("web01", "web02", "db01")
_S4_START = 1700003600  # = the query's pushed-down t >= filter


def _s4_seed_cents(host: str) -> int:
    import zlib

    return zlib.crc32(f"{host}|CPU Usage".encode()) & 0xFFFF


_S4_ORACLE = f"""
    WITH hosts(host_name, seed_cents) AS (
      VALUES {", ".join(f"('{h}', {_s4_seed_cents(h)})" for h in sorted(_S4_HOSTS))}
    ),
    pts AS (
      SELECT host_name,
             {_S4_START} + i * 3600 AS t,
             CAST(printf('%.2f', seed_cents / 100.0 + i) AS DOUBLE) AS percent_used
      FROM hosts, range(0, 6) r(i)
    )
    SELECT host_name,
           strftime(epoch_ms(CAST(t AS BIGINT) * 1000), '%Y-%m-%d %H:%M:%S')
             AS "timestamp",
           'CPU Usage' AS service_name,
           percent_used
    FROM pts ORDER BY host_name, "timestamp"
    """


@register(
    "s4_rest_rrd_extract",
    oracle=_S4_ORACLE,
    doc="S4 REST RRD source end-to-end: custom Python DataSource with "
    "(host,service) partitioning + start-ts/keyspace filter pushdown, "
    "composed into the EP2 pivot + completeness gate. Offline demo "
    "fetcher (deterministic AND closed-form) — the production fetcher is "
    "the same code with requests. The oracle regenerates the fetcher's "
    "series from the embedded crc32 seeds, so the whole source chain "
    "(filter→param pushdown included: a broken ?start= would shift t "
    "values and red the row) is hash-checked.",
)
def s4_rest_rrd_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nagios_custom_etl_spark.etl.nagios import rrd_points_to_wide
    from nagios_custom_etl_spark.sources.rest import register_sources

    register_sources(spark)
    raw = (
        spark.read.format("nagios_rrd")
        .option("endpoint", "https://nagios.example/api/v1/objects/rrdexport")
        .option("fetcher", "nagios_custom_etl_spark.sources.rest:demo_fetcher")
        .option("hosts", "web01,web02,db01")
        .option("start_ts", "1700000000")
        .load()
        .filter(F.col("t") >= 1700003600)  # pushed into the request params
    )
    wide = rrd_points_to_wide(raw)
    return wide["CPU Usage"].orderBy("host_name", "timestamp")


@register(
    "f16_string_date_toolkit",
    oracle="""
    SELECT o_orderkey,
           CAST(regexp_extract(o_orderpriority, '^(\\d+)', 1) AS INTEGER) AS prio_num,
           dayofweek(o_orderdate) + 1 AS order_dow,           -- duckdb dow: 0=Sun; spark: 1=Sun
           datediff('day', DATE '1995-01-01', o_orderdate) AS days_since_epoch_start,
           (year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1) AS month_idx,
           upper(substring(o_orderpriority, 3)) AS prio_label
    FROM orders WHERE o_orderkey % 13 = 0 ORDER BY o_orderkey
    """,
    doc="F8/F9-ext string+date toolkit: regexp capture-group extraction, "
    "day-of-week (engine numbering normalized), day diffs, month "
    "indexing, substring/upper — all codegen'd builtins.",
)
def f16_string_date_toolkit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^(\d+)", 1).cast("int").alias("prio_num"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        ((F.year("o_orderdate") - 1995) * 12 + (F.month("o_orderdate") - 1)).alias("month_idx"),
        F.upper(F.substring("o_orderpriority", 3, 100)).alias("prio_label"),
    ).orderBy("o_orderkey")


@register(
    "f17_posexplode",
    oracle="""
    -- positional explode: (row, index, element); duckdb via range indexing
    SELECT vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS dim_val
    FROM embeddings, range(1, 6) r(i)
    WHERE vec_id % 100 = 0
    ORDER BY vec_id, pos
    """,
    doc="T1-ext positional explode (posexplode) of the first 5 embedding "
    "dimensions — index-carrying fan-out, the generator form of F10.",
)
def f17_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 100 == 0)
    return (
        em.select("vec_id", F.posexplode(F.slice("embedding", 1, 5)).alias("pos", "dim_val"))
        .select("vec_id", "pos", F.col("dim_val").cast("double").alias("dim_val"))
        .orderBy("vec_id", "pos")
    )

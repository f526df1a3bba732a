"""Local replica of the driver's DuckDB-oracle differential check.

Runs a registered query via PySpark and its oracle SQL via DuckDB on the
same parquet tables, then compares row count + sorted-column,
order-insensitive values — AND per-column result types. The driver's
order-insensitive hash is computed over *typed* (Arrow-level) values, so
DuckDB widening `SUM(BIGINT)` to HUGEINT (int128) mismatches Spark's
int64 even when every value is numerically equal (VERDICT r4 root cause
of the r3+r4 red rows). String-normalizing cells, as the pre-r5
comparator did, masked exactly that class; this version fails loudly on
any type-class skew before values are even compared.
"""

from __future__ import annotations

import math

import duckdb

from nagios_custom_etl_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


# connect + 10 view registrations cost ~12 ms; over a 160-query contract
# run that is seconds of pure setup (VERDICT r5 task 7) — the views are
# read-only parquet, so one connection per sf_dir is safely reusable
_CON_MEMO: dict[str, duckdb.DuckDBPyConnection] = {}


def duckdb_connection_cached(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = _CON_MEMO.get(sf_dir)
    if con is None:
        con = _CON_MEMO[sf_dir] = duckdb_connection(sf_dir)
    return con


# --- type-class mapping ----------------------------------------------------
# Both engines' type names are collapsed to coarse classes; a class
# mismatch on any shared column is a typed-hash hazard and fails the
# comparison outright. HUGEINT/UHUGEINT have no Spark counterpart and are
# always fatal (fix: CAST the oracle aggregate to BIGINT). DECIMAL in an
# oracle is fatal unless Spark is also decimal — registry convention is
# to cast exact-DECIMAL aggregates to DOUBLE in BOTH engines.

# Integer/float widths are deliberately COLLAPSED into one class each:
# the driver's hash demonstrably tolerates width skew — x48/x5/x5b
# (width/height: Spark int32 vs oracle BIGINT), w6 (ntile int32), f17
# (posexplode int32) all carry hash_match=true rows in
# CORRECTNESS_r02–r04 — while HUGEINT (int128, overflows int64) is the
# one widening that reds a row two rounds running. A width-strict
# variant of this check was tried in r5 and flagged exactly those 10
# empirically-green queries: strictness there is indistinguishable from
# false positives. DECIMAL-vs-float stays flagged (value repr differs).
_DUCK_SCALARS = {
    "TINYINT": "int",
    "UTINYINT": "int",
    "SMALLINT": "int",
    "USMALLINT": "int",
    "INTEGER": "int",
    "UINTEGER": "int",
    "BIGINT": "int",
    "UBIGINT": "int",
    "FLOAT": "float",
    "REAL": "float",
    "DOUBLE": "float",
    "VARCHAR": "string",
    "CHAR": "string",
    "TEXT": "string",
    "STRING": "string",
    "BOOLEAN": "bool",
    "DATE": "date",
    "BLOB": "binary",
    "BYTEA": "binary",
}


def duck_type_class(t: str) -> str:
    t = t.strip().upper()
    if t.endswith("[]"):
        return "array<" + duck_type_class(t[:-2]) + ">"
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in _DUCK_SCALARS:
        return _DUCK_SCALARS[t]
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith("STRUCT") or t.startswith("MAP") or t.startswith("UNION"):
        return "complex"
    return t.lower()


_SPARK_SCALARS = {
    "tinyint": "int",
    "byte": "int",
    "smallint": "int",
    "short": "int",
    "int": "int",
    "integer": "int",
    "bigint": "int",
    "long": "int",
    "float": "float",
    "double": "float",
    "string": "string",
    "varchar": "string",
    "char": "string",
    "boolean": "bool",
    "date": "date",
    "binary": "binary",
}


def spark_type_class(dt: str) -> str:
    dt = dt.strip().lower()
    if dt.startswith("array<") and dt.endswith(">"):
        return "array<" + spark_type_class(dt[6:-1]) + ">"
    if dt in _SPARK_SCALARS:
        return _SPARK_SCALARS[dt]
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt.startswith("struct") or dt.startswith("map"):
        return "complex"
    return dt


def type_skew(spark_schema, duck_cols, duck_types) -> list[str]:
    """Per-column type-class comparison; returns human-readable problems."""
    duck = {c: str(t) for c, t in zip(duck_cols, duck_types)}
    problems: list[str] = []
    for f in spark_schema.fields:
        dts = duck.get(f.name)
        if dts is None:
            continue  # name mismatch is reported by the column check
        dc = duck_type_class(dts)
        sc = spark_type_class(f.dataType.simpleString())
        if "hugeint" in dc:
            problems.append(
                f"{f.name}: DuckDB {dts} is int128 — the driver's typed hash "
                f"distinguishes it from Spark {f.dataType.simpleString()} even "
                f"when values are equal; wrap the oracle aggregate in "
                f"CAST(... AS BIGINT)"
            )
        elif dc == "complex" or sc == "complex":
            continue  # structs/maps: value comparison still applies
        elif dc != sc:
            problems.append(
                f"{f.name}: DuckDB {dts} ({dc}) vs Spark "
                f"{f.dataType.simpleString()} ({sc}) — typed-hash hazard; "
                f"align the oracle/Spark output types"
            )
    return problems


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr of a double is its shortest round-trip decimal — bit-exact
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def compare_query(spark, sf_dir: str, fn, oracle: str) -> None:
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection_cached(sf_dir)
    rel = con.sql(oracle)
    duck_cols = list(rel.columns)
    duck_types = list(rel.types)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )
    skew = type_skew(sdf.schema, duck_cols, duck_types)
    assert not skew, "type skew (driver typed-hash hazard): " + "; ".join(skew)
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"value mismatch; first diffs (spark vs duckdb): {diffs}")

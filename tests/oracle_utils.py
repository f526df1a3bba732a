"""Local replica of the driver's DuckDB-oracle differential check.

Runs a registered query via PySpark and its oracle SQL via DuckDB on the
same parquet tables, then compares row count + sorted-column,
order-insensitive values. Stricter than a hash: exact cell equality after
canonical normalization, so mismatches are debuggable.
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

    con = duckdb_connection(sf_dir)
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"value mismatch; first diffs (spark vs duckdb): {diffs}")

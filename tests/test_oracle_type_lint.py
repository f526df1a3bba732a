"""Registry-load oracle type lint (VERDICT r4 task 2).

Every ``oracle_sql()`` entry is bound (planned, not executed) in DuckDB
and its output column types inspected. DuckDB widens ``SUM(BIGINT)`` —
plain and windowed — to HUGEINT (int128), which the driver's typed
(Arrow-level) hash distinguishes from Spark's int64 even when every
value is numerically equal: rows_match/schema_match pass, hash_match
fails. That exact signature cost rounds 3 AND 4 five red rows each.

Rule enforced here: no oracle may emit HUGEINT/UHUGEINT (fix: wrap the
aggregate in ``CAST(... AS BIGINT)``) or DECIMAL (registry convention:
cast exact-DECIMAL aggregates to DOUBLE in BOTH engines), including
nested inside list types. Reverting the r5 casts makes this test fail.

No Spark session needed — pure DuckDB schema binding on the smoke-scale
parquet (output types are scale-independent).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE
from tests.oracle_utils import duckdb_connection

_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck_con():
    con = duckdb_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_emits_no_hugeint_or_decimal(duck_con, name):
    rel = duck_con.sql(_ORACLES[name])
    offenders = [
        f"{col}: {t}"
        for col, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
    ]
    assert not offenders, (
        f"{name} oracle emits driver-hash-poison types {offenders}; "
        "CAST integer SUMs to BIGINT / decimals to DOUBLE"
    )


def test_lint_premise_duckdb_still_widens_sum_to_hugeint(duck_con):
    """The guard's premise, pinned: DuckDB widens SUM(BIGINT) — plain
    and windowed — to HUGEINT. If a future DuckDB stops widening, this
    test documents that the lint's reason changed; until then, reverting
    any of the r5 CAST(... AS BIGINT) fixes makes the lint itself fail."""
    plain = duck_con.sql("SELECT SUM(doc_id) AS s FROM documents")
    assert any("HUGEINT" in str(t).upper() for t in plain.types)
    windowed = duck_con.sql(
        "SELECT SUM(doc_id) OVER (ORDER BY doc_id) AS s FROM documents"
    )
    assert any("HUGEINT" in str(t).upper() for t in windowed.types)


def test_type_skew_flags_hugeint_and_decimal():
    """compare_query's type gate must flag int128 and decimal-vs-float
    skew while passing width-only differences (empirically tolerated by
    the driver hash — see the class-map comment)."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from tests.oracle_utils import type_skew

    schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", DoubleType()),
            StructField("c", IntegerType()),
        ]
    )
    problems = type_skew(schema, ["a", "b", "c"], ["HUGEINT", "DECIMAL(12,2)", "BIGINT"])
    assert any("a" in p and "CAST" in p for p in problems)  # int128: fatal
    assert any(p.startswith("b:") for p in problems)  # decimal vs double: fatal
    assert not any(p.startswith("c:") for p in problems)  # width-only: tolerated

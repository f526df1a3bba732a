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

"""Differential test: every registered query with an oracle must match
DuckDB exactly at sf0.001 (fast) — the local twin of the driver's
sf0.01 gate."""

from __future__ import annotations

import pytest

from nagios_custom_etl_spark.plans import all_queries
from tests.oracle_utils import compare_query

QUERIES = all_queries()
ORACLE_CASES = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_CASES = sorted(name for name, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, sf_dir, name):
    q = QUERIES[name]
    compare_query(spark, sf_dir, q.fn, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0

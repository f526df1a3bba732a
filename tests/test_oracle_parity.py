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


def test_harness_rejects_wrong_results(spark, sf_dir):
    """Meta-test: the differential harness must actually FAIL on value
    drift, row-count drift, and column drift — a green wall is only
    meaningful if the comparator can go red."""
    import pytest

    from pyspark.sql import functions as F

    from nagios_custom_etl_spark.catalog import load_table
    from tests.oracle_utils import compare_query

    oracle = "SELECT doc_id, n_chars FROM documents WHERE doc_id < 10 ORDER BY doc_id"

    def right(s, d):
        return load_table(s, d, "documents").filter(F.col("doc_id") < 10).select(
            "doc_id", "n_chars"
        )

    compare_query(spark, sf_dir, right, oracle)  # sanity: the true pair passes

    def value_drift(s, d):
        return right(s, d).withColumn("n_chars", F.col("n_chars") + 1)

    def count_drift(s, d):
        return right(s, d).limit(5)

    def column_drift(s, d):
        return right(s, d).withColumnRenamed("n_chars", "chars")

    for wrong in (value_drift, count_drift, column_drift):
        with pytest.raises(AssertionError):
            compare_query(spark, sf_dir, wrong, oracle)

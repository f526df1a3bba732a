"""Driver contract for the spark-graft builder (PySpark target).

Assembled from the engine's query registry
(``nagios_custom_etl_spark.plans``): one ``queries()`` entry per
implemented operator from SURVEY.md §2, with a DuckDB ``oracle_sql()``
string for every SQL-expressible one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nagios_custom_etl_spark.plans import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["q1_pricing_summary"]
    return q.fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}

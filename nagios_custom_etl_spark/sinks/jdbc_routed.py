"""Content-routed JDBC sink (SURVEY §2.2 K4).

The reference loops the payload 4 times, routing rows by service-name
substring into host_{cpu,mem,disk,swap}_usage with fast_executemany
(/root/reference/load_to_db.py:27-56). Here the route is a column, the
split is one filtered write per route (each a pushed-down scan, not a
driver loop), and batching is the JDBC writer's ``batchsize``. Empty
routes are logged and skipped (load_to_db.py:38-40), never an error.

No JDBC driver jar ships in this container, so ``write_routed`` takes a
``writer`` callable (df, table) for tests; the default issues the real
``df.write.jdbc``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from nagios_custom_etl_spark.etl.nagios import route_metric_type

ROUTE_TABLES = {
    "cpu": "host_cpu_usage",
    "memory": "host_mem_usage",
    "disk": "host_disk_usage",
    "swap": "host_swap_usage",
}


def default_jdbc_writer(url: str, batchsize: int = 10_000, mode: str = "append"):
    def write(df: DataFrame, table: str) -> None:  # pragma: no cover — needs a driver jar
        df.write.format("jdbc").option("url", url).option("dbtable", table).option(
            "batchsize", batchsize
        ).mode(mode).save()

    return write


def write_routed(
    df: DataFrame,
    writer: Callable[[DataFrame, str], None],
    route_tables: dict[str, str] = ROUTE_TABLES,
    service_col: str = "service_name",
) -> dict[str, int]:
    """Fan ``df`` out to per-route tables; returns per-route row counts
    (the reference's logging contract). Unrouted rows are reported under
    'unrouted' and not written — log-and-skip, never fail."""
    # plain cache(), not catalog.cache_once: this df is unpersisted in the
    # finally below (per-batch lifecycle), which would invalidate the memo
    routed = df.withColumn("_route", route_metric_type(service_col)).cache()
    try:
        counts: dict[str, int] = {}
        for route, table in route_tables.items():
            part = routed.filter(routed["_route"] == route).drop("_route")
            n = part.count()
            counts[route] = n
            if n:  # empty-route check (load_to_db.py:38-40)
                writer(part, table)
        counts["unrouted"] = routed.filter(
            ~routed["_route"].isin(*route_tables.keys())
        ).count()
        return counts
    finally:
        routed.unpersist()

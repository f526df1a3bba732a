"""Registry plumbing for named queries and their DuckDB oracles.

Convention (the driver compares sorted-by-name columns by value hash):
  * alias every computed column identically in Spark and SQL;
  * money/measure aggregates go through exact DECIMAL arithmetic and are
    cast to DOUBLE at the end, so Spark and DuckDB produce bit-identical
    doubles (double-sum association order can differ between engines —
    decimal sums cannot);
  * timestamps in output are formatted to strings (engines disagree on
    native timestamp hashing/precision).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Runtime-settable confs every query depends on, applied defensively in
# case the caller (the driver) built its own SparkSession without our
# factory: UTC timestamps (oracle parity), nanos-parquet reads (events
# fixture), Python-source filter pushdown (REST source).
REQUIRED_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in REQUIRED_RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — a static conf on some build: keep going
            pass


def register(name: str, oracle: str | None = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)

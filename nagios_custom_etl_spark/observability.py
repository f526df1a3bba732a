"""Pipeline observability (SURVEY §2.5 A1–A3).

The reference logs row counts at every stage — hostgroups seen
(hosts_to_csv.py:21,37), duplicates dropped (extract.py:132), services
written per batch (url_service_status_InfluxDB_insert.py:136-159). Doing
that with ``df.count()`` calls re-executes the plan once per metric; the
idiomatic Spark mapping is ``Observation``/``df.observe``: metrics are
accumulated DURING the one real action, at zero extra passes, batch or
streaming (streaming surfaces them per micro-batch in query progress).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a plan node.

    Returns (df, observation); read ``observation.get`` AFTER an action
    on the returned df. Example::

        gated, obs = observed(gate(raw), "gate",
                              n_rows=F.count(F.lit(1)),
                              n_null_ts=F.count(F.when(F.col("ts").isNull(), 1)))
        gated.write.parquet(out)
        log(obs.get)   # {'n_rows': ..., 'n_null_ts': ...} — no second pass
    """
    obs = Observation(name)
    return df.observe(obs, *[expr.alias(k) for k, expr in metrics.items()]), obs

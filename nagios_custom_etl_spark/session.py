"""SparkSession factory tuned for the engine.

Local-mode settings mirror what a cluster deployment would set per-job:
AQE on (runtime re-plan, skew-join handling, partition coalescing),
shuffle partitions sized to the parallelism, UTC session timezone so
timestamp semantics are stable across engines (the DuckDB oracle is
UTC-naive), Arrow enabled for any pandas exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "nagios_custom_etl_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a session with scale-aware defaults.

    On a real cluster the same configs apply — only ``master`` and the
    memory knobs change; nothing in the engine assumes local mode.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # Shuffle partitions ~ parallelism. At 100 TB on a 1000-executor
        # cluster this would be set to ~2-3x total cores (or left to AQE
        # coalescing with a high initial value); 200 is wrong in both
        # directions.
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the events fixture is written with TIMESTAMP(NANOS) which the
        # vectorized parquet reader rejects; read as long and convert in
        # the catalog (values are µs-aligned, verified in FIXTURES data).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # allow Python data sources (sources/rest.py) to receive pushed filters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode: driver is the only JVM; leave headroom for the OS.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""Scalable global row-id assignment (SURVEY §2.12 extension surface).

Training-data pipelines need stable, contiguous integer ids (example
indices, shard offsets, pack positions). The naive
``row_number() OVER (ORDER BY ...)`` is a single-reducer global sort — a
non-starter at 100 TB. This operator produces the identical numbering
with balanced parallelism, the same two-pass scheme ``zipWithIndex`` uses
but expressed over DataFrames:

  1. ``repartitionByRange`` on the (total) order key — Spark samples the
     key distribution and builds balanced, *ordered* range partitions;
  2. per-partition counts (one tiny row per partition) are cumulated on
     the driver into partition offsets;
  3. ``row_number`` windowed per partition id (each window is one range
     partition, never the whole table) plus the offset = the global id.

The order key must be a total order (append a unique id as tiebreaker) —
otherwise ties make ROW_NUMBER nondeterministic in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_ids(
    df: DataFrame,
    order_by: list[Column],
    id_name: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 0-based contiguous ``id_name`` column numbering rows in the
    total order given by ``order_by`` (list of sort-direction Columns,
    e.g. ``[F.col("n_chars").desc(), F.col("doc_id")]``).

    Deterministic given deterministic input: range boundaries come from
    seeded sampling, and rows with equal keys hash to one partition, so
    the (partition, local rank) pair is stable across retries.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    # cache: the counts action and the final plan must see the same
    # partition layout without re-running the upstream plan twice
    from nagios_custom_etl_spark.catalog import cache_once

    ranged = cache_once(ranged)
    counts = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    offsets_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        ranged.join(F.broadcast(offsets_df), "_pid")
        .withColumn(id_name, F.col("_offset") + F.row_number().over(w) - 1)
        .drop("_pid", "_offset")
    )


def global_running_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    sum_name: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add an inclusive global running sum of ``value_col`` in the total
    order given by ``order_by`` — the same two-pass range-partition
    scheme as ``global_row_ids``, accumulating per-partition SUMS instead
    of counts. The primitive behind deterministic token-budget sharding
    and curriculum scheduling: a cumulative quantity over a corpus-wide
    order with no single-reducer window.

    Pass 1 exchanges one (partition, sum) row per partition; pass 2 is a
    per-range-partition window — each window covers one balanced
    partition, never the table.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    from nagios_custom_etl_spark.catalog import cache_once

    ranged = cache_once(ranged)
    sums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid] or 0
    spark = df.sparkSession
    offsets_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(offsets_df), "_pid")
        .withColumn(sum_name, F.col("_offset") + F.sum(value_col).over(w))
        .drop("_pid", "_offset")
    )

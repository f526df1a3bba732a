"""Structured Streaming re-expression of the reference's cron-micro-batch
semantics (SURVEY §2.9 ST1–ST6).

Reference model: cron runs a 25-hour-lookback extract daily
(/root/reference/extract.py:29-31), drops incomplete rows now and re-reads
them next run (extract.py:94-99), and anti-joins whole rows against the
previous run's payload for exactly-once-ish delivery (extract.py:115-132).

Spark mapping:
  * cron micro-batch        → Trigger.AvailableNow (cron-compatible runs)
  * 25h lookback + overlap  → watermark (withWatermark) + checkpoint state
  * whole-row anti-join     → dropDuplicatesWithinWatermark (bounded state)
  * handoff files / backups → checkpointLocation + idempotent sinks
  * per-batch static enrich → stream-static join (re-resolved per batch)
  * routed MSSQL tables     → foreachBatch fan-out writer (T5 streaming)

All helpers take a streaming DataFrame and return one, so batch tests can
drive them with AvailableNow + a memory sink (`run_to_memory`).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import EXPECTED_COLUMNS


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture (ST1).

    Streaming sources need a declared schema; we take it from a batch read
    (one footer read) rather than re-typing it. maxFilesPerTrigger keeps
    micro-batches bounded at scale.
    """
    from nagios_custom_etl_spark.catalog import load_table

    batch = load_table(spark, sf_dir, "events")
    # the file stream source wants a directory: stream the sf_dir with a
    # glob filter selecting just the events table file
    raw = (
        spark.readStream.schema(spark.read.parquet(f"{sf_dir}/events.parquet").schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # same ns→µs conversion the catalog applies to the batch table
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    assert set(EXPECTED_COLUMNS["events"]) <= set(raw.columns)
    assert raw.schema == batch.schema
    return raw


def tumbling_window_counts(stream: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """ST1/X6: watermarked tumbling-window aggregate (append mode).

    With AvailableNow + the trailing no-data micro-batch, every window
    whose end <= max(ts) - watermark emits exactly once — deterministic,
    so the batch oracle is `time_bucket(...) WHERE window_end <= ...`.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def cross_run_dedup(stream: DataFrame, watermark: str = "25 hours") -> DataFrame:
    """ST4: the reference's whole-row anti-join dedup with bounded state.

    dropDuplicatesWithinWatermark keys on the natural identity
    (event_id here; (host, service, ts) in the Nagios shape) and expires
    state once the watermark passes — the streaming equivalent of keeping
    only the previous run's payload on disk (extract.py:14-17).
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def late_data_gate(stream: DataFrame) -> DataFrame:
    """ST3: completeness gate — rows with missing/NaN values are dropped
    *now*; the overlapping lookback re-delivers them next run (reference
    extract.py:94-99), which the watermark + dedup pair makes safe."""
    return stream.filter(
        F.col("value").isNotNull() & ~F.isnan("value") & F.col("user_id").isNotNull()
    )


def stream_static_enrich(stream: DataFrame, static_dim: DataFrame) -> DataFrame:
    """ST6: per-batch stream-static left join (the details/members dims of
    url_service_status_InfluxDB_insert.py:50-73, re-resolved every batch)."""
    return stream.join(F.broadcast(static_dim), "user_id", "left")


def route_column() -> F.Column:
    """T5 routing expression shared by batch and streaming paths."""
    return (
        F.when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type") == "error", "alerts")
        .when(F.col("event_type").isin("click", "view"), "traffic")
        .otherwise("unrouted")
    )


def routed_parquet_sink(out_dir: str):
    """ST5/K4-shape: foreachBatch writer that fans each micro-batch out to
    one directory per route (the 4 host_{type}_usage tables of
    load_to_db.py:34-48). Append mode + stable file layout per (batch,
    route) keeps the sink idempotent under micro-batch replay."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        routed = batch_df.withColumn("route", route_column())
        # one pass over the batch, partitioned files per route — not one
        # filtered re-scan per route like the reference's loop
        routed.write.mode("append").partitionBy("route").parquet(out_dir)

    return write


def run_to_memory(
    df: DataFrame, query_name: str | None = None, output_mode: str = "append"
) -> str:
    """Drive a streaming DataFrame to completion (AvailableNow) into a
    memory sink; returns the sink table name. Test/driver harness only —
    real deployments use parquet/kafka/foreachBatch sinks with a durable
    checkpointLocation. The memory sink appends rows in every mode, so
    update-mode callers see one row per (key, batch) and take the last."""
    name = query_name or f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def incremental_rollup_sink(out_dir: str):
    """Continuous-aggregate upsert sink: each micro-batch's *updated*
    windows replace exactly their own partitions (partitionBy the window
    key + dynamic partition overwrite). The materialized table therefore
    converges to the full rollup without ever rewriting untouched
    windows — the hypertable/continuous-aggregate maintenance pattern.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start")
            .parquet(out_dir)
        )

    return write


def incremental_rollup(spark: SparkSession, source: DataFrame, out_dir: str, ckpt: str):
    """10-minute rollup maintained incrementally (update output mode:
    only windows touched by the batch are emitted and upserted)."""
    agg = (
        source.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(incremental_rollup_sink(out_dir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # partition-column type inference may read window_start back as a
    # timestamp — normalize to the written string form
    return spark.read.parquet(out_dir).withColumn(
        "window_start", F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
    )

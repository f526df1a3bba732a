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

import contextlib
import uuid

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nagios_custom_etl_spark.catalog import EXPECTED_COLUMNS

# Streaming state stores are PER SHUFFLE PARTITION, and the partition
# count is frozen into the checkpoint when the query first starts —
# there is no AQE for streaming. So the right number is a function of
# expected STATE volume (rows per store, store open/commit overhead),
# not the batch shuffle default: the fixture's whole state fits in KBs,
# where 32 stores cost ~6s of pure open/commit overhead per query
# (measured: st9 10.8s @ 32 -> 2.7s @ 4). At 100 TB you size this as
# state_rows / ~1M-per-store and accept that changing it means a new
# checkpoint lineage.
STREAM_STATE_PARTITIONS = 8


@contextlib.contextmanager
def stream_state_partitions(spark: SparkSession, n: int = STREAM_STATE_PARTITIONS):
    """Scope `spark.sql.shuffle.partitions` around a streaming run (set
    before .start(), restored after termination). Batch plans regain the
    session default — and AQE re-plans those anyway."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextlib.contextmanager
def rocksdb_state_store(spark: SparkSession):
    """Scope the RocksDB state-store provider around a streaming start.

    The default HDFS-backed provider keeps every store's state as an
    in-memory hashmap per executor — fine at fixture scale, a hard
    ceiling once total state (dedup keys within watermark, open
    sessions, rollup windows) outgrows executor heaps. RocksDB
    (bundled with Spark 4, rocksdbjni on the classpath) spills state to
    local SSD with changelog checkpointing, which is how 100 TB-scale
    state actually runs. The provider is frozen into the checkpoint at
    first start — pick it when the lineage is created, not after.
    Results are provider-independent (asserted by test); only the state
    backend changes.
    """
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


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
    # same ts normalization the catalog applies to the batch table
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
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
    with stream_state_partitions(df.sparkSession):
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
    windows replace exactly the date CHUNKS they fall in (dynamic
    partition overwrite on a day column) — the hypertable/continuous-
    aggregate maintenance pattern. Chunking by the raw 10-minute window
    key is the classic over-partitioning trap: a month of data is 4,320
    window directories of KB-sized files (measured: 105 s for the sf0.1
    fixture vs ~3 s chunked by day), and at 100 TB it's millions of
    undersized objects thrashing the file listing. Days keep chunks
    file-sized; untouched days are never rewritten. The repartition by
    chunk key bounds the writer to one task per touched day, so a
    32-shuffle-partition batch can't fan out 32×days tiny files.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # foreachBatch frames re-execute their (stateful) plan per action;
        # the chunk-key probe plus the write below are two actions — cache
        # for the sink's lifetime (plain cache: unpersisted per batch)
        batch_df = batch_df.withColumn(
            "window_date", F.substring("window_start", 1, 10)
        ).cache()
        # touched chunk keys: bounded driver-side metadata (days per batch),
        # used for partition-pruned reads — not a data collect
        days = [r["window_date"] for r in batch_df.select("window_date").distinct().collect()]
        if not days:  # trailing no-data micro-batch: nothing to upsert
            batch_df.unpersist()
            return
        merged, self_read = batch_df, False
        try:
            # only the missing-path (first batch) case may be swallowed:
            # a transient IO/footer error here must FAIL the batch so the
            # checkpoint retries — treating it as "first batch" would
            # overwrite the touched days with only the batch's changed
            # windows, silently dropping carried-forward rows (ADVICE r3)
            existing = spark.read.parquet(out_dir).filter(F.col("window_date").isin(days))
            # MERGE: update-mode batches emit only the CHANGED windows, so
            # rewriting a whole day chunk must carry forward that day's
            # untouched windows — anti-join out the updated keys, union the
            # new rows. (On a lakehouse table this is a Delta/Iceberg MERGE;
            # on raw parquet we re-write the touched chunks.)
            keep = existing.join(
                batch_df.select("window_start", "event_type").distinct(),
                ["window_start", "event_type"],
                "left_anti",
            ).select(*[f.name for f in batch_df.schema.fields])
            merged = keep.unionByName(batch_df)
            self_read = True
        except AnalysisException:  # first batch: output path not created yet
            pass
        merged = merged.repartition(max(len(days), 1), F.col("window_date"))
        if self_read:
            # materialize before overwriting the files the plan reads from
            merged = merged.localCheckpoint()
        try:
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("window_date")
                .parquet(out_dir)
            )
        finally:
            batch_df.unpersist()

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
    with stream_state_partitions(spark):
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(incremental_rollup_sink(out_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # window_start is a plain data column now (the partition key is the
    # derived day chunk) — drop the chunk column on read-back
    return spark.read.parquet(out_dir).select(
        "window_start", "event_type", "n", "total_value"
    )


def keyed_upsert_sink(out_dir: str, n_buckets: int = 8):
    """Streaming MERGE sink: maintain a keyed current-state table
    (latest event per user) under out-of-order, multi-batch delivery.

    Per micro-batch: reduce the batch to its newest row per key (ties by
    event_id), bucket keys with ``pmod(user_id, n_buckets)``, and MERGE
    into the store with ``operators/merge.py::merge_upsert`` — matched
    rows update ONLY when the incoming row is newer (last-write-wins on
    (ts, event_id), so the final state is identical whatever order the
    file source delivers batches in), new keys insert. Only the buckets
    the batch touches are re-read and rewritten (dynamic partition
    overwrite — the x55/st7 pattern): a batch touching 1% of keys
    rewrites ~1% of the store, never 100 TB. The same shape against a
    lakehouse table is a single ``MERGE INTO``; on raw parquet the
    bucket rewrite IS the merge transaction.
    """
    from pyspark.sql import Window as W
    from pyspark.sql.utils import AnalysisException

    from nagios_custom_etl_spark.operators.merge import merge_upsert

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        rank_w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        latest = (
            batch_df.filter(F.col("user_id").isNotNull())
            .withColumn("_rn", F.row_number().over(rank_w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("bucket", F.pmod("user_id", F.lit(n_buckets)).cast("int"))
            .cache()
        )
        # touched bucket ids: bounded driver-side metadata (<= n_buckets)
        buckets = [r["bucket"] for r in latest.select("bucket").distinct().collect()]
        if not buckets:  # trailing no-data micro-batch
            latest.unpersist()
            return
        # narrow the first-batch probe to the store READ only: a genuine
        # schema/column error in the merge itself must propagate, not be
        # misclassified as "store absent" and silently overwrite buckets
        # with just the batch's rows
        try:
            existing = spark.read.parquet(out_dir).filter(F.col("bucket").isin(buckets))
        except AnalysisException:  # first batch: store not created yet
            existing = None
        if existing is None:
            merged = latest
        else:
            newer = (F.col("s.ts") > F.col("t.ts")) | (
                (F.col("s.ts") == F.col("t.ts")) & (F.col("s.event_id") > F.col("t.event_id"))
            )
            merged = merge_upsert(
                existing,
                latest,
                keys=["user_id"],
                when_matched_update={
                    c: F.when(newer, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
                    for c in existing.columns
                },
            )
            # materialize before overwriting the files the plan reads from
            merged = merged.localCheckpoint()
        try:
            (
                merged.repartition(len(buckets), F.col("bucket"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(out_dir)
            )
        finally:
            latest.unpersist()

    return write


def snapshot_append_sink(
    root: str,
    auto_compact_files: int | None = None,
    compact_target_files: int = 4,
):
    """foreachBatch sink committing each micro-batch as a SNAPSHOT
    version of a manifest table (operators/snapshots.py) — the write
    side of st21's manifest-tailing source, and the streaming analog of
    the reference's append-only `data_extract.txt` handoff
    (extract.py:115-132) with real transactional semantics.

    Exactly-once: Structured Streaming replays a micro-batch (same
    batch_id, same data) after a sink failure mid-write; parquet-append
    sinks deduplicate via their own log, this sink does it the Delta
    way — the batch id is recorded in the manifest as an idempotence
    token (``txn``), and a replayed batch whose token already landed is
    a no-op. Readers never see a torn batch: data files land first,
    the atomic manifest create IS the commit point, and an incomplete
    retry leaves only unreferenced files for gc_orphans.

    ``auto_compact_files`` schedules maintenance INSIDE the loop
    (Delta's auto-optimize): whenever a commit leaves the table
    referencing more than that many live files, the sink runs
    :func:`~...snapshots.compact` down to ``compact_target_files`` —
    a layout-only ``replace`` version marked ``data_change: false``.
    Consumer contract: incremental/tailing readers of an auto-compacted
    table must opt into ``skip_compactions`` (they step over the
    marker; appends before and after still diff exactly), and vacuum
    retention must exceed consumer lag. The trigger is the LIVE file
    count, not a version modulus, so a crash between append and
    compact self-heals on the next batch. Compaction is best-effort
    maintenance: losing its commit race just defers it.

    At 100 TB: per-batch cost is the batch's data files + one O(files)
    manifest write; the store's history is every micro-batch, so
    downstream consumers tail it incrementally (st21/x84) instead of
    re-listing a growing directory — and auto-compaction is what keeps
    the LIVE file count (what full scans and merges plan over) bounded
    while that history accumulates.
    """
    from nagios_custom_etl_spark.operators import snapshots as S

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        token = f"stream-batch-{batch_id}"
        if S.txn_version(spark, root, token) is not None:
            return  # replayed batch: already committed, exactly-once
        if batch_df.isEmpty():
            return  # trailing no-data trigger: nothing to publish
        # rebalance: a micro-batch inherits the upstream scan/shuffle
        # partitioning, spraying kilobyte files per commit (guide §6);
        # the AQE hint sizes output files from actual batch bytes, so
        # a large backlog batch still writes in parallel
        v = S.append(batch_df, root, txn=token, rebalance=True)
        if auto_compact_files is not None:
            m = S._read_manifest(spark, root, v)
            if len(m["files"]) > auto_compact_files:
                try:
                    S.compact(spark, root, target_file_count=compact_target_files)
                except S.ConcurrentCommitError:
                    pass  # another maintainer won; compaction is best-effort

    return write


def snapshot_agg_merge_sink(
    silver_root: str,
    dims: list[str] | None = None,
    measures: dict[str, tuple[str, str | None, str]] | None = None,
    txn_prefix: str = "silver-batch",
    auto_vacuum_keep: int | None = None,
):
    """foreachBatch sink maintaining an ADDITIVE aggregate snapshot
    table (the medallion silver tier) from micro-batches of raw rows:
    per-batch partial aggregates are merged into the current silver
    content and published as a new snapshot version, with the batch id
    as the txn idempotence token.

    Parameterized over the aggregate spec (the mv_rewrite/x71 carrier
    convention): ``dims`` is the grain, ``measures`` maps each output
    column to ``(kind, source_col, carrier_type)`` with kind in
    {"count", "sum", "min", "max"} — the self-decomposable aggregates
    whose partials re-aggregate exactly (count/sum are additive;
    min/max are sound because this sink's bronze feed is insert-only —
    nothing ever retracts); use a ``decimal(p,s)`` carrier for
    money-like sums (bit-exact re-association) and ``long`` for
    counts/int sums. COUNT DISTINCT is the canonical NON-decomposable
    aggregate — it rides this sink as HLL register rows under a "max"
    measure at (dims, register) grain (st24), which is both mergeable
    and idempotent under replay.
    Defaults reproduce the original st23 silver schema (per-source doc
    and char counts), which is now just one instantiation. The merge is
    a union + re-aggregate over (current grain rows + batch partials) —
    one shuffle at grain cardinality, NULL dim values grouping naturally
    (no join null-matching pitfalls).

    Composed with the manifest-tailing source (sources/snapshot_tail)
    this is end-to-end incremental aggregate maintenance over the table
    format: the source's checkpoint guarantees each bronze commit is
    DELIVERED once, the txn token guarantees each batch is COMMITTED
    once, and additivity (count/sum re-aggregate from partials) makes
    the merged result equal the full batch recompute — st7's
    continuous-aggregate idea, upgraded with version isolation on both
    ends. Readers mid-merge are safe without any materialize step:
    overwrite writes NEW files and the manifest flip is atomic, so the
    plan reading the old version never races its own output (unlike
    dynamic partition overwrite, which rewrites in place and needs the
    localCheckpoint guard in keyed_upsert_sink).

    At 100 TB: the silver table is grain-sized (per-source rows), so
    the per-batch merge is O(grain + batch), never O(history); the
    bronze history stays tail-readable for backfill/audit.

    This sink overwrites a grain-sized table per batch, so its LIVE
    file count never grows — its decay mode is the version HISTORY
    (one full grain copy per batch on disk). ``auto_vacuum_keep``
    schedules :func:`~...snapshots.vacuum` inside the loop whenever
    retained versions exceed the window: disk stays bounded at
    ``keep * grain`` while the txn-token retention caveat applies
    (keep the window longer than any possible stream-recovery gap,
    or a replayed batch outlives its token — the documented
    setTransaction/vacuum interaction). Time travel beyond the window
    is gone, as with any vacuum.
    """
    from nagios_custom_etl_spark.operators import snapshots as S

    dims = list(dims) if dims is not None else ["source"]
    measures = measures or {
        "n_docs": ("count", None, "long"),
        "total_chars": ("sum", "n_chars", "long"),
    }
    for out, (kind, _src, _typ) in measures.items():
        if kind not in ("count", "sum", "min", "max"):
            raise ValueError(
                f"measure {out!r}: kind {kind!r} does not re-aggregate from "
                "partials (count/sum are additive; min/max are sound for "
                "this sink's INSERT-ONLY bronze feed — they cannot retract; "
                "distinct needs a sketch carrier: HLL registers under a "
                "'max' measure, see st24)"
            )

    _AGG = {"count": None, "sum": F.sum, "min": F.min, "max": F.max}

    def _partials(df: DataFrame) -> DataFrame:
        aggs = []
        for out, (kind, src, typ) in measures.items():
            expr = (
                F.count(F.lit(1))
                if kind == "count"
                else _AGG[kind](F.col(src).cast(typ))
            )
            aggs.append(expr.cast(typ).alias(out))
        return df.groupBy(*dims).agg(*aggs)

    def _remerge(df: DataFrame) -> DataFrame:
        # partials re-aggregate under their own kind, except count
        # partials which re-combine by SUM
        aggs = [
            _AGG[kind if kind != "count" else "sum"](F.col(out)).cast(typ).alias(out)
            for out, (kind, _s, typ) in measures.items()
        ]
        return df.groupBy(*dims).agg(*aggs)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        token = f"{txn_prefix}-{batch_id}"
        if S.txn_version(spark, silver_root, token) is not None:
            return  # replayed batch: already merged, exactly-once
        if batch_df.isEmpty():
            return
        delta = _partials(batch_df)
        if S.latest_version(spark, silver_root) > 0:
            cur = S.read_snapshot(spark, silver_root).select(*delta.columns)
            merged = _remerge(cur.unionByName(delta))
        else:
            merged = delta
        # rebalance: the published grain table is re-aggregated through
        # a shuffle, so its natural layout is one near-empty file per
        # shuffle partition; the AQE hint right-sizes it to the actual
        # grain bytes (one file at fixture scale, parallel at 100 TB)
        S.overwrite(merged, silver_root, txn=token, rebalance=True)
        if auto_vacuum_keep is not None:
            if len(S._manifest_versions(spark, silver_root)) > auto_vacuum_keep:
                S.vacuum(spark, silver_root, keep_last=auto_vacuum_keep)

    return write


def cdc_apply_sink(
    root: str,
    keys: list[str],
    seq_col: str,
    op_col: str,
    txn_prefix: str = "cdc-batch",
    prune_on: str | None = None,
    changes_root: str | None = None,
    evolve: bool = False,
    inline_feed: bool = False,
):
    """foreachBatch sink applying a CDC stream of keyed UPSERTS and
    DELETES into a snapshot table — Delta Live Tables' APPLY CHANGES
    INTO (SCD Type 1 with tombstones). Each change row carries a
    monotone sequencing column (``seq_col``) and an op (``op_col``:
    'D' = delete, anything else = upsert); per batch, the batch's
    per-key latest rows MERGE into the target with the keep-max-seq
    rule as the matched condition (``WHEN MATCHED AND s.seq > t.seq
    THEN UPDATE``, row-wise) — Delta's APPLY CHANGES matched-condition
    shape, expressed through the file-pruned COW
    :func:`~..operators.snapshots.merge_commit`.

    Out-of-order delivery is ABSORBED BY THE ALGEBRA, not by ordering
    assumptions: keep-max-seq is idempotent/commutative/associative
    (the agg-merge sink's max trick applied to whole rows), so batches
    may arrive in any interleaving and replays are no-ops (txn token,
    recorded by the merge commit itself). DELETES ARE KEPT AS
    TOMBSTONES — the 'D' row with its seq stays in the table so a LATE
    upsert with a lower seq cannot resurrect a deleted key;
    :func:`cdc_current` filters them out for readers, and
    :func:`cdc_expire_tombstones` is the retention GC.

    At 100 TB the per-batch cost is O(batch + files whose recorded
    [min, max] of ``prune_on`` (default ``keys[0]``) intersect the
    batch's key range): merge_commit plans only those files, rewrites
    them, and CARRIES every other file reference (and its stats) into
    the child manifest untouched — a 1-key trigger against a
    million-file target rewrites the files holding that key, never the
    table (Delta APPLY CHANGES rewrites only matched files; the r9
    whole-table read→union→overwrite is gone). Per-file stats are
    recorded on the prune key (keeps later merges pruning) AND on
    ``seq_col`` (lets tombstone GC prune to files old enough to hold
    expirable tombstones).

    ``changes_root`` turns on the CHANGE DATA FEED (Delta CDF on an
    APPLY CHANGES target): per batch, the NET effect on the current
    view is appended to a change-log table with Delta's four row types
    — ``insert`` (new or resurrected key), ``update_preimage`` /
    ``update_postimage`` (a genuinely newer upsert over a live row),
    ``delete`` (a winning tombstone, carrying the OLD row's values) —
    plus ``_batch_id``. Stale batch rows (seq <= current) emit NOTHING:
    the feed describes view transitions, not deliveries, which is what
    makes a downstream incremental consumer (mv_apply_delta, the
    maintained join) exact. The pre-image fetch is FILE-PRUNED like the
    merge itself: the batch's [min, max] on the prune key selects only
    the files whose recorded key range intersects (read via
    read_snapshot_pruned, pinned to the parent version), so the
    per-trigger read cost is O(files holding the batch's keys), never
    O(table) — Delta CDF's derive-from-matched-files shape.
    Crash-safe ordering: the change-log append
    (its own txn token) lands BEFORE the merge commit; a replay skips
    whichever halves already landed and recomputes identical content
    (the pre-image read re-pins the same parent).

    ``inline_feed=True`` (r12 verdict task 5) records the SAME
    view-semantic transition rows as in-manifest CHANGE FILES of the
    merge commit itself (the x136 convention, via merge_commit's
    ``change_rows``): table and feed are ONE atomic commit under ONE
    txn token, so there is no feed-before-merge window at all and the
    st33 visibility gate is unnecessary by construction — consumers
    read :func:`~..operators.snapshots.read_changes` on the target
    directly. The separate ``changes_root`` convention remains for
    existing tables; the two are mutually exclusive."""
    from pyspark.sql import Window

    from nagios_custom_etl_spark.operators import snapshots as S

    if inline_feed and changes_root is not None:
        raise ValueError(
            "inline_feed and changes_root are mutually exclusive: pick "
            "the in-manifest convention (x136) or the separate feed table"
        )
    if evolve and (changes_root is not None or inline_feed):
        raise ValueError(
            "evolve=True with a change feed is not supported: the "
            "pre-image fetch cannot project columns the stored rows "
            "predate — evolve the table first, then re-enable the feed"
        )
    prune_key = prune_on or keys[0]

    def latest_per_key(df: DataFrame) -> DataFrame:
        # batch-sized window: partitions by the CDC key over one
        # micro-batch, never over the target
        w = Window.partitionBy(*keys).orderBy(F.desc(seq_col))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _compute_changes(spark, delta: DataFrame, batch_id: int) -> DataFrame:
        cols = delta.columns
        parent = S.latest_version(spark, root)
        if parent > 0:
            # file-pruned pre-image fetch (r10 verdict task 1): the
            # batch's [min, max] on the prune key (bounded driver agg —
            # the same one merge_commit runs) selects only the files
            # whose recorded key range can hold a pre-image; a 1-key
            # trigger against a million-file target READS the files
            # holding that key, never the table (Delta CDF derives
            # pre-images from the files the merge matched). Pinned to
            # the parent version so the content is stable even though
            # it executes after the merge lands. NULL-key delta rows
            # never match (SQL MERGE semantics), so pruning on non-NULL
            # bounds is sound; all-NULL batches have no pre-image.
            lo, hi = delta.agg(F.min(prune_key), F.max(prune_key)).first()
            if lo is None:
                pre = delta.limit(0)
            else:
                pruned, _, _ = S.read_snapshot_pruned(
                    spark, root, prune_key, lo, hi, version=parent
                )
                pre = pruned.join(delta.select(*keys), keys, "left_semi")
        else:
            pre = delta.limit(0)
        cond = None
        for k in keys:
            c = F.col(f"s.{k}") == F.col(f"t.{k}")
            cond = c if cond is None else (cond & c)
        j = delta.alias("s").join(pre.select(*cols).alias("t"), cond, "left_outer")
        pre_exists = F.col(f"t.{seq_col}").isNotNull()
        wins = ~pre_exists | (F.col(f"s.{seq_col}") > F.col(f"t.{seq_col}"))
        pre_tomb = F.col(f"t.{op_col}") == "D"
        post_tomb = F.col(f"s.{op_col}") == "D"
        won = j.filter(wins)
        post_rows = won.filter(~post_tomb).select(
            *[F.col(f"s.{c}").alias(c) for c in cols],
            F.when(pre_exists & ~pre_tomb, F.lit("update_postimage"))
            .otherwise(F.lit("insert"))
            .alias("_change_type"),
        )
        pre_rows = won.filter(pre_exists & ~pre_tomb).select(
            *[F.col(f"t.{c}").alias(c) for c in cols],
            F.when(post_tomb, F.lit("delete"))
            .otherwise(F.lit("update_preimage"))
            .alias("_change_type"),
        )
        return post_rows.unionByName(pre_rows).withColumn(
            "_batch_id", F.lit(int(batch_id)).cast("long")
        )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        token = f"{txn_prefix}-{batch_id}"
        if S.txn_version(spark, root, token) is not None:
            return  # replayed batch: already applied, exactly-once
        if batch_df.isEmpty():
            return  # trailing no-data trigger: nothing to apply
        delta = latest_per_key(batch_df)
        if changes_root is not None and S.txn_version(
            spark, changes_root, f"{token}-chg"
        ) is None:
            # separate-table convention: the change-log append lands
            # BEFORE the merge under its own token; an all-stale batch
            # appends a zero-row version carrying the token — exactly
            # what a replay wants to find
            S.append(
                _compute_changes(spark, delta, batch_id),
                changes_root,
                txn=f"{token}-chg",
                # batch-sized change set: right-size instead of spraying
                # one file per upstream shuffle partition (guide §6)
                rebalance=True,
            )
        chg = None
        if inline_feed:
            # in-manifest convention (x136): one commit = table + feed,
            # no ordering, no gate. Idempotent enable (forward-only).
            S.set_change_feed(spark, root, True)
            chg = _compute_changes(spark, delta, batch_id)
        newer = F.col(f"s.{seq_col}") > F.col(f"t.{seq_col}")
        # whole-row keep-max-seq: matched -> source row iff strictly
        # newer (ties keep target, which makes replays no-ops even
        # without the txn token); unmatched source rows — including
        # tombstones for never-seen keys — insert
        upd = {
            c: F.when(newer, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
            for c in delta.columns
        }
        S.merge_commit(
            root,
            delta,
            keys=keys,
            when_matched_update=upd,
            prune_on=prune_key,
            stats_cols=[prune_key, seq_col],
            txn=token,
            # mid-stream source schema additions (Delta autoMerge): the
            # winning-row update dict is built from the BATCH's columns,
            # so evolved columns flow; rows whose stored version predates
            # the column read back NULL until a newer change lands
            evolve=evolve,
            change_rows=chg,
        )
        _record_cdc_hwm(spark, root, txn_prefix, batch_id)

    return write


def cdc_current(spark: SparkSession, root: str, op_col: str = "op") -> DataFrame:
    """The live view of a :func:`cdc_apply_sink` table: latest-seq rows
    minus tombstones."""
    from nagios_custom_etl_spark.operators import snapshots as S

    return S.read_snapshot(spark, root).filter(F.col(op_col) != "D")


def _record_cdc_hwm(spark, root: str, txn_prefix: str, batch_id: int) -> None:
    """Durable applied-high-water marker, written AFTER a batch's merge
    lands (r11 ADVICE): txn tokens live in manifests and vanish when
    vacuum expires them — if the newest retained versions are all
    compactions/GC replaces, a fully-applied feed would read as
    permanently empty. The marker lives OUTSIDE ``_snapshots`` and the
    data dirs, so vacuum never reclaims it. Create-if-absent per batch
    id (replay-idempotent); older markers are pruned opportunistically
    — only the maximum matters, and the newest is written first, so the
    max is monotone through any crash."""
    import json

    from nagios_custom_etl_spark import fsio

    d = f"{root}/_cdc_hwm"
    fsio.mkdirs(spark, d)
    name = f"{txn_prefix}-{int(batch_id):012d}.json"
    with contextlib.suppress(FileExistsError):
        fsio.create_text_atomic(
            spark, f"{d}/{name}", json.dumps({"batch_id": int(batch_id)})
        )
    pre = f"{txn_prefix}-"
    for f in fsio.list_names(spark, d):
        if (
            f.startswith(pre)
            and f.endswith(".json")
            and f[len(pre):-5].isdigit()
            and f < name
        ):
            fsio.delete(spark, f"{d}/{f}", recursive=False)


def cdc_applied_high_water(
    spark: SparkSession, target_root: str, txn_prefix: str
) -> int | None:
    """Highest micro-batch id whose MERGE landed in the target table —
    the max over (a) the txn tokens (``<prefix>-<batch_id>``) the apply
    sinks record in every merge commit, scanned from the retained
    manifests, and (b) the durable ``_cdc_hwm`` markers the sinks write
    after each merge (which survive vacuum expiring every token-bearing
    manifest — r11 ADVICE). O(retained manifests + 1 listing) metadata
    reads, zero data IO. None when no batch has been applied yet."""
    from nagios_custom_etl_spark import fsio
    from nagios_custom_etl_spark.operators import snapshots as S

    best: int | None = None
    pre = f"{txn_prefix}-"
    for v in S._manifest_versions(spark, target_root):
        t = S._manifest_base_field(spark, target_root, v, "txn")
        if t and t.startswith(pre) and t[len(pre):].isdigit():
            b = int(t[len(pre):])
            best = b if best is None or b > best else best
    d = f"{target_root}/_cdc_hwm"
    if fsio.exists(spark, d):
        for f in fsio.list_names(spark, d):
            if f.startswith(pre) and f.endswith(".json") and f[len(pre):-5].isdigit():
                b = int(f[len(pre):-5])
                best = b if best is None or b > best else best
    return best


def cdc_read_changes(
    spark: SparkSession,
    changes_root: str,
    target_root: str,
    txn_prefix: str = "cdc-batch",
) -> DataFrame:
    """Visibility-SAFE read of a change feed emitted by
    :func:`cdc_apply_sink` / :func:`scd2_cdc_sink` — closes the
    feed-before-merge anomaly window (r10 verdict task 5): emission is
    crash-ordered feed-first, so between the feed append and the merge
    commit (or after a crash between them) a raw ``read_snapshot`` of
    the feed shows a transition the TARGET does not yet reflect. This
    reader exposes only transitions whose companion merge has landed:
    feed rows with ``_batch_id`` at or below the target's applied
    high-water mark (:func:`cdc_applied_high_water`).

    Soundness of the <= rule: foreachBatch is SEQUENTIAL — batch b+1
    cannot start before ``write(b)`` returned (merge b committed), and
    within a batch the feed lands before the merge — so at most the
    single HIGHEST feed batch can be pending, and every batch at or
    below the high-water mark is fully applied. A high-water comparison
    (not set membership) also stays correct after the target's old
    manifests are vacuumed: their tokens vanish but their batches are
    provably below the surviving maximum — and even when EVERY
    token-bearing manifest has been expired (the newest retained
    versions are all compactions/GC replaces), the sinks' durable
    ``_cdc_hwm`` marker still carries the mark (r11 ADVICE). The pending transition is not
    lost, merely deferred: crash recovery replays the batch, the merge
    lands (the feed half is skipped via its own token), and the row
    becomes visible — replay-idempotent end to end. Keep feed retention
    >= target retention or the mark may reference expired feed rows."""
    from nagios_custom_etl_spark.operators import snapshots as S

    feed = S.read_snapshot(spark, changes_root)
    hi = cdc_applied_high_water(spark, target_root, txn_prefix)
    if hi is None:
        return feed.limit(0)
    return feed.filter(F.col("_batch_id") <= F.lit(int(hi)))


def scd2_cdc_sink(
    root: str,
    key: str,
    seq_col: str,
    op_col: str,
    txn_prefix: str = "scd2-batch",
    changes_root: str | None = None,
    inline_feed: bool = False,
):
    """foreachBatch sink maintaining an SCD TYPE 2 history table from a
    keyed CDC stream — DLT's APPLY CHANGES ... STORED AS SCD TYPE 2,
    the history-keeping sibling of :func:`cdc_apply_sink` (SCD1). Every
    upsert OPENS a version valid from its seq; the next event on the
    key (upsert or delete) CLOSES it (``valid_to`` = that event's seq,
    half-open interval); a key whose LAST event is a delete has no
    current version. Event rows — including 'D' events — are stored
    verbatim with the derived ``valid_from``/``valid_to``/``is_current``
    columns; readers take ``op != 'D'`` for history
    (:func:`scd2_history`) and version-at-seq lookups
    (:func:`scd2_as_of`).

    OUT-OF-ORDER delivery is absorbed by REBUILDING touched keys'
    histories from their full event set each batch: per batch, the
    stored events of the batch's keys union the batch's rows, dedup on
    (key, seq), and one lead()-window re-derives every interval — a
    late event slots into place and re-closes its neighbors, which no
    in-order incremental rule can do. Cost is O(touched histories),
    never O(table) — on BOTH sides: the touched-history READ is
    file-pruned (read_snapshot_pruned on the batch's key range against
    the per-file key stats every publish records), version-count per
    key is attribute-change cardinality (bounded), and the publish is
    ONE atomic merge_commit on (key, valid_from) with file pruning on
    the key —
    matched version rows update in place (their valid_to/is_current
    may have changed), new versions insert, untouched keys' files
    carry. Nothing is read-then-destroyed across commits, so a crash
    at ANY point replays cleanly (txn token; the rebuild re-reads the
    unchanged snapshot).

    ``changes_root`` turns on the SCD2 CHANGE DATA FEED (st31's
    convention adapted to intervals — the r10 verdict's task 2): per
    batch, the NET effect of the rebuild on the stored history is
    appended to a change-log table keyed on (key, valid_from):
    ``insert`` for a version row the history did not hold (a new event
    — possibly a LATE one slotting into the middle of a key's
    timeline), ``update_preimage``/``update_postimage`` for a stored
    version whose derived interval changed (its neighbor arrived and
    re-closed it — the CORRECTING transition out-of-order delivery
    makes necessary; event attributes are immutable so only
    valid_to/is_current can differ). Versions are never deleted, so
    the ``delete`` row type never occurs here. Replaying the feed —
    per (key, valid_from), the last batch's insert/postimage row —
    reconstructs the stored history EXACTLY, which is what lets a
    downstream MV or temporal join over a 100 TB dimension history
    consume transitions at delta cost instead of re-reading the table
    (st31 proved this for SCD1). Emission is crash-ordered BEFORE the
    merge under its own txn token: a replay skips whichever halves
    already landed and recomputes identical content from the
    unchanged parent snapshot. The transition computation costs
    O(touched histories): it compares the rebuild (already in hand)
    against the same file-pruned touched-history read the rebuild
    itself used — no extra table scan.

    ``inline_feed=True`` (r12 verdict task 5) records the same interval
    transitions as in-manifest CHANGE FILES of the rebuild's own merge
    commit (the x136 convention via merge_commit's ``change_rows``):
    history and feed are ONE atomic commit under ONE txn token — no
    feed-before-merge ordering, no visibility gate; consumers read
    :func:`~..operators.snapshots.read_changes` on the history table
    directly. Mutually exclusive with ``changes_root``."""
    from pyspark.sql import Window

    from nagios_custom_etl_spark.operators import snapshots as S

    if inline_feed and changes_root is not None:
        raise ValueError(
            "inline_feed and changes_root are mutually exclusive: pick "
            "the in-manifest convention (x136) or the separate feed table"
        )

    def _compute_transitions(rebuilt, stored, batch_id: int) -> DataFrame:
        # NET effect of the rebuild on the stored history, keyed on
        # (key, valid_from): new version rows insert; stored versions
        # whose derived interval changed (a neighbor arrived) emit a
        # correcting pre/post pair. Unchanged rebuilt rows — including
        # redelivered duplicate events — emit NOTHING: the feed
        # describes history transitions, not deliveries. Both sides are
        # already in hand (the rebuild and its own file-pruned
        # touched-history read, pinned to the parent version), so this
        # costs O(touched histories), never a table scan.
        out_cols = rebuilt.columns
        if stored is None:
            changes = rebuilt.withColumn("_change_type", F.lit("insert"))
        else:
            n, o = rebuilt.alias("n"), stored.select(*out_cols).alias("o")
            cond = (F.col(f"n.{key}") == F.col(f"o.{key}")) & (
                F.col("n.valid_from") == F.col("o.valid_from")
            )
            j = n.join(o, cond, "left_outer")
            is_new = F.col("o.valid_from").isNull()
            changed = ~is_new & (
                ~F.col("n.valid_to").eqNullSafe(F.col("o.valid_to"))
                | ~F.col("n.is_current").eqNullSafe(F.col("o.is_current"))
            )

            def pick(side: str):
                return [F.col(f"{side}.{c}").alias(c) for c in out_cols]

            changes = (
                j.filter(is_new)
                .select(*pick("n"))
                .withColumn("_change_type", F.lit("insert"))
                .unionByName(
                    j.filter(changed)
                    .select(*pick("o"))
                    .withColumn("_change_type", F.lit("update_preimage"))
                )
                .unionByName(
                    j.filter(changed)
                    .select(*pick("n"))
                    .withColumn("_change_type", F.lit("update_postimage"))
                )
            )
        return changes.withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        token = f"{txn_prefix}-{batch_id}"
        if S.txn_version(spark, root, token) is not None:
            return  # replayed batch: history already carries it
        if batch_df.isEmpty():
            return
        d = batch_df.withColumnRenamed(seq_col, "valid_from").dropDuplicates(
            [key, "valid_from"]
        )
        attrs = [c for c in d.columns if c not in (key, "valid_from", op_col)]
        cols = [key, "valid_from", op_col, *attrs]
        events = d.select(*cols)
        parent = S.latest_version(spark, root)
        stored_touched = None
        if parent > 0:
            touched = d.select(key).distinct()
            # file-pruned touched-history fetch (r10 verdict task 1):
            # only files whose recorded key range intersects the
            # batch's [min, max] can hold a touched key's stored events
            # — stats on the key are recorded at every publish below,
            # so a 1-key batch against a many-file history reads the
            # files holding that key, never the table. NULL keys never
            # semi-join-match, so non-NULL bounds are sound.
            lo, hi = d.agg(F.min(key), F.max(key)).first()
            if lo is None:
                existing = events.limit(0)
            else:
                pruned, _, _ = S.read_snapshot_pruned(
                    spark, root, key, lo, hi, version=parent
                )
                stored_touched = pruned.join(touched, key, "left_semi")
                existing = stored_touched.select(*cols)
            events = existing.unionByName(events).dropDuplicates([key, "valid_from"])
        w = Window.partitionBy(key).orderBy("valid_from")
        rebuilt = events.select(
            *cols,
            F.lead("valid_from").over(w).alias("valid_to"),
        ).withColumn(
            "is_current", F.col("valid_to").isNull() & (F.col(op_col) != "D")
        )
        if changes_root is not None and S.txn_version(
            spark, changes_root, f"{token}-chg"
        ) is None:
            # separate-table convention: feed-first under its own token;
            # an all-duplicate batch appends a zero-row version carrying
            # the token — exactly what a replay wants to find
            S.append(
                _compute_transitions(rebuilt, stored_touched, batch_id),
                changes_root,
                txn=f"{token}-chg",
                # batch-sized transition set: right-size instead of
                # spraying one file per shuffle partition (guide §6)
                rebalance=True,
            )
        chg = None
        if inline_feed:
            # in-manifest convention (x136): one commit = history + feed
            S.set_change_feed(spark, root, True)
            chg = _compute_transitions(rebuilt, stored_touched, batch_id)
        S.merge_commit(
            root,
            rebuilt,
            keys=[key, "valid_from"],
            # rebuilt rows are authoritative: matched versions take the
            # re-derived interval columns wholesale
            when_matched_update={c: F.col(f"s.{c}") for c in rebuilt.columns},
            prune_on=key,
            stats_cols=[key],
            txn=token,
            change_rows=chg,
        )
        _record_cdc_hwm(spark, root, txn_prefix, batch_id)

    return write


def scd2_history(spark: SparkSession, root: str, op_col: str = "op") -> DataFrame:
    """All VERSIONS (delete events excluded — they only close
    intervals): each row valid over [valid_from, valid_to), NULL
    valid_to = open."""
    from nagios_custom_etl_spark.operators import snapshots as S

    return S.read_snapshot(spark, root).filter(F.col(op_col) != "D")


def scd2_as_of(
    spark: SparkSession, root: str, seq: int, op_col: str = "op"
) -> DataFrame:
    """The dimension as of sequence point ``seq``: the unique version
    per key with ``valid_from <= seq < valid_to`` (temporal_join's
    half-open convention — exactly one row per key alive at any seq)."""
    return scd2_history(spark, root, op_col).filter(
        (F.col("valid_from") <= F.lit(seq))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(seq)))
    )


def cdc_expire_tombstones(
    spark: SparkSession,
    root: str,
    older_than_seq: int,
    max_lateness: int,
    seq_col: str = "seq",
    op_col: str = "op",
) -> int | None:
    """Retention GC for a :func:`cdc_apply_sink` table: drop tombstones
    (op='D' rows) whose seq is below ``older_than_seq`` — the operator
    the r9 docstring only promised. A tombstone exists to block LATE
    lower-seq upserts from resurrecting a deleted key, so it is only
    safe to drop once no change that old can still arrive: the caller
    DECLARES that bound as ``max_lateness`` (seq units — the CDC twin
    of a watermark delay), and a cutoff younger than
    ``max_seq - max_lateness`` is REFUSED, never silently clamped.
    A late upsert older than the declared lateness is
    undefined-by-contract after expiry (it may resurrect), exactly as a
    beyond-watermark event's handling is undefined for streaming state.

    File-pruned like the apply itself: only files whose recorded min
    ``seq`` is below the cutoff can hold an expirable tombstone — the
    rest carry into the child manifest untouched, so steady-state GC on
    a mostly-fresh 100 TB table rewrites the old tail, not the table.
    Idempotent and replay-safe: when the pruned probe finds nothing
    expirable, NO commit is published (re-running is free) — and
    re-running after a successful expiry finds nothing by construction.

    Publishes a ``replace`` stamped ``data_change: true`` plus a
    ``tombstones_expired`` marker — the same contract as a
    delete-materializing :func:`~..operators.snapshots.compact`: rows
    are DROPPED, so a skip-compactions file-diff consumer must REFUSE
    to step over it (Delta stamps dataChange=false only for
    row-preserving OPTIMIZE). A cdc_apply table's own history is
    merge-family — consumed through cdc_current or snapshot CDC, not
    file diffs — but on a table whose history happens to be append-only
    (a raw CDC event log), a silently-skipped expiry would leave the
    consumer believing the tombstone rows still exist. Sound for keyed
    downstream replicas by the retention contract: one that never
    learns a tombstone vanished just keeps it, and the refusal above
    guarantees no surviving change is old enough for that kept
    tombstone to wrongly block. Refused while
    MoR deletes are pending (their scope over a partial rewrite is
    ambiguous — compact first). Returns the new version, or None when
    nothing expired."""
    from nagios_custom_etl_spark.operators import snapshots as S

    v = S.latest_version(spark, root)
    if v == 0:
        return None
    m = S._read_manifest(spark, root, v)
    if m.get("deletes"):
        raise ValueError(
            "pending MoR deletes: their scope over a partial tombstone "
            "rewrite is ambiguous — compact() first"
        )
    # manifest-only current high-water mark (refuses files without
    # recorded seq stats — no silent wrong retention math)
    hi = S.metadata_minmax(spark, root, seq_col)[1]
    if hi is None:
        return None  # empty table: nothing to expire
    if older_than_seq > hi - max_lateness:
        raise ValueError(
            f"retention too short: cutoff {older_than_seq} > max seq {hi} "
            f"- declared max lateness {max_lateness}; a tombstone younger "
            "than the lateness bound may still need to block a late upsert"
        )
    stats = m.get("stats", {})

    def may_hold(f: str) -> bool:
        s = stats.get(f, {}).get(seq_col)
        if not s or s[0] is None:
            return True  # no stats: conservatively rewrite
        return s[0] < older_than_seq

    touched = [f for f in m["files"] if may_hold(f)]
    untouched = [f for f in m["files"] if not may_hold(f)]
    if not touched:
        return None
    view = S._read_files(
        spark, root, touched, m.get("schema"), m.get("partition_spec")
    )
    # NULL-safe: a NULL seq or op row is never expirable (coalesce keeps
    # it — a bare ~expired would NULL-drop it from the survivors)
    expired = F.coalesce(
        (F.col(op_col) == "D") & (F.col(seq_col) < F.lit(older_than_seq)),
        F.lit(False),
    )
    if view.filter(expired).isEmpty():
        return None  # nothing expirable in the pruned files: no churn
    survivors = view.filter(~expired)
    stats_cols = (
        sorted({c for s in stats.values() for c in s if not c.startswith("__")})
        or None
    )
    spec = m.get("partition_spec")
    files, new_stats = S._write_data_files(
        survivors, root, stats_cols, spec[0] if spec else None
    )
    carried = {f: s for f, s in stats.items() if f in set(untouched)}
    return S._commit(
        spark,
        root,
        untouched + files,
        "replace",
        v,
        {**carried, **new_stats},
        m.get("schema"),
        partition_spec=spec,
        # rows are dropped: data_change=true, like a delete-
        # materializing compact — incremental readers refuse to skip it
        extra={"data_change": True, "tombstones_expired": True},
    )

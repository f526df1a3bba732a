"""Table-maintenance operators (SURVEY §2.2 Ext — the sink-side jobs a
100 TB deployment runs continuously).

Streaming sinks and per-batch routed writes (K4/K6, streaming/ops.py)
accumulate small files — every micro-batch leaves one file per partition
per route. Small files poison reads at scale: file-listing dominates
planning, each file is a scan task, and row-group statistics lose their
skipping power. Compaction rewrites a directory into
size-targeted files; at 100 TB it runs per-partition (only partitions
whose small-file count crosses a threshold), which is exactly how
Delta/Iceberg OPTIMIZE schedules itself.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory, driver-side."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = 128 << 20,
    preserve_partitioning: list[str] | None = None,
) -> int:
    """Rewrite ``src`` into ``dest`` with ceil(total/target) files;
    returns the output file count.

    ``preserve_partitioning`` keeps hive-style directory partitioning in
    the rewrite (compaction must never undo partition pruning). The
    rewrite is a plain scan→write: no shuffle when coalescing down
    (coalesce merges splits task-side), one round-robin shuffle when the
    source is skewed into fewer-but-huge files and must be split up.
    """
    _, total = dir_stats(src)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    reader_parts = df.rdd.getNumPartitions()
    out = df.coalesce(n_files) if n_files <= reader_parts else df.repartition(n_files)
    writer = out.write.mode("overwrite")
    if preserve_partitioning:
        writer = writer.partitionBy(*preserve_partitioning)
    writer.parquet(dest)
    n, _ = dir_stats(dest)
    return n

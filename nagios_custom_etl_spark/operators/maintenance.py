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


def _check_zorder_width(n_cols: int, bits: int) -> None:
    """The interleaved key lives in a signed 64-bit LONG: the highest bit
    position is ``bits*n - 1``, and position 63 is the sign bit — a key
    that reaches it goes negative and sorts BEFORE every other row,
    silently mis-clustering the rewrite (ADVICE r5)."""
    if bits * n_cols > 63:
        raise ValueError(
            f"z-order key needs {bits * n_cols} bits ({n_cols} cols x {bits}) "
            "but must fit in the 63 value bits of a signed LONG — lower "
            "`bits` or interleave fewer columns"
        )


def zorder_key(cols, bits: int = 8):
    """Morton/Z-order interleave of ``len(cols)`` integer columns' low
    ``bits`` bits: bit ``b`` of column ``i`` lands at position
    ``b*n + i`` of the key. Rows close in Z-value are close in EVERY
    interleaved dimension, so range-partitioning/sorting by the key
    clusters the table for multi-dimensional scan pruning — the
    Delta/Iceberg ``OPTIMIZE ZORDER BY`` layout primitive, as a pure
    static bit expression (codegen'd, no UDF). Columns must already be
    bucketized to non-negative ints (e.g. ``pmod(hash, 2^bits)`` or a
    range quantile index); values wider than ``bits`` are masked.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    _check_zorder_width(n, bits)
    mask = (1 << bits) - 1
    terms = []
    for i, c in enumerate(cols):
        v = (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(mask)
        for b in range(bits):
            terms.append(F.shiftleft(F.shiftright(v, b).bitwiseAND(1), b * n + i))
    out = terms[0]
    for t in terms[1:]:  # disjoint bit positions: OR == ADD; OR is clearer
        out = out.bitwiseOR(t)
    return out


def zorder_key_sql(exprs: list[str], bits: int = 8) -> str:
    """The identical interleave as ANSI SQL (DuckDB oracle twin of
    ``zorder_key``) over already-bucketized integer expressions."""
    n = len(exprs)
    _check_zorder_width(n, bits)
    mask = (1 << bits) - 1
    terms = []
    for i, e in enumerate(exprs):
        for b in range(bits):
            # every term fully parenthesized: DuckDB gives << and | equal
            # precedence (left-assoc), so a bare `x << p | y` would parse
            # as `x << (p | y)` and overflow
            terms.append(f"((((({e}) & {mask}) >> {b}) & 1) << {b * n + i})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df,
    dest: str,
    cols,
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Rewrite ``df`` clustered by Z-order: range-partition on the
    Z-key into ``n_files`` non-overlapping Z-ranges, sort within each,
    write one file per range. Every output file then covers a small
    hyper-rectangle of the interleaved dimensions, so parquet row-group
    min/max stats (and file-level skipping in table formats that track
    column ranges) prune scans filtered on ANY clustered column — not
    just the leading sort column, which is linear sort's failure mode.
    At 100 TB this is the periodic OPTIMIZE pass over hot partitions;
    ``n_files`` targets ~128 MiB files like ``compact_parquet``.
    """
    z = zorder_key(cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        # a layout-only maintenance pass must be schema-identical to its
        # input (like compact_parquet): project the helper key away — the
        # projection preserves the partitioning and sort order
        .drop("_z")
        .write.mode("overwrite")
        .parquet(dest)
    )


def file_stats_manifest(spark: SparkSession, path: str, col: str):
    """Per-file (min, max, rows) statistics for one column, computed in
    ONE distributed pass (``groupBy(input_file_name())`` — a map-side
    combine per file, no second scan later). This is the file-level
    stats manifest Delta/Iceberg persist in table metadata; parquet
    row-group min/max only helps AFTER a scan task has opened the
    footer — the manifest prunes files before tasks are even scheduled,
    which at 100 TB is the difference between listing a million files
    and listing the few whose range intersects the predicate.

    Returns a driver-side list of Rows (file, min_v, max_v, n_rows) —
    bounded metadata: one entry per FILE, like every table format's
    manifest (hierarchical manifests shard this beyond ~10^6 files).
    """
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(col).alias("min_v"),
            F.max(col).alias("max_v"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )


def stats_pruned_read(spark: SparkSession, path: str, col: str, lo, hi):
    """Read only the files whose [min, max] range intersects [lo, hi],
    then apply the residual predicate. Returns
    ``(DataFrame, n_files_read, n_files_total)``. Correctness never
    depends on the layout: the residual filter re-applies the predicate
    inside surviving files, so a badly-clustered table reads more files
    but returns the same rows (layout-invariance, the x44/x51
    property). Files with NULL stats (all-NULL column) are kept —
    skipping them would silently drop rows.
    """
    from pyspark.sql import functions as F

    manifest = file_stats_manifest(spark, path, col)
    keep = [
        r.file
        for r in manifest
        if r.min_v is None or r.max_v is None or not (r.max_v < lo or r.min_v > hi)
    ]
    schema = spark.read.parquet(path).schema
    pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    if not keep:
        return spark.createDataFrame([], schema), 0, len(manifest)
    return (
        spark.read.schema(schema).parquet(*keep).filter(pred),
        len(keep),
        len(manifest),
    )


def write_bucketed_table(
    df,
    spark: SparkSession,
    name: str,
    key: str,
    path: str,
    buckets: int = 8,
) -> None:
    """Persist ``df`` as a bucketed + per-bucket-sorted table on ``key``.

    Bucketing is the pre-paid shuffle: rows are hash-distributed into
    ``buckets`` files by Murmur3(key) AT WRITE TIME, and the catalog
    records that layout, so every later equi-join or aggregation on the
    key reuses the distribution — the scan itself satisfies the join's
    distribution requirement and Catalyst plans a SortMergeJoin with NO
    Exchange on either side (asserted in tests/test_scale_joins.py).
    The ``repartition(buckets, key)`` before the write aligns task
    partitioning with the bucket function (both Murmur3-based), so each
    bucket lands in exactly ONE file — which is also what lets the
    sorted-bucket metadata eliminate the join's Sort at read time.

    At 100 TB this is THE lever for repeated fact-to-fact joins: a
    lineitem ⋈ orders on the orderkey shuffles terabytes every query
    unless both sides are bucketed on it once. (Spark's bucketBy
    requires a table catalog entry — ``saveAsTable`` with an explicit
    path keeps the data external while the in-memory/Hive catalog
    carries the bucket spec.)
    """
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.repartition(buckets, key)
        .write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )


def token_file_index(spark: SparkSession, path: str, text_col: str) -> "DataFrame":
    """Inverted FILE index over a parquet directory: (token, file)
    posting rows — which data files contain at least one document with
    the token. The text-search analog of the min/max stats manifest
    (:func:`file_stats_manifest`): numeric skipping prunes by range,
    token skipping prunes by posting list. Built in one pass
    (tokenize -> distinct on (token, file)); size is bounded by
    |vocabulary| x |files|, independent of corpus row count, and the
    index is itself a DataFrame — store it as a snapshot table and it
    rides the same incremental maintenance as everything else (new
    files append their postings; rewrites rebuild only their own).
    At 100 TB this is how a needle-term search reads megabytes, not the
    corpus: Lucene's file-level idea expressed relationally."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .select(
            F.input_file_name().alias("file"),
            F.explode(F.split(F.col(text_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("token", "file")
        .agg(F.count(F.lit(1)).alias("n_docs_hint"))
    )


def token_pruned_search(
    spark: SparkSession,
    index: "DataFrame",
    token: str,
    text_col: str,
    max_files: int = 100_000,
) -> tuple["DataFrame", int]:
    """Search documents containing ``token`` by planning ONLY the files
    its posting list names: returns (matching rows, files planned).
    The posting-list collect is bounded by the file count (metadata,
    like a manifest read) — and hard-capped by ``max_files``: a
    stopword's posting list names most of a 100 TB table, so beyond the
    cap the driver-side list buys nothing and the search refuses rather
    than OOM the driver (run the full-scan filter instead; the index
    exists for needles, not stopwords). The residual tokenized re-check
    inside the planned files keeps the answer exact — the index prunes,
    it never decides. An absent token plans zero files and scans
    nothing."""
    from pyspark.sql import functions as F

    n_postings = index.filter(F.col("token") == token).count()
    if n_postings > max_files:
        raise ValueError(
            f"token {token!r} appears in {n_postings} files (> max_files="
            f"{max_files}): a posting list that wide prunes nothing — "
            "filter the full table instead"
        )
    files = [
        r["file"] for r in index.filter(F.col("token") == token).select("file").collect()
    ]
    if not files:
        return spark.range(0).selectExpr("CAST(NULL AS string) AS _none"), 0
    hit = spark.read.parquet(*files).filter(
        F.array_contains(F.split(F.col(text_col), " "), token)
    )
    return hit, len(files)


_BF_HEX = "0123456789abcdef"


def bloom_bit_expr(col, j: int, bits: int):
    """Bit position of hash ``j`` for a key value — a pure Column
    expression over md5, PORTABLE the same way the HLL registers are
    (operators/sketches.py): the first 8 hex chars fold to a 32-bit
    integer with string built-ins only, so Spark, DuckDB and Python's
    hashlib all compute the identical position and the whole filter is
    bit-checkable cross-engine (opaque engine blooms — x87's runtime
    bloom_filter_agg — can only be behavior-checked)."""
    from pyspark.sql import functions as F

    h = F.md5(F.concat(col.cast("string"), F.lit(f":bf{j}")))
    v = sum(
        # long math: digit * 16^7 overflows INT under ANSI mode
        (F.instr(F.lit(_BF_HEX), F.substring(h, i + 1, 1)) - 1).cast("long")
        * (16 ** (7 - i))
        for i in range(8)
    )
    return (v % bits).cast("long")


def bloom_probe_bits(value, bits: int, k: int) -> set[tuple[int, int]]:
    """The probe value's DISTINCT (word, shift) positions, computed
    driver-side with hashlib — the same md5 bytes the engines hash, so
    planning agrees bit-for-bit with the stored index."""
    import hashlib

    out = set()
    for j in range(k):
        b = int(hashlib.md5(f"{value}:bf{j}".encode()).hexdigest()[:8], 16) % bits
        out.add((b // 32, b % 32))
    return out


def bloom_file_index(
    spark: SparkSession, path: str, key_col: str, bits: int = 4096, k: int = 3
) -> "DataFrame":
    """Per-file Bloom SIDECAR over a high-cardinality key, as a relation
    ``(file, w, word)`` — 32-bit words of an m-bit filter, built in one
    pass with ``bit_or`` (map-side combinable; the shuffle is bounded at
    |files| x m/32 rows regardless of row count). The point-lookup
    analog of the min/max stats manifest (:func:`file_stats_manifest`,
    useless for uniformly-spread keys) and the token postings
    (:func:`token_file_index`, which indexes MEMBERSHIP exactly but
    costs |vocab| x |files|): a bloom sidecar is CONSTANT bytes per file
    at a tunable false-positive rate, and false positives only cost
    extra planned files — the residual filter keeps answers exact.
    Relational representation means the index itself rides snapshots /
    incremental maintenance like any table, and — because every hash is
    the portable md5 fold above — replicates bit-identically in an
    external engine, false positives included (the x110 oracle
    hash-checks the ENTIRE filter)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    bits_arr = F.array(
        *[bloom_bit_expr(F.col(key_col), j, bits) for j in range(k)]
    )
    return (
        df.select(F.input_file_name().alias("file"), F.explode(bits_arr).alias("b"))
        .select(
            "file",
            F.floor(F.col("b") / 32).cast("long").alias("w"),
            # F.shiftleft only takes a literal shift; the SQL form takes
            # a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b % 32 AS INT))").alias("_bit"),
        )
        .groupBy("file", "w")
        .agg(F.bit_or("_bit").alias("word"))
    )


def bloom_pruned_lookup(
    spark: SparkSession,
    index: "DataFrame",
    value,
    key_col: str,
    bits: int = 4096,
    k: int = 3,
    max_files: int = 100_000,
) -> tuple["DataFrame", int]:
    """Point lookup planned through the bloom sidecar: a file is read
    only if EVERY probe bit is set in its filter. Returns (matching
    rows, files planned). The planning collect is bounded at
    |files| x k rows (metadata scale) and hard-capped by ``max_files``
    like the token search — a saturated filter (bits ~ keys) plans
    everything and prunes nothing; size ``bits`` to the per-file key
    cardinality. The residual equality filter keeps the answer exact:
    the bloom prunes, it never decides."""
    from pyspark.sql import functions as F

    need = bloom_probe_bits(value, bits, k)
    rows = index.filter(
        F.col("w").isin([w for w, _ in need])
    ).collect()  # bounded: <= |files| * k rows of metadata
    words: dict[str, dict[int, int]] = {}
    for r in rows:
        words.setdefault(r["file"], {})[r["w"]] = r["word"]
    planned = sorted(
        f
        for f, ws in words.items()
        if all(w in ws and (ws[w] >> s) & 1 for w, s in need)
    )
    if len(planned) > max_files:
        raise ValueError(
            f"bloom filter plans {len(planned)} files (> max_files="
            f"{max_files}): saturated filter prunes nothing — raise `bits` "
            "or filter the full table instead"
        )
    if not planned:
        return spark.range(0).selectExpr("CAST(NULL AS string) AS _none"), 0
    hit = spark.read.parquet(*planned).filter(F.col(key_col) == F.lit(value))
    return hit, len(planned)

"""Minimal snapshot-versioned table layer over parquet: atomic commits,
time-travel reads, rollback, and vacuum — the transactional substrate
the CDC/digest operators (x41/x67) assume when they compare "the
corpus as of run N" with "as of run N+1", and the version isolation
the mutation family (x60 MERGE, st17 keyed upsert) publishes through.

The reference keeps exactly one previous snapshot as a flat file
(`data_extract_last.txt`, extract.py:115-132) and loses history beyond
that. A table format keeps EVERY version reachable: a commit is one
small JSON manifest listing the data files of that version, written
atomically (create-if-absent — two writers racing to the same version
number: exactly one wins, the loser retries on top of the winner's
commit, which is optimistic concurrency exactly as Delta/Iceberg do
it). Data files are immutable and shared across versions — an
overwrite does not delete the old files, it just publishes a manifest
that no longer references them, so time travel is a manifest read and
rollback is a new commit re-publishing an old file list (never a data
copy).

100 TB notes: manifests carry file PATHS + stats, not data — commits
are O(files-touched) metadata writes regardless of table size. Reads
plan from the manifest's explicit file list (no directory listing —
at millions of objects, listing IS the bottleneck manifests exist to
kill). Vacuum deletes only files unreachable from every retained
manifest. ALL metadata IO goes through the Hadoop FileSystem API
(fsio.py), so the same table runs on file:/, hdfs://, or s3a:// —
``FileSystem.create(path, overwrite=false)`` is the atomic commit
point on HDFS/local; on object stores it maps to a conditional PUT
(If-None-Match) or a lock service, protocol unchanged.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from nagios_custom_etl_spark import fsio


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first — re-read and retry."""


class SchemaMismatchError(RuntimeError):
    """The batch's schema differs from the table's recorded schema and
    evolution was not requested (or the change is a type change, which
    is never allowed — Delta/Iceberg semantics: columns may be added,
    never silently retyped)."""


def _schema_list(df: DataFrame) -> list[list[str]]:
    """Manifest-recorded schema: ordered [name, simple type] pairs —
    JSON-stable and sufficient to reconcile heterogeneous data files."""
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def _merged_schema(
    parent: list[list[str]] | None, new: list[list[str]], evolve: bool
) -> list[list[str]]:
    """Table schema after committing a batch with schema ``new`` onto a
    table with schema ``parent``: identical -> unchanged; added/omitted
    columns -> allowed only with ``evolve`` (added columns go to the end,
    omitted ones stay — old files simply lack the new columns and new
    files lack the omitted ones; reads reconcile both with NULLs); a
    TYPE change is refused unconditionally."""
    if parent is None:
        return [list(x) for x in new]
    pt = {n: t for n, t in parent}
    nt = {n: t for n, t in new}
    retyped = sorted(n for n in pt.keys() & nt.keys() if pt[n] != nt[n])
    if retyped:
        raise SchemaMismatchError(f"type change on {retyped} is not allowed")
    added = [[n, t] for n, t in new if n not in pt]
    omitted = [n for n, _ in parent if n not in nt]
    if (added or omitted) and not evolve:
        raise SchemaMismatchError(
            f"schema drift (added {[n for n, _ in added]}, omitted {omitted}); "
            "pass evolve=True to evolve the table schema"
        )
    return [list(x) for x in parent] + added


def _snap_dir(root: str) -> str:
    return f"{root}/_snapshots"


def _manifest_path(root: str, version: int) -> str:
    return f"{_snap_dir(root)}/v{version:08d}.json"


def _manifest_versions(spark: SparkSession, root: str) -> list[int]:
    """Versions whose manifest file EXISTS (vacuum drops expired ones,
    so this is not a contiguous range)."""
    return sorted(
        int(f[1:9])
        for f in fsio.list_names(spark, _snap_dir(root))
        if f.startswith("v") and f.endswith(".json")
    )


def latest_version(spark: SparkSession, root: str) -> int:
    """Highest committed version, 0 if the table is empty."""
    vs = _manifest_versions(spark, root)
    return vs[-1] if vs else 0


def _read_manifest(spark: SparkSession, root: str, version: int) -> dict:
    return json.loads(fsio.read_text(spark, _manifest_path(root, version)))


def _commit(
    spark: SparkSession,
    root: str,
    files: list[str],
    op: str,
    parent: int,
    stats: dict | None = None,
    schema: list[list[str]] | None = None,
    txn: str | None = None,
) -> int:
    """Publish ``files`` as version ``parent + 1`` atomically.

    Create-if-absent of the manifest is the commit point: the filesystem
    arbitrates racing writers, exactly one sees the version appear under
    its pen. Losers get ConcurrentCommitError and must retry against the
    new latest (re-running their conflict check — optimistic
    concurrency)."""
    fsio.mkdirs(spark, _snap_dir(root))
    version = parent + 1
    manifest = {
        "version": version,
        "parent": parent,
        "op": op,
        "files": sorted(files),
        "stats": {f: stats[f] for f in sorted(stats)} if stats else {},
        "committed_at": time.time(),
    }
    if schema is not None:
        manifest["schema"] = schema
    if txn is not None:
        manifest["txn"] = txn
    try:
        fsio.create_text_atomic(spark, _manifest_path(root, version), json.dumps(manifest))
    except FileExistsError as ex:
        raise ConcurrentCommitError(
            f"version {version} was committed by another writer"
        ) from ex
    return version


def _file_stats(spark: SparkSession, path: str, sub: str, stats_cols: list[str]) -> dict:
    """Per-file min/max for ``stats_cols`` in ONE distributed aggregate
    over the just-written directory (grouped on input_file_name — a
    map-side-combinable pass over only the stat columns). Returned keyed
    by manifest-relative path. Numeric columns only: the values live in
    JSON manifests and must compare exactly after a round trip."""
    from pyspark.sql import functions as F

    aggs = []
    for c in stats_cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("_f"))
        .agg(*aggs)
        .collect()  # bounded: one row per written file (manifest metadata)
    )
    return {
        f"{sub}/{r['_f'].rsplit('/', 1)[-1]}": {
            c: [r[f"_min_{c}"], r[f"_max_{c}"]] for c in stats_cols
        }
        for r in rows
    }


def _write_data_files(
    df: DataFrame, root: str, stats_cols: list[str] | None = None
) -> tuple[list[str], dict]:
    """Write ``df`` into an immutable uniquely-named data directory and
    return (part files as relative paths, per-file stats). Files are
    never rewritten or renamed after this — manifests may share them
    across versions."""
    spark = df.sparkSession
    sub = f"data-{uuid.uuid4().hex[:12]}"
    df.write.parquet(f"{root}/{sub}")
    files = [
        f"{sub}/{f}"
        for f in fsio.list_names(spark, f"{root}/{sub}")
        if f.endswith(".parquet")
    ]
    stats = _file_stats(spark, f"{root}/{sub}", sub, stats_cols) if stats_cols else {}
    return files, stats


def append(
    df: DataFrame,
    root: str,
    stats_cols: list[str] | None = None,
    evolve: bool = False,
    txn: str | None = None,
) -> int:
    """Commit a new version = parent's files + ``df``'s new files.
    Parent files keep their recorded stats; new files add theirs. The
    batch's schema is enforced against the table's recorded schema:
    drift raises :class:`SchemaMismatchError` unless ``evolve=True``,
    which records the merged schema (added columns appended; reads
    reconcile heterogeneous files with NULLs — Delta mergeSchema
    semantics). Type changes are refused unconditionally.

    ``txn`` is an idempotence token recorded in the manifest (Delta's
    ``txn``/``setTransaction`` action): a writer that may retry the
    same logical batch checks :func:`txn_version` first and skips the
    commit if its token already landed — exactly-once for streaming
    foreachBatch sinks whose batch id is replayed on recovery."""
    spark = df.sparkSession
    if txn is not None and txn_version(spark, root, txn) is not None:
        raise ValueError(f"txn {txn!r} already committed; check txn_version first")
    parent = latest_version(spark, root)
    m = _read_manifest(spark, root, parent) if parent else {}
    base, base_stats = m.get("files", []), m.get("stats", {})
    schema = _merged_schema(m.get("schema"), _schema_list(df), evolve)
    files, stats = _write_data_files(df, root, stats_cols)
    return _commit(
        spark, root, base + files, "append", parent, {**base_stats, **stats}, schema, txn=txn
    )


def txn_version(spark: SparkSession, root: str, txn: str) -> int | None:
    """Version that recorded idempotence token ``txn``, or None.

    O(retained manifests) metadata reads — at 100 TB the scan is over
    small JSON files, and a long-lived writer caches the answer: a
    token is immutable once committed. Retention caveat (same as
    Delta's setTransaction): vacuum drops expired manifests and their
    tokens with them, so a replay arriving LATER than the vacuum
    horizon would re-commit — keep the vacuum window longer than any
    possible stream-recovery gap."""
    for v in reversed(_manifest_versions(spark, root)):
        if _read_manifest(spark, root, v).get("txn") == txn:
            return v
    return None


def overwrite(
    df: DataFrame,
    root: str,
    stats_cols: list[str] | None = None,
    txn: str | None = None,
) -> int:
    """Commit a new version referencing ONLY ``df``'s files. The
    replaced files stay on disk, reachable through older manifests —
    that is what makes time travel free. An overwrite redefines the
    table, so it records ``df``'s schema wholesale (Delta's
    overwriteSchema path). ``txn`` is the same idempotence token as
    :func:`append`'s — a read-merge-overwrite maintainer records its
    batch id so a replayed batch is provably skippable."""
    spark = df.sparkSession
    if txn is not None and txn_version(spark, root, txn) is not None:
        raise ValueError(f"txn {txn!r} already committed; check txn_version first")
    parent = latest_version(spark, root)
    files, stats = _write_data_files(df, root, stats_cols)
    return _commit(spark, root, files, "overwrite", parent, stats, _schema_list(df), txn=txn)


def read_snapshot(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Read the table as of ``version`` (default: latest). Plans from
    the manifest's explicit file list — no directory listing."""
    v = latest_version(spark, root) if version is None else version
    m = _read_manifest(spark, root, v)
    if not m["files"]:
        raise ValueError(f"version {v} is empty")
    return _read_files(spark, root, m["files"], m.get("schema"))


def _read_files(
    spark: SparkSession, root: str, files: list[str], schema: list[list[str]] | None
) -> DataFrame:
    """Plan a read over manifest-listed files. With a recorded table
    schema the files may be heterogeneous (schema evolution):
    mergeSchema unions the footers, columns absent from EVERY planned
    file are materialized as typed NULLs, and the projection is pinned
    to the manifest's column order — so every reader sees the table
    schema regardless of which files survived pruning."""
    if schema is None:
        return spark.read.parquet(*[f"{root}/{f}" for f in files])
    from pyspark.sql import functions as F

    df = spark.read.option("mergeSchema", "true").parquet(
        *[f"{root}/{f}" for f in files]
    )
    cols = [
        F.col(n) if n in df.columns else F.lit(None).cast(t).alias(n)
        for n, t in schema
    ]
    return df.select(*cols)


def read_snapshot_pruned(
    spark: SparkSession,
    root: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Read a snapshot planning ONLY the files whose recorded
    [min, max] for ``col`` intersects [lo, hi] — the Delta/Iceberg
    data-skipping read, resolved at manifest-planning time with zero
    file opens. Files without recorded stats are conservatively kept.
    Returns (DataFrame, files_planned, files_total); the caller applies
    the residual predicate (pruning is a superset guarantee, not a
    filter). At 100 TB this is the difference between scheduling the
    hundreds of files a day-range predicate touches and opening every
    footer in a million-object table."""
    v = latest_version(spark, root) if version is None else version
    m = _read_manifest(spark, root, v)
    stats = m.get("stats", {})

    def overlaps(f: str) -> bool:
        s = stats.get(f, {}).get(col)
        if not s or s[0] is None or s[1] is None:
            return True
        return not (s[1] < lo or s[0] > hi)

    planned = [f for f in m["files"] if overlaps(f)]
    if not planned:
        df = read_snapshot(spark, root, v).limit(0)
        return df, 0, len(m["files"])
    return (
        _read_files(spark, root, planned, m.get("schema")),
        len(planned),
        len(m["files"]),
    )


def rollback(spark: SparkSession, root: str, to_version: int) -> int:
    """Publish an old version's file list as a NEW version (history is
    append-only; a rollback is itself a commit, never an erasure)."""
    m = _read_manifest(spark, root, to_version)
    return _commit(
        spark,
        root,
        m["files"],
        f"rollback-to-{to_version}",
        latest_version(spark, root),
        m.get("stats", {}),
        m.get("schema"),
    )


def merge_commit(
    root: str,
    source: DataFrame,
    keys: list[str],
    when_matched_update=None,
    max_retries: int = 3,
) -> int:
    """MERGE a change batch into the table's LATEST snapshot and publish
    the result as a new version — the snapshot-isolated form of the
    mutation family (operators/merge.py): writers never rewrite files a
    reader could be planning from; a version-pinned reader re-reading
    mid-upsert sees its snapshot byte-identical, and the new state only
    becomes visible at the atomic manifest commit.

    Optimistic concurrency: data files are written FIRST (expensive,
    conflict-free), then the manifest commit arbitrates; on
    ConcurrentCommitError the merge re-runs against the new latest (the
    just-written files are orphaned — unreachable from any manifest, so
    harmless to readers; a Delta-style orphan-file GC reclaims them).
    First commit on an empty table inserts the batch as version 1.
    """
    from nagios_custom_etl_spark.operators.merge import merge_upsert

    spark = source.sparkSession
    last_err: Exception | None = None
    for _ in range(max_retries):
        parent = latest_version(spark, root)
        if parent == 0:
            merged = source
        else:
            merged = merge_upsert(
                read_snapshot(spark, root, parent),
                source,
                keys=keys,
                when_matched_update=when_matched_update,
            )
        files, _ = _write_data_files(merged, root)
        try:
            return _commit(spark, root, files, "merge", parent, None, _schema_list(merged))
        except ConcurrentCommitError as ex:  # lost the race: retry on new latest
            last_err = ex
    raise last_err  # type: ignore[misc]


def vacuum(spark: SparkSession, root: str, keep_last: int = 2) -> list[str]:
    """Delete data files unreachable from every retained manifest (the
    newest ``keep_last`` EXISTING versions) and drop the expired
    manifests. Returns the deleted files. Time travel older than the
    retention window is gone after this — exactly Delta VACUUM's
    contract. Idempotent: re-running after earlier vacuums skips
    already-dropped manifests instead of crashing on them."""
    versions = _manifest_versions(spark, root)
    keep_versions = set(versions[-keep_last:]) if keep_last > 0 else set()
    reachable: set[str] = set()
    for v in keep_versions:
        reachable.update(_read_manifest(spark, root, v)["files"])
    deleted = []
    for v in versions:
        if v in keep_versions:
            continue
        for f in _read_manifest(spark, root, v)["files"]:
            if f not in reachable and fsio.delete(spark, f"{root}/{f}", recursive=False):
                deleted.append(f)
        fsio.delete(spark, _manifest_path(root, v), recursive=False)
    return sorted(set(deleted))


def gc_orphans(spark: SparkSession, root: str) -> list[str]:
    """Delete data files referenced by NO manifest — the obverse of
    :func:`vacuum` (which expires OLD versions): orphans are files a
    writer produced before LOSING a commit race (merge_commit writes
    data first, then arbitrates) or before crashing mid-commit. Safe by
    the commit protocol: a file absent from every manifest can never
    BECOME referenced (a commit only references files its own writer
    just wrote under a fresh uuid directory), so deleting it cannot
    race a reader or a writer. Returns the deleted relative paths.

    This is the maintenance job Delta spells ``VACUUM`` for
    un-committed files; it must LIST the data directories (the one
    place listing is unavoidable — orphans are by definition outside
    all metadata), which is why it runs as a scheduled job, never on
    the read path. Empty orphaned directories are removed with their
    files."""
    reachable: set[str] = set()
    for v in _manifest_versions(spark, root):
        reachable.update(_read_manifest(spark, root, v)["files"])
    deleted = []
    for d in fsio.list_names(spark, root):
        if not d.startswith("data-"):
            continue
        names = fsio.list_names(spark, f"{root}/{d}")
        live = False
        for f in names:
            rel = f"{d}/{f}"
            if f.endswith(".parquet"):
                if rel in reachable:
                    live = True
                elif fsio.delete(spark, f"{root}/{rel}", recursive=False):
                    deleted.append(rel)
        if not live:
            fsio.delete(spark, f"{root}/{d}", recursive=True)
    return sorted(deleted)


def read_incremental(
    spark: SparkSession, root: str, since_version: int, to_version: int | None = None
) -> DataFrame:
    """Read ONLY the rows added after ``since_version`` (exclusive) up
    to ``to_version`` (inclusive, default latest) — the Iceberg
    incremental-append scan / Delta change-feed read for append-only
    histories. Because data files are immutable and appends only ever
    ADD files, the row delta between two versions is exactly the
    file-set difference of their manifests: the scan plans and reads
    O(new files), touches zero old data, and needs no row-level diffing
    at all. This is how a downstream consumer (an incremental MV
    refresh, x71; a streaming backfill) keeps up with a 100 TB table by
    reading megabytes per cycle.

    Soundness requires every commit in the range to be an append —
    an overwrite or rollback breaks "newer files == newer rows" — so
    the chain is checked and non-append histories are refused (consume
    a mutating table through x41's snapshot CDC instead). A vacuumed
    (missing) manifest inside the range is likewise refused: the
    append-only proof cannot be reconstructed."""
    v_to = latest_version(spark, root) if to_version is None else to_version
    if v_to < since_version:
        raise ValueError(f"to_version {v_to} precedes since_version {since_version}")
    present = set(_manifest_versions(spark, root))
    for v in range(since_version + 1, v_to + 1):
        if v not in present:
            raise ValueError(f"version {v} was vacuumed; append-only chain unprovable")
        op = _read_manifest(spark, root, v)["op"]
        if op != "append":
            raise ValueError(f"version {v} is '{op}', not append: incremental read unsound")
    cur = _read_manifest(spark, root, v_to)["files"]
    base = set(_read_manifest(spark, root, since_version)["files"]) if since_version else set()
    new = [f for f in cur if f not in base]
    if not new:
        return read_snapshot(spark, root, v_to).limit(0)
    return spark.read.parquet(*[f"{root}/{f}" for f in new])

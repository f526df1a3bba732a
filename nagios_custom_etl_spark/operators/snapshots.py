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


def _commit(spark: SparkSession, root: str, files: list[str], op: str, parent: int) -> int:
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
        "committed_at": time.time(),
    }
    try:
        fsio.create_text_atomic(spark, _manifest_path(root, version), json.dumps(manifest))
    except FileExistsError as ex:
        raise ConcurrentCommitError(
            f"version {version} was committed by another writer"
        ) from ex
    return version


def _write_data_files(df: DataFrame, root: str) -> list[str]:
    """Write ``df`` into an immutable uniquely-named data directory and
    return the part files (relative paths). Files are never rewritten or
    renamed after this — manifests may share them across versions."""
    spark = df.sparkSession
    sub = f"data-{uuid.uuid4().hex[:12]}"
    df.write.parquet(f"{root}/{sub}")
    return [
        f"{sub}/{f}"
        for f in fsio.list_names(spark, f"{root}/{sub}")
        if f.endswith(".parquet")
    ]


def append(df: DataFrame, root: str) -> int:
    """Commit a new version = parent's files + ``df``'s new files."""
    spark = df.sparkSession
    parent = latest_version(spark, root)
    base = _read_manifest(spark, root, parent)["files"] if parent else []
    return _commit(spark, root, base + _write_data_files(df, root), "append", parent)


def overwrite(df: DataFrame, root: str) -> int:
    """Commit a new version referencing ONLY ``df``'s files. The
    replaced files stay on disk, reachable through older manifests —
    that is what makes time travel free."""
    spark = df.sparkSession
    parent = latest_version(spark, root)
    return _commit(spark, root, _write_data_files(df, root), "overwrite", parent)


def read_snapshot(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Read the table as of ``version`` (default: latest). Plans from
    the manifest's explicit file list — no directory listing."""
    v = latest_version(spark, root) if version is None else version
    m = _read_manifest(spark, root, v)
    if not m["files"]:
        raise ValueError(f"version {v} is empty")
    return spark.read.parquet(*[f"{root}/{f}" for f in m["files"]])


def rollback(spark: SparkSession, root: str, to_version: int) -> int:
    """Publish an old version's file list as a NEW version (history is
    append-only; a rollback is itself a commit, never an erasure)."""
    files = _read_manifest(spark, root, to_version)["files"]
    return _commit(
        spark, root, files, f"rollback-to-{to_version}", latest_version(spark, root)
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
        files = _write_data_files(merged, root)
        try:
            return _commit(spark, root, files, "merge", parent)
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

"""Minimal snapshot-versioned table layer over parquet: atomic commits,
time-travel reads, rollback, and vacuum — the transactional substrate
the CDC/digest operators (x41/x67) assume when they compare "the
corpus as of run N" with "as of run N+1".

The reference keeps exactly one previous snapshot as a flat file
(`data_extract_last.txt`, extract.py:115-132) and loses history beyond
that. A table format keeps EVERY version reachable: a commit is one
small JSON manifest listing the data files of that version, written
atomically (O_EXCL create — two writers racing to the same version
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
manifest. On object stores without atomic create, the same protocol
runs against a conditional-put (S3 If-None-Match) or a lock service;
the JSON layout here is the local-filesystem instance of it.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first — re-read and retry."""


def _snap_dir(root: str) -> str:
    return os.path.join(root, "_snapshots")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_snap_dir(root), f"v{version:08d}.json")


def latest_version(root: str) -> int:
    """Highest committed version, 0 if the table is empty."""
    d = _snap_dir(root)
    if not os.path.isdir(d):
        return 0
    versions = [
        int(f[1:9]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions, default=0)


def _read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as fh:
        return json.load(fh)


def _commit(root: str, files: list[str], op: str, parent: int) -> int:
    """Publish ``files`` as version ``parent + 1`` atomically.

    O_EXCL create of the manifest is the commit point: the filesystem
    arbitrates racing writers, exactly one sees the version appear under
    its pen. Losers get ConcurrentCommitError and must retry against the
    new latest (re-running their conflict check — optimistic
    concurrency)."""
    os.makedirs(_snap_dir(root), exist_ok=True)
    version = parent + 1
    manifest = {
        "version": version,
        "parent": parent,
        "op": op,
        "files": sorted(files),
        "committed_at": time.time(),
    }
    try:
        fd = os.open(_manifest_path(root, version), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as ex:
        raise ConcurrentCommitError(
            f"version {version} was committed by another writer"
        ) from ex
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
    return version


def _write_data_files(df: DataFrame, root: str) -> list[str]:
    """Write ``df`` into an immutable uniquely-named data directory and
    return the part files (relative paths). Files are never rewritten or
    renamed after this — manifests may share them across versions."""
    sub = f"data-{uuid.uuid4().hex[:12]}"
    df.write.parquet(os.path.join(root, sub))
    return [
        os.path.join(sub, f)
        for f in os.listdir(os.path.join(root, sub))
        if f.endswith(".parquet")
    ]


def append(df: DataFrame, root: str) -> int:
    """Commit a new version = parent's files + ``df``'s new files."""
    parent = latest_version(root)
    base = _read_manifest(root, parent)["files"] if parent else []
    return _commit(root, base + _write_data_files(df, root), "append", parent)


def overwrite(df: DataFrame, root: str) -> int:
    """Commit a new version referencing ONLY ``df``'s files. The
    replaced files stay on disk, reachable through older manifests —
    that is what makes time travel free."""
    parent = latest_version(root)
    return _commit(root, _write_data_files(df, root), "overwrite", parent)


def read_snapshot(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Read the table as of ``version`` (default: latest). Plans from
    the manifest's explicit file list — no directory listing."""
    v = latest_version(root) if version is None else version
    m = _read_manifest(root, v)
    if not m["files"]:
        raise ValueError(f"version {v} is empty")
    return spark.read.parquet(*[os.path.join(root, f) for f in m["files"]])


def rollback(root: str, to_version: int) -> int:
    """Publish an old version's file list as a NEW version (history is
    append-only; a rollback is itself a commit, never an erasure)."""
    files = _read_manifest(root, to_version)["files"]
    return _commit(root, files, f"rollback-to-{to_version}", latest_version(root))


def vacuum(root: str, keep_last: int = 2) -> list[str]:
    """Delete data files unreachable from every retained manifest (the
    newest ``keep_last`` versions) and drop the expired manifests.
    Returns the deleted files. Time travel older than the retention
    window is gone after this — exactly Delta VACUUM's contract."""
    latest = latest_version(root)
    keep_versions = [v for v in range(max(1, latest - keep_last + 1), latest + 1)]
    reachable: set[str] = set()
    for v in keep_versions:
        reachable.update(_read_manifest(root, v)["files"])
    deleted = []
    for v in range(1, latest + 1):
        if v in keep_versions:
            continue
        for f in _read_manifest(root, v)["files"]:
            if f not in reachable:
                p = os.path.join(root, f)
                if os.path.exists(p):
                    os.remove(p)
                    deleted.append(f)
        os.remove(_manifest_path(root, v))
    return sorted(set(deleted))

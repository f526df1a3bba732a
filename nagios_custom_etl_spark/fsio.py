"""Small-file and metadata IO through the Hadoop FileSystem API.

Everything here goes through ``Path.getFileSystem(hadoopConf)``, so the
same code runs against whatever scheme the cluster can reach — file:/,
hdfs://, s3a://, abfss:// — instead of the driver's local disk. A 100 TB
table lives on an object store or HDFS; any component that touches its
manifests/sidecars with ``os.*`` simply does not run there. The ANN index
sidecar (operators/similarity.py) and the snapshot manifest layer
(operators/snapshots.py) both route through this module.

The one primitive object stores make awkward — atomic create-if-absent —
is exposed as :func:`create_text_atomic`. It is two-phase so a reader can
never observe a torn commit: the full content is written under a temp
name first, then renamed into place with ``FileContext.rename(...,
Rename.NONE)`` — the no-overwrite rename Delta's HDFSLogStore commits
through. The rename is the commit point: the destination either does not
exist or holds COMPLETE content, and of two racing writers exactly one
wins (the loser gets :class:`FileExistsError`). On HDFS the no-overwrite
check is enforced server-side in one namenode op; on raw local FS it is
check-then-rename (the same guarantee Delta accepts for ``file:/``); on
S3A it maps to a conditional PUT (If-None-Match) on recent Hadoop, else
the caller layers a lock service — protocol unchanged either way.
"""

from __future__ import annotations

import uuid

from py4j.protocol import Py4JJavaError


def _fs(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def write_text(spark, path: str, text: str) -> None:
    """Write (overwrite) a small text file."""
    fs, jpath, _ = _fs(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def create_text_atomic(spark, path: str, text: str) -> None:
    """Create ``path`` with ``text`` iff it does not already exist.

    Two-phase (see module docstring): content lands complete under a
    sibling ``_tmp_*`` name, then a no-overwrite ``FileContext.rename``
    moves it into place — so the destination path NEVER holds partial
    content (the old create-then-write form exposed an empty/torn
    window a concurrent ``latest_version`` + manifest read could hit).
    Raises :class:`FileExistsError` for the loser of a commit race (its
    temp file is cleaned up); other IO failures propagate unchanged. A
    writer that crashes before rename leaves only a ``_tmp_*`` file,
    which readers ignore and the orphan GC sweeps.
    """
    fs, jpath, jvm = _fs(spark, path)
    qual = fs.makeQualified(jpath)
    tmp = fs.makeQualified(
        jvm.org.apache.hadoop.fs.Path(jpath.getParent(), f"_tmp_{uuid.uuid4().hex}")
    )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    gw = spark.sparkContext._gateway
    rename_cls = jvm.org.apache.hadoop.fs.Options.Rename
    opts = gw.new_array(rename_cls, 1)
    opts[0] = rename_cls.NONE
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        qual.toUri(), spark._jsc.hadoopConfiguration()
    )
    try:
        fc.rename(tmp, qual, opts)
    except Py4JJavaError as ex:
        fs.delete(tmp, False)
        jex = ex.java_exception
        name = jex.getClass().getName() if jex is not None else ""
        msg = str(jex.getMessage() or "") if jex is not None else ""
        if "AlreadyExists" in name or "already exists" in msg.lower():
            raise FileExistsError(path) from ex
        raise


def rename_nooverwrite(spark, src: str, dst: str) -> None:
    """Atomically rename ``src`` to ``dst``, failing if ``dst`` exists —
    the same no-overwrite ``FileContext.rename`` the manifest commit
    uses, exposed for ARBITRATION: of N processes racing to claim a
    file (e.g. WAP publish vs abort claiming the staged manifest),
    exactly one rename succeeds; losers get :class:`FileExistsError`
    (dst taken) or :class:`FileNotFoundError` (src already claimed
    away). Both src and dst must share a filesystem (same table root
    in practice)."""
    fs, jsrc, jvm = _fs(spark, src)
    qsrc = fs.makeQualified(jsrc)
    qdst = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(dst))
    gw = spark.sparkContext._gateway
    rename_cls = jvm.org.apache.hadoop.fs.Options.Rename
    opts = gw.new_array(rename_cls, 1)
    opts[0] = rename_cls.NONE
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        qsrc.toUri(), spark._jsc.hadoopConfiguration()
    )
    try:
        fc.rename(qsrc, qdst, opts)
    except Py4JJavaError as ex:
        jex = ex.java_exception
        name = jex.getClass().getName() if jex is not None else ""
        msg = str(jex.getMessage() or "") if jex is not None else ""
        if "NotFound" in name or "does not exist" in msg.lower():
            raise FileNotFoundError(src) from ex
        if "AlreadyExists" in name or "already exists" in msg.lower():
            raise FileExistsError(dst) from ex
        raise


def read_text(spark, path: str) -> str:
    fs, jpath, jvm = _fs(spark, path)
    stream = fs.open(jpath)
    try:
        reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(stream, "UTF-8"))
        chunks = []
        line = reader.readLine()
        while line is not None:
            chunks.append(line)
            line = reader.readLine()
        return "\n".join(chunks)
    finally:
        stream.close()


def exists(spark, path: str) -> bool:
    fs, jpath, _ = _fs(spark, path)
    return bool(fs.exists(jpath))


def delete(spark, path: str, recursive: bool = True) -> bool:
    """Delete a path; returns False if it was already absent."""
    fs, jpath, _ = _fs(spark, path)
    return bool(fs.delete(jpath, recursive))


def mkdirs(spark, path: str) -> None:
    fs, jpath, _ = _fs(spark, path)
    fs.mkdirs(jpath)


def list_names(spark, path: str) -> list[str]:
    """Basenames of a directory's children ([] if the dir is absent) —
    used only on METADATA directories (manifests, one data subdir);
    table reads never list, they plan from explicit manifest file lists."""
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(jpath))


def list_files_recursive(spark, path: str) -> list[str]:
    """Relative paths of every FILE under ``path``, at any depth ([] if
    the dir is absent). Metadata-scale use only (orphan GC's walk of one
    data directory; partitioned data dirs hold ``col=val`` subdirs)."""
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return []
    base = str(fs.makeQualified(jpath).toUri().getPath()).rstrip("/")
    out = []
    it = fs.listFiles(jpath, True)  # recursive RemoteIterator
    while it.hasNext():
        st = it.next()
        full = str(st.getPath().toUri().getPath())
        out.append(full[len(base) + 1 :])
    return sorted(out)


def mtime_ms(spark, path: str) -> int:
    """Modification time of a path in epoch millis — the retention
    signal orphan GC uses to spare files an in-flight writer just wrote
    but has not yet committed (Delta VACUUM's retention check)."""
    fs, jpath, _ = _fs(spark, path)
    return int(fs.getFileStatus(jpath).getModificationTime())


def file_size(spark, path: str) -> int:
    """Byte length of a file — the AddFile ``size`` every table format
    records; compact_small's bin-packing input."""
    fs, jpath, _ = _fs(spark, path)
    return int(fs.getFileStatus(jpath).getLen())

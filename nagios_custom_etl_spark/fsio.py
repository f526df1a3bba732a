"""Small-file and metadata IO through the Hadoop FileSystem API.

Everything here goes through ``Path.getFileSystem(hadoopConf)``, so the
same code runs against whatever scheme the cluster can reach — file:/,
hdfs://, s3a://, abfss:// — instead of the driver's local disk. A 100 TB
table lives on an object store or HDFS; any component that touches its
manifests/sidecars with ``os.*`` simply does not run there. The ANN index
sidecar (operators/similarity.py) and the snapshot manifest layer
(operators/snapshots.py) both route through this module.

The one primitive object stores make awkward — atomic create-if-absent —
is exposed as :func:`create_text_atomic`: ``FileSystem.create(path,
overwrite=false)`` raises when the path exists, which on HDFS / local FS
arbitrates racing writers exactly like ``O_CREAT|O_EXCL``. On S3A the
same call maps to a conditional PUT (If-None-Match) on recent Hadoop,
else the caller layers a lock service; the protocol is unchanged.
"""

from __future__ import annotations

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

    The create call is the atomic commit point (the filesystem
    arbitrates racing writers); raises :class:`FileExistsError` for the
    loser. Other IO failures propagate unchanged.
    """
    fs, jpath, _ = _fs(spark, path)
    try:
        out = fs.create(jpath, False)
    except Py4JJavaError as ex:
        jex = ex.java_exception
        name = jex.getClass().getName() if jex is not None else ""
        msg = str(jex.getMessage() or "") if jex is not None else ""
        if "AlreadyExists" in name or "already exists" in msg.lower():
            raise FileExistsError(path) from ex
        raise
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


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

"""InfluxDB time-series sink (SURVEY §2.2 K5).

No Influx connector ships with Spark, so the sink is (1) a pure Column
expression rendering InfluxDB line protocol — measurement,tags fields
timestamp, seconds precision like the reference's ``time_precision='s'``
(/root/reference/url_service_status_InfluxDB_insert.py:155) — and (2) a
``foreachPartition``/``foreachBatch`` writer that POSTs rendered lines in
batches through an injected ``post`` callable (tests collect; production
posts to /write?db=...&precision=s).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_tag(c: Column) -> Column:
    # line protocol: tag keys/values escape commas, equals, spaces
    out = F.regexp_replace(c, r"([,= ])", r"\\$1")
    return out


def _escape_field_str(c: Column) -> Column:
    # string field values: escape backslash and double quote, then quote
    return F.concat(
        F.lit('"'),
        F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), r'"', r'\\"'),
        F.lit('"'),
    )


def line_protocol(
    measurement: str | Column,
    tags: dict[str, Column],
    fields: dict[str, tuple[str, Column]],
    time_s: Column,
) -> Column:
    """Render one line-protocol point per row (seconds precision).

    Tags sorted by key (Influx best practice). ``fields`` values are
    (kind, column) with kind in {"int", "float", "str"} — explicit, since
    line protocol renders 42i / 4.2 / "x" differently and silent type
    mis-inference corrupts the series.
    """
    m = F.lit(measurement) if isinstance(measurement, str) else measurement
    parts: list[Column] = [m]
    for k in sorted(tags):
        parts.append(F.concat(F.lit(f",{k}="), _escape_tag(tags[k].cast("string"))))
    head = F.concat(*parts)

    field_parts: list[Column] = []
    for i, (k, (kind, v)) in enumerate(fields.items()):
        if kind == "int":
            rendered = F.concat(v.cast("bigint").cast("string"), F.lit("i"))
        elif kind == "float":
            rendered = v.cast("double").cast("string")
        elif kind == "str":
            rendered = _escape_field_str(v.cast("string"))
        else:
            raise ValueError(f"unknown field kind {kind!r} for {k!r}")
        prefix = F.lit(("" if i == 0 else ",") + k + "=")
        field_parts.append(F.concat(prefix, rendered))
    return F.concat(head, F.lit(" "), F.concat(*field_parts), F.lit(" "), time_s.cast("string"))


def influx_batch_writer(
    post: Callable[[list[str]], None], line_col: str = "line", batch_size: int = 5000
):
    """foreachBatch-compatible writer: partitions stream their rendered
    lines to ``post`` in bounded batches — executor-side, no driver
    collect."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        def send(rows: Iterable) -> None:
            buf: list[str] = []
            for r in rows:
                buf.append(r[line_col])
                if len(buf) >= batch_size:
                    post(buf)
                    buf = []
            if buf:
                post(buf)

        batch_df.select(line_col).foreachPartition(send)

    return write


# ---------------------------------------------------------------------------
# K5 as a Spark 4 Python DataSource writer: df.write.format("influx_lines")
# ---------------------------------------------------------------------------


def register_influx_sink(spark) -> None:
    """Register 'influx_lines': a Spark 4 Python DataSource batch sink
    (``df.write.format("influx_lines").option("path", d).mode("append").save()``).

    Tasks spool rendered line-protocol points to `part-*.lp.tmp` files
    and return commit messages; the driver-side ``commit`` renames them
    and writes a `_MANIFEST` with the total point count — two-phase
    commit, so a partial job failure leaves no visible output (the same
    idempotent-sink contract the streaming sinks rely on for
    exactly-once, SURVEY §4). In production ``commit`` is where the spool
    is handed to the Influx POST loop — the reference's write_points +
    CSV tee (url_service_status_InfluxDB_insert.py:141-159), distributed.

    Options: ``path`` (spool dir, required), ``line_col`` (default
    'line'), ``jobid`` (manifest scope, default '0' — see below).

    Exactly-once across RETRIES and across DISTINCT jobs: each commit
    atomically replaces its own ``_MANIFEST-<jobid>`` listing exactly
    that job's part files. Re-running the same jobid (the retry path —
    from ``foreachBatch`` pass the micro-batch id) supersedes only its
    own manifest, so a crash between task renames and the manifest write
    never double-delivers; a different jobid appends alongside committed
    history. Consumers (``read_committed_lines``) read the union of
    manifests and only manifest-listed files.
    """
    from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

    class LinesCommit(WriterCommitMessage):
        def __init__(self, path: str, n: int) -> None:
            self.path = path
            self.n = n

    class Writer(DataSourceWriter):
        def __init__(self, options: dict) -> None:
            self.path = options["path"]
            self.line_col = options.get("line_col", "line")
            self.jobid = options.get("jobid", "0")

        def write(self, iterator):
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            tmp = os.path.join(self.path, f"part-{uuid.uuid4().hex}.lp.tmp")
            n = 0
            with open(tmp, "w", encoding="utf-8") as f:
                for row in iterator:
                    f.write(row[self.line_col])
                    f.write("\n")
                    n += 1
            return LinesCommit(tmp, n)

        def commit(self, messages) -> None:
            import os

            total = 0
            committed: list[tuple[str, int]] = []
            for m in messages:
                if m.n == 0:
                    os.remove(m.path)
                    continue
                os.rename(m.path, m.path[: -len(".tmp")])
                total += m.n
                committed.append((os.path.basename(m.path[: -len(".tmp")]), m.n))
            # the per-job manifest atomically REPLACES any previous attempt
            # of the SAME jobid and lists exactly this job's files: a
            # consumer that reads only manifest-listed files
            # (read_committed_lines) sees each point exactly once even when
            # a prior attempt died mid-commit and left orphan part files
            # behind. Other jobids' manifests are untouched, so append-mode
            # history from earlier jobs (or earlier micro-batches, when
            # foreachBatch passes batch_id as jobid) stays committed.
            manifest = os.path.join(self.path, f"_MANIFEST-{self.jobid}")
            tmp_manifest = manifest + ".inprogress"
            with open(tmp_manifest, "w", encoding="utf-8") as f:
                f.write(f"points={total}\n")
                for name, n in committed:
                    f.write(f"file={name}:{n}\n")
            os.replace(tmp_manifest, manifest)

        def abort(self, messages) -> None:
            import os

            for m in messages:
                try:
                    os.remove(m.path)
                except OSError:
                    pass

    class Source(DataSource):
        @classmethod
        def name(cls) -> str:
            return "influx_lines"

        def writer(self, schema, overwrite: bool) -> DataSourceWriter:
            return Writer(self.options)

    spark.dataSource.register(Source)


def read_committed_lines(path: str) -> list[str]:
    """The exactly-once consumer contract for the 'influx_lines' spool:
    read ONLY files listed by the ``_MANIFEST-*`` files (all committed
    jobids, sorted; manifest order within each). Orphan
    ``part-*.lp``/``*.tmp`` files from an attempt that died mid-commit
    are invisible — the retried jobid's manifest supersedes them — so
    downstream POSTing from the spool never double-sends a point.
    Raises FileNotFoundError when no manifest exists (no committed job)."""
    import glob
    import os

    def _jobid_key(m: str) -> tuple:
        # numeric jobids (the foreachBatch batch-id path) replay in commit
        # order — lexicographic sorting would read job '10' before job '2'
        # (ADVICE r5); non-numeric jobids fall back to string order, after
        # all numeric ones, and cross-kind order is documented unspecified
        jobid = os.path.basename(m)[len("_MANIFEST-") :]
        return (0, int(jobid), "") if jobid.isdigit() else (1, 0, jobid)

    manifests = sorted(glob.glob(os.path.join(path, "_MANIFEST-*")), key=_jobid_key)
    manifests = [m for m in manifests if not m.endswith(".inprogress")]
    if not manifests:
        raise FileNotFoundError(f"no _MANIFEST-* in {path}: no committed job")
    lines: list[str] = []
    for manifest in manifests:
        with open(manifest, encoding="utf-8") as f:
            entries = [ln.strip() for ln in f if ln.startswith("file=")]
        for e in entries:
            name, expect_n = e[len("file=") :].rsplit(":", 1)
            with open(os.path.join(path, name), encoding="utf-8") as fh:
                got = fh.read().splitlines()
            if len(got) != int(expect_n):
                raise ValueError(
                    f"spool file {name} has {len(got)} lines, manifest says {expect_n}"
                )
            lines.extend(got)
    return lines

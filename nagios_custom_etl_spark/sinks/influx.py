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

"""Hidden partitioning via partition TRANSFORMS — Iceberg's flagship
table-format idea, over the snapshot layer (operators/snapshots.py).

Hive-style partitioning (x92/x106) makes the user own a physical layout
column: queries must mention it or lose pruning, and a mistake
(filtering on the raw timestamp instead of the derived date) silently
scans everything. A partition TRANSFORM instead declares the layout as
a FUNCTION of a data column — ``days(ts)``, ``bucket(n, key)`` — the
writer derives it, the reader never sees it (the derived column lives
only in path segments; :func:`~..snapshots.append`'s
``hidden_partition`` keeps it out of the recorded schema, so schema
projection drops it on every read), and predicates on the SOURCE column
prune through the transform.

The transform contract is recorded once in a write-once sidecar
(``_snapshots/transform.json``, atomic create like everything else):
every subsequent write re-derives the same function and refuses a
mismatch — the failure mode this kills is two writers partitioning the
same table by different date granularities.

Portability: ``bucket`` uses the md5 8-hex-char fold (the same
construction as the bloom sidecar / HLL registers), so an external
engine — and the x113 oracle — computes the identical bucket for every
key; ``days`` uses the UTC calendar date string, which DuckDB spells
``CAST(ts AS DATE)``. Both transforms produce partition path values
whose STRING comparison is order-correct (ISO dates lexicographically,
buckets by equality), which is what lets pruning ride the existing
``read_snapshot_pruned`` path-value machinery untyped.

At 100 TB: days(ts) bounds every daily restate / range query to the
touched partitions at manifest-planning time (zero file opens); bucket
(n, key) gives point lookups and storage-partitioned joins a fixed
fan-out regardless of key skew in TIME (hash spreads hot ranges), and
the bucket count is the shuffle-free join width (x72's bucketing,
declared at the table instead of per-write).

Reference behavior generalized: the reference splits output by content
class into per-type flat files (extract.py:115-132, load_to_db.py route
tables) — a hand-rolled, untyped partitioning this declares, checks,
and prunes through.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nagios_custom_etl_spark import fsio
from nagios_custom_etl_spark.operators import snapshots as S

_HEX = "0123456789abcdef"


def _fold8(col: Column, salt: str) -> Column:
    """md5 8-hex-char fold — identical bytes in Spark/DuckDB/hashlib
    (see operators/maintenance.py::bloom_bit_expr)."""
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    return sum(
        (F.instr(F.lit(_HEX), F.substring(h, i + 1, 1)) - 1).cast("long")
        * (16 ** (7 - i))
        for i in range(8)
    )


def days(source: str) -> dict:
    """Partition by UTC calendar day of a timestamp column."""
    return {"kind": "days", "source": source}


def bucket(source: str, n: int) -> dict:
    """Partition by portable hash bucket of a key column."""
    if n < 2:
        raise ValueError("bucket transform needs n >= 2")
    return {"kind": "bucket", "source": source, "n": int(n)}


def _pcol(t: dict) -> str:
    return f"_{t['source']}_{t['kind']}"


def _expr(t: dict) -> Column:
    src = F.col(t["source"])
    if t["kind"] == "days":
        return F.date_format(src, "yyyy-MM-dd")
    if t["kind"] == "bucket":
        return (_fold8(src, ":bkt") % t["n"]).cast("string")
    raise ValueError(f"unknown transform kind {t['kind']!r}")


def bucket_of(value, n: int) -> int:
    """Driver-side twin of the bucket expression (hashlib md5 — the
    same bytes), for planning point lookups without a Spark job."""
    return int(hashlib.md5(f"{value}:bkt".encode()).hexdigest()[:8], 16) % n


def _sidecar(root: str) -> str:
    return f"{root}/_snapshots/transform.json"


def _check_contract(spark: SparkSession, root: str, t: dict) -> None:
    path = _sidecar(root)
    if fsio.exists(spark, path):
        recorded = json.loads(fsio.read_text(spark, path))
        if recorded != t:
            raise ValueError(
                f"partition transform mismatch: table declares {recorded}, "
                f"write uses {t}"
            )
    else:
        fsio.mkdirs(spark, f"{root}/_snapshots")
        try:
            fsio.create_text_atomic(spark, path, json.dumps(t))
        except FileExistsError:
            _check_contract(spark, root, t)  # lost the race: re-validate


def write_transformed(
    df: DataFrame,
    root: str,
    transform: dict,
    mode: str = "append",
    stats_cols: list[str] | None = None,
    txn: str | None = None,
) -> int:
    """Append/overwrite ``df`` into a hidden-partitioned table: derive
    the transform column, write Hive layout on it, record the schema
    WITHOUT it. The transform is validated against the table's
    write-once sidecar contract first (fail before writing bytes)."""
    spark = df.sparkSession
    if transform["source"] not in df.columns:
        raise ValueError(f"transform source {transform['source']!r} not in batch")
    _check_contract(spark, root, transform)
    pcol = _pcol(transform)
    # fan-in by partition value so each value writes ONE file per commit
    # (without it, every task emits a sliver per value it holds —
    # tasks x values files). A single huge partition needing many files
    # is the auto-compaction / target-file-size knob's job, not this
    # writer's.
    out = df.withColumn(pcol, _expr(transform)).repartition(pcol)
    if mode == "append":
        return S.append(
            out, root, stats_cols=stats_cols, txn=txn,
            partition_by=pcol, hidden_partition=True,
        )
    if mode == "overwrite":
        return S.overwrite(
            out, root, stats_cols=stats_cols, txn=txn,
            partition_by=pcol, hidden_partition=True,
        )
    raise ValueError(f"unknown mode {mode!r}")


def read_transform(spark: SparkSession, root: str) -> dict:
    """The table's declared transform (from the sidecar contract)."""
    return json.loads(fsio.read_text(spark, _sidecar(root)))


def read_pruned_source_range(
    spark: SparkSession, root: str, lo, hi, version: int | None = None
) -> tuple[DataFrame, int, int]:
    """Read planning only the partitions a SOURCE-column range can
    touch — the predicate the user writes (on ts / on the key) prunes
    THROUGH the declared transform, which is the whole point of hidden
    partitioning. For ``days``, [lo, hi] timestamps map to the ISO date
    strings of their days (string order == date order); for ``bucket``,
    only equality is prunable so lo must equal hi (a key range hashes
    everywhere — that query scans, correctly). Returns (DataFrame,
    files_planned, files_total); apply the residual source predicate —
    pruning is a superset guarantee."""
    t = read_transform(spark, root)
    if t["kind"] == "days":
        p_lo, p_hi = str(lo)[:10], str(hi)[:10]
    elif t["kind"] == "bucket":
        if lo != hi:
            raise ValueError(
                "bucket transform prunes equality only: a key RANGE hashes "
                "to every bucket — run the full-table filter instead"
            )
        b = str(bucket_of(lo, t["n"]))
        p_lo = p_hi = b
    else:
        raise ValueError(f"unknown transform kind {t['kind']!r}")
    return S.read_snapshot_pruned(spark, root, _pcol(t), p_lo, p_hi, version)

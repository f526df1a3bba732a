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


def hours(source: str) -> dict:
    """Partition by UTC calendar hour of a timestamp column — the finer
    granularity a days() table typically EVOLVES to (Iceberg's
    days→hours spec evolution); 'yyyy-MM-dd-HH' strings compare in time
    order, so pruning rides the same untyped path machinery."""
    return {"kind": "hours", "source": source}


def bucket(source: str, n: int) -> dict:
    """Partition by portable hash bucket of a key column."""
    if n < 2:
        raise ValueError("bucket transform needs n >= 2")
    return {"kind": "bucket", "source": source, "n": int(n)}


def _pcol(t: dict, spec_id: int = 0) -> str:
    """Derived partition column name. Spec 0 keeps the legacy unsuffixed
    name; evolved specs suffix their id so every file's path segment
    identifies WHICH spec wrote it — the whole basis of mixed-spec
    planning (a bucket-4 and a bucket-8 value under one name would be
    indistinguishable)."""
    base = f"_{t['source']}_{t['kind']}"
    return base if spec_id == 0 else f"{base}{spec_id}"


def _expr(t: dict) -> Column:
    src = F.col(t["source"])
    if t["kind"] == "days":
        return F.date_format(src, "yyyy-MM-dd")
    if t["kind"] == "hours":
        return F.date_format(src, "yyyy-MM-dd-HH")
    if t["kind"] == "bucket":
        return (_fold8(src, ":bkt") % t["n"]).cast("string")
    raise ValueError(f"unknown transform kind {t['kind']!r}")


def bucket_of(value, n: int) -> int:
    """Driver-side twin of the bucket expression (hashlib md5 — the
    same bytes), for planning point lookups without a Spark job."""
    return int(hashlib.md5(f"{value}:bkt".encode()).hexdigest()[:8], 16) % n


def _sidecar(root: str, spec_id: int = 0) -> str:
    # spec 0 keeps the legacy name (pre-evolution tables read unchanged);
    # evolved specs land as transform-<k>.json, each write-once atomic
    if spec_id == 0:
        return f"{root}/_snapshots/transform.json"
    return f"{root}/_snapshots/transform-{spec_id}.json"


def read_specs(spark: SparkSession, root: str) -> list[dict]:
    """Every declared spec in evolution order (index == spec id). The
    spec chain is append-only: old entries are immutable because old
    FILES are immutable — their path segments are interpreted under the
    spec that wrote them, forever."""
    specs = []
    k = 0
    while fsio.exists(spark, _sidecar(root, k)):
        specs.append(json.loads(fsio.read_text(spark, _sidecar(root, k))))
        k += 1
    return specs


def evolve_transform(spark: SparkSession, root: str, new_t: dict) -> int:
    """Change the table's partition spec (Iceberg partition-spec
    evolution): append ``new_t`` to the spec chain — a METADATA-ONLY
    operation; no data file is read, rewritten, or moved. Files already
    written keep their old layout and are planned under their own spec
    forever (:func:`read_pruned_source_range` prunes each file through
    the spec that wrote it); only writes AFTER the evolution use the new
    spec. The create-if-absent of the next spec file arbitrates racing
    evolvers (exactly one wins an id; the loser re-reads and retries on
    the next). Refuses a spec identical to the current one (a no-op
    evolution would burn a spec id) and an unknown transform kind.
    Returns the new spec id."""
    _expr(new_t)  # validate the kind before touching the chain
    while True:
        specs = read_specs(spark, root)
        if not specs:
            raise ValueError(
                "no transform declared yet: first write_transformed() call "
                "records spec 0; evolution only changes an existing contract"
            )
        if specs[-1] == new_t:
            raise ValueError(f"spec already is {new_t}: evolution must change it")
        try:
            fsio.create_text_atomic(
                spark, _sidecar(root, len(specs)), json.dumps(new_t)
            )
            return len(specs)
        except FileExistsError:
            continue  # lost the race: re-read the chain and retry


def _check_contract(spark: SparkSession, root: str, t: dict) -> int:
    """Validate ``t`` against the table's CURRENT spec (the chain tail)
    and return its spec id; first writer records spec 0. A mismatch
    with the current spec is refused — changing it is an explicit
    :func:`evolve_transform`, never a side effect of a write."""
    specs = read_specs(spark, root)
    if specs:
        if specs[-1] != t:
            raise ValueError(
                f"partition transform mismatch: table declares {specs[-1]} "
                f"(spec {len(specs) - 1}), write uses {t} — use "
                "evolve_transform() to change the spec"
            )
        return len(specs) - 1
    fsio.mkdirs(spark, f"{root}/_snapshots")
    try:
        fsio.create_text_atomic(spark, _sidecar(root, 0), json.dumps(t))
        return 0
    except FileExistsError:
        return _check_contract(spark, root, t)  # lost the race: re-validate


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
    spec_id = _check_contract(spark, root, transform)
    pcol = _pcol(transform, spec_id)
    # fan-in by partition value so each value writes ONE file per commit
    # (without it, every task emits a sliver per value it holds —
    # tasks x values files). A single huge partition needing many files
    # is the auto-compaction / target-file-size knob's job, not this
    # writer's.
    out = df.withColumn(pcol, _expr(transform)).repartition(pcol)
    if mode == "append":
        # the first write after an evolution re-declares the manifest
        # spec (the sidecar chain, not the manifest, is the contract for
        # transformed tables — allow_spec_change is gated on it)
        return S.append(
            out, root, stats_cols=stats_cols, txn=txn,
            partition_by=pcol, hidden_partition=True,
            allow_spec_change=spec_id > 0,
        )
    if mode == "overwrite":
        return S.overwrite(
            out, root, stats_cols=stats_cols, txn=txn,
            partition_by=pcol, hidden_partition=True,
        )
    raise ValueError(f"unknown mode {mode!r}")


def read_transform(spark: SparkSession, root: str) -> dict:
    """The table's CURRENT transform (tail of the spec chain)."""
    specs = read_specs(spark, root)
    if not specs:
        raise FileNotFoundError(f"no transform sidecar at {root}")
    return specs[-1]


def _prange(t: dict, lo, hi) -> tuple[str, str] | None:
    """[lo, hi] on the SOURCE column mapped to a partition-value range
    under one spec, or None when that spec cannot prune a range (bucket
    with lo != hi: a key range hashes everywhere)."""
    if t["kind"] == "days":
        return str(lo)[:10], str(hi)[:10]
    if t["kind"] == "hours":
        # 'YYYY-MM-DD HH:..' or 'YYYY-MM-DD' -> 'YYYY-MM-DD-HH'.
        # ISO-8601 'T' separators are normalized FIRST: 'T' > '-' in
        # byte order, so an un-normalized '2024-01-02T03' bound would
        # exclude that day's genuine '2024-01-02-03' segment and break
        # the superset guarantee (wrongly pruning matching files).
        def h(v, edge):
            s = str(v).replace("T", " ")
            return s[:13].replace(" ", "-") if len(s) > 10 else f"{s[:10]}-{edge}"

        return h(lo, "00"), h(hi, "23")
    if t["kind"] == "bucket":
        if lo != hi:
            return None
        b = str(bucket_of(lo, t["n"]))
        return b, b
    raise ValueError(f"unknown transform kind {t['kind']!r}")


def read_pruned_source_range(
    spark: SparkSession, root: str, lo, hi, version: int | None = None
) -> tuple[DataFrame, int, int]:
    """Read planning only the partitions a SOURCE-column range can
    touch — the predicate the user writes (on ts / on the key) prunes
    THROUGH the declared transform(s), which is the whole point of
    hidden partitioning. For ``days``/``hours``, [lo, hi] timestamps map
    to the day/hour strings they span (string order == time order); for
    ``bucket``, only equality is prunable — a RANGE probe on a
    bucket-only table is refused (it hashes everywhere; that query
    scans, correctly), while on a MIXED table the bucket-spec files are
    conservatively kept and the other specs still prune.

    Spec evolution: each file is pruned under the spec that WROTE it —
    its path segment names that spec's derived column — so a days→hours
    table plans old files at day granularity and new files at hour
    granularity in one read, no rewrite (Iceberg's mixed-spec scan
    planning). Files carrying no known spec segment are kept. Returns
    (DataFrame, files_planned, files_total); apply the residual source
    predicate — pruning is a superset guarantee."""
    specs = read_specs(spark, root)
    if not specs:
        raise FileNotFoundError(f"no transform sidecar at {root}")
    if len(specs) == 1 and specs[0]["kind"] == "bucket" and lo != hi:
        raise ValueError(
            "bucket transform prunes equality only: a key RANGE hashes "
            "to every bucket — run the full-table filter instead"
        )
    # pcol -> acceptable partition-value range (None = keep that spec)
    ranges = {
        _pcol(t, i): _prange(t, lo, hi) for i, t in enumerate(specs)
    }
    v = S.latest_version(spark, root) if version is None else version
    m = S._read_manifest(spark, root, v)

    def planned(f: str) -> bool:
        for seg in f.split("/")[1:-1]:
            col, _, raw = seg.partition("=")
            if col in ranges:
                if raw == "__HIVE_DEFAULT_PARTITION__":
                    return True  # NULL source value: conservative
                r = ranges[col]
                return r is None or (r[0] <= raw <= r[1])
        return True  # no known spec segment: conservative

    keep = [f for f in m["files"] if planned(f)]
    total = len(m["files"])
    if not keep:
        return S.read_snapshot(spark, root, v).limit(0), 0, total
    return S._live_view(spark, root, m, keep), len(keep), total

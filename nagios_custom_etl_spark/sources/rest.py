"""REST data sources (SURVEY §2.1 S3–S7) as Spark 4 Python DataSources.

The reference fetches per-(host, service) RRD exports with a 5-thread pool
(/root/reference/extract.py:148-153) and bulk metadata endpoints
(hosts_to_csv.py:17-19, url_service_status_InfluxDB_insert.py:49-70).
Here the (host, service) keyspace becomes InputPartitions — task
parallelism replaces the thread pool and scales with the cluster — and
the reference's manual `start={ts}` URL param (extract.py:31,71) becomes
real filter pushdown: Catalyst filters on `t` / `host_name` /
`service_name` are translated into request params / keyspace pruning in
``pushFilters``.

Network access is injected: the ``fetcher`` option names a
``module:function`` importable on executors, called as
``fetcher(endpoint, params) -> dict`` (parsed JSON). The default HTTP
fetcher uses ``requests`` and is gated behind an import-try, so tests run
with a fake fetcher and no network.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterable, Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
)
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RRD_SCHEMA = StructType(
    [
        StructField("host_name", StringType(), False),
        StructField("service_name", StringType(), False),
        StructField("t", LongType(), True),
        StructField("v", ArrayType(StringType()), True),
    ]
)


def resolve_fetcher(spec: str):
    mod, _, fn = spec.partition(":")
    return getattr(importlib.import_module(mod), fn)


def http_fetcher(endpoint: str, params: dict) -> dict:
    """Default fetcher: GET endpoint with params, parse JSON.

    requests is widely available but not guaranteed — import-gated.
    """
    try:
        import requests  # noqa: PLC0415
    except ImportError as ex:  # pragma: no cover
        raise RuntimeError("requests not installed; inject a custom fetcher") from ex
    resp = requests.get(endpoint, params=params, timeout=30)
    resp.raise_for_status()
    return resp.json()


@dataclass
class KeySlicePartition(InputPartition):
    pairs: list[tuple[str, str]]  # (host_name, service_name)


class NagiosRrdReader(DataSourceReader):
    def __init__(self, options: dict):
        self.endpoint = options["endpoint"]
        self.fetcher_spec = options.get("fetcher", f"{__name__}:http_fetcher")
        self.hosts = [h for h in options.get("hosts", "").split(",") if h]
        from nagios_custom_etl_spark.etl.nagios import SERVICE_KEYS

        self.services = [
            s for s in options.get("services", "").split(";") if s
        ] or list(SERVICE_KEYS)
        self.start_ts = int(options.get("start_ts", "0"))
        self.num_partitions = int(options.get("num_partitions", "8"))
        self.api_key = options.get("api_key", "")
        # per-TASK request pacing; the cluster-wide rate is
        # num_partitions x this, which is the knob that replaces the
        # reference's ThreadPoolExecutor(max_workers=5) global throttle
        # (extract.py:148-150). 0 = unthrottled.
        self.requests_per_second = float(options.get("requests_per_second", "0"))

    # -- pushdown (SURVEY §4: filter→param mapping is the one custom piece)
    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        unsupported = []
        for f in filters:
            col = f.attribute[0] if hasattr(f, "attribute") else None
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)) and col == "t":
                # becomes the ?start= request param — data never leaves origin
                self.start_ts = max(self.start_ts, int(f.value))
            elif isinstance(f, EqualTo) and col == "host_name":
                self.hosts = [h for h in self.hosts if h == f.value] or [str(f.value)]
            elif isinstance(f, In) and col == "host_name":
                keep = set(map(str, f.value))
                self.hosts = [h for h in self.hosts if h in keep] or sorted(keep)
            elif isinstance(f, EqualTo) and col == "service_name":
                self.services = [s for s in self.services if s == f.value]
            elif isinstance(f, In) and col == "service_name":
                keep = set(map(str, f.value))
                self.services = [s for s in self.services if s in keep]
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self) -> Sequence[InputPartition]:
        pairs = [(h, s) for h in self.hosts for s in self.services]
        n = max(1, min(self.num_partitions, len(pairs)))
        chunks = [pairs[i::n] for i in range(n)]
        return [KeySlicePartition(c) for c in chunks if c]

    def read(self, partition: KeySlicePartition) -> Iterator[tuple]:
        import time

        fetch = resolve_fetcher(self.fetcher_spec)
        min_interval = 1.0 / self.requests_per_second if self.requests_per_second > 0 else 0.0
        next_allowed = 0.0
        for host, service in partition.pairs:
            if min_interval:
                now = time.monotonic()
                if now < next_allowed:
                    time.sleep(next_allowed - now)
                next_allowed = max(now, next_allowed) + min_interval
            params = {
                "apikey": self.api_key,
                "host_name": host,
                "service_description": service,
                "start": self.start_ts,
            }
            payload = fetch(self.endpoint, params)
            rows = (payload.get("data") or {}).get("row") or []
            for point in rows:
                v = point.get("v")
                if not isinstance(v, list):  # scalar fallback (extract.py:91-93)
                    v = [v]
                yield (host, service, int(point["t"]), [None if x is None else str(x) for x in v])


class NagiosRrdDataSource(DataSource):
    """spark.read.format("nagios_rrd") — the S4 RRD-export source."""

    @classmethod
    def name(cls) -> str:
        return "nagios_rrd"

    def schema(self) -> StructType:
        return RRD_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return NagiosRrdReader(dict(self.options))

    def streamReader(self, schema: StructType) -> "DataSourceStreamReader":
        return NagiosRrdStreamReader(dict(self.options))


def register_sources(spark) -> None:
    spark.dataSource.register(NagiosRrdDataSource)


def fetch_objects_df(spark, endpoint: str, params: dict, schema, fetcher=http_fetcher):
    """S3/S5/S6/S7 metadata endpoints: small bulk dumps fetched once on the
    driver and parallelized (the reference's fetch-once-then-filter-locally
    pattern, url_...py:60-64). For large responses use NagiosRrdDataSource's
    partitioned model instead."""
    payload = fetcher(endpoint, params)
    rows = payload if isinstance(payload, list) else [payload]
    return spark.createDataFrame(rows, schema=schema)


def demo_fetcher(endpoint: str, params: dict) -> dict:
    """Deterministic offline fetcher for tests/demos: synthesizes an
    rrdexport-shaped payload (extract.py:77-79 nesting) from the request
    params — hourly points from ``start``, values keyed on (host, service,
    t) so every partition/run reproduces identical data."""
    from nagios_custom_etl_spark.etl.nagios import SERVICE_KEYS

    import zlib

    host = params["host_name"]
    service = params["service_description"]
    start = int(params.get("start", 0))
    n_values = len(SERVICE_KEYS.get(service, ["value"]))
    rows = []
    for i in range(6):  # 6 hourly points per (host, service)
        t = start + i * 3600
        # crc32, not hash(): Python str hash is per-process randomized
        seed = (zlib.crc32(f"{host}|{service}".encode()) & 0xFFFF) / 100.0
        rows.append(
            {
                "t": t,
                "v": [f"{seed + i + j:.2f}" for j in range(n_values)],
            }
        )
    return {"data": {"row": rows}}


# ---------------------------------------------------------------------------
# Streaming variant (SURVEY §2.9 ST1/ST2): the reference's cron micro-batch
# with a lookback overlap (extract.py:29-31,114) as a real
# DataSourceStreamReader. Offsets are window end-timestamps; each batch
# covers (prev_end, next_end] and every fetch rewinds ``overlap_seconds``
# so late RRD spool flushes are re-read (downstream
# dropDuplicatesWithinWatermark removes the overlap re-reads, ST4).
# ---------------------------------------------------------------------------


@dataclass
class KeyWindowPartition(InputPartition):
    pairs: list[tuple[str, str]]
    window_start: int  # inclusive, already rewound by overlap
    window_end: int  # exclusive


class NagiosRrdStreamReader(DataSourceStreamReader):
    """Micro-batch RRD stream: one batch per elapsed ``window_seconds``.

    The keyspace fans out exactly like the batch reader — (host, service)
    slices become InputPartitions, replacing the reference's 5-thread pool
    with cluster tasks. ``end_ts`` bounds the stream so AvailableNow
    drains deterministically in tests (and a live deployment simply keeps
    ``end_ts`` unset to follow the wall clock).
    """

    def __init__(self, options: dict):
        self.inner = NagiosRrdReader(options)
        self.window = int(options.get("window_seconds", "86400"))
        self.overlap = int(options.get("overlap_seconds", "3600"))
        self.start_ts = int(options.get("start_ts", "0"))
        self.end_ts = int(options["end_ts"]) if "end_ts" in options else None

    def initialOffset(self) -> dict:
        return {"ts": self.start_ts}

    def latestOffset(self) -> dict:
        if self.end_ts is not None:
            return {"ts": self.end_ts}
        import time as _time  # wall clock only in live mode

        return {"ts": int(_time.time())}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        """Split the offset range into lookback windows × keyspace slices.

        Windowing lives here (not in latestOffset) so the semantics are
        trigger-independent: AvailableNow drains the whole range in one
        batch yet still fetches per-window with the overlap rewind —
        exactly the reference's 25h-fetch-per-daily-run (extract.py:29-31).
        """
        lo, hi = int(start["ts"]), int(end["ts"])
        if hi <= lo:
            return []
        pairs = [(h, s) for h in self.inner.hosts for s in self.inner.services]
        n = max(1, min(self.inner.num_partitions, len(pairs)))
        chunks = [c for c in (pairs[i::n] for i in range(n)) if c]
        parts: list[InputPartition] = []
        w0 = lo
        while w0 < hi:
            w_end = min(w0 + self.window, hi)
            # rewind at every window boundary after the stream origin —
            # batch boundaries included (lo of batch N+1 is hi of batch N)
            fetch_start = max(w0 - self.overlap, 0) if w0 > self.start_ts else w0
            parts.extend(KeyWindowPartition(c, fetch_start, w_end) for c in chunks)
            w0 = w_end
        return parts

    def read(self, partition: KeyWindowPartition) -> Iterator[tuple]:
        fetch = resolve_fetcher(self.inner.fetcher_spec)
        for host, service in partition.pairs:
            params = {
                "apikey": self.inner.api_key,
                "host_name": host,
                "service_description": service,
                "start": partition.window_start,
            }
            payload = fetch(self.inner.endpoint, params)
            rows = (payload.get("data") or {}).get("row") or []
            for point in rows:
                t = int(point["t"])
                if not partition.window_start <= t < partition.window_end:
                    continue  # outside this batch's window (source-side bound)
                v = point.get("v")
                if not isinstance(v, list):
                    v = [v]
                yield (
                    host,
                    service,
                    t,
                    [None if x is None else str(x) for x in v],
                )

    def commit(self, end: dict) -> None:  # checkpoint owns progress; nothing to do
        pass

"""Custom stateful streaming operator (SURVEY §2.9 Ext):
``applyInPandasWithState`` error-streak detection.

The reference's status pipeline only reports instantaneous state
(url_service_status_InfluxDB_insert.py); the natural monitoring follow-on
is "alert when a service reports N consecutive errors". That needs
per-key state carried across micro-batches — exactly what
applyInPandasWithState provides (state store checkpointed, watermark
bounded).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STREAK_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("streak_len", IntegerType()),
        StructField("streak_start_id", LongType()),
        StructField("streak_end_id", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)

STREAK_STATE_SCHEMA = StructType(
    [
        StructField("count", IntegerType()),
        StructField("start_id", LongType()),
        StructField("emitted", IntegerType()),
    ]
)

INPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
    ]
)


def error_streaks(stream: DataFrame, threshold: int = 3) -> DataFrame:
    """Emit one row each time a per-user run of consecutive 'error' events
    reaches ``threshold`` (and again as it extends). State per key is
    (count, start_id, emitted) — O(1), batch-order independent within a
    key because rows are sorted by event_id inside the group.

    The per-batch streak computation is vectorized gaps-and-islands
    (run ids from ``(~is_err).cumsum()``, per-run positions from a
    grouped cumsum, the carried-in state seeding the first run) — O(batch)
    pandas/numpy, no Python row loop; only the boundary (count, start_id)
    crosses micro-batches."""
    import numpy as np

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        count, start_id, emitted = state.get if state.exists else (0, -1, 0)
        frames: list[pd.DataFrame] = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("event_id")
            is_err = (pdf["event_type"] == "error").to_numpy()
            eid = pdf["event_id"].to_numpy()
            # run ids: every non-error row starts a new (empty-of-errors)
            # island; leading errors share run 0 and continue the carry
            run_id = np.cumsum(~is_err)
            grp = pd.Series(is_err).groupby(run_id)
            pos = grp.cumsum().to_numpy()  # errors-so-far within the run
            # first error event_id per run (NaN-skipping grouped 'first')
            first_eid = (
                pd.Series(np.where(is_err, eid.astype("float64"), np.nan))
                .groupby(run_id)
                .transform("first")
                .to_numpy()
            )
            seeded = (run_id == 0) & (count > 0)
            streak = pos + np.where(seeded, count, 0)
            starts = np.where(seeded, start_id, first_eid)
            mask = is_err & (streak >= threshold)
            if mask.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "user_id": user_id,
                            "streak_len": streak[mask].astype("int32"),
                            "streak_start_id": starts[mask].astype("int64"),
                            "streak_end_id": eid[mask],
                            "last_ts": pdf["ts"].to_numpy()[mask],
                        }
                    )
                )
                emitted += int(mask.sum())
            if is_err[-1]:
                count, start_id = int(streak[-1]), int(starts[-1])
            else:
                count, start_id = 0, -1
        state.update((count, start_id, emitted))
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return (
        stream.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=STREAK_OUTPUT_SCHEMA,
            stateStructType=STREAK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 arbitrary-state API) — per-user profile totals
# ---------------------------------------------------------------------------

PROFILE_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, n_event_types bigint, n_errors bigint, "
    "first_event_id bigint, last_event_id bigint"
)


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class UserProfileProcessor(StatefulProcessor):
    """StatefulProcessor maintaining an order-insensitive per-user profile:
    event count, distinct-type counts (MapState), id extremes (ValueState).

    transformWithStateInPandas is the successor to applyInPandasWithState:
    named state variables (value/list/map) with per-variable TTL, timers,
    and initial-state seeding, backed by the RocksDB state store. Profile
    aggregates are commutative, so results are independent of batch
    boundaries and arrival order — the batch GROUP BY is an exact oracle.
    """

    def init(self, handle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events bigint, first_event_id bigint, last_event_id bigint"
        )
        self._type_counts = handle.getMapState(
            "type_counts", "event_type string", "n bigint"
        )

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        (user_id,) = key
        n, first_id, last_id = self._totals.get() if self._totals.exists() else (0, None, None)
        for pdf in rows:
            n += len(pdf)
            lo, hi = int(pdf["event_id"].min()), int(pdf["event_id"].max())
            first_id = lo if first_id is None else min(first_id, lo)
            last_id = hi if last_id is None else max(last_id, hi)
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self._type_counts.getValue((etype,))[0]
                    if self._type_counts.containsKey((etype,))
                    else 0
                )
                self._type_counts.updateValue((etype,), (prev + int(cnt),))
        self._totals.update((n, first_id, last_id))
        n_types, n_errors = 0, 0
        for (etype,), (cnt,) in self._type_counts.iterator():
            n_types += 1
            if etype == "error":
                n_errors = cnt
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "n_event_types": n_types,
                    "n_errors": n_errors,
                    "first_event_id": first_id,
                    "last_event_id": last_id,
                }
            ]
        )

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        return iter(())

    def handleInitialState(self, key, initial_state, timer_values) -> None:
        pass

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithState's Python state-server protocol speaks protobuf;
    without the ``protobuf`` wheel the driver-side init worker dies before
    state schemas are validated. Gate, don't crash."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_profile_totals(stream: DataFrame, impl: str = "auto") -> DataFrame:
    """Update-mode per-user profile; one row per (key, micro-batch)
    carrying the running totals.

    ``impl='tws'`` uses transformWithStateInPandas (requires the RocksDB
    state store provider and the protobuf wheel); ``impl='legacy'`` is the
    semantically identical applyInPandasWithState form (map state carried
    as a JSON field in the state struct); ``'auto'`` picks tws when its
    runtime dependency exists. Both are commutative in arrival order and
    batch boundaries, so they agree exactly.
    """
    if impl == "auto":
        impl = "tws" if tws_available() else "legacy"
    if impl == "tws":
        return (
            stream.select("user_id", "event_id", "event_type")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=UserProfileProcessor(),
                outputStructType=PROFILE_OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import json

        (user_id,) = key
        n, first_id, last_id, tc_json = (
            state.get if state.exists else (0, None, None, "{}")
        )
        tc = json.loads(tc_json)
        for pdf in pdfs:
            n += len(pdf)
            lo, hi = int(pdf["event_id"].min()), int(pdf["event_id"].max())
            first_id = lo if first_id is None else min(first_id, lo)
            last_id = hi if last_id is None else max(last_id, hi)
            for etype, cnt in pdf["event_type"].value_counts().items():
                tc[etype] = tc.get(etype, 0) + int(cnt)
        state.update((n, first_id, last_id, json.dumps(tc, sort_keys=True)))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "n_event_types": len(tc),
                    "n_errors": tc.get("error", 0),
                    "first_event_id": first_id,
                    "last_event_id": last_id,
                }
            ]
        )

    return (
        stream.select("user_id", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=PROFILE_OUTPUT_SCHEMA,
            stateStructType="n_events bigint, first_event_id bigint, last_event_id bigint, type_counts string",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Event-time-timeout sessionizer: custom session close via state expiry
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", IntegerType()),
    ]
)


def session_finalizer(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom sessionization with explicit state expiry
    (GroupStateTimeout.EventTimeTimeout) — the timer dimension of the
    state API that error_streaks (NoTimeout) doesn't exercise.

    A session closes two ways: (a) in-batch, when the next event for the
    key arrives past the gap — emitted immediately; (b) by TIMEOUT, when
    the event-time watermark passes last_ts + gap and Spark invokes the
    function with ``state.hasTimedOut`` — emitted with no new input, then
    the state is removed. (b) is what bounds state for keys that simply
    stop talking — the monitoring question "which hosts went silent"
    (reference drops such hosts invisibly; extract.py re-fetches next
    cron run).

    Timestamps are carried as epoch-NANOS longs in state
    (``pd.Timestamp.value``) — float round-trips truncate microseconds
    and break emitted-session identity.
    """
    gap_ns = gap_minutes * 60 * 1_000_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[tuple] = []

        def emit(start_ns: int, last_ns: int, n: int) -> None:
            out.append((user_id, pd.Timestamp(start_ns), pd.Timestamp(last_ns), n))

        if state.hasTimedOut:
            start_ns, last_ns, n = state.get
            emit(start_ns, last_ns, n)
            state.remove()
        else:
            start_ns, last_ns, n = state.get if state.exists else (None, None, 0)
            # Vectorized gaps-and-islands: one global sort, break flags via a
            # shifted diff, then per-session min/max/count from run-boundary
            # indices (sorted => each session is a contiguous slice). O(batch)
            # numpy instead of a per-row Python loop; only the open tail
            # session crosses into state.
            frames = [p["ts"] for p in pdfs]
            ns_arr = (
                pd.concat(frames).sort_values().to_numpy("datetime64[ns]").astype("int64")
                if frames
                else np.empty(0, dtype="int64")
            )
            if ns_arr.size:
                prev = np.empty_like(ns_arr)
                prev[0] = last_ns if last_ns is not None else ns_arr[0]
                prev[1:] = ns_arr[:-1]
                brk = (ns_arr - prev) > gap_ns
                starts_idx = np.flatnonzero(
                    np.concatenate(([True], brk[1:]))
                )
                ends_idx = np.concatenate((starts_idx[1:] - 1, [ns_arr.size - 1]))
                s_start = ns_arr[starts_idx].copy()
                s_last = ns_arr[ends_idx]
                s_n = (ends_idx - starts_idx + 1).astype("int64")
                if last_ns is not None and brk[0]:
                    emit(start_ns, last_ns, n)  # carried session closed by gap
                elif last_ns is not None:
                    s_start[0] = start_ns  # first run continues carried session
                    s_n[0] += n
                for i in range(len(s_start) - 1):  # closed in-batch sessions
                    emit(int(s_start[i]), int(s_last[i]), int(s_n[i]))
                start_ns, last_ns, n = int(s_start[-1]), int(s_last[-1]), int(s_n[-1])
            state.update((start_ns, last_ns, n))
            state.setTimeoutTimestamp((last_ns + gap_ns) // 1_000_000)
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    return (
        stream.select("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

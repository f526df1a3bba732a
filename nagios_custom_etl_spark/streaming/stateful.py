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
    key because rows are sorted by event_id inside the group."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        count, start_id, emitted = state.get if state.exists else (0, -1, 0)
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("event_id")
            for _, row in pdf.iterrows():
                if row["event_type"] == "error":
                    if count == 0:
                        start_id = int(row["event_id"])
                    count += 1
                    if count >= threshold:
                        out.append(
                            (user_id, count, start_id, int(row["event_id"]), row["ts"])
                        )
                        emitted += 1
                else:
                    count, start_id = 0, -1
        state.update((count, start_id, emitted))
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "streak_len", "streak_start_id", "streak_end_id", "last_ts"],
            )

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

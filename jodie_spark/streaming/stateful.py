"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState``.

Where :func:`jodie_spark.streaming.events.sessionize` handles batch
(window + cumulative sum), a true stream needs per-key state that
survives micro-batches: the open session's id and last-seen timestamp.
State size is O(active users); timed-out state is dropped via the
GroupState timeout, so it cannot grow without bound.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("session_id", T.StringType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_seq", T.LongType()),
        T.StructField("last_ts_ms", T.LongType()),
    ]
)


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Assign session ids on a streaming DataFrame: a new session starts
    when the gap since the user's previous event exceeds the threshold.
    Works on batch DataFrames too (same code path — Spark routes
    applyInPandasWithState accordingly only for streams, so for batch
    input we fall back to the window implementation)."""
    if not events.isStreaming:
        from jodie_spark.streaming.events import sessionize

        return sessionize(events, f"{gap_minutes} minutes", user_col, ts_col).select(
            user_col, "event_id", ts_col, "session_seq", "session_id"
        )

    gap_ms = gap_minutes * 60 * 1000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # session closed by inactivity — drop the state, emit nothing
            # (and do NOT re-arm the timeout, or the query never quiesces)
            state.remove()
            return
        if state.exists:
            session_seq, last_ts_ms = state.get
        else:
            session_seq, last_ts_ms = 0, None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for _, row in pdf.iterrows():
                ts: datetime.datetime = row[ts_col]
                ts_ms = int(ts.timestamp() * 1000)
                if last_ts_ms is None or ts_ms - last_ts_ms > gap_ms:
                    session_seq += 1
                last_ts_ms = ts_ms
                out.append(
                    {
                        "user_id": user_id,
                        "event_id": row["event_id"],
                        "ts": ts,
                        "session_seq": session_seq,
                        "session_id": f"{user_id}-{session_seq}",
                    }
                )
        state.update((session_seq, last_ts_ms))
        state.setTimeoutDuration(gap_ms)
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )

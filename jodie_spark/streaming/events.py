"""Windowed / sessionized event processing.

The reference library has no streaming surface (SURVEY §2.2:
"Streaming: none"), but a training-data pipeline ingesting events at
100 TB needs windowed rollups and sessionization. Both operators here
are written against the *unified* DataFrame API: the same code runs on
a batch DataFrame or a ``readStream`` source — for streams, add
``withWatermark`` upstream and the windowed aggregation becomes an
incremental stateful query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window count + value sum per event type.

    Batch: plain hash aggregation. Streaming: pass ``watermark`` (e.g.
    ``'10 minutes'``) and feed a ``readStream`` DataFrame — state is
    bounded by the watermark horizon.
    Returns (window_start, window_end, event_type, n_events, total_value).
    """
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(type_col),
            "n_events",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign a session id per user: a new session starts when the gap
    since the previous event exceeds ``gap``. Batch implementation is
    the classic lag + cumulative-sum over a per-user window (one
    shuffle on user_id); for streams use
    ``F.session_window(ts, gap)`` which Structured Streaming handles
    natively.
    Returns the input plus (session_seq, session_id).
    """
    gap_expr = f"INTERVAL {gap}"
    w = Window.partitionBy(user_col).orderBy(ts_col)
    with_prev = events.withColumn("__prev_ts__", F.lag(ts_col).over(w))
    new_session = (
        F.col("__prev_ts__").isNull()
        | (F.col(ts_col) > F.col("__prev_ts__") + F.expr(gap_expr))
    ).cast("long")
    return (
        with_prev.withColumn("session_seq", F.sum(new_session).over(w))
        .withColumn(
            "session_id",
            F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_seq").cast("string")),
        )
        .drop("__prev_ts__")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream (or batch) interval join: pair left/right rows
    sharing ``on`` whose right timestamp falls within
    ``[left_ts + lower, left_ts + upper]`` — the impression→click /
    request→response shape.

    Unified-API contract like the other operators here: on batch
    DataFrames this is a plain range-condition equi-join (Catalyst
    plans the equality key as the shuffle key; the time bounds become
    post-join filters, never a cartesian). On ``readStream`` inputs,
    pass ``watermark``: BOTH sides get it, and the time-bound condition
    is exactly what Structured Streaming requires to bound join state —
    each side's buffered rows age out once the other side's watermark
    passes ``upper``.

    Column names are disambiguated by suffix: every right column except
    the join key comes back as ``<name>_r`` (the suffix is doubled —
    ``_r_r``, ``_r_r_r``, … — until it collides with no left column, so
    a left side that already has ``ts_r`` can never produce duplicate
    output names).
    """
    lw = left.withWatermark(left_ts, watermark) if watermark else left
    rw = right.withWatermark(right_ts, watermark) if watermark else right
    suffix = "_r"
    left_cols = set(lw.columns)
    while any(f"{c}{suffix}" in left_cols for c in rw.columns if c != on):
        suffix += "_r"
    renamed = rw
    for c in rw.columns:
        if c != on:
            renamed = renamed.withColumnRenamed(c, f"{c}{suffix}")
    rts = f"{right_ts}{suffix}" if right_ts != on else right_ts
    l, r = lw.alias("l"), renamed.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{rts}") >= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{rts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    out = l.join(r, cond, how)
    # one copy of the join key
    return out.drop(F.col(f"r.{on}"))

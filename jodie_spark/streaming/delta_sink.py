"""Structured-Streaming sink into a native Delta table.

``foreachBatch`` + the transactional append path: each micro-batch
commits one log version, so exactly-once within a batch comes from the
log's atomic commit and restart recovery comes from the stream
checkpoint (standard Delta-sink semantics on a per-batch granularity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_to_delta(
    stream: DataFrame,
    path: str,
    checkpoint_location: str,
    partition_by: list[str] | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """Start a streaming query appending each micro-batch to the Delta
    table at ``path`` (created on first batch)."""
    from jodie_spark.tables.log import DeltaLog
    from jodie_spark.tables.table import write_delta

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        mode = "append" if DeltaLog(path).exists() else "error"
        write_delta(batch_df, path, mode=mode, partition_by=partition_by or [])

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_location
    )
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()

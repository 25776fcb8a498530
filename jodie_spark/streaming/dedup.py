"""Streaming deduplication for continuous ingest.

A crawl/ingest stream re-delivers documents (at-least-once sources,
re-crawls, retried batches); training-data ingestion must drop the
repeats *online* without a full-corpus batch dedup per micro-batch.
This is Spark's watermarked `dropDuplicates` specialization of
:func:`jodie_spark.operators.text_dedup.exact_dedup`:

* the dedup key is the same 128-bit content fingerprint batch dedup
  uses (case/whitespace-normalized md5) — a stream survivor is exactly
  the document batch `exact_dedup` would have kept first;
* with an event-time watermark the dedup state is *bounded*: a
  fingerprint is remembered only within the watermark horizon, so
  state size tracks the re-delivery window, not the corpus
  (`dropDuplicatesWithinWatermark` — re-deliveries arrive within
  minutes/hours; a 100 TB corpus never fits in state, and doesn't
  need to);
* without a watermark (`bounded_state=False`) semantics are global
  exact-once per fingerprint, state grows with distinct documents —
  only for bounded backfills.

Unified API: given a batch DataFrame it degrades to plain
fingerprint dedup, so the same pipeline code runs both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    df: DataFrame,
    text_col: str,
    ts_col: str | None = None,
    watermark: str | None = None,
    fp_col: str = "__fp__",
    keep_fingerprint: bool = False,
) -> DataFrame:
    """Drop re-deliveries of already-seen document content.

    ``watermark`` (with ``ts_col``) bounds the dedup state to the
    re-delivery horizon via ``dropDuplicatesWithinWatermark``; omit both
    for global (unbounded-state) dedup. Works on batch DataFrames too —
    there ``dropDuplicates`` on the fingerprint is a plain aggregation.
    """
    from jodie_spark.functions.text import doc_fingerprint

    out = df.withColumn(fp_col, doc_fingerprint(F.col(text_col)))
    if watermark is not None:
        if ts_col is None:
            raise ValueError("watermark requires ts_col")
        out = out.withWatermark(ts_col, watermark)
        if out.isStreaming:
            out = out.dropDuplicatesWithinWatermark([fp_col])
        else:
            out = out.dropDuplicates([fp_col])
    else:
        out = out.dropDuplicates([fp_col])
    return out if keep_fingerprint else out.drop(fp_col)

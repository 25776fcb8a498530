"""SparkSession factory tuned for this engine.

Parity: reference SparkSessionWrapper.scala:5-11 /
SparkSessionTestWrapper.scala:6-22 (local session with Delta configs).
Since this engine implements the Delta log protocol natively, no
extension/catalog jars are needed — only sane perf defaults:

- AQE on (runtime re-plan, skew-join handling at scale),
- shuffle partitions sized to cores, not the 200 default,
- Arrow transfer on (pandas_udf / toPandas fast path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "jodie_spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Cached plans freeze their exchanges at the static shuffle
        # partition count (32-partition shuffles for a 50-row merge
        # source), and every downstream join aligns to the frozen
        # layout. Letting AQE re-plan cached output partitioning keeps
        # persist()-heavy paths (merge staging, foreachBatch sinks)
        # size-adaptive at EVERY scale — partition count follows
        # advisoryPartitionSizeInBytes, not the core count.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("JODIE_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
        # testdata events.parquet carries TIMESTAMP(NANOS); read as long
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark 4.1's checksum checkpoint manager deadlocks on local-fs
        # state commits under applyInPandasWithState; use the plain one
        .config(
            "spark.sql.streaming.checkpointFileManagerClass",
            "org.apache.spark.sql.execution.streaming.checkpointing."
            "FileSystemBasedCheckpointFileManager",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

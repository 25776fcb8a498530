"""Loaders for the benchmark/test parquet tables (TESTDATA.md layout).

One quirk handled centrally: ``events.parquet`` stores
nanosecond-precision timestamps (``INT64 TIMESTAMP(NANOS)``), which
Spark's vectorized parquet reader rejects by default. We read nanos as
long (``spark.sql.legacy.parquet.nanosAsLong`` — a runtime-settable
conf) and convert to a proper microsecond timestamp column, keeping the
public schema identical to what DuckDB sees.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_events(spark: SparkSession, path: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return load_events(spark, path)
    return spark.read.parquet(path)

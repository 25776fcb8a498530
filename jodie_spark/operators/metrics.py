"""Per-version count metrics from the commit history.

Parity: reference OperationMetricHelper.scala:11-262. The reference's
typed metric ADT (delta/OperationMetric.scala) collapses here to the
(version, deleted, inserted, updated, source_rows) tuples that
``transformMetric`` produces — the only shape the public API exposes.

All metric reads are defensive (missing key ⇒ 0), matching the
reference's ``whenContains`` guard for Delta-version drift
(OperationMetricHelper.scala:260-261).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jodie_spark.tables.log import DeltaLog, commit_file_name
from jodie_spark.tables.table import DeltaTable


class OperationMetricHelper:
    """Count metrics per commit, optionally filtered to one partition.

    Parity: reference OperationMetricHelper.scala:11-41.
    """

    METRIC_COLUMNS = ["version", "deleted", "inserted", "updated", "source_rows"]

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        starting_version: int = 0,
        ending_version: int | None = None,
    ):
        self.spark = spark
        self.path = path
        self.starting_version = starting_version
        self.ending_version = ending_version
        self.table = DeltaTable.forPath(spark, path)

    # -- public API ----------------------------------------------------------

    def get_count_metrics_as_df(self, partition_condition: str | None = None) -> DataFrame:
        """Parity: OperationMetricHelper.scala:38-41."""
        rows = self.get_count_metrics(partition_condition)
        schema = T.StructType(
            [T.StructField(c, T.LongType()) for c in self.METRIC_COLUMNS]
        )
        return self.spark.createDataFrame(rows, schema)

    def get_count_metrics(
        self, partition_condition: str | None = None, include_non_dml: bool = False
    ) -> list[tuple[int, int, int, int, int]]:
        """Parity: OperationMetricHelper.scala:52-63 — newest first.

        Only DML commits (MERGE/WRITE/DELETE/UPDATE) produce rows —
        the reference's contract. This engine also *creates* other
        commit types the reference never saw (RESTORE, OPTIMIZE,
        CONVERT, VACUUM, SET TBLPROPERTIES); their row deltas are not
        expressible in these four counters (OPTIMIZE/VACUUM move no
        rows; RESTORE/CONVERT replace content wholesale), so they are
        excluded by default. ``include_non_dml=True`` surfaces them as
        explicit zero-count rows instead of silent gaps."""
        histories = [
            r.asDict()
            for r in self.table.history().collect()
            if r["version"] >= self.starting_version
            and (self.ending_version is None or r["version"] <= self.ending_version)
        ]
        if partition_condition is not None:
            histories = [
                h for h in histories if self._filter_history_by_partition(h, partition_condition)
            ]
        out: list[tuple[int, int, int, int, int]] = []
        for h in histories:
            metrics = h.get("operationMetrics") or {}

            def m(key: str) -> int:
                try:
                    return int(metrics.get(key) or 0)
                except ValueError:
                    return 0

            op = h.get("operation")
            version = int(h["version"])
            if op == "MERGE":
                out.append(
                    (version, m("numTargetRowsDeleted"), m("numTargetRowsInserted"),
                     m("numTargetRowsUpdated"), m("numSourceRows"))
                )
            elif op == "WRITE":
                if partition_condition is None:
                    out.append((version, 0, m("numOutputRows"), 0, m("numOutputRows")))
                else:
                    inserted = self.get_write_metric_by_partition(partition_condition, version)
                    out.append((version, 0, inserted, 0, inserted))
            elif op == "DELETE":
                out.append((version, m("numDeletedRows"), 0, 0, 0))
            elif op == "UPDATE":
                out.append((version, 0, 0, m("numUpdatedRows"), 0))
            elif include_non_dml:
                out.append((version, 0, 0, 0, 0))
        return out

    def get_write_metric_by_partition(self, partition_condition: str, version: int) -> int:
        """Recount a WRITE's inserted rows for one partition by summing
        ``add.stats.numRecords`` of files whose path contains each
        ``col=value`` partition dir — path-substring match, hence
        case-sensitive and quote-insensitive (quirk preserved from
        OperationMetricHelper.scala:73-98)."""
        conditions = [f"{k}={v}" for k, v in split_condition(partition_condition).items()]
        log = DeltaLog(self.path)
        commit_path = os.path.join(log.log_path, commit_file_name(version))
        stats_schema = T.StructType(
            [
                T.StructField("numRecords", T.LongType()),
                T.StructField("minValues", T.MapType(T.StringType(), T.StringType())),
                T.StructField("maxValues", T.MapType(T.StringType(), T.StringType())),
                T.StructField("nullCount", T.MapType(T.StringType(), T.StringType())),
            ]
        )
        df = (
            self.spark.read.json(commit_path)
            .withColumn("stats", F.from_json(F.col("add.stats"), stats_schema))
            .select(F.col("add.path").alias("path"), "stats")
        )
        # native DF filter + sum (the reference's typed map/reduce with
        # Encoders.scalaLong re-expressed without leaving the JVM)
        cond = F.col("path").isNotNull()
        for c in conditions:
            cond = cond & F.col("path").contains(c)
        row = df.filter(cond).agg(
            F.coalesce(F.sum("stats.numRecords"), F.lit(0)).alias("n")
        ).collect()[0]
        return int(row["n"])

    # -- predicate normalization ---------------------------------------------

    def _filter_history_by_partition(self, h: dict, partition_condition: str) -> bool:
        """Parity: OperationMetricHelper.scala:178-191 — WRITEs always
        pass; DELETE/MERGE/UPDATE pass when their recorded predicate
        matches the condition after normalization."""
        op = h.get("operation")
        if op == "WRITE":
            return True
        if op in ("DELETE", "MERGE", "UPDATE"):
            predicate = (h.get("operationParameters") or {}).get("predicate")
            if not predicate:
                return False
            return validate_partition_condition(predicate, partition_condition)
        return False


def split_condition(partition_condition: str) -> dict[str, str]:
    """'country = USA and gender = Female' → {'country': 'USA', ...},
    handling the three recorded-predicate spellings (plain, ``col#123``
    attribute ids, ``alias.col``).
    Parity: OperationMetricHelper.scala:154-176 (splitConditionTo)."""
    trimmed = partition_condition.strip()
    parts = trimmed.split(" and ") if " and " in trimmed else [trimmed]
    out: dict[str, str] = {}
    for part in parts:
        kv = part.split("=")
        if len(kv) != 2:
            raise AssertionError(f"cannot split condition fragment: {part!r}")
        head, value = kv[0], kv[1].strip().strip("'")
        if "#" in head:
            key = head.split("#")[0].strip()
        elif "." in head:
            key = head.split(".")[1].strip()
        else:
            key = head.strip()
        out[key] = value
    return out


def validate_partition_condition(recorded_predicate: str, condition: str) -> bool:
    """Parity: OperationMetricHelper.scala:129-145
    (parseDeltaLogToValidatePartitionCondition) — strips ()[]" from the
    recorded predicate, splits both sides to k=v maps, and requires
    every user-condition pair to appear in the recorded predicate."""
    input_conditions = split_condition(condition.lower())
    cleaned = (
        recorded_predicate.lower()
        .replace("(", " ")
        .replace(")", " ")
        .replace("[", " ")
        .replace("]", " ")
        .replace('"', " ")
    )
    try:
        recorded = split_condition(cleaned)
    except AssertionError:
        return False
    if not input_conditions:
        return False
    return all(recorded.get(k) == v for k, v in input_conditions.items())

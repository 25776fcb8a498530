"""Change Data Feed: reader + failure-scenario recovery.

Parity: reference ChangeDataFeedHelper.scala:18-377. The reference
delegates the read itself to Delta's CDF reader
(``option("readChangeFeed","true")``); this engine rebuilds it on the
log protocol:

- versions with ``cdc`` actions → read their ``_change_data`` parquet
  (rows already carry ``_change_type``);
- versions without ``cdc`` actions → synthesize ``insert`` rows from
  dataChange ``add`` files and ``delete`` rows from dataChange
  ``remove`` files (which survive until vacuum) — the same synthesis
  Delta's CDCReader performs for plain appends, full-table deletes,
  overwrites, and RESTORE;
- a version inside the range where CDF is *disabled* (tracked by
  replaying ``metaData`` configuration changes) raises, matching
  Delta's DeltaAnalysisException failure mode the recovery helpers
  exist to work around.

Scale: all change/add files across the whole version range are read in
two Spark scans (one for cdc files, one for add files); per-file commit
version/timestamp attach via a broadcast join on file path — never a
per-version read loop over data.
"""

from __future__ import annotations

import os
import urllib.parse
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jodie_spark.errors import DeltaProtocolError, VersionNotFoundError
from jodie_spark.tables.log import DeltaLog
from jodie_spark.tables.table import CDF_PROP, DeltaTable


def _cdf_enabled(configuration: dict[str, Any]) -> bool:
    return str((configuration or {}).get(CDF_PROP, "false")).lower() == "true"


def _to_ts_ms(ts) -> int:
    import datetime as _dt

    if isinstance(ts, str):
        ts = _dt.datetime.fromisoformat(ts)
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return int(ts.timestamp() * 1000)
    return int(float(ts) * 1000)


def read_cdf(
    spark: SparkSession,
    path: str,
    starting_version: int | None = None,
    ending_version: int | None = None,
    starting_timestamp=None,
    ending_timestamp=None,
) -> DataFrame:
    """Change rows between versions (inclusive) with ``_change_type``,
    ``_commit_version``, ``_commit_timestamp``. Timestamps resolve to
    versions the way delta-spark's startingTimestamp/endingTimestamp
    options do (newest commit at-or-before).
    Parity: ChangeDataFeedHelper.scala:371-377."""
    table = DeltaTable.forPath(spark, path)
    log = table.deltaLog
    if starting_version is None:
        if starting_timestamp is None:
            raise ValueError("read_cdf needs starting_version or starting_timestamp")
        starting_version = log.version_at_timestamp(
            _to_ts_ms(starting_timestamp), at_or_after=True
        )
    if ending_version is None:
        ending_version = (
            log.latest_version()
            if ending_timestamp is None
            else log.version_at_timestamp(_to_ts_ms(ending_timestamp))
        )
    schema = table.schema(table.snapshot(ending_version))

    start_snap = table.snapshot(starting_version)  # raises VersionNotFoundError if gone
    enabled = _cdf_enabled(start_snap.configuration)

    cdc_files: list[tuple[str, int, int]] = []  # (abspath, version, ts)
    insert_files: list[tuple[str, int, int]] = []
    delete_files: list[tuple[str, int, int]] = []
    for v in range(starting_version, ending_version + 1):
        actions = log.read_actions(v)
        ci = next((a["commitInfo"] for a in actions if "commitInfo" in a), {})
        ts = int(ci.get("inCommitTimestamp") or ci.get("timestamp") or 0)
        has_cdc = False
        adds: list[str] = []
        removes: list[str] = []
        for a in actions:
            if "metaData" in a and a["metaData"]:
                enabled = _cdf_enabled(a["metaData"].get("configuration"))
            elif "cdc" in a and a["cdc"]:
                has_cdc = True
                p = os.path.join(path, urllib.parse.unquote(a["cdc"]["path"]))
                if not os.path.isfile(p):
                    raise FileNotFoundError(
                        f"change data file {p} for version {v} has been deleted (vacuumed?)"
                    )
                cdc_files.append((p, v, ts))
            elif "add" in a and a["add"] and a["add"].get("dataChange", True):
                adds.append(os.path.join(path, urllib.parse.unquote(a["add"]["path"])))
            elif "remove" in a and a["remove"] and a["remove"].get("dataChange", True):
                removes.append(os.path.join(path, urllib.parse.unquote(a["remove"]["path"])))
        if v > 0 and not enabled:
            raise DeltaProtocolError(
                f"Error getting change data for range [{starting_version}, "
                f"{ending_version}] as change data was not recorded for version {v}. "
                f"{CDF_PROP} is disabled."
            )
        if not has_cdc:
            insert_files.extend((p, v, ts) for p in adds)
            # remove-only commits (full-table delete, overwrite, RESTORE)
            # write no cdc files; their delete rows come from the removed
            # data files, which remain on disk until vacuum
            for p in removes:
                if not os.path.isfile(p):
                    raise FileNotFoundError(
                        f"removed data file {p} needed to synthesize delete change "
                        f"rows for version {v} has been deleted (vacuumed?)"
                    )
                delete_files.append((p, v, ts))

    out_schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_version", T.LongType()),
            T.StructField("_commit_timestamp", T.TimestampType()),
        ]
    )
    parts: list[DataFrame] = []

    # column-mapped tables store physical names in data/cdc files —
    # scan physical, rename back to logical (a logical-schema scan
    # would silently return all-null columns)
    ms = table._mapping_schemas(table.snapshot(ending_version))

    def _logical(df: DataFrame, extra: tuple[str, ...]) -> DataFrame:
        if ms is None:
            return df
        from jodie_spark.tables.column_mapping import rename_to_logical

        logical, physical = ms
        return rename_to_logical(df, logical, physical, keep=extra)

    read_schema = schema if ms is None else ms[1]
    scan_spark = spark
    if ms is not None:
        from jodie_spark.tables.column_mapping import schema_requests_field_ids
        from jodie_spark.tables.table import _field_id_read_session

        if schema_requests_field_ids(read_schema):
            # mode=id tables: data/cdc files resolve by footer field id
            scan_spark = _field_id_read_session(spark)

    if cdc_files:
        cdc_df = (
            scan_spark.read.format("parquet")
            .schema(
                T.StructType(
                    list(read_schema.fields)
                    + [T.StructField("_change_type", T.StringType())]
                )
            )
            .load([p for p, _, _ in cdc_files])
            .withColumn("___file", F.input_file_name())
        )
        cdc_df = _logical(cdc_df, ("_change_type", "___file"))
        parts.append(_join_version(spark, cdc_df, cdc_files))
    for file_group, change_type in ((insert_files, "insert"), (delete_files, "delete")):
        if not file_group:
            continue
        grp_df = (
            scan_spark.read.format("parquet")
            .option("basePath", path)
            .schema(read_schema)
            .load([p for p, _, _ in file_group])
            .withColumn("_change_type", F.lit(change_type))
            .withColumn("___file", F.input_file_name())
        )
        grp_df = _logical(grp_df, ("_change_type", "___file"))
        parts.append(_join_version(spark, grp_df, file_group))

    if not parts:
        return spark.createDataFrame([], out_schema)
    result = reduce(lambda a, b: a.unionByName(b), parts)
    return result.select([f.name for f in out_schema.fields])


def _join_version(
    spark: SparkSession, df: DataFrame, files: list[tuple[str, int, int]]
) -> DataFrame:
    """Attach (_commit_version, _commit_timestamp) per file via a
    broadcast join on the normalized file path."""
    # join on the part-file basename (UUID-unique) — keeps the match
    # entirely JVM-side, no Python UDF in the read path
    mapping = spark.createDataFrame(
        [(os.path.basename(p), v, ts) for p, v, ts in files],
        "___name string, _commit_version long, ___ts_ms long",
    )
    return (
        df.withColumn("___name", F.element_at(F.split(F.col("___file"), "/"), -1))
        .drop("___file")
        .join(F.broadcast(mapping), "___name")
        .withColumn(
            "_commit_timestamp",
            F.timestamp_millis(F.col("___ts_ms")),
        )
        .drop("___name", "___ts_ms")
    )


class ChangeDataFeedHelper:
    """Recovery helpers for the three CDF failure scenarios.
    Parity: reference ChangeDataFeedHelper.scala:40-368."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        starting_version: int,
        ending_version: int | None = None,
    ):
        self.spark = spark
        self.path = path
        self.log = DeltaLog(path)
        self.starting_version = int(starting_version)
        self.ending_version = (
            int(ending_version) if ending_version is not None else self.log.latest_version()
        )

    # -- reads ---------------------------------------------------------------

    def read_cdf(self) -> DataFrame:
        return read_cdf(self.spark, self.path, self.starting_version, self.ending_version)

    def read_cdf_ignore_missing_delta_log(self) -> DataFrame | None:
        """Parity: ChangeDataFeedHelper.scala:78-79."""
        versions = self.get_versions_for_available_delta_log()
        if versions is None:
            return None
        return read_cdf(self.spark, self.path, versions[0], versions[1])

    def read_cdf_ignore_missing_cdc(self) -> DataFrame | None:
        """Parity: ChangeDataFeedHelper.scala:88."""
        versions = self.get_versions_for_available_cdc()
        if versions is None:
            return None
        return read_cdf(self.spark, self.path, versions[0], versions[1])

    def read_cdf_ignore_missing_ranges_for_edr(self) -> DataFrame | None:
        """Parity: ChangeDataFeedHelper.scala:63-66."""
        ranges = self.get_ranges_for_cdf_enabled_versions()
        if ranges is None:
            return None
        dfs = [read_cdf(self.spark, self.path, a, b) for a, b in ranges]
        return reduce(lambda x, y: x.union(y), dfs)

    # -- dry run -------------------------------------------------------------

    def dry_run(self) -> "ChangeDataFeedHelper":
        """Parity: ChangeDataFeedHelper.scala:101-123."""
        a = self.get_versions_for_available_delta_log()
        b = self.get_versions_for_available_cdc()
        c = self.get_ranges_for_cdf_enabled_versions()
        if a is None or b is None or c is None:
            raise RuntimeError("Please run methods individually to debug issues with CDF.")
        want = (self.starting_version, self.ending_version)
        assert a == want, (
            f"Delta Log for provided versions are not available. "
            f"Available versions are between {a[0]} and {a[1]}"
        )
        assert b == want, (
            f"Change Data for provided versions are not available. "
            f"Available CDC versions are between {a[0]} and {a[1]}"
        )
        assert len(c) == 1 and c[0] == want, (
            f"CDC has been disabled  between provided versions : "
            f"{self.starting_version} and {self.ending_version} . Use "
            f"getRangesForCDFEnabled method to find exact versions between which CDC is available"
        )
        return self

    # -- log availability ----------------------------------------------------

    def get_log_versions(self, is_checkpoint: bool) -> tuple[int, int] | None:
        """Parity: ChangeDataFeedHelper.scala:191-210."""
        try:
            if not is_checkpoint and not self.log.has_commit_file(self.starting_version):
                raise VersionNotFoundError(
                    self.starting_version,
                    self.log.earliest_reachable_version(),
                    self.log.latest_version(),
                )
            start_snap = self.log.snapshot(self.starting_version)
            end_snap = self.log.snapshot(self.ending_version)
            if _cdf_enabled(start_snap.configuration) and _cdf_enabled(end_snap.configuration):
                return (self.starting_version, self.ending_version)
            return None
        except VersionNotFoundError as e:
            return (e.earliest, e.latest)

    def get_versions_for_available_delta_log(self) -> tuple[int, int] | None:
        return self.get_log_versions(True)

    def check_earliest_delta_file_between_versions(self) -> tuple[int, int] | None:
        return self.get_log_versions(False)

    # -- CDC file availability ----------------------------------------------

    def get_versions_for_available_cdc(self) -> tuple[int, int] | None:
        """First version whose ``_change_data`` file still exists on disk
        (vacuum deletes oldest-first, so one probe per version suffices).
        Parity: ChangeDataFeedHelper.scala:225-284 — including the
        version-0 skip and the no-op-commit assertion."""
        version_to_query = -1
        start = (
            self.starting_version + 1
            if self.starting_version == 0 and self.starting_version + 1 < self.ending_version
            else self.starting_version
        )
        for v in range(start, self.ending_version):
            actions = self.log.read_actions(v)
            cdc = [a["cdc"] for a in actions if "cdc" in a and a["cdc"]]
            if not cdc:
                ci = next((a["commitInfo"] for a in actions if "commitInfo" in a), None)
                metrics = (ci or {}).get("operationMetrics") or {}
                if metrics and "numTargetRowsInserted" in metrics:
                    assert (
                        metrics.get("numTargetRowsInserted") == "0"
                        and metrics.get("numTargetRowsUpdated") == "0"
                        and metrics.get("numTargetRowsDeleted") == "0"
                    ), (
                        "Insert/Update/Delete has happened but cdc column is not present, "
                        "CDF might have been disabled between versions"
                    )
                else:
                    has_add = any("add" in a and a["add"] for a in actions)
                    has_remove = any("remove" in a and a["remove"] for a in actions)
                    if has_add and has_remove:
                        raise AssertionError(
                            "No insert/update/delete happened and cdc column is not present, "
                            "CDF might have been disabled between versions"
                        )
                continue
            p = os.path.join(self.path, urllib.parse.unquote(cdc[0]["path"]))
            if os.path.isfile(p):
                # vacuum deletes oldest-first: the first surviving CDC file
                # guarantees all later versions' files survive too
                version_to_query = v
                break
            # missing file (vacuumed) — keep scanning later versions
        if version_to_query == -1:
            return None
        return (version_to_query, self.ending_version)

    # -- enable/disable ranges -----------------------------------------------

    def get_all_versions_with_cdf_status(self) -> list[tuple[int, bool]]:
        """Per-version CDF status: metadata flag, presence of a cdc
        action, or carry-forward across no-op commits.
        Parity: ChangeDataFeedHelper.scala:327-359 (getCDFVersions)."""
        out: list[tuple[int, bool]] = []
        prev = False
        for v, actions in self.log.get_changes(self.starting_version):
            if v > self.ending_version:
                break
            cdc_evaluated = any(
                ("cdc" in a and a["cdc"])
                or ("metaData" in a and a["metaData"] and _cdf_enabled(a["metaData"].get("configuration")))
                for a in actions
            )
            non_commit = [a for a in actions if "commitInfo" not in a]
            if not non_commit:
                ci = next((a["commitInfo"] for a in actions if "commitInfo" in a), {})
                metrics = ci.get("operationMetrics") or {}
                if metrics:
                    if (
                        metrics.get("numTargetRowsDeleted") == "0"
                        and metrics.get("numTargetRowsInserted") == "0"
                        and metrics.get("numTargetRowsUpdated") == "0"
                    ):
                        enabled = prev
                    else:
                        enabled = cdc_evaluated
                else:
                    enabled = cdc_evaluated
            else:
                enabled = cdc_evaluated
            prev = enabled
            out.append((v, enabled))
        return out

    def get_all_cdf_enabled_versions(self) -> list[int]:
        return [v for v, on in self.get_all_versions_with_cdf_status() if on]

    def get_all_cdf_disabled_versions(self) -> list[int]:
        return [v for v, on in self.get_all_versions_with_cdf_status() if not on]

    def get_ranges_for_cdf_enabled_versions(self) -> list[tuple[int, int]] | None:
        return group_versions_inclusive(self.get_all_cdf_enabled_versions())

    def get_ranges_for_cdf_disabled_versions(self) -> list[tuple[int, int]] | None:
        return group_versions_inclusive(self.get_all_cdf_disabled_versions())


def group_versions_inclusive(versions: list[int]) -> list[tuple[int, int]] | None:
    """Group consecutive versions into inclusive ranges; lists of size
    0 or 1 yield None — quirk preserved from
    ChangeDataFeedHelper.scala:295-315 (including the -1 end marker for
    an isolated leading version)."""
    if len(versions) <= 1:
        return None
    p_version = versions[0]
    s_version = versions[0]
    cur_version = -1
    ranges: dict[int, int] = {}
    for x in versions[1:]:
        if p_version + 1 == x:
            cur_version = x
            p_version = x
        else:
            ranges[s_version] = cur_version
            p_version = x
            s_version = x
    ranges[s_version] = cur_version
    return sorted(ranges.items())

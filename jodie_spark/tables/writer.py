"""Data-file write path: DataFrame → parquet files + ``add`` actions.

Files are written by Spark (distributed, whole-stage codegen'd, honors
``spark.sql.files.maxRecordsPerFile``) into a staging dir under the
table root, then moved into place (same filesystem ⇒ O(1) rename per
file) and described by ``add`` actions with footer-derived stats.

Partitioned layouts use Hive-style ``col=value/`` directories —
identical to Delta's physical layout — so partition values come from
directory names and partition columns are not stored in the files.
"""

from __future__ import annotations

import json
import os
import urllib.parse
import uuid
from typing import Any

from pyspark.sql import DataFrame

from jodie_spark.fs import get_fs, strip_file_scheme
from jodie_spark.tables.stats import collect_file_stats

HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def _parse_partition_dirs(rel_dir: str) -> dict[str, str | None]:
    """'l_returnflag=A/l_linestatus=F' → {'l_returnflag': 'A', ...}."""
    values: dict[str, str | None] = {}
    if rel_dir in (".", ""):
        return values
    for segment in rel_dir.replace(os.sep, "/").split("/"):
        key, _, raw = segment.partition("=")
        raw = urllib.parse.unquote(raw)
        values[key] = None if raw == HIVE_DEFAULT_PARTITION else raw
    return values


def write_data_files(
    df: DataFrame,
    table_path: str,
    partition_columns: list[str] | None = None,
    stat_exclude: set[str] | None = None,
    table_config: dict[str, str] | None = None,
) -> list[dict[str, Any]]:
    """Write ``df`` as parquet under ``table_path``; return add actions.

    Honors the table's ``delta.dataSkippingNumIndexedCols`` (when the
    target is an existing Delta table): per-file min/max/null stats are
    collected for only the first N schema columns — the knob that keeps
    the log's stats payload bounded on very wide tables.

    Honors ``delta.autoOptimize.optimizeWrite``: before writing, the
    output is REBALANCE-hinted (per partition column when partitioned)
    so AQE coalesces/splits shuffle output to its advisory partition
    size — a small append from a 200-task stage lands as one
    right-sized file instead of 200 shards, and a skewed partition
    splits instead of producing one giant file. This is the write-side
    half of small-file control; post-commit auto-compaction
    (``delta.autoOptimize.autoCompact``) is the read-side half."""
    fs = get_fs(table_path)
    table_path = fs.abspath(strip_file_scheme(table_path))
    num_indexed: int | None = None
    optimize_write = False
    try:
        # callers mid-operation pass the transaction snapshot's
        # configuration (table_config) — skipping a redundant log
        # replay + directory LIST per write, and reading the knobs at
        # the operation's own snapshot rather than racing a concurrent
        # metadata change
        if table_config is None:
            from jodie_spark.tables.log import DeltaLog

            _log = DeltaLog(table_path)
            if _log.exists():
                table_config = _log.table_info().configuration
        cfg = table_config or {}
        v = cfg.get("delta.dataSkippingNumIndexedCols")
        if v is not None:
            num_indexed = int(v)
        optimize_write = (
            str(cfg.get("delta.autoOptimize.optimizeWrite", "false")).lower()
            == "true"
        )
    except Exception:
        num_indexed = None
    if optimize_write:
        try:
            df = (
                df.hint("rebalance", *partition_columns)
                if partition_columns
                else df.hint("rebalance")
            )
        except Exception:
            pass  # a hint must never fail the write
    fs.makedirs(table_path)
    staging = fs.join(table_path, f".staging-{uuid.uuid4().hex}")

    writer = df.write.mode("overwrite")
    if partition_columns:
        writer = writer.partitionBy(*partition_columns)
    # Spark's data plane writes the staging files (Hadoop handles the
    # store natively); fs.spark_path translates schemed test fakes
    writer.parquet(fs.spark_path(staging))

    moved: list[tuple[str, str, str]] = []  # (rel_path, rel_dir, dst)
    try:
        for src in fs.walk_files(staging):
            name = fs.basename(src)
            if not name.endswith(".parquet") or name.startswith(("_", ".")):
                continue
            rel_path = src[len(staging):].strip("/").strip(os.sep)
            rel_path = rel_path.replace(os.sep, "/")
            rel_dir = rel_path.rsplit("/", 1)[0] if "/" in rel_path else "."
            dst = fs.join(table_path, *rel_path.split("/"))
            fs.makedirs(fs.dirname(dst))
            fs.rename(src, dst)
            moved.append((rel_path, rel_dir, dst))

        # footer-stat reads are independent I/O — run them in a thread
        # pool so a many-file commit is bounded by storage parallelism,
        # not a sequential driver loop
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, max(4, len(moved)))) as pool:
            stats_list = list(
                pool.map(
                    lambda m: collect_file_stats(m[2], num_indexed, stat_exclude),
                    moved,
                )
            )

        adds: list[dict[str, Any]] = []
        for (rel_path, rel_dir, dst), stats in zip(moved, stats_list):
            if stats["numRecords"] == 0:
                fs.remove(dst)  # Spark can emit empty part files; skip them
                continue
            adds.append(
                {
                    # Delta protocol: add.path is percent-encoded relative
                    # to the table root; readers unquote it back to the
                    # on-disk name (matters for Spark's escaped partition
                    # dirs like p=a%20b, which must round-trip as %2520)
                    "path": urllib.parse.quote(rel_path, safe="/="),
                    "partitionValues": _parse_partition_dirs(rel_dir),
                    "size": fs.size(dst),
                    "modificationTime": fs.mtime_ms(dst),
                    "dataChange": True,
                    "stats": json.dumps(stats, separators=(",", ":")),
                }
            )
    finally:
        fs.rmtree(staging)
    return adds


def write_metrics(adds: list[dict[str, Any]]) -> dict[str, str]:
    """WRITE operationMetrics, computed from footer stats (no extra scan).

    Key parity: Delta's WRITE metrics read by the reference
    (OperationMetricHelper.scala:218-225)."""
    num_rows = 0
    for add in adds:
        stats = add.get("stats")
        if stats:
            num_rows += int(json.loads(stats).get("numRecords") or 0)
    return {
        "numFiles": str(len(adds)),
        "numOutputRows": str(num_rows),
        "numOutputBytes": str(sum(int(a.get("size") or 0) for a in adds)),
    }

"""Table utility operators.

Parity: reference DeltaHelpers.scala — latestVersion (:20-21),
deltaFileSizes (:221-231), validateAppend (:354-379),
getStorageLocation (:381-385), copyTable (:402-424),
findCompositeKeyCandidate (:455-477), withMD5Columns (:479-492),
isCompositeKeyCandidate (:505-528), humanizeBytes (:530-537),
showDeltaFileSizes (:539-548).
"""

from __future__ import annotations

import itertools
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jodie_spark.errors import JodieValidationError
from jodie_spark.tables.table import DeltaTable, write_delta


def latest_version(spark: SparkSession, path: str) -> int:
    """Latest committed version. Parity: DeltaHelpers.scala:20-21."""
    return DeltaTable.forPath(spark, path).deltaLog.latest_version()


def get_storage_location(delta_table: DeltaTable) -> str:
    """Parity: DeltaHelpers.scala:381-385."""
    return delta_table.detail().select("location").collect()[0][0]


def delta_file_sizes(delta_table: DeltaTable) -> dict[str, int]:
    """Total size, file count, and average file size. The average uses
    integer division then round — quirk preserved from
    DeltaHelpers.scala:221-231 (0-file table ⇒ 0 average)."""
    row = delta_table.detail().select("numFiles", "sizeInBytes").collect()[0]
    num_files, size_in_bytes = int(row["numFiles"]), int(row["sizeInBytes"])
    avg = 0 if num_files == 0 else round(size_in_bytes // num_files)
    return {
        "size_in_bytes": size_in_bytes,
        "number_of_files": num_files,
        "average_file_size_in_bytes": avg,
    }


def humanize_bytes(n: float) -> str:
    """Bytes → '1.23 GB'; the unit switches at 0.9×unit — quirk from
    DeltaHelpers.scala:530-537."""
    for prefix, k in (("PB", 1e15), ("TB", 1e12), ("GB", 1e9), ("MB", 1e6), ("kB", 1e3)):
        if n >= k * 0.9:
            return f"{n / k:.2f} {prefix}"
    return f"{n:.0f} B"


def show_delta_file_sizes(delta_table: DeltaTable) -> None:
    """Parity: DeltaHelpers.scala:539-548."""
    sizes = delta_file_sizes(delta_table)
    print(
        f"The delta table contains {sizes['number_of_files']} files with a size of "
        f"{humanize_bytes(sizes['size_in_bytes'])}. The average file size is "
        f"{humanize_bytes(sizes['average_file_size_in_bytes'])}"
    )


def with_md5_columns(
    data: DataFrame | DeltaTable, cols: Sequence[str], new_col_name: str = ""
) -> DataFrame:
    """Append an md5 surrogate key of ``cols`` joined by ``||``.
    Default column name is ``_md5`` + concatenated column names.
    Parity: DeltaHelpers.scala:479-492 (golden hashes in
    DeltaHelperSpec.scala:740-794)."""
    df = data.toDF() if isinstance(data, DeltaTable) else data
    output_col = new_col_name or "_md5" + "".join(cols)
    return df.withColumn(output_col, F.md5(F.concat_ws("||", *[F.col(c) for c in cols])))


def validate_append(
    delta_table: DeltaTable,
    append_df: DataFrame,
    required_cols: Sequence[str],
    optional_cols: Sequence[str],
) -> None:
    """Schema-allowlisted append: required columns must be present; any
    column not already on the table must be declared optional; then
    append with mergeSchema. Parity: DeltaHelpers.scala:354-379."""
    append_columns = list(append_df.columns)
    table_columns = [f.name for f in delta_table.schema().fields]

    missing = [c for c in required_cols if c not in append_columns]
    if missing:
        raise JodieValidationError(
            f"The base Delta table has these columns {append_columns}, "
            f"but these columns are required {list(required_cols)}"
        )
    invalid = [c for c in append_columns if c not in table_columns and c not in optional_cols]
    if invalid:
        raise JodieValidationError(
            "The following columns are not part of the current Delta table. "
            "If you want to add these columns to the table, you must set the "
            f"optionalCols parameter: {invalid}"
        )
    write_delta(
        append_df,
        get_storage_location(delta_table),
        mode="append",
        options={"mergeSchema": "true"},
    )


def copy_table(
    delta_table: DeltaTable,
    target_path: str | None = None,
    target_table_name: str | None = None,
) -> None:
    """Copy data + partitioning + properties (not history) to a new
    table. Parity: DeltaHelpers.scala:402-424."""
    if target_path and target_table_name:
        raise JodieValidationError(
            "Ambiguous destination only one of the two must be defined targetPath or targetTableName."
        )
    if not target_path and not target_table_name:
        raise JodieValidationError("Either targetPath or targetTableName must be specified.")

    details = delta_table.detail().select("partitionColumns", "properties").collect()[0]
    partition_columns = list(details["partitionColumns"] or [])
    properties = dict(details["properties"] or {})

    if target_table_name:
        warehouse = delta_table.spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        target_path = os.path.join(warehouse, target_table_name)
    write_delta(
        delta_table.toDF(),
        target_path,
        partition_by=partition_columns,
        options=properties,
    )
    if target_table_name:
        # reference parity: saveAsTable registers a metastore table
        # (DeltaHelpers.scala:415); here the name resolves through the
        # log-aware catalog so spark.table(name) reads the copy
        from jodie_spark.catalog import register_delta_table

        register_delta_table(delta_table.spark, target_table_name, target_path)


def find_composite_key_candidate(
    delta_table: DeltaTable, exclude_cols: Sequence[str] = ()
) -> list[str]:
    """Smallest column combination whose distinct count equals the full
    table's distinct row count. Quirks preserved from
    DeltaHelpers.scala:455-477: the target count includes excluded
    columns, and a combo spanning every original column is rejected.

    Cost note: O(2^n) distinct-count jobs worst case — same brute-force
    contract as the reference; cache the base DF to avoid re-reading."""
    df = delta_table.toDF()
    cols = list(df.columns)
    total_cols = len(cols)
    df.cache()
    try:
        total_rows = df.distinct().count()
        cleaned = df.drop(*exclude_cols) if exclude_cols else df
        for i in range(1, total_cols + 2):
            for combo in itertools.combinations(cleaned.columns, i):
                if len(combo) == total_cols:
                    continue
                if cleaned.select(*[F.col(c) for c in combo]).distinct().count() == total_rows:
                    return list(combo)
        return []
    finally:
        df.unpersist()


def is_composite_key_candidate(delta_table: DeltaTable, cols: Sequence[str]) -> bool:
    """True iff ``cols`` has no duplicate groups.
    Parity: DeltaHelpers.scala:505-528."""
    if not cols:
        raise ValueError("At least one column must be specified.")
    df = delta_table.toDF()
    if not all(c in df.columns for c in cols):
        raise ValueError(
            f"The base table has these columns {','.join(df.columns)}, "
            f"but these columns are required {','.join(cols)}"
        )
    dup = (
        df.groupBy(*[F.col(c) for c in cols])
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
    )
    return len(dup.take(1)) == 0


def shallow_clone(
    delta_table: DeltaTable,
    target_path: str,
    version: int | None = None,
    timestamp: str | None = None,
) -> DeltaTable:
    """Zero-copy clone: a new Delta table whose add actions reference
    the source table's data files by ABSOLUTE path — no data movement,
    so cloning a 100 TB table is one metadata commit. Writes to the
    clone (append/delete/update/merge/optimize) copy-on-write into the
    clone's own directory and never touch source files; the clone's
    vacuum only ever deletes files under the clone directory.

    Parity: Delta's CREATE TABLE ... SHALLOW CLONE (the protocol's
    absolute-path add support); the reference library only offers the
    deep ``copyTable``.

    ``version`` / ``timestamp`` clone a HISTORICAL snapshot
    (delta-spark's ``SHALLOW CLONE src VERSION|TIMESTAMP AS OF ...``) —
    the clone starts from exactly the files live at that point, so a
    bad write can be forked-around without touching the source.

    Caveats: vacuuming the SOURCE table can invalidate the clone (same
    as delta-spark); cloning a table with deletion vectors is refused
    at read time.
    """
    import time as _time
    import urllib.parse as _up
    import uuid as _uuid

    from jodie_spark.tables.log import DeltaLog

    if timestamp is not None:
        if version is not None:
            raise JodieValidationError("pass version or timestamp, not both")
        import datetime as _dt

        ts = _dt.datetime.fromisoformat(timestamp)
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        version = delta_table.deltaLog.version_at_timestamp(
            int(ts.timestamp() * 1000)
        )
    src_snap = delta_table.snapshot(version)
    src_root = os.path.abspath(delta_table.path)
    target_path = os.path.abspath(target_path)
    log = DeltaLog(target_path)
    if log.exists():
        raise JodieValidationError(f"path {target_path} already exists.")

    adds = []
    for a in src_snap.add_files():
        abs_path = os.path.join(src_root, _up.unquote(a["path"]))
        clone_add = dict(a)
        clone_add["path"] = _up.quote(abs_path)
        clone_add["dataChange"] = True
        adds.append(clone_add)

    meta = dict(src_snap.metadata)
    meta["id"] = str(_uuid.uuid4())
    meta["createdTime"] = int(_time.time() * 1000)
    actions = [
        {"protocol": dict(src_snap.protocol or {"minReaderVersion": 1, "minWriterVersion": 2})},
        {"metaData": meta},
    ] + [{"add": a} for a in adds]
    log.commit(
        -1,
        actions,
        "CLONE",
        {
            "source": src_root,
            "sourceVersion": str(src_snap.version),
            "isShallow": "true",
        },
    )
    return DeltaTable(delta_table.spark, target_path)

"""Spark-side add-files DataFrame + file-distribution / shuffle-file
analytics.

Parity: reference DeltaHelpers.scala:41-140, 197-219 — rebuilt on the
public log format instead of Delta's internal
``Snapshot.filesWithStatsForScan`` / ``OptimisticTransaction.filterFiles``.

Scale design (the reason this module exists): the log is read by
*Spark*, not driver Python — checkpoint parquet + JSON tail via
``spark.read``, reconciled with a window over path — so a
million-file table's metadata is a distributed dataset, exactly how
Delta evaluates data skipping on large tables. File skipping is a
``filter()`` over parsed stats columns; the driver never materializes
the file list.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jodie_spark.tables.log import (
    DeltaLog,
    checkpoint_file_name,
    commit_file_name,
)
from jodie_spark.tables.pruning import (
    _coerce,
    _prefix_upper,
    _split_top_level,
    classify_conjunct,
    split_conjuncts,
)
from jodie_spark.tables.table import DeltaTable

# output column names — parity: reference delta/DeltaConstants.scala:5-31
PERCENTILE_COL = "Percentile[10th, 25th, Median, 75th, 90th, 95th]"
SIZE_DF_COLUMNS = [
    "partitionValues", "num_of_parquet_files", "mean_size_of_files",
    "stddev", "min_file_size", "max_file_size", PERCENTILE_COL,
]
NUM_RECORDS_DF_COLUMNS = [
    "partitionValues", "num_of_parquet_files", "mean_num_records_in_files",
    "stddev", "min_num_records", "max_num_records", PERCENTILE_COL,
]
OVERALL = "OVERALL RESOLVED CONDITION =>"
MIN_MAX = "GREATER THAN / LESS THAN PART =>"
EQUALS = "EQUALS/EQUALS NULL SAFE PART =>"
LEFT_OVER = "LEFT OVER PART =>"
UNRESOLVED = "UNRESOLVED PART =>"
TOTAL_NUM_FILES = "TOTAL_NUM_FILES_IN_DELTA_TABLE =>"
UNRESOLVED_COLS = "UNRESOLVED_COLUMNS =>"

_DV_SCHEMA = T.StructType(
    [
        T.StructField("storageType", T.StringType()),
        T.StructField("pathOrInlineDv", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("sizeInBytes", T.IntegerType()),
        T.StructField("cardinality", T.LongType()),
    ]
)
_ADD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("partitionValues", T.MapType(T.StringType(), T.StringType())),
        T.StructField("size", T.LongType()),
        T.StructField("modificationTime", T.LongType()),
        T.StructField("dataChange", T.BooleanType()),
        T.StructField("stats", T.StringType()),
        # optional protocol fields that MUST survive state round-trips:
        # losing a DV resurrects deleted rows; losing baseRowId breaks
        # row tracking; losing tags breaks incremental clustering
        T.StructField("deletionVector", _DV_SCHEMA),
        T.StructField("baseRowId", T.LongType()),
        T.StructField("defaultRowCommitVersion", T.LongType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)
_REMOVE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("deletionTimestamp", T.LongType()),
        T.StructField("dataChange", T.BooleanType()),
        T.StructField("partitionValues", T.MapType(T.StringType(), T.StringType())),
        T.StructField("size", T.LongType()),
    ]
)
_ACTION_SCHEMA = T.StructType(
    [
        T.StructField("add", _ADD_SCHEMA),
        T.StructField("remove", _REMOVE_SCHEMA),
    ]
)


def _latest_actions_df(
    spark: SparkSession, path: str, max_version: int | None = None
) -> DataFrame:
    """Newest action per file path as ``[add, remove]`` structs —
    checkpoint parquet (single- or multi-part) + JSON tail, all read by
    Spark. The reconciliation (adds survive, removes become
    tombstones) is a window over path, exactly how Delta reconstructs
    state distributed."""
    log = DeltaLog(path)
    latest = log.latest_version() if max_version is None else int(max_version)
    checkpoints = [c for c in log.list_checkpoint_versions() if c <= latest]
    base = max(checkpoints) if checkpoints else None

    sources: list[DataFrame] = []
    if base is not None:
        cp_files = log.checkpoint_part_files(base)
        # a V2 checkpoint's JSON manifest can't ride the parquet scan;
        # its (rare) add/remove actions are unioned driver-side below —
        # sidecars and parquet manifests all go through one merged scan
        pq_files = [
            log._fs.spark_path(p) for p in cp_files if p.endswith(".parquet")
        ]
        json_manifest_actions = [
            a
            for p in cp_files
            if p.endswith(".json")
            for a in log._read_manifest_actions(p)
            if a.get("add") or a.get("remove")
        ]
        cp = (
            spark.read.option("mergeSchema", "true").parquet(*pq_files)
            if pq_files
            else None
        )

        # project subfields explicitly — checkpoint structs carry extra
        # fields and struct casts require matching arity. Externally
        # written checkpoints may omit optional subfields (remove.size,
        # remove.partitionValues are optional in the protocol) or whole
        # top-level columns (V2 sidecars carry only add/remove), so
        # missing ones become typed nulls instead of AnalysisExceptions.
        def sub(parent: str, name: str, dtype: T.DataType) -> Column:
            present = False
            if parent in cp.columns:
                parent_type = cp.schema[parent].dataType
                present = isinstance(parent_type, T.StructType) and name in parent_type.names
            col = F.col(f"{parent}.{name}") if present else F.lit(None)
            return col.cast(dtype).alias(name)

        str_map = T.MapType(T.StringType(), T.StringType())

        def dv_struct() -> Column:
            # nested optional struct: project subfield-by-subfield so an
            # external checkpoint's wider/narrower DV struct still reads
            parent_ok = (
                "add" in cp.columns
                and isinstance(cp.schema["add"].dataType, T.StructType)
                and "deletionVector" in cp.schema["add"].dataType.names
            )
            if not parent_ok:
                return F.lit(None).cast(_DV_SCHEMA).alias("deletionVector")
            dvt = cp.schema["add"].dataType["deletionVector"].dataType

            def dsub(name: str, dtype: T.DataType) -> Column:
                col = (
                    F.col(f"add.deletionVector.{name}")
                    if isinstance(dvt, T.StructType) and name in dvt.names
                    else F.lit(None)
                )
                return col.cast(dtype).alias(name)

            inner = F.struct(*[dsub(f.name, f.dataType) for f in _DV_SCHEMA.fields])
            return F.when(
                F.col("add.deletionVector").isNotNull(), inner
            ).alias("deletionVector")

        add_struct = F.struct(
            sub("add", "path", T.StringType()),
            sub("add", "partitionValues", str_map),
            sub("add", "size", T.LongType()),
            sub("add", "modificationTime", T.LongType()),
            sub("add", "dataChange", T.BooleanType()),
            sub("add", "stats", T.StringType()),
            dv_struct(),
            sub("add", "baseRowId", T.LongType()),
            sub("add", "defaultRowCommitVersion", T.LongType()),
            sub("add", "tags", str_map),
        )
        remove_struct = F.struct(
            sub("remove", "path", T.StringType()),
            sub("remove", "deletionTimestamp", T.LongType()),
            sub("remove", "dataChange", T.BooleanType()),
            sub("remove", "partitionValues", str_map),
            sub("remove", "size", T.LongType()),
        )
        if cp is not None:
            has_add = "add" in cp.columns
            has_remove = "remove" in cp.columns
            sources.append(
                cp.select(
                    F.lit(base).alias("version"),
                    (
                        F.when(F.col("add").isNotNull(), add_struct)
                        if has_add
                        else F.lit(None).cast(_ACTION_SCHEMA["add"].dataType)
                    ).alias("add"),
                    (
                        F.when(F.col("remove").isNotNull(), remove_struct)
                        if has_remove
                        else F.lit(None).cast(_ACTION_SCHEMA["remove"].dataType)
                    ).alias("remove"),
                )
            )
        if json_manifest_actions:
            rows = [
                (base, a.get("add"), a.get("remove")) for a in json_manifest_actions
            ]
            sources.append(
                spark.createDataFrame(
                    rows,
                    T.StructType(
                        [T.StructField("version", T.LongType())]
                        + list(_ACTION_SCHEMA.fields)
                    ),
                ).select("version", "add", "remove")
            )
    tail = [
        v for v in log.list_commit_versions()
        if (base is None or v > base) and v <= latest
    ]
    if tail:
        tail_paths = [
            log._fs.spark_path(log._fs.join(log.log_path, commit_file_name(v)))
            for v in tail
        ]
        raw = spark.read.schema(_ACTION_SCHEMA).json(tail_paths)
        sources.append(
            raw.withColumn(
                "version",
                F.regexp_extract(F.input_file_name(), r"(\d+)\.json", 1).cast("long"),
            ).select("version", "add", "remove")
        )
    if not sources:
        return spark.createDataFrame([], _ACTION_SCHEMA)

    actions = sources[0]
    for s in sources[1:]:
        actions = actions.unionByName(s)
    actions = actions.filter(F.col("add").isNotNull() | F.col("remove").isNotNull())
    actions = actions.withColumn(
        "__path__", F.coalesce(F.col("add.path"), F.col("remove.path"))
    )
    # same-version tie-break: a MoR rewrite commits remove(path) AND
    # add(path + deletionVector) in ONE version — the add is the final
    # state (protocol reconciliation); letting the remove win drops the
    # file from Spark-side state entirely (checkpoints lose it, DML
    # planning skips it)
    w = Window.partitionBy("__path__").orderBy(
        F.col("version").desc(), F.col("add").isNotNull().cast("int").desc()
    )
    return (
        actions.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select("add", "remove")
    )


def files_df(spark: SparkSession, path: str) -> DataFrame:
    """Active add-files of the latest snapshot as a Spark DataFrame:
    ``[path, partitionValues, size, modificationTime, stats,
    deletionVector, baseRowId, defaultRowCommitVersion, tags]``.

    The protocol fields ride along so Spark-side DML planning never
    drops a candidate's DV descriptor (which would resurrect deleted
    rows in a CoW rewrite) or its row-tracking lineage; Catalyst prunes
    them out of plans that don't touch them."""
    return (
        _latest_actions_df(spark, path)
        .filter(F.col("add").isNotNull())
        .select(
            "add.path",
            "add.partitionValues",
            "add.size",
            "add.modificationTime",
            "add.stats",
            "add.deletionVector",
            "add.baseRowId",
            "add.defaultRowCommitVersion",
            "add.tags",
        )
    )


_CP_ACTIONS_PER_PART = 500_000


def write_checkpoint_spark(
    spark: SparkSession, path: str, version: int | None = None
) -> int:
    """Distributed checkpoint write: state reconstruction AND parquet
    encoding run in Spark, so driver memory is bounded at any table
    size (the driver-side ``pa.Table.from_pylist`` alternative holds
    every add action in memory at once — minutes and gigabytes at 10⁶
    files). Add/remove state lands in ``ceil(n/500k)`` Spark-written
    parts; metaData/protocol ride in one tiny driver-written part.
    Multi-part naming follows the Delta protocol
    (``<v>.checkpoint.<i>.<n>.parquet``)."""
    import shutil
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jodie_spark.tables.log import (
        _CHECKPOINT_SCHEMA,
        LAST_CHECKPOINT,
        multipart_checkpoint_file_name,
    )
    import json as _json

    log = DeltaLog(path)
    target = log.latest_version() if version is None else int(version)
    info = log.table_info(target)

    meta_t = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("description", T.StringType()),
            T.StructField(
                "format",
                T.StructType(
                    [
                        T.StructField("provider", T.StringType()),
                        T.StructField("options", T.MapType(T.StringType(), T.StringType())),
                    ]
                ),
            ),
            T.StructField("schemaString", T.StringType()),
            T.StructField("partitionColumns", T.ArrayType(T.StringType())),
            T.StructField("configuration", T.MapType(T.StringType(), T.StringType())),
            T.StructField("createdTime", T.LongType()),
        ]
    )
    proto_t = T.StructType(
        [
            T.StructField("minReaderVersion", T.IntegerType()),
            T.StructField("minWriterVersion", T.IntegerType()),
            T.StructField("readerFeatures", T.ArrayType(T.StringType())),
            T.StructField("writerFeatures", T.ArrayType(T.StringType())),
        ]
    )

    state = _latest_actions_df(spark, path, max_version=target)
    # checkpointed adds carry dataChange=false (they describe state, not
    # change); un-expired tombstones must survive (protocol requirement —
    # or vacuum could never delete pre-checkpoint removes)
    domain_t = T.StructType(
        [
            T.StructField("domain", T.StringType()),
            T.StructField("configuration", T.StringType()),
            T.StructField("removed", T.BooleanType()),
        ]
    )
    add_struct = F.struct(
        F.col("add.path").alias("path"),
        F.col("add.partitionValues").alias("partitionValues"),
        F.col("add.size").alias("size"),
        F.col("add.modificationTime").alias("modificationTime"),
        F.lit(False).alias("dataChange"),
        F.col("add.stats").alias("stats"),
        F.col("add.deletionVector").alias("deletionVector"),
        F.col("add.baseRowId").alias("baseRowId"),
        F.col("add.defaultRowCommitVersion").alias("defaultRowCommitVersion"),
        F.col("add.tags").alias("tags"),
    )
    out = state.select(
        F.when(F.col("add").isNotNull(), add_struct).alias("add"),
        F.col("remove"),
        F.lit(None).cast(meta_t).alias("metaData"),
        F.lit(None).cast(proto_t).alias("protocol"),
        F.lit(None).cast(domain_t).alias("domainMetadata"),
    )
    n_actions = out.count()
    n_parts = max(1, -(-n_actions // _CP_ACTIONS_PER_PART))

    fs = log._fs
    stage = fs.join(log.table_path, f"_checkpoint_stage_{_uuid.uuid4().hex}")
    try:
        out.repartition(n_parts).write.parquet(fs.spark_path(stage), mode="overwrite")
        spark_parts = sorted(
            fs.join(stage, n)
            for n in fs.listdir(stage)
            if n.startswith("part-") and n.endswith(".parquet")
        )
        # driver-written metadata part: protocol + metaData + live
        # domain metadata (row-tracking watermark etc.) — constant size
        meta_rows: list[dict[str, Any]] = [
            {"protocol": info.protocol},
            {"metaData": info.metadata},
        ]
        for dm in log.all_domain_metadata(target).values():
            meta_rows.append(
                {
                    "domainMetadata": {
                        "domain": dm.get("domain"),
                        "configuration": dm.get("configuration"),
                        "removed": bool(dm.get("removed", False)),
                    }
                }
            )
        meta_part = fs.join(stage, "metadata-part.parquet")
        import io as _io

        _buf = _io.BytesIO()
        pq.write_table(pa.Table.from_pylist(meta_rows, schema=_CHECKPOINT_SCHEMA), _buf)
        fs.write_atomic(meta_part, _buf.getvalue())

        all_parts = spark_parts + [meta_part]
        total = len(all_parts)
        if total == 1:
            names = [fs.join(log.log_path, f"{target:020d}.checkpoint.parquet")]
        else:
            names = [
                fs.join(log.log_path, multipart_checkpoint_file_name(target, i + 1, total))
                for i in range(total)
            ]
        for src, dst in zip(all_parts, names):
            fs.rename(src, dst)
        payload: dict[str, Any] = {
            "version": target,
            "size": n_actions + len(meta_rows),
        }
        if total > 1:
            payload["parts"] = total
        fs.write_text_atomic(
            fs.join(log.log_path, LAST_CHECKPOINT), _json.dumps(payload)
        )
    finally:
        fs.rmtree(stage)
    return target


def _stats_schema(table_schema: T.StructType) -> T.StructType:
    """Typed schema for the per-file stats JSON — min/max values typed as
    their table columns so comparisons are native, not string-ly."""
    leaf = [f for f in table_schema.fields if not isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType))]
    mm = T.StructType([T.StructField(f.name, f.dataType) for f in leaf])
    nc = T.StructType([T.StructField(f.name, T.LongType()) for f in leaf])
    return T.StructType(
        [
            T.StructField("numRecords", T.LongType()),
            T.StructField("minValues", mm),
            T.StructField("maxValues", mm),
            T.StructField("nullCount", nc),
        ]
    )


def _typed_lit(value: Any, dtype: T.DataType) -> Column | None:
    """Driver-side coerced literal, or None when the value cannot be
    represented in the column type. Mirrors pruning._coerce so this
    Spark-side files filter and the driver-side file_may_match treat
    un-coercible literals identically (keep the conjunct out, keep the
    files — ADVICE r10): a bare F.lit(v).cast(dtype) turns unparseable
    input into a NULL literal, which the partition branches'
    coalesce(..., False) would escalate into prune-every-file (and
    under ANSI mode the row filter would error instead of match
    nothing)."""
    if value is None:
        return None
    if _coerce(value, dtype) is None:
        return None
    return F.lit(value).cast(dtype)


def _file_filter_column(
    condition: str, table_schema: T.StructType, partition_columns: list[str]
) -> tuple[Column, list[str]]:
    """Build a Column over the parsed files DF that keeps files which
    *may* contain matching rows (partition pruning + min/max skipping),
    plus the list of unresolved references. Conservative: unsupported
    conjuncts keep every file — Delta's skipping contract.

    Partition branches fall back to ``raw IS NOT NULL`` when the typed
    comparison is NULL: a genuinely NULL partition value can never
    satisfy a non-null comparison (prune), but a present-yet-uncastable
    serialization (foreign writer) must keep the file, matching
    ``pruning.file_may_match``."""
    columns = [f.name for f in table_schema.fields]
    field_types = {f.name: f.dataType for f in table_schema.fields}
    keep = F.lit(True)
    unresolved: list[str] = []
    for raw in split_conjuncts(condition):
        disjuncts = _split_top_level(raw, "or")
        if len(disjuncts) > 1:
            # OR tree: a file survives if SOME branch may match —
            # recursive, same shape as pruning.compile_skipping_predicate
            branch: Column | None = None
            for d in disjuncts:
                k_d, unres_d = _file_filter_column(
                    d, table_schema, partition_columns
                )
                unresolved.extend(unres_d)
                branch = k_d if branch is None else (branch | k_d)
            keep = keep & branch
            continue
        cj = classify_conjunct(raw, columns)
        if cj.kind == "unresolved":
            unresolved.extend([r for r in cj.references if "." in r or r not in columns])
            continue
        if cj.column is None or cj.op is None:
            continue
        col, op = cj.column, cj.op
        dtype = field_types.get(col)
        if dtype is None:
            continue
        if cj.kind == "in":
            vals = [_typed_lit(v, dtype) for v in cj.literal]
            if not vals or any(v is None for v in vals):
                continue  # un-coercible / null members — keep every file
            if col in partition_columns:
                raw_val = F.element_at(F.col("partitionValues"), col)
                val = raw_val.try_cast(dtype)
                keep = keep & F.coalesce(val.isin(*vals), raw_val.isNotNull())
            else:
                mn = F.col(f"parsed_stats.minValues.{col}")
                mx = F.col(f"parsed_stats.maxValues.{col}")
                any_in_range = F.lit(False)
                for v in vals:
                    any_in_range = any_in_range | ((mn <= v) & (mx >= v))
                keep = keep & F.coalesce(any_in_range, F.lit(True))
            continue
        if cj.kind in ("not_equality", "not_in"):
            raw_lits = [cj.literal] if cj.kind == "not_equality" else list(cj.literal)
            lits = [_typed_lit(v, dtype) for v in raw_lits]
            if not lits or any(v is None for v in lits):
                continue  # un-coercible / null members — keep every file
            if col in partition_columns:
                raw_val = F.element_at(F.col("partitionValues"), col)
                val = raw_val.try_cast(dtype)
                # NULL partition value: != / NOT IN is NULL, never true
                # (prune); present-but-uncastable value: typed compare
                # is impossible, keep the file (matches
                # pruning.file_may_match). Explicit WHEN ladder — a
                # coalesce over `val.isNotNull() & ...` evaluates to
                # FALSE (not NULL) on the uncastable case and would
                # prune a file that may hold matching rows (ADVICE r11).
                keep = keep & (
                    F.when(raw_val.isNull(), F.lit(False))
                    .when(val.isNull(), F.lit(True))
                    .otherwise(F.coalesce(~val.isin(*lits), F.lit(True)))
                )
            else:
                mn = F.col(f"parsed_stats.minValues.{col}")
                mx = F.col(f"parsed_stats.maxValues.{col}")
                nulls = F.col(f"parsed_stats.nullCount.{col}")
                nrec = F.col("parsed_stats.numRecords")
                all_null = nulls.isNotNull() & nrec.isNotNull() & (nulls == nrec)
                single_excluded = (mn == mx) & mn.isin(*lits)
                keep = keep & F.coalesce(
                    ~(all_null | F.coalesce(single_excluded, F.lit(False))),
                    F.lit(True),
                )
            continue
        if cj.kind == "between":
            lo, hi = cj.literal
            lo_l, hi_l = _typed_lit(lo, dtype), _typed_lit(hi, dtype)
            if lo_l is None or hi_l is None:
                continue  # NULL / un-coercible bound — keep every file
            if col in partition_columns:
                raw_val = F.element_at(F.col("partitionValues"), col)
                val = raw_val.try_cast(dtype)
                keep = keep & F.coalesce(
                    (val >= lo_l) & (val <= hi_l), raw_val.isNotNull()
                )
            else:
                mn = F.col(f"parsed_stats.minValues.{col}")
                mx = F.col(f"parsed_stats.maxValues.{col}")
                keep = keep & F.coalesce((mn <= hi_l) & (mx >= lo_l), F.lit(True))
            continue
        if cj.kind == "like_prefix":
            if not isinstance(dtype, T.StringType):
                continue
            upper = _prefix_upper(cj.literal)
            if col in partition_columns:
                val = F.element_at(F.col("partitionValues"), col)
                cond = val >= F.lit(cj.literal)
                if upper is not None:
                    cond = cond & (val < F.lit(upper))
                keep = keep & F.coalesce(cond, F.lit(False))
            else:
                mn = F.col(f"parsed_stats.minValues.{col}")
                mx = F.col(f"parsed_stats.maxValues.{col}")
                cond = mx >= F.lit(cj.literal)
                if upper is not None:
                    cond = cond & (mn < F.lit(upper))
                keep = keep & F.coalesce(cond, F.lit(True))
            continue
        lit = None
        if cj.literal is not None:
            lit = _typed_lit(cj.literal, dtype)
            if lit is None:
                continue  # un-coercible literal — keep every file
        if col in partition_columns:
            raw_val = F.element_at(F.col("partitionValues"), col)
            # try_cast: NULL-on-failure must hold even under ANSI mode
            # (Spark 4.x default), where a plain cast of a foreign
            # writer's malformed partition value would throw
            # CAST_INVALID_INPUT instead of falling back (ADVICE r11)
            val = raw_val.try_cast(dtype)
            if op == "is null":
                # value present (even un-castable) != NULL: decide on raw
                keep = keep & raw_val.isNull()
                continue
            if op == "is not null":
                keep = keep & raw_val.isNotNull()
                continue
            if lit is not None and op in ("=", "==", "<=>"):
                cond = val == lit
            elif lit is not None and op in (">", ">=", "<", "<="):
                cond = {">": val > lit, ">=": val >= lit, "<": val < lit, "<=": val <= lit}[op]
            else:
                continue
            keep = keep & F.coalesce(cond, raw_val.isNotNull())
            continue
        mn = F.col(f"parsed_stats.minValues.{col}")
        mx = F.col(f"parsed_stats.maxValues.{col}")
        nulls = F.col(f"parsed_stats.nullCount.{col}")
        nrec = F.col("parsed_stats.numRecords")
        if op == "is null":
            cond = (nulls > 0) | nulls.isNull()
        elif op == "is not null":
            cond = ~((nulls.isNotNull()) & (nrec.isNotNull()) & (nulls == nrec))
        elif lit is not None and op in ("=", "==", "<=>"):
            cond = (mn <= lit) & (mx >= lit)
        elif lit is not None and op == ">":
            cond = mx > lit
        elif lit is not None and op == ">=":
            cond = mx >= lit
        elif lit is not None and op == "<":
            cond = mn < lit
        elif lit is not None and op == "<=":
            cond = mn <= lit
        else:
            continue
        # missing stats ⇒ cannot prove non-match ⇒ keep the file
        keep = keep & F.coalesce(cond, F.lit(True))
    return keep, unresolved


def delta_file_stats(
    spark: SparkSession, path: str, condition: str | None = None
) -> DataFrame:
    """files_df + typed ``stats`` struct, optionally filtered to the
    files a scan with ``condition`` would read.
    Parity: DeltaHelpers.scala:212-219 (deltaFileStats)."""
    table = DeltaTable.forPath(spark, path)
    snap = table.snapshot()
    schema = table.schema(snap)
    fdf = files_df(spark, path).withColumn(
        "parsed_stats", F.from_json("stats", _stats_schema(schema))
    )
    if condition:
        keep, _ = _file_filter_column(condition, schema, snap.partition_columns)
        fdf = fdf.filter(keep)
    return fdf.select(
        "path", "partitionValues", "size", "modificationTime",
        F.col("parsed_stats").alias("stats"),
    )


def _all_partition_stats(filtered: DataFrame, agg_col: Column, names: list[str]) -> DataFrame:
    """groupBy partition, agg count/mean/stddev/min/max/percentiles.
    Parity: DeltaHelpers.scala:197-210 (getAllPartitionStats)."""
    return (
        filtered.groupBy(F.map_entries(F.col("partitionValues")))
        .agg(
            F.count(agg_col),
            F.mean(agg_col),
            F.stddev(agg_col),
            F.min(agg_col),
            F.max(agg_col),
            F.percentile_approx(
                agg_col, [0.1, 0.25, 0.50, 0.75, 0.90, 0.95], 2147483647
            ),
        )
        .toDF(*names)
    )


def delta_file_size_distribution(
    spark: SparkSession, path: str, condition: str | None = None
) -> DataFrame:
    """Per-partition file-size stats in bytes.
    Parity: DeltaHelpers.scala:54-55."""
    return _all_partition_stats(
        delta_file_stats(spark, path, condition), F.col("size"), SIZE_DF_COLUMNS
    )


def delta_file_size_distribution_in_mb(
    spark: SparkSession, path: str, condition: str | None = None
) -> DataFrame:
    """Per-partition file-size stats in MiB.
    Parity: DeltaHelpers.scala:41-44."""
    stats = delta_file_stats(spark, path, condition).withColumn(
        "size_in_mb", F.col("size") / (1024 * 1024)
    )
    return _all_partition_stats(stats, F.col("size_in_mb"), SIZE_DF_COLUMNS)


def delta_num_record_distribution(
    spark: SparkSession, path: str, condition: str | None = None
) -> DataFrame:
    """Per-partition records-per-file stats.
    Parity: DeltaHelpers.scala:74-75."""
    return _all_partition_stats(
        delta_file_stats(spark, path, condition),
        F.col("stats.numRecords"),
        NUM_RECORDS_DF_COLUMNS,
    )


# ---------------------------------------------------------------------------
# shuffle-file estimation (reference DeltaHelpers.scala:109-140)
# ---------------------------------------------------------------------------

def _classify_condition(
    condition: str, columns: list[str]
) -> tuple[dict[str, list[str]], list[str]]:
    """Split + classify conjuncts into the reference's four classes."""
    classes: dict[str, list[str]] = {"overall": [], "minmax": [], "equality": [], "other": []}
    unresolved_cols: list[str] = []
    for raw in split_conjuncts(condition):
        cj = classify_conjunct(raw, columns)
        if cj.kind == "unresolved":
            unresolved_cols.extend(
                [r for r in cj.references if "." in r or r not in columns]
            )
            continue
        classes["overall"].append(raw)
        if cj.kind == "minmax":
            classes["minmax"].append(raw)
        elif cj.kind == "equality":
            classes["equality"].append(raw)
        else:
            classes["other"].append(raw)
    return classes, unresolved_cols


def _fmt(parts: list[str]) -> str:
    return " and ".join(f"({p})" for p in parts) if parts else "Empty"


def get_num_shuffle_files(
    spark: SparkSession, path: str, condition: str
) -> dict[str, Any]:
    """#files surviving data skipping for the condition, broken down by
    predicate class. Metadata-only — never reads table data.
    Parity: DeltaHelpers.scala:109-126 (keys match DeltaConstants)."""
    table = DeltaTable.forPath(spark, path)
    snap = table.snapshot()
    schema = table.schema(snap)
    classes, unresolved_cols = _classify_condition(
        condition, [f.name for f in schema.fields]
    )

    fdf = files_df(spark, path).withColumn(
        "parsed_stats", F.from_json("stats", _stats_schema(schema))
    )
    fdf = fdf.cache()
    try:
        total = fdf.count()

        def count_for(parts: list[str]) -> int:
            if not parts:
                return total  # filterFiles(Nil) keeps every file
            keep, _ = _file_filter_column(
                " and ".join(parts), schema, snap.partition_columns
            )
            return fdf.filter(keep).count()

        return {
            f"{OVERALL} [ {_fmt(classes['overall'])} ]": count_for(classes["overall"]),
            f"{MIN_MAX} [ {_fmt(classes['minmax'])} ]": count_for(classes["minmax"]),
            f"{EQUALS} [ {_fmt(classes['equality'])} ]": count_for(classes["equality"]),
            f"{LEFT_OVER} [ {_fmt(classes['other'])} ]": count_for(classes["other"]),
            f"{UNRESOLVED} [ Empty ]": total,  # unresolved predicates can't skip
            TOTAL_NUM_FILES: total,
            UNRESOLVED_COLS: unresolved_cols,
        }
    finally:
        fdf.unpersist()


def get_shuffle_file_metadata(
    spark: SparkSession, path: str, condition: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, list[str]]:
    """Same split as :func:`get_num_shuffle_files` but returns the
    surviving-file DataFrames per class plus the full stats DF.
    Parity: DeltaHelpers.scala:128-140 (DataFrames instead of
    Seq[AddFile] — same content, queryable)."""
    table = DeltaTable.forPath(spark, path)
    snap = table.snapshot()
    schema = table.schema(snap)
    classes, unresolved_cols = _classify_condition(
        condition, [f.name for f in schema.fields]
    )
    fdf = files_df(spark, path).withColumn(
        "parsed_stats", F.from_json("stats", _stats_schema(schema))
    )

    def files_for(parts: list[str]) -> DataFrame:
        if not parts:
            return fdf
        keep, _ = _file_filter_column(" and ".join(parts), schema, snap.partition_columns)
        return fdf.filter(keep)

    return (
        files_for(classes["overall"]),
        files_for(classes["minmax"]),
        files_for(classes["equality"]),
        files_for(classes["other"]),
        fdf,  # unresolved predicates keep all files
        fdf,
        unresolved_cols,
    )


def write_checkpoint_v2_spark(
    spark: SparkSession, path: str, version: int | None = None
) -> int:
    """V2 checkpoint write (protocol ``v2Checkpoint`` feature): the
    add/remove state lands in uuid-named SIDECAR parquet files under
    ``_delta_log/_sidecars/`` (Spark-written, bounded driver memory —
    same distributed reconstruction as the classic writer), and a
    single uuid-named manifest ``<v>.checkpoint.<uuid>.parquet``
    carries checkpointMetadata + sidecar references + protocol +
    metaData + domainMetadata. The read side
    (``DeltaLog.checkpoint_part_files`` / ``_read_manifest_actions`` /
    ``files_df``) already resolves this layout."""
    import shutil
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    import json as _json

    from jodie_spark.tables.log import LAST_CHECKPOINT

    log = DeltaLog(path)
    target = log.latest_version() if version is None else int(version)
    info = log.table_info(target)

    state = _latest_actions_df(spark, path, max_version=target)
    add_struct = F.struct(
        F.col("add.path").alias("path"),
        F.col("add.partitionValues").alias("partitionValues"),
        F.col("add.size").alias("size"),
        F.col("add.modificationTime").alias("modificationTime"),
        F.lit(False).alias("dataChange"),
        F.col("add.stats").alias("stats"),
        F.col("add.deletionVector").alias("deletionVector"),
        F.col("add.baseRowId").alias("baseRowId"),
        F.col("add.defaultRowCommitVersion").alias("defaultRowCommitVersion"),
        F.col("add.tags").alias("tags"),
    )
    out = state.select(
        F.when(F.col("add").isNotNull(), add_struct).alias("add"),
        F.col("remove"),
    )
    n_actions = out.count()
    n_parts = max(1, -(-n_actions // _CP_ACTIONS_PER_PART))

    fs = log._fs
    sidecar_dir = fs.join(log.log_path, "_sidecars")
    fs.makedirs(sidecar_dir)
    stage = fs.join(log.table_path, f"_checkpoint_stage_{_uuid.uuid4().hex}")
    try:
        out.repartition(n_parts).write.parquet(fs.spark_path(stage), mode="overwrite")
        spark_parts = sorted(
            fs.join(stage, n)
            for n in fs.listdir(stage)
            if n.startswith("part-") and n.endswith(".parquet")
        )
        sidecars: list[dict[str, Any]] = []
        for src in spark_parts:
            name = f"{_uuid.uuid4().hex}.parquet"
            dst = fs.join(sidecar_dir, name)
            fs.rename(src, dst)
            sidecars.append(
                {
                    "path": name,
                    "sizeInBytes": fs.size(dst),
                    "modificationTime": fs.mtime_ms(dst),
                }
            )

        sidecar_t = pa.struct(
            [
                ("path", pa.string()),
                ("sizeInBytes", pa.int64()),
                ("modificationTime", pa.int64()),
            ]
        )
        cpmeta_t = pa.struct([("version", pa.int64())])
        from jodie_spark.tables.log import (
            _DOMAIN_T,
            _METADATA_T,
            _PROTOCOL_T,
        )

        manifest_schema = pa.schema(
            [
                ("checkpointMetadata", cpmeta_t),
                ("sidecar", sidecar_t),
                ("protocol", _PROTOCOL_T),
                ("metaData", _METADATA_T),
                ("domainMetadata", _DOMAIN_T),
            ]
        )
        rows: list[dict[str, Any]] = [
            {"checkpointMetadata": {"version": target}},
            {"protocol": info.protocol},
            {"metaData": info.metadata},
        ]
        for dm in log.all_domain_metadata(target).values():
            rows.append(
                {
                    "domainMetadata": {
                        "domain": dm.get("domain"),
                        "configuration": dm.get("configuration"),
                        "removed": bool(dm.get("removed", False)),
                    }
                }
            )
        rows.extend({"sidecar": sc} for sc in sidecars)
        manifest = fs.join(
            log.log_path, f"{target:020d}.checkpoint.{_uuid.uuid4().hex}.parquet"
        )
        import io as _io

        _buf = _io.BytesIO()
        pq.write_table(pa.Table.from_pylist(rows, schema=manifest_schema), _buf)
        fs.write_atomic(manifest, _buf.getvalue())
        fs.write_text_atomic(
            fs.join(log.log_path, LAST_CHECKPOINT),
            _json.dumps({"version": target, "size": n_actions + len(rows)}),
        )
    finally:
        fs.rmtree(stage)
    return target

"""Name → Delta-table registration, so ``spark.table(name)`` resolves
through the log-aware reader.

The reference's ``copyTable(targetTableName)`` registers a metastore
table (reference DeltaHelpers.scala:409-424) and ``DeltaTable.forName``
resolves it. Without a Hive metastore (and without a Delta DataSource
V2 the session catalog could route through), registering the table
*directory* as a parquet table would be silently wrong — the catalog
would list every parquet file, including ones the log has removed. So
registration here means two things, both log-aware:

- a temp view over ``DeltaTable.toDF()`` — ``spark.table(name)`` /
  ``spark.sql(f"select * from {name}")`` read exactly the active
  snapshot's files;
- a name → path mapping (this module) that ``DeltaTable.for_name``
  resolves, mirroring what the metastore's ``location`` property does
  in a production deployment.

The view captures the snapshot *at registration time* — after DML,
call :func:`refresh_table` (or re-register) for a fresh file list,
the same refresh contract Spark's own catalog caches have.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from jodie_spark.errors import JodieValidationError

# name -> table path; the in-session stand-in for metastore locations
_REGISTRY: dict[str, str] = {}


def register_delta_table(
    spark: SparkSession, name: str, path: str, replace: bool = True
) -> None:
    """Register ``path`` under ``name``: name→path mapping + a temp view
    over the active snapshot so ``spark.table(name)`` works."""
    from jodie_spark.tables.table import DeltaTable

    table = DeltaTable.forPath(spark, path)  # validates it IS a Delta table
    if not replace and name in _REGISTRY:
        raise JodieValidationError(f"table `{name}` is already registered")
    _REGISTRY[name] = table.path
    table.toDF().createOrReplaceTempView(name)


def refresh_table(spark: SparkSession, name: str) -> None:
    """Re-point the view at the current snapshot (post-DML refresh)."""
    path = _REGISTRY.get(name)
    if path is None:
        raise JodieValidationError(f"table `{name}` is not registered")
    register_delta_table(spark, name, path)


def resolve_table_path(name: str) -> str:
    path = _REGISTRY.get(name)
    if path is None:
        raise JodieValidationError(
            f"table `{name}` is not registered; register it with "
            "jodie_spark.catalog.register_delta_table or copy_table(target_table_name=...)"
        )
    return path


def unregister_table(spark: SparkSession, name: str) -> None:
    if _REGISTRY.pop(name, None) is not None:
        spark.catalog.dropTempView(name)

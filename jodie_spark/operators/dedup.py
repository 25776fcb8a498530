"""Exact-duplicate management operators.

Parity: reference DeltaHelpers.scala:243-340 (kill/remove duplicates)
and :437-453 (appendWithoutDuplicates). Semantics quirks preserved:

- ``kill_duplicate_records`` removes **every** copy of a duplicated key
  (keeps none) — reference DeltaHelperSpec.scala:95-108.
- ``remove_duplicate_records`` with a primary key keeps the lowest-pk
  row per duplicate group; without one it keeps a single arbitrary
  occurrence via a whole-table overwrite — DeltaHelpers.scala:321-340.

Scale: duplicate discovery is a hash aggregation with map-side combine
(hot duplicate groups collapse before the shuffle; the keeper election
is groupBy-min + an AQE-splittable join, never a row_number window);
the deletion itself is a merge whose source is only the duplicated
keys, so file rewriting touches only files containing dups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jodie_spark.tables.table import DeltaTable, write_delta
from jodie_spark.validators import validate_columns_exist_in_dataframe


def kill_duplicate_records(
    delta_table: DeltaTable,
    duplicate_columns: Sequence[str],
    deletion_vectors: bool = False,
) -> None:
    """Delete every row whose ``duplicate_columns`` value occurs more
    than once (no survivor). Parity: DeltaHelpers.scala:243-268.
    ``deletion_vectors=True`` deletes merge-on-read (bitmaps instead of
    file rewrites) — at scale a small dup fraction no longer rewrites
    every file that contains one."""
    if not duplicate_columns:
        raise ValueError("the input parameter duplicateColumns must not be empty")
    df = delta_table.toDF()
    validate_columns_exist_in_dataframe(duplicate_columns, df)

    # same result as the reference's count-window (distinct keys with >1
    # occurrence) but as a hash aggregation: map-side combine shuffles
    # |groups| rows instead of the window's full-table shuffle
    dups = (
        df.groupBy(*[F.col(c) for c in duplicate_columns])
        .agg(F.count(F.lit(1)).alias("quantity"))
        .filter("quantity > 1")
        .drop("quantity")
    )
    condition = " AND ".join(f"old.{c} = new.{c}" for c in duplicate_columns)
    delta_table.alias("old").merge(dups.alias("new"), condition).whenMatchedDelete().execute(
        deletion_vectors=deletion_vectors
    )


def remove_duplicate_records(
    delta_table: DeltaTable,
    duplicate_columns: Sequence[str],
    primary_key: str | None = None,
    deletion_vectors: bool = False,
) -> None:
    """Remove duplicates keeping one occurrence per group.

    With ``primary_key``: keeps the lowest-pk row per duplicate group
    (row_number ordered by pk; DeltaHelpers.scala:282-319). Without:
    ``dropDuplicates`` + whole-table overwrite (DeltaHelpers.scala:321-340).
    """
    if not duplicate_columns:
        raise ValueError("the input parameter duplicateColumns must not be empty")
    df = delta_table.toDF()
    validate_columns_exist_in_dataframe(duplicate_columns, df)

    if primary_key is None:
        deduped = df.dropDuplicates(list(duplicate_columns))
        write_delta(deduped, delta_table.path, mode="overwrite")
        return

    if not primary_key:
        raise ValueError("the input parameter primaryKey must not be empty")

    # non-keepers via groupBy + join-back, not a row_number window: the
    # aggregation's map-side combine collapses a hot duplicate group to
    # one row per partition before the shuffle, and AQE can split the
    # skewed join; only (pk, dup_cols) ever move. Rows whose dup-column
    # values are NULL fall out of the equi-join — matching the final
    # MERGE, whose `old.c = new.c` condition never matches NULLs either
    # (so the old window-based selection also never deleted them)
    groups = (
        df.groupBy(*[F.col(c) for c in duplicate_columns])
        .agg(F.min(primary_key).alias("__keeper__"), F.count(F.lit(1)).alias("__cnt__"))
        .filter("__cnt__ > 1")
        .drop("__cnt__")
    )
    dups = (
        df.select(primary_key, *duplicate_columns)
        .join(groups, list(duplicate_columns))
        .filter(F.col(primary_key) != F.col("__keeper__"))
        .drop("__keeper__")
        .distinct()
    )
    condition = " AND ".join(
        f"old.{c} = new.{c}" for c in [primary_key, *duplicate_columns]
    )
    delta_table.alias("old").merge(dups.alias("new"), condition).whenMatchedDelete().execute(
        deletion_vectors=deletion_vectors
    )


def append_without_duplicates(
    delta_table: DeltaTable, append_data: DataFrame, composite_key: Sequence[str]
) -> None:
    """Insert-only merge: append rows whose composite key is not already
    present; the incoming batch is pre-deduplicated on the key.
    Parity: DeltaHelpers.scala:437-453."""
    if not composite_key:
        raise ValueError("The attribute compositeKey must not be empty")
    condition = " AND ".join(f"old.{c} = new.{c}" for c in composite_key)
    cleaned = append_data.dropDuplicates(list(composite_key))
    delta_table.alias("old").merge(
        cleaned.alias("new"), condition
    ).whenNotMatchedInsertAll().execute()

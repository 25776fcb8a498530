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

    # non-keepers via a two-level aggregation + join-back, not a
    # row_number window: map-side combine collapses a hot duplicate
    # group before each shuffle, and AQE can split the skewed join;
    # only (pk, dup_cols) ever move. Rows whose dup-column values are
    # NULL fall out of the equi-join — matching the final MERGE, whose
    # `old.c = new.c` condition never matches NULLs either (so the
    # reference's window-based selection also never deleted them).
    #
    # The election reproduces the reference's row_number-then-merge
    # semantics exactly, including its non-unique-pk quirk
    # (DeltaHelpers.scala:302-317): with ties at the minimum pk, one
    # tied row gets row_number 2, and the merge's (pk, dup_cols)
    # equality then deletes EVERY row of that combination — the whole
    # group disappears. Likewise a NULL pk sorts first (rn=1), pushing
    # all non-NULL-pk rows into the delete set, while NULL-pk rows
    # themselves can never match the merge condition and so survive.
    per_key = df.groupBy(*duplicate_columns, primary_key).agg(
        F.count(F.lit(1)).alias("__pk_cnt__")
    )
    groups = (
        per_key.groupBy(*[F.col(c) for c in duplicate_columns])
        .agg(
            F.min(primary_key).alias("__keeper__"),
            F.min_by("__pk_cnt__", primary_key).alias("__keeper_cnt__"),
            F.sum(F.when(F.col(primary_key).isNull(), F.col("__pk_cnt__")).otherwise(F.lit(0))).alias("__null_cnt__"),
            F.sum("__pk_cnt__").alias("__cnt__"),
        )
        .filter("__cnt__ > 1")
    )
    pk, keeper = F.col(primary_key), F.col("__keeper__")
    dups = (
        df.select(primary_key, *duplicate_columns)
        .join(groups, list(duplicate_columns))
        .filter(
            F.when(F.col("__null_cnt__") > 0, pk.isNotNull()).otherwise(
                (pk != keeper) | (F.col("__keeper_cnt__") > 1)
            )
        )
        .select(primary_key, *duplicate_columns)
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

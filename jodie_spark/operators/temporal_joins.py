"""Temporal joins Spark lacks as built-ins: as-of (point-in-time) join
and range (interval containment) join.

Both are expressed without any inequality-join explosion:

- **as-of join** — union both sides, one window per key ordered by
  (ts, side), forward-fill the right columns, keep left rows. One
  shuffle on the key; never a per-row range probe. The same shape
  Flink's temporal join and kdb's aj compile to.
- **range join** — bucketize: intervals explode to the fixed-width
  buckets they overlap, points hash to their bucket, equi-join on
  (bucket) then verify containment. Worst case is quadratic only
  within one bucket — pick ``bucket_width`` near the median interval
  width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_prefix: str = "right_",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with the same
    ``on`` key and ``right.ts <= left.ts`` (within ``tolerance``, e.g.
    ``'1 hour'``, when given). Right columns arrive prefixed; rows with
    no qualifying right match carry nulls — LEFT ASOF JOIN semantics.
    """
    r_value_cols = [c for c in right.columns if c not in (on, ts_col)]
    l_tagged = left.withColumn("__side__", F.lit(1))
    for c in r_value_cols:
        l_tagged = l_tagged.withColumn(f"{right_prefix}{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    l_tagged = l_tagged.withColumn(f"{right_prefix}{ts_col}", F.lit(None).cast(dict(right.dtypes)[ts_col]))

    r_tagged = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__side__"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_value_cols],
        F.col(ts_col).alias(f"{right_prefix}{ts_col}"),
    )
    for c in left.columns:
        if c not in (on, ts_col):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    u = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal ts ⇒ a right row is
    # visible to a left row with the same timestamp
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u
    for c in [*[f"{right_prefix}{c}" for c in r_value_cols], f"{right_prefix}{ts_col}"]:
        filled = filled.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    out = filled.filter(F.col("__side__") == 1).drop("__side__")
    if tolerance is not None:
        stale = F.col(f"{right_prefix}{ts_col}") < F.col(ts_col) - F.expr(
            f"INTERVAL {tolerance}"
        )
        for c in [*[f"{right_prefix}{c}" for c in r_value_cols], f"{right_prefix}{ts_col}"]:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 10.0,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` — via bucketization, never a nested-loop theta
    join. ``bucket_width`` trades replication of wide intervals against
    per-bucket fan-in.

    ``how`` may be ``inner`` or ``left``/``left_outer`` (points with no
    containing interval survive with null interval columns). Right/full
    outer are rejected: the bucket explosion duplicates unmatched
    intervals, so those modes cannot be expressed on this plan shape.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"range_join supports how='inner' or 'left'; got {how!r}")
    ivals = intervals.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / bucket_width
                ).cast("long"),
            )
        ),
    )
    pts = points.withColumn(
        "__bucket__", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    # containment lives IN the join condition (not a post-join filter) so
    # outer rows survive with nulls; the bucket equality keeps it a hash/
    # sort-merge equi-join, the inequalities ride along as the join's
    # residual condition — never a nested-loop theta join
    p = pts.alias("__rj_p__")
    i = ivals.withColumnRenamed("__bucket__", "__ibucket__").alias("__rj_i__")
    cond = (
        (F.col("__rj_p__.__bucket__") == F.col("__rj_i__.__ibucket__"))
        & (F.col(f"__rj_p__.{point_col}") >= F.col(f"__rj_i__.{lo_col}"))
        & (F.col(f"__rj_p__.{point_col}") < F.col(f"__rj_i__.{hi_col}"))
    )
    return p.join(i, cond, how).drop("__bucket__", "__ibucket__")

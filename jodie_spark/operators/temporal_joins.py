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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row with the same
    ``on`` key — the latest with ``right.ts <= left.ts``
    (``direction='backward'``, the default/ASOF JOIN semantics), the
    earliest with ``right.ts >= left.ts`` (``'forward'``), or whichever
    of the two is closer (``'nearest'``, ties prefer backward — pandas
    merge_asof parity). ``tolerance`` (e.g. ``'1 hour'``) nulls matches
    farther than the interval. Right columns arrive prefixed; left rows
    with no qualifying match carry nulls.

    All directions are one shuffle on the key (the union + window
    forward-fill shape); 'nearest' adds a second in-partition sort,
    never a second exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    r_value_cols = [c for c in right.columns if c not in (on, ts_col)]
    fill_cols = [*[f"{right_prefix}{c}" for c in r_value_cols], f"{right_prefix}{ts_col}"]

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
    # right rows sort before left rows at equal ts in either direction
    # ⇒ an equal-timestamp right row is always visible
    w_back = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).desc(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def _filled(frame: DataFrame, w, suffix: str) -> DataFrame:
        for c in fill_cols:
            frame = frame.withColumn(f"{c}{suffix}", F.last(F.col(c), ignorenulls=True).over(w))
        return frame

    def _apply_tolerance(out: DataFrame, stale) -> DataFrame:
        for c in fill_cols:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        return out

    if direction == "backward":
        filled = _filled(u, w_back, "")
        out = filled.filter(F.col("__side__") == 1).drop("__side__")
        if tolerance is not None:
            out = _apply_tolerance(
                out,
                F.col(f"{right_prefix}{ts_col}") < F.col(ts_col) - F.expr(f"INTERVAL {tolerance}"),
            )
        return out
    if direction == "forward":
        filled = _filled(u, w_fwd, "")
        out = filled.filter(F.col("__side__") == 1).drop("__side__")
        if tolerance is not None:
            out = _apply_tolerance(
                out,
                F.col(f"{right_prefix}{ts_col}") > F.col(ts_col) + F.expr(f"INTERVAL {tolerance}"),
            )
        return out

    # nearest: fill both ways, keep the closer non-null candidate
    filled = _filled(_filled(u, w_back, "__b"), w_fwd, "__f")
    out = filled.filter(F.col("__side__") == 1).drop("__side__")
    rts = f"{right_prefix}{ts_col}"
    b_ts, f_ts = F.col(f"{rts}__b"), F.col(f"{rts}__f")
    b_ok = b_ts.isNotNull()
    f_ok = f_ts.isNotNull()
    if tolerance is not None:
        b_ok = b_ok & (b_ts >= F.col(ts_col) - F.expr(f"INTERVAL {tolerance}"))
        f_ok = f_ok & (f_ts <= F.col(ts_col) + F.expr(f"INTERVAL {tolerance}"))
    # cast("double") is epoch-seconds for timestamps and identity for
    # numeric ts columns — one distance expression for both
    b_dist = F.col(ts_col).cast("double") - b_ts.cast("double")
    f_dist = f_ts.cast("double") - F.col(ts_col).cast("double")
    use_back = b_ok & (~f_ok | (b_dist <= f_dist))  # tie → backward
    for c in fill_cols:
        out = out.withColumn(
            c,
            F.when(use_back, F.col(f"{c}__b"))
            .when(f_ok, F.col(f"{c}__f"))
            .otherwise(F.lit(None)),
        )
    return out.drop(*[f"{c}__b" for c in fill_cols], *[f"{c}__f" for c in fill_cols])


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

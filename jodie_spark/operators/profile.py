"""Column profiling: one-pass data-quality summary of a table.

Every ingestion round of a training-data pipeline starts with "what is
in this drop?" — null rates, cardinalities, value ranges per column.
This computes all of it in ONE aggregation pass (every per-column
statistic is an expression in a single ``agg``), then unpivots the
1-row result with ``stack`` — no per-column jobs, no driver loop.

Scale note: ``exact_distinct=True`` uses ``count(distinct col)`` per
column, which Spark executes with an Expand (one shuffle carrying
#cols copies of the row) — exact and oracle-able, fine into the
billions. At 100 TB set ``exact_distinct=False`` for
``approx_count_distinct`` (HyperLogLog++, one ordinary shuffle, ~2%
error), the same trade every warehouse's profiler makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCALAR_TYPES = (
    T.StringType, T.BooleanType, T.ByteType, T.ShortType, T.IntegerType,
    T.LongType, T.FloatType, T.DoubleType, T.DecimalType, T.DateType,
    T.TimestampType, T.TimestampNTZType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column ``(column, n_rows, n_nulls, n_distinct, min_value,
    max_value)``; min/max rendered as strings so heterogeneous columns
    share one schema. Non-scalar columns (arrays, maps, structs,
    binary) must be named explicitly or are skipped."""
    if columns is None:
        columns = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _SCALAR_TYPES)
        ]
    if not columns:
        raise ValueError("profile_table: no scalar columns to profile")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, c in enumerate(columns):
        col = F.col(c)
        aggs.append((F.count(F.lit(1)) - F.count(col)).alias(f"__nulls_{i}__"))
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"__dist_{i}__")
        )
        aggs.append(F.min(col).cast("string").alias(f"__min_{i}__"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{i}__"))
    one = df.agg(*aggs)

    stack_args: list[str] = []
    for i, c in enumerate(columns):
        quoted = c.replace("'", "\\'")
        stack_args.append(
            f"'{quoted}', __nulls_{i}__, __dist_{i}__, __min_{i}__, __max_{i}__"
        )
    return one.select(
        F.col("__n__").alias("n_rows"),
        F.expr(
            f"stack({len(columns)}, {', '.join(stack_args)}) as "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    group_col: str | None = None,
    quantize: bool = False,
) -> DataFrame:
    """EXACT discrete quantiles of ``value_col`` at scale — columns
    ``(q, value)`` where ``value`` is the smallest v whose cumulative
    count reaches rank ``ceil(q * N)`` (the lower discrete quantile, a
    real element of the column; NULLs ignored).

    ``approx_quantile`` trades error for a single pass; this stays
    exact with the histogram trick: one map-side-combined
    ``groupBy(value).count()`` (the shuffle carries DISTINCT values,
    not rows — for the discrete columns this is for, sequence lengths /
    token counts / scores, that is thousands of groups at any corpus
    size), then the same two-phase distributed prefix sum
    ``pack_sequences`` uses (``packing.with_global_offsets`` — per
    range-partition running sums + a #partitions-bounded offset
    collect, no single-partition window), then one broadcast of the
    |qs|-row target ranks. Every step is closed-form arithmetic, so a
    SQL oracle replicates it value-for-value.

    The 100 TB use case: length percentiles to size packing budgets,
    score cutoffs for quality filtering — places where "approximately
    the 99th percentile" silently over- or under-trims the corpus.

    With ``group_col``: per-group quantiles — columns ``(group, q,
    value)``, ranks against EACH group's row count (per-language length
    percentiles). The cumulative sum becomes a group-partitioned window
    over the histogram, bounded by one group's distinct values per
    window partition; NULL groups are ignored.

    ``quantize=True`` rounds each q to 10 decimal digits instead of
    rejecting it (the output ``q`` column carries the ROUNDED value) —
    the escape hatch for callers passing computed fractions like 1/3.
    A q that rounds to 0 (q < 5e-11) CLAMPS to 1e-10, the smallest
    representable quantile — an orders-of-magnitude substitution, not a
    rounding; pass an explicit q if rank-1 semantics matter at that
    extreme.
    """
    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    # Precision contract (ADVICE r11): ranks are computed as
    # ceil(decimal(12,10)(q) * N), exact for any q with <= 10 decimal
    # digits. A computed fraction needing more digits (1/3, 1/7) would
    # be cast-rounded SILENTLY, shifting the rank by up to 5e-11*N
    # (~50 ranks at N=1e12) — reject it so callers quantize explicitly
    # and know which quantile they are actually asking for.
    # BREAKING since r12 (see CHANGELOG): such inputs previously
    # succeeded with silent rank rounding; ``quantize=True`` is the
    # opt-in escape hatch that rounds for the caller (ADVICE r12).
    if quantize:
        qs = [round(q, 10) if round(q, 10) > 0.0 else 1e-10 for q in qs]
    for q in qs:
        if abs(q - round(q, 10)) > 0.0:
            suggested = round(q, 10)
            hint = (
                f"pass round(q, 10) (= {suggested!r}) explicitly"
                if suggested > 0.0
                # round(q,10)==0 would then fail the (0,1] check — give
                # the smallest representable quantile as the way out
                else "the smallest representable quantile is 1e-10"
            )
            raise ValueError(
                f"quantile {q!r} has more than 10 decimal digits; ranks "
                f"are exact only for 10-digit fractions — {hint}"
            )
    if group_col is not None:
        return _grouped_exact_quantiles(df, value_col, qs, group_col)
    from jodie_spark.operators.packing import with_global_offsets

    vals = df.select(F.col(value_col).alias("value")).filter(
        F.col("value").isNotNull()
    )
    hist = vals.groupBy("value").agg(F.count(F.lit(1)).alias("__c__"))
    cum = with_global_offsets(hist, "__c__", "value", offset_col="__off__")
    cum = cum.withColumn("__cf__", F.col("__off__") + F.col("__c__"))
    # derive N from cum, not hist: with_global_offsets persisted the
    # shuffled histogram, so this aggregates the cache instead of
    # re-running the corpus scan + groupBy a second time
    total = cum.agg(F.sum("__c__").alias("__n__"))
    targets = df.sparkSession.createDataFrame(
        [(float(q),) for q in sorted(set(qs))], "q double"
    ).join(F.broadcast(total))
    # rank = ceil(q*N); min value whose cumulative count reaches it.
    # The product is computed in DECIMAL, not double: double math can
    # round q*N up past the true integer rank (0.07*100 -> 7.000...01,
    # ceil = 8), and at N ~ 1e12 the absolute double error exceeds any
    # fixed round() guard. decimal(12,10) represents every q a user
    # writes with <= 10 decimal digits exactly, and decimal x bigint
    # multiplication is exact, so ceil is the true mathematical rank.
    return (
        cum.join(
            F.broadcast(
                targets.withColumn(
                    "__rank__",
                    F.ceil(F.col("q").cast("decimal(12,10)") * F.col("__n__")),
                )
            ),
            F.col("__cf__") >= F.col("__rank__"),
        )
        .groupBy("q")
        .agg(F.min("value").alias("value"))
    )


def _grouped_exact_quantiles(
    df: DataFrame, value_col: str, qs: list[float], group_col: str
) -> DataFrame:
    from pyspark.sql.window import Window

    vals = df.select(
        F.col(group_col).alias("group"), F.col(value_col).alias("value")
    ).filter(F.col("group").isNotNull() & F.col("value").isNotNull())
    hist = vals.groupBy("group", "value").agg(F.count(F.lit(1)).alias("__c__"))
    # group-partitioned running sum AND group total in ONE pass: both
    # windows share the partition key, so Spark computes them over a
    # single (group)-shuffled sort — each window partition holds one
    # group's distinct values (bounded for the discrete columns this
    # targets, parallel across groups), and no second hist scan or
    # self-join is needed for the totals
    w = Window.partitionBy("group").orderBy("value")
    w_all = Window.partitionBy("group")
    cum = hist.withColumn("__cf__", F.sum("__c__").over(w)).withColumn(
        "__n__", F.sum("__c__").over(w_all)
    )
    qs_df = df.sparkSession.createDataFrame(
        [(float(q),) for q in sorted(set(qs))], "q double"
    )
    return (
        cum.crossJoin(F.broadcast(qs_df))
        # decimal product, same exact-rank rationale as the flat path
        .filter(
            F.col("__cf__")
            >= F.ceil(F.col("q").cast("decimal(12,10)") * F.col("__n__"))
        )
        .groupBy("group", "q")
        .agg(F.min("value").alias("value"))
        .select(F.col("group").alias(group_col), "q", "value")
    )

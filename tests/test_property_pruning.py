"""Property test for the data-skipping invariant: ``file_may_match``
may only return False when the file provably contains no matching row.
Random rows → true stats → random conjuncts; if any row satisfies the
predicate, pruning must keep the file. Pure Python (no Spark session),
so hypothesis can run hundreds of cases."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from jodie_spark.tables.pruning import classify_conjunct, file_may_match

SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("s", T.StringType()),
    ]
)

rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-20, max_value=20)),
        st.one_of(st.none(), st.text(alphabet="abc", min_size=0, max_size=3)),
    ),
    min_size=1,
    max_size=8,
)

OPS = ["=", ">", ">=", "<", "<="]


def _stats_for(rows):
    ints = [r[0] for r in rows if r[0] is not None]
    strs = [r[1] for r in rows if r[1] is not None]
    mins, maxs, nulls = {}, {}, {}
    nulls["i"] = sum(1 for r in rows if r[0] is None)
    nulls["s"] = sum(1 for r in rows if r[1] is None)
    if ints:
        mins["i"], maxs["i"] = min(ints), max(ints)
    if strs:
        mins["s"], maxs["s"] = min(strs), max(strs)
    return {
        "numRecords": len(rows),
        "minValues": mins,
        "maxValues": maxs,
        "nullCount": nulls,
    }


def _row_matches(row, col, op, lit):
    v = row[0] if col == "i" else row[1]
    if op == "is null":
        return v is None
    if op == "is not null":
        return v is not None
    if v is None:
        return False
    return {
        "=": v == lit,
        ">": v > lit,
        ">=": v >= lit,
        "<": v < lit,
        "<=": v <= lit,
    }[op]


conjunct_strategy = st.one_of(
    st.tuples(st.just("i"), st.sampled_from(OPS), st.integers(-25, 25)),
    st.tuples(st.just("s"), st.sampled_from(OPS), st.text(alphabet="abc", min_size=1, max_size=3)),
    st.tuples(st.sampled_from(["i", "s"]), st.sampled_from(["is null", "is not null"]), st.none()),
)


@settings(max_examples=400, deadline=None)
@given(rows=rows_strategy, conjs=st.lists(conjunct_strategy, min_size=1, max_size=3))
def test_pruning_is_conservative(rows, conjs):
    add = {"path": "f", "partitionValues": {}, "stats": json.dumps(_stats_for(rows))}
    texts = []
    for col, op, lit in conjs:
        if op in ("is null", "is not null"):
            texts.append(f"{col} {op}")
        elif col == "s":
            texts.append(f"{col} {op} '{lit}'")
        else:
            texts.append(f"{col} {op} {lit}")
    parsed = [classify_conjunct(t, ["i", "s"]) for t in texts]
    any_row_matches = any(
        all(_row_matches(r, col, op, lit) for col, op, lit in conjs) for r in rows
    )
    kept = file_may_match(add, parsed, SCHEMA, [])
    if any_row_matches:
        assert kept, f"pruned a file containing a matching row: rows={rows} conds={texts}"


@settings(max_examples=200, deadline=None)
@given(rows=rows_strategy, conjs=st.lists(conjunct_strategy, min_size=1, max_size=2))
def test_partition_pruning_is_exact_for_partition_values(rows, conjs):
    # single-column partition check: partitionValues filtering must agree
    # with evaluating the predicate on the (single) partition value
    pv = rows[0][1]
    add = {
        "path": "f",
        "partitionValues": {"s": pv},
        "stats": json.dumps(_stats_for(rows)),
    }
    conds = [c for c in conjs if c[0] == "s"]
    if not conds:
        return
    texts = [
        f"s {op}" if op in ("is null", "is not null") else f"s {op} '{lit}'"
        for _, op, lit in conds
    ]
    parsed = [classify_conjunct(t, ["s"]) for t in texts]
    matches = all(_row_matches((None, pv), "s", op, lit) for _, op, lit in conds)
    kept = file_may_match(add, parsed, SCHEMA, ["s"])
    if matches:
        assert kept

"""Property fuzz of row-tracking invariants across random DML
sequences (hypothesis): whatever mix of CoW/MoR delete/update, merge,
optimize and append runs, every surviving row keeps its _row_id, ids
stay globally unique, and _row_commit_version changes exactly when the
row's content does.

This is the spec contract the round-4 materialized-lineage work
implements; the fuzzer checks the OBSERVED state after every op
against the previous observation plus a value model, so it needs no
layout assumptions (in-batch id assignment order is layout-dependent
by design)."""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jodie_spark.sources.datasource import register
from jodie_spark.tables.table import DeltaTable, write_delta

OP = st.sampled_from(
    ["delete_cow", "delete_dv", "update_cow", "update_dv", "merge", "optimize", "append"]
)


def _observe(spark, p):
    df = spark.read.format("jodie_delta").option("withRowIds", "true").load(p)
    return {
        r["id"]: (r["v"], r["_row_id"], r["_row_commit_version"])
        for r in df.collect()
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(OP, min_size=2, max_size=5),
    pivots=st.lists(st.integers(min_value=0, max_value=9), min_size=5, max_size=5),
)
def test_lineage_invariants_hold_across_dml_sequences(spark, tmpdir_path, ops, pivots):
    register(spark)
    p = os.path.join(
        tmpdir_path, f"fuzz_{abs(hash((tuple(ops), tuple(pivots)))) % 10**9}"
    )
    if os.path.exists(p):
        return  # hypothesis replayed an identical case into the same dir
    write_delta(
        spark.range(10).selectExpr("id", "id as v").repartition(2),
        p,
        options={"delta.enableRowTracking": "true"},
    )
    model = {i: i for i in range(10)}  # id -> v
    prev = _observe(spark, p)
    next_new_id = 100

    for i, op in enumerate(ops):
        piv = pivots[i % len(pivots)]
        t = DeltaTable.forPath(spark, p)
        modified: set[int] = set()
        if op in ("delete_cow", "delete_dv"):
            cond = f"id % 3 = {piv % 3}"
            victims = {k for k in model if k % 3 == piv % 3}
            t.delete(cond, deletion_vectors=(op == "delete_dv"))
            for k in victims:
                model.pop(k)
        elif op in ("update_cow", "update_dv"):
            cond = f"id % 4 = {piv % 4}"
            targets = {k for k in model if k % 4 == piv % 4}
            t.update(cond, {"v": "v + 1000"}, deletion_vectors=(op == "update_dv"))
            for k in targets:
                model[k] += 1000
            modified = targets
        elif op == "merge":
            rows = [(k, k + 5000) for k in list(model)[:2]] + [
                (next_new_id, next_new_id)
            ]
            src = spark.createDataFrame(rows, "id long, v long")
            (
                t.alias("t")
                .merge(src.alias("s"), "t.id = s.id")
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
            for k, v in rows:
                modified.add(k) if k in model else None
                model[k] = v
            next_new_id += 1
        elif op == "optimize":
            t.optimize().executeCompaction()
        elif op == "append":
            batch = [(next_new_id + j, next_new_id + j) for j in range(3)]
            write_delta(
                spark.createDataFrame(batch, "id long, v long"), p, mode="append"
            )
            for k, v in batch:
                model[k] = v
            next_new_id += 3

        cur = _observe(spark, p)
        # 1. values match the model exactly
        assert {k: v for k, (v, *_rest) in cur.items()} == model, (op, i)
        # 2. surviving rows keep their _row_id
        for k in cur:
            if k in prev:
                assert cur[k][1] == prev[k][1], (op, i, k)
        # 3. global uniqueness
        rids = [rid for _, rid, _ in cur.values()]
        assert len(rids) == len(set(rids)), (op, i)
        # 4. commit-version semantics: unmodified surviving rows keep
        # theirs; modified rows move strictly forward
        for k in cur:
            if k in prev:
                if k in modified:
                    assert cur[k][2] > prev[k][2], (op, i, k)
                else:
                    assert cur[k][2] == prev[k][2], (op, i, k)
        prev = cur

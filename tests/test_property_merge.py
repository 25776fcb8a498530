"""Property-based check: the merge engine against a pure-Python model
over randomized inputs (hypothesis). One Spark session, many small
cases — catches clause-ordering / null / duplicate-key edge cases the
example tests don't enumerate."""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jodie_spark.tables.table import DeltaTable, write_delta

KEYS = st.integers(min_value=0, max_value=6)
VALS = st.sampled_from(["a", "b", "c", None])


def _model_merge(target: dict[int, str | None], source: dict[int, str | None]):
    """Reference semantics: delete matched rows with v='a' (clause 1),
    update the rest (clause 2), insert unmatched source rows."""
    out = {}
    for k, v in target.items():
        if k in source:
            if v == "a":
                continue  # whenMatchedDelete("old.v = 'a'")
            out[k] = source[k]  # whenMatchedUpdate
        else:
            out[k] = v  # untouched
    for k, v in source.items():
        if k not in target:
            out[k] = v  # whenNotMatchedInsertAll
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=st.dictionaries(KEYS, VALS, max_size=6),
    source=st.dictionaries(KEYS, VALS, max_size=6),
)
def test_merge_matches_model(spark, tmpdir_path, target, source):
    import uuid

    path = os.path.join(tmpdir_path, uuid.uuid4().hex)
    tdf = spark.createDataFrame(
        [(k, v) for k, v in target.items()] or [(None, None)], "k int, v string"
    )
    if not target:
        tdf = tdf.filter("k is not null")
    write_delta(tdf, path)
    t = DeltaTable.forPath(spark, path)
    sdf = spark.createDataFrame(
        [(k, v) for k, v in source.items()] or [(None, None)], "k int, v string"
    )
    if not source:
        sdf = sdf.filter("k is not null")
    (
        t.alias("old")
        .merge(sdf.alias("new"), "old.k = new.k")
        .whenMatchedDelete("old.v = 'a'")
        .whenMatchedUpdate(set={"v": "new.v"})
        .whenNotMatchedInsertAll()
        .execute()
    )
    got = {r["k"]: r["v"] for r in t.toDF().collect()}
    assert got == _model_merge(target, source)

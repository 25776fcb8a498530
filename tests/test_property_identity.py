"""Property-based checks: identity/row-id assignment is a bijection
onto the expected arithmetic block under ANY partitioning, and type
widening accepts exactly the protocol's widening chains."""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jodie_spark.tables.table import DeltaTable, _can_widen, write_delta


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n1=st.integers(min_value=0, max_value=40),
    n2=st.integers(min_value=0, max_value=40),
    parts=st.integers(min_value=1, max_value=9),
    start=st.integers(min_value=-5, max_value=5),
    step=st.sampled_from([1, 2, 5, -3]),
)
def test_identity_blocks_any_partitioning(spark, tmpdir_path, n1, n2, parts, start, step):
    import uuid

    p = os.path.join(tmpdir_path, f"prop_{uuid.uuid4().hex}")
    df1 = spark.range(n1).selectExpr("cast(id as string) as v").repartition(parts)
    write_delta(df1, p, identity_columns={"id": {"start": start, "step": step}})
    df2 = spark.range(n2).selectExpr("cast(id + 1000 as string) as v").repartition(parts)
    write_delta(df2, p, mode="append")
    got = sorted(r["id"] for r in DeltaTable.forPath(spark, p).toDF().collect())
    want = sorted(start + step * i for i in range(n1 + n2))
    assert got == want


_CHAIN = ["byte", "short", "integer", "long"]


def test_can_widen_matches_protocol_chains():
    from pyspark.sql import types as T

    mk = {
        "byte": T.ByteType(), "short": T.ShortType(), "integer": T.IntegerType(),
        "long": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
        "string": T.StringType(),
    }
    for i, a in enumerate(_CHAIN):
        for j, b in enumerate(_CHAIN):
            assert _can_widen(mk[a], mk[b]) == (i < j)
    assert _can_widen(mk["float"], mk["double"])
    assert not _can_widen(mk["double"], mk["float"])
    # no cross-family or string widenings
    assert not _can_widen(mk["long"], mk["double"])
    assert not _can_widen(mk["integer"], mk["string"])
    assert not _can_widen(mk["string"], mk["long"])

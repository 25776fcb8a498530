"""Property-based tests for the round-7 schema-evolution helpers:
``_merge_struct_types`` (recursive schema union with safe widening)
and ``_annotate_type_changes`` (typeChanges audit records). Pure
driver-side — no SparkSession needed, so hypothesis can run many
examples cheaply."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from jodie_spark.tables.merge import _annotate_type_changes, _merge_struct_types

_ATOMS = [
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(), T.StringType(), T.BooleanType(),
]
_WIDE_OF = {
    "byte": {"short", "integer", "long"},
    "short": {"integer", "long"},
    "integer": {"long"},
    "float": {"double"},
}

_names = st.sampled_from([f"c{i}" for i in range(8)])


def _dtypes(depth):
    atom = st.sampled_from(_ATOMS)
    if depth <= 0:
        return atom
    sub = _dtypes(depth - 1)
    return st.one_of(
        atom,
        st.builds(T.ArrayType, sub),
        st.lists(
            st.tuples(_names, sub), min_size=1, max_size=4,
            unique_by=lambda t: t[0],
        ).map(
            lambda fs: T.StructType(
                [T.StructField(n, dt, True) for n, dt in fs]
            )
        ),
    )


_schemas = st.lists(
    st.tuples(_names, _dtypes(2)), min_size=1, max_size=5,
    unique_by=lambda t: t[0],
).map(lambda fs: T.StructType([T.StructField(n, dt, True) for n, dt in fs]))


@settings(max_examples=200, deadline=None)
@given(tgt=_schemas, src=_schemas)
def test_merge_struct_types_invariants(tgt, src):
    merged, changed = _merge_struct_types(tgt, src)
    tgt_names = [f.name for f in tgt.fields]
    merged_names = [f.name for f in merged.fields]
    # target order preserved as a prefix; source-only fields appended
    assert merged_names[: len(tgt_names)] == tgt_names
    src_only = [f.name for f in src.fields if f.name not in set(tgt_names)]
    assert merged_names[len(tgt_names):] == src_only
    # every appended field is nullable and carries the source type
    src_by = {f.name: f for f in src.fields}
    for name in src_only:
        mf = merged[name]
        assert mf.nullable and mf.dataType == src_by[name].dataType
    # type changes only along the safe widening chain
    for f in tgt.fields:
        mf = merged[f.name]
        _assert_only_widened(f.dataType, mf.dataType)
    # changed flag is accurate
    assert changed == (merged != tgt)
    # idempotence: merging the result with the same source is a no-op
    merged2, changed2 = _merge_struct_types(merged, src)
    assert merged2 == merged and not changed2


def _assert_only_widened(old, new):
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        old_by = {f.name: f for f in old.fields}
        for f in new.fields:
            if f.name in old_by:
                _assert_only_widened(old_by[f.name].dataType, f.dataType)
        # old fields never disappear
        assert {f.name for f in old.fields} <= {f.name for f in new.fields}
        return
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        _assert_only_widened(old.elementType, new.elementType)
        return
    if old != new:
        assert new.typeName() in _WIDE_OF.get(old.typeName(), set()), (
            f"illegal type change {old} -> {new}"
        )


@settings(max_examples=200, deadline=None)
@given(tgt=_schemas, src=_schemas)
def test_annotate_type_changes_marks_exactly_the_widened_leaves(tgt, src):
    merged, changed = _merge_struct_types(tgt, src)
    annotated, widened = _annotate_type_changes(tgt, merged, 7)
    # annotation never alters names or types
    assert [f.name for f in annotated.fields] == [f.name for f in merged.fields]
    for f, g in zip(annotated.fields, merged.fields):
        assert f.dataType == g.dataType or (
            # struct internals may differ only in metadata
            f.dataType.simpleString() == g.dataType.simpleString()
        )
    # widened flag iff some leaf type differs between tgt and merged
    def any_leaf_diff(old, new):
        if isinstance(old, T.StructType) and isinstance(new, T.StructType):
            old_by = {f.name: f for f in old.fields}
            return any(
                any_leaf_diff(old_by[f.name].dataType, f.dataType)
                for f in new.fields if f.name in old_by
            )
        if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
            return any_leaf_diff(old.elementType, new.elementType)
        return old != new
    expect = any(
        any_leaf_diff(tf.dataType, merged[tf.name].dataType) for tf in tgt.fields
    )
    assert widened == expect
    # a top-level widened ATOMIC leaf carries the audit record
    for tf in tgt.fields:
        mf = dict((f.name, f) for f in annotated.fields)[tf.name]
        if (
            not isinstance(tf.dataType, (T.StructType, T.ArrayType, T.MapType))
            and tf.dataType != mf.dataType
        ):
            changes = dict(mf.metadata)["delta.typeChanges"]
            assert changes[-1]["fromType"] == tf.dataType.typeName()
            assert changes[-1]["toType"] == mf.dataType.typeName()
            assert changes[-1]["tableVersion"] == 7

"""Property tests: the portable RoaringBitmapArray serializer must
round-trip arbitrary position sets through its own parser (array,
bitmap, and run containers; multi-key 32-bit highs)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from jodie_spark.tables.deletion_vectors import (
    parse_roaring_bitmap_array,
    serialize_roaring_bitmap_array,
)

positions = st.lists(
    st.integers(min_value=0, max_value=1 << 40), max_size=300, unique=True
)


@settings(max_examples=200, deadline=None)
@given(positions)
def test_roundtrip_sparse(pos):
    data = serialize_roaring_bitmap_array(sorted(pos))
    assert parse_roaring_bitmap_array(data) == sorted(pos)


@settings(max_examples=50, deadline=None)
@given(positions)
def test_roundtrip_with_runs(pos):
    data = serialize_roaring_bitmap_array(sorted(pos), use_runs=True)
    assert parse_roaring_bitmap_array(data) == sorted(pos)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=0, max_value=5000),
    st.integers(min_value=4000, max_value=9000),
)
def test_roundtrip_dense_bitmap_container(start, n):
    # > 4096 values in one 16-bit chunk forces the bitmap container
    pos = list(range(start, start + n))
    data = serialize_roaring_bitmap_array(pos)
    assert parse_roaring_bitmap_array(data) == pos


def test_roundtrip_spans_multiple_high_words():
    pos = [0, 1, (1 << 32) - 1, 1 << 32, (1 << 32) + 7, 3 << 32]
    data = serialize_roaring_bitmap_array(pos)
    assert parse_roaring_bitmap_array(data) == pos


def test_empty_bitmap_roundtrip():
    assert parse_roaring_bitmap_array(serialize_roaring_bitmap_array([])) == []

"""Vectorized data skipping: the same predicate tree
``pruning.compile_skipping_predicate`` evaluates per-add in Python,
re-expressed as pyarrow.compute kernels over the checkpoint arrow base.

Why: ``spark.read.format("jodie_delta")`` with a pushed filter used to
spend ~16-17 s driver-side at a 1M-add table — ~9 s materializing every
add struct into a Python dict, then ~7-8 s sweeping those dicts through
the per-add evaluator (SCALE.md "Datasource scan-planning at 1M files",
VERDICT r12 top item). The adds already live as ONE pyarrow struct
array (``_FileState`` base, tables/log.py); evaluating the skipping
proof columnar keeps the per-row work in Arrow C++ and materializes
Python dicts only for the pruned survivors.

Soundness contract — this is a CONSERVATIVE PRE-FILTER, never the
authority:

* The tree (``pruning.build_skip_tree`` — shared builder, identical
  classification/precedence) contains only AND/OR/leaf nodes, no
  negation, so substituting *all-true* for any leaf this module cannot
  vectorize is monotone upward: the mask keeps a superset of what the
  Python evaluator keeps.
* Every vectorized leaf mirrors its ``pruning.file_may_match`` proof
  branch-for-branch; anything uncertain (un-coercible literal, a stats
  column that fails the arrow parse, an exotic kernel error) degrades
  to all-true via the per-leaf try/except.
* Partition-column leaves don't re-implement semantics at all: the
  partition-value strings are dictionary-encoded and
  ``file_may_match`` itself is called once per UNIQUE value — exact
  Python behavior at O(#distinct) Python cost.

Callers (``_FileState.pruned_adds``) re-run the exact Python predicate
over the surviving rows, so the final kept set is IDENTICAL to the
pure-Python path by construction; the fuzz lane
(tests/test_pruning_arrow.py) checks both the superset property of the
raw mask and the end-to-end set equality against DuckDB-validated
generators.

Parity: delta-core evaluates the same proofs as Catalyst expressions
over its checkpoint state DataFrame (DataSkippingReader.scala); with no
JVM session required here, Arrow compute is the equivalent vectorized
plane for the Python DataSource's planner.
"""

from __future__ import annotations

import io
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import types as T

from jodie_spark.tables.pruning import (
    Conjunct,
    _coerce,
    _prefix_upper,
    build_skip_tree,
    file_may_match,
)

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType, T.DecimalType)

# leaf kinds whose stats proof this module vectorizes; everything else
# (and every partition-column leaf) takes another path or stays all-true
_STATS_KINDS = {
    "equality", "minmax", "between", "in", "not_equality", "not_in",
    "like_prefix", "other",
}


def _stat_arrow_type(dtype: T.DataType) -> pa.DataType:
    """Arrow type the stats JSON parse should produce for a column —
    temporal types stay STRING here and cast at evaluation time (the
    JSON reader's implicit timestamp conversion is all-or-nothing; a
    cast failure must only disable one leaf, not the whole parse)."""
    if isinstance(dtype, _INT_TYPES):
        return pa.int64()
    if isinstance(dtype, _FLOAT_TYPES):
        return pa.float64()
    if isinstance(dtype, T.BooleanType):
        return pa.bool_()
    return pa.string()


def _lit_scalar(lit: Any, dtype: T.DataType) -> pa.Scalar:
    """The _coerce'd Python literal as a pa scalar in the stat column's
    evaluation type (must agree with _stat_values' output type)."""
    if isinstance(dtype, _INT_TYPES):
        return pa.scalar(int(lit), pa.int64())
    if isinstance(dtype, _FLOAT_TYPES):
        return pa.scalar(float(lit), pa.float64())
    if isinstance(dtype, T.BooleanType):
        return pa.scalar(bool(lit), pa.bool_())
    if isinstance(dtype, T.DateType):
        return pa.scalar(lit, pa.date32())
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return pa.scalar(lit, pa.timestamp("us"))
    return pa.scalar(str(lit), pa.string())


def _false_fill(arr: "pa.Array") -> "pa.Array":
    """Null comparison outcomes mean "stat absent — can't prove", which
    for a DROP condition is False (keep), mirroring the Python
    evaluator's ``x is not None and ...`` guards."""
    return pc.fill_null(arr, False)


def _flat(arr: "pa.Array | pa.ChunkedArray") -> "pa.Array":
    """Normalize to a single contiguous Array (pyarrow's
    ``ChunkedArray.combine_chunks`` already returns a flat Array)."""
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 0:
            return pa.nulls(0, arr.type)
        arr = arr.combine_chunks()
        if isinstance(arr, pa.ChunkedArray):  # older pyarrow: stays chunked
            arr = arr.chunk(0)
    return arr


class _Ctx:
    """Shared column accessors for one mask evaluation."""

    def __init__(
        self,
        base: "pa.Array",
        schema: T.StructType,
        partition_columns: list[str],
        stat_columns: set[str],
    ):
        self.n = len(base)
        self.base = base
        self.schema = schema
        self.partition_columns = list(partition_columns)
        self.field_types = {f.name: f.dataType for f in schema.fields}
        self._stat_columns = sorted(stat_columns)
        self._stats: "pa.Table | None | Exception" = None
        self._pv_child: "pa.Array | None" = None

    # -- partition values ---------------------------------------------------

    def partition_value(self, col: str) -> "pa.Array":
        """Raw partition-value strings for ``col`` (null = key absent or
        NULL — the same conflation ``dict.get`` gives the Python path)."""
        if self._pv_child is None:
            self._pv_child = pc.struct_field(self.base, "partitionValues")
        return pc.map_lookup(
            self._pv_child, query_key=pa.scalar(col, pa.string()), occurrence="first"
        )

    # -- stats --------------------------------------------------------------

    def _parse_stats(self) -> "pa.Table":
        """Parse the per-add stats JSON strings ONCE, columnar, for every
        column any leaf needs: the strings are joined into one NDJSON
        buffer with an Arrow kernel (null/empty rows become ``{}``) and
        fed to ``pyarrow.json.read_json`` with an EXPLICIT schema over
        just the needed fields — a multithreaded C++ parse instead of a
        million ``json.loads`` calls."""
        if isinstance(self._stats, Exception):
            raise self._stats
        if self._stats is not None:
            return self._stats
        try:
            import pyarrow.json as pj

            col = pc.struct_field(self.base, "stats")
            filled = _flat(
                pc.if_else(
                    pc.or_kleene(pc.is_null(col), pc.equal(col, "")),
                    pa.scalar("{}", pa.string()),
                    col,
                )
            )
            one_row = pa.ListArray.from_arrays(
                pa.array([0, len(filled)], pa.int32()), filled
            )
            joined = pc.binary_join(one_row, "\n")[0]
            try:
                buf = joined.as_buffer()
            except AttributeError:  # older scalar API
                buf = pa.py_buffer(joined.as_py().encode("utf-8"))
            mm = pa.struct(
                [
                    pa.field(c, _stat_arrow_type(self.field_types[c]))
                    for c in self._stat_columns
                ]
            )
            nc = pa.struct([pa.field(c, pa.int64()) for c in self._stat_columns])
            explicit = pa.schema(
                [
                    pa.field("numRecords", pa.int64()),
                    pa.field("minValues", mm),
                    pa.field("maxValues", mm),
                    pa.field("nullCount", nc),
                ]
            )
            tbl = pj.read_json(
                pa.BufferReader(buf),
                parse_options=pj.ParseOptions(
                    explicit_schema=explicit,
                    unexpected_field_behavior="ignore",
                ),
            ).combine_chunks()
            if tbl.num_rows != self.n:
                # a raw newline inside a stats string would misalign the
                # NDJSON rows — refuse rather than mis-prove
                raise ValueError("stats NDJSON row misalignment")
        except Exception as exc:  # noqa: BLE001 — any parse failure
            self._stats = exc  # ⇒ every stats leaf all-true (conservative)
            raise
        self._stats = tbl
        return tbl

    def _stat_child(self, parent: str, col: str) -> "pa.Array":
        return pc.struct_field(_flat(self._parse_stats()[parent]), col)

    def stat_minmax(self, col: str) -> tuple["pa.Array", "pa.Array"]:
        """(min, max) stat arrays for ``col`` in evaluation type —
        temporal columns cast from their ISO strings here, so a cast
        failure disables only this column's leaves."""
        mn = self._stat_child("minValues", col)
        mx = self._stat_child("maxValues", col)
        dtype = self.field_types[col]
        if isinstance(dtype, T.DateType):
            mn, mx = mn.cast(pa.date32()), mx.cast(pa.date32())
        elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
            mn, mx = mn.cast(pa.timestamp("us")), mx.cast(pa.timestamp("us"))
        return mn, mx

    def stat_nulls(self, col: str) -> tuple["pa.Array", "pa.Array"]:
        """(nullCount[col], numRecords) as int64 arrays."""
        return self._stat_child("nullCount", col), _flat(
            self._parse_stats()["numRecords"]
        )

    # -- exact-Python leaf over one synthetic add ----------------------------

    def py_leaf(self, cj: Conjunct, pv: str | None) -> bool:
        add = {
            "partitionValues": ({} if pv is None else {cj.column: pv}),
            "stats": None,
        }
        return file_may_match(add, [cj], self.schema, self.partition_columns)


def _all_true(ctx: _Ctx) -> None:
    return None  # sentinel: caller treats None as all-true


def _partition_leaf(cj: Conjunct, ctx: _Ctx) -> "pa.Array":
    """Exact Python semantics at O(#distinct): dictionary-encode the
    partition-value strings and call ``file_may_match`` once per unique
    value (including once for NULL)."""
    d = _flat(ctx.partition_value(cj.column)).dictionary_encode()
    verdicts = pa.array(
        [ctx.py_leaf(cj, u) for u in d.dictionary.to_pylist()], pa.bool_()
    )
    mask = pc.take(verdicts, d.indices)
    return pc.fill_null(mask, ctx.py_leaf(cj, None))


def _stats_leaf(cj: Conjunct, ctx: _Ctx) -> "pa.Array | None":
    """DROP-proof for one non-partition leaf, mirroring the matching
    branch of ``pruning.file_may_match`` (line refs in comments);
    returns the KEEP mask, or None for all-true."""
    col = cj.column
    dtype = ctx.field_types[col]
    kind, op = cj.kind, cj.op

    if kind == "other" and op in ("is null", "is not null"):
        nc, nr = ctx.stat_nulls(col)
        if op == "is null":  # drop when nullCount == 0
            drop = _false_fill(pc.equal(nc, pa.scalar(0, pa.int64())))
        else:  # drop when all rows NULL
            drop = _false_fill(pc.equal(nc, nr))
        return pc.invert(drop)
    if kind == "other":
        return None

    if kind == "like_prefix":
        if not isinstance(dtype, T.StringType):
            return None
        mn = ctx._stat_child("minValues", col)
        mx = ctx._stat_child("maxValues", col)
        prefix: str = cj.literal
        upper = _prefix_upper(prefix)
        drop = _false_fill(pc.less(mx, pa.scalar(prefix, pa.string())))
        if upper is not None:
            drop = pc.or_(
                drop,
                _false_fill(pc.greater_equal(mn, pa.scalar(upper, pa.string()))),
            )
        return pc.invert(drop)

    if kind == "in":
        vals = [_coerce(v, dtype) for v in cj.literal]
        coerced = [v for v in vals if v is not None]
        # prune only when EVERY literal coerced (file_may_match:554)
        if not coerced or len(coerced) != len(cj.literal):
            return None
        mn, mx = ctx.stat_minmax(col)
        possible = None
        for v in coerced:
            sc = _lit_scalar(v, dtype)
            out = pc.or_(
                _false_fill(pc.less(sc, mn)), _false_fill(pc.greater(sc, mx))
            )
            p = pc.invert(out)  # this literal may fall inside [min, max]
            possible = p if possible is None else pc.or_(possible, p)
        return possible

    if kind in ("not_equality", "not_in"):
        lits = (
            [_coerce(cj.literal, dtype)]
            if kind == "not_equality"
            else [_coerce(v, dtype) for v in cj.literal]
        )
        if any(v is None for v in lits):
            return None
        nc, nr = ctx.stat_nulls(col)
        drop = _false_fill(pc.equal(nc, nr))  # all NULL: never matches
        mn, mx = ctx.stat_minmax(col)
        single = _false_fill(pc.equal(mn, mx))
        hit = None
        for v in lits:
            h = _false_fill(pc.equal(mn, _lit_scalar(v, dtype)))
            hit = h if hit is None else pc.or_(hit, h)
        drop = pc.or_(drop, pc.and_(single, hit))
        return pc.invert(drop)

    if kind == "between":
        lo = _coerce(cj.literal[0], dtype)
        hi = _coerce(cj.literal[1], dtype)
        mn, mx = ctx.stat_minmax(col)
        drop = None
        if hi is not None:
            drop = _false_fill(pc.greater(mn, _lit_scalar(hi, dtype)))
        if lo is not None:
            d2 = _false_fill(pc.less(mx, _lit_scalar(lo, dtype)))
            drop = d2 if drop is None else pc.or_(drop, d2)
        return None if drop is None else pc.invert(drop)

    lit = _coerce(cj.literal, dtype)
    if lit is None:
        return None  # file_may_match:696 — un-coercible ⇒ keep
    sc = _lit_scalar(lit, dtype)
    mn, mx = ctx.stat_minmax(col)
    if kind == "equality":
        drop = pc.or_(
            _false_fill(pc.less(sc, mn)), _false_fill(pc.greater(sc, mx))
        )
    elif kind == "minmax" and op == ">":
        drop = _false_fill(pc.less_equal(mx, sc))
    elif kind == "minmax" and op == ">=":
        drop = _false_fill(pc.less(mx, sc))
    elif kind == "minmax" and op == "<":
        drop = _false_fill(pc.greater_equal(mn, sc))
    elif kind == "minmax" and op == "<=":
        drop = _false_fill(pc.greater(mn, sc))
    else:
        return None
    return pc.invert(drop)


def _leaf_mask(cj: Conjunct, ctx: _Ctx) -> "pa.Array | None":
    """KEEP mask for one leaf; None = all-true (unsupported/uncertain).
    The blanket except is the soundness valve: any kernel surprise
    degrades to keep-everything, and the caller's Python authority pass
    restores exactness."""
    try:
        if cj.kind == "unresolved" or cj.column is None:
            return None
        if cj.column not in ctx.field_types:
            return None
        if cj.column in ctx.partition_columns:
            return _partition_leaf(cj, ctx)
        if cj.kind in _STATS_KINDS:
            return _stats_leaf(cj, ctx)
        return None
    except Exception:  # noqa: BLE001
        return None


def _tree_mask(node, ctx: _Ctx) -> "pa.Array | None":
    if node is None:
        return None
    tag, payload = node
    if tag == "leaf":
        return _leaf_mask(payload, ctx)
    masks = [_tree_mask(n, ctx) for n in payload]
    if tag == "and":
        out = None
        for m in masks:
            if m is not None:
                out = m if out is None else pc.and_(out, m)
        return out
    # OR: one all-true child makes the whole node all-true
    if not masks or any(m is None for m in masks):
        return None
    out = masks[0]
    for m in masks[1:]:
        out = pc.or_(out, m)
    return out


def collect_stat_columns(tree, ctx_fields: dict, partition_columns: list[str]) -> set[str]:
    out: set[str] = set()

    def walk(node):
        if node is None:
            return
        tag, payload = node
        if tag == "leaf":
            cj: Conjunct = payload
            if (
                cj.column
                and cj.column in ctx_fields
                and cj.column not in partition_columns
                and cj.kind in _STATS_KINDS
            ):
                out.add(cj.column)
            return
        for n in payload:
            walk(n)

    walk(tree)
    return out


def arrow_keep_mask(
    base: "pa.Array | pa.ChunkedArray",
    condition: str,
    schema: T.StructType,
    partition_columns: list[str],
) -> "pa.Array | None":
    """Boolean keep mask over the add-struct rows (True = may match),
    or None when nothing is vectorizable (caller keeps every row and
    lets the Python evaluator decide). Conservative by construction —
    see the module docstring's soundness contract."""
    try:
        base = _flat(base)
        columns = [f.name for f in schema.fields]
        tree = build_skip_tree(condition, columns)
        fields = {f.name: f.dataType for f in schema.fields}
        stat_cols = collect_stat_columns(tree, fields, list(partition_columns))
        ctx = _Ctx(base, schema, list(partition_columns), stat_cols)
        mask = _tree_mask(tree, ctx)
        return None if mask is None else _flat(mask)
    except Exception:  # noqa: BLE001
        return None

"""Property-based log-replay fuzz: a random program of appends /
deletes / MoR-deletes / overwrites / checkpoints / restores must leave
the table equal to a pure-Python model — exercising snapshot
reconstruction, checkpoint round-trips, DV state, and tombstones in
combination."""

import os
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jodie_spark.tables.log import DeltaLog
from jodie_spark.tables.table import DeltaTable, write_delta

# op alphabet: (kind, arg)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(min_value=1, max_value=8)),
        st.tuples(st.just("delete"), st.integers(min_value=0, max_value=4)),
        st.tuples(st.just("mor_delete"), st.integers(min_value=0, max_value=4)),
        st.tuples(st.just("overwrite"), st.integers(min_value=1, max_value=6)),
        st.tuples(st.just("checkpoint"), st.just(0)),
        st.tuples(st.just("restore_prev"), st.just(0)),
        st.tuples(st.just("update"), st.integers(min_value=0, max_value=3)),
        st.tuples(st.just("zorder"), st.just(0)),
    ),
    min_size=1,
    max_size=9,
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_random_program_matches_model(spark, tmpdir_path, ops):
    p = os.path.join(tmpdir_path, f"fuzz_{uuid.uuid4().hex}")
    write_delta(spark.range(0, 4).selectExpr("id", "id % 3 as m"), p)
    model = {i: i % 3 for i in range(4)}
    history = [dict(model)]
    next_id = 100

    for kind, arg in ops:
        t = DeltaTable.forPath(spark, p)
        if kind == "append":
            rows = [(next_id + i, (next_id + i) % 3) for i in range(arg)]
            write_delta(
                spark.createDataFrame(rows, "id long, m long"), p, mode="append"
            )
            model.update({k: v for k, v in rows})
            next_id += arg
        elif kind == "delete":
            t.delete(f"m = {arg % 3}")
            model = {k: v for k, v in model.items() if v != arg % 3}
        elif kind == "mor_delete":
            t.delete(f"id % 5 = {arg}", deletion_vectors=True)
            model = {k: v for k, v in model.items() if k % 5 != arg}
        elif kind == "overwrite":
            rows = [(next_id + i, (next_id + i) % 3) for i in range(arg)]
            write_delta(
                spark.createDataFrame(rows, "id long, m long"), p, mode="overwrite"
            )
            model = {k: v for k, v in rows}
            next_id += arg
        elif kind == "update":
            t.update(f"id % 4 = {arg}", {"m": "(m + 1) % 3"})
            model = {
                k: ((v + 1) % 3 if k % 4 == arg else v) for k, v in model.items()
            }
        elif kind == "zorder":
            t.optimize().executeZOrderBy("id")  # layout-only commit
        elif kind == "checkpoint":
            DeltaLog(p).write_checkpoint()
            continue  # commits no version — history stays aligned
        elif kind == "restore_prev":
            prev = DeltaLog(p).latest_version() - 1
            if prev >= 1:
                try:
                    t.restore(prev)
                except Exception:
                    continue  # restore refused; state unchanged, no commit
                # history[v] = state after version v
                model = dict(history[prev])
                history.append(dict(model))
            continue
        history.append(dict(model))

    got = {r["id"]: r["m"] for r in DeltaTable.forPath(spark, p).toDF().collect()}
    assert got == model


def test_gc_pause_is_reentrant_and_thread_safe():
    """ADVICE r11: gc.disable() during snapshot replay is process-global
    — two interleaving replays must not re-enable GC mid-flight, and the
    outermost exit must restore the state the outermost entry saw."""
    import gc
    import threading

    from jodie_spark.tables.log import _gc_paused

    assert gc.isenabled()
    with _gc_paused():
        assert not gc.isenabled()
        with _gc_paused():  # reentrant nesting
            assert not gc.isenabled()
        assert not gc.isenabled()  # inner exit must NOT re-enable
    assert gc.isenabled()

    # interleaved threads: GC stays off for the union of both windows
    enter_a, exit_a, entered_b = (
        threading.Event(), threading.Event(), threading.Event()
    )
    states = {}

    def a():
        with _gc_paused():
            enter_a.set()
            entered_b.wait(10)
            states["during_overlap"] = gc.isenabled()
            exit_a.set()

    def b():
        enter_a.wait(10)
        with _gc_paused():
            entered_b.set()
            exit_a.wait(10)
            # a() exited while b() still replays: GC must stay off
            states["after_a_exit"] = gc.isenabled()

    ta, tb = threading.Thread(target=a), threading.Thread(target=b)
    ta.start(); tb.start(); ta.join(10); tb.join(10)
    assert states == {"during_overlap": False, "after_a_exit": False}
    assert gc.isenabled()


def test_file_state_columnar_overlay_semantics():
    """_FileState: columnar base + dict overlay must agree with the
    plain-dict model on counts, byte totals, and the materialized view
    — including overrides (tail re-add of a checkpointed path) and
    removals."""
    import pyarrow as pa

    from jodie_spark.tables.log import _FileState

    t = pa.struct(
        [("path", pa.string()), ("size", pa.int64()),
         ("partitionValues", pa.map_(pa.string(), pa.string()))]
    )
    base = pa.chunked_array([
        pa.array(
            [{"path": f"f{i}", "size": 10 * (i + 1), "partitionValues": [("p", str(i))]}
             for i in range(5)],
            t,
        )
    ])
    # tail: f1 removed; f3 re-added with a new size; f9 brand new
    overlay = {
        "f3": {"path": "f3", "size": 999, "partitionValues": {"p": "3"}},
        "f9": {"path": "f9", "size": 7, "partitionValues": {}},
    }
    st = _FileState(base, overlay, {"f1", "f3", "f9"})
    assert st.num_files() == 5  # {f0, f2, f4} kept + f3 re-added + f9
    assert len(st) == 5
    # 10+30+50 (f0,f2,f4) + 999 + 7
    assert st.size_in_bytes() == 90 + 999 + 7
    assert st._dict is None  # counts did not materialize
    d = st.as_dict()
    assert set(d) == {"f0", "f2", "f4", "f3", "f9"} | set()
    assert d["f3"]["size"] == 999  # overlay wins
    assert d["f0"]["partitionValues"] == {"p": "0"}  # maps → dicts
    # post-materialization the same answers hold
    assert st.num_files() == 5 and st.size_in_bytes() == 90 + 999 + 7
    assert st.as_dict() is d  # cached identity

    # dict-seeded state (commit paths, tests) behaves identically
    st2 = _FileState.from_dict(d)
    assert st2.num_files() == 5 and st2.size_in_bytes() == st.size_in_bytes()

    # null sizes count as 0 (protocol: size is optional on remove)
    nbase = pa.chunked_array([
        pa.array([{"path": "g0", "size": None, "partitionValues": []}], t)
    ])
    st3 = _FileState(nbase, {}, set())
    assert st3.num_files() == 1 and st3.size_in_bytes() == 0


def test_struct_rows_matches_generic_conversion():
    """Child-wise materialization (_struct_rows) must agree value-for-
    value with arrow's generic to_pylist + _maps_to_dicts on add-struct
    shapes: null/None children, empty and null maps, nested DV structs,
    filtered and sliced arrays. (Deliberate divergence: an EMPTY map
    comes back {} — the generic path left [] because _maps_to_dicts
    cannot see an empty list is a map; {} matches JSON-tail payloads.)"""
    import pyarrow as pa

    from jodie_spark.tables.log import _maps_to_dicts, _struct_rows

    def norm(p):
        if isinstance(p, dict):
            return {k: ({} if v == [] else norm(v)) for k, v in p.items()}
        return p

    dv_t = pa.struct([
        ("storageType", pa.string()), ("pathOrInlineDv", pa.string()),
        ("offset", pa.int32()), ("sizeInBytes", pa.int32()),
        ("cardinality", pa.int64()),
    ])
    t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()),
        ("dataChange", pa.bool_()),
        ("stats", pa.string()),
        ("deletionVector", dv_t),
        ("tags", pa.map_(pa.string(), pa.string())),
    ])
    rows = [
        {"path": "a", "partitionValues": [("p", "1"), ("q", None)], "size": 5,
         "dataChange": True, "stats": None,
         "deletionVector": {"storageType": "u", "pathOrInlineDv": "x",
                            "offset": 1, "sizeInBytes": 2, "cardinality": 3},
         "tags": []},
        {"path": "b", "partitionValues": [], "size": None, "dataChange": False,
         "stats": "{}", "deletionVector": None, "tags": None},
        {"path": "c", "partitionValues": None, "size": 0, "dataChange": None,
         "stats": "s", "deletionVector": None, "tags": [("k", "v")]},
    ]
    arr = pa.chunked_array([pa.array(rows[:2], t), pa.array(rows[2:], t)])
    assert list(_struct_rows(arr)) == [norm(_maps_to_dicts(p)) for p in arr.to_pylist()]

    big = pa.array(
        [{"path": f"f{i}", "partitionValues": [("p", str(i))], "size": i,
          "dataChange": True, "stats": None, "deletionVector": None, "tags": None}
         for i in range(100)], t)
    mask = pa.array([i % 3 == 0 for i in range(100)])
    for view in (big.filter(mask), big.slice(37, 20)):
        ca = pa.chunked_array([view])
        assert list(_struct_rows(ca)) == [
            norm(_maps_to_dicts(p)) for p in ca.to_pylist()
        ]


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["add", "remove"]),
            st.integers(min_value=0, max_value=30),   # path id
            st.integers(min_value=0, max_value=1000), # size
        ),
        max_size=60,
    ),
    st.integers(min_value=0, max_value=20),  # how many initial actions checkpoint
)
@settings(max_examples=120, deadline=None)
def test_file_state_matches_dict_model(ops, cp_n):
    """_FileState under random checkpoint-base + tail-overlay action
    sequences must agree with the plain dict model on the dict view,
    count, and byte total — the exact replay semantics _snapshot_inner
    implements (adds override, removes tombstone, later wins)."""
    import pyarrow as pa

    from jodie_spark.tables.log import _FileState

    # dict model over the WHOLE sequence
    model: dict[str, dict] = {}
    for kind, pid, size in ops:
        p = f"f{pid}"
        if kind == "add":
            model[p] = {"path": p, "size": size, "partitionValues": {}}
        else:
            model.pop(p, None)

    # split: first cp_n actions reconcile into a columnar checkpoint
    # base, the rest replay as the JSON tail overlay
    cp_model: dict[str, dict] = {}
    for kind, pid, size in ops[:cp_n]:
        p = f"f{pid}"
        if kind == "add":
            cp_model[p] = {"path": p, "size": size, "partitionValues": []}
        else:
            cp_model.pop(p, None)
    t = pa.struct([
        ("path", pa.string()), ("size", pa.int64()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
    ])
    base = (
        pa.chunked_array([pa.array(list(cp_model.values()), t)])
        if cp_model
        else None
    )
    overlay: dict[str, dict] = {}
    dropped: set[str] = set()
    for kind, pid, size in ops[cp_n:]:
        p = f"f{pid}"
        if kind == "add":
            overlay[p] = {"path": p, "size": size, "partitionValues": {}}
            dropped.add(p)
        else:
            overlay.pop(p, None)
            dropped.add(p)
    stt = _FileState(base, overlay, dropped)
    assert stt.num_files() == len(model)
    assert stt.size_in_bytes() == sum(v["size"] for v in model.values())
    # the projected/streamed serving lanes (r13) must agree with the
    # model BEFORE any dict materialization
    rows = list(stt.iter_rows(("path", "size")))
    assert {r["path"]: r["size"] for r in rows} == {
        p: v["size"] for p, v in model.items()
    }
    n, (paths, sizes) = stt.column_lists(("path", "size"))
    assert n == len(model) and dict(zip(paths, sizes)) == {
        p: v["size"] for p, v in model.items()
    }
    # missing column -> all None; require= filters on non-null
    _, (_, missing) = stt.column_lists(("path", "deletionVector"))
    assert all(v is None for v in missing)
    assert list(stt.iter_rows(require="deletionVector")) == []
    assert stt._dict is None, "serving lanes materialized the dict view"
    assert stt.as_dict() == model
    # post-materialization answers identical (including the lanes)
    assert stt.num_files() == len(model)
    assert stt.size_in_bytes() == sum(v["size"] for v in model.values())
    rows2 = list(stt.iter_rows(("path", "size")))
    assert {r["path"]: r["size"] for r in rows2} == {
        p: v["size"] for p, v in model.items()
    }
    n2, (paths2, sizes2) = stt.column_lists(("path", "size"))
    assert n2 == len(model) and dict(zip(paths2, sizes2)) == {
        p: v["size"] for p, v in model.items()
    }


def test_multipart_checkpoint_with_varying_struct_width(spark, tmpdir_path):
    """A foreign writer's multi-part checkpoint whose parts carry
    DIFFERENT add-struct widths (an optional field present in one part
    only) must still replay: pyarrow cannot CAST a struct to a superset
    struct, so the reader widens chunks by hand (review r12 — the
    unify_schemas+cast path crashed with ArrowTypeError on exactly the
    case its comment claimed to handle)."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jodie_spark.tables.log import (
        DeltaLog,
        multipart_checkpoint_file_name,
    )
    from jodie_spark.tables.table import DeltaTable, write_delta

    p = os.path.join(tmpdir_path, "vary")
    write_delta(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), p)
    log = DeltaLog(p)
    snap = log.snapshot()
    adds = snap.add_files()
    assert len(adds) >= 1

    # part 1: narrow add struct (no stats field); part 2: wider (stats)
    def part(add, with_stats, with_meta):
        fields = [("path", pa.string()), ("size", pa.int64()),
                  ("modificationTime", pa.int64()), ("dataChange", pa.bool_()),
                  ("partitionValues", pa.map_(pa.string(), pa.string()))]
        if with_stats:
            fields.append(("stats", pa.string()))
        t = pa.struct(fields)
        row = {"path": add["path"], "size": int(add.get("size") or 0),
               "modificationTime": int(add.get("modificationTime") or 0),
               "dataChange": False, "partitionValues": []}
        if with_stats:
            row["stats"] = add.get("stats")
        cols = {"add": pa.array([row], t)}
        if with_meta:
            cols["metaData"] = pa.array([snap.metadata], pa.struct([
                ("id", pa.string()), ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", pa.map_(pa.string(), pa.string())),
                ("format", pa.struct([("provider", pa.string())])),
            ]))
            cols["protocol"] = pa.array([{"minReaderVersion": 1,
                                          "minWriterVersion": 2}],
                                        pa.struct([("minReaderVersion", pa.int32()),
                                                   ("minWriterVersion", pa.int32())]))
        return pa.table(cols)

    # split real adds across the two parts (duplicate-free)
    a1 = adds[0]
    a2 = adds[1] if len(adds) > 1 else None
    ld = os.path.join(p, "_delta_log")
    v = log.latest_version()
    pq.write_table(part(a1, with_stats=False, with_meta=True),
                   os.path.join(ld, multipart_checkpoint_file_name(v, 1, 2)))
    pq.write_table(part(a2 or a1, with_stats=True, with_meta=False),
                   os.path.join(ld, multipart_checkpoint_file_name(v, 2, 2)))
    with open(os.path.join(ld, "_last_checkpoint"), "w") as fh:
        fh.write(_json.dumps({"version": v, "size": 2}))

    snap2 = DeltaLog(p).snapshot()
    expect = 2 if a2 is not None else 1
    assert snap2.num_files() == expect
    d = snap2.files
    assert a1["path"] in d
    # the widened narrow-part row surfaces the absent field as None
    assert d[a1["path"]].get("stats") is None
    if a2 is not None:
        assert d[a2["path"]].get("stats") == a2.get("stats")


def test_multipart_checkpoint_with_nested_struct_width_drift(spark, tmpdir_path):
    """ADVICE r12: width drift inside a NESTED struct child
    (deletionVector present in both parts but with different field
    sets) must widen recursively — the old cast(f.type) fallback raised
    ArrowTypeError for exactly this shape. Null nested rows must stay
    null, not become structs of nulls."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jodie_spark.tables.log import DeltaLog, multipart_checkpoint_file_name
    from jodie_spark.tables.table import write_delta

    p = os.path.join(tmpdir_path, "nestvary")
    write_delta(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), p)
    log = DeltaLog(p)
    snap = log.snapshot()
    adds = snap.add_files()

    def part(add, dv_fields, dv_row, with_meta):
        dv_t = pa.struct(dv_fields)
        t = pa.struct([
            ("path", pa.string()), ("size", pa.int64()),
            ("modificationTime", pa.int64()), ("dataChange", pa.bool_()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("deletionVector", dv_t),
        ])
        row = {"path": add["path"], "size": int(add.get("size") or 0),
               "modificationTime": 0, "dataChange": False,
               "partitionValues": [], "deletionVector": dv_row}
        cols = {"add": pa.array([row], t)}
        if with_meta:
            cols["metaData"] = pa.array([snap.metadata], pa.struct([
                ("id", pa.string()), ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", pa.map_(pa.string(), pa.string())),
                ("format", pa.struct([("provider", pa.string())])),
            ]))
            cols["protocol"] = pa.array(
                [{"minReaderVersion": 1, "minWriterVersion": 2}],
                pa.struct([("minReaderVersion", pa.int32()),
                           ("minWriterVersion", pa.int32())]),
            )
        return pa.table(cols)

    narrow = [("storageType", pa.string()), ("pathOrInlineDv", pa.string())]
    wide = narrow + [("offset", pa.int32()), ("sizeInBytes", pa.int32()),
                     ("cardinality", pa.int64())]
    a1, a2 = adds[0], (adds[1] if len(adds) > 1 else adds[0])
    ld = os.path.join(p, "_delta_log")
    v = log.latest_version()
    # narrow part: dv row is NULL (must stay null after widening)
    pq.write_table(part(a1, narrow, None, with_meta=True),
                   os.path.join(ld, multipart_checkpoint_file_name(v, 1, 2)))
    pq.write_table(
        part(a2, wide,
             {"storageType": "u", "pathOrInlineDv": "x", "offset": 1,
              "sizeInBytes": 2, "cardinality": 3},
             with_meta=False),
        os.path.join(ld, multipart_checkpoint_file_name(v, 2, 2)),
    )
    with open(os.path.join(ld, "_last_checkpoint"), "w") as fh:
        fh.write(_json.dumps({"version": v, "size": 2}))

    snap2 = DeltaLog(p).snapshot()
    d = snap2.files
    assert d[a1["path"]].get("deletionVector") is None
    if a2["path"] != a1["path"]:
        dv = d[a2["path"]]["deletionVector"]
        assert dv["cardinality"] == 3 and dv["storageType"] == "u"
        # widened narrow fields absent from the wide row? wide carries
        # all; the NARROW part's struct gained null offset/size fields
        assert set(dv) >= {"offset", "sizeInBytes", "cardinality"}

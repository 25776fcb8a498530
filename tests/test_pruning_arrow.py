"""Arrow-vs-Python skipping equivalence (VERDICT r12 item 1's third
fuzz lane): for randomly generated conditions and add batches,

1. the raw ``arrow_keep_mask`` must be CONSERVATIVE — it never drops a
   file the Python evaluator keeps (superset property; the and/or tree
   is negation-free so all-true substitution is monotone), and
2. ``_FileState.pruned_adds`` (mask + exact-evaluator survivors) must
   return EXACTLY the same files as ``prune_files`` over the dict view.

The generator reuses the shapes of tests/test_skipping_fuzz.py (every
classifier kind, foreign-serialization mutations, null stats, malformed
stats JSON, empty-string stats, missing stat keys) plus temporal and
partition columns, so the arrow plane is exercised across its type
mappings and its fallback valves.
"""

import json
import random

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from jodie_spark.tables.log import _FileState
from jodie_spark.tables.pruning import compile_skipping_predicate, prune_files
from jodie_spark.tables.pruning_arrow import arrow_keep_mask

SCHEMA = T.StructType(
    [
        T.StructField("p", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("id", T.LongType()),
        T.StructField("k", T.StringType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("d", T.DateType()),
        T.StructField("b", T.BooleanType()),
    ]
)
PARTITION_COLS = ["p", "s"]

ADD_TYPE = pa.struct(
    [
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()),
        ("stats", pa.string()),
    ]
)


def _rand_leaf(rng: random.Random) -> str:
    kind = rng.choice(
        [
            "cmp_id", "cmp_p", "cmp_s", "cmp_k", "cmp_x", "cmp_ts", "cmp_d",
            "between", "in_p", "in_id", "not_in", "like", "null", "neq",
            "other", "unresolved",
        ]
    )
    if kind == "cmp_id":
        return f"id {rng.choice(['=', '<', '<=', '>', '>='])} {rng.randrange(0, 40)}"
    if kind == "cmp_p":
        return f"p {rng.choice(['=', '<', '<=', '>', '>=', '!='])} {rng.randrange(0, 4)}"
    if kind == "cmp_s":
        return f"s {rng.choice(['=', '<', '>='])} '{rng.choice(['aa', 'b', 'zz'])}'"
    if kind == "cmp_k":
        return f"k {rng.choice(['=', '<', '>='])} '{rng.choice(['aa', 'ab', 'b', 'zz'])}'"
    if kind == "cmp_x":
        return f"x {rng.choice(['=', '<', '<=', '>', '>='])} {rng.uniform(0, 10):.2f}"
    if kind == "cmp_ts":
        day = rng.randrange(1, 28)
        return (
            f"ts {rng.choice(['<', '<=', '>', '>=', '='])} "
            f"timestamp'2024-01-{day:02d} 12:00:00'"
        )
    if kind == "cmp_d":
        return f"d {rng.choice(['<', '<=', '>', '>=', '='])} date'2024-01-{rng.randrange(1, 28):02d}'"
    if kind == "between":
        lo = rng.randrange(0, 30)
        return f"id between {lo} and {lo + rng.randrange(0, 15)}"
    if kind == "in_p":
        vals = sorted({rng.randrange(0, 6) for _ in range(rng.randrange(1, 4))})
        return f"p in ({', '.join(map(str, vals))})"
    if kind == "in_id":
        vals = sorted({rng.randrange(0, 40) for _ in range(rng.randrange(1, 4))})
        return f"id in ({', '.join(map(str, vals))})"
    if kind == "not_in":
        vals = sorted({rng.randrange(0, 6) for _ in range(rng.randrange(1, 4))})
        return f"{rng.choice(['p', 'id'])} not in ({', '.join(map(str, vals))})"
    if kind == "like":
        return f"{rng.choice(['k', 's'])} like '{rng.choice(['a', 'ab', 'z'])}%'"
    if kind == "null":
        return f"{rng.choice(['k', 'p', 'x'])} is {rng.choice(['null', 'not null'])}"
    if kind == "neq":
        return f"id != {rng.randrange(0, 40)}"
    if kind == "other":
        return rng.choice(["k rlike 'a.*'", "length(k) > 2", "b = true"])
    return f"zz = {rng.randrange(0, 5)}"  # unresolved reference


def _rand_condition(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rng.random() < 0.4:
        return _rand_leaf(rng)
    op = rng.choice([" and ", " or "])
    parts = []
    for _ in range(rng.randrange(2, 4)):
        sub = _rand_condition(rng, depth + 1)
        parts.append(f"({sub})" if rng.random() < 0.5 else sub)
    return op.join(parts)


def _rand_add(rng: random.Random, i: int) -> dict:
    pv_p = rng.choice([None, 0, 1, 2, 3])
    pv_s = rng.choice([None, "aa", "ab", "b", "zz"])
    ser_p = None if pv_p is None else str(pv_p)
    if pv_p is not None and rng.random() < 0.15:
        # foreign-serialization mutation: present but un-coercible must
        # behave as "unknown", never as NULL (ADVICE r10)
        ser_p = rng.choice([f"{pv_p}.0", f"{pv_p}x", "oddball"])
    stats: str | None
    r = rng.random()
    if r < 0.08:
        stats = None
    elif r < 0.12:
        stats = ""
    elif r < 0.15:
        stats = "{not json"  # malformed: whole arrow parse must bail
    else:
        lo = rng.randrange(0, 35)
        klo, khi = sorted(
            [rng.choice(["a", "ab0", "b", "zz"]), rng.choice(["a", "abz", "c", "zz9"])]
        )
        xlo = round(rng.uniform(0, 8), 2)
        tday = rng.randrange(1, 27)
        n = rng.randrange(1, 8)
        st = {
            "numRecords": n,
            "minValues": {
                "id": lo,
                "k": klo,
                "x": xlo,
                "ts": f"2024-01-{tday:02d}T03:00:00.000000",
                "d": f"2024-01-{tday:02d}",
            },
            "maxValues": {
                "id": lo + rng.randrange(0, 10),
                "k": khi,
                "x": xlo + rng.uniform(0, 3),
                "ts": f"2024-01-{tday + 1:02d}T18:30:00.000000",
                "d": f"2024-01-{tday + 1:02d}",
            },
            "nullCount": {
                "id": rng.choice([0, 0, 0, n]),
                "k": rng.choice([0, 0, n]),
                "x": rng.choice([0, n]),
                "ts": 0,
                "d": 0,
            },
        }
        if rng.random() < 0.1:  # missing stat keys for some columns
            for part in ("minValues", "maxValues"):
                st[part].pop(rng.choice(["id", "k", "x"]), None)
        stats = json.dumps(st)
    pv = {}
    if ser_p is not None:
        pv["p"] = ser_p
    if pv_s is not None:
        pv["s"] = pv_s
    if rng.random() < 0.1:
        pv["p"] = None  # key present, value null — same as absent
    return {
        "path": f"f{i}",
        "partitionValues": pv,
        "size": 100 + i,
        "stats": stats,
    }


def _as_arrow(adds: list[dict]) -> pa.ChunkedArray:
    rows = [
        {**a, "partitionValues": list((a["partitionValues"] or {}).items())}
        for a in adds
    ]
    mid = len(rows) // 2  # two chunks: exercise combine paths
    return pa.chunked_array(
        [pa.array(rows[:mid], ADD_TYPE), pa.array(rows[mid:], ADD_TYPE)]
    )


def test_arrow_mask_conservative_and_pruned_adds_exact():
    rng = random.Random(20260813)
    cases = masked = 0
    pruned_any = 0
    for case in range(400):
        cond = _rand_condition(rng)
        adds = [_rand_add(rng, i) for i in range(rng.randrange(1, 40))]
        base = _as_arrow(adds)

        py_pred = compile_skipping_predicate(cond, SCHEMA, PARTITION_COLS)
        py_keep = [bool(py_pred(a)) for a in adds]

        mask = arrow_keep_mask(base, cond, SCHEMA, PARTITION_COLS)
        cases += 1
        if mask is not None:
            masked += 1
            got = mask.to_pylist()
            assert len(got) == len(adds)
            for i, (am, pm) in enumerate(zip(got, py_keep)):
                assert am is not None
                # superset property: arrow may keep extra, never drop more
                assert am or not pm, (
                    f"case {case}: arrow dropped a file Python keeps\n"
                    f"condition: {cond}\nadd: {adds[i]}"
                )
            if not all(got):
                pruned_any += 1

        # end-to-end: pruned_adds == prune_files over the dict view
        st = _FileState(base, {}, set())
        got_paths = [
            a["path"] for a in st.pruned_adds(cond, SCHEMA, PARTITION_COLS)
        ]
        want_paths = [
            a["path"]
            for a in prune_files(adds, cond, SCHEMA, PARTITION_COLS)
        ]
        assert got_paths == want_paths, (
            f"case {case}: pruned_adds diverged\ncondition: {cond}\n"
            f"got {got_paths}\nwant {want_paths}"
        )
    # the lane must actually exercise vectorized pruning, not fall back
    # (the generator's "other"/"unresolved" kinds legitimately yield
    # all-true trees — measured 243/400 masked at this seed, 0 kernel
    # exceptions; a regression to exception-driven fallback drops this
    # sharply)
    assert masked >= cases * 0.55, (cases, masked)
    assert pruned_any >= 50, pruned_any


def test_pruned_adds_overlay_and_dropped_interplay():
    """Base ∩ dropped rows vanish; overlay rows are evaluated with the
    exact Python predicate; order is base-then-overlay like as_dict."""
    rng = random.Random(7)
    adds = [_rand_add(rng, i) for i in range(20)]
    base = _as_arrow(adds)
    overlay = {
        "o1": {"path": "o1", "partitionValues": {"p": "1"},
               "stats": json.dumps({"numRecords": 1, "minValues": {"id": 5},
                                    "maxValues": {"id": 5},
                                    "nullCount": {"id": 0}}), "size": 1},
        "o2": {"path": "o2", "partitionValues": {"p": "3"},
               "stats": json.dumps({"numRecords": 1, "minValues": {"id": 500},
                                    "maxValues": {"id": 500},
                                    "nullCount": {"id": 0}}), "size": 1},
    }
    dropped = {adds[0]["path"], adds[7]["path"], "o1", "o2"}
    st = _FileState(base, overlay, dropped)
    cond = "p = 1 and id <= 30"
    got = st.pruned_adds(cond, SCHEMA, PARTITION_COLS)
    want = prune_files(
        list(st.as_dict().values()), cond, SCHEMA, PARTITION_COLS
    )
    # as_dict() call above materialized the dict — rebuild a fresh state
    st2 = _FileState(base, overlay, dropped)
    got2 = st2.pruned_adds(cond, SCHEMA, PARTITION_COLS)
    assert [a["path"] for a in got] == [a["path"] for a in want]
    assert [a["path"] for a in got2] == [a["path"] for a in want]
    assert all(a["path"] not in (adds[0]["path"], adds[7]["path"]) for a in got2)
    # o1/o2 sit in BOTH overlay and dropped (the builder invariant:
    # overlay paths are always in dropped) — dropped only masks BASE
    # rows, so o1 must still appear
    assert {"o1"} <= {a["path"] for a in got2}
    assert "o2" not in {a["path"] for a in got2}  # id=500 fails id<=30


def test_pruned_adds_no_condition_and_materialized_state():
    rng = random.Random(11)
    adds = [_rand_add(rng, i) for i in range(10)]
    base = _as_arrow(adds)
    st = _FileState(base, {}, set())
    assert [a["path"] for a in st.pruned_adds(None, SCHEMA, PARTITION_COLS)] == [
        a["path"] for a in adds
    ]
    st.as_dict()  # force the dict view
    got = st.pruned_adds("id >= 0", SCHEMA, PARTITION_COLS)
    want = prune_files(adds, "id >= 0", SCHEMA, PARTITION_COLS)
    assert [a["path"] for a in got] == [a["path"] for a in want]


def test_malformed_stats_row_disables_stats_leaves_only():
    """One malformed stats string poisons the whole NDJSON parse — the
    arrow plane must keep every row on stats leaves (fallback valve)
    while partition leaves still vectorize; the authority pass restores
    exactness either way."""
    adds = [
        {"path": "good", "partitionValues": {"p": "1"},
         "stats": json.dumps({"numRecords": 2, "minValues": {"id": 0},
                              "maxValues": {"id": 1}, "nullCount": {"id": 0}}),
         "size": 1},
        {"path": "bad", "partitionValues": {"p": "2"}, "stats": "{oops",
         "size": 1},
    ]
    base = _as_arrow(adds)
    mask = arrow_keep_mask(base, "p = 1 and id > 100", SCHEMA, PARTITION_COLS)
    assert mask is not None
    assert mask.to_pylist() == [True, False]  # partition leaf still prunes
    st = _FileState(base, {}, set())
    got = st.pruned_adds("p = 1 and id > 100", SCHEMA, PARTITION_COLS)
    assert got == prune_files(adds, "p = 1 and id > 100", SCHEMA, PARTITION_COLS)


@pytest.mark.parametrize(
    "cond,keep",
    [
        ("ts >= timestamp'2024-01-10 00:00:00'", [False, True]),
        ("ts < timestamp'2024-01-03 03:00:00'", [True, False]),
        ("d between date'2024-01-11' and date'2024-01-12'", [False, True]),
        ("d = date'2024-01-02'", [True, False]),
    ],
)
def test_temporal_columns_vectorize(cond, keep):
    def st(day_lo, day_hi):
        return json.dumps(
            {
                "numRecords": 3,
                "minValues": {"ts": f"2024-01-{day_lo:02d}T03:00:00.000000",
                              "d": f"2024-01-{day_lo:02d}"},
                "maxValues": {"ts": f"2024-01-{day_hi:02d}T05:00:00.000000",
                              "d": f"2024-01-{day_hi:02d}"},
                "nullCount": {"ts": 0, "d": 0},
            }
        )

    adds = [
        {"path": "early", "partitionValues": {}, "stats": st(1, 3), "size": 1},
        {"path": "late", "partitionValues": {}, "stats": st(10, 12), "size": 1},
    ]
    base = _as_arrow(adds)
    mask = arrow_keep_mask(base, cond, SCHEMA, PARTITION_COLS)
    assert mask is not None and mask.to_pylist() == keep
    # and the python evaluator agrees exactly
    pred = compile_skipping_predicate(cond, SCHEMA, PARTITION_COLS)
    assert [pred(a) for a in adds] == keep


def test_pruned_adds_selectivity_gate():
    """max_survivors (review r13): when the arrow mask keeps more rows
    than the bound — or nothing was vectorizable at all — pruned_adds
    answers None WITHOUT materializing payload dicts, so the planner
    can fall back to the Spark-side tier for unselective conditions."""
    rng = random.Random(99)
    adds = [_rand_add(rng, i) for i in range(30)]
    base = _as_arrow(adds)

    st = _FileState(base, {}, set())
    # unselective: keeps ~everything -> gated out
    assert st.pruned_adds("id >= 0", SCHEMA, PARTITION_COLS, max_survivors=5) is None
    assert st._dict is None
    # nothing vectorizable (unsupported leaf) -> mask None -> gated out
    assert (
        st.pruned_adds("k rlike 'a.*'", SCHEMA, PARTITION_COLS, max_survivors=5)
        is None
    )
    assert st._dict is None
    # selective: survivors under the bound -> normal exact result
    got = st.pruned_adds("id > 1000000", SCHEMA, PARTITION_COLS, max_survivors=5)
    want = prune_files(adds, "id > 1000000", SCHEMA, PARTITION_COLS)
    assert got is not None and [a["path"] for a in got] == [
        a["path"] for a in want
    ]
    # no bound -> never None, whatever the selectivity
    got2 = st.pruned_adds("id >= 0", SCHEMA, PARTITION_COLS)
    assert got2 is not None and len(got2) == len(
        prune_files(adds, "id >= 0", SCHEMA, PARTITION_COLS)
    )

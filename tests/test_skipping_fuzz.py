"""Conservativeness fuzz for the WHOLE data-skipping evaluator against
an independent engine: for randomly generated conditions and files, if
DuckDB finds ANY matching row in a file, ``compile_skipping_predicate``
must keep that file. This is the guard class that catches unsound
proofs wholesale — the AND/OR precedence inversion this round, a wrong
BETWEEN bound, a LIKE range off-by-one — because DuckDB parses SQL with
real precedence and the generator mixes every supported shape.

Deterministic seed; ~room for thousands of (condition, file) pairs in
seconds since evaluation is driver-side python + in-process DuckDB.
"""

import json
import random

import duckdb
from pyspark.sql import types as T

from jodie_spark.tables.pruning import compile_skipping_predicate

SCHEMA = T.StructType(
    [
        T.StructField("p", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("k", T.StringType()),
    ]
)
PARTITION_COLS = ["p"]


def _rand_leaf(rng: random.Random) -> str:
    kind = rng.choice(
        ["cmp_id", "cmp_p", "cmp_k", "between", "in", "not_in", "like",
         "null", "neq"]
    )
    if kind == "cmp_id":
        return f"id {rng.choice(['=', '<', '<=', '>', '>='])} {rng.randrange(0, 40)}"
    if kind == "cmp_p":
        return f"p {rng.choice(['=', '<', '<=', '>', '>='])} {rng.randrange(0, 4)}"
    if kind == "cmp_k":
        return f"k {rng.choice(['=', '<', '>='])} '{rng.choice(['aa', 'ab', 'b', 'zz'])}'"
    if kind == "between":
        lo = rng.randrange(0, 30)
        return f"id between {lo} and {lo + rng.randrange(0, 15)}"
    if kind == "in":
        vals = sorted({rng.randrange(0, 6) for _ in range(rng.randrange(1, 4))})
        return f"p in ({', '.join(map(str, vals))})"
    if kind == "not_in":
        vals = sorted({rng.randrange(0, 6) for _ in range(rng.randrange(1, 4))})
        return f"p not in ({', '.join(map(str, vals))})"
    if kind == "like":
        return f"k like '{rng.choice(['a', 'ab', 'z'])}%'"
    if kind == "null":
        return f"k is {rng.choice(['null', 'not null'])}"
    return f"id != {rng.randrange(0, 40)}"


def _rand_condition(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rng.random() < 0.4:
        return _rand_leaf(rng)
    op = rng.choice([" and ", " or "])
    n = rng.randrange(2, 4)
    parts = []
    for _ in range(n):
        sub = _rand_condition(rng, depth + 1)
        # parenthesize randomly so both grouped and bare precedence
        # shapes are exercised
        parts.append(f"({sub})" if rng.random() < 0.5 else sub)
    return op.join(parts)


def _rand_file(rng: random.Random):
    """(rows, add_action): one partition value, random id/k rows, stats
    computed the way the writer computes them (min/max over non-null,
    nullCount)."""
    pv = rng.choice([None, 0, 1, 2, 3])
    n = rng.randrange(1, 6)
    rows = []
    for _ in range(n):
        idv = None if rng.random() < 0.1 else rng.randrange(0, 40)
        kv = None if rng.random() < 0.15 else rng.choice(
            ["aa", "ab0", "abz", "b", "zz9", "a"]
        )
        rows.append((pv, idv, kv))
    ids = [r[1] for r in rows if r[1] is not None]
    ks = [r[2] for r in rows if r[2] is not None]
    stats = {
        "numRecords": n,
        "minValues": {
            **({"id": min(ids)} if ids else {}),
            **({"k": min(ks)} if ks else {}),
        },
        "maxValues": {
            **({"id": max(ids)} if ids else {}),
            **({"k": max(ks)} if ks else {}),
        },
        "nullCount": {
            "id": sum(1 for r in rows if r[1] is None),
            "k": sum(1 for r in rows if r[2] is None),
        },
    }
    # foreign-writer serialization mutation (ADVICE r10): a PRESENT
    # partition value in a form _coerce cannot parse must behave as
    # "unknown", never as NULL — pruning on it is unsound whenever the
    # file has matching rows. " 3" still parses (int() strips space);
    # the others are genuinely un-coercible and force the keep path.
    ser = None if pv is None else str(pv)
    if pv is not None and rng.random() < 0.2:
        ser = rng.choice([f"{pv}.0", f"{pv}x", f" {pv}", "oddball"])
    add = {
        "path": "f",
        "partitionValues": {"p": ser},
        "stats": json.dumps(stats),
    }
    return rows, add


def test_skipping_never_prunes_a_matching_file():
    """Both evaluators — the per-add Python predicate AND the
    arrow-columnar mask (r13) — checked against DuckDB's row-level
    ground truth on every generated (condition, file) pair: if DuckDB
    finds a matching row, neither may prune the file."""
    import pyarrow as pa

    from jodie_spark.tables.pruning_arrow import arrow_keep_mask

    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("stats", pa.string()),
        ]
    )
    rng = random.Random(20260816)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (p BIGINT, id BIGINT, k VARCHAR)")
    checked = pruned = arrow_masked = arrow_pruned = 0
    for case in range(1500):
        cond = _rand_condition(rng)
        rows, add = _rand_file(rng)
        con.execute("DELETE FROM t")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        try:
            n_match = con.execute(
                f"SELECT count(*) FROM t WHERE {cond}"
            ).fetchone()[0]
        except Exception:
            continue  # grammar produced something DuckDB rejects: skip
        pred = compile_skipping_predicate(cond, SCHEMA, PARTITION_COLS)
        keep = pred(add)
        checked += 1
        pruned += 0 if keep else 1
        assert keep or n_match == 0, (
            f"case {case}: file with {n_match} matching rows PRUNED\n"
            f"condition: {cond}\nrows: {rows}\nadd: {add}"
        )
        base = pa.array(
            [
                {
                    "path": add["path"],
                    "partitionValues": list(add["partitionValues"].items()),
                    "stats": add["stats"],
                }
            ],
            add_t,
        )
        mask = arrow_keep_mask(base, cond, SCHEMA, PARTITION_COLS)
        if mask is not None:
            arrow_masked += 1
            akeep = bool(mask[0].as_py())
            arrow_pruned += 0 if akeep else 1
            # conservativeness vs DuckDB ground truth AND vs Python
            # (the mask may keep extra, never drop more)
            assert akeep or n_match == 0, (
                f"case {case}: arrow mask pruned a file with {n_match} "
                f"matching rows\ncondition: {cond}\nadd: {add}"
            )
            assert akeep or not keep, (
                f"case {case}: arrow mask dropped a file Python keeps\n"
                f"condition: {cond}\nadd: {add}"
            )
    # sanity: both lanes actually exercise pruning, not just keep-all
    assert checked >= 1200 and pruned >= 100, (checked, pruned)
    assert arrow_masked >= checked * 0.5 and arrow_pruned >= 50, (
        arrow_masked, arrow_pruned,
    )


def test_generated_derivation_never_prunes_a_matching_file():
    """Full-stack derivation fuzz: augment a random ts-condition with
    its derived generated-partition conjuncts, then check the COMPILED
    predicate against DuckDB's row-level ground truth on files whose
    day partition value was computed exactly as the generation
    expression computes it. Any unsound implication — a wrong bound, a
    missed wrap-around, a boundary off-by-one — prunes a matching file
    and fails here."""
    import datetime as dt

    from jodie_spark.tables.pruning import augment_with_generated_partitions

    gen_meta = {"delta.generationExpression": "CAST(ts AS DATE)"}
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("day", T.DateType(), metadata=gen_meta),
        ]
    )
    rng = random.Random(816)
    con = duckdb.connect()
    con.execute("CREATE TABLE g (id BIGINT, ts TIMESTAMP, day DATE)")

    def rand_ts():
        return dt.datetime(2024, 1, 1) + dt.timedelta(
            days=rng.randrange(0, 8),
            hours=rng.randrange(0, 24),
            minutes=rng.choice([0, 0, 30]),
        )

    def rand_cond():
        parts = []
        for _ in range(rng.randrange(1, 3)):
            lit = rand_ts()
            # boundary literals (midnight) exercised often — they carry
            # the tight `<` implication
            if rng.random() < 0.4:
                lit = lit.replace(hour=0, minute=0)
            s = lit.strftime("%Y-%m-%d %H:%M:%S")
            if rng.random() < 0.25:
                hi = (lit + dt.timedelta(hours=rng.randrange(1, 72))).strftime(
                    "%Y-%m-%d %H:%M:%S"
                )
                parts.append(f"ts between '{s}' and '{hi}'")
            else:
                parts.append(
                    f"ts {rng.choice(['=', '<', '<=', '>', '>='])} '{s}'"
                )
        return " and ".join(parts)

    checked = pruned = 0
    for case in range(600):
        cond = rand_cond()
        # one file = one day partition, rows within that day
        day = dt.date(2024, 1, 1 + rng.randrange(0, 8))
        rows = []
        for i in range(rng.randrange(1, 5)):
            t = dt.datetime.combine(day, dt.time(rng.randrange(0, 24), rng.choice([0, 30])))
            rows.append((i, t, day))
        tss = [r[1] for r in rows]
        add = {
            "path": "f",
            "partitionValues": {"day": day.isoformat()},
            "stats": json.dumps(
                {
                    "numRecords": len(rows),
                    "minValues": {"ts": min(tss).isoformat()},
                    "maxValues": {"ts": max(tss).isoformat()},
                    "nullCount": {"ts": 0},
                }
            ),
        }
        con.execute("DELETE FROM g")
        con.executemany("INSERT INTO g VALUES (?, ?, ?)", rows)
        n_match = con.execute(f"SELECT count(*) FROM g WHERE {cond}").fetchone()[0]
        aug = augment_with_generated_partitions(cond, schema, ["day"])
        pred = compile_skipping_predicate(aug, schema, ["day"])
        keep = pred(add)
        checked += 1
        pruned += 0 if keep else 1
        assert keep or n_match == 0, (
            f"case {case}: {n_match} matching rows PRUNED\n"
            f"condition: {cond}\naugmented: {aug}\nrows: {rows}"
        )
    assert checked == 600 and pruned >= 100, (checked, pruned)

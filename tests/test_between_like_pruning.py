"""BETWEEN and LIKE-'prefix%' data skipping: both were previously
classified 'other' (keep every file); they now prune via partition
values and min/max stats — and BETWEEN's AND no longer splits the
conjunct apart. All proofs must stay conservative: a file is pruned
only when stats prove no row matches."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jodie_spark.tables.pruning import (
    _prefix_upper,
    classify_conjunct,
    implied_partition_conjuncts,
    prune_files,
    split_conjuncts,
)
from jodie_spark.tables.table import DeltaTable, write_delta

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("k", T.StringType()),
        T.StructField("p", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("day", T.DateType()),
    ]
)
COLS = [f.name for f in SCHEMA.fields]


def test_split_keeps_between_whole():
    assert split_conjuncts("a = 1 and k between 2 and 5 and b = 2") == [
        "a = 1", "k between 2 and 5", "b = 2",
    ]
    assert split_conjuncts("k not between 2 and 5 and b = 2") == [
        "k not between 2 and 5", "b = 2",
    ]
    assert split_conjuncts("k between 2 and 5") == ["k between 2 and 5"]
    # two BETWEENs, each claiming its own AND
    assert split_conjuncts("a between 1 and 2 and b between 3 and 4") == [
        "a between 1 and 2", "b between 3 and 4",
    ]


def test_classify_between_and_like():
    cj = classify_conjunct("id between 2 and 5", COLS)
    assert (cj.kind, cj.column, cj.literal) == ("between", "id", (2, 5))
    # NOT BETWEEN is a disjunction — conservative 'other'
    assert classify_conjunct("id not between 2 and 5", COLS).kind == "other"
    cj = classify_conjunct("k like 'ab%'", COLS)
    assert (cj.kind, cj.column, cj.literal) == ("like_prefix", "k", "ab")
    # wildcard-free LIKE is equality
    cj = classify_conjunct("k like 'abc'", COLS)
    assert (cj.kind, cj.op, cj.literal) == ("equality", "=", "abc")
    # non-prefix patterns keep every file
    assert classify_conjunct("k like '%ab'", COLS).kind == "other"
    assert classify_conjunct("k like 'a_b%'", COLS).kind == "other"
    assert classify_conjunct("k like 'a\\%b%'", COLS).kind == "other"


def test_prefix_upper():
    assert _prefix_upper("ab") == "ac"
    assert _prefix_upper("a\U0010FFFF") == "b"
    assert _prefix_upper("\U0010FFFF") is None
    # surrogate gap is skipped to the next encodable code point
    assert _prefix_upper("퟿") == ""


def _add(path, stats=None, pv=None):
    out = {"path": path, "partitionValues": pv or {}}
    if stats is not None:
        import json

        out["stats"] = json.dumps(stats)
    return out


def test_between_stats_pruning():
    adds = [
        _add("low", {"numRecords": 5, "minValues": {"id": 1}, "maxValues": {"id": 3}}),
        _add("mid", {"numRecords": 5, "minValues": {"id": 4}, "maxValues": {"id": 8}}),
        _add("high", {"numRecords": 5, "minValues": {"id": 20}, "maxValues": {"id": 30}}),
        _add("nostats"),
    ]
    got = {a["path"] for a in prune_files(adds, "id between 5 and 10", SCHEMA, [])}
    assert got == {"mid", "nostats"}


def test_between_partition_pruning():
    adds = [
        _add("p0", pv={"p": "0"}),
        _add("p5", pv={"p": "5"}),
        _add("p9", pv={"p": "9"}),
        _add("pnull", pv={"p": None}),
    ]
    got = {a["path"] for a in prune_files(adds, "p between 4 and 6", SCHEMA, ["p"])}
    assert got == {"p5"}


def test_like_prefix_pruning():
    adds = [
        _add("aa", {"numRecords": 5, "minValues": {"k": "aaa"}, "maxValues": {"k": "aaz"}}),
        _add("ab", {"numRecords": 5, "minValues": {"k": "ab"}, "maxValues": {"k": "abz"}}),
        _add("zz", {"numRecords": 5, "minValues": {"k": "za"}, "maxValues": {"k": "zz"}}),
        _add("span", {"numRecords": 5, "minValues": {"k": "a"}, "maxValues": {"k": "z"}}),
        _add("nostats"),
    ]
    got = {a["path"] for a in prune_files(adds, "k like 'ab%'", SCHEMA, [])}
    assert got == {"ab", "span", "nostats"}
    # partition-valued
    padds = [
        _add("x", pv={"k": "abc"}),
        _add("y", pv={"k": "acc"}),
        _add("n", pv={"k": None}),
    ]
    got = {a["path"] for a in prune_files(padds, "k like 'ab%'", SCHEMA, ["k"])}
    assert got == {"x"}


def test_between_feeds_generated_derivation():
    gen = {"day": "CAST(ts AS DATE)"}
    assert implied_partition_conjuncts(
        "ts between '2024-01-02 05:00:00' and '2024-01-04 05:00:00'",
        SCHEMA, ["day"], gen,
    ) == ["day >= '2024-01-02'", "day <= '2024-01-04'"]


@pytest.fixture()
def string_table(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "strtab")
    df = spark.createDataFrame(
        [(i, f"{pre}{i:03d}") for i, pre in enumerate(["ab", "ac", "zz"] * 10)],
        ["id", "k"],
    )
    write_delta(df.repartition(6, "k"), p)
    return p


def test_delta_file_stats_spark_side_like(spark, string_table):
    """The Spark-side files-DF filter (big-log path) applies the same
    LIKE/BETWEEN proofs."""
    from jodie_spark.tables.distribution import delta_file_stats

    total = delta_file_stats(spark, string_table).count()
    liked = delta_file_stats(spark, string_table, "k like 'ab%'").count()
    assert 0 < liked <= total
    # correctness anchor: every file containing an 'ab' row survives
    t = DeltaTable.forPath(spark, string_table)
    want = t.toDF().filter("k like 'ab%'").count()
    assert want == 10  # fixture sanity
    # and DML through the same planner stays correct
    t.delete("k like 'ab%' and id between 0 and 8")
    got = sorted(r["id"] for r in t.toDF().collect())
    assert got == sorted(i for i in range(30) if not (i % 3 == 0 and 0 <= i <= 8))


# ---------------------------------------------------------------------------
# OR-tree skipping (delta DataSkippingReader parity): a file survives a
# disjunction only if SOME branch may match it
# ---------------------------------------------------------------------------

_OR_ADDS = [
    _add("p0", {"numRecords": 5, "minValues": {"id": 0}, "maxValues": {"id": 9}},
         pv={"p": "0"}),
    _add("p1", {"numRecords": 5, "minValues": {"id": 10}, "maxValues": {"id": 19}},
         pv={"p": "1"}),
    _add("p2", {"numRecords": 5, "minValues": {"id": 20}, "maxValues": {"id": 29}},
         pv={"p": "2"}),
    _add("p3", {"numRecords": 5, "minValues": {"id": 30}, "maxValues": {"id": 39}},
         pv={"p": "3"}),
]


def _or_prune(cond):
    return {a["path"] for a in prune_files(_OR_ADDS, cond, SCHEMA, ["p"])}


def test_or_partition_pruning():
    assert _or_prune("p = 1 or p = 3") == {"p1", "p3"}
    assert _or_prune("(p = 1 or p = 3)") == {"p1", "p3"}


def test_or_mixed_stats_and_partition():
    assert _or_prune("p = 0 or id >= 35") == {"p0", "p3"}


def test_or_nested_conjunctions():
    got = _or_prune("(p = 0 and id >= 5) or (p = 2 and id <= 25)")
    assert got == {"p0", "p2"}
    # outer AND composes with the inner OR
    got = _or_prune("id <= 25 and (p = 0 or p = 2)")
    assert got == {"p0", "p2"}


def test_or_conservative_branch_keeps_file():
    # one branch unprovable → every file could match that branch
    assert _or_prune("p = 1 or some_fn(id) = 3") == {"p0", "p1", "p2", "p3"}


def test_or_between_branch():
    assert _or_prune("id between 12 and 18 or p = 3") == {"p1", "p3"}


def test_or_spark_side(spark, tmpdir_path):
    from jodie_spark.tables.distribution import delta_file_stats

    p = os.path.join(tmpdir_path, "ortab")
    df = spark.createDataFrame([(i, i % 4) for i in range(40)], ["id", "p"])
    write_delta(df.repartition("p"), p, partition_by=["p"])
    n = delta_file_stats(spark, p, "p = 1 or p = 3").count()
    n_all = delta_file_stats(spark, p).count()
    assert 0 < n < n_all
    paths = [r["path"] for r in delta_file_stats(spark, p, "p = 1 or p = 3").collect()]
    assert all("p=1" in x or "p=3" in x for x in paths)


# ---------------------------------------------------------------------------
# != / NOT IN pruning: single-valued files and NULL partitions are
# provably non-matching (NULL != x is NULL, never true)
# ---------------------------------------------------------------------------

def test_not_equality_partition_pruning():
    adds = [
        _add("p0", pv={"p": "0"}),
        _add("p1", pv={"p": "1"}),
        _add("pnull", pv={"p": None}),
    ]
    got = {a["path"] for a in prune_files(adds, "p != 1", SCHEMA, ["p"])}
    assert got == {"p0"}
    got = {a["path"] for a in prune_files(adds, "p <> 1", SCHEMA, ["p"])}
    assert got == {"p0"}


def test_not_in_partition_pruning():
    adds = [
        _add("p0", pv={"p": "0"}),
        _add("p1", pv={"p": "1"}),
        _add("p2", pv={"p": "2"}),
        _add("pnull", pv={"p": None}),
    ]
    got = {a["path"] for a in prune_files(adds, "p not in (1, 2)", SCHEMA, ["p"])}
    assert got == {"p0"}


def test_not_equality_stats_pruning():
    adds = [
        # single-valued file on the excluded literal → prune
        _add("only7", {"numRecords": 5, "minValues": {"id": 7}, "maxValues": {"id": 7},
                       "nullCount": {"id": 0}}),
        # single-valued + some NULLs: NULLs never match != either → prune
        _add("only7n", {"numRecords": 5, "minValues": {"id": 7}, "maxValues": {"id": 7},
                        "nullCount": {"id": 2}}),
        # all-NULL file → prune
        _add("allnull", {"numRecords": 4, "minValues": {}, "maxValues": {},
                         "nullCount": {"id": 4}}),
        # range spans other values → keep
        _add("span", {"numRecords": 5, "minValues": {"id": 1}, "maxValues": {"id": 9},
                      "nullCount": {"id": 0}}),
        _add("nostats"),
    ]
    got = {a["path"] for a in prune_files(adds, "id != 7", SCHEMA, [])}
    assert got == {"span", "nostats"}


def test_not_in_with_null_member_keeps_all():
    adds = [_add("p0", pv={"p": "0"}), _add("p1", pv={"p": "1"})]
    got = {a["path"] for a in prune_files(adds, "p not in (1, null)", SCHEMA, ["p"])}
    assert got == {"p0", "p1"}  # degenerate case left to the row filter


def test_not_ops_spark_side(spark, tmpdir_path):
    from jodie_spark.tables.distribution import delta_file_stats

    p = os.path.join(tmpdir_path, "nottab")
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], ["id", "p"])
    write_delta(df.repartition("p"), p, partition_by=["p"])
    paths = [r["path"] for r in delta_file_stats(spark, p, "p != 1").collect()]
    assert paths and all("p=1" not in x for x in paths)
    paths = [r["path"] for r in delta_file_stats(spark, p, "p not in (0, 2)").collect()]
    assert paths and all("p=1" in x for x in paths)
    # DML correctness through the same planner
    t = DeltaTable.forPath(spark, p)
    t.delete("p != 1 and id < 10")
    got = sorted(r["id"] for r in t.toDF().collect())
    assert got == sorted(i for i in range(30) if not (i % 3 != 1 and i < 10))


# ---------------------------------------------------------------------------
# SQL precedence: AND binds tighter than OR — "x and y or z" is
# (x AND y) OR z, one disjunctive conjunct. Review-confirmed corruption
# repros pinned here.
# ---------------------------------------------------------------------------

def test_precedence_mixed_and_or():
    assert split_conjuncts("a = 1 or b = 2 and c = 3") == [
        "a = 1 or b = 2 and c = 3"
    ]
    # file with a=1, c=7 matches via the a=1 branch — must be KEPT
    adds = [
        _add("m", pv={"p": "1", "k": "7"}),
    ]
    sch = T.StructType(
        [T.StructField("p", T.LongType()), T.StructField("q", T.LongType()),
         T.StructField("k", T.LongType())]
    )
    got = {a["path"] for a in prune_files(adds, "p = 1 or q = 2 and k = 3", sch, ["p", "k"])}
    assert got == {"m"}
    # and the OR branches still prune what NEITHER branch can match
    adds2 = [_add("x", pv={"p": "9", "k": "9"})]
    got = {a["path"] for a in prune_files(adds2, "p = 1 or q = 2 and k = 3", sch, ["p", "k"])}
    assert got == set()


def test_precedence_blocks_generated_derivation():
    """'id = 5 or flag = true and ts >= X' has NO top-level ts conjunct
    — deriving day >= X would silently exclude pre-X rows matching via
    id = 5 (review-confirmed repro)."""
    sch = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("flag", T.BooleanType()),
         T.StructField("ts", T.TimestampType()), T.StructField("day", T.DateType())]
    )
    got = implied_partition_conjuncts(
        "id = 5 or flag = true and ts >= '2024-06-01 00:00:00'",
        sch, ["day"], {"day": "CAST(ts AS DATE)"},
    )
    assert got == []
    # parenthesized OR inside a true conjunction: the ts conjunct IS
    # top-level, derivation applies
    got = implied_partition_conjuncts(
        "(id = 5 or flag = true) and ts >= '2024-06-01 00:00:00'",
        sch, ["day"], {"day": "CAST(ts AS DATE)"},
    )
    assert got == ["day >= '2024-06-01'"]


def test_tz_offset_literal_derivation():
    gen = {"day": "CAST(ts AS DATE)"}
    # a NON-UTC offset can shift across a partition boundary — bail
    assert implied_partition_conjuncts(
        "ts <= '2024-06-02T01:00:00+03:00'", SCHEMA, ["day"], gen
    ) == []
    # a ZERO offset is exactly session wall time (sessions pinned UTC):
    # derive — this is the shape Spark 4.1 pushes for TimestampType
    assert implied_partition_conjuncts(
        "ts <= '2024-06-02T01:00:00Z'", SCHEMA, ["day"], gen
    ) == ["day <= '2024-06-02'"]
    assert implied_partition_conjuncts(
        "ts >= '2024-06-02 01:00:00+00:00'", SCHEMA, ["day"], gen
    ) == ["day >= '2024-06-02'"]


def test_precedence_spark_side(spark, tmpdir_path):
    from jodie_spark.tables.distribution import delta_file_stats

    p = os.path.join(tmpdir_path, "prectab")
    df = spark.createDataFrame([(i, i % 4, i % 2) for i in range(40)], ["id", "p", "k"])
    write_delta(df.repartition("p"), p, partition_by=["p"])
    # p = 1 OR (p = 2 AND k = 0): files of p=1 must survive
    paths = [
        r["path"]
        for r in delta_file_stats(spark, p, "p = 1 or p = 2 and k = 0").collect()
    ]
    assert any("p=1" in x for x in paths)
    assert all("p=1" in x or "p=2" in x for x in paths)

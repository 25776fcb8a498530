"""Generated-partition derivation (delta OptimizeGeneratedColumn
parity): predicates on the BASE column of a monotonic generation
expression imply partition conjuncts, so DML planning prunes
time-partitioned tables from timestamp predicates alone — and the
derivation must be implied-only (a wrong implication would make DML
skip files containing matching rows, i.e. corrupt data)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jodie_spark.tables.pruning import implied_partition_conjuncts
from jodie_spark.tables.table import DeltaTable, write_delta

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("day", T.DateType()),
        T.StructField("yr", T.IntegerType()),
        T.StructField("k", T.StringType()),
        T.StructField("pfx", T.StringType()),
    ]
)


def _implied(condition, generated, parts):
    return implied_partition_conjuncts(condition, SCHEMA, parts, generated)


def test_cast_date_shapes():
    gen = {"day": "CAST(ts AS DATE)"}
    assert _implied("ts >= '2024-01-02 03:00:00'", gen, ["day"]) == [
        "day >= '2024-01-02'"
    ]
    # strict > still implies only >= on the truncation
    assert _implied("ts > '2024-01-02 03:00:00'", gen, ["day"]) == [
        "day >= '2024-01-02'"
    ]
    # boundary literal: everything strictly before midnight truncates
    # strictly below — tight implication
    assert _implied("ts < '2024-01-05 00:00:00'", gen, ["day"]) == [
        "day < '2024-01-05'"
    ]
    # mid-day literal: rows earlier the same day still match → <=
    assert _implied("ts < '2024-01-05 08:00:00'", gen, ["day"]) == [
        "day <= '2024-01-05'"
    ]
    # <= at a boundary must stay <= (ts == midnight is a day-5 row)
    assert _implied("ts <= '2024-01-05 00:00:00'", gen, ["day"]) == [
        "day <= '2024-01-05'"
    ]
    assert _implied("ts = '2024-01-02 03:00:00'", gen, ["day"]) == [
        "day = '2024-01-02'"
    ]


def test_date_trunc_year_prefix_shapes():
    assert _implied(
        "ts >= '2024-03-15 07:30:00'", {"day": "date_trunc('MONTH', ts)"}, ["day"]
    ) == ["day >= '2024-03-01 00:00:00'"]
    assert _implied("ts >= '2024-03-15 07:30:00'", {"yr": "year(ts)"}, ["yr"]) == [
        "yr >= 2024"
    ]
    assert _implied(
        "k >= 'abcdef'", {"pfx": "substring(k, 1, 3)"}, ["pfx"]
    ) == ["pfx >= 'abc'"]
    assert _implied(
        "k in ('abcdef', 'xyz')", {"pfx": "substr(k, 1, 3)"}, ["pfx"]
    ) == ["pfx in ('abc', 'xyz')"]


def test_conservative_bails():
    gen = {"day": "CAST(ts AS DATE)"}
    # unrecognized generation expression → nothing
    assert _implied("ts >= '2024-01-02'", {"day": "weird(ts)"}, ["day"]) == []
    # predicate on another column → nothing
    assert _implied("id >= 5", gen, ["day"]) == []
    # generated column not a partition column → nothing
    assert _implied("ts >= '2024-01-02'", gen, []) == []
    # unparseable literal → nothing
    assert _implied("ts >= id", gen, ["day"]) == []
    # != is not an implication we emit
    assert _implied("ts != '2024-01-02'", gen, ["day"]) == []
    # prefix transform on a quoted-quote literal bails
    assert _implied("k = 'a''b'", {"pfx": "substr(k, 1, 2)"}, ["pfx"]) == []
    # date shapes require a temporal base column: k is a string
    assert _implied("k >= '2024-01-02'", {"day": "CAST(k AS DATE)"}, ["day"]) == []


@pytest.fixture()
def ts_table(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "tsgen")
    df = spark.createDataFrame(
        [
            (i, f"2024-01-{1 + i % 3:02d} {i % 24:02d}:00:00")
            for i in range(30)
        ],
        ["id", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    write_delta(
        df.repartition("ts"),
        p,
        partition_by=["day"],
        generated_columns={"day": "cast(ts as date)"},
    )
    return p


def test_planning_condition_confines_candidates(spark, ts_table):
    """The derivation must reach the FILE PLANNER: with only a ts
    predicate, the candidate set (the files DML will scan) excludes
    other days' files — that is the actual 100 TB win, not just which
    files get rewritten."""
    from jodie_spark.tables.table import plan_candidate_files

    t = DeltaTable.forPath(spark, ts_table)
    snap = t.deltaLog.table_info()
    cond = t._planning_condition(
        snap, "ts >= '2024-01-02 00:00:00' AND ts < '2024-01-03 00:00:00'"
    )
    assert "day >= '2024-01-02'" in cond and "day < '2024-01-03'" in cond
    cands = plan_candidate_files(
        spark, ts_table, cond, t.schema(snap), snap.partition_columns
    )
    assert cands, "candidate set must not be empty"
    assert all("day=2024-01-02" in c["path"] for c in cands), [
        c["path"] for c in cands
    ]


def test_delete_on_base_column_prunes_partitions(spark, ts_table):
    """DELETE with only a ts predicate must rewrite/remove files in the
    matching day partition only — other partitions' files survive
    byte-identical."""
    t = DeltaTable.forPath(spark, ts_table)
    before = {
        a["path"]
        for a in t.snapshot().add_files()
        if "day=2024-01-02" not in a["path"]
    }
    t.delete("ts >= '2024-01-02 00:00:00' AND ts < '2024-01-03 00:00:00'")
    after_all = {a["path"] for a in t.snapshot().add_files()}
    assert before <= after_all  # other-day files untouched
    # correctness: exactly the day-2 rows are gone
    got = sorted(r["id"] for r in t.toDF().collect())
    assert got == sorted(i for i in range(30) if i % 3 != 1)
    # metrics prove pruning: only the matching partition's files removed
    hist = t.history(1).collect()[0]
    assert int(hist["operationMetrics"]["numRemovedFiles"]) >= 1
    removed_all = before - after_all
    assert removed_all == set()


def test_update_on_base_column_correct_and_pruned(spark, ts_table):
    t = DeltaTable.forPath(spark, ts_table)
    other = {
        a["path"]
        for a in t.snapshot().add_files()
        if "day=2024-01-03" not in a["path"]
    }
    t.update("ts >= '2024-01-03 00:00:00'", {"id": "id + 1000"})
    after = {a["path"] for a in t.snapshot().add_files()}
    assert other <= after
    got = sorted(r["id"] for r in t.toDF().collect())
    expected = sorted(
        i + 1000 if i % 3 == 2 else i for i in range(30)
    )
    assert got == expected


def test_derived_conjunct_never_drops_matches(spark, ts_table):
    """Boundary literal mid-partition: the implication uses >= on the
    truncated value, so boundary rows in the same partition still
    match."""
    t = DeltaTable.forPath(spark, ts_table)
    n_before = t.toDF().count()
    # ts > '2024-01-02 05:00:00': day-2 rows later than 05:00 must go,
    # earlier day-2 rows must stay
    t.delete("ts > '2024-01-02 05:00:00' AND ts < '2024-01-03 00:00:00'")
    kept_day2 = [
        r["id"]
        for r in t.toDF().filter("day = '2024-01-02'").collect()
    ]
    expect_day2 = [i for i in range(30) if i % 3 == 1 and (i % 24) <= 5]
    assert sorted(kept_day2) == sorted(expect_day2)
    assert t.toDF().count() == n_before - len(
        [i for i in range(30) if i % 3 == 1 and (i % 24) > 5]
    )


def test_implication_soundness_property():
    """Property: for every emitted implied conjunct, ANY base value
    satisfying the original predicate has a transformed value
    satisfying the implied one — the guarantee that makes the derived
    pruning safe. Randomized over literals, ops, and transforms."""
    import datetime as dt
    import random

    from jodie_spark.tables.pruning import (
        _parse_generation,
        classify_conjunct,
    )

    rng = random.Random(42)
    ops = ["=", ">", ">=", "<", "<="]
    gens = {
        "day": "CAST(ts AS DATE)",
        "mon": "date_trunc('MONTH', ts)",
        "hr": "date_trunc('HOUR', ts)",
        "yr": "year(ts)",
    }

    def truncate(name, t):
        if name == "day":
            return t.date()
        if name == "mon":
            return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        if name == "hr":
            return t.replace(minute=0, second=0, microsecond=0)
        return t.year

    def rand_ts():
        base = dt.datetime(2023, 1, 1)
        return base + dt.timedelta(
            days=rng.randrange(0, 800),
            hours=rng.randrange(0, 24),
            minutes=rng.choice([0, 0, 0, 17, 59]),
            seconds=rng.choice([0, 0, 31]),
        )

    cmp_fns = {
        "=": lambda a, b: a == b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
    }

    for _ in range(500):
        part = rng.choice(list(gens))
        lit = rand_ts()
        op = rng.choice(ops)
        cond = f"ts {op} '{lit.strftime('%Y-%m-%d %H:%M:%S')}'"
        implied = implied_partition_conjuncts(
            cond, SCHEMA, [part], {part: gens[part]}
        )
        if not implied:
            continue
        cj = classify_conjunct(implied[0], [part])
        assert cj.column == part and cj.op in cmp_fns, implied
        # re-parse the emitted RHS the way the evaluator would
        if part == "yr":
            implied_rhs = int(cj.literal)
        elif part == "day":
            implied_rhs = dt.date.fromisoformat(cj.literal)
        else:
            implied_rhs = dt.datetime.fromisoformat(cj.literal)
        # 200 random base values; matching ones must satisfy the implication
        for _ in range(200):
            row_ts = rand_ts()
            if cmp_fns[op](row_ts, lit):
                assert cmp_fns[cj.op](truncate(part, row_ts), implied_rhs), (
                    cond, implied, row_ts
                )


def test_null_checks_map_through_generation():
    gen = {"day": "CAST(ts AS DATE)"}
    assert _implied("ts is null", gen, ["day"]) == ["day is null"]
    assert _implied("ts is not null", gen, ["day"]) == ["day is not null"]


def test_datasource_read_prunes_via_generation(spark, ts_table):
    """The jodie_delta batch reader derives partition filters from
    pushed base-column predicates too: a timestamp range plans only the
    matching day partition's files."""
    import datetime as dt

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from jodie_spark.sources.datasource import JodieDeltaBatchReader, register

    register(spark)
    got = (
        spark.read.format("jodie_delta")
        .load(ts_table)
        .filter("ts >= '2024-01-02 00:00:00' AND ts < '2024-01-03 00:00:00'")
    )
    assert sorted(r["id"] for r in got.collect()) == sorted(
        i for i in range(30) if i % 3 == 1
    )
    # Spark 4.1 delivers TimestampType filter values TZ-AWARE (session
    # zone) — the translation must engage on exactly that shape
    r = JodieDeltaBatchReader({"path": ts_table}, got.schema)
    utc = dt.timezone.utc
    r.pushFilters(
        [
            GreaterThanOrEqual(("ts",), dt.datetime(2024, 1, 2, tzinfo=utc)),
            LessThan(("ts",), dt.datetime(2024, 1, 3, tzinfo=utc)),
        ]
    )
    assert r._condition and "ts >=" in r._condition
    parts = list(r.partitions())
    assert parts and all("day=2024-01-02" in x.file_path for x in parts)
    # a NAIVE value on a TimestampType column is wall-time-ambiguous
    # against UTC stats — it must be skipped, not mistranslated
    r2 = JodieDeltaBatchReader({"path": ts_table}, got.schema)
    r2.pushFilters([GreaterThanOrEqual(("ts",), dt.datetime(2024, 1, 2))])
    assert r2._condition is None
    # and the REAL pushdown path engages end-to-end: Spark's own filter
    # delivery (tz-aware datetimes, separate planning worker) must plan
    # FEWER input partitions than the unfiltered read
    base = spark.read.format("jodie_delta").load(ts_table)
    assert got.rdd.getNumPartitions() < base.rdd.getNumPartitions()


def test_extended_generation_shapes():
    # date_format: monotonic string ordering → full range ops
    assert _implied(
        "ts >= '2024-03-15 07:30:00'", {"day": "date_format(ts, 'yyyy-MM')"}, ["day"]
    ) == ["day >= '2024-03'"]
    # boundary tightening applies to formats too
    assert _implied(
        "ts < '2024-03-01 00:00:00'", {"day": "date_format(ts, 'yyyy-MM')"}, ["day"]
    ) == ["day < '2024-03'"]
    # trunc() returns DATE
    assert _implied(
        "ts >= '2024-03-15 07:30:00'", {"day": "trunc(ts, 'month')"}, ["day"]
    ) == ["day >= '2024-03-01'"]
    # month()/hour(): equality and IN only — ranges wrap and derive nothing
    assert _implied(
        "ts = '2024-03-15 07:30:00'", {"yr": "month(ts)"}, ["yr"]
    ) == ["yr = 3"]
    assert _implied(
        "ts >= '2024-03-15 07:30:00'", {"yr": "month(ts)"}, ["yr"]
    ) == []
    assert _implied(
        "ts between '2024-03-01 00:00:00' and '2024-04-01 00:00:00'",
        {"yr": "hour(ts)"}, ["yr"],
    ) == []
    # CASE-VARIANT format patterns are different Java semantics
    # ('mm' = minutes, 'DD' = day-of-year): must not match, never crash
    assert _implied(
        "ts >= '2024-03-15 07:30:00'", {"day": "date_format(ts, 'YYYY-MM')"}, ["day"]
    ) == []
    assert _implied(
        "ts >= '2024-03-15 07:30:00'", {"day": "date_format(ts, 'yyyy-mm-dd')"}, ["day"]
    ) == []
    # years outside 1000-9999 break %Y zero padding — derive nothing
    assert _implied(
        "ts >= '0999-03-15 00:00:00'", {"day": "date_format(ts, 'yyyy-MM')"}, ["day"]
    ) == []
    assert _implied(
        "ts >= '0999-03-15 00:00:00'", {"day": "CAST(ts AS DATE)"}, ["day"]
    ) == []


def test_extended_shapes_soundness_property():
    """Same randomized soundness sweep as the core property, over the
    newly supported transforms."""
    import datetime as dt
    import random

    rng = random.Random(77)
    gens = {
        "k": ("date_format(ts, 'yyyy-MM-dd')", lambda t: t.strftime("%Y-%m-%d")),
        "day": ("trunc(ts, 'month')", lambda t: t.date().replace(day=1)),
        "yr": ("month(ts)", lambda t: t.month),
    }
    cmp_fns = {
        "=": lambda a, b: a == b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
    }
    from jodie_spark.tables.pruning import classify_conjunct

    def rand_ts():
        return dt.datetime(2023, 1, 1) + dt.timedelta(
            days=rng.randrange(0, 800), hours=rng.randrange(0, 24),
            minutes=rng.choice([0, 0, 17, 59]),
        )

    for _ in range(400):
        part = rng.choice(list(gens))
        expr, f = gens[part]
        lit = rand_ts()
        op = rng.choice(list(cmp_fns))
        cond = f"ts {op} '{lit.strftime('%Y-%m-%d %H:%M:%S')}'"
        implied = implied_partition_conjuncts(cond, SCHEMA, [part], {part: expr})
        if not implied:
            continue
        cj = classify_conjunct(implied[0], [part])
        assert cj.column == part and cj.op in cmp_fns, implied
        if part == "yr":
            rhs = int(cj.literal)
        elif part == "day":
            rhs = dt.date.fromisoformat(cj.literal)
        else:
            rhs = cj.literal
        for _ in range(150):
            row = rand_ts()
            if cmp_fns[op](row, lit):
                assert cmp_fns[cj.op](f(row), rhs), (cond, implied, row)

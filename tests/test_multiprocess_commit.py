"""Cross-PROCESS commit races (VERDICT r3 task 6): the in-process
conflict tests exercise the retry loop, but the atomicity claim is
``open(path, 'x')`` on a shared filesystem — these tests race two real
processes against the same _delta_log.

Children never start Spark: ``DeltaLog.commit`` is driver-side file
I/O, so the race is pure protocol. A Barrier maximizes the collision
window; results come back through a Queue.
"""

import json
import multiprocessing as mp
import os

import pytest

from jodie_spark.tables.table import write_delta

_CTX = mp.get_context("spawn")  # no inherited JVM sockets in children


def _mk_add(name: str, n_records: int = 5) -> dict:
    return {
        "add": {
            "path": name,
            "partitionValues": {},
            "size": 100,
            "modificationTime": 0,
            "dataChange": True,
            "stats": json.dumps({"numRecords": n_records}),
        }
    }


def _race_commit(path, read_version, actions, barrier, q, tag, max_retries):
    # runs in a child process
    from jodie_spark.errors import ConcurrentModificationException
    from jodie_spark.tables.log import DeltaLog

    log = DeltaLog(path)
    barrier.wait(timeout=30)
    try:
        v = log.commit(
            read_version,
            actions,
            "WRITE",
            {"mode": "Append"},
            {},
            max_retries=max_retries,
        )
        q.put((tag, "ok", v))
    except ConcurrentModificationException as e:
        q.put((tag, "conflict", str(e)))
    except Exception as e:  # pragma: no cover - diagnostic
        q.put((tag, f"error:{type(e).__name__}", str(e)))


def _run_pair(path, read_version, actions_a, actions_b, max_retries=3):
    barrier = _CTX.Barrier(2)
    q = _CTX.Queue()
    ps = [
        _CTX.Process(
            target=_race_commit,
            args=(path, read_version, acts, barrier, q, tag, max_retries),
        )
        for tag, acts in (("a", actions_a), ("b", actions_b))
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=120)
    results = {}
    while not q.empty():
        tag, status, detail = q.get()
        results[tag] = (status, detail)
    assert len(results) == 2, results
    return results


@pytest.fixture()
def plain_table(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "race_plain")
    write_delta(spark.range(4).selectExpr("id", "id as v").coalesce(1), p)
    return p


def test_disjoint_appends_both_commit(plain_table):
    from jodie_spark.tables.log import DeltaLog

    log = DeltaLog(plain_table)
    v0 = log.latest_version()
    results = _run_pair(
        plain_table, v0, [_mk_add("race_a.parquet")], [_mk_add("race_b.parquet")]
    )
    assert {s for s, _ in results.values()} == {"ok"}, results
    versions = sorted(v for _, v in results.values())
    assert versions == [v0 + 1, v0 + 2]
    paths = {a["path"] for a in DeltaLog(plain_table).snapshot().add_files()}
    assert {"race_a.parquet", "race_b.parquet"} <= paths


def test_overlapping_remove_one_loses(plain_table):
    from jodie_spark.tables.log import DeltaLog

    log = DeltaLog(plain_table)
    v0 = log.latest_version()
    victim = DeltaLog(plain_table).snapshot().add_files()[0]["path"]
    rm = {
        "remove": {
            "path": victim,
            "deletionTimestamp": 1,
            "dataChange": True,
            "partitionValues": {},
        }
    }
    results = _run_pair(
        plain_table,
        v0,
        [rm, _mk_add("rw_a.parquet")],
        [rm, _mk_add("rw_b.parquet")],
    )
    statuses = sorted(s for s, _ in results.values())
    assert statuses == ["conflict", "ok"], results
    # the table is consistent: victim removed exactly once, the
    # winner's rewrite present, the loser's absent
    paths = {a["path"] for a in DeltaLog(plain_table).snapshot().add_files()}
    assert victim not in paths
    assert len(paths & {"rw_a.parquet", "rw_b.parquet"}) == 1


def test_row_id_watermarks_never_collide(spark, tmpdir_path):
    """Two processes allocating row-id blocks race on the
    delta.rowTracking domainMetadata — exactly one may win; the loser
    must conflict rather than silently reuse the stale watermark."""
    from jodie_spark.tables.log import ROW_TRACKING_DOMAIN, DeltaLog

    p = os.path.join(tmpdir_path, "race_rt")
    write_delta(
        spark.range(6).selectExpr("id", "id as v").coalesce(1),
        p,
        options={"delta.enableRowTracking": "true"},
    )
    log = DeltaLog(p)
    v0 = log.latest_version()
    results = _run_pair(
        p,
        v0,
        [_mk_add("rt_a.parquet", n_records=7)],
        [_mk_add("rt_b.parquet", n_records=11)],
    )
    statuses = sorted(s for s, _ in results.values())
    assert statuses == ["conflict", "ok"], results
    # winner's block starts exactly at the old watermark + 1 and the
    # new watermark covers its records — no overlap, no gap reuse
    log2 = DeltaLog(p)
    snap = log2.snapshot()
    dm = snap.domain_metadata[ROW_TRACKING_DOMAIN]
    hwm = int(json.loads(dm["configuration"])["rowIdHighWaterMark"])
    winner_adds = [
        a for a in snap.add_files() if a["path"].startswith("rt_")
    ]
    assert len(winner_adds) == 1
    a = winner_adds[0]
    n = int(json.loads(a["stats"])["numRecords"])
    assert a["baseRowId"] == 6  # previous watermark was 5 (6 initial rows)
    assert hwm == a["baseRowId"] + n - 1

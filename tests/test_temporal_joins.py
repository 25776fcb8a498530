"""as-of join, range join, and stateful streaming sessionization."""

import datetime
import os

from jodie_spark.operators.temporal_joins import as_of_join, range_join


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_as_of_join_basic(spark):
    trades = spark.createDataFrame(
        [(1, _ts(10, 5), 100.0), (1, _ts(10, 30), 101.0), (2, _ts(10, 10), 50.0)],
        "sym int, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [(1, _ts(10, 0), 99.0), (1, _ts(10, 20), 100.5), (2, _ts(10, 20), 49.0)],
        "sym int, ts timestamp, bid double",
    )
    out = as_of_join(trades, quotes, "sym", "ts")
    got = {(r["sym"], r["price"]): r["right_bid"] for r in out.collect()}
    assert got == {
        (1, 100.0): 99.0,   # 10:05 sees the 10:00 quote
        (1, 101.0): 100.5,  # 10:30 sees the 10:20 quote
        (2, 50.0): None,    # 10:10 has no quote yet
    }


def test_as_of_join_equal_ts_and_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(12), "x")], "k int, ts timestamp, v string")
    right = spark.createDataFrame([(1, _ts(12), 7.0), (1, _ts(9), 5.0)],
                                  "k int, ts timestamp, w double")
    same = as_of_join(left, right, "k", "ts").collect()[0]
    assert same["right_w"] == 7.0  # equal timestamps match
    tight = as_of_join(
        left, right.filter("w = 5.0"), "k", "ts", tolerance="1 hour"
    ).collect()[0]
    assert tight["right_w"] is None  # 9:00 is staler than the 1h tolerance


def test_range_join(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 95.0)], "id int, value double"
    )
    ranges = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 30.0, "mid"), (30.0, 90.0, "high")],
        "lo double, hi double, label string",
    )
    out = range_join(points, ranges, "value", bucket_width=10.0)
    got = {r["id"]: r["label"] for r in out.collect()}
    assert got == {1: "low", 2: "mid", 3: "mid"}  # 95.0 matches nothing
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_range_join_left_outer(spark):
    import pytest

    points = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (4, 95.0)], "id int, value double"
    )
    ranges = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 30.0, "mid")],
        "lo double, hi double, label string",
    )
    out = range_join(points, ranges, "value", bucket_width=10.0, how="left")
    got = {r["id"]: (r["label"], r["lo"]) for r in out.collect()}
    # unmatched point 4 survives with null interval columns
    assert got == {1: ("low", 0.0), 2: ("mid", 10.0), 4: (None, None)}
    with pytest.raises(ValueError, match="inner.*or.*left"):
        range_join(points, ranges, "value", how="full")


def test_streaming_sessionize_stateful(spark, tmpdir_path):
    from jodie_spark.streaming.stateful import streaming_sessionize

    # Spark 4.1 checksum checkpoint manager deadlocks on local-fs state
    # commits for applyInPandasWithState — use the plain file manager
    spark.conf.set(
        "spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing."
        "FileSystemBasedCheckpointFileManager",
    )
    src_dir = os.path.join(tmpdir_path, "src")
    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, t0, 100),
        (2, t0 + datetime.timedelta(minutes=10), 100),
        (3, t0 + datetime.timedelta(minutes=90), 100),  # gap > 30min → new session
        (4, t0, 200),
    ]
    schema = "event_id long, ts timestamp, user_id long"
    spark.createDataFrame(rows, schema).write.parquet(src_dir)

    stream = spark.readStream.schema(schema).parquet(src_dir)
    sessions = streaming_sessionize(stream, gap_minutes=30)
    assert sessions.isStreaming
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir_path, "_ckpt"))
        .start()
    )
    try:
        # poll rather than processAllAvailable(): pending processing-time
        # state timeouts keep the stream from ever reporting fully idle
        import time

        got = {}
        for _ in range(60):
            got = {
                r["event_id"]: r["session_seq"]
                for r in spark.sql("select * from sess_test").collect()
            }
            if len(got) == 4:
                break
            time.sleep(2)
        assert got == {1: 1, 2: 1, 3: 2, 4: 1}
    finally:
        q.stop()

    # batch fallback: same call, plain DataFrame
    batch = spark.createDataFrame(rows, schema)
    got_b = {
        r["event_id"]: r["session_seq"]
        for r in streaming_sessionize(batch, gap_minutes=30).collect()
    }
    assert got_b == {1: 1, 2: 1, 3: 2, 4: 1}


def test_as_of_join_directions(spark):
    import datetime as dt

    from jodie_spark.operators.temporal_joins import as_of_join

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    left = spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(minutes=30))], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t0 - dt.timedelta(minutes=10), "before"),
         (1, t0 + dt.timedelta(minutes=5), "after")],
        "k int, ts timestamp, tag string",
    )

    def tags(direction, tolerance=None):
        out = as_of_join(left, right, "k", direction=direction, tolerance=tolerance)
        return [r["right_tag"] for r in out.orderBy("ts").collect()]

    assert tags("backward") == ["before", "after"]
    assert tags("forward") == ["after", None]
    # 12:00 is 10 min from 'before', 5 min from 'after' -> nearest=after;
    # 12:30 is 25 min past 'after' (backward only)
    assert tags("nearest") == ["after", "after"]
    assert tags("nearest", tolerance="6 minutes") == ["after", None]

    # equal-timestamp right rows are visible in every direction
    right_eq = spark.createDataFrame([(1, t0, "same")], "k int, ts timestamp, tag string")
    for d in ("backward", "forward", "nearest"):
        out = as_of_join(left.limit(1), right_eq, "k", direction=d)
        assert [r["right_tag"] for r in out.collect()] == ["same"]

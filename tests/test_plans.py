"""Plan-quality regression tests: the physical plans these operators
produce are part of the contract (pushdown, broadcast, per-partition
top-k, no cartesian stages)."""

import pyspark.sql.functions as F

from jodie_spark.operators.similarity import brute_force_topk
from jodie_spark.operators.text_dedup import minhash_candidate_pairs


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _analyzed(df) -> str:
    return df._jdf.queryExecution().toString()


def test_filter_pushdown_reaches_scan(spark, tmpdir_path):
    import os

    p = os.path.join(tmpdir_path, "scan")
    spark.range(1000).selectExpr("id", "id * 2 as v").write.parquet(p)
    q = spark.read.parquet(p).filter("id > 500").select("v")
    plan = _analyzed(q)
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,500)]" in plan
    assert "ReadSchema: struct<id:bigint,v:bigint>" in plan


def test_small_dim_join_broadcasts(spark, tmpdir_path):
    big = spark.range(10_000).withColumnRenamed("id", "k")
    small = spark.createDataFrame([(i, "x") for i in range(10)], "k long, tag string")
    q = big.join(F.broadcast(small), "k")
    assert "BroadcastHashJoin" in _plan(q)


def test_topk_uses_take_ordered(spark):
    import numpy as np

    rows = [(i, np.random.default_rng(i).standard_normal(4).tolist()) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = brute_force_topk(df, "embedding", "vec_id", [1.0, 0.0, 0.0, 0.0], 5)
    assert "TakeOrderedAndProject" in _plan(q)  # per-partition top-k + merge, no global sort


def test_minhash_pairs_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, f"some words here number {i} padded out to shingle length") for i in range(20)],
        "doc_id int, text string",
    )
    plan = _plan(minhash_candidate_pairs(df, "text", "doc_id"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_matches_plain_join(spark):
    from jodie_spark.functions.joins import salted_count, salted_join

    big = spark.createDataFrame(
        [(i % 3, i) for i in range(300)], "k int, payload int"
    )
    small = spark.createDataFrame([(0, "zero"), (1, "one"), (2, "two")], "k int, name string")
    salted = salted_join(big, small, "k", salt=8)
    plain = big.join(small, "k")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    counts = {r["k"]: r["count"] for r in salted_count(big, "k", salt=8).collect()}
    assert counts == {0: 100, 1: 100, 2: 100}


def test_cosine_join_distinct_carries_ids_only(spark):
    """The candidate-pair distinct must shuffle narrow (l_id, r_id)
    pairs, never the vector payloads."""
    import numpy as np

    from jodie_spark.operators.similarity import cosine_similarity_join

    rows = [(i, np.random.default_rng(i).standard_normal(4).tolist()) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = cosine_similarity_join(df, df, "embedding", "vec_id", dim=4, threshold=0.9)
    plan = _plan(q)
    import re

    dedup_aggs = [
        m for m in re.findall(r"HashAggregate\(keys=\[[^\]]*\]", plan)
        if "l_id" in m and "r_id" in m
    ]
    assert dedup_aggs, plan
    assert all("_v" not in m for m in dedup_aggs), dedup_aggs
    # correctness: every id pairs with itself at similarity 1
    got = {(r["l_id"], r["r_id"]) for r in q.collect()}
    assert {(i, i) for i in range(30)} <= got


def test_ivf_cell_partition_pruning(spark, tmpdir_path):
    """The documented IVF scale path: persist assignments as a
    partition column and a probe becomes a partition-pruned scan —
    only ~n_probe/n_centroids of the data is listed, let alone read."""
    import os

    import numpy as np

    from jodie_spark.operators.ivf import train_centroids, with_ivf_assignments

    rows = [(i, np.random.default_rng(i).standard_normal(8).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = train_centroids(df, "embedding", n_centroids=4)
    assigned = with_ivf_assignments(df, "embedding", cents, cell_col="cell")

    p = os.path.join(tmpdir_path, "ivf_parted")
    assigned.write.partitionBy("cell").parquet(p)
    probe = spark.read.parquet(p).filter(F.col("cell").isin([0, 1]))
    plan = _analyzed(probe)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:120]
    # and the pruned read returns exactly the assigned subset
    expected = assigned.filter(F.col("cell").isin([0, 1])).count()
    assert probe.count() == expected


def test_semantic_pairs_single_cell_shuffle_no_joins(spark):
    """Round-5 shape: the within-cluster quadratic step runs inside one
    applyInPandas grouped by cell — each vector crosses the wire exactly
    once (one hash Exchange on cell) and there is NO candidate-pair join
    at all downstream (the r3/r4 design still materialized (n/k)²·k
    pair rows through two join-backs)."""
    import re

    import numpy as np

    from jodie_spark.operators.semantic_dedup import semantic_candidate_pairs

    rows = [
        (i, np.random.default_rng(i).standard_normal(8).tolist()) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = semantic_candidate_pairs(
        df, "embedding", "vec_id", n_clusters=4, threshold=0.5, sample_size=60
    )
    plan = _plan(q)
    cell_exchanges = re.findall(r"Exchange hashpartitioning\(cell[^\n]*", plan)
    assert len(cell_exchanges) == 1, plan  # vectors shuffle once, grouped by cell
    assert "FlatMapGroupsInPandas" in plan, plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert join not in plan, plan
    # sanity: results still produced
    assert q.count() >= 0


def test_dedup_keeper_elections_use_aggregation_not_windows(spark):
    """Round-5 skew audit contract: keeper elections must be hash
    aggregations (map-side combine absorbs hot content keys), never a
    row_number/min window partitioned by a content key — a window
    serializes a million-copy hot fingerprint into one task."""
    from jodie_spark.operators.corpus import clean_corpus
    from jodie_spark.operators.substring_dedup import remove_duplicate_substrings
    from jodie_spark.operators.text_dedup import exact_dedup, minhash_dedup

    df = spark.createDataFrame(
        [(i, f"some text body number {i % 5} with words") for i in range(60)],
        "doc_id long, text string",
    )
    cases = [
        exact_dedup(df, "text", "doc_id"),
        clean_corpus(df, min_quality=-1e9, min_tokens=0),
        minhash_dedup(df, "text", "doc_id"),
        remove_duplicate_substrings(df, window=5),
    ]
    for q in cases:
        plan = _plan(q)
        assert "Window" not in plan, plan
        assert "Aggregate" in plan, plan  # Hash/Sort/ObjectHashAggregate
        assert q.count() >= 0


def test_dsir_weights_broadcasts_bucket_tables(spark):
    """DSIR's scale contract: the two n_buckets-row log-prob tables
    BROADCAST onto the (id, bucket) pair stream, and no plan stage is
    a cartesian/nested-loop join."""
    from jodie_spark.operators.dsir import dsir_log_weights

    raw = spark.createDataFrame(
        [(i, f"some text number {i} with shared words") for i in range(30)],
        "doc_id long, text string",
    )
    tgt = raw.filter("doc_id % 5 = 0")
    q = dsir_log_weights(raw, tgt, n_buckets=512)
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the scalar-floor cross joins are broadcast 1-row joins: every
    # nested-loop stage must carry a broadcast build side
    import re

    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert re.search(r"Build(Left|Right)", line), line


def test_cap_per_domain_narrow_projection_and_semijoin(spark):
    """Frequency capping never shuffles the text column: both window
    stages operate on the narrow (domain, quality, id) projection and
    the keeper set comes back via a semi join."""
    from jodie_spark.functions.urls import cap_per_domain

    df = spark.createDataFrame(
        [(i, f"https://d{i % 3}.com/p/{i}", float(i), "x" * 50) for i in range(40)],
        "doc_id long, url string, q double, text string",
    )
    q = cap_per_domain(df, "url", k=2, id_col="doc_id", quality_col="q")
    plan = _plan(q)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    # exactly the two election window NODES, neither over the text col
    window_nodes = [
        line for line in plan.splitlines() if "Window [" in line
    ]
    assert len(window_nodes) == 2, window_nodes
    for line in window_nodes:
        assert "text" not in line


def test_robots_rules_broadcast_and_aggregated_election(spark):
    """Robots filtering broadcasts the rules table and elects the
    winning rule with an aggregation — never a corpus window, never a
    cartesian stage."""
    from jodie_spark.functions.robots import filter_by_robots

    docs = spark.createDataFrame(
        [(i, f"https://a.com/s{i % 4}/p{i}") for i in range(30)],
        "id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /s1/\n")],
        "host string, robots_txt string",
    )
    q = filter_by_robots(docs, robots)
    plan = _plan(q)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    # the host+LIKE join on the broadcast rules side
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_kmv_sketch_bounded_shuffle(spark):
    """The KMV election shuffles at most salts*k rows per group: both
    aggregation stages are hash aggregates over the hash projection,
    no window, no join."""
    from jodie_spark.operators.sketches import kmv_sketch

    df = spark.range(5000).selectExpr("concat('v', id) as v")
    q = kmv_sketch(df, "v", k=64)
    plan = _plan(q)
    assert "Window" not in plan
    for join in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert join not in plan

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship Type 2 SCD upsert on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 plus
the LLM-pipeline extensions); each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-equivalent SQL per query where the operator
is SQL-expressible; omitted for layout-dependent or LSH-based ops
(driver records rows-only checks for those).

Delta-table-mutating operators materialize a scratch Delta table under
a tempdir from the given parquet inputs, run the mutation, and return
the resulting table state — the oracle describes the same final state
declaratively over the original parquet views.
"""

from __future__ import annotations

import glob
import os
import tempfile
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _tmp(name: str) -> str:
    return os.path.join(tempfile.mkdtemp(prefix=f"jodie_{name}_"), "t")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.sources import load_table

    return load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("date")
    )


def _delta_from(df: DataFrame, name: str, **kw):
    from jodie_spark.tables.table import DeltaTable, write_delta

    path = _tmp(name)
    write_delta(df, path, **kw)
    return DeltaTable.forPath(df.sparkSession, path)


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Type 2 SCD upsert end-to-end on sf0.001 customers."""
    return _q_type2_scd_upsert(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# jodie operator queries
# ---------------------------------------------------------------------------

def _q_kill_duplicate_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import kill_duplicate_records

    t = _delta_from(_orders(spark, sf_dir), "kill")
    kill_duplicate_records(t, ["o_custkey", "o_orderpriority"])
    return t.toDF()


def _q_remove_duplicate_records_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import remove_duplicate_records

    t = _delta_from(_orders(spark, sf_dir), "rmpk")
    remove_duplicate_records(t, ["o_custkey", "o_orderpriority"], primary_key="o_orderkey")
    return t.toDF()


def _q_remove_duplicate_records_nopk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import remove_duplicate_records

    proj = _orders(spark, sf_dir).select("o_orderstatus", "o_orderpriority")
    t = _delta_from(proj, "rmnopk")
    remove_duplicate_records(t, ["o_orderstatus", "o_orderpriority"])
    return t.toDF()


def _q_append_without_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import append_without_duplicates

    orders = _orders(spark, sf_dir)
    t = _delta_from(orders.filter("o_orderkey % 3 = 0"), "appnd")
    append_without_duplicates(t, orders.filter("o_orderkey % 2 = 0"), ["o_orderkey"])
    return t.toDF()


def _q_type2_scd_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import type2_upsert
    from jodie_spark.sources import load_table

    customer = load_table(spark, sf_dir, "customer")
    base = customer.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(True).alias("is_current"),
        F.lit("2020-01-01").cast("date").alias("effective_time"),
        F.lit(None).cast("date").alias("end_time"),
    )
    t = _delta_from(base, "scd")
    updates = customer.filter("c_custkey % 10 = 0").select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("_v2")).alias("c_mktsegment"),
        F.lit("2021-01-01").cast("date").alias("effective_time"),
    )
    type2_upsert(t, updates, "c_custkey", ["c_mktsegment"])
    return t.toDF()


def _q_validate_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import validate_append
    from jodie_spark.sources import load_table

    nation = load_table(spark, sf_dir, "nation")
    t = _delta_from(nation.select("n_nationkey", "n_name"), "vapp")
    appended = nation.select(
        (F.col("n_nationkey") + 100).cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_name").alias("note"),
    )
    validate_append(t, appended, ["n_nationkey", "n_name"], ["note"])
    from jodie_spark.tables.table import DeltaTable

    return DeltaTable.forPath(spark, t.path).toDF()


def _q_copy_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import copy_table
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable

    t = _delta_from(load_table(spark, sf_dir, "supplier"), "copysrc")
    dst = _tmp("copydst")
    copy_table(t, target_path=dst)
    return DeltaTable.forPath(spark, dst).toDF()


def _q_with_md5_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import with_md5_columns
    from jodie_spark.sources import load_table

    customer = load_table(spark, sf_dir, "customer")
    return with_md5_columns(customer, ["c_name", "c_mktsegment"]).select(
        "c_custkey", "_md5c_namec_mktsegment"
    )


def _q_find_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import find_composite_key_candidate
    from jodie_spark.sources import load_table

    t = _delta_from(load_table(spark, sf_dir, "nation"), "fck")
    cols = find_composite_key_candidate(t)
    return spark.createDataFrame([(c,) for c in cols], "column_name string")


def _q_is_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import is_composite_key_candidate
    from jodie_spark.sources import load_table

    t = _delta_from(load_table(spark, sf_dir, "nation"), "ick")
    rows = [
        ("n_nationkey", is_composite_key_candidate(t, ["n_nationkey"])),
        ("n_regionkey", is_composite_key_candidate(t, ["n_regionkey"])),
    ]
    return spark.createDataFrame(rows, "column_name string, is_key boolean")


def _q_humanize_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import humanize_bytes

    values = [0.0, 500.0, 900.0, 1088.0, 1e6, 2.5e9, 1e12, 1e15]
    rows = [(v, humanize_bytes(v)) for v in values]
    return spark.createDataFrame(rows, "n double, humanized string")


def _q_operation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.metrics import OperationMetricHelper
    from jodie_spark.sources import load_table

    t = _delta_from(load_table(spark, sf_dir, "nation"), "met")
    t.delete("n_regionkey = 0")
    t.update("n_regionkey = 1", {"n_name": "n_name"})
    return OperationMetricHelper(spark, t.path).get_count_metrics_as_df()


def _q_operation_metrics_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.metrics import OperationMetricHelper

    t = _delta_from(_orders(spark, sf_dir), "metp", partition_by=["o_orderstatus"])
    return OperationMetricHelper(spark, t.path).get_count_metrics_as_df(
        "o_orderstatus = 'F'"
    )


def _q_read_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.cdf import read_cdf
    from jodie_spark.sources import load_table

    t = _delta_from(
        load_table(spark, sf_dir, "nation"),
        "cdf",
        options={"delta.enableChangeDataFeed": "true"},
    )
    t.delete("n_regionkey = 0")
    t.update("n_regionkey = 1", {"n_name": "concat(n_name, '_x')"})
    return read_cdf(spark, t.path, 1, 2).select(
        "n_nationkey", "n_name", "n_regionkey", "_change_type",
        F.col("_commit_version").cast("long").alias("_commit_version"),
    )


def _q_cdf_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dry_run + the three recovery probes on a healthy scripted table —
    all deterministic, so fully oracle-checkable."""
    from jodie_spark.operators.cdf import ChangeDataFeedHelper
    from jodie_spark.sources import load_table

    t = _delta_from(
        load_table(spark, sf_dir, "nation"),
        "cdfr",
        options={"delta.enableChangeDataFeed": "true"},
    )
    t.delete("n_regionkey = 0")
    t.delete("n_regionkey = 1")
    t.delete("n_regionkey = 2")
    h = ChangeDataFeedHelper(spark, t.path, 1, 3)
    ok = h.dry_run() is h
    log_v = h.get_versions_for_available_delta_log()
    cdc_v = h.get_versions_for_available_cdc()
    ranges = h.get_ranges_for_cdf_enabled_versions()
    rows = [
        ("dry_run_ok", 1 if ok else 0),
        ("log_start", log_v[0]), ("log_end", log_v[1]),
        ("cdc_start", cdc_v[0]), ("cdc_end", cdc_v[1]),
        ("n_ranges", len(ranges)),
        ("range0_start", ranges[0][0]), ("range0_end", ranges[0][1]),
    ]
    return spark.createDataFrame([(k, int(v)) for k, v in rows], "check_name string, value long")


def _q_cdf_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.cdf import ChangeDataFeedHelper
    from jodie_spark.sources import load_table

    t = _delta_from(
        load_table(spark, sf_dir, "nation"),
        "cdfs",
        options={"delta.enableChangeDataFeed": "true"},
    )
    t.delete("n_regionkey = 0")
    t.update("n_regionkey = 1", {"n_name": "n_name"})
    rows = ChangeDataFeedHelper(spark, t.path, 0, 2).get_all_versions_with_cdf_status()
    return spark.createDataFrame(
        [(int(v), bool(b)) for v, b in rows], "version long, cdf_enabled boolean"
    )


# ---------------------------------------------------------------------------
# LLM-pipeline queries
# ---------------------------------------------------------------------------

def _q_exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.text_dedup import exact_dedup
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id")


def _q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022): every 15-token window
    seen more than once corpus-wide keeps only its first occurrence;
    later occurrences' tokens are removed from the text. md5 hashes so
    the DuckDB oracle computes the identical election."""
    from jodie_spark.operators.substring_dedup import remove_duplicate_substrings
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_duplicate_substrings(
        docs, "text", "doc_id", window=15, hash_fn="md5", out_col="clean_text"
    ).select("doc_id", "clean_text", "n_tokens_removed")


def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.functions.text import token_count
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count(F.col("text")).cast("long").alias("n_tokens"))


def _q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.functions.text import doc_fingerprint
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.functions.text import quality_score
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        quality_score(F.col("text")).alias("quality"),
    )


def _q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.functions.text import language_id
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(language_id(F.col("text")).alias("lang_id"))
        .groupBy("lang_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _q_datasource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write nation through the jodie_delta DataSource (executor
    parquet + driver commit), append half of region's keys as a second
    commit, then read the table back through the same format — Spark's
    own scan machinery over the native log."""
    from jodie_spark.sources import load_table
    from jodie_spark.sources.datasource import register

    register(spark)
    path = _tmp("dsrt")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.write.format("jodie_delta").mode("append").save(path)
    extra = nation.filter("n_nationkey < 5").selectExpr(
        "n_nationkey + 100 as n_nationkey", "n_name", "n_regionkey"
    )
    extra.write.format("jodie_delta").mode("append").save(path)
    return spark.read.format("jodie_delta").load(path).filter("n_regionkey >= 0")


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster map: (doc_id, cluster) for every document
    involved in a verified near-dup pair — what a pipeline inspects
    before deciding what to drop."""
    from jodie_spark.operators.text_dedup import (
        connected_component_reps,
        ngram_jaccard_pairs,
    )
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5)
    reps = connected_component_reps(pairs.select("id_a", "id_b"))
    return reps.select(
        F.col("id").alias("doc_id"), F.col("rep").alias("cluster")
    )


def _q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.functions.text import bpe_token_count, token_count
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        bpe_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.functions.text import pii_counts, pii_scrub
    from jodie_spark.sources import load_table

    # plant deterministic PII per document, then scrub: the oracle
    # applies the same concat + RE2-compatible regexes in DuckDB
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567 at 10.0.0."),
            (F.col("doc_id") % 255).cast("string"),
        ).alias("text"),
    )
    counted = planted.withColumn("__c__", pii_counts(F.col("text")))
    return counted.select(
        "doc_id",
        pii_scrub(F.col("text")).alias("clean_text"),
        F.col("__c__.email").cast("long").alias("n_email"),
        F.col("__c__.phone").cast("long").alias("n_phone"),
        F.col("__c__.ip").cast("long").alias("n_ip"),
    )


def _q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode + whitespace normalization: plant a decomposed-accent,
    control-char, whitespace-run suffix on every document, normalize,
    and value-check against DuckDB's nfc_normalize + the same RE2
    regex chain."""
    from jodie_spark.functions.normalize import normalize_text
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("  Café \t du\x07monde \x0b ok "),
        ).alias("text"),
    )
    return planted.select(
        "doc_id", normalize_text(F.col("text")).alias("norm_text")
    )


def _q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist filtering over planted per-doc URLs: extract
    host/domain/path (explicit RE2-compatible regex — oracle-exact)
    and drop blocklisted registrable domains via a broadcast
    anti-join."""
    from jodie_spark.functions.urls import filter_by_domain, with_url_parts
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.lit("not a url at all")
        ).otherwise(
            F.concat(
                F.lit("https://sub"),
                (F.col("doc_id") % 3).cast("string"),
                F.lit(".dom"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(".com/p/"),
                F.col("doc_id").cast("string"),
            )
        ).alias("url"),
    )
    kept = filter_by_domain(planted, ["dom1.com", "dom3.com"], mode="block")
    return with_url_parts(kept).select("doc_id", "host", "domain", "path")


def _q_classifier_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText/CCNet-style quality classifier: train NB log-odds on
    deterministic labels (doc_id % 3 == 0 → positive), score every
    document. The DuckDB oracle reproduces the exact arithmetic —
    md5-prefix bucket hash, Laplace-smoothed log-odds, sigmoid —
    value-for-value (scores rounded to 6 dp)."""
    from jodie_spark.operators.classifier import classifier_score, train_nb_classifier
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select(
        "doc_id", "text", F.when(F.col("doc_id") % 3 == 0, 1).otherwise(0).alias("label")
    )
    weights, bias = train_nb_classifier(labeled, n_buckets=4096, alpha=1.0)
    scored = classifier_score(labeled, weights, bias=bias, n_buckets=4096)
    return scored.select("doc_id", F.round(F.col("score"), 6).alias("score"))


def _q_passage_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document passage duplication (Lee et al. style): plant a
    shared 9-token boilerplate suffix on every 4th document, hash all
    8-token windows, and score each document by its corpus-duplicated
    window fraction. Oracle reproduces the identical md5-window
    arithmetic in DuckDB."""
    from jodie_spark.operators.passage_dedup import dup_passage_stats
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.col("text"),
                F.lit(" shared boilerplate terms of service all rights reserved contact"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dup_passage_stats(planted, k=8)


def _q_column_ddl_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution + DML lifecycle on a column-mapped table:
    RENAME COLUMN (metadata-only, auto-enables mapping), DROP COLUMN,
    ADD COLUMNS, append through the evolved logical schema, then
    DELETE and UPDATE evaluated on the renamed logical names (the
    rewrites stay physical-named on disk). The oracle states the final
    table declaratively."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import write_delta

    nation = load_table(spark, sf_dir, "nation")
    base = nation.withColumn("note", F.concat(F.col("n_name"), F.lit("!")))
    t = _delta_from(base, "ddl")
    t.rename_column("n_name", "nation_name")
    t.drop_column("note")  # its bytes stay in the files, invisibly
    t.add_columns({"flag": "bigint"})
    extra = nation.filter("n_nationkey < 5").select(
        (F.col("n_nationkey") + 100).alias("n_nationkey"),
        F.concat(F.col("n_name"), F.lit("_NEW")).alias("nation_name"),
        F.col("n_regionkey"),
        (F.col("n_nationkey") % 2).cast("bigint").alias("flag"),
    )
    write_delta(extra, t.path, mode="append")
    t.delete("n_nationkey >= 103")
    t.update("flag IS NULL", {"flag": F.col("n_regionkey").cast("bigint")})
    return t.toDF()


def _q_create_table_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE column-level DDL through the SQL front end
    (VERDICT r3 task 7): identity + generated + default + NOT NULL
    columns declared in SQL, filled by two appends, mutated with SQL
    UPDATE. Identity ids are layout-dependent within a batch but each
    batch gets one contiguous block, so the oracle reproduces them by
    rank (same scheme as identity_columns)."""
    from jodie_spark.sources import load_table
    from jodie_spark.sql import sql as jsql
    from jodie_spark.tables.table import DeltaTable, write_delta

    path = _tmp("createddl")
    jsql(
        spark,
        f"""CREATE TABLE delta.`{path}` (
            id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 5),
            n_nationkey BIGINT NOT NULL,
            n_name STRING,
            name_initial STRING GENERATED ALWAYS AS (substring(n_name, 1, 1)),
            prio INT NOT NULL DEFAULT 7
        ) USING DELTA TBLPROPERTIES ('delta.appendOnly' = 'false')""",
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    write_delta(nation, path, mode="append")
    second = nation.filter("n_nationkey < 5").select(
        (F.col("n_nationkey") + 100).alias("n_nationkey"),
        F.concat(F.col("n_name"), F.lit("_2")).alias("n_name"),
    )
    write_delta(second, path, mode="append")
    jsql(spark, f"UPDATE delta.`{path}` SET prio = 1 WHERE n_nationkey % 5 = 0")
    df = DeltaTable.forPath(spark, path).toDF()
    batch = (F.col("n_nationkey") >= 100).cast("int")
    w = Window.partitionBy(batch).orderBy("id")
    v = Window.partitionBy(batch).orderBy("n_nationkey")
    ranked = df.withColumn("id_rank", F.row_number().over(w)).withColumn(
        "key_rank", F.row_number().over(v)
    )
    ids = ranked.select(batch.alias("batch"), F.col("id_rank").alias("rnk"), "id")
    payload = ranked.select(
        batch.alias("batch"),
        F.col("key_rank").alias("rnk"),
        "n_nationkey",
        "n_name",
        "name_initial",
        "prio",
    )
    return ids.join(payload, ["batch", "rnk"]).select(
        "batch", "rnk", "id", "n_nationkey", "n_name", "name_initial", "prio"
    )




def _q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021 table A1) as one
    codegen projection; the oracle reproduces every signal in SQL."""
    from jodie_spark.functions.text import gopher_quality
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    g = gopher_quality(docs, "text")
    return g.select(
        "doc_id",
        F.col("gopher.n_words").alias("n_words"),
        F.col("gopher.mean_word_len").alias("mean_word_len"),
        F.col("gopher.symbol_word_ratio").alias("symbol_word_ratio"),
        F.col("gopher.bullet_line_frac").alias("bullet_line_frac"),
        F.col("gopher.ellipsis_line_frac").alias("ellipsis_line_frac"),
        F.col("gopher.alpha_word_frac").alias("alpha_word_frac"),
        F.col("gopher.n_stop_words").alias("n_stop_words"),
        F.col("gopher_passes").alias("passes"),
    )




def _q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully distributed spherical k-means (2 Lloyd's iterations,
    k=4, seeded with vec_id 0..3). The oracle UNROLLS both iterations
    in SQL — an iterative algorithm with a full value oracle. Per-iter
    shuffle carries k·dim partial sums, never vectors."""
    from jodie_spark.operators.kmeans import kmeans_assign, kmeans_fit
    from jodie_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cent = kmeans_fit(emb, "embedding", k=4, n_iter=2, id_col="vec_id")
    out = kmeans_assign(emb, "embedding", cent)
    return out.select("vec_id", F.col("cluster").cast("int").alias("cluster"))


def _q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich 2016): 6 merge
    rules learned from the documents corpus (top-300 words for oracle
    reproducibility). ONE corpus-scale aggregation up front; every
    iteration after that is |vocab|-bounded — pair explode → map-side
    combined sum → 1-row collect → Catalyst fold rewrite. The oracle
    UNROLLS all 6 iterations in SQL with the identical greedy
    leftmost-non-overlapping fold (list_reduce)."""
    from jodie_spark.operators.bpe import bpe_train, bpe_word_counts
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    words = bpe_word_counts(docs, "text", top_words=300)
    merges, segmented = bpe_train(words, n_merges=6)
    segmented.unpersist()
    return spark.createDataFrame(
        [(s, l, r, c) for s, l, r, c in merges],
        "step int, lhs string, rhs string, pair_cnt bigint",
    )


def _q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-crawl text extraction: wrap each document in deterministic
    HTML chrome (head/style/script with a bare ``<`` in the script
    body, entity-escaped body text, boilerplate footer), then recover
    the visible text and a markup-ratio quality signal with the pure
    Catalyst regex chain. The oracle builds the identical page in SQL
    and mirrors the same RE2-safe patterns."""
    from jodie_spark.functions.html import markup_ratio, strip_html
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    body = F.replace(F.col("text"), F.lit("&"), F.lit("&amp;"))
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>body { color: #222; }</style>"),
        F.lit("<script>if (1 < 2) { window.x = 'nav'; }</script></head>"),
        F.lit("<body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1>\n<p>"),
        body,
        F.lit("</p>\n<!-- tracking pixel -->"),
        F.lit('<div class="footer">&copy; 2026 Example &amp; Co.</div>'),
        F.lit("</body></html>"),
    )
    pages = docs.select("doc_id", html.alias("raw_html"))
    return pages.select(
        "doc_id",
        strip_html("raw_html").alias("extracted_text"),
        markup_ratio("raw_html").alias("markup_ratio"),
    )


def _q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing word
    trigrams with a held-out eval split (doc_id % 97 == 0). n=3 here
    because the synthetic sf docs are short; production default n=13."""
    from jodie_spark.operators.contamination import contamination_check
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_check(corpus, eval_df, n=3).select(
        "doc_id", F.col("n_shared_ngrams").cast("long").alias("n_shared_ngrams")
    )


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing: per-source keep fractions via the
    portable affine scatter (identical arithmetic in any SQL engine)."""
    from jodie_spark.operators.sampling import stratified_sample
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_sample(
        docs,
        "source",
        {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25},
        default_fraction=0.1,
    )
    return sampled.select("doc_id", "source")


def _q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.chunking import chunk_documents
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, max_tokens=50, overlap=10)


def _q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization, exploded to (vec_id, pos, code) so
    every code is value-checked bit-for-bit against DuckDB."""
    from jodie_spark.functions.vectors import int8_quantize
    from jodie_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        int8_quantize(F.col("embedding")).alias("__qz__"),
    )
    return q.select(
        "vec_id",
        F.round(F.col("__qz__.max_abs") * 1e6).cast("long").alias("scale_ppm"),
        F.posexplode(F.col("__qz__.q")).alias("pos", "code"),
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), "code", "scale_ppm")


def _q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.functions.text import repetition_signals
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", repetition_signals(F.col("text")).alias("__r__")
    ).select(
        "doc_id",
        F.col("__r__.dup_word_frac").alias("dup_word_frac"),
        F.col("__r__.dup_bigram_frac").alias("dup_bigram_frac"),
        F.col("__r__.dup_trigram_frac").alias("dup_trigram_frac"),
    )


def _q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.similarity import brute_force_topk
    from jodie_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    query = emb.filter("vec_id = 0").take(1)[0]["embedding"]
    return brute_force_topk(emb, "embedding", "vec_id", query, 10).select("vec_id")


def _planted_embeddings(spark: SparkSession, sf_dir: str, n_clones: int = 9):
    """embeddings ∪ exact copies of vector 0 under ids 100001..100009.

    The copies are the *planted ground truth* that makes the ANN
    queries oracle-able on uniform-random embeddings: an identical
    vector has cosine 1.0 (≫ the 0.37 natural max at sf0.01) and an
    identical LSH/IVF signature, so any correct probe MUST surface
    all of them, and DuckDB's brute-force top-k agrees exactly."""
    from jodie_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    clones = (
        emb.filter("vec_id = 0")
        .crossJoin(spark.range(1, n_clones + 1).select((F.col("id") + 100000).alias("__cid__")))
        .select(F.col("__cid__").alias("vec_id"), "embedding")
    )
    # materialize once (lazy): every consumer evaluates this union
    # several times inside one query — sample-trainer collects, take(1)
    # for the probe vector, the assignment pass, the index write — and
    # each evaluation re-ran the scan + clone-planting cross join
    return emb.unionByName(clones).localCheckpoint(eager=False)


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.similarity import ann_topk

    aug = _planted_embeddings(spark, sf_dir)
    first = aug.filter("vec_id = 0").take(1)[0]["embedding"]
    return ann_topk(aug, "embedding", "vec_id", first, len(first), 10).select("vec_id")


def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.ivf import ivf_topk

    aug = _planted_embeddings(spark, sf_dir)
    query = aug.filter("vec_id = 0").take(1)[0]["embedding"]
    return ivf_topk(
        aug, "embedding", "vec_id", query, k=10, n_centroids=8, n_probe=3
    ).select("vec_id")


def _q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.pq import pq_topk

    aug = _planted_embeddings(spark, sf_dir)
    query = aug.filter("vec_id = 0").take(1)[0]["embedding"]
    # planted exact copies share the query's PQ codes, so they get the
    # maximal ADC score; the exact-cosine refinement then ranks them
    # identically to DuckDB's brute force (_PLANTED_ANN_ORACLE)
    return pq_topk(
        aug, "embedding", "vec_id", query, k=10, m=8, n_codes=16, refine_factor=4
    ).select("vec_id")


def _q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (coarse cells + residual PQ, FAISS IndexIVFPQ layout)
    under the value oracle: planted exact copies share the query's cell
    and residual codes → maximal per-cell ADC score → the exact-cosine
    refinement ranks them as DuckDB's brute force does."""
    from jodie_spark.operators.pq import ivfpq_topk

    aug = _planted_embeddings(spark, sf_dir)
    query = aug.filter("vec_id = 0").take(1)[0]["embedding"]
    return ivfpq_topk(
        aug, "embedding", "vec_id", query,
        k=10, n_centroids=8, n_probe=4, m=8, n_codes=16, refine_factor=8,
    ).select("vec_id")


_BOILER_HEADER = "== shared navigation header =="
_BOILER_FOOTER = "(c) shared copyright footer 2026"


def _boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents wrapped in a shared header/footer line — planted
    line-duplication ground truth for the C4-style line dedup (the
    corpus texts are single-line, so without planting the operator
    would be a near-no-op)."""
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.withColumn(
        "text",
        F.concat(F.lit(_BOILER_HEADER + "\n"), F.col("text"), F.lit("\n" + _BOILER_FOOTER)),
    )


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.line_dedup import dedup_lines

    aug = _boilerplate_docs(spark, sf_dir)
    return dedup_lines(aug, "text", "doc_id", min_chars=10).select(
        "doc_id", "text", "n_lines_kept", "n_lines_removed"
    )


def _q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.functions.text import token_count
    from jodie_spark.operators.packing import sequence_stats
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return sequence_stats(docs, "n_tokens", "doc_id", seq_len=512)


def _q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.text_dedup import dedup_against
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # "tonight's batch": every 5th doc, plus re-crawled copies of docs
    # the corpus has already accepted (ids 100000+ are the plants that
    # must all be dropped)
    seen = docs.filter("doc_id % 5 <> 0")
    clones = seen.filter("doc_id % 5 = 1").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    new_batch = docs.filter("doc_id % 5 = 0").unionByName(clones)
    return dedup_against(new_batch, seen, "text").select("doc_id")


def _q_dv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE: deletion vectors written instead of file
    rewrites; the surviving logical rows must equal the SQL filter, and
    a second (copy-on-write) delete stacked on top must read through
    the DVs correctly."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    t = _delta_from(cust, "dvdel")
    table = DeltaTable.forPath(spark, t.path)
    table.delete("c_nationkey < 5", deletion_vectors=True)
    table.delete("c_acctbal < 0", deletion_vectors=True)
    return DeltaTable.forPath(spark, t.path).toDF().select(
        "c_custkey", "c_name", "c_nationkey"
    )


def _q_dv_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE stacked on a merge-on-read DELETE: DV'd rows
    must not resurrect, updated copies must land, untouched rows stay."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    t = _delta_from(cust, "dvupd")
    table = DeltaTable.forPath(spark, t.path)
    table.delete("c_acctbal < 0", deletion_vectors=True)
    table.update(
        "c_nationkey < 5", {"c_name": "concat(c_name, '-U')"}, deletion_vectors=True
    )
    return DeltaTable.forPath(spark, t.path).toDF().select(
        "c_custkey", "c_name", "c_nationkey"
    )


def _q_dv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read MERGE (update+delete+insert clauses via deletion
    vectors): result must equal the SQL CASE over customer."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    t = _delta_from(cust, "dvmrg")
    table = DeltaTable.forPath(spark, t.path)
    src = cust.filter("c_custkey % 3 = 0").select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("-M")).alias("new_name"),
        "c_acctbal",
    )
    (
        table.alias("tg")
        .merge(src.alias("s"), "tg.c_custkey = s.c_custkey")
        .whenMatchedDelete("s.c_acctbal < 0")
        .whenMatchedUpdate(set={"c_name": "s.new_name"})
        .execute(deletion_vectors=True)
    )
    return DeltaTable.forPath(spark, t.path).toDF().select(
        "c_custkey", "c_name", "c_nationkey"
    )


def _q_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Create a day-partitioned table whose partition column is GENERATED
    from the event timestamp, append a batch that does NOT carry the
    column (the writer must compute it), and read back (event_id, day).
    DuckDB reproduces the generation expression directly."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable, write_delta

    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    half = events.filter("event_id % 2 = 0")
    rest = events.filter("event_id % 2 <> 0")
    path = _tmp("gencol")
    write_delta(
        half, path, partition_by=["day"],
        generated_columns={"day": "cast(ts as date)"},
    )
    write_delta(rest, path, mode="append")  # day computed by the writer
    return (
        DeltaTable.forPath(spark, path)
        .toDF()
        .select("event_id", F.col("day").cast("string").alias("day"))
    )


def _q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data prep pipeline as ONE composition —
    boilerplate line dedup → exact content dedup → length filter →
    perplexity filter (model trained on the surviving corpus) →
    deterministic sample → sequence packing — value-checked end-to-end
    against a single DuckDB CTE chain. Every stage is an operator this
    repo ships; the oracle proves the COMPOSITION, not just the parts."""
    from jodie_spark.functions.text import token_count
    from jodie_spark.operators.line_dedup import dedup_lines
    from jodie_spark.operators.packing import sequence_stats
    from jodie_spark.operators.perplexity import perplexity_score
    from jodie_spark.operators.sampling import deterministic_sample
    from jodie_spark.operators.text_dedup import exact_dedup

    aug = _boilerplate_docs(spark, sf_dir)
    cleaned = dedup_lines(aug, "text", "doc_id", min_chars=10).select("doc_id", "text")
    deduped = exact_dedup(cleaned, "text", "doc_id")
    long_enough = deduped.filter(token_count(F.col("text")) >= 40)
    scores = perplexity_score(long_enough, "text", "doc_id")
    keep_ids = scores.filter(
        F.col("perplexity").isNotNull() & (F.col("perplexity") <= 1500.0)
    ).select("doc_id")
    kept = long_enough.join(keep_ids, "doc_id", "left_semi")
    sampled = deterministic_sample(kept, 0.6, id_col="doc_id")
    with_counts = sampled.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return sequence_stats(with_counts, "n_tokens", "doc_id", seq_len=256)


def _q_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.perplexity import perplexity_score
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return perplexity_score(docs, "text", "doc_id")


def _q_restore_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE to version 0 after destructive DML: the table must read
    back byte-identical to the original data, and history must show the
    full operation trail (checked via deterministic columns)."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable

    t = _delta_from(
        load_table(spark, sf_dir, "region").select("r_regionkey", "r_name"),
        "restoresrc",
    )
    t.delete("r_regionkey >= 2")
    t.update("r_regionkey = 0", {"r_name": "'MUTATED'"})
    t.restore(0)
    table = DeltaTable.forPath(spark, t.path)
    ops = table.history().select("version", "operation")
    data = table.toDF().select(
        F.col("r_regionkey").cast("long").alias("version"),
        F.col("r_name").alias("operation"),
    )
    return data.unionByName(ops)


def _q_log_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-cleanup lifecycle (delta's cleanUpExpiredLogs parity,
    reference inherits it from delta-core — build.sbt:9): commits
    below the newest checkpoint that age past
    delta.logRetentionDuration are deleted together with their .crc
    checksums; the checkpoint + JSON tail still reconstructs the
    latest state, and time travel to a cleaned version raises. The
    final table content AND the post-cleanup log shape are both
    closed-form, so the whole lifecycle is DuckDB-oracleable."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.log import DeltaLog
    from jodie_spark.tables.table import DeltaTable, write_delta

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    t = _delta_from(
        nation,
        "logclean",
        options={"delta.logRetentionDuration": "interval 30 minutes"},
    )
    t.delete("n_regionkey = 0")  # v1
    write_delta(
        nation.select(
            (F.col("n_nationkey") + 100).alias("n_nationkey"),
            "n_name",
            "n_regionkey",
        ),
        t.path,
        mode="append",
    )  # v2
    log = DeltaLog(t.path)
    log.write_checkpoint()  # at v2
    noop = log.cleanup_expired_logs()  # nothing aged yet -> no-op
    old = time.time() - 3600
    for v in (0, 1):
        os.utime(log.commit_file_path(v), (old, old))
    deleted = log.cleanup_expired_logs()
    n_json = sum(1 for d in deleted if d.endswith(".json"))
    surviving = log.list_commit_versions()
    fresh = DeltaTable.forPath(spark, t.path)
    try:
        fresh.snapshot(0)
        tt_unreachable = 0
    except Exception:
        tt_unreachable = 1
    data = fresh.toDF().select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )
    meta = spark.createDataFrame(
        [
            (len(noop), "__noop_before_aging__", -1),
            (n_json, "__deleted_commit_jsons__", -1),
            (len(surviving), "__surviving_commits__", -1),
            (min(surviving), "__min_surviving_version__", -1),
            (tt_unreachable, "__time_travel_unreachable__", -1),
        ],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    return data.unionByName(meta)


def _q_fsck_crc_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FSCK REPAIR TABLE + version-checksum heal, oracled end-to-end:
    a data file deleted out-of-band (the n_regionkey=0 partition) is
    detected by fsck(dry_run) and repaired by committing removes, so
    the table reads cleanly as nation-minus-region-0; then a drifted
    <version>.crc at the checkpoint version is verified and rewritten
    by the next checkpoint (writer-side heal — reads never mutate).
    Both outcomes are closed-form (delta-spark FSCK parity)."""
    import json as _json

    from jodie_spark.sources import load_table
    from jodie_spark.tables.log import DeltaLog
    from jodie_spark.tables.table import DeltaTable

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    t = _delta_from(
        nation.repartition("n_regionkey"), "fsckcrc", partition_by=["n_regionkey"]
    )
    victims = glob.glob(os.path.join(t.path, "n_regionkey=0", "*.parquet"))
    for f in victims:
        os.remove(f)
    dry = t.fsck(dry_run=True)  # detect only: no commit
    repaired = t.fsck(dry_run=False)  # commits removes (v1, FSCK)
    log = DeltaLog(t.path)
    fsck_version = log.latest_version()
    # drift the FSCK version's checksum, then checkpoint: the writer
    # verifies the .crc against reconstructed state and rewrites it
    crc_path = log._crc_path(fsck_version)
    with open(crc_path) as fh:
        crc = _json.load(fh)
    crc["numFiles"] += 7
    with open(crc_path, "w") as fh:
        fh.write(_json.dumps(crc))
    # the checkpoint moment is the writer-side heal point: committers
    # pair write_checkpoint with the chain heal (_maybe_checkpoint)
    log.write_checkpoint(fsck_version)
    log._restart_checksum_chain(fsck_version)
    with open(crc_path) as fh:
        healed = _json.load(fh)
    fresh = DeltaTable.forPath(spark, t.path)
    data = fresh.toDF().select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("long").alias("n_regionkey"),
    )
    meta = spark.createDataFrame(
        [
            (len(dry), "__fsck_detected__", -1),
            (len(repaired), "__fsck_repaired__", -1),
            (int(dry == repaired), "__dry_run_agrees__", -1),
            (fsck_version, "__fsck_commit_version__", -1),
            (healed["numFiles"], "__crc_healed_numfiles__", -1),
        ],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    return data.unionByName(meta)


def _q_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy clone of a supplier Delta table, then copy-on-write
    DML on the clone: the result must equal the SQL of (supplier minus
    the deleted predicate) while the source stays intact — both facts
    the oracle checks (the source rows re-read and unioned as a
    checksum that the clone's DML never leaked into the source)."""
    from jodie_spark.operators.helpers import shallow_clone
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable

    t = _delta_from(
        load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
        ),
        "clonesrc",
    )
    clone = shallow_clone(DeltaTable.forPath(spark, t.path), _tmp("clonedst"))
    clone.delete("s_nationkey < 5")
    clone_df = clone.toDF().select(
        "s_suppkey", "s_name", "s_nationkey", F.lit("clone").alias("side")
    )
    src_df = (
        DeltaTable.forPath(spark, t.path)
        .toDF()
        .select("s_suppkey", "s_name", "s_nationkey", F.lit("source").alias("side"))
    )
    return clone_df.unionByName(src_df)


def _q_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full constraint lifecycle: create table, ADD CONSTRAINT with
    full-scan validation, a conforming append (committed), a violating
    append (distributed assert fails the job; NOTHING committed), DROP,
    then a previously-violating append succeeds. The final table is
    exactly reproducible in SQL."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable, write_delta

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    t = _delta_from(nation, "ckcon")
    table = DeltaTable.forPath(spark, t.path)
    table.add_check_constraint("small_key", "n_regionkey <= 4")
    write_delta(
        nation.select(
            (F.col("n_nationkey") + 100).alias("n_nationkey"), "n_name",
            "n_regionkey",
        ),
        t.path,
        mode="append",
    )
    try:
        write_delta(
            nation.select(
                (F.col("n_nationkey") + 200).alias("n_nationkey"), "n_name",
                (F.col("n_regionkey") + 10).alias("n_regionkey"),
            ),
            t.path,
            mode="append",
        )
        raise AssertionError("violating append must fail")
    except AssertionError:
        raise
    except Exception:
        pass  # expected: constraint violation fails the job
    table.drop_check_constraint("small_key")
    write_delta(
        nation.select(
            (F.col("n_nationkey") + 200).alias("n_nationkey"), "n_name",
            (F.col("n_regionkey") + 10).alias("n_regionkey"),
        ),
        t.path,
        mode="append",
    )
    return DeltaTable.forPath(spark, t.path).toDF()


def _q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.profile import profile_table
    from jodie_spark.sources import load_table

    return profile_table(load_table(spark, sf_dir, "documents"))


def _q_ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a persisted IVF+PQ index table (partitioned by cell, model
    in the table properties), then answer the planted-copy query through
    partition-pruned jodie_delta scans — the full index lifecycle."""
    from jodie_spark.operators.ann_index import build_ann_index, query_ann_index

    aug = _planted_embeddings(spark, sf_dir)
    query = aug.filter("vec_id = 0").take(1)[0]["embedding"]
    idx = _tmp("annidx")
    build_ann_index(
        aug, "embedding", "vec_id", idx, n_centroids=8, m=8, n_codes=16
    )
    return query_ann_index(
        spark, idx, query, "vec_id", "embedding", k=10, n_probe=3
    ).select("vec_id")


def _q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.sampling import epoch_shuffle
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    shuffled = epoch_shuffle(docs, "doc_id", epoch=3)
    # head of the epoch-3 visit order: the scatter key is exact BIGINT
    # arithmetic, so DuckDB reproduces the permutation bit-for-bit
    return (
        shuffled.select("doc_id", F.col("__shuffle_key__").alias("shuffle_key"))
        .orderBy("shuffle_key", "doc_id")
        .limit(100)
    )


def _q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.sampling import mixture_weights
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return mixture_weights(docs, "source", alpha=0.5, weight_col="n_chars").select(
        "source", "n", "p", "weight", "multiplier"
    )


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over planted exact copies: clones share the query's
    cluster and have cosine 1.0 (natural max at sf0.01 is ~0.37, far
    under the 0.9 threshold), so exactly the clones collapse to the
    original vec 0 and every natural vector survives."""
    from jodie_spark.operators.semantic_dedup import semantic_dedup

    aug = _planted_embeddings(spark, sf_dir)
    return semantic_dedup(
        aug, "embedding", "vec_id", n_clusters=8, threshold=0.9
    ).select("vec_id")


def _q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.text_dedup import minhash_dedup
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup(
        docs, "text", "doc_id", verify_threshold=0.5, transitive=True
    ).select("doc_id")


def _no_near_dup_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with NO true near-duplicate partner (brute-force
    n-gram Jaccard >= 0.5 excluded) — the shared fixture restriction
    that makes signature-based dedup/probe outcomes closed-form: only
    PLANTED exact clones can collide, everything natural is provably
    far. The SQL twin is ``_jaccard_pairs_cte`` — the oracles for
    simhash_dedup / minhash_index_probe / hamming_index_probe all
    reproduce exactly this exclusion. localCheckpoint: the restriction
    embeds a full LSH pipeline and every caller feeds it into at least
    two branches — materialize once (3.5→2.9 s at sf0.1)."""
    from jodie_spark.operators.text_dedup import ngram_jaccard_pairs
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5)
    paired = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    return docs.join(paired, "doc_id", "left_anti").localCheckpoint(eager=False)


def _q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.text_dedup import simhash_dedup

    # Restrict to documents with no true near-duplicate partner (their
    # drop set under SimHash is data-dependent, not SQL-expressible),
    # then plant exact text clones: hamming(simhash) = 0, so a correct
    # banded dedup MUST drop every clone and nothing else — which IS
    # SQL-expressible (brute-force Jaccard finds the excluded docs).
    base = _no_near_dup_base(spark, sf_dir)
    clones = base.filter("doc_id < 50").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    # max_hamming=1: the synthetic corpus is word-bag-similar enough
    # that unrelated docs sit at hamming 2-6; the planted clones are at
    # hamming 0, so 1 separates them deterministically.
    return simhash_dedup(
        base.unionByName(clones), "text", "doc_id", max_hamming=1
    ).select("doc_id")


def _q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.text_dedup import ngram_jaccard_pairs
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).select(
        "id_a", "id_b"
    )


def _q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.text_dedup import embedding_dedup
    from jodie_spark.sources import load_table

    # Plant exact vector copies (ids +100000 of vec_id < 20): cosine
    # exactly 1.0 ≥ 0.99, identical SRP signature in every table, so a
    # correct pipeline MUST drop all 20 clones; natural pairs top out
    # at cosine ≈ 0.51 so nothing else may be dropped. Survivors ≡ the
    # original table — the DuckDB oracle.
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clones = emb.filter("vec_id < 20").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(clones)
    dim = len(emb.take(1)[0]["embedding"])
    return embedding_dedup(aug, "embedding", "vec_id", dim, threshold=0.99).select("vec_id")


def _q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-mode multimodal decode: per doc, synthesize an actual image
    — 24-bit BMP (doc_id%3=0), 8-bit RGB PNG (=1), or grayscale PNG
    (=2), PNG scanline filter doc_id%5 so all five unfilter paths run
    in-query — plus a PCM WAV, then decode everything through the
    Arrow-batched operators. The oracle checks decoded dims, the
    gradient pixel-value sum (proves filter/row reconstruction, closed
    form in doc_id), the BMP byte size (54 + padded-row×h; PNG's zlib
    length is not SQL-expressible so n_bytes is NULL there), and the
    WAV duration arithmetic — real parsing, no hashes."""
    from collections.abc import Iterator as _It

    import numpy as _np
    import pandas as _pd

    from jodie_spark.operators.multimodal import (
        decode_audio,
        decode_images,
        image_pixel_stats,
    )
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 200").select("doc_id")

    media_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("data", T.BinaryType()),
            T.StructField("audio", T.BinaryType()),
        ]
    )

    def _synth(it: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        from jodie_spark.operators.codecs import encode_bmp, encode_png, encode_wav

        for pdf in it:
            imgs, wavs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 7
                yy, xx = _np.mgrid[0:h, 0:w]
                base = did + 7 * yy + 3 * xx  # gradient: filters see real deltas
                fmt = did % 3
                if fmt == 2:
                    gray = (base % 256).astype(_np.uint8)
                    imgs.append(encode_png(gray, filters=did % 5))
                else:
                    px = ((base[:, :, None] + _np.arange(3)) % 256).astype(_np.uint8)
                    imgs.append(
                        encode_bmp(px) if fmt == 0 else encode_png(px, filters=did % 5)
                    )
                n = 500 + did % 300
                wavs.append(
                    encode_wav(_np.zeros((n, 1), dtype=_np.int16), 8000)
                )
            yield _pd.DataFrame(
                {"doc_id": pdf["doc_id"], "data": imgs, "audio": wavs}
            )

    media = docs.mapInPandas(_synth, media_schema)
    decoded = decode_images(media, binary_col="data", mode="real")
    decoded = image_pixel_stats(decoded, binary_col="data", mode="real")
    decoded = decode_audio(decoded, binary_col="audio", mode="real")
    return decoded.select(
        "doc_id",
        "width",
        "height",
        "n_pixels",
        "px_sum",
        F.when(F.col("doc_id") % 3 == 0, F.length("data"))
        .cast("long")
        .alias("n_bytes"),
        "sample_rate",
        F.col("n_samples"),
        "duration_ms",
    )


def _q_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup over REAL decoded pixels: per doc a
    deterministic noise image (BMP for even ids, PNG otherwise), plus a
    CROSS-FORMAT exact clone for every 10th doc (same pixels, the other
    container), a LOSSY JPEG q97 clone for ids ≡5 (mod 10), a
    PROGRESSIVE JPEG q97 clone for ids ≡3 (mod 10) (SOF2 successive
    approximation through the native decoder), and a lossless GIF clone
    for ids ≡8 (mod 10) — the JPEG and GIF
    decoders in the dedup path. dHash is computed on
    decoded pixels, so lossless clones collide at hamming 0 and the
    JPEG clones land ≤4 bits away (measured worst case over the
    fixture seeds; the progressive lane's worst is 4), while distinct
    noise images sit ≥16 bits apart — at max_hamming=4 with 8-bit
    bands (pigeonhole recall to hamming 7) survivors are exactly the
    originals, closed-form in doc_id."""
    from collections.abc import Iterator as _It

    import numpy as _np
    import pandas as _pd

    from jodie_spark.operators.media_dedup import image_dedup
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 300").select("doc_id")

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("data", T.BinaryType())]
    )

    def _synth(it: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        from jodie_spark.operators.codecs import encode_bmp, encode_jpeg, encode_png

        for pdf in it:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.random.default_rng(did).integers(
                    0, 256, (16, 12, 3), dtype=_np.uint8
                )
                enc_a = encode_bmp(px) if did % 2 == 0 else encode_png(px, filters=did % 5)
                ids.append(did)
                blobs.append(enc_a)
                if did % 10 == 0:  # exact clone in the OTHER container
                    enc_b = (
                        encode_png(px, filters=0) if did % 2 == 0 else encode_bmp(px)
                    )
                    ids.append(did + 100_000)
                    blobs.append(enc_b)
                elif did % 10 == 5:  # lossy JPEG near-clone (≤3 bits)
                    ids.append(did + 100_000)
                    blobs.append(encode_jpeg(px, quality=97))
                elif did % 10 == 3:  # PROGRESSIVE JPEG near-clone (SOF2)
                    from jodie_spark.operators.codecs import (
                        encode_jpeg_progressive,
                    )

                    ids.append(did + 100_000)
                    blobs.append(encode_jpeg_progressive(px, quality=97))
                elif did % 10 == 8:  # lossless GIF clone (hamming 0)
                    from jodie_spark.operators.codecs import encode_gif

                    ids.append(did + 100_000)
                    blobs.append(encode_gif(px))
            yield _pd.DataFrame({"doc_id": ids, "data": blobs})

    media = docs.mapInPandas(_synth, out_schema)
    return image_dedup(
        media, binary_col="data", id_col="doc_id", max_hamming=4, bands=8
    ).select("doc_id")


def _make_audio_dedup_query(flac_lane: bool):
    """Two bench-stable variants of the audio-dedup workload (VERDICT
    r8 item 3: never change an existing bench query's work — add a new
    name). ``audio_dedup`` is the r7-comparable WAV-only lane;
    ``audio_dedup_flac`` adds the CROSS-FORMAT native-FLAC clone lane
    introduced in round 8 (same PCM, different container, decoded by
    the native FLAC codec)."""

    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from collections.abc import Iterator as _It

        import numpy as _np
        import pandas as _pd

        from jodie_spark.operators.media_dedup import audio_dedup
        from jodie_spark.sources import load_table

        docs = (
            load_table(spark, sf_dir, "documents")
            .filter("doc_id < 300")
            .select("doc_id")
        )

        out_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("data", T.BinaryType()),
            ]
        )

        def _synth(it: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
            from jodie_spark.operators.codecs import encode_flac, encode_wav

            for pdf in it:
                ids, blobs = [], []
                for did in pdf["doc_id"]:
                    did = int(did)
                    rng = _np.random.default_rng(did)
                    n = 4000
                    env = _np.abs(rng.standard_normal(64)).repeat(n // 64 + 1)[:n]
                    sig = (rng.standard_normal(n) * env * 8000).astype(_np.int16)
                    wav = encode_wav(sig.reshape(-1, 1), 8000)
                    ids.append(did)
                    blobs.append(wav)
                    if did % 10 == 0:  # exact WAV clone
                        ids.append(did + 100_000)
                        blobs.append(wav)
                    elif flac_lane and did % 10 == 5:
                        # lossless FLAC clone of the same PCM
                        ids.append(did + 100_000)
                        blobs.append(
                            encode_flac(sig, 8000, channel_mode="independent")
                        )
                yield _pd.DataFrame({"doc_id": ids, "data": blobs})

        media = docs.mapInPandas(_synth, out_schema)
        return audio_dedup(
            media, binary_col="data", id_col="doc_id", max_hamming=2
        ).select("doc_id")

    return _q


#: Loudness-envelope audio dedup over REAL decoded PCM: per doc a
#: deterministic amplitude-modulated noise track plus an exact WAV
#: clone for every 10th doc. Clones collide at hamming 0; distinct
#: envelopes sit far apart — survivors are exactly the originals.
_q_audio_dedup = _make_audio_dedup_query(flac_lane=False)
#: Same workload plus the cross-format native-FLAC clone lane for ids
#: ≡5 (mod 10) — the codec-heavy variant benchmarked separately.
_q_audio_dedup_flac = _make_audio_dedup_query(flac_lane=True)


def _q_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-set video dedup over REAL decoded frame streams: per doc a
    deterministic 5-frame noise stream; every 10th doc gets a clone
    whose frames are the SAME footage re-ordered (reversed) — frame-set
    Jaccard 1.0, so it must drop regardless of frame order. Survivors
    are exactly the originals."""
    from collections.abc import Iterator as _It

    import numpy as _np
    import pandas as _pd

    from jodie_spark.operators.media_dedup import video_dedup
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 200").select("doc_id")

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("data", T.BinaryType())]
    )

    def _synth(it: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        from jodie_spark.operators.codecs import encode_frame_stream

        for pdf in it:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                rng = _np.random.default_rng(did)
                fs = [
                    rng.integers(0, 256, (12, 10, 3), dtype=_np.uint8)
                    for _ in range(5)
                ]
                ids.append(did)
                blobs.append(encode_frame_stream(fs))
                if did % 10 == 0:
                    ids.append(did + 100_000)
                    blobs.append(encode_frame_stream(list(reversed(fs))))
            yield _pd.DataFrame({"doc_id": ids, "data": blobs})

    media = docs.mapInPandas(_synth, out_schema)
    return video_dedup(
        media, binary_col="data", id_col="doc_id", threshold=0.8
    ).select("doc_id")


def _q_variant_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant data type under the value oracle: build a variant column
    from per-doc JSON, write a REAL variantType Delta table (protocol
    auto-upgrades to the feature), delete/update through it, and read
    back with variant_get — the oracle reproduces the same arithmetic
    on the source ids."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable, write_delta

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 200").select("doc_id")
    vdf = docs.selectExpr(
        "doc_id",
        "parse_json(concat('{\"a\": ', doc_id, ', \"b\": \"x', doc_id, '\"}')) as v",
    )
    p = _tmp("variant_tbl")
    write_delta(vdf, p)
    t = DeltaTable.forPath(spark, p)
    t.delete("doc_id % 7 = 0")
    t.update("doc_id % 10 = 1", {"v": "parse_json(concat('{\"a\": ', doc_id * 2, '}'))"})
    return (
        DeltaTable.forPath(spark, p)
        .toDF()
        .selectExpr(
            "doc_id",
            "variant_get(v, '$.a', 'long') as a",
            "variant_get(v, '$.b', 'string') as b",
        )
    )


def _q_column_mapping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping mode=id DML under the value oracle: hand-build a
    FOREIGN id-mapped table (parquet column names deliberately differ
    from physicalName — only footer field ids line up, the shape an
    Iceberg-converted / UniForm writer produces), then delete, update
    and append through this engine and read the result back by field
    id. The oracle reproduces the same arithmetic on the customer ids."""
    import json as _json

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable, write_delta

    keys = sorted(
        r[0]
        for r in load_table(spark, sf_dir, "customer")
        .filter("c_custkey < 300")
        .select("c_custkey")
        .collect()
    )
    path = _tmp("cmid")
    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir)

    def fmeta(cid, phys):
        return {
            "delta.columnMapping.id": cid,
            "delta.columnMapping.physicalName": phys,
        }

    schema_string = _json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": fmeta(1, "col-k")},
                {"name": "grp", "type": "string", "nullable": True, "metadata": fmeta(2, "col-g")},
            ],
        }
    )
    arrow_schema = _pa.schema(
        [
            _pa.field("zz_key", _pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            _pa.field("zz_grp", _pa.string(), metadata={b"PARQUET:field_id": b"2"}),
        ]
    )
    rel = "part-0.parquet"
    _pq.write_table(
        _pa.table(
            {"zz_key": keys, "zz_grp": [f"g{k % 5}" for k in keys]},
            schema=arrow_schema,
        ),
        os.path.join(path, rel),
    )
    meta = {
        "id": "cmid-oracle",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_string,
        "partitionColumns": [],
        "configuration": {
            "delta.columnMapping.mode": "id",
            "delta.columnMapping.maxColumnId": "2",
        },
        "createdTime": 0,
    }
    with open(os.path.join(log_dir, "%020d.json" % 0), "w") as fh:
        fh.write(
            _json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}})
            + "\n"
        )
        fh.write(_json.dumps({"metaData": meta}) + "\n")
        fh.write(
            _json.dumps(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(path, rel)),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )

    t = DeltaTable.forPath(spark, path)
    t.delete("k % 7 = 0")
    t.update("k % 10 = 1", {"grp": "'updated'"})
    new_rows = (
        spark.createDataFrame([(k,) for k in keys if k % 50 == 0], "k long")
        .selectExpr("k + 100000 as k", "'new' as grp")
    )
    write_delta(new_rows, path, mode="append")
    return DeltaTable.forPath(spark, path).toDF().select("k", "grp")


def _q_datasource_field_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping mode=id through the PYTHON DATASOURCE
    (spark.read.format('jodie_delta')): a foreign id-mapped table
    whose parquet column names differ from physicalName (only footer
    field ids line up), DELETEd through the engine so the scan mixes
    one foreign-named file with one engine-rewritten (physicalName +
    footer-id) file — executor pyarrow readers must resolve BOTH by
    field id. Round 9 closed this gap (the datasource previously
    refused mode=id)."""
    import json as _json

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from jodie_spark.sources import load_table
    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import DeltaTable

    keys = sorted(
        r[0]
        for r in load_table(spark, sf_dir, "customer")
        .filter("c_custkey < 300")
        .select("c_custkey")
        .collect()
    )
    path = _tmp("dsfid")
    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir)

    def fmeta(cid, phys):
        return {
            "delta.columnMapping.id": cid,
            "delta.columnMapping.physicalName": phys,
        }

    schema_string = _json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": fmeta(1, "col-k")},
                {"name": "grp", "type": "string", "nullable": True, "metadata": fmeta(2, "col-g")},
            ],
        }
    )
    arrow_schema = _pa.schema(
        [
            _pa.field("aa_key", _pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            _pa.field("aa_grp", _pa.string(), metadata={b"PARQUET:field_id": b"2"}),
        ]
    )
    rel = "part-0.parquet"
    _pq.write_table(
        _pa.table(
            {"aa_key": keys, "aa_grp": [f"g{k % 5}" for k in keys]},
            schema=arrow_schema,
        ),
        os.path.join(path, rel),
    )
    meta = {
        "id": "dsfid-oracle",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_string,
        "partitionColumns": [],
        "configuration": {
            "delta.columnMapping.mode": "id",
            "delta.columnMapping.maxColumnId": "2",
        },
        "createdTime": 0,
    }
    with open(os.path.join(log_dir, "%020d.json" % 0), "w") as fh:
        fh.write(
            _json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}})
            + "\n"
        )
        fh.write(_json.dumps({"metaData": meta}) + "\n")
        fh.write(
            _json.dumps(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(path, rel)),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )

    DeltaTable.forPath(spark, path).delete("k % 7 = 0")  # rewrites by fid
    register(spark)
    return (
        spark.read.format("jodie_delta").load(path).select("k", "grp")
    )


def _q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.corpus import clean_corpus
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return clean_corpus(docs, min_quality=0.5, min_tokens=10).select(
        "doc_id", "n_tokens", F.col("quality"), "fingerprint"
    )


def _q_clean_corpus_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.corpus import clean_corpus
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return clean_corpus(
        docs,
        min_quality=0.5,
        min_tokens=10,
        fuzzy=True,
        fuzzy_kwargs={"verify_threshold": 0.5, "transitive": True},
    ).select("doc_id")


def _q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles of document length: histogram
    (shuffle = distinct lengths, not rows) + the packing two-phase
    prefix sum + broadcast target ranks — value = smallest length whose
    cumulative count reaches ceil(q*N). Closed-form, oracle-exact."""
    from jodie_spark.operators.profile import exact_quantiles
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        F.length("text").alias("len")
    )
    return exact_quantiles(docs, "len", [0.5, 0.9, 0.95, 0.99, 1.0]).select(
        "q", F.col("value").cast("long").alias("value")
    )


def _q_heavy_hitters_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact heavy hitters (per-language stopword discovery):
    an independent Misra-Gries summary per language feeds a guaranteed
    candidate superset; the exact broadcast recount makes the output
    value-for-value the per-group SQL HAVING answer."""
    from jodie_spark.functions.text import _words
    from jodie_spark.operators.heavy_hitters import heavy_hitters
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "lang", F.explode(_words(F.col("text"))).alias("token")
    )
    return heavy_hitters(tokens, "token", phi=0.02, group_col="lang").select(
        "lang", F.col("value").alias("token"),
        F.col("cnt").cast("long").alias("cnt"),
    )


def _q_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: highest-quality documents whose
    exclusive running token total stays under the budget (quality desc,
    doc_id tiebreak; the straddler is kept). Distributed two-phase
    prefix sum; the oracle is the identical SQL window."""
    from jodie_spark.functions.text import with_text_stats
    from jodie_spark.operators.corpus import select_token_budget
    from jodie_spark.sources import load_table

    docs = with_text_stats(load_table(spark, sf_dir, "documents"))
    return select_token_budget(docs, budget=5000).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
    )


def _q_quantiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact quantiles (per-language length percentiles):
    group-partitioned cumulative histogram + broadcast per-group target
    ranks — closed-form, value-for-value oracle-checkable."""
    from jodie_spark.operators.profile import exact_quantiles
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.length("text").alias("len")
    )
    return exact_quantiles(
        docs, "len", [0.5, 0.9, 0.99], group_col="lang"
    ).select("lang", "q", F.col("value").cast("long").alias("value"))


def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over the corpus's word tokens: Misra-Gries
    candidate generation per partition (bounded k=⌈1/φ⌉ counters, a
    superset guarantee) + an exact broadcast-semi-join recount — so the
    result is value-for-value the SQL ``HAVING count(*) > φ·N`` answer
    while the shuffle carries candidates, never the vocabulary."""
    from jodie_spark.operators.heavy_hitters import token_heavy_hitters
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return token_heavy_hitters(docs, "text", phi=0.01).select(
        "token", F.col("cnt").cast("long").alias("cnt")
    )


def _q_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.corpus import token_frequencies
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return token_frequencies(docs, top_k=100).select(
        "token", F.col("n_occurrences").cast("long").alias("n_occurrences")
    )


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.corpus import corpus_stats
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return corpus_stats(docs)


def _q_as_of_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each non-checkpoint event sees the latest
    checkpoint event of the same user at-or-before its timestamp."""
    from jodie_spark.operators.temporal_joins import as_of_join
    from jodie_spark.sources import load_table

    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    left = events.filter("event_id % 10 <> 0").select("user_id", "ts", "event_id")
    right = (
        events.filter("event_id % 10 = 0")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("ref_value"))
    )
    out = as_of_join(left, right, "user_id", "ts")
    return out.select("event_id", "right_ref_value")


def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators.temporal_joins import range_join
    from jodie_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    ranges = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 300.0, "high"),
         (300.0, 500.0, "extreme")],
        "lo double, hi double, label string",
    )
    out = range_join(events.select("event_id", "value"), ranges, "value", bucket_width=50.0)
    return out.select("event_id", "label")


def _q_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.sources import load_table
    from jodie_spark.streaming import windowed_event_counts

    events = load_table(spark, sf_dir, "events")
    wc = windowed_event_counts(events, "1 hour")
    return wc.select(
        F.unix_timestamp("window_start").alias("window_epoch"),
        "event_type",
        "n_events",
    )




def _q_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Structured Streaming run under the value oracle: events
    ride a jodie_delta readStream through the watermarked tumbling
    window into a complete-mode memory sink (availableNow trigger, so
    the run terminates deterministically). Result must equal the batch
    aggregation — which is exactly what the SQL oracle states."""
    import uuid as _uuid

    from jodie_spark.sources import load_table
    from jodie_spark.sources.datasource import register
    from jodie_spark.streaming import windowed_event_counts
    from jodie_spark.tables.table import write_delta

    register(spark)
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        # watermarks require TIMESTAMP (the parquet column is NTZ; the
        # session runs UTC so the instant is unchanged)
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )
    p = _tmp("stream_wc_src")
    write_delta(events, p)
    stream = spark.readStream.format("jodie_delta").load(p).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    agg = windowed_event_counts(stream, "1 hour", watermark="10 minutes")
    name = f"swc_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", _tmp("stream_wc_ck"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.unix_timestamp("window_start").alias("window_epoch"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
    )




def _q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom STATEFUL streaming operator (applyInPandasWithState
    sessionization) under the value oracle: events stream from a
    jodie_delta source, per-user session ids are assigned by the
    GroupState kernel, and the availableNow trigger drains the snapshot
    in one deterministic run. The oracle is the lag/cumulative-sum SQL
    formulation of the same gap rule."""
    import uuid as _uuid

    from jodie_spark.sources import load_table
    from jodie_spark.sources.datasource import register
    from jodie_spark.streaming.stateful import streaming_sessionize
    from jodie_spark.tables.table import write_delta

    register(spark)
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
    ).filter("user_id < 200")
    p = _tmp("stream_sess_src")
    write_delta(events, p)
    stream = spark.readStream.format("jodie_delta").load(p).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    sess = streaming_sessionize(stream, gap_minutes=30)
    name = f"sess_{_uuid.uuid4().hex[:8]}"
    q = (
        sess.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", _tmp("stream_sess_ck"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "user_id", "event_id", F.col("session_seq").cast("int").alias("session_seq")
    )


def _q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup under the value oracle: documents
    plus re-deliveries (every third doc re-sent 5 minutes later under a
    new delivery id) stream from a jodie_delta source through
    ``dropDuplicatesWithinWatermark`` on the content fingerprint; the
    availableNow trigger drains deterministically. Survivors project to
    fingerprints only (which delivery survives is arbitrary, which
    CONTENT survives is not) — the oracle is one row per distinct
    normalized-content md5 of the original corpus: if the stream failed
    to drop a re-delivery its fingerprint would appear twice and the
    row count would mismatch."""
    import uuid as _uuid

    from jodie_spark.sources import load_table
    from jodie_spark.sources.datasource import register
    from jodie_spark.streaming.dedup import streaming_exact_dedup
    from jodie_spark.tables.table import write_delta

    register(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id)"
        ).alias("ts"),
    )
    redelivered = docs.filter("doc_id % 3 = 0").select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("ts"),
    )
    src = _tmp("stream_dd_src")
    write_delta(docs.unionByName(redelivered), src)
    stream = spark.readStream.format("jodie_delta").load(src).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    deduped = streaming_exact_dedup(
        stream, "text", ts_col="ts", watermark="10 minutes", keep_fingerprint=True
    )
    name = f"sdd_{_uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", _tmp("stream_dd_ck"))
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(F.col("__fp__").alias("fp"))


def _q_streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC-apply merge sink under the value oracle: a change feed
    (updates for custkey%10=0, deletes for custkey%7=0, inserts of new
    keys for custkey%50=0, out-of-order sequence numbers) streams from
    a jodie_delta source across TWO checkpoint-resumed passes and
    MERGEs into a pre-created customer snapshot via foreachBatch —
    pass 2's deletes must sequence over pass 1's already-applied
    updates (cross-batch, not within-batch last-wins). The final table
    state is closed-form in c_custkey, which is exactly what the
    oracle states."""
    from jodie_spark.sources import load_table
    from jodie_spark.sources.datasource import register
    from jodie_spark.streaming.delta_sink import write_stream_merge_to_delta
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter("c_custkey <= 500")
        .select(
            "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("c_acctbal")
        )
    )
    tgt = _tmp("cdc_apply_tgt")
    write_delta(cust.withColumn("seq", F.lit(1).cast("int")), tgt)

    updates = cust.filter("c_custkey % 10 = 0").select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        F.lit(2).cast("int").alias("seq"),
        F.lit(False).alias("deleted"),
    )
    deletes = cust.filter("c_custkey % 7 = 0").select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(3).cast("int").alias("seq"),
        F.lit(True).alias("deleted"),
    )
    inserts = cust.filter("c_custkey % 50 = 0").select(
        (F.col("c_custkey") + 100_000).alias("c_custkey"),
        F.concat(F.lit("new account "), F.col("c_custkey")).alias("c_name"),
        F.col("c_custkey").cast("double").alias("c_acctbal"),
        F.lit(2).cast("int").alias("seq"),
        F.lit(False).alias("deleted"),
    )
    # the feed arrives in TWO stream passes over one checkpoint: pass 1
    # MERGEs the updates+inserts, pass 2 (resuming from the checkpoint)
    # MERGEs the deletes — so the delete for a %70 key must sequence
    # over the update its earlier batch already applied. This is the
    # cross-batch CDC path, not within-batch last-wins.
    src = _tmp("cdc_apply_src")
    ck = _tmp("cdc_apply_ck")
    write_delta(updates.unionByName(inserts), src)

    def _drain():
        q = write_stream_merge_to_delta(
            spark.readStream.format("jodie_delta").load(src),
            tgt,
            ck,
            keys=["c_custkey"],
            sequence_col="seq",
            delete_col="deleted",
            available_now=True,
        )
        q.awaitTermination()

    _drain()
    write_delta(deletes, src, mode="append")
    _drain()
    return DeltaTable.forPath(spark, tgt).toDF().select(
        "c_custkey", "c_name", "c_acctbal", "seq"
    )


def _q_streaming_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming Type-2 SCD sink under the value oracle: a change
    feed over the customer dimension streams in TWO checkpoint-resumed
    passes — pass 1 creates the dimension (everything current at
    version 1), pass 2 changes the tracked attribute for custkey%10=0
    (closing the old row at version 2 and opening a new current one)
    and no-ops custkey%10=1 (same attribute value ⇒ history untouched).
    SCD time columns are type-generic (int versions here), so the final
    dimension state is closed-form in c_custkey."""
    from jodie_spark.sources import load_table
    from jodie_spark.sources.datasource import register
    from jodie_spark.streaming.delta_sink import write_stream_scd2_to_delta
    from jodie_spark.tables.table import DeltaTable, write_delta

    register(spark)
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter("c_custkey <= 300")
        .select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("balance"),
            F.lit(1).cast("int").alias("eff"),
        )
    )
    src = _tmp("scd2_src")
    dim = _tmp("scd2_dim")
    ck = _tmp("scd2_ck")
    write_delta(cust, src)

    def _drain():
        q = write_stream_scd2_to_delta(
            spark.readStream.format("jodie_delta").load(src),
            dim,
            ck,
            primary_key="c_custkey",
            attr_cols=["balance"],
            effective_time_col="eff",
            available_now=True,
        )
        q.awaitTermination()

    _drain()
    changes = cust.filter("c_custkey % 10 <= 1").select(
        "c_custkey",
        # %10=0 rows actually change; %10=1 rows carry the same value
        F.when(F.col("c_custkey") % 10 == 0, F.col("balance") + 100)
        .otherwise(F.col("balance"))
        .alias("balance"),
        F.lit(2).cast("int").alias("eff"),
    )
    write_delta(changes, src, mode="append")
    _drain()
    return DeltaTable.forPath(spark, dim).toDF().select(
        "c_custkey", "balance", "is_current", "eff", "end_time"
    )


def _q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream-shaped interval join on the unified API: purchases
    within 30 minutes after a view by the same user (the
    impression→conversion shape). Batch plan: one shuffle on user_id
    with the time bounds as join filters — no cartesian; the same code
    with ``watermark=`` runs as a state-bounded Structured Streaming
    join."""
    from jodie_spark.sources import load_table
    from jodie_spark.streaming.events import interval_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter("event_type = 'view'").select("user_id", "ts", "event_id")
    buys = ev.filter("event_type = 'purchase'").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = interval_join(
        views, buys, on="user_id", lower="0 seconds", upper="30 minutes"
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("value_r"), 3).alias("attributed_value"),
    )


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.sources import load_table
    from jodie_spark.streaming import sessionize

    events = load_table(spark, sf_dir, "events")
    s = sessionize(events, "30 minutes")
    return s.groupBy("user_id").agg(F.max("session_seq").alias("n_sessions"))


# ---------------------------------------------------------------------------
# TPC-H-style correctness anchors
# ---------------------------------------------------------------------------

def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planned as per-partition top-k + final merge
    (TakeOrderedAndProject), never a full sort."""
    orders = _orders(spark, sf_dir)
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def _q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.sources import load_table

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# rows-only (layout-dependent) queries
# ---------------------------------------------------------------------------

def _q_file_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic layout (one file per partition value via
    repartition-by-key) so the partition keys and file counts are
    value-checkable; byte statistics stay in the operator but out of
    the compared projection (parquet encoding sizes are not portable
    across writers)."""
    from jodie_spark.tables.distribution import delta_file_size_distribution

    orders = _orders(spark, sf_dir).repartition(F.col("o_orderstatus"))
    t = _delta_from(orders, "dist", partition_by=["o_orderstatus"])
    df = delta_file_size_distribution(spark, t.path)
    return df.select(
        F.col("partitionValues")[0]["value"].alias("status"),
        F.col("num_of_parquet_files"),
        (F.col("min_file_size") > 0).alias("has_positive_sizes"),
        (F.col("max_file_size") >= F.col("min_file_size")).alias("sizes_ordered"),
    )


def _q_num_record_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic layout: repartition by the partition column before a
    partitioned write ⇒ exactly one file per partition value, so the
    per-partition record distribution is value-checkable."""
    from jodie_spark.tables.distribution import delta_num_record_distribution

    orders = _orders(spark, sf_dir).repartition(F.col("o_orderstatus"))
    t = _delta_from(orders, "nrdist", partition_by=["o_orderstatus"])
    dist = delta_num_record_distribution(spark, t.path)
    return dist.select(
        F.col("partitionValues")[0]["value"].alias("o_orderstatus"),
        F.col("num_of_parquet_files").cast("long").alias("num_of_parquet_files"),
        F.col("mean_num_records_in_files").cast("double").alias("mean_num_records_in_files"),
    )


def _q_shuffle_files_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same deterministic layout ⇒ the per-class skipping counts are
    exact: 3 one-file partitions, equality on one value keeps 1 file."""
    from jodie_spark.tables.distribution import get_num_shuffle_files

    orders = _orders(spark, sf_dir).repartition(F.col("o_orderstatus"))
    t = _delta_from(orders, "shufdet", partition_by=["o_orderstatus"])
    result = get_num_shuffle_files(spark, t.path, "o_orderstatus = 'F'")
    rows = [(k, int(v)) for k, v in result.items() if isinstance(v, int)]
    return spark.createDataFrame(rows, "metric string, num_files long")


def _q_num_shuffle_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural MULTI-FILE layout made deterministic (VERDICT r9 item
    5) the way the reference's own test does it
    (DeltaHelperSpec.scala:874 pins maxRecordsPerFile): rows arrive at
    the writer sorted by (o_orderstatus, o_orderkey), so the dynamic
    partition writer emits, per status, ceil(n/2000) files whose
    o_orderkey ranges are consecutive sorted chunks — every per-file
    min/max (and therefore every skipping count) is closed-form in the
    input, unlike the old natural-task layout which was rows-only."""
    from jodie_spark.tables.distribution import get_num_shuffle_files

    orders = _orders(spark, sf_dir)
    old = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "2000")
    try:
        t = _delta_from(
            orders.repartition(F.col("o_orderstatus")).sortWithinPartitions(
                "o_orderstatus", "o_orderkey"
            ),
            "shuf",
            partition_by=["o_orderstatus"],
        )
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", old)
    result = get_num_shuffle_files(
        spark, t.path, "o_orderstatus = 'F' and o_orderkey >= 1000"
    )
    rows = [(k, int(v)) for k, v in result.items() if isinstance(v, int)]
    return spark.createDataFrame(rows, "metric string, num_files long")


def _q_delta_file_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.operators import delta_file_sizes, latest_version
    from jodie_spark.sources import load_table

    t = _delta_from(load_table(spark, sf_dir, "nation"), "sizes")
    sizes = delta_file_sizes(t)
    v = latest_version(spark, t.path)
    # byte metrics are computed (and pytest-checked for the reference's
    # integer-division quirk) but kept out of the compared values —
    # parquet encoding sizes are not portable across writers
    rows = [
        ("number_of_files", int(sizes["number_of_files"])),
        ("size_in_bytes_positive", int(int(sizes["size_in_bytes"]) > 0)),
        ("average_file_size_positive", int(int(sizes["average_file_size_in_bytes"]) > 0)),
        ("latest_version", int(v)),
    ]
    return spark.createDataFrame(rows, "metric string, value long")


def _q_optimize_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable, write_delta

    nation = load_table(spark, sf_dir, "nation")
    path = _tmp("opt")
    write_delta(nation.repartition(8), path)
    t = DeltaTable.forPath(spark, path)
    t.optimize().executeCompaction()
    return t.toDF()


def _q_optimize_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (range-cluster) then verify skipping actually tightened:
    returns the per-class shuffle-file counts after clustering."""
    from jodie_spark.tables.distribution import get_num_shuffle_files
    from jodie_spark.tables.table import DeltaTable

    t = _delta_from(_orders(spark, sf_dir).repartition(8), "zord")
    t.optimize().executeZOrderBy("o_orderkey")
    result = get_num_shuffle_files(spark, t.path, "o_orderkey <= 1000")
    rows = [(k, int(v)) for k, v in result.items() if isinstance(v, int)]
    return spark.createDataFrame(rows, "metric string, num_files long")


def _q_column_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """allowColumnDefaults: create with CURRENT_DEFAULT metadata from
    even suppkeys, append odds OMITTING the defaulted columns — they
    must fill with the default expressions, not null. Oracle replays
    the same CASE arithmetic."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable, write_delta

    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    path = _tmp("coldef")
    write_delta(
        sup.filter("s_suppkey % 2 = 0"),
        path,
        column_defaults={"s_name": "'UNKNOWN'", "s_nationkey": "-1"},
    )
    write_delta(
        sup.filter("s_suppkey % 2 = 1").select("s_suppkey"), path, mode="append"
    )
    return DeltaTable.forPath(spark, path).toDF()


def _q_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front end end-to-end: DELETE, UPDATE, and a
    full-clause-set MERGE (subquery source) as SQL statements against
    a nation fixture, then a SELECT through the refreshed catalog
    view. The oracle reproduces the statement sequence in DuckDB."""
    from jodie_spark.catalog import register_delta_table
    from jodie_spark.sources import load_table
    from jodie_spark.sql import sql

    t = _delta_from(
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        ),
        "sqldml",
    )
    register_delta_table(spark, "sql_nation", t.path)
    sql(spark, "DELETE FROM sql_nation WHERE n_regionkey = 0")
    sql(spark, "UPDATE sql_nation SET n_name = lower(n_name) WHERE n_regionkey = 1")
    sql(
        spark,
        """MERGE INTO sql_nation t
           USING (SELECT 900 AS n_nationkey, 'NEWLAND' AS n_name, 9 AS n_regionkey
                  UNION ALL
                  SELECT 901, 'OLDLAND', 9) s
           ON t.n_nationkey = s.n_nationkey
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
    )
    return sql(
        spark,
        "SELECT n_nationkey, n_name, n_regionkey FROM sql_nation",
    )


def _q_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary encoding: frequency-ranked top-50 vocab over
    `documents`, then position-level token-id rows (UNK=0) for the
    first 50 docs — the corpus→token-ids step of a training pipeline,
    reproduced token-for-token in DuckDB."""
    from jodie_spark.operators.tokenize import build_vocab, encode_documents
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    vocab = build_vocab(docs, max_size=50)
    return encode_documents(docs, vocab, exploded=True).filter("doc_id < 50")


def _q_v2_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2-checkpoint lifecycle (delta.checkpointPolicy=v2): write,
    delete, checkpoint (uuid manifest + sidecars), append past it —
    every read after the checkpoint reconstructs state from the
    manifest+sidecar layout. Data + history value-checked."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.log import DeltaLog
    from jodie_spark.tables.table import DeltaTable, write_delta

    nation = load_table(spark, sf_dir, "nation")
    path = _tmp("v2cp")
    write_delta(
        nation.filter("n_nationkey < 20").repartition(3),
        path,
        options={"delta.checkpointPolicy": "v2"},
    )
    t = DeltaTable.forPath(spark, path)
    t.delete("n_regionkey = 4")
    DeltaLog(path).write_checkpoint()
    write_delta(nation.filter("n_nationkey >= 20"), path, mode="append")
    t = DeltaTable.forPath(spark, path)
    data = t.toDF().select(
        F.col("n_nationkey").cast("long").alias("version"),
        F.col("n_name").alias("operation"),
    )
    ops = t.history().select("version", "operation")
    return data.unionByName(ops)


def _q_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type widening lifecycle: create (int, float) from even suppkeys,
    append (long, double) odds under mergeSchema — the table schema
    widens, old narrow files up-cast on read. The oracle replays the
    same arithmetic: evens round-trip through REAL (float) precision,
    odds stay DOUBLE."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable, write_delta

    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    path = _tmp("widen")
    write_delta(
        sup.filter("s_suppkey % 2 = 0").select(
            F.col("s_suppkey").cast("int").alias("s_suppkey"),
            F.col("s_acctbal").cast("float").alias("s_acctbal"),
        ),
        path,
        # automatic widening is opt-in (delta.enableTypeWidening),
        # matching delta-spark: without it the append below would fail
        options={"delta.enableTypeWidening": "true"},
    )
    write_delta(
        sup.filter("s_suppkey % 2 = 1").select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        ),
        path,
        mode="append",
        options={"mergeSchema": "true"},
    )
    return DeltaTable.forPath(spark, path).toDF().select(
        "s_suppkey", F.round("s_acctbal", 4).alias("s_acctbal")
    )


def _q_liquid_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Liquid clustering lifecycle: create CLUSTER BY(n_regionkey),
    append, OPTIMIZE (re-clusters on the persisted clustering columns
    from the delta.clustering domain), ALTER CLUSTER BY. Returns the
    intact data plus the (version, operation) history trail — both
    value-checked; OPTIMIZE/CLUSTER BY must never change data."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable, write_delta

    nation = load_table(spark, sf_dir, "nation")
    path = _tmp("liquid")
    write_delta(
        nation.filter("n_nationkey < 13").repartition(4),
        path,
        cluster_by=["n_regionkey"],
    )
    write_delta(nation.filter("n_nationkey >= 13").repartition(4), path, mode="append")
    t = DeltaTable.forPath(spark, path)
    t.optimize().executeCompaction()
    t.set_cluster_by(["n_regionkey", "n_nationkey"])
    t = DeltaTable.forPath(spark, path)
    data = t.toDF().select(
        F.col("n_nationkey").cast("long").alias("version"),
        F.col("n_name").alias("operation"),
    )
    ops = t.history().select("version", "operation")
    marker = spark.createDataFrame(
        [(1000 + len(t.cluster_by()), "CLUSTER_COLS")], "version long, operation string"
    )
    return data.unionByName(ops).unionByName(marker)


def _q_row_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row tracking (writer feature): two ordered single-file writes
    into a delta.enableRowTracking table, read back through the
    datasource with withRowIds. Each write lands one file whose rows
    are suppkey-ordered, so _row_id = batch offset + rank(s_suppkey)
    and _row_commit_version = the batch's commit — pure row_number
    arithmetic the oracle reproduces."""
    from jodie_spark.sources import load_table
    from jodie_spark.sources.datasource import register
    from jodie_spark.tables.table import write_delta

    register(spark)
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    first = sup.filter("s_suppkey % 2 = 0").coalesce(1).sortWithinPartitions("s_suppkey")
    second = sup.filter("s_suppkey % 2 = 1").coalesce(1).sortWithinPartitions("s_suppkey")
    path = _tmp("rowtrack")
    write_delta(first, path, options={"delta.enableRowTracking": "true"})
    write_delta(second, path, mode="append")
    return (
        spark.read.format("jodie_delta")
        .option("withRowIds", "true")
        .load(path)
        .select("_row_id", "_row_commit_version", "s_suppkey", "s_name")
    )


def _q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate KNN graph over embeddings ∪ planted
    clones of vector 0. Restricted to the planted ids the result is
    fully deterministic: each clone's 9 nearest neighbors MUST be the
    other clones at cosine exactly 1.0 (natural max ≈0.37 at sf0.01),
    ranked by neighbor id — which the oracle reproduces as a pure
    cross-join + row_number. Proves candidate generation, narrow-pair
    dedup, and per-node top-k election end-to-end."""
    from jodie_spark.operators.similarity import knn_graph

    emb = _planted_embeddings(spark, sf_dir, 9)
    planted = [0] + [100000 + i for i in range(1, 10)]
    g = knn_graph(emb, "embedding", "vec_id", k=9)
    return g.filter(F.col("vec_id").isin(planted)).select(
        "vec_id", "neighbor_id", "sim", "rank"
    )


def _q_cdf_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed read through the `jodie_delta` Python
    DataSource (spark.read.option("readChangeFeed","true")) — the same
    change rows `read_cdf` produces, but planned/executed by Spark's
    DataSource API: one InputPartition per change-bearing file, cdc
    rows carrying their own _change_type, insert/delete rows
    synthesized executor-side from add/remove files."""
    from jodie_spark.sources import load_table
    from jodie_spark.sources.datasource import register

    register(spark)
    t = _delta_from(
        load_table(spark, sf_dir, "nation"),
        "cdfds",
        options={"delta.enableChangeDataFeed": "true"},
    )
    t.delete("n_regionkey = 0")
    t.update("n_regionkey = 1", {"n_name": "concat(n_name, '_x')"})
    return (
        spark.read.format("jodie_delta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("endingVersion", "2")
        .load(t.path)
        .select(
            "n_nationkey", "n_name", "n_regionkey", "_change_type",
            F.col("_commit_version").cast("long").alias("_commit_version"),
        )
    )


def _q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM perplexity (λ=0.7, add-1) over
    `documents` — the word-order-aware CCNet variant. Oracle
    reproduces every smoothing branch in DuckDB."""
    from jodie_spark.operators.perplexity import bigram_perplexity_score
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return bigram_perplexity_score(docs, "text", "doc_id")


def _q_identity_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta identity columns (writer feature v6): create with
    start=100/step=3 over supplier, append a second batch, and join
    the generated surrogate keys back to the payload. Identity
    guarantees uniqueness and per-write contiguous blocks here, so the
    SORTED id sequence is layout-independent: the n-th smallest id is
    exactly 100 + 3·(n−1) — which is how the oracle reproduces it
    (row_number over the same deterministic payload ordering)."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable, write_delta

    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    first = sup.filter("s_suppkey % 2 = 0")
    second = sup.filter("s_suppkey % 2 = 1")
    t = _delta_from(first, "identsrc", identity_columns={"id": {"start": 100, "step": 3}})
    write_delta(second, t.path, mode="append")
    t = DeltaTable.forPath(spark, t.path)
    df = t.toDF()
    # rank ids within each batch (even suppkeys got the first block,
    # odd the second); pair with the batch-local payload rank so the
    # result is fully deterministic despite layout-dependent assignment
    w = Window.partitionBy(F.col("s_suppkey") % 2).orderBy("id")
    v = Window.partitionBy(F.col("s_suppkey") % 2).orderBy("s_suppkey")
    ranked = df.withColumn("id_rank", F.row_number().over(w)).withColumn(
        "key_rank", F.row_number().over(v)
    )
    ids = ranked.select(
        (F.col("s_suppkey") % 2).alias("batch"),
        F.col("id_rank").alias("rnk"),
        "id",
    )
    keys = ranked.select(
        (F.col("s_suppkey") % 2).alias("batch"),
        F.col("key_rank").alias("rnk"),
        "s_suppkey",
        "s_name",
    )
    return ids.join(keys, ["batch", "rnk"]).select("batch", "rnk", "id", "s_suppkey", "s_name")


def _q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 over `documents` for a fixed query — the
    full-text ranking path (term-filtered postings, broadcast df/idf,
    TakeOrderedAndProject). Oracle reproduces the exact arithmetic
    (Lucene idf variant) in DuckDB; scores rounded to 6 decimals with
    doc_id tie-breaks keep the top-k engine-portable."""
    from jodie_spark.operators.fulltext import bm25_topk
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "merge scan shuffle", 10)


def _q_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean AND search: documents containing every query term, with
    the distinct-term hit count. Tokenize → filter-to-terms inside the
    scan stage → one distinct-count aggregation (no joins)."""
    from jodie_spark.operators.fulltext import keyword_search
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return keyword_search(docs, "merge scan", mode="all")


def _fake_mp4_encode(px) -> bytes:
    """Deterministic synthetic 'mp4' container for the decoder-override
    contract test: a real ftyp header (so ``codecs.sniff`` routes it as
    'mp4' — a format the baseline codecs refuse) followed by H, W and
    raw RGB bytes."""
    import struct as _struct

    h, w, _ = px.shape
    return (
        b"\x00\x00\x00\x18ftypisom"
        + _struct.pack("<HH", h, w)
        + px.astype("uint8").tobytes()
    )


def _fake_mp4_decode(b: bytes):
    """The matching external-codec stand-in: bytes -> (H, W, 3) uint8,
    the exact signature a real Pillow/ffmpeg-backed override has."""
    import struct as _struct

    import numpy as _np

    h, w = _struct.unpack_from("<HH", b, 12)
    return _np.frombuffer(b, dtype=_np.uint8, offset=16).reshape(h, w, 3)


def _q_decoder_override_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decoder_overrides end-to-end (VERDICT r7 item 4): image dedup
    over a corpus mixing baseline-decodable BMPs with a container the
    baseline codecs REFUSE (sniffed 'mp4'). The override routes mp4
    bytes to a deterministic external decoder, so an mp4 clone of a BMP
    collides at dhash hamming 0 and drops; a UNIQUE mp4 decodes and
    survives; an 'unknown' blob with no override skips cleanly
    (on_error='skip': NULL hash never joins) and survives. Survivors
    are closed-form in doc_id."""
    from collections.abc import Iterator as _It

    import numpy as _np
    import pandas as _pd

    from jodie_spark.operators.media_dedup import image_dedup
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 200").select("doc_id")
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("data", T.BinaryType())]
    )

    def _synth(it: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        from jodie_spark.operators.codecs import encode_bmp

        for pdf in it:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                px = _np.random.default_rng(did).integers(
                    0, 256, (16, 12, 3), dtype=_np.uint8
                )
                ids.append(did)
                blobs.append(encode_bmp(px))
                if did % 4 == 0:
                    # mp4 EXACT clone of the BMP: only decodable via
                    # the override; collides at hamming 0 → drops
                    ids.append(did + 100_000)
                    blobs.append(_fake_mp4_encode(px))
                elif did % 4 == 1:
                    # UNIQUE mp4: decodes via the override, survives
                    upx = _np.random.default_rng(did + 7_777).integers(
                        0, 256, (16, 12, 3), dtype=_np.uint8
                    )
                    ids.append(did + 100_000)
                    blobs.append(_fake_mp4_encode(upx))
                elif did % 4 == 2:
                    # unroutable garbage: no override, no baseline
                    # decoder → NULL hash, skips the join, survives
                    ids.append(did + 100_000)
                    blobs.append(b"\x00\x01" + did.to_bytes(4, "big") * 3)
            yield _pd.DataFrame({"doc_id": ids, "data": blobs})

    media = docs.mapInPandas(_synth, out_schema)
    return image_dedup(
        media,
        binary_col="data",
        id_col="doc_id",
        max_hamming=2,
        decoder_overrides={"mp4": _fake_mp4_decode},
    ).select("doc_id")


def _q_reorg_purge_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DV → REORG PURGE → GENERATE lifecycle (VERDICT r7 item 5): a
    partitioned table takes a merge-on-read DELETE (deletion vectors),
    GENERATE correctly REFUSES while DVs are live, ``REORG TABLE ...
    APPLY (PURGE)`` rewrites the DV'd files, and GENERATE then writes
    per-partition symlink manifests. The result is read back THROUGH
    the manifest files themselves (the Presto/Trino/Athena read path:
    parquet paths listed per partition dir), so the value check proves
    the manifests list exactly the live post-delete rows."""
    import urllib.parse as _up

    from jodie_spark.errors import DeltaProtocolError
    from jodie_spark.sources import load_table
    from jodie_spark.sql import sql as jsql
    from jodie_spark.tables.table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_orderstatus").alias("part")
    )
    t = _delta_from(orders, "rpm", partition_by=["part"])
    t.delete("o_orderkey % 3 = 0", deletion_vectors=True)
    try:
        t.generate()
        raise AssertionError("GENERATE must refuse while DVs are live")
    except DeltaProtocolError:
        pass
    jsql(spark, f"REORG TABLE delta.`{t.path}` APPLY (PURGE)")
    written = DeltaTable.forPath(spark, t.path).generate()

    per_part: list[DataFrame] = []
    for man in sorted(written):
        part_dir = os.path.basename(os.path.dirname(man))
        part_val = _up.unquote(part_dir.split("=", 1)[1])
        with open(man, encoding="utf-8") as fh:
            paths = [ln[len("file://"):] for ln in fh.read().splitlines() if ln]
        per_part.append(
            spark.read.parquet(*paths)
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_orderkey").alias("sum_key"),
            )
            .select(F.lit(part_val).alias("part"), "n_rows", "sum_key")
        )
    out = per_part[0]
    for df in per_part[1:]:
        out = out.unionByName(df)
    return out


def _q_uniform_iceberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniForm-style Iceberg metadata generation, value-verified by
    reading the table back THROUGH the Iceberg metadata chain exactly
    like an Iceberg reader: vN.metadata.json → current snapshot →
    manifest list (avro) → manifest (avro) → per-file typed partition
    values + parquet paths. A DELETE between two generations proves
    each conversion describes the CURRENT snapshot. Output = per
    partition (n_rows, sum_key) computed from manifest record counts
    and the listed files."""
    import json as _json

    from jodie_spark.interop.avro import read_container
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_orderstatus").alias("part")
    )
    t = _delta_from(orders, "unifi", partition_by=["part"])
    t.generate("iceberg")  # v1: full table
    t.delete("o_orderkey % 3 = 0")
    meta_path = DeltaTable.forPath(spark, t.path).generate("iceberg")[0]  # v2

    with open(meta_path, encoding="utf-8") as fh:
        md = _json.load(fh)
    snap = next(
        s for s in md["snapshots"] if s["snapshot-id"] == md["current-snapshot-id"]
    )
    _, manifests, _ = read_container(snap["manifest-list"][len("file://"):])
    per_part: list[DataFrame] = []
    for m in manifests:
        _, entries, _ = read_container(m["manifest_path"][len("file://"):])
        by_part: dict[str, list] = {}
        for e in entries:
            d = e["data_file"]
            by_part.setdefault(d["partition"]["part"], []).append(
                d["file_path"][len("file://"):]
            )
        for part_val, paths in by_part.items():
            per_part.append(
                spark.read.parquet(*paths)
                .groupBy()
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("o_orderkey").alias("sum_key"),
                )
                .select(F.lit(part_val).alias("part"), "n_rows", "sum_key")
            )
    out = per_part[0]
    for df in per_part[1:]:
        out = out.unionByName(df)
    return out


def _q_iceberg_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT TO DELTA iceberg.`path` end-to-end: build a partitioned
    Delta table from orders, delete every 3rd key, generate Iceberg
    metadata, CLONE the layout without the Delta log (an Iceberg-only
    table), convert it back to Delta purely from the Iceberg metadata
    chain, and aggregate the CONVERTED table. Proves schema, identity
    partition spec, and file set all survive the round trip."""
    import shutil

    from jodie_spark.interop.iceberg import convert_iceberg_to_delta
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_orderstatus").alias("part")
    )
    t = _delta_from(orders, "icvt", partition_by=["part"])
    t.delete("o_orderkey % 3 = 0")
    DeltaTable.forPath(spark, t.path).generate("iceberg")

    dst = _tmp("icvt_dst")
    shutil.copytree(t.path, dst, ignore=shutil.ignore_patterns("_delta_log"))
    meta_dir = os.path.join(dst, "metadata")
    for name in os.listdir(meta_dir):
        p = os.path.join(meta_dir, name)
        if name.endswith((".json", ".avro")):
            with open(p, "rb") as fh:
                data = fh.read()
            with open(p, "wb") as fh:
                fh.write(data.replace(t.path.encode(), dst.encode()))
    conv = convert_iceberg_to_delta(spark, dst)
    return (
        conv.toDF()
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").alias("sum_key"),
        )
    )


def _q_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-probe triage over a mixed media corpus: per doc a
    deterministic blob — MP4 (ids ≡0 mod 4, ISO-BMFF box tree parse),
    WAV (≡1), native FLAC (≡2), BMP (≡3) — probed for container,
    duration, geometry, codecs and sample counts WITHOUT decoding any
    codec payload. Every field is closed-form in doc_id."""
    from collections.abc import Iterator as _It

    import numpy as _np
    import pandas as _pd

    from jodie_spark.operators.multimodal import probe_media
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 400").select("doc_id")
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("data", T.BinaryType())]
    )

    def _synth(it: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        from jodie_spark.operators.codecs import (
            encode_bmp,
            encode_flac,
            encode_mp4_stub,
            encode_wav,
        )

        for pdf in it:
            ids, blobs = [], []
            for did in pdf["doc_id"]:
                did = int(did)
                m = did % 4
                if m == 0:
                    blob = encode_mp4_stub(
                        width=320 + did,
                        height=240 + did,
                        n_video_samples=24 + did,
                        audio_rate=8000,
                        n_audio_samples=100 + did,
                        duration_ms=1000 + did,
                    )
                elif m == 1:
                    n = 800 + did
                    sig = (_np.arange(n) % 199 - 99).astype(_np.int16)
                    blob = encode_wav(sig.reshape(-1, 1), 8000)
                elif m == 2:
                    n = 800 + did
                    sig = (_np.arange(n) % 199 - 99).astype(_np.int16)
                    blob = encode_flac(sig, 8000)
                else:
                    px = _np.zeros((8 + did % 16, 6 + did % 8, 3), _np.uint8)
                    blob = encode_bmp(px)
                ids.append(did)
                blobs.append(blob)
            yield _pd.DataFrame({"doc_id": ids, "data": blobs})

    media = docs.mapInPandas(_synth, out_schema)
    return probe_media(media).select(
        "doc_id", "container", "duration_ms", "width", "height",
        "video_codec", "audio_codec", "n_video_samples",
        "n_audio_samples", "audio_rate",
    )


def _q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion (ISO 28500 — the Common Crawl container): write
    the documents corpus into two WARC segment files (one plain, one
    per-record-gzip like Common Crawl ships), read them back with the
    distributed file-parallel reader, and surface the HTTP layer. Every
    doc yields a 200 response carrying its text; ids ≡0 (mod 5) also a
    404 with a synthetic body — statuses, URIs and exact payload byte
    lengths are closed-form in doc_id."""
    from jodie_spark.sources import load_table
    from jodie_spark.sources.warc import encode_warc, read_warc

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter("doc_id < 500")
        .select("doc_id", "text")
        .collect()
    )
    d = tempfile.mkdtemp(prefix="jodie_warc_")
    for half, gz in ((0, False), (1, True)):
        recs = []
        for r in sorted(docs, key=lambda r: r["doc_id"]):
            did = int(r["doc_id"])
            if did % 2 != half:
                continue
            recs.append(
                {
                    "warc_type": "response",
                    "target_uri": f"https://corpus.example/doc/{did}",
                    "http_status": 200,
                    "http_content_type": "text/html",
                    "payload": (r["text"] or "").encode("utf-8"),
                }
            )
            if did % 5 == 0:
                recs.append(
                    {
                        "warc_type": "response",
                        "target_uri": f"https://corpus.example/doc/{did}",
                        "http_status": 404,
                        "http_content_type": "text/plain",
                        "payload": f"not found:{did}".encode(),
                    }
                )
        name = f"seg{half}.warc" + (".gz" if gz else "")
        with open(os.path.join(d, name), "wb") as fh:
            fh.write(encode_warc(recs, per_record_gzip=gz))
    out = read_warc(spark, d)
    return out.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        "http_status",
        "http_content_type",
        F.length("payload").alias("payload_bytes"),
    )


def _q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX(J) crawl-index ingestion (Common Crawl cc-index layout):
    plant one index line per document — SURT key, timestamp, JSON
    capture metadata — across two files, read them back with the
    line-splittable Catalyst reader, and RE-DERIVE the SURT from the
    parsed URL with the surt_key expression; every output column is
    closed-form in doc_id (surt_match proves parse and derivation
    agree)."""
    from jodie_spark.sources import load_table
    from jodie_spark.sources.warc import read_cdxj, surt_key

    ids = [
        int(r["doc_id"])
        for r in load_table(spark, sf_dir, "documents")
        .filter("doc_id < 500")
        .select("doc_id")
        .collect()
    ]
    d = tempfile.mkdtemp(prefix="jodie_cdx_")
    for half in (0, 1):
        lines = []
        for did in sorted(ids):
            if did % 2 != half:
                continue
            url = f"https://sub{did % 3}.dom{did % 5}.com/p/{did}"
            surt = f"com,dom{did % 5},sub{did % 3})/p/{did}"
            meta = (
                f'{{"url": "{url}", "mime": "text/html", '
                f'"status": "{200 if did % 7 else 404}", '
                f'"length": "{1000 + did}", "offset": "{did * 10}", '
                f'"filename": "seg{half}.warc.gz"}}'
            )
            lines.append(f"{surt} {20240101000000 + did} {meta}")
        with open(os.path.join(d, f"idx{half}.cdxj"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    out = read_cdxj(spark, d)
    return out.select(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("doc_id"),
        "surt_key",
        "capture_ts",
        "mime",
        "status",
        "length",
        "offset",
        "filename",
        (surt_key(F.col("url")) == F.col("surt_key")).alias("surt_match"),
    )


def _q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt (RFC 9309) compliance filtering: three planted hosts
    — one with prefix rules + a longer Allow exception + a wildcard,
    one blocking everything, one with no robots at all — applied to
    deterministic per-doc URLs. Longest-match / allow-on-tie semantics
    make survivorship closed-form in doc_id."""
    from jodie_spark.functions.robots import filter_by_robots
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 600")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://host"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".example"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("/open/p"))
            .when(F.col("doc_id") % 4 == 1, F.lit("/blocked/p"))
            .when(F.col("doc_id") % 4 == 2, F.lit("/blocked/except"))
            .otherwise(F.lit("/other/")),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    robots = spark.createDataFrame(
        [
            (
                "host0.example",
                "User-agent: bigcrawler\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /blocked/\n"
                "Allow: /blocked/except*\n",
            ),
            ("host1.example", "User-agent: *\nDisallow: /\n"),
        ],
        "host string, robots_txt string",
    )
    kept = filter_by_robots(planted, robots, user_agent="jodiebot/1.0")
    return kept.select("doc_id")


def _q_crawl_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-ingestion stages COMPOSED end-to-end: documents →
    WARC segments (one plain, one per-record-gzip) → read_warc →
    HTTP-200 filter → robots.txt compliance (host1 blocks everything,
    host0 blocks the /sec1/ lane) → per-domain frequency cap (top 40
    by payload bytes, ties → lowest id). Every stage is deterministic,
    so the surviving doc_ids are closed-form."""
    from jodie_spark.functions.robots import filter_by_robots
    from jodie_spark.functions.urls import cap_per_domain
    from jodie_spark.sources import load_table
    from jodie_spark.sources.warc import encode_warc, read_warc

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter("doc_id < 600")
        .select("doc_id", "text")
        .collect()
    )
    d = tempfile.mkdtemp(prefix="jodie_crawl_")
    for half, gz in ((0, False), (1, True)):
        recs = []
        for r in sorted(docs, key=lambda r: r["doc_id"]):
            did = int(r["doc_id"])
            if did % 2 != half:
                continue
            recs.append(
                {
                    "warc_type": "response",
                    "target_uri": (
                        f"https://host{did % 3}.example/sec{did % 4}/p{did}"
                    ),
                    "http_status": 200,
                    "payload": (r["text"] or "").encode("utf-8"),
                }
            )
        with open(os.path.join(d, f"seg{half}.warc" + (".gz" if gz else "")),
                  "wb") as fh:
            fh.write(encode_warc(recs, per_record_gzip=gz))

    pages = read_warc(spark, d).filter("http_status = 200")
    robots = spark.createDataFrame(
        [
            ("host0.example", "User-agent: *\nDisallow: /sec1/\n"),
            ("host1.example", "User-agent: *\nDisallow: /\n"),
        ],
        "host string, robots_txt string",
    )
    compliant = filter_by_robots(pages, robots, url_col="target_uri")
    keyed = compliant.select(
        F.regexp_extract("target_uri", r"/p(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        "target_uri",
        F.length("payload").alias("payload_bytes"),
    )
    capped = cap_per_domain(
        keyed, "target_uri", k=40, id_col="doc_id", quality_col="payload_bytes"
    )
    return capped.select("doc_id", "payload_bytes")


def _q_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k corpus-overlap estimation: sketch the text hashes
    of two overlapping document slices (A = ids not divisible by 3,
    B = even ids) and estimate distinct counts, union, intersection and
    Jaccard WITHOUT a corpus join. Deterministic md5-based hashing +
    exact order statistics ⇒ the DuckDB oracle reproduces the ESTIMATES
    value-for-value (the correctness check is exact even though the
    estimator is approximate)."""
    from jodie_spark.operators.sketches import kmv_overlap, kmv_sketch
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.filter("doc_id % 3 != 0")
    b = docs.filter("doc_id % 2 = 0")
    return kmv_overlap(
        kmv_sketch(a, "text", k=128), kmv_sketch(b, "text", k=128), k=128
    )


def _q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency capping (C4/RefinedWeb guard against one
    site dominating the corpus): plant deterministic URLs over 5
    registrable domains (ids ≡0 mod 7 get junk, always kept), keep the
    20 best per domain by n_chars (ties → lowest id). The Spark side
    runs the two-stage salted exact top-k election (no hot-domain
    straggler); the oracle is the closed-form single window."""
    from jodie_spark.functions.urls import cap_per_domain
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        "n_chars",
        F.when(
            F.col("doc_id") % 7 == 0, F.lit("not a url at all")
        ).otherwise(
            F.concat(
                F.lit("https://sub"),
                (F.col("doc_id") % 3).cast("string"),
                F.lit(".dom"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(".com/p/"),
                F.col("doc_id").cast("string"),
            )
        ).alias("url"),
    )
    return cap_per_domain(
        planted, "url", k=20, id_col="doc_id", quality_col="n_chars"
    ).select("doc_id")


def _q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023): target = every
    10th document, raw = the whole corpus; hashed unigram+bigram bucket
    distributions, Laplace-smoothed log ratio summed per document. The
    DuckDB oracle replicates the exact arithmetic (md5-prefix buckets,
    list_transform bigrams), value-for-value at 6 dp."""
    from jodie_spark.operators.dsir import dsir_log_weights
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.filter("doc_id % 10 = 0")
    lw = dsir_log_weights(docs, target, "text", "doc_id", n_buckets=4096, alpha=1.0)
    return lw.select("doc_id", F.round("log_weight", 6).alias("log_weight"))


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

def _q_minhash_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted MinHash-LSH index probe (round 10): fuzzy incremental
    dedup against a corpus indexed ONCE. Same oracle discipline as
    simhash_dedup: restrict to documents with no true near-dup partner
    (signature agreement for fuzzy pairs is data-dependent, not
    SQL-expressible), index the even half, probe the odd half plus
    exact text clones of indexed docs. At threshold 1.0 the matches
    are exactly the planted clones (agreement 1.0 by construction;
    restricted naturals sit at Jaccard < 0.5) — closed-form in doc_id."""
    from jodie_spark.operators.minhash_index import (
        build_minhash_index,
        query_minhash_index,
    )

    base = _no_near_dup_base(spark, sf_dir)
    corpus = base.filter("doc_id % 2 = 0")
    idx = _tmp("mhidx")
    build_minhash_index(corpus, "text", "doc_id", idx)
    clones = corpus.filter("doc_id % 10 = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    batch = base.filter("doc_id % 2 = 1").unionByName(clones)
    return query_minhash_index(
        spark, idx, batch, "text", "doc_id", threshold=1.0
    ).select("new_id", "index_id", "est_jaccard")


def _q_hamming_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted hamming-band index probe (round 10): incremental
    SimHash/media near-dup against a history indexed once. Same oracle
    discipline as simhash_dedup: restrict to documents with no true
    near-dup partner, index the even half's text simhashes, probe the
    odd half plus exact text clones of indexed docs at max_hamming=1.
    Clones sit at hamming 0, restricted naturals at >= 2 (the
    simhash_dedup fixture measurement), so matches are exactly the
    planted clone pairs — closed-form in doc_id."""
    from jodie_spark.operators.hamming_index import (
        build_hamming_index,
        query_hamming_index,
    )
    from jodie_spark.operators.text_dedup import simhash

    # materialize (doc_id, text, sh) once: corpus build, clone planting
    # and the probe batch all branch from it — without the checkpoint
    # each branch re-evaluates the SimHash pandas_udf over its slice
    # (r13 plan capture: 8 ArrowEvalPython subtrees in the probe plan)
    base = (
        _no_near_dup_base(spark, sf_dir)
        .withColumn("sh", simhash(F.col("text")))
        .localCheckpoint(eager=False)
    )
    corpus = base.filter("doc_id % 2 = 0")
    idx = _tmp("hamidx")
    build_hamming_index(corpus, "sh", "doc_id", idx, bands=4)
    clones = corpus.filter("doc_id % 10 = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "sh"
    )
    batch = base.filter("doc_id % 2 = 1").select("doc_id", "sh").unionByName(clones)
    return query_hamming_index(
        spark, idx, batch, "sh", "doc_id", max_hamming=1
    ).select("new_id", "index_id", F.col("hamming").cast("long").alias("hamming"))


def _q_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast Bloom-filter incremental dedup (round 10): seen set =
    every doc_id % 3 == 0 fingerprint, new batch = the whole corpus;
    keep the probably-new rows. Bloom membership is DETERMINISTIC —
    positions are md5 hex arithmetic identical in Spark and DuckDB
    (operators/bloom.py module doc), so the oracle reproduces the kept
    set exactly, false positives included. No seen row can survive
    (Bloom never false-negatives); the probe is a zero-shuffle
    broadcast test, the 100 TB path where dedup_against's anti-join
    would shuffle the billion-row seen set every batch."""
    from jodie_spark.operators.bloom import bloom_filter_new, build_bloom
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    seen = docs.filter("doc_id % 3 = 0").selectExpr("md5(text) as fp")
    bloom = build_bloom(seen, "fp", n_bits=1 << 18, n_hashes=5)
    new = docs.selectExpr("doc_id", "md5(text) as fp")
    return bloom_filter_new(new, bloom, "fp").select("doc_id")


def _rotation_order(registry: dict) -> list[str]:
    """Window rotation, AUTOMATED (VERDICT r10 item 2: "stays empty
    for two consecutive rounds without hand-tuning"): order the
    registry by staleness computed from the official driver artifacts
    themselves — queries with no official hash-green row yet first,
    then oldest newest-green round first, registry order as the
    deterministic tiebreak.  Because the driver checks the FIRST 50
    entries and re-imports this module each round, the window
    self-rotates as each ``CORRECTNESS_r{N}.json`` lands; the
    ``stale_not_in_next_window`` invariant (test_registry.py,
    ``tools/check_oracles.py --freshness``) holds by construction as
    long as ≤50 rows go stale per round — i.e. until a round's
    artifact FAILS rows (keeping their old green) or the registry
    outgrows 3×50, at which point the invariant test goes red and a
    human decides.  Fully deterministic given the artifact files, so
    the ordering is reproducible within a round."""
    import glob as _glob
    import json
    import re as _re

    newest: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for f in sorted(_glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = _re.search(r"r(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(f) as fh:
                doc = json.load(fh)
        except Exception:
            continue  # malformed artifact: skip, same as the tool
        if not isinstance(doc, dict):
            continue
        for q, v in doc.items():
            if isinstance(v, dict) and v.get("hash_match"):
                newest[q] = max(newest.get(q, 0), rnd)
    base_index = {q: i for i, q in enumerate(registry)}

    def key(q: str):
        n = newest.get(q)
        if n is None:  # never officially green: head of the window
            return (0, 0, base_index[q])
        return (1, n, base_index[q])  # oldest official green first

    return sorted(registry, key=key)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The correctness driver checks the first 50 entries (dict
    insertion order); ordering is computed by :func:`_rotation_order`
    from the official CORRECTNESS_r*.json artifacts, so the 50-slot
    window always holds the stalest rows without per-round hand
    reordering.  The registry literal below keeps a stable base order
    (the deterministic tiebreak) and is FROZEN at 138 queries
    (VERDICT r10 item 2: 50 refreshed/round vs 138/3 ≈ 46 aging/round
    keeps the rotation solvent).  Every entry beyond the window stays
    value-checked every round via tools/check_oracles.py."""
    reg = _registry()
    return {k: reg[k] for k in _rotation_order(reg)}


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- round-11 window (slots 1-50): slots 1-2 the two rows
        # with no official green yet, 3-38 the 36 r8-green stale rows,
        # 39-50 twelve §2 core rows (the ten remaining core rows roll
        # to r12 with the rest of the r9 cohort — capacity math in
        # COVERAGE.md).
        "minhash_index_probe": _q_minhash_index_probe,
        "hamming_index_probe": _q_hamming_index_probe,
        "domain_cap": _q_domain_cap,
        "dsir_weights": _q_dsir_weights,
        "dv_delete": _q_dv_delete,
        "dv_merge": _q_dv_merge,
        "encode_corpus": _q_encode_corpus,
        "epoch_shuffle": _q_epoch_shuffle,
        "gopher_quality": _q_gopher_quality,
        "iceberg_convert": _q_iceberg_convert,
        "identity_columns": _q_identity_columns,
        "keyword_search": _q_keyword_search,
        "kmeans_clusters": _q_kmeans_clusters,
        "liquid_clustering": _q_liquid_clustering,
        "media_probe": _q_media_probe,
        "merge_full_sync": _q_merge_full_sync,
        "minhash_dedup": _q_minhash_dedup,
        "mixture_weights": _q_mixture_weights,
        "multimodal_decode": _q_multimodal_decode,
        "nested_evolution": _q_nested_evolution,
        "pipeline_e2e": _q_pipeline_e2e,
        "quality_dedup": _q_quality_dedup,
        "reorg_purge_manifest": _q_reorg_purge_manifest,
        "robots_filter": _q_robots_filter,
        "row_tracking": _q_row_tracking,
        "semantic_dedup": _q_semantic_dedup,
        "sessionize": _q_sessionize,
        "streaming_cdc_apply": _q_streaming_cdc_apply,
        "streaming_dedup": _q_streaming_dedup,
        "streaming_sessionize": _q_streaming_sessionize,
        "streaming_window_counts": _q_streaming_window_counts,
        "substring_dedup": _q_substring_dedup,
        "type_widening": _q_type_widening,
        "uniform_iceberg": _q_uniform_iceberg,
        "v2_checkpoint": _q_v2_checkpoint,
        "variant_table": _q_variant_table,
        "warc_ingest": _q_warc_ingest,
        "windowed_event_counts": _q_windowed_event_counts,
        "type2_scd_upsert": _q_type2_scd_upsert,
        "kill_duplicate_records": _q_kill_duplicate_records,
        "remove_duplicate_records_pk": _q_remove_duplicate_records_pk,
        "remove_duplicate_records_nopk": _q_remove_duplicate_records_nopk,
        "copy_table": _q_copy_table,
        "validate_append": _q_validate_append,
        "append_without_duplicates": _q_append_without_duplicates,
        "find_composite_key_candidate": _q_find_composite_key,
        "with_md5_columns": _q_with_md5_columns,
        "is_composite_key_candidate": _q_is_composite_key,
        "delta_file_sizes": _q_delta_file_sizes,
        "read_cdf": _q_read_cdf,
        # --- tail (51+), pre-ordered for the NEXT rotations: first
        # the 38 remaining r9-green rows (the r12 stale cohort —
        # including the ten §2 core rows that slipped this round),
        # then the 50 r10-green rows (r13 cohort).  All of 51+ stays
        # value-checked every round via tools/check_oracles.py.
        "humanize_bytes": _q_humanize_bytes,
        "file_size_distribution": _q_file_size_distribution,
        "num_record_distribution": _q_num_record_distribution,
        "operation_metrics": _q_operation_metrics,
        "operation_metrics_partition": _q_operation_metrics_partition,
        "cdf_recovery": _q_cdf_recovery,
        "cdf_status": _q_cdf_status,
        "optimize_zorder": _q_optimize_zorder,
        "optimize_compaction": _q_optimize_compaction,
        "shuffle_files_deterministic": _q_shuffle_files_deterministic,
        "log_cleanup": _q_log_cleanup,
        "fsck_crc_repair": _q_fsck_crc_repair,
        "bpe_train_merges": _q_bpe_train_merges,
        "check_constraints": _q_check_constraints,
        "classifier_quality": _q_classifier_quality,
        "clean_corpus": _q_clean_corpus,
        "column_mapping_id": _q_column_mapping_id,
        "contamination_check": _q_contamination_check,
        "doc_chunks": _q_doc_chunks,
        "doc_fingerprint": _q_doc_fingerprint,
        "embedding_quantize": _q_embedding_quantize,
        "generated_columns": _q_generated_columns,
        "html_extract": _q_html_extract,
        "image_dedup": _q_image_dedup,
        "interval_join": _q_interval_join,
        "ivf_topk": _q_ivf_topk,
        "ivfpq_topk": _q_ivfpq_topk,
        "language_id": _q_language_id,
        "normalize_text": _q_normalize_text,
        "pack_sequences": _q_pack_sequences,
        "perplexity": _q_perplexity,
        "pii_scrub": _q_pii_scrub,
        "pq_topk": _q_pq_topk,
        "profile_table": _q_profile_table,
        "repetition_signals": _q_repetition_signals,
        "restore_roundtrip": _q_restore_roundtrip,
        "streaming_scd2": _q_streaming_scd2,
        "video_dedup": _q_video_dedup,
        # r10-green cohort (r13 window), freshest last.
        "heavy_hitters": _q_heavy_hitters,
        "heavy_hitters_by_lang": _q_heavy_hitters_by_lang,
        "exact_quantiles": _q_exact_quantiles,
        "quantiles_by_lang": _q_quantiles_by_lang,
        "token_budget_selection": _q_token_budget_selection,
        "bloom_incremental_dedup": _q_bloom_incremental_dedup,
        "num_shuffle_files": _q_num_shuffle_files,
        "audio_dedup_flac": _q_audio_dedup_flac,
        "datasource_field_id": _q_datasource_field_id,
        "ann_index_topk": _q_ann_index_topk,
        "as_of_join": _q_as_of_join,
        "clean_corpus_fuzzy": _q_clean_corpus_fuzzy,
        "corpus_stats": _q_corpus_stats,
        "datasource_roundtrip": _q_datasource_roundtrip,
        "dedup_clusters": _q_dedup_clusters,
        "dv_update": _q_dv_update,
        "embedding_dedup": _q_embedding_dedup,
        "exact_dedup_documents": _q_exact_dedup_documents,
        "incremental_dedup": _q_incremental_dedup,
        "knn_graph": _q_knn_graph,
        "line_dedup": _q_line_dedup,
        "merge_schema_evolution": _q_merge_schema_evolution,
        "ngram_jaccard_pairs": _q_ngram_jaccard_pairs,
        "passage_dup_stats": _q_passage_dup_stats,
        "pricing_summary": _q_pricing_summary,
        "range_join": _q_range_join,
        "revenue_by_nation": _q_revenue_by_nation,
        "shallow_clone": _q_shallow_clone,
        "simhash_dedup": _q_simhash_dedup,
        "similarity_topk": _q_similarity_topk,
        "sql_dml": _q_sql_dml,
        "stratified_sample": _q_stratified_sample,
        "text_quality": _q_text_quality,
        "token_count": _q_token_count,
        "token_frequencies": _q_token_frequencies,
        "top_orders": _q_top_orders,
        "url_filter": _q_url_filter,
        "ann_topk": _q_ann_topk,
        "audio_dedup": _q_audio_dedup,
        "bigram_perplexity": _q_bigram_perplexity,
        "bm25_search": _q_bm25_search,
        "bpe_token_count": _q_bpe_token_count,
        "cdf_datasource": _q_cdf_datasource,
        "cdx_index": _q_cdx_index,
        "column_ddl_lifecycle": _q_column_ddl_lifecycle,
        "column_defaults": _q_column_defaults,
        "corpus_overlap": _q_corpus_overlap,
        "crawl_pipeline_e2e": _q_crawl_pipeline_e2e,
        "create_table_ddl": _q_create_table_ddl,
        "decoder_override_dedup": _q_decoder_override_dedup,
    }


def _language_id_oracle() -> str:
    """Generated from the same stopword lists the Spark operator uses,
    replicating array_max's (score, lang) struct ordering via
    unnest+max."""
    from jodie_spark.functions.text import _LANG_STOPWORDS

    hit_cols = []
    struct_items = []
    for lang, words in _LANG_STOPWORDS.items():
        wl = ", ".join(f"'{w}'" for w in words)
        hit_cols.append(
            f"CAST(len(list_intersect(words, [{wl}])) AS DOUBLE) AS h_{lang}"
        )
        struct_items.append(
            f"{{'score': h_{lang} / n, 'lang': '{lang}'}}"
        )
    return f"""
        WITH w AS (
            SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                               x -> len(x) > 0) AS words
            FROM documents
        ), s AS (
            SELECT CAST(greatest(len(words), 1) AS DOUBLE) AS n,
                   {", ".join(hit_cols)}
            FROM w
        ), b AS (
            SELECT (SELECT max(x) FROM (SELECT unnest([
                {", ".join(struct_items)}
            ]) AS x)) AS best
            FROM s
        )
        SELECT CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM b GROUP BY 1
    """


def _jaccard_pairs_cte(src: str = "documents") -> str:
    """Brute-force all-pairs n-gram Jaccard over ``src``, matching the
    Spark shingle semantics exactly (lowercase, split on non-alnum,
    distinct 5-word shingles, short docs yield one shingle). Yields
    CTEs ``dup_pairs(id_a, id_b)`` with true Jaccard ≥ 0.5 — feasible
    in DuckDB at sf0.01 (500 docs → 125k pairs)."""
    return f"""
        __w AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^\\p{{L}}\\p{{N}}]+'),
                               w -> len(w) > 0) AS ws
            FROM {src}
        ),
        __sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(generate_series(1, greatest(len(ws) - 4, 1)),
                                                i -> array_to_string(ws[i:i+4], ' '))) AS s
            FROM __w
        ),
        dup_pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM __sh a JOIN __sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
        )
    """


_COMPONENT_DROP_CTE = """
        __edges AS (
            SELECT id_a AS src, id_b AS dst FROM dup_pairs
            UNION SELECT id_b, id_a FROM dup_pairs
        ),
        __reach(id, r) AS (
            SELECT src, src FROM __edges
            UNION
            SELECT e.dst, __reach.r FROM __edges e JOIN __reach ON e.src = __reach.id
        ),
        dropped AS (SELECT id FROM __reach GROUP BY id HAVING min(r) <> id)
"""


_PLANTED_ANN_ORACLE = """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
    aug AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        UNION ALL
        SELECT 100000 + i, (SELECT v FROM q) FROM generate_series(1, 9) AS t(i)
    )
    SELECT vec_id FROM aug
    ORDER BY list_cosine_similarity(v, (SELECT v FROM q)) DESC, vec_id
    LIMIT 10
"""


def _bpe_oracle_sql(n_merges: int = 6, top_words: int = 300) -> str:
    """Unrolled-iteration BPE oracle (kmeans_clusters precedent): each
    merge step is a CTE triple — adjacent-pair counts (p), best pair
    under the (count desc, lhs, rhs) tie-break (b), and the greedy
    leftmost-non-overlapping rewrite (w) as a list_reduce fold
    identical to the Catalyst `aggregate` fold in operators/bpe.py."""
    parts = [
        f"""
        WITH w0 AS (
          SELECT list_append(string_split(word, ''), '</w>') AS syms, cnt FROM (
            SELECT word, COUNT(*) AS cnt FROM (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
              FROM documents)
            GROUP BY word ORDER BY cnt DESC, word LIMIT {top_words})
        )"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""", p{i} AS (
          SELECT syms[i] AS a, syms[i+1] AS b, cnt FROM (
            SELECT syms, cnt, unnest(generate_series(1, len(syms)-1)) AS i
            FROM w{i - 1})
        ), b{i} AS (
          SELECT a, b, SUM(cnt) AS pair_cnt FROM p{i} GROUP BY a, b
          ORDER BY pair_cnt DESC, a, b LIMIT 1
        ), w{i} AS (
          SELECT list_reduce(list_transform(w.syms, s -> [s]),
                   (acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b
                               THEN list_concat(acc[:-2], [m.a || m.b])
                               ELSE list_concat(acc, x) END) AS syms, w.cnt
          FROM w{i - 1} w CROSS JOIN b{i} m
        )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS INTEGER) AS step, a AS lhs, b AS rhs,"
        f" CAST(pair_cnt AS BIGINT) AS pair_cnt FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    parts.append(f" SELECT * FROM ({selects}) ORDER BY step")
    return "".join(parts)



def _q_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE withSchemaEvolution on a COLUMN-MAPPED target — round 7's
    closed refusal (reference mergeSchema semantics,
    DeltaHelpers.scala:354-379, on arbitrary existing tables). Target =
    customers with c_custkey % 3 != 0, column-mapped with c_name
    RENAMED to cust_name (physical != logical names); source =
    per-customer order rollups for even custkeys carrying two columns
    the target does not have (n_orders, total_spend). Matched rows
    update-all, unmatched source rows insert-all; untouched rows
    surface the evolved columns as NULL straight from the scan. The
    oracle replays the merge as a FULL OUTER JOIN election in DuckDB."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable

    cust = load_table(spark, sf_dir, "customer")
    t = _delta_from(
        cust.filter("c_custkey % 3 != 0").select("c_custkey", "c_name", "c_acctbal"),
        "mev",
    )
    t.rename_column("c_name", "cust_name")  # auto-enables column mapping
    orders = load_table(spark, sf_dir, "orders")
    src = (
        orders.filter("o_custkey % 2 = 0")
        .join(cust, cust["c_custkey"] == orders["o_custkey"])
        .groupBy("c_custkey")
        .agg(
            F.max("c_name").alias("cust_name"),
            F.max("c_acctbal").alias("c_acctbal"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_spend"),
        )
    )
    (
        t.alias("t")
        .merge(src.alias("s"), "t.c_custkey = s.c_custkey")
        .withSchemaEvolution()
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    return (
        DeltaTable.forPath(spark, t.path)
        .toDF()
        .select("c_custkey", "cust_name", "c_acctbal", "n_orders", "total_spend")
    )



def _q_quality_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exact dedup (FineWeb-style canonical-copy
    retention): per normalized-content fingerprint keep the HIGHEST
    n_chars copy, ties to the lowest doc_id — instead of the default
    first-crawled (min-id) election. Same one-shuffle max_by shape as
    exact_dedup; the oracle is the identical argmax in DuckDB."""
    from jodie_spark.operators.text_dedup import exact_dedup
    from jodie_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id", quality_col="n_chars")



def _q_nested_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested schema evolution under the value oracle: the target holds
    a struct column built from customer rows; the merge source carries
    the same struct with an EXTRA nested field (spend) and reordered
    existing fields — evolution appends the nested field within the
    struct and star-assignment aligns by name (a positional cast would
    swap values). Output flattens the struct to scalars so the DuckDB
    comparison is exact."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable

    cust = load_table(spark, sf_dir, "customer")
    tgt_df = cust.filter("c_custkey % 4 != 0").select(
        "c_custkey",
        F.struct(
            F.col("c_acctbal").alias("bal"), F.col("c_mktsegment").alias("seg")
        ).alias("info"),
    )
    t = _delta_from(tgt_df, "nev")
    orders = load_table(spark, sf_dir, "orders")
    src = (
        orders.filter("o_custkey % 2 = 0")
        .join(cust, cust["c_custkey"] == orders["o_custkey"])
        .groupBy("c_custkey")
        .agg(
            F.max("c_mktsegment").alias("seg"),
            F.max("c_acctbal").alias("bal"),
            F.sum("o_totalprice").alias("spend"),
        )
        .select(
            "c_custkey",
            # deliberately REORDERED (seg before bal) + the new field
            F.struct("seg", "bal", "spend").alias("info"),
        )
    )
    (
        t.alias("t")
        .merge(src.alias("s"), "t.c_custkey = s.c_custkey")
        .withSchemaEvolution()
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    out = DeltaTable.forPath(spark, t.path).toDF()
    return out.select(
        "c_custkey",
        F.col("info.bal").alias("bal"),
        F.col("info.seg").alias("seg"),
        F.col("info.spend").alias("spend"),
    )



def _q_merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """whenNotMatchedBySource under the value oracle (full-sync): the
    target holds all customers with a status column; the feed carries
    only even custkeys. One merge updates matched rows, inserts absent
    feed rows (none here), DELETEs unmatched rows with custkey % 5 = 0,
    and marks the remaining unmatched rows stale. The oracle replays
    the clause ladder as CASE logic in DuckDB."""
    from jodie_spark.sources import load_table
    from jodie_spark.tables.table import DeltaTable

    cust = load_table(spark, sf_dir, "customer")
    t = _delta_from(
        cust.select("c_custkey", "c_acctbal", F.lit("live").alias("status")),
        "fsync",
    )
    feed = cust.filter("c_custkey % 2 = 0").select(
        "c_custkey", (F.col("c_acctbal") * 2).alias("c_acctbal")
    )
    (
        t.alias("t")
        .merge(feed.alias("s"), "t.c_custkey = s.c_custkey")
        .whenMatchedUpdate(set={"c_acctbal": "s.c_acctbal", "status": "'synced'"})
        .whenNotMatchedInsert(
            values={"c_custkey": "s.c_custkey", "c_acctbal": "s.c_acctbal",
                    "status": "'synced'"}
        )
        .whenNotMatchedBySourceDelete(condition="t.c_custkey % 5 = 0")
        .whenNotMatchedBySourceUpdate(set={"status": "'stale'"})
        .execute()
    )
    return DeltaTable.forPath(spark, t.path).toDF()


def _bloom_oracle_sql() -> str:
    """Exact Bloom membership in DuckDB: the position arithmetic comes
    from the SAME helper the Spark side pins its arithmetic to
    (operators/bloom.py::bloom_oracle_sql_positions), so the two can
    only drift together. A doc survives iff ANY of its 5 positions is
    unset in the seen bitmap — false positives reproduce exactly."""
    from jodie_spark.operators.bloom import bloom_oracle_sql_positions

    pos = bloom_oracle_sql_positions("fp", n_bits=1 << 18, n_hashes=5)
    return f"""
        WITH seen AS (
            SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 3 = 0
        ), seen_pos AS (
            SELECT DISTINCT unnest({pos}) AS pos FROM seen
        ), probe AS (
            SELECT doc_id, unnest({pos}) AS pos
            FROM (SELECT doc_id, md5(text) AS fp FROM documents)
        )
        SELECT p.doc_id
        FROM probe p LEFT JOIN seen_pos s ON p.pos = s.pos
        GROUP BY p.doc_id
        HAVING COUNT(*) FILTER (WHERE s.pos IS NULL) > 0
    """


def oracle_sql() -> dict[str, str]:
    return {
        "heavy_hitters": """
            WITH toks AS (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z]+'),
                    x -> len(x) > 0)) AS token
                FROM documents
            ), tot AS (SELECT count(*) AS n FROM toks)
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM toks, tot
            GROUP BY token, tot.n
            HAVING count(*) > 0.01 * n
            ORDER BY token
        """,
        "heavy_hitters_by_lang": """
            WITH toks AS (
                SELECT lang, unnest(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z]+'),
                    x -> len(x) > 0)) AS token
                FROM documents
            ), tot AS (SELECT lang, count(*) AS n FROM toks GROUP BY lang)
            SELECT t.lang, token, CAST(count(*) AS BIGINT) AS cnt
            FROM toks t JOIN tot ON t.lang = tot.lang
            GROUP BY t.lang, token, tot.n
            HAVING count(*) > 0.02 * tot.n
            ORDER BY t.lang, token
        """,
        "token_budget_selection": """
            WITH w AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                       x -> len(x) > 0)) AS n_words,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                       length(regexp_replace(text, '[^.!?]', '', 'g')) > 0 AS has_term,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
                FROM documents
            ), scored AS (
                SELECT doc_id, n_tokens,
                       ((CASE WHEN n_chars BETWEEN 100 AND 100000 THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN n_words > 0
                                AND (CAST(n_chars AS DOUBLE) / n_words) BETWEEN 3 AND 12
                                THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN n_chars > 0
                                AND (CAST(n_alpha AS DOUBLE) / n_chars) >= 0.6
                                THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN has_term THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
                FROM w
            ), cum AS (
                SELECT doc_id, n_tokens,
                       sum(n_tokens) OVER (ORDER BY quality DESC, doc_id)
                           - n_tokens AS off
                FROM scored
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
            FROM cum WHERE off < 5000
            ORDER BY doc_id
        """,
        "quantiles_by_lang": """
            WITH vals AS (SELECT lang, length(text) AS value FROM documents),
            hist AS (SELECT lang, value, count(*) AS c FROM vals
                     GROUP BY lang, value),
            cum AS (SELECT lang, value,
                           sum(c) OVER (PARTITION BY lang ORDER BY value) AS cf
                    FROM hist),
            tot AS (SELECT lang, count(*) AS n FROM vals GROUP BY lang),
            qs AS (SELECT CAST(q AS DOUBLE) AS q
                   FROM (VALUES (0.5), (0.9), (0.99)) t(q))
            SELECT cum.lang, q, CAST(min(value) AS BIGINT) AS value
            FROM cum JOIN tot ON cum.lang = tot.lang, qs
            WHERE cf >= ceil(CAST(q AS DECIMAL(12,10)) * n)
            GROUP BY cum.lang, q
            ORDER BY cum.lang, q
        """,
        "exact_quantiles": """
            WITH vals AS (SELECT length(text) AS value FROM documents),
            hist AS (SELECT value, count(*) AS c FROM vals GROUP BY value),
            cum AS (SELECT value, sum(c) OVER (ORDER BY value) AS cf FROM hist),
            tot AS (SELECT count(*) AS n FROM vals),
            qs AS (SELECT CAST(q AS DOUBLE) AS q
                   FROM (VALUES (0.5), (0.9), (0.95), (0.99), (1.0)) t(q))
            SELECT q, CAST(min(value) AS BIGINT) AS value
            FROM cum, tot, qs
            WHERE cf >= ceil(CAST(q AS DECIMAL(12,10)) * n)
            GROUP BY q
            ORDER BY q
        """,
        "bloom_incremental_dedup": _bloom_oracle_sql(),
        "hamming_index_probe": f"""
            WITH {_jaccard_pairs_cte()},
            paired AS (
                SELECT id_a AS id FROM dup_pairs UNION SELECT id_b FROM dup_pairs
            ), base AS (
                SELECT doc_id FROM documents
                WHERE doc_id NOT IN (SELECT id FROM paired)
            )
            SELECT CAST(doc_id + 100000 AS BIGINT) AS new_id,
                   doc_id AS index_id,
                   CAST(0 AS BIGINT) AS hamming
            FROM base WHERE doc_id % 2 = 0 AND doc_id % 10 = 0
        """,
        "minhash_index_probe": f"""
            WITH {_jaccard_pairs_cte()},
            paired AS (
                SELECT id_a AS id FROM dup_pairs UNION SELECT id_b FROM dup_pairs
            ), base AS (
                SELECT doc_id FROM documents
                WHERE doc_id NOT IN (SELECT id FROM paired)
            )
            SELECT CAST(doc_id + 100000 AS BIGINT) AS new_id,
                   doc_id AS index_id,
                   CAST(1.0 AS DOUBLE) AS est_jaccard
            FROM base WHERE doc_id % 2 = 0 AND doc_id % 10 = 0
        """,
        "bpe_train_merges": _bpe_oracle_sql(n_merges=6, top_words=300),
        "html_extract": r"""
            WITH pages AS (
              SELECT doc_id,
                     '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
                     '</title><style>body { color: #222; }</style>' ||
                     '<script>if (1 < 2) { window.x = ''nav''; }</script></head>' ||
                     '<body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' ||
                     chr(10) || '<p>' || replace(text, '&', '&amp;') ||
                     '</p>' || chr(10) || '<!-- tracking pixel -->' ||
                     '<div class="footer">&copy; 2026 Example &amp; Co.</div>' ||
                     '</body></html>' AS raw_html
              FROM documents),
            stripped AS (
              SELECT doc_id, raw_html,
                trim(regexp_replace(
                  replace(replace(replace(replace(replace(replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(raw_html,
                            '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                        '(?s)<!--.*?-->', ' ', 'g'),
                      '(?s)<[^>]*>', ' ', 'g'),
                    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                    '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
                  '\s+', ' ', 'g')) AS extracted_text
              FROM pages)
            SELECT doc_id, extracted_text,
                   ROUND((length(raw_html) - length(extracted_text))
                         / GREATEST(length(raw_html), 1)::DOUBLE, 6)
                       AS markup_ratio
            FROM stripped
        """,
        "bigram_perplexity": r"""
            WITH words AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
              FROM documents WHERE length(trim(text)) > 0),
            pairs AS (
              SELECT doc_id,
                     CASE WHEN i = 1 THEN '<s>' ELSE w[i-1] END AS prev,
                     w[i] AS token
              FROM words, LATERAL unnest(generate_series(1, len(w))) AS g(i)),
            ucount AS (SELECT token, COUNT(*) AS c FROM pairs GROUP BY token),
            tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS total,
                           CAST(COUNT(*) AS DOUBLE) AS vocab FROM ucount),
            bi AS (SELECT prev, token, COUNT(*) AS c_pt FROM pairs GROUP BY prev, token),
            ctx AS (SELECT prev, SUM(c_pt) AS c_p FROM bi GROUP BY prev),
            scored AS (
              SELECT p.doc_id,
                     ln(0.7 * (COALESCE(b.c_pt, 0) + 1.0)
                            / (COALESCE(c.c_p, 0) + 1.0 * (vocab + 1))
                        + 0.3 * COALESCE((u.c + 1.0) / (total + 1.0 * (vocab + 1)),
                                         1.0 / (total + 1.0 * (vocab + 1)))) AS lp
              FROM pairs p
              LEFT JOIN bi b USING (prev, token)
              LEFT JOIN ctx c USING (prev)
              LEFT JOIN ucount u USING (token), tot),
            per AS (SELECT doc_id, COUNT(*) AS n_tokens, AVG(lp) AS avg_logprob
                    FROM scored GROUP BY doc_id)
            SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens,
                   p.avg_logprob, exp(-p.avg_logprob) AS perplexity
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        "create_table_ddl": """
            WITH base AS (
              SELECT n_nationkey, n_name FROM nation
              UNION ALL
              SELECT n_nationkey + 100, n_name || '_2' FROM nation
              WHERE n_nationkey < 5
            ), b AS (
              SELECT CASE WHEN n_nationkey >= 100 THEN 1 ELSE 0 END AS batch,
                     n_nationkey, n_name
              FROM base
            ), ranked AS (
              SELECT batch,
                     CAST(ROW_NUMBER() OVER (PARTITION BY batch
                                             ORDER BY n_nationkey) AS INT) AS rnk,
                     n_nationkey, n_name
              FROM b
            ), c AS (SELECT COUNT(*) AS n0 FROM b WHERE batch = 0)
            SELECT batch, rnk,
                   CAST(CASE WHEN batch = 0 THEN 10 + 5*(rnk - 1)
                             ELSE 10 + 5*n0 + 5*(rnk - 1) END AS BIGINT) AS id,
                   n_nationkey, n_name,
                   substring(n_name, 1, 1) AS name_initial,
                   CAST(CASE WHEN n_nationkey % 5 = 0 THEN 1 ELSE 7 END
                        AS INTEGER) AS prio
            FROM ranked, c
        """,
        "gopher_quality": r"""
            WITH w AS (
                SELECT doc_id, text,
                       CASE WHEN len(trim(text)) = 0 THEN []
                            ELSE regexp_split_to_array(lower(trim(text)), '\s+')
                       END AS words,
                       str_split(text, chr(10)) AS lines
                FROM documents
            ), m AS (
                SELECT doc_id,
                       CAST(len(words) AS BIGINT) AS n_words,
                       CAST(greatest(len(words), 1) AS DOUBLE) AS nw,
                       CAST(coalesce(list_sum(list_transform(words, x -> len(x))), 0)
                            AS DOUBLE) AS total_len,
                       CAST(len(regexp_split_to_array(text, '\.\.\.|…')) - 1
                            + len(str_split(text, '#')) - 1 AS DOUBLE) AS n_symbols,
                       CAST(greatest(len(lines), 1) AS DOUBLE) AS n_lines,
                       CAST(len(list_filter(lines,
                            l -> regexp_matches(trim(l), '^([•‣▪\-\*])')))
                            AS DOUBLE) AS bullet_lines,
                       CAST(len(list_filter(lines,
                            l -> regexp_matches(trim(l), '(\.\.\.|…)$')))
                            AS DOUBLE) AS ellipsis_lines,
                       CAST(len(list_filter(words,
                            x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                            AS alpha_words,
                       CAST(len(list_intersect(
                            ['the','be','to','of','and','that','have','with'],
                            words)) AS INTEGER) AS n_stop_words
                FROM w
            )
            SELECT doc_id, n_words,
                   round(total_len / nw, 6) AS mean_word_len,
                   round(n_symbols / nw, 6) AS symbol_word_ratio,
                   round(bullet_lines / n_lines, 6) AS bullet_line_frac,
                   round(ellipsis_lines / n_lines, 6) AS ellipsis_line_frac,
                   round(alpha_words / nw, 6) AS alpha_word_frac,
                   n_stop_words,
                   (n_words >= 50 AND n_words <= 100000
                    AND total_len / nw >= 3 AND total_len / nw <= 10
                    AND n_symbols / nw < 0.1
                    AND bullet_lines / n_lines < 0.9
                    AND ellipsis_lines / n_lines < 0.3
                    AND alpha_words / nw > 0.8
                    AND n_stop_words >= 2) AS passes
            FROM m
        """,
        "kmeans_clusters": r"""
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), nrm AS (
                SELECT vec_id, v,
                       list_transform(v, x -> x / greatest(
                           sqrt(list_sum(list_transform(v, y -> y*y))), 1e-12))
                           AS nv
                FROM e
            ), c0 AS (
                SELECT vec_id AS cid, nv AS cv FROM nrm WHERE vec_id < 4
            ), a1 AS (
                SELECT vec_id, cid FROM (
                    SELECT n.vec_id, c.cid,
                           ROW_NUMBER() OVER (PARTITION BY n.vec_id
                               ORDER BY list_cosine_similarity(n.v, c.cv) DESC,
                                        c.cid) AS rn
                    FROM nrm n, c0 c) WHERE rn = 1
            ), x1 AS (
                SELECT cid, pos, avg(val) AS mval FROM (
                    SELECT a1.cid, unnest(nrm.nv) AS val,
                           generate_subscripts(nrm.nv, 1) AS pos
                    FROM a1 JOIN nrm USING (vec_id))
                GROUP BY cid, pos
            ), c1 AS (
                SELECT cid, list(mval ORDER BY pos) AS cv FROM x1 GROUP BY cid
            ), a2 AS (
                SELECT vec_id, cid FROM (
                    SELECT n.vec_id, c.cid,
                           ROW_NUMBER() OVER (PARTITION BY n.vec_id
                               ORDER BY list_cosine_similarity(n.v, c.cv) DESC,
                                        c.cid) AS rn
                    FROM nrm n, c1 c) WHERE rn = 1
            ), x2 AS (
                SELECT cid, pos, avg(val) AS mval FROM (
                    SELECT a2.cid, unnest(nrm.nv) AS val,
                           generate_subscripts(nrm.nv, 1) AS pos
                    FROM a2 JOIN nrm USING (vec_id))
                GROUP BY cid, pos
            ), c2 AS (
                SELECT cid, list(mval ORDER BY pos) AS cv FROM x2 GROUP BY cid
            )
            SELECT n.vec_id, CAST(fin.cid AS INTEGER) AS cluster FROM nrm n
            JOIN LATERAL (
                SELECT c.cid FROM c2 c
                ORDER BY list_cosine_similarity(n.v, c.cv) DESC, c.cid
                LIMIT 1
            ) fin ON TRUE
        """,
        "identity_columns": """
            WITH s AS (SELECT s_suppkey, s_name, s_suppkey % 2 AS batch FROM supplier),
            ranked AS (
              SELECT batch,
                     CAST(ROW_NUMBER() OVER (PARTITION BY batch ORDER BY s_suppkey) AS INT) AS rnk,
                     s_suppkey, s_name
              FROM s),
            c AS (SELECT COUNT(*) AS n0 FROM s WHERE batch = 0)
            SELECT batch, rnk,
                   CASE WHEN batch = 0 THEN 100 + 3*(rnk - 1)
                        ELSE 100 + 3*n0 + 3*(rnk - 1) END AS id,
                   s_suppkey, s_name
            FROM ranked, c
        """,
        "bm25_search": r"""
            WITH words AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
                                 x -> len(x) > 0) AS w
              FROM documents),
            toks AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM words),
            qt AS (SELECT doc_id, term, dl, COUNT(*) AS tf FROM toks
                   WHERE term IN ('merge','scan','shuffle')
                   GROUP BY doc_id, term, dl),
            dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS dft FROM toks
                      WHERE term IN ('merge','scan','shuffle') GROUP BY term),
            stats AS (SELECT COUNT(*) AS n, AVG(len(w)) AS avgdl FROM words)
            SELECT qt.doc_id,
                   ROUND(SUM(ln(1 + (n - dft + 0.5)/(dft + 0.5))
                             * tf*2.2/(tf + 1.2*(0.25 + 0.75*dl/avgdl))), 6)
                   AS score
            FROM qt JOIN dfreq USING (term), stats
            GROUP BY qt.doc_id ORDER BY score DESC, doc_id LIMIT 10
        """,
        "keyword_search": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}]+'),
                                        x -> len(x) > 0)) AS term
              FROM documents)
            SELECT doc_id, COUNT(DISTINCT term) AS n_matched
            FROM toks WHERE term IN ('merge','scan')
            GROUP BY doc_id HAVING COUNT(DISTINCT term) = 2
        """,
        "language_id": _language_id_oracle(),
        "ngram_jaccard_pairs": f"""
            WITH {_jaccard_pairs_cte()}
            SELECT id_a, id_b FROM dup_pairs
        """,
        "minhash_dedup": f"""
            WITH RECURSIVE {_jaccard_pairs_cte()}, {_COMPONENT_DROP_CTE}
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT id FROM dropped)
        """,
        "simhash_dedup": f"""
            WITH {_jaccard_pairs_cte()},
            paired AS (
                SELECT id_a AS id FROM dup_pairs UNION SELECT id_b FROM dup_pairs
            )
            SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM paired)
        """,
        "embedding_dedup": "SELECT vec_id FROM embeddings",
        # compaction must preserve the data exactly (files change, rows don't)
        "optimize_compaction": "SELECT * FROM nation",
        "file_size_distribution": """
            SELECT o_orderstatus AS status,
                   CAST(1 AS BIGINT) AS num_of_parquet_files,
                   TRUE AS has_positive_sizes,
                   TRUE AS sizes_ordered
            FROM (SELECT DISTINCT o_orderstatus FROM orders)
        """,
        "delta_file_sizes": """
            SELECT metric, CAST(value AS BIGINT) AS value FROM (VALUES
                ('number_of_files', 1),
                ('size_in_bytes_positive', 1),
                ('average_file_size_positive', 1),
                ('latest_version', 0)
            ) AS t(metric, value)
        """,
        # at sf0.01 the z-ordered rewrite lands in one 128MB-target file
        # (inputs ~1 MB), so every skipping class resolves to 1 file
        "optimize_zorder": """
            SELECT metric, CAST(num_files AS BIGINT) AS num_files FROM (VALUES
                ('OVERALL RESOLVED CONDITION => [ (o_orderkey <= 1000) ]', 1),
                ('GREATER THAN / LESS THAN PART => [ (o_orderkey <= 1000) ]', 1),
                ('EQUALS/EQUALS NULL SAFE PART => [ Empty ]', 1),
                ('LEFT OVER PART => [ Empty ]', 1),
                ('UNRESOLVED PART => [ Empty ]', 1),
                ('TOTAL_NUM_FILES_IN_DELTA_TABLE =>', 1)
            ) AS t(metric, num_files)
        """,
        "datasource_roundtrip": """
            SELECT n_nationkey, n_name, n_regionkey FROM nation
            UNION ALL
            SELECT n_nationkey + 100, n_name, n_regionkey FROM nation
            WHERE n_nationkey < 5
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE {_jaccard_pairs_cte()}, {_COMPONENT_DROP_CTE}
            SELECT id AS doc_id, min(r) AS cluster
            FROM __reach GROUP BY id
        """,
        "bpe_token_count": r"""
            SELECT doc_id,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                        AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text,
                        '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+')) AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "pii_scrub": r"""
            WITH planted AS (
                SELECT doc_id,
                       text || ' contact u' || CAST(doc_id AS VARCHAR)
                            || '@example.com or 555-123-4567 at 10.0.0.'
                            || CAST(doc_id % 255 AS VARCHAR) AS text
                FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g'),
                           '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
                       '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS clean_text,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(text,
                       '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phone,
                   CAST(len(regexp_extract_all(text,
                       '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ip
            FROM planted
        """,
        # non-raw string: ́/\x07/\x0b embed the actual planted
        # characters in the SQL literal; doubled backslashes reach RE2
        "normalize_text": (
            "SELECT doc_id,\n"
            "       trim(regexp_replace(regexp_replace(\n"
            "           nfc_normalize(text || '  Café \t du\x07monde \x0b ok '),\n"
            "           '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),\n"
            "           '[ \\t\\n\\r]+', ' ', 'g')) AS norm_text\n"
            "FROM documents"
        ),
        "url_filter": r"""
            WITH planted AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN 'not a url at all'
                            ELSE 'https://sub' || CAST(doc_id % 3 AS VARCHAR)
                                 || '.dom' || CAST(doc_id % 5 AS VARCHAR)
                                 || '.com/p/' || CAST(doc_id AS VARCHAR)
                       END AS url
                FROM documents
            ), parts AS (
                SELECT doc_id,
                       nullif(lower(regexp_extract(url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1)), '') AS host,
                       nullif(regexp_extract(url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1), '') AS path
                FROM planted
            ), doms AS (
                SELECT doc_id, host, path,
                       CASE WHEN host IS NULL THEN NULL
                            WHEN len(string_split(host, '.')) <= 2 THEN host
                            ELSE string_split(host, '.')[-2] || '.'
                                 || string_split(host, '.')[-1]
                       END AS domain
                FROM parts
            )
            SELECT doc_id, host, domain, path FROM doms
            WHERE domain IS NULL OR domain NOT IN ('dom1.com', 'dom3.com')
        """,
        "classifier_quality": r"""
            WITH labeled AS (
                SELECT doc_id, text,
                       CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS label
                FROM documents
            ), toks AS (
                SELECT doc_id, label,
                       unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
                FROM labeled WHERE length(trim(text)) > 0
            ), bucketed AS (
                SELECT doc_id, label,
                       CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS UBIGINT)
                            % 4096 AS BIGINT) AS bucket
                FROM toks
            ), doc_totals AS (
                SELECT sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n1,
                       sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS n0
                FROM labeled
            ), tok_totals AS (
                SELECT sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS c1,
                       sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS c0
                FROM bucketed
            ), weights AS (
                SELECT bucket,
                       ln((sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1.0)
                          / ((SELECT c1 FROM tok_totals) + 1.0 * 4096))
                     - ln((sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) + 1.0)
                          / ((SELECT c0 FROM tok_totals) + 1.0 * 4096)) AS weight
                FROM bucketed GROUP BY bucket
            ), sums AS (
                SELECT b.doc_id, sum(coalesce(w.weight, 0.0)) AS s
                FROM bucketed b LEFT JOIN weights w USING (bucket)
                GROUP BY b.doc_id
            )
            SELECT l.doc_id,
                   round(1.0 / (1.0 + exp(-(ln(CAST((SELECT n1 FROM doc_totals) AS DOUBLE)
                                              / (SELECT n0 FROM doc_totals))
                                            + coalesce(s.s, 0.0)))), 6) AS score
            FROM (SELECT DISTINCT doc_id FROM labeled) l
            LEFT JOIN sums s USING (doc_id)
        """,
        "passage_dup_stats": r"""
            WITH planted AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 4 = 0
                            THEN text || ' shared boilerplate terms of service all rights reserved contact'
                            ELSE text END AS text
                FROM documents
            ), toks AS (
                SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
                FROM planted WHERE length(trim(text)) > 0
            ), wins AS (
                SELECT doc_id, i,
                       CAST(CAST(concat('0x',
                           substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))
                           AS UBIGINT) AS BIGINT) AS whash
                FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
                WHERE len(t) >= 8
            ), counts AS (
                SELECT whash, count(*) AS n FROM wins GROUP BY whash
            ), flags AS (
                SELECT w.doc_id, CASE WHEN c.n >= 2 THEN 1 ELSE 0 END AS dup
                FROM wins w JOIN counts c USING (whash)
            ), per_doc AS (
                SELECT doc_id, count(*) AS n_windows, sum(dup) AS n_dup_windows
                FROM flags GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(p.n_windows, 0) AS BIGINT) AS n_windows,
                   CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
                   CASE WHEN coalesce(p.n_windows, 0) > 0
                        THEN round(CAST(p.n_dup_windows AS DOUBLE) / p.n_windows, 6)
                        ELSE 0.0 END AS dup_fraction
            FROM planted d LEFT JOIN per_doc p USING (doc_id)
        """,
        "column_ddl_lifecycle": r"""
            SELECT n_nationkey, n_name AS nation_name, n_regionkey,
                   CAST(n_regionkey AS BIGINT) AS flag
            FROM nation
            UNION ALL
            SELECT n_nationkey + 100, n_name || '_NEW', n_regionkey,
                   CAST(n_nationkey % 2 AS BIGINT)
            FROM nation WHERE n_nationkey < 3
        """,
        "ann_topk": _PLANTED_ANN_ORACLE,
        "ivf_topk": _PLANTED_ANN_ORACLE,
        "pq_topk": _PLANTED_ANN_ORACLE,
        "ivfpq_topk": _PLANTED_ANN_ORACLE,
        "ann_index_topk": _PLANTED_ANN_ORACLE,
        "semantic_dedup": """
            SELECT vec_id FROM embeddings
        """,
        "generated_columns": """
            SELECT event_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events
        """,
        "dv_delete": """
            SELECT c_custkey, c_name, c_nationkey FROM customer
            WHERE c_nationkey >= 5 AND c_acctbal >= 0
        """,
        "dv_update": """
            SELECT c_custkey,
                   CASE WHEN c_nationkey < 5 THEN c_name || '-U' ELSE c_name END AS c_name,
                   c_nationkey
            FROM customer WHERE c_acctbal >= 0
        """,
        "dv_merge": """
            SELECT c_custkey,
                   CASE WHEN c_custkey % 3 = 0 THEN c_name || '-M' ELSE c_name END AS c_name,
                   c_nationkey
            FROM customer
            WHERE NOT (c_custkey % 3 = 0 AND c_acctbal < 0)
        """,
        "pipeline_e2e": f"""
            WITH aug AS (
              SELECT doc_id,
                     '{_BOILER_HEADER}' || chr(10) || text || chr(10) || '{_BOILER_FOOTER}' AS text
              FROM documents
            ),
            ls AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM aug),
            lines AS (
              SELECT doc_id, unnest(generate_series(1, len(a))) AS pos, unnest(a) AS line
              FROM ls
            ),
            marked AS (
              SELECT doc_id, pos, line,
                     CASE WHEN length(trim(line)) >= 10
                          THEN row_number() OVER (PARTITION BY line ORDER BY doc_id, pos)
                          ELSE 1 END AS rn
              FROM lines
            ),
            kept_lines AS (SELECT * FROM marked WHERE rn = 1),
            cleaned AS (
              SELECT t.doc_id, COALESCE(a.text, '') AS text
              FROM (SELECT DISTINCT doc_id FROM lines) t
              LEFT JOIN (
                SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
                FROM kept_lines GROUP BY doc_id
              ) a USING (doc_id)
            ),
            norm AS (
              SELECT doc_id, text,
                     trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
              FROM cleaned
            ),
            dd AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       row_number() OVER (PARTITION BY nt ORDER BY doc_id) AS rn
                FROM norm
              ) WHERE rn = 1
            ),
            tc AS (
              SELECT doc_id, text,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n
              FROM dd
            ),
            longe AS (SELECT doc_id, text, n FROM tc WHERE n >= 40),
            toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
              FROM longe WHERE length(trim(text)) > 0
            ),
            counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
            tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS total,
                           CAST(COUNT(*) AS DOUBLE) AS vocab FROM counts),
            model AS (
              SELECT token, ln((c + 1.0) / (total + 1.0 * (vocab + 1))) AS logp
              FROM counts, tot
            ),
            per AS (
              SELECT doc_id, AVG(logp) AS avg_logprob
              FROM toks JOIN model USING (token) GROUP BY doc_id
            ),
            keepppl AS (SELECT doc_id FROM per WHERE exp(-avg_logprob) <= 1500.0),
            kept AS (SELECT l.doc_id, l.n FROM longe l JOIN keepppl USING (doc_id)),
            samp AS (
              SELECT doc_id, n FROM kept
              WHERE (doc_id % 1000003) * 2654435761 % 1048576 < 629146
            ),
            off AS (
              SELECT doc_id, n,
                     CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
              FROM samp
            ),
            spans AS (
              SELECT doc_id, n, o,
                     unnest(generate_series(o // 256, (o + n - 1) // 256)) AS seq_id
              FROM off WHERE n > 0
            )
            SELECT seq_id, COUNT(*) AS n_docs,
                   CAST(SUM(LEAST(o + n - seq_id * 256, 256)
                          - GREATEST(o - seq_id * 256, 0)) AS BIGINT) AS n_tokens,
                   MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
            FROM spans GROUP BY seq_id
        """,
        "perplexity": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
              FROM documents WHERE length(trim(text)) > 0
            ),
            counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
            tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS total,
                           CAST(COUNT(*) AS DOUBLE) AS vocab FROM counts),
            model AS (
              SELECT token, ln((c + 1.0) / (total + 1.0 * (vocab + 1))) AS logp
              FROM counts, tot
            ),
            per AS (
              SELECT doc_id, COUNT(*) AS n_tokens, AVG(logp) AS avg_logprob
              FROM toks JOIN model USING (token) GROUP BY doc_id
            )
            SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens,
                   p.avg_logprob, exp(-p.avg_logprob) AS perplexity
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        "restore_roundtrip": """
            SELECT CAST(r_regionkey AS BIGINT) AS version, r_name AS operation
            FROM region
            UNION ALL
            SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), 'WRITE'),
                (1, 'DELETE'),
                (2, 'UPDATE'),
                (3, 'RESTORE')) AS t(version, operation)
        """,
        "log_cleanup": """
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
                   CAST(n_regionkey AS BIGINT) AS n_regionkey
            FROM nation WHERE n_regionkey <> 0
            UNION ALL
            SELECT CAST(n_nationkey + 100 AS BIGINT), n_name,
                   CAST(n_regionkey AS BIGINT)
            FROM nation
            UNION ALL
            SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), '__noop_before_aging__', CAST(-1 AS BIGINT)),
                (2, '__deleted_commit_jsons__', -1),
                (1, '__surviving_commits__', -1),
                (2, '__min_surviving_version__', -1),
                (1, '__time_travel_unreachable__', -1)
            ) AS m(n_nationkey, n_name, n_regionkey)
        """,
        "fsck_crc_repair": """
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
                   CAST(n_regionkey AS BIGINT) AS n_regionkey
            FROM nation WHERE n_regionkey <> 0
            UNION ALL
            SELECT * FROM (VALUES
                (CAST(1 AS BIGINT), '__fsck_detected__', CAST(-1 AS BIGINT)),
                (1, '__fsck_repaired__', -1),
                (1, '__dry_run_agrees__', -1),
                (1, '__fsck_commit_version__', -1),
                (4, '__crc_healed_numfiles__', -1)
            ) AS m(n_nationkey, n_name, n_regionkey)
        """,
        "shallow_clone": """
            SELECT s_suppkey, s_name, s_nationkey, 'clone' AS side
            FROM supplier WHERE s_nationkey >= 5
            UNION ALL
            SELECT s_suppkey, s_name, s_nationkey, 'source' AS side
            FROM supplier
        """,
        "check_constraints": """
            SELECT n_nationkey, n_name, n_regionkey FROM nation
            UNION ALL
            SELECT n_nationkey + 100, n_name, n_regionkey FROM nation
            UNION ALL
            SELECT n_nationkey + 200, n_name, n_regionkey + 10 FROM nation
        """,
        "profile_table": """
            SELECT 'doc_id' AS column, COUNT(*) AS n_rows,
                   COUNT(*) - COUNT(doc_id) AS n_nulls,
                   COUNT(DISTINCT doc_id) AS n_distinct,
                   CAST(MIN(doc_id) AS VARCHAR) AS min_value,
                   CAST(MAX(doc_id) AS VARCHAR) AS max_value
            FROM documents
            UNION ALL
            SELECT 'text', COUNT(*), COUNT(*) - COUNT(text), COUNT(DISTINCT text),
                   MIN(text), MAX(text) FROM documents
            UNION ALL
            SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
                   MIN(lang), MAX(lang) FROM documents
            UNION ALL
            SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), COUNT(DISTINCT source),
                   MIN(source), MAX(source) FROM documents
            UNION ALL
            SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
                   CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
            FROM documents
        """,
        "line_dedup": f"""
            WITH aug AS (
              SELECT doc_id,
                     '{_BOILER_HEADER}' || chr(10) || text || chr(10) || '{_BOILER_FOOTER}' AS text
              FROM documents
            ),
            ls AS (SELECT doc_id, string_split(text, chr(10)) AS a FROM aug),
            lines AS (
              SELECT doc_id, unnest(generate_series(1, len(a))) AS pos, unnest(a) AS line
              FROM ls
            ),
            marked AS (
              SELECT doc_id, pos, line,
                     CASE WHEN length(trim(line)) >= 10
                          THEN row_number() OVER (PARTITION BY line ORDER BY doc_id, pos)
                          ELSE 1 END AS rn
              FROM lines
            ),
            kept AS (SELECT * FROM marked WHERE rn = 1),
            agg AS (
              SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
                     COUNT(*) AS n_lines_kept
              FROM kept GROUP BY doc_id
            ),
            tot AS (SELECT doc_id, COUNT(*) AS n FROM lines GROUP BY doc_id)
            SELECT t.doc_id, COALESCE(a.text, '') AS text,
                   COALESCE(a.n_lines_kept, 0) AS n_lines_kept,
                   t.n - COALESCE(a.n_lines_kept, 0) AS n_lines_removed
            FROM tot t LEFT JOIN agg a USING (doc_id)
        """,
        "pack_sequences": r"""
            WITH toks AS (
              SELECT doc_id,
                     CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n
              FROM documents
            ),
            off AS (
              SELECT doc_id, n,
                     CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
              FROM toks
            ),
            spans AS (
              SELECT doc_id, n, o,
                     unnest(generate_series(o // 512, (o + n - 1) // 512)) AS seq_id
              FROM off WHERE n > 0
            )
            SELECT seq_id, COUNT(*) AS n_docs,
                   CAST(SUM(LEAST(o + n - seq_id * 512, 512)
                          - GREATEST(o - seq_id * 512, 0)) AS BIGINT) AS n_tokens,
                   MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
            FROM spans GROUP BY seq_id
        """,
        "epoch_shuffle": """
            SELECT doc_id,
                   ((doc_id + 3) % 1000003) * 2654435761 % 1048576 AS shuffle_key
            FROM documents
            ORDER BY shuffle_key, doc_id
            LIMIT 100
        """,
        "mixture_weights": """
            WITH c AS (
              SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n FROM documents GROUP BY source
            ),
            t AS (SELECT source, n, n / SUM(n) OVER () AS p FROM c),
            s AS (SELECT source, n, p, pow(p, 0.5) AS a FROM t)
            SELECT source, n, p, a / SUM(a) OVER () AS weight,
                   (a / SUM(a) OVER ()) / p AS multiplier
            FROM s
        """,
        "incremental_dedup": r"""
            WITH norm AS (
              SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
              FROM documents
            ),
            new AS (
              SELECT doc_id, nt FROM norm WHERE doc_id % 5 = 0
              UNION ALL
              SELECT doc_id + 100000, nt FROM norm WHERE doc_id % 5 = 1
            ),
            seen AS (SELECT nt FROM norm WHERE doc_id % 5 <> 0)
            SELECT doc_id FROM new WHERE nt NOT IN (SELECT nt FROM seen)
        """,
        "contamination_check": r"""
            WITH tok AS (
                SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') t
                FROM documents
            ),
            g AS (
                SELECT doc_id,
                       unnest(CASE WHEN len(t) >= 3
                              THEN [array_to_string(list_slice(t, i, i + 2), ' ')
                                    for i in generate_series(1, len(t) - 2)]
                              ELSE [] END) g
                FROM tok
            ),
            ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
            SELECT g.doc_id, CAST(count(DISTINCT g.g) AS BIGINT) AS n_shared_ngrams
            FROM g JOIN ev USING (g)
            WHERE g.doc_id % 97 <> 0
            GROUP BY g.doc_id
        """,
        "stratified_sample": """
            SELECT doc_id, source FROM documents
            WHERE ((doc_id % 1000003) * 2654435761) % 1048576 <
                  CAST(round(CASE source
                        WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.75
                        WHEN 'src2' THEN 0.5 WHEN 'src3' THEN 0.25
                        ELSE 0.1 END * 1048576) AS BIGINT)
        """,
        "doc_chunks": r"""
            WITH tok AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') t
                FROM documents WHERE len(trim(text)) > 0
            ),
            s AS (
                SELECT doc_id, t, unnest(generate_series(1, len(t), 40)) s
                FROM tok
            )
            SELECT doc_id,
                   CAST((s - 1) // 40 AS BIGINT) AS chunk_id,
                   array_to_string(list_slice(t, s, s + 49), ' ') AS chunk_text,
                   CAST(len(list_slice(t, s, s + 49)) AS BIGINT) AS n_chunk_tokens
            FROM s
        """,
        "embedding_quantize": """
            WITH d AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
                FROM embeddings
            ),
            m AS (
                SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) mx FROM d
            )
            SELECT vec_id,
                   CAST(i - 1 AS BIGINT) AS pos,
                   CAST(round(v[i] / mx * 127) AS BIGINT) AS code,
                   CAST(round(mx * 1e6) AS BIGINT) AS scale_ppm
            FROM (SELECT vec_id, v, mx, unnest(generate_series(1, len(v))) i FROM m)
        """,
        "repetition_signals": r"""
            WITH tok AS (
                SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') t
                FROM documents
            ),
            g AS (
                SELECT doc_id, t,
                       CASE WHEN len(t) >= 2
                            THEN [array_to_string(list_slice(t, i, i + 1), ' ')
                                  for i in generate_series(1, len(t) - 1)]
                            ELSE [] END g2,
                       CASE WHEN len(t) >= 3
                            THEN [array_to_string(list_slice(t, i, i + 2), ' ')
                                  for i in generate_series(1, len(t) - 2)]
                            ELSE [] END g3
                FROM tok
            )
            SELECT doc_id,
                   CASE WHEN len(t) > 0
                        THEN round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
                        ELSE 0.0 END AS dup_word_frac,
                   CASE WHEN len(g2) > 0
                        THEN round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6)
                        ELSE 0.0 END AS dup_bigram_frac,
                   CASE WHEN len(g3) > 0
                        THEN round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6)
                        ELSE 0.0 END AS dup_trigram_frac
            FROM g
        """,
        "kill_duplicate_records": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
            FROM orders
            QUALIFY COUNT(*) OVER (PARTITION BY o_custkey, o_orderpriority) = 1
        """,
        "remove_duplicate_records_pk": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
            FROM orders
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY o_custkey, o_orderpriority ORDER BY o_orderkey) = 1
        """,
        "remove_duplicate_records_nopk": """
            SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        """,
        "append_without_duplicates": """
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0
        """,
        "type2_scd_upsert": """
            SELECT c_custkey, c_mktsegment, TRUE AS is_current,
                   DATE '2020-01-01' AS effective_time, CAST(NULL AS DATE) AS end_time
            FROM customer WHERE c_custkey % 10 <> 0
            UNION ALL
            SELECT c_custkey, c_mktsegment, FALSE, DATE '2020-01-01', DATE '2021-01-01'
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey, c_mktsegment || '_v2', TRUE, DATE '2021-01-01', NULL
            FROM customer WHERE c_custkey % 10 = 0
        """,
        "validate_append": """
            SELECT n_nationkey, n_name, CAST(NULL AS VARCHAR) AS note FROM nation
            UNION ALL
            SELECT CAST(n_nationkey + 100 AS INTEGER), n_name, n_name AS note FROM nation
        """,
        "copy_table": "SELECT * FROM supplier",
        "with_md5_columns": """
            SELECT c_custkey,
                   md5(concat_ws('||', c_name, c_mktsegment)) AS _md5c_namec_mktsegment
            FROM customer
        """,
        "find_composite_key_candidate": "SELECT 'n_nationkey' AS column_name",
        "is_composite_key_candidate": """
            SELECT * FROM (VALUES ('n_nationkey', TRUE), ('n_regionkey', FALSE))
            AS t(column_name, is_key)
        """,
        "humanize_bytes": """
            SELECT * FROM (VALUES
                (0.0, '0 B'), (500.0, '500 B'), (900.0, '0.90 kB'), (1088.0, '1.09 kB'),
                (1000000.0, '1.00 MB'), (2500000000.0, '2.50 GB'),
                (1000000000000.0, '1.00 TB'), (1000000000000000.0, '1.00 PB')
            ) AS t(n, humanized)
        """,
        "operation_metrics": """
            SELECT CAST(version AS BIGINT) AS version, CAST(deleted AS BIGINT) AS deleted,
                   CAST(inserted AS BIGINT) AS inserted, CAST(updated AS BIGINT) AS updated,
                   CAST(source_rows AS BIGINT) AS source_rows
            FROM (VALUES (2, 0, 0, 5, 0), (1, 5, 0, 0, 0), (0, 0, 25, 0, 25))
            AS t(version, deleted, inserted, updated, source_rows)
        """,
        "operation_metrics_partition": """
            SELECT CAST(0 AS BIGINT) AS version, CAST(0 AS BIGINT) AS deleted,
                   CAST(COUNT(*) AS BIGINT) AS inserted, CAST(0 AS BIGINT) AS updated,
                   CAST(COUNT(*) AS BIGINT) AS source_rows
            FROM orders WHERE o_orderstatus = 'F'
        """,
        "read_cdf": """
            SELECT n_nationkey, n_name, n_regionkey,
                   'delete' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
            FROM nation WHERE n_regionkey = 0
            UNION ALL
            SELECT n_nationkey, n_name, n_regionkey, 'update_preimage', CAST(2 AS BIGINT)
            FROM nation WHERE n_regionkey = 1
            UNION ALL
            SELECT n_nationkey, n_name || '_x', n_regionkey, 'update_postimage', CAST(2 AS BIGINT)
            FROM nation WHERE n_regionkey = 1
        """,
        "column_defaults": """
            SELECT s_suppkey,
                   CASE WHEN s_suppkey % 2 = 0 THEN s_name
                        ELSE 'UNKNOWN' END AS s_name,
                   CASE WHEN s_suppkey % 2 = 0 THEN s_nationkey
                        ELSE -1 END AS s_nationkey
            FROM supplier
        """,
        "sql_dml": """
            SELECT n_nationkey,
                   CASE WHEN n_regionkey = 1 THEN lower(n_name) ELSE n_name END
                     AS n_name,
                   n_regionkey
            FROM nation WHERE n_regionkey <> 0
            UNION ALL
            SELECT * FROM (VALUES
                (900, 'NEWLAND', 9), (901, 'OLDLAND', 9))
                AS t(n_nationkey, n_name, n_regionkey)
        """,
        "encode_corpus": r"""
            WITH words AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
              FROM documents WHERE length(trim(text)) > 0),
            toks AS (
              SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[i] AS token
              FROM words, LATERAL unnest(generate_series(1, len(w))) AS g(i)),
            counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
            vocab AS (
              SELECT token,
                     CAST(ROW_NUMBER() OVER (ORDER BY c DESC, token) AS INT)
                       AS token_id
              FROM counts QUALIFY token_id <= 50)
            SELECT t.doc_id, t.pos, t.token, COALESCE(v.token_id, 0) AS token_id
            FROM toks t LEFT JOIN vocab v USING (token)
            WHERE t.doc_id < 50
        """,
        "v2_checkpoint": """
            SELECT CAST(n_nationkey AS BIGINT) AS version, n_name AS operation
            FROM nation WHERE NOT (n_regionkey = 4 AND n_nationkey < 20)
            UNION ALL
            SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), 'WRITE'),
                (1, 'DELETE'),
                (2, 'WRITE')) AS t(version, operation)
        """,
        "type_widening": """
            SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
                   ROUND(CAST(CAST(s_acctbal AS REAL) AS DOUBLE), 4) AS s_acctbal
            FROM supplier WHERE s_suppkey % 2 = 0
            UNION ALL
            SELECT CAST(s_suppkey AS BIGINT),
                   ROUND(CAST(s_acctbal AS DOUBLE), 4)
            FROM supplier WHERE s_suppkey % 2 = 1
        """,
        "liquid_clustering": """
            SELECT CAST(n_nationkey AS BIGINT) AS version, n_name AS operation
            FROM nation
            UNION ALL
            SELECT * FROM (VALUES
                (CAST(0 AS BIGINT), 'WRITE'),
                (1, 'WRITE'),
                (2, 'OPTIMIZE'),
                (3, 'CLUSTER BY'),
                (1002, 'CLUSTER_COLS')) AS t(version, operation)
        """,
        "row_tracking": """
            WITH s AS (
              SELECT s_suppkey, s_name, s_suppkey % 2 AS batch,
                     ROW_NUMBER() OVER (
                       PARTITION BY s_suppkey % 2 ORDER BY s_suppkey) - 1 AS rn
              FROM supplier),
            c AS (SELECT COUNT(*) AS n0 FROM s WHERE batch = 0)
            SELECT CAST(CASE WHEN batch = 0 THEN rn ELSE n0 + rn END AS BIGINT)
                     AS _row_id,
                   CAST(batch AS BIGINT) AS _row_commit_version,
                   s_suppkey, s_name
            FROM s, c
        """,
        "knn_graph": """
            WITH ids AS (
              SELECT unnest([0, 100001, 100002, 100003, 100004, 100005,
                             100006, 100007, 100008, 100009]) AS id),
            pairs AS (
              SELECT a.id AS vec_id, b.id AS neighbor_id, 1.0 AS sim,
                     CAST(ROW_NUMBER() OVER (
                          PARTITION BY a.id ORDER BY b.id) AS INT) AS rank
              FROM ids a JOIN ids b ON a.id <> b.id)
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(neighbor_id AS BIGINT) AS neighbor_id, sim, rank
            FROM pairs
        """,
        "cdf_datasource": """
            SELECT n_nationkey, n_name, n_regionkey,
                   'delete' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
            FROM nation WHERE n_regionkey = 0
            UNION ALL
            SELECT n_nationkey, n_name, n_regionkey, 'update_preimage', CAST(2 AS BIGINT)
            FROM nation WHERE n_regionkey = 1
            UNION ALL
            SELECT n_nationkey, n_name || '_x', n_regionkey, 'update_postimage', CAST(2 AS BIGINT)
            FROM nation WHERE n_regionkey = 1
        """,
        "cdf_status": """
            SELECT CAST(version AS BIGINT) AS version, cdf_enabled
            FROM (VALUES (0, TRUE), (1, TRUE), (2, TRUE)) AS t(version, cdf_enabled)
        """,
        "cdf_recovery": """
            SELECT check_name, CAST(value AS BIGINT) AS value FROM (VALUES
                ('dry_run_ok', 1), ('log_start', 1), ('log_end', 3),
                ('cdc_start', 1), ('cdc_end', 3), ('n_ranges', 1),
                ('range0_start', 1), ('range0_end', 3)
            ) AS t(check_name, value)
        """,
        "exact_dedup_documents": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                ORDER BY doc_id) = 1
        """,
        "merge_full_sync": """
            -- by-source full-sync clause ladder as CASE logic: matched
            -- (even) rows sync; unmatched %5=0 rows delete; the rest
            -- go stale
            SELECT c_custkey,
                   CASE WHEN c_custkey % 2 = 0 THEN c_acctbal * 2
                        ELSE c_acctbal END AS c_acctbal,
                   CASE WHEN c_custkey % 2 = 0 THEN 'synced'
                        ELSE 'stale' END AS status
            FROM customer
            WHERE c_custkey % 2 = 0 OR c_custkey % 5 <> 0
        """,
        "nested_evolution": """
            -- nested evolution merge replayed as a full-outer election
            -- over the FLATTENED struct members
            WITH tgt AS (
              SELECT c_custkey, c_acctbal AS bal, c_mktsegment AS seg
              FROM customer WHERE c_custkey % 4 <> 0
            ), src AS (
              SELECT o.o_custkey AS c_custkey,
                     max(c.c_mktsegment) AS seg,
                     max(c.c_acctbal) AS bal,
                     sum(o.o_totalprice) AS spend
              FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
              WHERE o.o_custkey % 2 = 0
              GROUP BY o.o_custkey
            )
            SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
                   CASE WHEN s.c_custkey IS NOT NULL THEN s.bal ELSE t.bal END AS bal,
                   CASE WHEN s.c_custkey IS NOT NULL THEN s.seg ELSE t.seg END AS seg,
                   s.spend AS spend
            FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
        """,
        "quality_dedup": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                ORDER BY n_chars DESC, doc_id) = 1
        """,
        "image_dedup": """
            -- cross-format exact image clones collide at dhash hamming
            -- 0 and drop (higher id); deterministic-noise originals sit
            -- far apart and all survive — closed-form in doc_id
            SELECT doc_id FROM documents WHERE doc_id < 300
        """,
        "audio_dedup": """
            -- exact audio clones collide at envelope-hash hamming 0 and
            -- drop; distinct amplitude envelopes survive
            SELECT doc_id FROM documents WHERE doc_id < 300
        """,
        "audio_dedup_flac": """
            -- WAV and cross-format FLAC clones both collide (lossless:
            -- identical PCM -> identical envelope hash); survivors are
            -- exactly the originals
            SELECT doc_id FROM documents WHERE doc_id < 300
        """,
        "video_dedup": """
            -- re-ordered cuts of the same footage have frame-set
            -- Jaccard 1.0 and drop; distinct noise streams survive
            SELECT doc_id FROM documents WHERE doc_id < 200
        """,
        "interval_join": """
            -- purchases within [0s, 30min] after a view by the same
            -- user; per-user pair count + attributed value
            SELECT v.user_id,
                   COUNT(*) AS n_pairs,
                   ROUND(SUM(b.value), 3) AS attributed_value
            FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
            JOIN (SELECT user_id, ts, value FROM events
                  WHERE event_type = 'purchase') b
              ON v.user_id = b.user_id
             AND b.ts >= v.ts
             AND b.ts <= v.ts + INTERVAL 30 MINUTE
            GROUP BY v.user_id
        """,
        "streaming_scd2": """
            -- final SCD2 dimension state, closed-form in c_custkey:
            -- %10=0 keys carry a closed version-1 row and a current
            -- version-2 row (+100 balance); every other key (incl. the
            -- no-op %10=1 changes) keeps its original current row
            WITH base AS (
                SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS balance
                FROM customer WHERE c_custkey <= 300
            )
            SELECT c_custkey, balance, FALSE AS is_current,
                   CAST(1 AS INT) AS eff, CAST(2 AS INT) AS end_time
            FROM base WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey, balance + 100 AS balance, TRUE AS is_current,
                   CAST(2 AS INT) AS eff, CAST(NULL AS INT) AS end_time
            FROM base WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey, balance, TRUE AS is_current,
                   CAST(1 AS INT) AS eff, CAST(NULL AS INT) AS end_time
            FROM base WHERE c_custkey % 10 <> 0
        """,
        "merge_schema_evolution": """
            -- schema-evolution merge on a mapped target, replayed as a
            -- full-outer election: matched rows take the source (update
            -- all), target-only rows keep their values with NULL evolved
            -- columns, source-only rows insert whole
            WITH tgt AS (
              SELECT c_custkey, c_name AS cust_name, c_acctbal
              FROM customer WHERE c_custkey % 3 <> 0
            ), src AS (
              SELECT o.o_custkey AS c_custkey,
                     max(c.c_name) AS cust_name,
                     max(c.c_acctbal) AS c_acctbal,
                     count(*) AS n_orders,
                     sum(o.o_totalprice) AS total_spend
              FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
              WHERE o.o_custkey % 2 = 0
              GROUP BY o.o_custkey
            )
            SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
                   CASE WHEN s.c_custkey IS NOT NULL THEN s.cust_name ELSE t.cust_name END AS cust_name,
                   CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
                   s.n_orders AS n_orders,
                   s.total_spend AS total_spend
            FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
        """,
        "datasource_field_id": """
            SELECT CAST(c_custkey AS BIGINT) AS k,
                   'g' || CAST(c_custkey % 5 AS VARCHAR) AS grp
            FROM customer
            WHERE c_custkey < 300 AND c_custkey % 7 <> 0
        """,
        "column_mapping_id": """
            -- foreign field-id table after DELETE (%7), UPDATE (%10=1)
            -- and APPEND (+100000 for %50=0): closed-form in c_custkey
            WITH base AS (
                SELECT c_custkey AS k,
                       'g' || CAST(c_custkey % 5 AS VARCHAR) AS grp
                FROM customer WHERE c_custkey < 300
            )
            SELECT k,
                   CASE WHEN k % 10 = 1 THEN 'updated' ELSE grp END AS grp
            FROM base WHERE k % 7 <> 0
            UNION ALL
            SELECT k + 100000 AS k, 'new' AS grp FROM base WHERE k % 50 = 0
        """,
        "variant_table": """
            -- variant values after DELETE (%7) and UPDATE (%10=1,
            -- which also drops field b): closed-form in doc_id
            SELECT doc_id,
                   CAST(CASE WHEN doc_id % 10 = 1 THEN doc_id * 2
                        ELSE doc_id END AS BIGINT) AS a,
                   CASE WHEN doc_id % 10 = 1 THEN NULL
                        ELSE 'x' || doc_id END AS b
            FROM documents
            WHERE doc_id < 200 AND doc_id % 7 <> 0
        """,
        "substring_dedup": r"""
            -- Lee et al. exact substring dedup: identical window
            -- election (md5 of each 15-token window; first occurrence
            -- by (doc_id, pos) is the keeper), identical covered-index
            -- removal and whitespace-normalized reassembly
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
              FROM documents WHERE length(trim(text)) > 0
            ), wins AS (
              SELECT doc_id, i AS pos, md5(array_to_string(w[i:i+14], ' ')) AS h
              FROM toks, LATERAL unnest(generate_series(1, len(w) - 14)) AS g(i)
            ), ranked AS (
              SELECT doc_id, pos,
                     ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
                     COUNT(*) OVER (PARTITION BY h) AS cnt
              FROM wins
            ), rem AS (
              SELECT doc_id, pos FROM ranked WHERE cnt > 1 AND rn > 1
            ), covered AS (
              SELECT DISTINCT doc_id, idx
              FROM rem, LATERAL unnest(generate_series(pos, pos + 14)) AS c(idx)
            ), tokens AS (
              SELECT doc_id, i AS idx, w[i] AS tok
              FROM toks, LATERAL unnest(generate_series(1, len(w))) AS t(i)
            ), kept AS (
              SELECT t.doc_id,
                     array_to_string(list(t.tok ORDER BY t.idx), ' ') AS clean_text,
                     COUNT(*) AS n_kept
              FROM tokens t
              ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.idx = c.idx
              GROUP BY t.doc_id
            ), orig AS (SELECT doc_id, len(w) AS n_orig FROM toks)
            SELECT d.doc_id,
                   COALESCE(k.clean_text, '') AS clean_text,
                   CAST(COALESCE(o.n_orig, 0) - COALESCE(k.n_kept, 0) AS BIGINT)
                       AS n_tokens_removed
            FROM documents d
            LEFT JOIN kept k USING (doc_id)
            LEFT JOIN orig o USING (doc_id)
        """,
        "streaming_dedup": """
            -- one stream survivor per distinct normalized content:
            -- re-deliveries share the original's fingerprint, so the
            -- survivor fingerprint set is the corpus's distinct set
            SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents GROUP BY 1
        """,
        "streaming_cdc_apply": """
            -- final table state after applying the change feed with
            -- last-wins-by-seq: %7 keys deleted (delete seq 3 beats
            -- update seq 2), %10 keys updated (+100, seq 2), %50 keys
            -- re-inserted under key+100000
            WITH base AS (
                SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS bal
                FROM customer WHERE c_custkey <= 500
            ), kept AS (
                SELECT c_custkey, c_name,
                       CASE WHEN c_custkey % 10 = 0 THEN bal + 100 ELSE bal END
                           AS c_acctbal,
                       CAST(CASE WHEN c_custkey % 10 = 0 THEN 2 ELSE 1 END AS INTEGER)
                           AS seq
                FROM base WHERE c_custkey % 7 <> 0
            ), ins AS (
                SELECT c_custkey + 100000 AS c_custkey,
                       'new account ' || c_custkey AS c_name,
                       CAST(c_custkey AS DOUBLE) AS c_acctbal,
                       CAST(2 AS INTEGER) AS seq
                FROM base WHERE c_custkey % 50 = 0
            )
            SELECT * FROM kept UNION ALL SELECT * FROM ins
        """,
        "token_count": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                   AS n_tokens
            FROM documents
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "text_quality": """
            WITH w AS (
                SELECT doc_id, length(text) AS n_chars,
                       len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                       x -> len(x) > 0)) AS n_words,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                       length(regexp_replace(text, '[^.!?]', '', 'g')) > 0 AS has_term
                FROM documents
            )
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   ((CASE WHEN n_chars BETWEEN 100 AND 100000 THEN 1.0 ELSE 0.0 END)
                    + (CASE WHEN n_words > 0
                            AND (CAST(n_chars AS DOUBLE) / n_words) BETWEEN 3 AND 12
                            THEN 1.0 ELSE 0.0 END)
                    + (CASE WHEN n_chars > 0
                            AND (CAST(n_alpha AS DOUBLE) / n_chars) >= 0.6
                            THEN 1.0 ELSE 0.0 END)
                    + (CASE WHEN has_term THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
            FROM w
        """,
        "multimodal_decode": """
            -- real-codec oracle: px_sum recomputes the synthesized
            -- gradient (did + 7y + 3x [+ c]) % 256 over every decoded
            -- pixel (gray replicates to 3 channels), proving PNG
            -- filter / BMP row reconstruction; BMP size is 54 +
            -- padded_row*h (PNG zlib length → NULL); WAV duration is
            -- n_samples*1000/8000 — all closed-form in doc_id
            WITH m AS (
                SELECT doc_id, doc_id % 3 AS fmt,
                       CAST(4 + doc_id % 13 AS INTEGER) AS width,
                       CAST(3 + doc_id % 7 AS INTEGER) AS height,
                       CAST(500 + doc_id % 300 AS BIGINT) AS n_samples
                FROM documents WHERE doc_id < 200
            ), px AS (
                SELECT m.doc_id,
                       SUM(CASE WHEN m.fmt = 2
                           THEN 3 * ((m.doc_id + 7*y.y + 3*x.x) % 256)
                           ELSE (m.doc_id + 7*y.y + 3*x.x) % 256
                              + (m.doc_id + 7*y.y + 3*x.x + 1) % 256
                              + (m.doc_id + 7*y.y + 3*x.x + 2) % 256
                           END) AS px_sum
                FROM m,
                     LATERAL (SELECT unnest(generate_series(0, m.height - 1)) AS y) y,
                     LATERAL (SELECT unnest(generate_series(0, m.width - 1)) AS x) x
                GROUP BY m.doc_id
            )
            SELECT m.doc_id, width, height,
                   CAST(width * height AS BIGINT) AS n_pixels,
                   CAST(px.px_sum AS BIGINT) AS px_sum,
                   CASE WHEN m.fmt = 0
                        THEN CAST(54 + ((3 * width + 3) // 4 * 4) * height AS BIGINT)
                   END AS n_bytes,
                   CAST(8000 AS INTEGER) AS sample_rate,
                   n_samples,
                   CAST(n_samples * 1000 // 8000 AS BIGINT) AS duration_ms
            FROM m JOIN px ON m.doc_id = px.doc_id
        """,
        "similarity_topk": """
            SELECT vec_id FROM embeddings
            ORDER BY list_cosine_similarity(
                CAST(embedding AS DOUBLE[]),
                (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
            ) DESC, vec_id
            LIMIT 10
        """,
        "num_record_distribution": """
            SELECT o_orderstatus, CAST(1 AS BIGINT) AS num_of_parquet_files,
                   CAST(COUNT(*) AS DOUBLE) AS mean_num_records_in_files
            FROM orders GROUP BY o_orderstatus
        """,
        "num_shuffle_files": """
            WITH numbered AS (
                SELECT o_orderstatus AS s, o_orderkey AS k,
                       CAST(FLOOR((ROW_NUMBER() OVER (
                           PARTITION BY o_orderstatus ORDER BY o_orderkey
                       ) - 1) / 2000) AS BIGINT) AS f
                FROM orders
            ), files AS (
                -- one row per written parquet file: the writer receives
                -- rows sorted by (status, orderkey) with
                -- maxRecordsPerFile=2000, so file f of status s is the
                -- f-th 2000-row chunk of that status's sorted keys
                SELECT s, f, MAX(k) AS max_k FROM numbered GROUP BY s, f
            ), m AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS total,
                       CAST(COUNT(*) FILTER (WHERE s = 'F' AND max_k >= 1000)
                            AS BIGINT) AS overall_n,
                       CAST(COUNT(*) FILTER (WHERE max_k >= 1000)
                            AS BIGINT) AS minmax_n,
                       CAST(COUNT(*) FILTER (WHERE s = 'F') AS BIGINT) AS eq_n
                FROM files
            )
            SELECT 'OVERALL RESOLVED CONDITION => [ (o_orderstatus = ''F'') and (o_orderkey >= 1000) ]' AS metric,
                   overall_n AS num_files FROM m
            UNION ALL SELECT 'GREATER THAN / LESS THAN PART => [ (o_orderkey >= 1000) ]', minmax_n FROM m
            UNION ALL SELECT 'EQUALS/EQUALS NULL SAFE PART => [ (o_orderstatus = ''F'') ]', eq_n FROM m
            UNION ALL SELECT 'LEFT OVER PART => [ Empty ]', total FROM m
            UNION ALL SELECT 'UNRESOLVED PART => [ Empty ]', total FROM m
            UNION ALL SELECT 'TOTAL_NUM_FILES_IN_DELTA_TABLE =>', total FROM m
        """,
        "shuffle_files_deterministic": """
            SELECT metric, CAST(num_files AS BIGINT) AS num_files FROM (VALUES
                ('OVERALL RESOLVED CONDITION => [ (o_orderstatus = ''F'') ]', 1),
                ('GREATER THAN / LESS THAN PART => [ Empty ]', 3),
                ('EQUALS/EQUALS NULL SAFE PART => [ (o_orderstatus = ''F'') ]', 1),
                ('LEFT OVER PART => [ Empty ]', 3),
                ('UNRESOLVED PART => [ Empty ]', 3),
                ('TOTAL_NUM_FILES_IN_DELTA_TABLE =>', 3)
            ) AS t(metric, num_files)
        """,
        "clean_corpus": """
            WITH sig AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                       AS n_tokens,
                       length(text) AS n_chars,
                       len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                       x -> len(x) > 0)) AS n_words,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                       length(regexp_replace(text, '[^.!?]', '', 'g')) > 0 AS has_term,
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
                FROM documents
            ), scored AS (
                SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, fingerprint,
                       ((CASE WHEN n_chars BETWEEN 100 AND 100000 THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN n_words > 0
                                AND (CAST(n_chars AS DOUBLE) / n_words) BETWEEN 3 AND 12
                                THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN n_chars > 0
                                AND (CAST(n_alpha AS DOUBLE) / n_chars) >= 0.6
                                THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN has_term THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
                FROM sig
            )
            SELECT doc_id, n_tokens, quality, fingerprint FROM scored
            WHERE quality >= 0.5 AND n_tokens >= 10
            QUALIFY ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
        """,
        "clean_corpus_fuzzy": f"""
            WITH RECURSIVE sig AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                       AS n_tokens,
                       length(text) AS n_chars,
                       len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                       x -> len(x) > 0)) AS n_words,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                       length(regexp_replace(text, '[^.!?]', '', 'g')) > 0 AS has_term,
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
                FROM documents
            ), scored AS (
                SELECT doc_id, n_tokens, fingerprint,
                       ((CASE WHEN n_chars BETWEEN 100 AND 100000 THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN n_words > 0
                                AND (CAST(n_chars AS DOUBLE) / n_words) BETWEEN 3 AND 12
                                THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN n_chars > 0
                                AND (CAST(n_alpha AS DOUBLE) / n_chars) >= 0.6
                                THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN has_term THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
                FROM sig
            ), kept AS (
                SELECT s.doc_id, d.text
                FROM scored s JOIN documents d USING (doc_id)
                WHERE s.quality >= 0.5 AND s.n_tokens >= 10
                QUALIFY ROW_NUMBER() OVER (PARTITION BY s.fingerprint ORDER BY s.doc_id) = 1
            ), {_jaccard_pairs_cte("kept")}, {_COMPONENT_DROP_CTE}
            SELECT doc_id FROM kept
            WHERE doc_id NOT IN (SELECT id FROM dropped)
        """,
        "token_frequencies": """
            SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences FROM (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(text), '[^a-z]+'),
                    x -> len(x) > 0)) AS token
                FROM documents
            ) GROUP BY token
            ORDER BY n_occurrences DESC, token
            LIMIT 100
        """,
        "corpus_stats": """
            WITH sig AS (
                SELECT length(text) AS n_chars,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                       len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                       x -> len(x) > 0)) AS n_words,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                       length(regexp_replace(text, '[^.!?]', '', 'g')) > 0 AS has_term,
                       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
                FROM documents
            ), scored AS (
                SELECT n_chars, n_tokens, fingerprint,
                       ((CASE WHEN n_chars BETWEEN 100 AND 100000 THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN n_words > 0
                                AND (CAST(n_chars AS DOUBLE) / n_words) BETWEEN 3 AND 12
                                THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN n_chars > 0
                                AND (CAST(n_alpha AS DOUBLE) / n_chars) >= 0.6
                                THEN 1.0 ELSE 0.0 END)
                        + (CASE WHEN has_term THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality
                FROM sig
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                   ROUND(AVG(quality), 6) AS mean_quality,
                   CAST(COUNT(DISTINCT fingerprint) AS BIGINT) AS n_distinct_fingerprints
            FROM scored
        """,
        "as_of_join": """
            WITH e AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts, value
                       FROM events),
            l AS (SELECT user_id, ts, event_id FROM e WHERE event_id % 10 <> 0),
            r AS (SELECT user_id, ts, MAX(value) AS ref_value
                  FROM e WHERE event_id % 10 = 0 GROUP BY user_id, ts)
            SELECT l.event_id, r.ref_value AS right_ref_value
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "range_join": """
            SELECT e.event_id, r.label
            FROM events e
            JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'),
                         (150.0, 300.0, 'high'), (300.0, 500.0, 'extreme'))
                 AS r(lo, hi, label)
            ON e.value >= r.lo AND e.value < r.hi
        """,
        "windowed_event_counts": """
            SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_epoch,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events
            GROUP BY 1, 2
        """,
        "streaming_sessionize": """
            WITH lagged AS (
                SELECT user_id, event_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_ts
                FROM events WHERE user_id < 200
            ), flagged AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN prev_ts IS NULL
                                 OR ts - prev_ts > INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS new_s
                FROM lagged
            )
            SELECT user_id, event_id,
                   CAST(SUM(new_s) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_seq
            FROM flagged
        """,
        "streaming_window_counts": """
            SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_epoch,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events
            GROUP BY 1, 2
        """,
        "sessionize": """
            SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions FROM (
                SELECT user_id,
                       CASE WHEN prev_ts IS NULL
                                 OR ts - prev_ts > INTERVAL '30 minutes' THEN 1
                            ELSE 0 END AS new_s
                FROM (SELECT user_id, ts,
                             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                      FROM events) t
            ) g GROUP BY user_id
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 100
        """,
        "decoder_override_dedup": """
            -- mp4 clones (doc_id %4=0) route through the override,
            -- collide at hamming 0 and drop; unique mp4s (%4=1)
            -- decode+survive; unroutable blobs (%4=2) skip+survive
            SELECT doc_id FROM documents WHERE doc_id < 200
            UNION ALL
            SELECT doc_id + 100000 AS doc_id FROM documents
            WHERE doc_id < 200 AND doc_id % 4 IN (1, 2)
        """,
        "reorg_purge_manifest": """
            -- rows readable through the post-PURGE symlink manifests =
            -- exactly the surviving rows of the DV delete
            SELECT o_orderstatus AS part,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
            FROM orders WHERE o_orderkey % 3 != 0
            GROUP BY o_orderstatus
        """,
        "iceberg_convert": """
            -- the converted-from-Iceberg Delta table = post-delete
            -- source state
            SELECT o_orderstatus AS part,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
            FROM orders WHERE o_orderkey % 3 != 0
            GROUP BY o_orderstatus
        """,
        "media_probe": """
            -- closed form of the planted media corpus (mod-4 lanes)
            SELECT doc_id,
                   CASE doc_id % 4 WHEN 0 THEN 'mp4' WHEN 1 THEN 'wav'
                        WHEN 2 THEN 'flac' ELSE 'bmp' END AS container,
                   CASE doc_id % 4
                        WHEN 0 THEN 1000 + doc_id
                        WHEN 1 THEN (800 + doc_id) * 1000 // 8000
                        WHEN 2 THEN (800 + doc_id) * 1000 // 8000
                        ELSE NULL END AS duration_ms,
                   CASE doc_id % 4 WHEN 0 THEN 320 + doc_id
                        WHEN 3 THEN 6 + doc_id % 8 ELSE NULL
                        END AS width,
                   CASE doc_id % 4 WHEN 0 THEN 240 + doc_id
                        WHEN 3 THEN 8 + doc_id % 16 ELSE NULL
                        END AS height,
                   CASE doc_id % 4 WHEN 0 THEN 'avc1'
                        WHEN 3 THEN 'bmp' ELSE NULL END AS video_codec,
                   CASE doc_id % 4 WHEN 0 THEN 'mp4a' WHEN 1 THEN 'pcm'
                        WHEN 2 THEN 'flac' ELSE NULL END AS audio_codec,
                   CASE doc_id % 4 WHEN 0 THEN 24 + doc_id ELSE NULL
                        END AS n_video_samples,
                   CASE doc_id % 4 WHEN 0 THEN 100 + doc_id
                        WHEN 1 THEN 800 + doc_id
                        WHEN 2 THEN 800 + doc_id ELSE NULL
                        END AS n_audio_samples,
                   CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 8000
                        WHEN 2 THEN 8000 ELSE NULL END AS audio_rate
            FROM documents WHERE doc_id < 400
        """,
        "warc_ingest": """
            -- closed form: every doc one 200 response with its text
            -- bytes; ids %5=0 also a 404 with 'not found:{id}'
            SELECT doc_id, 200 AS http_status,
                   'text/html' AS http_content_type,
                   CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
            FROM documents WHERE doc_id < 500
            UNION ALL
            SELECT doc_id, 404,
                   'text/plain',
                   CAST(octet_length(encode('not found:' || CAST(doc_id AS VARCHAR)))
                        AS BIGINT)
            FROM documents WHERE doc_id < 500 AND doc_id % 5 = 0
        """,
        "cdx_index": """
            -- closed form of the planted cc-index lines
            SELECT doc_id,
                   'com,dom' || CAST(doc_id % 5 AS VARCHAR) || ',sub'
                       || CAST(doc_id % 3 AS VARCHAR) || ')/p/'
                       || CAST(doc_id AS VARCHAR) AS surt_key,
                   CAST(20240101000000 + doc_id AS VARCHAR) AS capture_ts,
                   'text/html' AS mime,
                   CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS status,
                   CAST(1000 + doc_id AS BIGINT) AS length,
                   CAST(doc_id * 10 AS BIGINT) AS offset,
                   'seg' || CAST(doc_id % 2 AS VARCHAR) || '.warc.gz'
                       AS filename,
                   TRUE AS surt_match
            FROM documents WHERE doc_id < 500
        """,
        "robots_filter": """
            -- closed form: host1 blocks everything; host0 blocks the
            -- /blocked/ lane except the longer Allow /blocked/except*;
            -- host2 has no robots -> allowed
            SELECT doc_id FROM documents
            WHERE doc_id < 600
              AND doc_id % 3 != 1
              AND NOT (doc_id % 3 = 0 AND doc_id % 4 = 1)
        """,
        "crawl_pipeline_e2e": """
            -- composed closed form: robots drop host1 entirely and
            -- host0's /sec1/ lane; then top-40 per host by
            -- (payload bytes DESC, doc_id)
            WITH allowed AS (
                SELECT doc_id,
                       CAST(octet_length(encode(text)) AS BIGINT)
                           AS payload_bytes,
                       doc_id % 3 AS host
                FROM documents
                WHERE doc_id < 600
                  AND doc_id % 3 != 1
                  AND NOT (doc_id % 3 = 0 AND doc_id % 4 = 1)
            )
            SELECT doc_id, payload_bytes FROM (
                SELECT doc_id, payload_bytes,
                       ROW_NUMBER() OVER (
                           PARTITION BY host
                           ORDER BY payload_bytes DESC, doc_id) AS rn
                FROM allowed
            ) t WHERE rn <= 40
        """,
        "corpus_overlap": """
            -- KMV bottom-128 replicated exactly: md5-prefix 60-bit
            -- points, k-th order statistic estimator, union-membership
            -- intersection
            WITH hashed AS (
                SELECT DISTINCT
                    CAST(CAST(concat('0x', substr(md5(text), 1, 15)) AS UBIGINT)
                         AS BIGINT) AS h,
                    bool_or(doc_id % 3 != 0) OVER (PARTITION BY text) AS in_a,
                    bool_or(doc_id % 2 = 0) OVER (PARTITION BY text) AS in_b
                FROM documents
            ), a AS (
                SELECT h FROM hashed WHERE in_a ORDER BY h LIMIT 128
            ), b AS (
                SELECT h FROM hashed WHERE in_b ORDER BY h LIMIT 128
            ), u AS (
                SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b)
                ORDER BY h LIMIT 128
            ), est AS (
                SELECT
                    (SELECT CASE WHEN COUNT(*) < 128 THEN COUNT(*) * 1.0
                            ELSE 127.0 / ((MAX(h) + 1.0) / 1152921504606846976.0)
                            END FROM a) AS n_a,
                    (SELECT CASE WHEN COUNT(*) < 128 THEN COUNT(*) * 1.0
                            ELSE 127.0 / ((MAX(h) + 1.0) / 1152921504606846976.0)
                            END FROM b) AS n_b,
                    (SELECT CASE WHEN COUNT(*) < 128 THEN COUNT(*) * 1.0
                            ELSE 127.0 / ((MAX(h) + 1.0) / 1152921504606846976.0)
                            END FROM u) AS n_union,
                    (SELECT COUNT(*) FROM u
                     WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b))
                    * 1.0 / (SELECT COUNT(*) FROM u) AS rho
            )
            SELECT ROUND(n_a, 4) AS n_a, ROUND(n_b, 4) AS n_b,
                   ROUND(n_union, 4) AS n_union,
                   ROUND(rho * n_union, 4) AS n_intersect,
                   ROUND(rho, 6) AS jaccard
            FROM est
        """,
        "uniform_iceberg": """
            -- rows readable through the CURRENT Iceberg snapshot's
            -- manifest chain = the post-delete table state
            SELECT o_orderstatus AS part,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
            FROM orders WHERE o_orderkey % 3 != 0
            GROUP BY o_orderstatus
        """,
        "domain_cap": """
            -- closed form of the planted URLs: domain = dom{id%5}.com,
            -- junk (id%7=0) rows have no domain and always survive;
            -- top-20 per domain by (n_chars DESC, doc_id)
            WITH planted AS (
                SELECT doc_id, n_chars,
                       CASE WHEN doc_id % 7 = 0 THEN NULL
                            ELSE 'dom' || CAST(doc_id % 5 AS VARCHAR) || '.com'
                       END AS dom
                FROM documents
            )
            SELECT doc_id FROM (
                SELECT doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY dom
                           ORDER BY n_chars DESC, doc_id) AS rn
                FROM planted WHERE dom IS NOT NULL
            ) t WHERE rn <= 20
            UNION ALL
            SELECT doc_id FROM planted WHERE dom IS NULL
        """,
        "dsir_weights": """
            -- DSIR log-weights replicated exactly: unigram+bigram
            -- features, md5-prefix buckets mod 4096, Laplace-smoothed
            -- log(p_target/p_raw) summed per document
            WITH docs AS (
                SELECT doc_id, lower(trim(text)) AS t FROM documents
            ), toks AS (
                SELECT doc_id, regexp_split_to_array(t, '\\s+') AS w
                FROM docs WHERE length(t) > 0
            ), feats AS (
                SELECT doc_id, unnest(
                    list_concat(
                        w,
                        list_transform(range(1, len(w)),
                                       i -> w[i] || ' ' || w[i + 1])
                    )) AS f
                FROM toks
            ), bucketed AS (
                SELECT doc_id,
                       CAST(CAST(concat('0x', substr(md5(f), 1, 8)) AS UBIGINT)
                            % 4096 AS BIGINT) AS bucket
                FROM feats
            ), raw_counts AS (
                SELECT bucket, COUNT(*) AS n FROM bucketed GROUP BY bucket
            ), tgt_counts AS (
                SELECT bucket, COUNT(*) AS n FROM bucketed
                WHERE doc_id % 10 = 0 GROUP BY bucket
            ), totals AS (
                SELECT (SELECT SUM(n) FROM raw_counts) AS tr,
                       (SELECT SUM(n) FROM tgt_counts) AS tt
            ), scored AS (
                SELECT b.doc_id,
                       ln((COALESCE(tc.n, 0) + 1.0) / (tot.tt + 4096.0))
                     - ln((rc.n + 1.0) / (tot.tr + 4096.0)) AS d
                FROM bucketed b
                JOIN raw_counts rc USING (bucket)
                LEFT JOIN tgt_counts tc USING (bucket)
                CROSS JOIN totals tot
            )
            SELECT d0.doc_id,
                   ROUND(COALESCE(s.lw, 0.0), 6) AS log_weight
            FROM documents d0
            LEFT JOIN (
                SELECT doc_id, SUM(d) AS lw FROM scored GROUP BY doc_id
            ) s USING (doc_id)
        """,
    }

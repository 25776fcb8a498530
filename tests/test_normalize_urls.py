"""Tests for text normalization (functions/normalize.py) and URL
analysis / domain filtering (functions/urls.py)."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# normalize
# ---------------------------------------------------------------------------

def test_normalize_text_full_chain(spark):
    from jodie_spark.functions.normalize import normalize_text

    rows = [
        ("a", "Café   du\tmonde\n\nok"),   # combining acute + ws runs
        ("b", "bad\x00ctrl\x07here"),             # NUL + BEL stripped
        ("c", "  already clean  "),
        ("d", None),
        ("e", ""),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = dict(
        df.select("id", normalize_text(F.col("text")).alias("t")).collect()
    )
    assert out["a"] == "Café du monde ok"      # NFC composed + collapsed
    assert out["b"] == "badctrlhere"
    assert out["c"] == "already clean"
    assert out["d"] is None
    assert out["e"] == ""


def test_normalize_text_codegen_only_mode(spark):
    from jodie_spark.functions.normalize import normalize_text

    df = spark.createDataFrame([("x", " a \t b ")], ["id", "text"])
    proj = df.select(normalize_text(F.col("text"), form=None).alias("t"))
    assert proj.collect()[0]["t"] == "a b"
    # form=None must not introduce a Python/pandas stage
    assert "ArrowEvalPython" not in proj._jdf.queryExecution().executedPlan().toString()


def test_unicode_normalize_forms_and_duckdb_parity(spark):
    import duckdb

    from jodie_spark.functions.normalize import unicode_normalize

    s = "Café ﬁne"  # combining acute + fi-ligature
    df = spark.createDataFrame([(s,)], ["text"])
    nfc = df.select(unicode_normalize(F.col("text")).alias("t")).collect()[0]["t"]
    nfkc = df.select(unicode_normalize(F.col("text"), "NFKC").alias("t")).collect()[0]["t"]
    assert nfc == "Café ﬁne"      # ligature untouched under NFC
    assert nfkc == "Café fine"          # ligature expanded under NFKC
    (duck_nfc,) = duckdb.sql("select nfc_normalize(?)", params=[s]).fetchone()
    assert duck_nfc == nfc

    with pytest.raises(ValueError):
        unicode_normalize(F.col("text"), "NFX")


# ---------------------------------------------------------------------------
# urls
# ---------------------------------------------------------------------------

URLS = [
    ("a", "https://Sub.News.Example.com/a/b?q=1#frag"),
    ("b", "http://example.org"),
    ("c", "ftp://files.archive.net:2121/pub/x"),
    ("d", "not a url"),
    ("e", None),
]


def test_url_parts(spark):
    from jodie_spark.functions.urls import with_url_parts

    df = spark.createDataFrame(URLS, ["id", "url"])
    rows = {r["id"]: r for r in with_url_parts(df).collect()}
    assert rows["a"]["host"] == "sub.news.example.com"
    assert rows["a"]["domain"] == "example.com"
    assert rows["a"]["path"] == "/a/b"
    assert rows["b"]["host"] == "example.org"
    assert rows["b"]["domain"] == "example.org"
    assert rows["b"]["path"] is None
    assert rows["c"]["host"] == "files.archive.net"   # port excluded
    assert rows["c"]["domain"] == "archive.net"
    assert rows["d"]["host"] is None and rows["d"]["domain"] is None
    assert rows["e"]["host"] is None


def test_filter_by_domain_block_and_allow(spark):
    from jodie_spark.functions.urls import filter_by_domain

    df = spark.createDataFrame(URLS, ["id", "url"])
    blocked = filter_by_domain(df, ["example.com"], mode="block")
    ids = {r["id"] for r in blocked.select("id").collect()}
    # 'a' dropped; un-parseable/null URLs kept on block
    assert ids == {"b", "c", "d", "e"}

    allowed = filter_by_domain(df, ["example.com", "archive.net"], mode="allow")
    ids = {r["id"] for r in allowed.select("id").collect()}
    assert ids == {"a", "c"}

    with pytest.raises(ValueError):
        filter_by_domain(df, ["x"], mode="nope")


def test_filter_by_domain_broadcasts_list_side(spark):
    from jodie_spark.functions.urls import filter_by_domain

    df = spark.createDataFrame(URLS, ["id", "url"])
    plan = (
        filter_by_domain(df, ["example.com"], mode="block")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the corpus side must not shuffle for the join
    assert "Exchange hashpartitioning" not in plan

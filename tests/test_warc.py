"""WARC (ISO 28500) ingestion: record parsing (plain + per-record
gzip), HTTP layer splitting, distributed file-parallel read."""

import gzip
import os

import pytest

from jodie_spark.sources.warc import (
    encode_warc,
    iter_warc_records,
    read_warc,
)

RECS = [
    {"warc_type": "warcinfo", "payload": b"software: fixtures\r\n"},
    {
        "warc_type": "response",
        "target_uri": "https://a.example/x",
        "http_status": 200,
        "http_content_type": "text/html; charset=utf-8",
        "payload": "<html>héllo</html>".encode(),
    },
    {
        "warc_type": "response",
        "target_uri": "https://b.example/y",
        "http_status": 404,
        "payload": b"nope",
    },
    {
        "warc_type": "request",
        "target_uri": "https://a.example/x",
        "payload": b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n",
    },
]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_record_roundtrip(gz):
    blob = encode_warc(RECS, per_record_gzip=gz)
    got = list(iter_warc_records(blob))
    assert [r["fields"]["warc-type"] for _, r in got] == [
        "warcinfo", "response", "response", "request",
    ]
    f = got[1][1]["fields"]
    assert f["warc-target-uri"] == "https://a.example/x"
    assert f["content-type"].startswith("application/http")
    # offsets are strictly increasing record starts
    offs = [o for o, _ in got]
    assert offs == sorted(offs) and offs[0] == 0
    # payload round-trips byte-exact through the HTTP wrapper
    body = got[1][1]["body"]
    assert body.endswith("<html>héllo</html>".encode())


def test_warc_truncation_raises():
    blob = encode_warc(RECS[:2])
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(blob[:-30]))
    with pytest.raises(ValueError, match="not a WARC"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n"))


def test_read_warc_distributed(spark, tmpdir_path):
    d = os.path.join(tmpdir_path, "warcs")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc"), "wb") as fh:
        fh.write(encode_warc(RECS))
    with open(os.path.join(d, "b.warc.gz"), "wb") as fh:
        fh.write(encode_warc(RECS[1:3], per_record_gzip=True))
    df = read_warc(spark, d)
    rows = df.collect()
    assert len(rows) == 6  # 4 + 2
    ok = [r for r in rows if r["http_status"] == 200]
    assert len(ok) == 2
    for r in ok:
        assert bytes(r["payload"]) == "<html>héllo</html>".encode()
        assert r["http_content_type"].startswith("text/html")
        assert r["target_uri"] == "https://a.example/x"
    # non-HTTP records keep raw payloads and NULL status
    info = [r for r in rows if r["warc_type"] == "warcinfo"]
    assert len(info) == 1 and info[0]["http_status"] is None
    assert bytes(info[0]["payload"]) == b"software: fixtures\r\n"
    # whole-file gzip (not per-record) also reads: single member
    with open(os.path.join(d, "c.warc.gz"), "wb") as fh:
        fh.write(gzip.compress(encode_warc([RECS[2]])))
    assert read_warc(spark, d).count() == 7


def test_cdxj_reader_and_surt(spark, tmpdir_path):
    from pyspark.sql import functions as F

    from jodie_spark.sources.warc import read_cdxj, surt_key

    d = os.path.join(tmpdir_path, "cdx")
    os.makedirs(d)
    lines = [
        'com,example,www)/a 20240101000000 {"url": "https://www.example.com/a",'
        ' "mime": "text/html", "status": "200", "digest": "sha1:AAA",'
        ' "length": "123", "offset": "0", "filename": "s.warc.gz"}',
        'org,thing)/b?q=1 20240102000000 {"url": "https://thing.org/b?q=1",'
        ' "status": "301", "length": "9", "offset": "77", "filename": "t.warc.gz"}',
        "this line is malformed",
    ]
    with open(os.path.join(d, "x.cdxj"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    rows = {r["url"]: r for r in read_cdxj(spark, d).collect()}
    a = rows["https://www.example.com/a"]
    assert a["surt_key"] == "com,example,www)/a"
    assert (a["status"], a["length"], a["offset"]) == (200, 123, 0)
    assert a["digest"] == "sha1:AAA" and a["capture_ts"] == "20240101000000"
    b = rows["https://thing.org/b?q=1"]
    assert b["status"] == 301 and b["mime"] is None
    # malformed line survives as a NULL row, never fails the scan
    assert None in rows and rows[None]["surt_key"] is None

    # surt_key expression matches the planted keys and handles depth-2
    df = spark.createDataFrame(
        [("https://sub.news.example.com/x/y",), ("https://example.com",),
         ("not a url",)],
        ["url"],
    )
    got = [r["s"] for r in df.select(surt_key(F.col("url")).alias("s")).collect()]
    assert got == ["com,example,news,sub)/x/y", "com,example)/", None]


def test_sitemap_reader(spark, tmpdir_path):
    import gzip as _gz

    from jodie_spark.sources.warc import read_sitemaps

    d = os.path.join(tmpdir_path, "maps")
    os.makedirs(d)
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://a.com/p?x=1&amp;y=2</loc>"
        "<lastmod>2024-01-02</lastmod><changefreq>daily</changefreq>"
        "<priority>0.8</priority></url>\n"
        "<url><loc>https://a.com/q</loc></url>\n"
        "</urlset>"
    )
    idx = (
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
        "<lastmod>2024-02-01</lastmod></sitemap></sitemapindex>"
    )
    with open(os.path.join(d, "m.xml"), "w") as fh:
        fh.write(xml)
    with open(os.path.join(d, "i.xml.gz"), "wb") as fh:
        fh.write(_gz.compress(idx.encode()))
    rows = sorted(
        (r["kind"], r["loc"], r["lastmod"], r["priority"])
        for r in read_sitemaps(spark, d).collect()
    )
    assert rows == [
        ("sitemapindex", "https://a.com/s1.xml", "2024-02-01", None),
        ("urlset", "https://a.com/p?x=1&y=2", "2024-01-02", 0.8),  # entity unescaped
        ("urlset", "https://a.com/q", None, None),
    ]

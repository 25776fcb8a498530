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

"""WARC (Web ARChive, ISO 28500) ingestion — the container format web
crawls ship in (Common Crawl's WET/WARC files are THE raw input of
LLM text pipelines).

``read_warc`` turns a glob of ``.warc`` / ``.warc.gz`` files into a
DataFrame of records: one row per WARC record with the envelope fields
a pipeline filters on (type, target URI, date, record id) and — for
``response`` records — the parsed HTTP layer (status, content type,
body split from headers).

Scale shape: WARC files do not split mid-record, so the unit of
parallelism is the FILE (the standard Common-Crawl processing layout —
crawls ship as ~1 GB segments, tens of thousands of them, which is
plenty of parallelism for any cluster). ``spark.read.format
("binaryFile")`` distributes whole files to executors; each parses its
records in one streaming pass inside Arrow-batched ``mapInPandas`` —
the driver never sees payload bytes. Gzip members decompress
incrementally (per-record-gzip WARCs, the Common Crawl layout,
concatenate cleanly through zlib's multi-member handling).

Parsing is implemented from the public WARC 1.1 spec: version line,
CRLF header block, Content-Length-delimited payload, CRLF CRLF record
separator.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_offset", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _split_http(body: bytes):
    """response/request payloads carry an HTTP message: split the
    header block, return (status, content_type, entity_body)."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0 or not body.startswith((b"HTTP/", b"GET ", b"POST ", b"HEAD ")):
        return None, None, body
    head = body[:sep].decode("latin1", "replace").split("\r\n")
    status = None
    ctype = None
    first = head[0]
    if first.startswith("HTTP/"):
        parts = first.split(" ", 2)
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    for line in head[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return status, ctype, body[sep + 4 :]


def iter_warc_records(data: bytes) -> Iterator[tuple[int, dict]]:
    """Yield (byte_offset, record) for every record in a WARC payload,
    transparently handling plain and (multi-member) gzip files. The
    offset is into the DECOMPRESSED stream for gzip inputs."""
    if data[:2] == b"\x1f\x8b":
        # multi-member gzip (per-record-gzip WARCs): walk members via
        # decompressobj.unused_data — pure public zlib API
        import zlib

        out = io.BytesIO()
        buf = data
        while buf[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=31)
            out.write(d.decompress(buf))
            out.write(d.flush())
            buf = d.unused_data
        data = out.getvalue()
    i = 0
    n = len(data)
    while i < n:
        # skip inter-record CRLFs
        while i < n and data[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            return
        start = i
        hdr_end = data.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            raise ValueError("WARC truncated inside a header block")
        head = data[i:hdr_end].decode("utf-8", "replace").split("\r\n")
        if not head[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {i}: {head[0]!r}")
        fields: dict[str, str] = {}
        for line in head[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields.get("content-length", "0"))
        body_start = hdr_end + 4
        body = data[body_start : body_start + length]
        if len(body) != length:
            raise ValueError("WARC truncated inside a record payload")
        i = body_start + length
        yield start, {"fields": fields, "body": body}


def _records_as_rows(path: str, blob: bytes) -> list[dict]:
    rows = []
    for off, rec in iter_warc_records(blob):
        f = rec["fields"]
        body = rec["body"]
        status = http_ctype = None
        payload = body
        if f.get("warc-type") in ("response", "request"):
            status, http_ctype, payload = _split_http(body)
        rows.append(
            {
                "warc_file": path,
                "record_offset": off,
                "warc_type": f.get("warc-type"),
                "target_uri": f.get("warc-target-uri"),
                "warc_date": f.get("warc-date"),
                "record_id": f.get("warc-record-id"),
                "content_type": f.get("content-type"),
                "http_status": status,
                "http_content_type": http_ctype,
                "payload": payload,
            }
        )
    return rows


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed WARC read: one row per record across every matched
    file. File-level parallelism (records never split across files);
    payload bytes stay executor-side end to end."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in it:
            rows: list[dict] = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(_records_as_rows(str(path), bytes(blob)))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def encode_warc(records: list[dict], per_record_gzip: bool = False) -> bytes:
    """Fixture writer: each record dict carries ``warc_type``,
    ``target_uri`` (optional), ``payload`` (bytes), and optionally
    ``http_status`` / ``http_content_type`` (wraps the payload in an
    HTTP/1.1 response, the Common-Crawl response-record shape)."""
    out = bytearray()
    for i, r in enumerate(records):
        body = bytes(r.get("payload", b""))
        if r.get("http_status"):
            head = (
                f"HTTP/1.1 {r['http_status']} OK\r\n"
                f"Content-Type: {r.get('http_content_type', 'text/html')}\r\n"
                f"Content-Length: {len(body)}\r\n"
            ).encode()
            body = head + b"\r\n" + body
        fields = [
            ("WARC-Type", r.get("warc_type", "response")),
            ("WARC-Record-ID", f"<urn:uuid:rec-{i}>"),
            ("WARC-Date", r.get("warc_date", "2024-01-01T00:00:00Z")),
            ("Content-Length", str(len(body))),
        ]
        if r.get("target_uri"):
            fields.insert(1, ("WARC-Target-URI", r["target_uri"]))
        if r.get("http_status"):
            fields.append(
                ("Content-Type", "application/http; msgtype=response")
            )
        rec = (
            b"WARC/1.1\r\n"
            + "".join(f"{k}: {v}\r\n" for k, v in fields).encode()
            + b"\r\n"
            + body
            + b"\r\n\r\n"
        )
        out += gzip.compress(rec) if per_record_gzip else rec
    return bytes(out)


# ---------------------------------------------------------------------------
# CDX(J) — the crawl INDEX format next to WARC segments (Common Crawl's
# cc-index): one line per capture, "SURT timestamp {json}".
# ---------------------------------------------------------------------------

CDXJ_SCHEMA = T.StructType(
    [
        T.StructField("surt_key", T.StringType()),
        T.StructField("capture_ts", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("filename", T.StringType()),
    ]
)


def surt_key(col):
    """SURT (Sort-friendly URI Reordering Transform) of a URL: host
    labels reversed and comma-joined + ')' + path —
    'https://sub.example.com/a/b' → 'com,example,sub)/a/b'. Pure
    Catalyst expressions (reverse + array_join over the split host), so
    the key is oracle-exact and whole-stage-codegen'd; NULL for
    schemeless strings."""
    from pyspark.sql import functions as F

    from jodie_spark.functions.urls import url_host, url_path

    host = url_host(col)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.coalesce(url_path(col), F.lit("/"))
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(rev, F.lit(")"), path)
    )


def read_cdxj(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed CDX(J) index read: `spark.read.text` (line-splittable
    — unlike WARC segments the index DOES split inside a file) +
    Catalyst regex/JSON extraction; no Python in the hot path. Rows
    that do not parse yield NULL fields rather than failing the scan
    (crawl indexes routinely carry malformed tail lines)."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path_glob)
    m = F.regexp_extract(F.col("value"), r"^(\S+) (\d+) (\{.*\})$", 0)
    parts = [
        F.regexp_extract(F.col("value"), r"^(\S+) (\d+) (\{.*\})$", i)
        for i in (1, 2, 3)
    ]
    j = parts[2]
    return (
        lines.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.when(m != "", parts[0]).alias("surt_key"),
            F.when(m != "", parts[1]).alias("capture_ts"),
            F.get_json_object(j, "$.url").alias("url"),
            F.get_json_object(j, "$.mime").alias("mime"),
            F.get_json_object(j, "$.status").cast("int").alias("status"),
            F.get_json_object(j, "$.digest").alias("digest"),
            F.get_json_object(j, "$.length").cast("long").alias("length"),
            F.get_json_object(j, "$.offset").cast("long").alias("offset"),
            F.get_json_object(j, "$.filename").alias("filename"),
        )
    )


# ---------------------------------------------------------------------------
# sitemaps (sitemaps.org XML) — the third leg of the crawl trio next to
# robots.txt and the WARC/CDX archives
# ---------------------------------------------------------------------------

SITEMAP_SCHEMA = T.StructType(
    [
        T.StructField("sitemap_file", T.StringType()),
        T.StructField("kind", T.StringType()),  # urlset | sitemapindex
        T.StructField("loc", T.StringType()),
        T.StructField("lastmod", T.StringType()),
        T.StructField("changefreq", T.StringType()),
        T.StructField("priority", T.DoubleType()),
    ]
)

_XML_UNESCAPE = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&apos;", "'"), ("&amp;", "&"),  # &amp; LAST per XML rules
]


def _sitemap_rows(path: str, blob: bytes) -> list[dict]:
    import re as _re
    import zlib as _zlib

    if blob[:2] == b"\x1f\x8b":
        blob = _zlib.decompress(blob, 47)
    txt = blob.decode("utf-8", "replace")
    kind = "sitemapindex" if "<sitemapindex" in txt else "urlset"
    entry_tag = "sitemap" if kind == "sitemapindex" else "url"
    rows = []
    for m in _re.finditer(
        rf"<{entry_tag}[^>]*>(.*?)</{entry_tag}>", txt, _re.S
    ):
        block = m.group(1)

        def field(tag: str) -> str | None:
            fm = _re.search(rf"<{tag}[^>]*>\s*(.*?)\s*</{tag}>", block, _re.S)
            if not fm:
                return None
            v = fm.group(1)
            for esc, ch in _XML_UNESCAPE:
                v = v.replace(esc, ch)
            return v

        pr = field("priority")
        rows.append(
            {
                "sitemap_file": path,
                "kind": kind,
                "loc": field("loc"),
                "lastmod": field("lastmod"),
                "changefreq": field("changefreq"),
                "priority": float(pr) if pr else None,
            }
        )
    return rows


def read_sitemaps(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed sitemap read (plain or .gz): one row per ``<url>``
    entry — or per child ``<sitemap>`` for index files, so callers can
    recurse by fetching the listed children. File-level parallelism,
    regex extraction inside Arrow batches (sitemaps are flat two-level
    XML; no parser dependency needed)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SITEMAP_SCHEMA.fields]
        for pdf in it:
            rows: list[dict] = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(_sitemap_rows(str(path), bytes(blob)))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(parse, SITEMAP_SCHEMA)

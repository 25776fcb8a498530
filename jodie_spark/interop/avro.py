"""Minimal Apache Avro object-container codec (writer + reader).

Implemented from the public Avro 1.11 specification (binary encoding +
object container file layout) because the sandbox has no avro library;
only the subset Iceberg metadata files need is supported:

- primitives: ``null boolean int long float double bytes string``
- complex: ``record array map union fixed``
- container codec: ``null`` (uncompressed) and ``deflate``

Schemas are plain dicts/lists/strings in Avro JSON form. Unknown
attributes (``field-id``, ``logicalType``, ...) pass through untouched
in the embedded schema, which is exactly what Iceberg manifests rely
on. The reader exists so tests can round-trip files independently of
the writer's in-memory state; both sides are schema-driven off the
same JSON, not off each other.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------

def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n) & ((1 << 64) - 1)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _zigzag_decode(acc)
        shift += 7


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    write_long(out, len(b))
    out.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    b = buf.read(n)
    if len(b) != n:
        raise EOFError("truncated bytes")
    return b


# ---------------------------------------------------------------------------
# schema-driven datum encoding
# ---------------------------------------------------------------------------

def _type_name(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def write_datum(out: io.BytesIO, schema: Any, value: Any) -> None:
    t = _type_name(schema)
    if t == "union":
        # pick the first branch the value fits; None always routes to
        # "null", everything else to the first non-null branch (the
        # Iceberg manifest schemas only ever use [null, X] unions)
        for i, branch in enumerate(schema):
            if (value is None) == (_type_name(branch) == "null"):
                write_long(out, i)
                write_datum(out, branch, value)
                return
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "string":
        _write_bytes(out, str(value).encode("utf-8"))
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(b)} != {schema['size']}")
        out.write(b)
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] in value:
                write_datum(out, f["type"], value[f["name"]])
            elif "default" in f:
                write_datum(out, f["type"], f["default"])
            elif isinstance(f["type"], list) and "null" in [
                _type_name(b) for b in f["type"]
            ]:
                write_datum(out, f["type"], None)
            else:
                raise ValueError(f"missing required field {f['name']!r}")
    elif t == "array":
        items = list(value or [])
        if items:
            write_long(out, len(items))
            for it in items:
                write_datum(out, schema["items"], it)
        write_long(out, 0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            write_long(out, len(entries))
            for k, v in entries.items():
                _write_bytes(out, str(k).encode("utf-8"))
                write_datum(out, schema["values"], v)
        write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def read_datum(buf: io.BytesIO, schema: Any) -> Any:
    t = _type_name(schema)
    if t == "union":
        idx = read_long(buf)
        return read_datum(buf, schema[idx])
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {f["name"]: read_datum(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec allows it)
                read_long(buf)
                n = -n
            for _ in range(n):
                out.append(read_datum(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = read_datum(buf, schema["values"])
    raise ValueError(f"unsupported avro type {t!r}")


# ---------------------------------------------------------------------------
# object container file
# ---------------------------------------------------------------------------

def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, str] | None = None,
    codec: str = "deflate",
    sync: bytes | None = None,
) -> int:
    """Write an Avro object-container file; returns its byte length."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = sync or os.urandom(16)
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")),
        "avro.codec": codec,
    }
    for k, v in (metadata or {}).items():
        meta[k] = v
    write_datum(
        out,
        {"type": "map", "values": "bytes"},
        {k: v.encode("utf-8") if isinstance(v, str) else v for k, v in meta.items()},
    )
    out.write(sync)
    body = io.BytesIO()
    for rec in records:
        write_datum(body, schema, rec)
    payload = body.getvalue()
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate, no zlib wrapper
    write_long(out, len(records))
    _write_bytes(out, payload)
    out.write(sync)
    data = out.getvalue()
    with open(path, "wb") as fh:
        fh.write(data)
    return len(data)


def read_container(path: str) -> tuple[dict, list[dict], dict[str, bytes]]:
    """Read an Avro object-container file written by any conforming
    writer: returns (schema, records, file_metadata)."""
    with open(path, "rb") as fh:
        buf = io.BytesIO(fh.read())
    if buf.read(4) != _MAGIC:
        raise ValueError("not an avro object container (bad magic)")
    meta = read_datum(buf, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        pos = buf.tell()
        head = buf.read(1)
        if not head:
            break
        buf.seek(pos)
        n = read_long(buf)
        payload = _read_bytes(buf)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        block = io.BytesIO(payload)
        for _ in range(n):
            records.append(read_datum(block, schema))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, records, meta

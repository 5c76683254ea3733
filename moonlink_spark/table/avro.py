"""Minimal Apache Avro binary codec + Object Container File IO.

Written from the PUBLIC Avro 1.11 specification (binary encoding + object
container files) — no avro library exists in this environment, and the
Iceberg spec mandates Avro for manifests and manifest lists, so the
publish operator (operators/publish.py) carries its own spec-conformant
encoder. Supports exactly the subset Iceberg metadata needs:

- primitives: null, boolean, int, long (zigzag varint), float, double,
  bytes, string
- complex: record, array, map, union (used only as the ``[null, T]``
  optional-field idiom), fixed
- container files: magic ``Obj\\x01``, file-metadata map carrying
  ``avro.schema`` / ``avro.codec`` = null (uncompressed), 16-byte sync
  marker, data blocks of (count, byte-length, payload, sync)

The generic datum model is plain Python: records are dicts, arrays lists,
maps dicts, unions either ``None`` or the non-null branch value. Schemas
are the parsed-JSON form (dict/list/str), with names resolved structurally
(no named-type registry — Iceberg metadata never forward-references).

Reference behavior being reproduced: moonlink writes Iceberg manifests
through the iceberg-rust crate (src/moonlink/src/storage/iceberg/
iceberg_table_manager.rs:29-32); here the same file formats are produced
directly from the specification.
"""

from __future__ import annotations

import io
import json
import struct

MAGIC = b"Obj\x01"


# ------------------------------------------------------------- primitives


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf) -> bytes:
    return buf.read(read_long(buf))


# ---------------------------------------------------------- schema-driven


def _branch_matches(sch, datum) -> bool:
    t = sch["type"] if isinstance(sch, dict) else sch
    if t == "null":
        return datum is None
    return datum is not None


def write_datum(buf: io.BytesIO, sch, datum) -> None:
    """Encode ``datum`` under schema ``sch`` (parsed Avro JSON)."""
    if isinstance(sch, list):  # union — pick the first matching branch
        for i, branch in enumerate(sch):
            if _branch_matches(branch, datum):
                write_long(buf, i)
                write_datum(buf, branch, datum)
                return
        raise ValueError(f"no union branch for {datum!r} in {sch!r}")
    t = sch["type"] if isinstance(sch, dict) else sch
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(datum))
    elif t == "float":
        buf.write(struct.pack("<f", float(datum)))
    elif t == "double":
        buf.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        write_bytes(buf, bytes(datum))
    elif t == "string":
        write_bytes(buf, datum.encode("utf-8"))
    elif t == "fixed":
        if len(datum) != sch["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(bytes(datum))
    elif t == "record":
        for f in sch["fields"]:
            if f["name"] in datum:
                v = datum[f["name"]]
            elif "default" in f:
                v = f["default"]
            else:
                raise ValueError(f"missing field {f['name']}")
            write_datum(buf, f["type"], v)
    elif t == "array":
        if datum:
            write_long(buf, len(datum))
            for item in datum:
                write_datum(buf, sch["items"], item)
        write_long(buf, 0)
    elif t == "map":
        if datum:
            write_long(buf, len(datum))
            for k, v in datum.items():
                write_bytes(buf, k.encode("utf-8"))
                write_datum(buf, sch["values"], v)
        write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def read_datum(buf, sch):
    if isinstance(sch, list):
        return read_datum(buf, sch[read_long(buf)])
    t = sch["type"] if isinstance(sch, dict) else sch
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
        return read_bytes(buf)
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(sch["size"])
    if t == "record":
        return {f["name"]: read_datum(buf, f["type"]) for f in sch["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # sized block: length prefix precedes the items
                read_long(buf)
                n = -n
            for _ in range(n):
                out.append(read_datum(buf, sch["items"]))
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
                k = read_bytes(buf).decode("utf-8")
                out[k] = read_datum(buf, sch["values"])
    raise ValueError(f"unsupported avro type {t!r}")


# ------------------------------------------------------------- containers


def write_container(
    schema: dict, records: list, sync: bytes, meta: dict | None = None
) -> bytes:
    """Serialize ``records`` as one Avro Object Container File (codec
    null). ``sync`` must be 16 bytes — deterministic callers derive it from
    stable content so republished metadata is byte-stable."""
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    buf = io.BytesIO()
    buf.write(MAGIC)
    md = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
        **{k: v if isinstance(v, bytes) else v.encode() for k, v in (meta or {}).items()},
    }
    write_long(buf, len(md))
    for k, v in md.items():
        write_bytes(buf, k.encode())
        write_bytes(buf, v)
    write_long(buf, 0)
    buf.write(sync)
    if records:
        body = io.BytesIO()
        for r in records:
            write_datum(body, schema, r)
        payload = body.getvalue()
        write_long(buf, len(records))
        write_long(buf, len(payload))
        buf.write(payload)
        buf.write(sync)
    return buf.getvalue()


def read_container(data: bytes) -> tuple[dict, dict, list]:
    """Parse an OCF → (schema, file-metadata, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = read_bytes(buf).decode()
            meta[k] = read_bytes(buf)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    sync = buf.read(16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = read_long(buf)
        read_long(buf)  # block byte length
        for _ in range(count):
            records.append(read_datum(buf, schema))
        if buf.read(16) != sync:
            raise ValueError("bad sync marker")
    return schema, meta, records

"""Puffin file format — binary sidecar container for index/stats blobs.

Implements the Apache Iceberg Puffin spec (public:
https://iceberg.apache.org/puffin-spec/) from scratch:

    Magic | Blob1 | Blob2 | ... | Footer
    Footer = Magic | FooterPayload | FooterPayloadSize (4B LE) |
             Flags (4B) | Magic

FooterPayload is UTF-8 JSON ``{"blobs": [...], "properties": {...}}``; each
blob entry carries type, fields, snapshot-id, sequence-number, offset,
length, optional compression-codec and a properties map. Flag bit 0 of byte
0 marks a compressed footer (never written here; accepted = rejected loudly
so a truncated read is never misparsed).

Moonlink persists its file indexes and deletion vectors as puffin blobs
referenced from table metadata (reference:
src/moonlink/src/storage/iceberg/puffin_utils.rs,
puffin_writer_proxy.rs, index blobs at iceberg_table_syncer.rs:398-454);
this engine uses puffin for the per-file key-bloom index sidecars
(``table/bloom.py``) — one puffin object per commit, one blob per data
file, loaded on demand for MERGE-probe candidates that survive
bucket/min-max pruning. Each blob's (offset, length) in the footer makes
ranged reads possible on stores that support them — the sidecar never has
to be parsed as one monolith the way a JSON sidecar does.

Blob payloads may be zstd-compressed (``compression-codec: "zstd"`` via
pyarrow's codec, matching the spec's codec table). Bloom bitmaps are
near-incompressible and are stored raw.
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field

from moonlink_spark.table.io import accessor_for

MAGIC = b"PFA1"
_FOOTER_TAIL = 4 + 4 + 4  # payload-size + flags + magic


class PuffinError(ValueError):
    pass


@dataclass
class BlobMeta:
    type: str
    offset: int
    length: int
    compression_codec: str | None = None
    fields: list[int] = field(default_factory=list)
    snapshot_id: int = 0
    sequence_number: int = 0
    properties: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        d = {
            "type": self.type,
            "fields": self.fields,
            "snapshot-id": self.snapshot_id,
            "sequence-number": self.sequence_number,
            "offset": self.offset,
            "length": self.length,
        }
        if self.compression_codec:
            d["compression-codec"] = self.compression_codec
        if self.properties:
            d["properties"] = self.properties
        return d

    @classmethod
    def from_json(cls, d: dict) -> "BlobMeta":
        return cls(
            type=d["type"],
            offset=d["offset"],
            length=d["length"],
            compression_codec=d.get("compression-codec"),
            fields=d.get("fields", []),
            snapshot_id=d.get("snapshot-id", 0),
            sequence_number=d.get("sequence-number", 0),
            properties=d.get("properties", {}),
        )


def _codec(name: str):
    import pyarrow as pa

    return pa.Codec(name)


def build_puffin(
    blobs: list[tuple[str, bytes, dict]],
    codec: str | None = None,
    file_properties: dict | None = None,
) -> tuple[bytes, list[BlobMeta]]:
    """Serialize ``(type, payload, properties)`` blobs into puffin bytes.

    Returns the file bytes and the footer metadata (with final offsets) —
    callers persist the bytes through their accessor and may record
    per-blob (offset, length) wherever they reference the sidecar.
    """
    parts = [MAGIC]
    off = len(MAGIC)
    metas: list[BlobMeta] = []
    for btype, payload, props in blobs:
        data = payload
        if codec:
            data = bytes(_codec(codec).compress(payload, asbytes=True))
            if len(data) >= len(payload):  # incompressible: store raw
                data = payload
        used = codec if data is not payload else None
        parts.append(data)
        metas.append(
            BlobMeta(
                type=btype, offset=off, length=len(data),
                compression_codec=used,
                properties=dict(props, **(
                    {"uncompressed-length": str(len(payload))} if used else {}
                )),
            )
        )
        off += len(data)
    payload_json = json.dumps(
        {
            "blobs": [m.to_json() for m in metas],
            "properties": file_properties or {},
        }
    ).encode("utf-8")
    parts += [MAGIC, payload_json, struct.pack("<i", len(payload_json)),
              b"\x00\x00\x00\x00", MAGIC]
    return b"".join(parts), metas


def write_puffin(
    path: str,
    blobs: list[tuple[str, bytes, dict]],
    codec: str | None = None,
    file_properties: dict | None = None,
) -> list[BlobMeta]:
    data, metas = build_puffin(blobs, codec=codec, file_properties=file_properties)
    accessor_for(path).write_atomic_bytes(path, data)
    return metas


def parse_puffin(data: bytes) -> tuple[list[BlobMeta], dict]:
    """Footer parse: returns (blob metas, file properties)."""
    if len(data) < 2 * len(MAGIC) + _FOOTER_TAIL or data[:4] != MAGIC:
        raise PuffinError("not a puffin file (bad head magic)")
    if data[-4:] != MAGIC:
        raise PuffinError("truncated puffin file (bad tail magic)")
    flags = data[-8:-4]
    if flags[0] & 0x01:
        raise PuffinError("compressed footer payload not supported")
    (size,) = struct.unpack("<i", data[-12:-8])
    start = len(data) - 12 - size
    if start < len(MAGIC) * 2 or data[start - 4 : start] != MAGIC:
        raise PuffinError("corrupt puffin footer (payload magic mismatch)")
    payload = json.loads(data[start : start + size].decode("utf-8"))
    return [BlobMeta.from_json(b) for b in payload.get("blobs", [])], payload.get(
        "properties", {}
    )


def read_blob(data: bytes, meta: BlobMeta) -> bytes:
    raw = data[meta.offset : meta.offset + meta.length]
    if len(raw) != meta.length:
        raise PuffinError(f"blob at {meta.offset} truncated")
    if meta.compression_codec:
        return bytes(_codec(meta.compression_codec).decompress(
            raw,
            decompressed_size=int(meta.properties.get("uncompressed-length"))
            if meta.properties.get("uncompressed-length")
            else None,
        ))
    return raw


def read_all_blobs(path: str) -> list[tuple[BlobMeta, bytes]]:
    data = accessor_for(path).read_bytes(path)
    metas, _ = parse_puffin(data)
    return [(m, read_blob(data, m)) for m in metas]

"""Puffin container format (Iceberg puffin spec) + bloom sidecar integration."""

from __future__ import annotations

import base64
import json
import os

import numpy as np
import pytest

from moonlink_spark.table.puffin import (
    BlobMeta,
    PuffinError,
    build_puffin,
    parse_puffin,
    read_all_blobs,
    read_blob,
    write_puffin,
)


def test_roundtrip_raw_blobs(tmp_path):
    p = str(tmp_path / "x.puffin")
    blobs = [
        ("moonlink-key-bloom-v1", b"\x01\x02\x03", {"referenced-data-file": "a"}),
        ("moonlink-key-bloom-v1", b"\xff" * 100, {"referenced-data-file": "b"}),
    ]
    metas = write_puffin(p, blobs)
    assert [m.properties["referenced-data-file"] for m in metas] == ["a", "b"]
    out = read_all_blobs(p)
    assert [b for _, b in out] == [b"\x01\x02\x03", b"\xff" * 100]
    # offsets are real byte positions (ranged-read capable)
    data = open(p, "rb").read()
    for m, payload in out:
        assert data[m.offset : m.offset + m.length] == payload
    assert data[:4] == b"PFA1" and data[-4:] == b"PFA1"


def test_zstd_codec_roundtrip(tmp_path):
    p = str(tmp_path / "z.puffin")
    compressible = b"abcd" * 10_000
    metas = write_puffin(p, [("t", compressible, {})], codec="zstd")
    assert metas[0].compression_codec == "zstd"
    assert metas[0].length < len(compressible)
    (meta, payload), = read_all_blobs(p)
    assert payload == compressible
    # incompressible payload silently stays raw
    rnd = np.random.default_rng(0).integers(0, 256, 4096, dtype=np.uint8).tobytes()
    metas2 = write_puffin(str(tmp_path / "r.puffin"), [("t", rnd, {})], codec="zstd")
    assert metas2[0].compression_codec is None


def test_footer_errors():
    data, _ = build_puffin([("t", b"x", {})])
    with pytest.raises(PuffinError, match="head magic"):
        parse_puffin(b"JUNK" + data[4:])
    with pytest.raises(PuffinError, match="tail magic"):
        parse_puffin(data[:-2])
    # compressed-footer flag refuses loudly
    bad = bytearray(data)
    bad[-8] |= 0x01
    with pytest.raises(PuffinError, match="compressed footer"):
        parse_puffin(bytes(bad))


def test_blob_meta_json_fields():
    m = BlobMeta(type="t", offset=4, length=2, properties={"a": "1"})
    d = m.to_json()
    assert d["snapshot-id"] == 0 and d["offset"] == 4
    assert BlobMeta.from_json(d) == m


def test_legacy_json_sidecar_still_probes(tmp_path):
    """A pre-puffin .bloom.json sidecar written by an older engine version
    keeps pruning correctly."""
    from moonlink_spark.table.bloom import (
        BITS_PER_KEY,
        BLOOM_STAT,
        NUM_HASHES,
        _positions,
        prune_by_bloom,
    )
    from moonlink_spark.table.format import FileEntry

    # hand-build a legacy sidecar over xxhash-like hashes for one file
    hashes = np.array([123456789, 987654321], dtype=np.uint64)
    m = max(64, ((len(hashes) * BITS_PER_KEY + 63) // 64) * 64)
    pos = _positions(hashes, m, NUM_HASHES)
    bits = np.zeros(m // 8, dtype=np.uint8)
    np.bitwise_or.at(
        bits, (pos >> 3).ravel(),
        np.left_shift(1, (pos & 7)).astype(np.uint8).ravel(),
    )
    ref = str(tmp_path / "legacy.bloom.json")
    with open(ref, "w") as f:
        json.dump(
            {"blooms": {"/data/f1": {
                "m": int(m), "k": NUM_HASHES,
                "b64": base64.b64encode(bits.tobytes()).decode(),
            }}}, f,
        )
    e = FileEntry(content="data", path="/data/f1", record_count=2,
                  file_size_bytes=1, sequence_number=1,
                  stats={BLOOM_STAT: {"ref": ref}})
    assert prune_by_bloom([e], hashes[:1].view(np.int64)) == [e]
    absent = np.array([55555], dtype=np.int64)
    assert prune_by_bloom([e], absent) == []

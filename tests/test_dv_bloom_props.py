"""Property tests for the pure kernels of deletion vectors (table/dv.py)
and per-file key blooms (table/bloom.py) — no Spark session needed.

Reference invariants: a DV bitmap must round-trip the exact deleted-position
set (deletion_vector.rs:16-98 blob semantics); a bloom probe must NEVER
false-negative (persisted_bucket_hash_map.rs probe: missing a present key
would lose a delete)."""

import base64

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from moonlink_spark.table.bloom import (
    BLOOM_STAT,
    NUM_HASHES,
    _pack,
    bloom_may_contain_any,
    prune_by_bloom,
)
from moonlink_spark.table.dv import (
    DV_MAGIC,
    DVCorruption,
    _pack_group,
    _unpack_batches,
    _unpack_batches_v2,
)
from moonlink_spark.table.format import FileEntry


def _entry(stats=None) -> FileEntry:
    return FileEntry(
        content="data",
        path="/x.parquet",
        record_count=1,
        file_size_bytes=1,
        sequence_number=1,
        stats=stats or {},
    )


# --------------------------------------------------------------------- DV


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=200_000), min_size=1, max_size=500)
)
def test_dv_bitmap_roundtrip(positions):
    pdf = pd.DataFrame({"file_path": "f1", "pos": positions})
    packed = _pack_group(pdf)
    assert int(packed["card"].iloc[0]) == len(set(positions))
    out = list(_unpack_batches(iter([packed])))[0]
    assert sorted(out["pos"]) == sorted(set(positions))
    assert (out["file_path"] == "f1").all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=50))
def test_dv_bitmap_is_dense_prefix(positions):
    """Bitmap length is bounded by max position (dense from 0) plus the
    fixed v2c frame (4B magic + 4B crc) — never by cardinality: the
    100x-compression property at high delete ratios."""
    pdf = pd.DataFrame({"file_path": "f", "pos": positions})
    bm = bytes(_pack_group(pdf)["bitmap"].iloc[0])
    assert bm[:4] == DV_MAGIC
    assert len(bm) == 4 + ((max(positions) >> 3) + 1) + 4


def test_dv_corruption_raises():
    """A torn/corrupt framed bitmap must fail LOUDLY at expansion, never
    mis-scan (reference blob carries magic + crc32c for the same reason,
    deletion_vector.rs:16-49)."""
    import pytest

    packed = _pack_group(pd.DataFrame({"file_path": "f", "pos": [1, 9, 200]}))
    good = bytes(packed["bitmap"].iloc[0])
    flipped = good[:5] + bytes([good[5] ^ 0xFF]) + good[6:]
    bad = packed.assign(bitmap=[flipped])
    with pytest.raises(DVCorruption, match="crc mismatch"):
        list(_unpack_batches(iter([bad])))
    truncated = packed.assign(bitmap=[good[2:]])
    with pytest.raises(DVCorruption, match="missing magic"):
        list(_unpack_batches(iter([truncated])))
    # legacy unframed v2 blobs still expand through the v2 path
    raw = packed.assign(bitmap=[good[4:-4]])
    out = list(_unpack_batches_v2(iter([raw])))[0]
    assert sorted(out["pos"]) == [1, 9, 200]


# ------------------------------------------------------------------ bloom


def _bloom_stats(hashes: np.ndarray) -> dict:
    pdf = pd.DataFrame({"f": "/x.parquet", "h": hashes.view(np.int64)})
    r = _pack(pdf).iloc[0]
    return {"m": int(r["m"]), "k": int(r["k"]), "bits": bytes(r["bits"])}


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=300,
        unique=True,
    )
)
def test_bloom_no_false_negatives(keys):
    h = np.array(keys, dtype=np.int64).view(np.uint64)
    e = _entry({BLOOM_STAT: _bloom_stats(h)})
    # every inserted key must be admitted — singly and as a batch
    assert bloom_may_contain_any(e, h)
    for x in h[:20]:
        assert bloom_may_contain_any(e, np.array([x], dtype=np.uint64))


def test_bloom_false_positive_rate_sane():
    rng = np.random.default_rng(7)
    present = rng.integers(0, 2**63, 5_000, dtype=np.int64).view(np.uint64)
    e = _entry({BLOOM_STAT: _bloom_stats(present)})
    absent = rng.integers(0, 2**63, 20_000, dtype=np.int64).view(np.uint64)
    absent = np.setdiff1d(absent, present)
    fp = sum(
        bool(bloom_may_contain_any(e, np.array([x], dtype=np.uint64)))
        for x in absent[:2000]
    )
    # 20 bits/key, 7 hashes -> theoretical fpr ~1e-4; allow generous slack
    assert fp / 2000 < 0.01


def test_bloom_prune_semantics():
    h = np.arange(10, dtype=np.int64).view(np.uint64)
    with_bloom = _entry({BLOOM_STAT: _bloom_stats(h)})
    without = _entry()
    # no batch keys -> nothing can match
    assert prune_by_bloom([with_bloom, without], np.array([], dtype=np.int64)) == []
    # files without blooms are always kept (bloom is an optimization)
    miss = np.array([10**18], dtype=np.int64)
    kept = prune_by_bloom([with_bloom, without], miss)
    assert without in kept

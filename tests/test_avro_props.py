"""Property tests for the from-spec Avro codec (table/avro.py)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from moonlink_spark.table import avro

RECORD_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "i", "type": "int"},
        {"name": "f", "type": "double"},
        {"name": "b", "type": "bytes"},
        {"name": "flag", "type": "boolean"},
        {"name": "opt", "type": ["null", "long"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ],
}

records = st.fixed_dictionaries(
    {
        "s": st.text(max_size=60),
        "n": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "f": st.floats(allow_nan=False),
        "b": st.binary(max_size=40),
        "flag": st.booleans(),
        "opt": st.one_of(st.none(), st.integers(-(2**40), 2**40)),
        "arr": st.lists(st.integers(-(2**40), 2**40), max_size=8),
        "m": st.dictionaries(st.text(max_size=10), st.text(max_size=10), max_size=5),
    }
)


@settings(max_examples=150, deadline=None)
@given(st.lists(records, max_size=12))
def test_container_roundtrip(recs):
    data = avro.write_container(RECORD_SCHEMA, recs, b"0123456789abcdef")
    sch, meta, got = avro.read_container(data)
    assert sch == RECORD_SCHEMA
    assert len(got) == len(recs)
    for a, b in zip(got, recs):
        for k in b:
            if isinstance(b[k], float):
                assert math.isclose(a[k], b[k], rel_tol=0, abs_tol=0) or a[k] == b[k]
            else:
                assert a[k] == b[k], k


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_varint_roundtrip(n):
    import io

    buf = io.BytesIO()
    avro.write_long(buf, n)
    buf.seek(0)
    assert avro.read_long(buf) == n


def test_roundtrip_against_independent_decoder(tmp_path):
    """The writer must satisfy the INDEPENDENT from-spec decoder too."""
    from tests.test_iceberg_publish import spec_read_ocf

    recs = [
        {"s": "x", "n": 5, "i": -1, "f": 1.5, "b": b"\x00\xff", "flag": True,
         "opt": None, "arr": [1, -2, 3], "m": {"a": "b"}},
        {"s": "", "n": -(2**62), "i": 2**31 - 1, "f": -0.0, "b": b"", "flag": False,
         "opt": 42, "arr": [], "m": {}},
    ]
    p = tmp_path / "t.avro"
    p.write_bytes(avro.write_container(RECORD_SCHEMA, recs, b"fedcba9876543210"))
    sch, meta, got = spec_read_ocf(str(p))
    assert got == recs

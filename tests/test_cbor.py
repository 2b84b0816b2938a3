"""Tests for the pure-python CBOR codec (sources/cbor) and the CBOR
block wire format (sources/payload): RFC 8949 round-trips, foreign-
producer decode shapes (indefinite lengths, half floats, tags), the
envelope's auto-detection against MMSB framing, and the early-stop
contract through a CBOR Sequence objects buffer.
"""

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from micromegas_spark.sources import cbor
from micromegas_spark.sources.payload import (
    CBOR_MAGIC,
    decode_block,
    encode_block,
    encode_block_cbor,
)


@pytest.mark.parametrize(
    "obj",
    [
        0, 1, 23, 24, 255, 256, 65535, 65536, 2**32, 2**64 - 1,
        -1, -24, -25, -(2**32), -(2**64),
        b"", b"abc", "", "héllo ☃", 1.5, -0.0, True, False, None,
        [], [1, [2, [3]]], {}, {"a": 1, "b": [2, 3]}, {1: "x", b"k": None},
        cbor.Tagged(1, 1700000000),
    ],
)
def test_roundtrip(obj):
    assert cbor.loads(cbor.dumps(obj)) == obj


def test_roundtrip_nan_inf():
    assert math.isnan(cbor.loads(cbor.dumps(float("nan"))))
    assert cbor.loads(cbor.dumps(float("inf"))) == float("inf")


_scalars = st.one_of(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.binary(max_size=12),
    st.text(max_size=12),
    st.booleans(),
    st.none(),
    st.floats(allow_nan=False),
)
_values = st.recursive(
    _scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=4),
        st.dictionaries(st.text(max_size=6), kids, max_size=4),
    ),
    max_leaves=20,
)


@settings(max_examples=200, deadline=None)
@given(_values)
def test_roundtrip_property(obj):
    assert cbor.loads(cbor.dumps(obj)) == obj


def test_decode_half_float():
    # 0xf9 3c00 = 1.0 half-precision; 0xf9 7c00 = +inf; 0xf9 0001 = subnormal
    assert cbor.loads(b"\xf9\x3c\x00") == 1.0
    assert cbor.loads(b"\xf9\x7c\x00") == float("inf")
    assert cbor.loads(b"\xf9\x00\x01") == 2.0**-24


def test_decode_indefinite_forms():
    # indefinite array [1, 2]: 0x9f 01 02 ff
    assert cbor.loads(b"\x9f\x01\x02\xff") == [1, 2]
    # indefinite map {"a": 1}: 0xbf 61 61 01 ff
    assert cbor.loads(b"\xbf\x61\x61\x01\xff") == {"a": 1}
    # indefinite text "ab" from two chunks: 0x7f 61 61 61 62 ff
    assert cbor.loads(b"\x7f\x61\x61\x61\x62\xff") == "ab"
    # indefinite bytes: 0x5f 41 01 41 02 ff
    assert cbor.loads(b"\x5f\x41\x01\x41\x02\xff") == b"\x01\x02"


def test_self_described_tag_transparent():
    assert cbor.loads(b"\xd9\xd9\xf7\x01") == 1


def test_unknown_tag_preserved():
    v = cbor.loads(cbor.dumps(cbor.Tagged(4242, [1, 2])))
    assert v == cbor.Tagged(4242, [1, 2])


@pytest.mark.parametrize(
    "data",
    [b"", b"\x19\x01", b"\x62a", b"\x82\x01", b"\xff", b"\x01\x01", b"\x1c"],
)
def test_malformed_raises(data):
    with pytest.raises(cbor.CborError):
        cbor.loads(data)


def test_iter_items_sequence_lazy():
    seq = cbor.dumps(1) + cbor.dumps({"a": 2}) + cbor.dumps("x")
    it = cbor.iter_items(seq)
    assert next(it) == 1
    assert next(it) == {"a": 2}
    assert next(it) == "x"
    with pytest.raises(StopIteration):
        next(it)


# ------------------------------------------------------------ block wire


EVENTS = [
    {"__type": "log", "msg": "a", "n": 1},
    {"__type": "metric", "value": 2.5, "n": 2},
]


def test_cbor_block_roundtrip_and_magic():
    payload = encode_block_cbor(EVENTS)
    assert payload[:3] == CBOR_MAGIC
    assert list(decode_block(payload)) == EVENTS


def test_cbor_block_uncompressed():
    assert list(decode_block(encode_block_cbor(EVENTS, compress=False))) == EVENTS


def test_wire_autodetect_mixed():
    assert list(decode_block(encode_block(EVENTS))) == EVENTS  # MMSB still
    assert list(decode_block(encode_block_cbor(EVENTS))) == EVENTS


def test_cbor_block_early_stop():
    # 1000 objects; pulling 3 must not decode the rest (iterator contract)
    objs = [{"__type": "e", "i": i} for i in range(1000)]
    it = decode_block(encode_block_cbor(objs, compress=False))
    got = [next(it) for _ in range(3)]
    assert [o["i"] for o in got] == [0, 1, 2]


def test_cbor_block_binary_member_via_parse_block_json():
    import json

    from micromegas_spark.sources.payload import PARSED_SCHEMA  # noqa: F401

    # binary members hex-encode through the JSON value column path
    payload = encode_block_cbor([{"__type": "blob", "data": b"\x00\xff"}])
    (obj,) = list(decode_block(payload))
    s = json.dumps(
        obj,
        default=lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else str(v),
    )
    assert json.loads(s)["data"] == "00ff"


def test_half_float_struct_consistency():
    # cross-check _decode_half against numpy's float16 for all exponents
    import numpy as np

    for h in [0x0000, 0x0001, 0x03FF, 0x0400, 0x3C00, 0x7BFF, 0x8001, 0xBC00]:
        expect = float(np.frombuffer(struct.pack(">H", h)[::-1], dtype="<f2")[0])
        assert cbor.loads(b"\xf9" + struct.pack(">H", h)) == expect


def test_break_inside_definite_containers_raises():
    # 0x81 0xff = [break]; 0xa1 0xff = {break: ...}; 0xc1 0xff = tag(break)
    for data in (b"\x81\xff", b"\xa1\xff\x01", b"\xc1\xff"):
        with pytest.raises(cbor.CborError):
            cbor.loads(data)


def test_indefinite_tag_malformed():
    with pytest.raises(cbor.CborError):
        cbor.loads(b"\xdf\x01")


def test_unassigned_simple_values_roundtrip():
    # 0xf3 = simple(19); 0xf8 0xff = simple(255)
    for data in (b"\xf3", b"\xf8\xff"):
        v = cbor.loads(data)
        assert isinstance(v, cbor.Simple)
        assert cbor.dumps(v) == data
    with pytest.raises(cbor.CborError):
        cbor.loads(b"\xf8\x10")  # two-byte simple < 32 is reserved


def test_parse_block_tolerates_nonstring_keys(spark):
    """A CBOR block whose maps carry int/bytes keys must flow through the
    parse_block JSON value column, not kill the task."""
    import json

    from micromegas_spark.sources.payload import make_payload_table, parse_block

    objs = [{"__type": "e", 1: "x", b"\x00k": [b"\xff", {2: 3}]}]
    tbl = make_payload_table(spark, {"b1": objs}, wire="cbor")
    (row,) = parse_block(tbl).collect()
    v = json.loads(row.value)
    assert v == {"__type": "e", "1": "x", "006b": ["ff", {"2": 3}]}

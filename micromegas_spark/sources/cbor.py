"""Minimal pure-python CBOR (RFC 8949) codec for the block wire path.

The reference's block payloads are CBOR on the outside: the stored blob
is a `ciborium`-decoded `BlockPayload { dependencies, objects }` struct
(rust/analytics/src/payload.rs:33-37), whose inner buffers are
compressed encodings of the event objects. This module gives the rebuild
the same outer wire format from public spec alone: definite- and
indefinite-length items, all major types, half/single/double floats, and
tags (tag 55799, CBOR's self-described magic, marks our block envelope
so `decode_block` can distinguish CBOR blocks from MMSB framing by
prefix).

Encoding is canonical-leaning (definite lengths, shortest int heads,
doubles for floats) — enough for deterministic tests; decoding accepts
the full grammar including indefinite strings/arrays/maps so foreign
producers interoperate.

`iter_items` decodes a CBOR Sequence (RFC 8742: concatenated top-level
items) lazily — the property the block decode path uses for its
early-stop contract.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

SELF_DESCRIBED_TAG = 55799
_BREAK = object()


class CborError(ValueError):
    pass


class Tagged:
    """A tagged value this codec has no native mapping for."""

    __slots__ = ("tag", "value")

    def __init__(self, tag: int, value: Any):
        self.tag = tag
        self.value = value

    def __eq__(self, other):
        return (
            isinstance(other, Tagged)
            and self.tag == other.tag
            and self.value == other.value
        )

    def __repr__(self):
        return f"Tagged({self.tag}, {self.value!r})"


class Simple:
    """An unassigned CBOR simple value (major 7), preserved so foreign
    payloads round-trip loads→dumps."""

    __slots__ = ("value",)

    def __init__(self, value: int):
        if not 0 <= value <= 255 or value in (20, 21, 22, 23) or 24 <= value < 32:
            raise CborError(f"invalid simple value {value}")
        self.value = value

    def __eq__(self, other):
        return isinstance(other, Simple) and self.value == other.value

    def __repr__(self):
        return f"Simple({self.value})"


# ---------------------------------------------------------------- encode


def _head(major: int, n: int) -> bytes:
    if n < 24:
        return bytes([(major << 5) | n])
    if n < 1 << 8:
        return bytes([(major << 5) | 24, n])
    if n < 1 << 16:
        return bytes([(major << 5) | 25]) + struct.pack(">H", n)
    if n < 1 << 32:
        return bytes([(major << 5) | 26]) + struct.pack(">I", n)
    if n < 1 << 64:
        return bytes([(major << 5) | 27]) + struct.pack(">Q", n)
    raise CborError("integer too large for CBOR head")


def _encode_into(obj: Any, out: bytearray) -> None:
    if obj is False:
        out += b"\xf4"
    elif obj is True:
        out += b"\xf5"
    elif obj is None:
        out += b"\xf6"
    elif isinstance(obj, int):
        if obj >= 0:
            out += _head(0, obj)
        else:
            out += _head(1, -1 - obj)
    elif isinstance(obj, float):
        out += b"\xfb" + struct.pack(">d", obj)
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        b = bytes(obj)
        out += _head(2, len(b)) + b
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        out += _head(3, len(b)) + b
    elif isinstance(obj, (list, tuple)):
        out += _head(4, len(obj))
        for v in obj:
            _encode_into(v, out)
    elif isinstance(obj, dict):
        out += _head(5, len(obj))
        for k, v in obj.items():
            _encode_into(k, out)
            _encode_into(v, out)
    elif isinstance(obj, Tagged):
        out += _head(6, obj.tag)
        _encode_into(obj.value, out)
    elif isinstance(obj, Simple):
        if obj.value < 24:
            out += bytes([(7 << 5) | obj.value])
        else:
            out += bytes([(7 << 5) | 24, obj.value])
    else:
        raise CborError(f"cannot encode {type(obj).__name__}")


def dumps(obj: Any) -> bytes:
    out = bytearray()
    _encode_into(obj, out)
    return bytes(out)


# ---------------------------------------------------------------- decode


def _decode_half(b: bytes) -> float:
    (h,) = struct.unpack(">H", b)
    exp = (h >> 10) & 0x1F
    mant = h & 0x3FF
    if exp == 0:
        val = mant * 2.0**-24
    elif exp != 31:
        val = (mant + 1024) * 2.0 ** (exp - 25)
    else:
        val = float("nan") if mant else float("inf")
    return -val if h & 0x8000 else val


def _decode_item(buf: memoryview, pos: int, depth: int = 0):
    """Decode one data item at ``pos``; returns (value, next_pos)."""
    if depth > 128:
        raise CborError("nesting too deep")
    if pos >= len(buf):
        raise CborError("truncated item")
    ib = buf[pos]
    major, info = ib >> 5, ib & 0x1F
    pos += 1
    if ib == 0xFF:
        return _BREAK, pos

    # argument / length
    if info < 24:
        arg = info
    elif info in (24, 25, 26, 27):
        width = 1 << (info - 24)
        if pos + width > len(buf):
            raise CborError("truncated argument")
        raw = bytes(buf[pos : pos + width])
        pos += width
        if major == 7:
            if info == 25:
                return _decode_half(raw), pos
            if info == 26:
                return struct.unpack(">f", raw)[0], pos
            if info == 27:
                return struct.unpack(">d", raw)[0], pos
        arg = int.from_bytes(raw, "big")
    elif info == 31:
        arg = None  # indefinite
        if major in (0, 1, 6, 7):
            raise CborError("indefinite length not valid here")
    else:
        raise CborError(f"reserved additional info {info}")

    if major == 0:
        return arg, pos
    if major == 1:
        return -1 - arg, pos
    if major in (2, 3):
        if arg is None:  # indefinite: concatenated definite chunks
            parts = []
            while True:
                chunk, pos = _decode_item(buf, pos, depth + 1)
                if chunk is _BREAK:
                    break
                if not isinstance(chunk, (bytes, str)):
                    raise CborError("bad indefinite string chunk")
                parts.append(chunk)
            if major == 2:
                return b"".join(p if isinstance(p, bytes) else p.encode() for p in parts), pos
            return "".join(p if isinstance(p, str) else p.decode() for p in parts), pos
        if pos + arg > len(buf):
            raise CborError("truncated string")
        raw = bytes(buf[pos : pos + arg])
        pos += arg
        return (raw if major == 2 else raw.decode("utf-8")), pos
    if major == 4:
        items = []
        if arg is None:
            while True:
                v, pos = _decode_item(buf, pos, depth + 1)
                if v is _BREAK:
                    break
                items.append(v)
        else:
            for _ in range(arg):
                v, pos = _decode_item(buf, pos, depth + 1)
                if v is _BREAK:
                    raise CborError("break inside definite-length array")
                items.append(v)
        return items, pos
    if major == 5:
        d = {}
        if arg is None:
            while True:
                k, pos = _decode_item(buf, pos, depth + 1)
                if k is _BREAK:
                    break
                v, pos = _decode_item(buf, pos, depth + 1)
                d[k] = v
        else:
            for _ in range(arg):
                k, pos = _decode_item(buf, pos, depth + 1)
                v, pos = _decode_item(buf, pos, depth + 1)
                if k is _BREAK or v is _BREAK:
                    raise CborError("break inside definite-length map")
                d[k] = v
        return d, pos
    if major == 6:
        v, pos = _decode_item(buf, pos, depth + 1)
        if v is _BREAK:
            raise CborError("break as tag content")
        if arg == SELF_DESCRIBED_TAG:
            return v, pos  # transparent, per RFC 8949 §3.4.6
        return Tagged(arg, v), pos
    # major 7 simple values
    if arg == 20:
        return False, pos
    if arg == 21:
        return True, pos
    if arg in (22, 23):
        return None, pos
    if info == 24 and arg < 32:
        raise CborError("reserved two-byte simple value")
    return Simple(arg), pos  # unassigned simple value, preserved


def loads(data: bytes) -> Any:
    v, pos = _decode_item(memoryview(data), 0)
    if v is _BREAK:
        raise CborError("unexpected break")
    if pos != len(data):
        raise CborError(f"{len(data) - pos} trailing bytes")
    return v


def iter_items(data: bytes) -> Iterator[Any]:
    """Lazily decode a CBOR Sequence (RFC 8742): zero or more
    concatenated top-level items. Work stops as soon as the consumer
    stops pulling — the early-stop property parse_block relies on."""
    buf = memoryview(data)
    pos = 0
    while pos < len(buf):
        v, pos = _decode_item(buf, pos)
        if v is _BREAK:
            raise CborError("unexpected break")
        yield v

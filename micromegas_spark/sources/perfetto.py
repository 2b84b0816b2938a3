"""Minimal Perfetto trace serialization — hand-rolled protobuf wire format.

The reference streams Perfetto protobuf chunks from its span tables
(rust/analytics/src/lakehouse/perfetto_trace_execution_plan.rs — chunked
`(chunk_id, chunk_data)` rows whose concatenated bytes form one Trace).
No protobuf library ships in this environment, but the protobuf *wire
format* is a tiny public spec (varints + `(field_number << 3 | wire_type)`
tags), and the Perfetto message fields we need are documented in the
public perfetto repo (protos/perfetto/trace/trace.proto,
trace_packet.proto, track_event/*.proto). Encoded here:

    Trace            { repeated TracePacket packet = 1; }
    TracePacket      { uint64 timestamp = 8;
                       TrackEvent track_event = 11;
                       uint32 trusted_packet_sequence_id = 10;
                       TrackDescriptor track_descriptor = 60; }
    TrackDescriptor  { uint64 uuid = 1; string name = 2; }
    TrackEvent       { Type type = 9;      // SLICE_BEGIN=1, SLICE_END=2
                       uint64 track_uuid = 11;
                       string name = 23; }

Concatenating encoded `packet` fields is itself a valid Trace (protobuf
repeated-field concatenation), which is exactly why a chunked stream of
packet bytes needs no framing fix-up on reassembly — the same property the
reference's chunk stream relies on.

A matching minimal decoder lives here too so tests can round-trip without
any protobuf dependency.
"""

from __future__ import annotations

import hashlib
import struct

# wire types
_VARINT = 0
_LEN = 2


def encode_varint(value: int) -> bytes:
    if value < 0:
        value &= (1 << 64) - 1  # protobuf encodes negatives as 64-bit 2's complement
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire_type: int) -> bytes:
    return encode_varint((field << 3) | wire_type)


def _varint_field(field: int, value: int) -> bytes:
    return _tag(field, _VARINT) + encode_varint(value)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, _LEN) + encode_varint(len(payload)) + payload


def track_uuid(stream_id: str) -> int:
    """Stable 63-bit track uuid from the stream id (deterministic across
    chunks and runs, engine-portable)."""
    return int.from_bytes(hashlib.md5(str(stream_id).encode()).digest()[:8], "big") >> 1


SEQUENCE_ID = 1  # single producer sequence for the whole export

TYPE_SLICE_BEGIN = 1
TYPE_SLICE_END = 2


def track_descriptor_packet(stream_id: str) -> bytes:
    desc = _varint_field(1, track_uuid(stream_id)) + _len_field(
        2, str(stream_id).encode()
    )
    packet = _len_field(60, desc) + _varint_field(10, SEQUENCE_ID)
    return _len_field(1, packet)


def track_event_packet(
    stream_id: str, ts_ns: int, event_type: int, name: str | None = None
) -> bytes:
    ev = _varint_field(9, event_type) + _varint_field(11, track_uuid(stream_id))
    if name is not None and event_type == TYPE_SLICE_BEGIN:
        ev += _len_field(23, str(name).encode())
    packet = (
        _varint_field(8, ts_ns) + _varint_field(10, SEQUENCE_ID) + _len_field(11, ev)
    )
    return _len_field(1, packet)


def spans_to_trace_bytes(records: list[dict]) -> bytes:
    """One chunk's span records → Perfetto Trace bytes.

    Emits a TrackDescriptor per stream present in the chunk (idempotent by
    uuid, so re-emission across chunks is harmless), then SLICE_BEGIN /
    SLICE_END TrackEvents in nesting-safe order: sorted by timestamp with
    ENDs before BEGINs on ties, deeper ENDs first and shallower BEGINs
    first (a slice closing exactly when a sibling opens closes first, and
    parent frames open before their children).
    """
    def _num(v, default=None):
        # None and float('nan') (pandas' null for int columns) → default
        if v is None or v != v:
            return default
        return int(v)

    buf = bytearray()
    for sid in sorted({str(r["stream_id"]) for r in records}, key=str):
        buf += track_descriptor_packet(sid)
    events = []
    for r in records:
        sid, depth = str(r["stream_id"]), _num(r.get("depth"), 0)
        events.append((_num(r["begin_ns"], 0), 1, depth, sid, TYPE_SLICE_BEGIN, r.get("name")))
        end = _num(r.get("end_ns"))
        if end is not None:  # unclosed span: BEGIN without END is legal in a stream
            events.append((end, 0, -depth, sid, TYPE_SLICE_END, None))
    events.sort(key=lambda e: e[:4])
    for ts, _k, _d, sid, etype, name in events:
        buf += track_event_packet(sid, ts, etype, name)
    return bytes(buf)


# ---------------------------------------------------------------------------
# minimal decoder (tests / debugging only)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def decode_message(data: bytes) -> dict[int, list]:
    """Wire-format decode → {field_number: [values]}; length-delimited
    values stay bytes (caller recurses where a submessage is expected)."""
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        field, wire_type = key >> 3, key & 0x7
        if wire_type == _VARINT:
            val, pos = _read_varint(data, pos)
        elif wire_type == _LEN:
            ln, pos = _read_varint(data, pos)
            val = data[pos : pos + ln]
            pos += ln
        elif wire_type == 1:  # fixed64
            (val,) = struct.unpack_from("<Q", data, pos)
            pos += 8
        elif wire_type == 5:  # fixed32
            (val,) = struct.unpack_from("<I", data, pos)
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire_type}")
        fields.setdefault(field, []).append(val)
    return fields


def decode_trace(data: bytes) -> list[dict]:
    """Trace bytes → list of simplified packet dicts (tests only)."""
    out = []
    for raw in decode_message(data).get(1, []):
        p = decode_message(raw)
        packet: dict = {}
        if 8 in p:
            packet["timestamp"] = p[8][0]
        if 60 in p:
            d = decode_message(p[60][0])
            packet["track_descriptor"] = {
                "uuid": d[1][0],
                "name": d[2][0].decode(),
            }
        if 11 in p:
            ev = decode_message(p[11][0])
            packet["track_event"] = {
                "type": ev[9][0],
                "track_uuid": ev[11][0],
                **({"name": ev[23][0].decode()} if 23 in ev else {}),
            }
        out.append(packet)
    return out


def write_trace_from_chunks(chunks, trace_filepath: str) -> int:
    """Assemble a `(chunk_id, chunk_data)` DataFrame into one trace file —
    the reference client's ``write_process_trace_from_chunks``
    (python/micromegas/micromegas/perfetto.py:1-95): stream chunks in id
    order, verify the sequence is gap-free, concatenate, write. Returns
    the number of chunks written (0 = no data, no file created).

    Streaming shape: ``toLocalIterator`` pulls one partition at a time off
    the sorted plan, so the driver holds O(partition) chunk bytes, not the
    whole trace — the reference's record-batch streaming loop does the
    same.
    """
    ordered = chunks.orderBy("chunk_id")
    expected = 0
    with open(trace_filepath + ".tmp", "wb") as f:
        for row in ordered.toLocalIterator(prefetchPartitions=True):
            if row["chunk_id"] != expected:
                raise ValueError(
                    f"chunk {row['chunk_id']} received, expected {expected}: "
                    "chunk stream is out of order or has gaps"
                )
            f.write(row["chunk_data"])
            expected += 1
    if expected == 0:
        import os

        os.remove(trace_filepath + ".tmp")
        return 0
    import os

    os.replace(trace_filepath + ".tmp", trace_filepath)
    return expected

"""External-parser validation of the hand-rolled Perfetto writer.

sources/perfetto.py emits protobuf wire format by hand (this container
ships no protobuf wheel). When the real ``google.protobuf`` runtime IS
present, these tests parse the emitted bytes with it against a
dynamically-built schema carrying the exact Perfetto field numbers
(public perfetto repo: protos/perfetto/trace/trace.proto,
trace_packet.proto, track_event/*.proto) — an independent decoder
confirming tags, varints, length-delimited nesting, and repeated-field
concatenation, the same importorskip pattern as the PIL-gated multimodal
tests. In protobuf-less environments they skip; the in-repo minimal
decoder tests still run elsewhere.
"""

from __future__ import annotations

import pytest

from micromegas_spark.sources.perfetto import (
    SEQUENCE_ID,
    TYPE_SLICE_BEGIN,
    TYPE_SLICE_END,
    spans_to_trace_bytes,
    track_uuid,
)


@pytest.fixture(scope="module")
def trace_cls():
    pytest.importorskip("google.protobuf")
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "perfetto_min.proto"
    fdp.package = "pmin"

    td = fdp.message_type.add()
    td.name = "TrackDescriptor"
    for name, number, ftype in [("uuid", 1, "TYPE_UINT64"), ("name", 2, "TYPE_STRING")]:
        f = td.field.add()
        f.name, f.number = name, number
        f.type = getattr(descriptor_pb2.FieldDescriptorProto, ftype)
        f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL

    te = fdp.message_type.add()
    te.name = "TrackEvent"
    for name, number, ftype in [
        ("type", 9, "TYPE_INT32"),  # enum on the wire = varint
        ("track_uuid", 11, "TYPE_UINT64"),
        ("name", 23, "TYPE_STRING"),
    ]:
        f = te.field.add()
        f.name, f.number = name, number
        f.type = getattr(descriptor_pb2.FieldDescriptorProto, ftype)
        f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL

    tp = fdp.message_type.add()
    tp.name = "TracePacket"
    for name, number, ftype, tname in [
        ("timestamp", 8, "TYPE_UINT64", None),
        ("trusted_packet_sequence_id", 10, "TYPE_UINT32", None),
        ("track_event", 11, "TYPE_MESSAGE", ".pmin.TrackEvent"),
        ("track_descriptor", 60, "TYPE_MESSAGE", ".pmin.TrackDescriptor"),
    ]:
        f = tp.field.add()
        f.name, f.number = name, number
        f.type = getattr(descriptor_pb2.FieldDescriptorProto, ftype)
        f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
        if tname:
            f.type_name = tname

    tr = fdp.message_type.add()
    tr.name = "Trace"
    f = tr.field.add()
    f.name, f.number = "packet", 1
    f.type = descriptor_pb2.FieldDescriptorProto.TYPE_MESSAGE
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_REPEATED
    f.type_name = ".pmin.TracePacket"

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    return message_factory.GetMessageClass(pool.FindMessageTypeByName("pmin.Trace"))


RECORDS = [
    {"stream_id": "s1", "begin_ns": 100, "end_ns": 500, "depth": 0, "name": "root"},
    {"stream_id": "s1", "begin_ns": 150, "end_ns": 300, "depth": 1, "name": "child"},
    {"stream_id": "s2", "begin_ns": 200, "end_ns": 400, "depth": 0, "name": "other"},
]


def test_real_protobuf_roundtrips_three_span_trace(trace_cls):
    t = trace_cls()
    t.ParseFromString(spans_to_trace_bytes(RECORDS))

    descs = {
        p.track_descriptor.uuid: p.track_descriptor.name
        for p in t.packet
        if p.HasField("track_descriptor")
    }
    assert descs == {track_uuid("s1"): "s1", track_uuid("s2"): "s2"}

    events = [
        (p.timestamp, p.track_event.type, p.track_event.track_uuid, p.track_event.name)
        for p in t.packet
        if p.HasField("track_event")
    ]
    u1, u2 = track_uuid("s1"), track_uuid("s2")
    assert events == [
        (100, TYPE_SLICE_BEGIN, u1, "root"),
        (150, TYPE_SLICE_BEGIN, u1, "child"),
        (200, TYPE_SLICE_BEGIN, u2, "other"),
        (300, TYPE_SLICE_END, u1, ""),  # ENDs carry no name
        (400, TYPE_SLICE_END, u2, ""),
        (500, TYPE_SLICE_END, u1, ""),
    ]
    assert all(
        p.trusted_packet_sequence_id == SEQUENCE_ID
        for p in t.packet
        if p.HasField("track_event") or p.HasField("track_descriptor")
    )


def test_real_protobuf_parses_concatenated_chunks(trace_cls):
    """The chunked-stream contract (perfetto_trace_execution_plan.rs):
    concatenating per-chunk Trace bytes IS a valid Trace — protobuf
    repeated-field concatenation — so reassembly needs no framing."""
    a = spans_to_trace_bytes(RECORDS[:1])
    b = spans_to_trace_bytes(RECORDS[1:])
    t = trace_cls()
    t.ParseFromString(a + b)
    n_events = sum(1 for p in t.packet if p.HasField("track_event"))
    n_descs = sum(1 for p in t.packet if p.HasField("track_descriptor"))
    assert n_events == 6
    # s1's descriptor re-emitted in chunk 2 — idempotent by uuid
    assert n_descs == 3

"""Native transit binary decode (reference rust/transit/src/parser.rs,
rust/tracing/src/parsing.rs, rust/telemetry/src/compression.rs): fixtures
are constructed BYTE-BY-BYTE from the wire layouts in the reference
sources, so these tests pin the format itself, not a self-referential
encoder."""

from __future__ import annotations

import struct

import pytest

from micromegas_spark.sources import cbor
from micromegas_spark.sources.transit import (
    Member,
    UserDefinedType,
    decode_block_payload,
    encode_block_payload,
    lz4_block_decompress,
    lz4_frame_decompress,
    lz4_frame_store,
    parse_object_buffer,
    xxh32,
    read_dependencies,
    udts_from_cbor,
    udts_to_cbor,
)

# ---------------------------------------------------------------- lz4


def test_lz4_block_handcrafted_match():
    # token: 4 literals, matchlen 8 (4 + low nibble 4); offset 4 back →
    # overlapping copy: "abcd" * 3
    block = bytes([0x44]) + b"abcd" + struct.pack("<H", 4)
    assert lz4_block_decompress(block) == b"abcdabcdabcd"


def test_lz4_block_literal_extension():
    data = bytes(range(256)) * 2  # 512 literals → 15 + ext(255, 242)
    block = bytes([0xF0, 255, 242]) + data
    assert lz4_block_decompress(block) == data


def test_lz4_frame_store_roundtrip():
    data = b"transit payload bytes" * 100
    assert lz4_frame_decompress(lz4_frame_store(data)) == data


def test_xxh32_published_vectors():
    # xxHash reference test vectors (seed 0)
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


def test_lz4_frame_with_compressed_block():
    # frame wrapping the handcrafted compressed block (bit 31 clear),
    # with a REAL header checksum (second byte of xxh32 over FLG+BD)
    block = bytes([0x44]) + b"abcd" + struct.pack("<H", 4)
    desc = struct.pack("<BB", 0b01 << 6, 0x70)
    frame = (
        struct.pack("<I", 0x184D2204)
        + desc
        + bytes([(xxh32(desc) >> 8) & 0xFF])
        + struct.pack("<I", len(block))
        + block
        + struct.pack("<I", 0)
    )
    assert lz4_frame_decompress(frame) == b"abcdabcdabcd"


def test_lz4_frame_checksums_verified():
    frame = bytearray(lz4_frame_store(b"payload bytes"))
    frame[11] ^= 0xFF  # corrupt one data byte inside the stored block
    with pytest.raises(ValueError, match="checksum"):
        lz4_frame_decompress(bytes(frame))
    good = lz4_frame_store(b"payload bytes")
    bad_header = good[:6] + bytes([good[6] ^ 0xFF]) + good[7:]
    with pytest.raises(ValueError, match="header checksum"):
        lz4_frame_decompress(bad_header)


def test_lz4_frame_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00\x00\x00\x00\x40\x70\x00")


# ------------------------------------------------------------- fixtures
#
# UDT table (indices matter: the wire prefixes each object with its index):
#  0 StaticString           dynamic dep: [id u64][utf8 bytes]
#  1 StaticStringDependency dynamic dep: [id u64][codec u8][len u32][bytes]
#  2 LogDesc                pod dep, size 20: id u64 @0, fmt ref @8, line u32 @16
#  3 LogStaticStrEvent      pod event, size 16: desc ref @0, time i64 @8
#  4 Property               pod, size 16: name ref @0, value ref @8
#  5 PropertySetDependency  dynamic dep: [id u64][nb u32][Property * nb]
#  6 TaggedLogString        dynamic event: [desc u64][props u64][time i64][dyn msg]
#  7 LogStringEventV2       dynamic event: [desc u64][time i64][dyn msg]

UDTS = [
    UserDefinedType("StaticString", 0),
    UserDefinedType("StaticStringDependency", 0),
    UserDefinedType(
        "LogDesc",
        20,
        [
            Member("id", "u64", 0, 8, False),
            Member("fmt", "ref", 8, 8, True),
            Member("line", "u32", 16, 4, False),
        ],
    ),
    UserDefinedType(
        "LogStaticStrEvent",
        16,
        [
            Member("desc", "ref", 0, 8, True),
            Member("time", "i64", 8, 8, False),
        ],
    ),
    UserDefinedType(
        "Property",
        16,
        [
            Member("name", "ref", 0, 8, True),
            Member("value", "ref", 8, 8, True),
        ],
    ),
    UserDefinedType("PropertySetDependency", 0),
    UserDefinedType("TaggedLogString", 0),
    UserDefinedType("LogStringEventV2", 0),
]


def _dyn(idx: int, body: bytes) -> bytes:
    return bytes([idx]) + struct.pack("<I", len(body)) + body


def _static_string(sid: int, s: str) -> bytes:
    return _dyn(0, struct.pack("<Q", sid) + s.encode("utf-8"))


def _utf8(s: str) -> bytes:
    b = s.encode("utf-8")
    return bytes([2]) + struct.pack("<I", len(b)) + b


def _deps_buffer() -> bytes:
    buf = b""
    buf += _static_string(42, "src/hello.rs")
    # StaticStringDependency with UTF-16 codec (codec 1)
    w = "wide ♞".encode("utf-16-le")
    buf += _dyn(1, struct.pack("<Q", 43) + bytes([1]) + struct.pack("<I", len(w)) + w)
    # LogDesc pod dep: id=7, fmt → 42, line=33
    buf += bytes([2]) + struct.pack("<QQI", 7, 42, 33)
    # property strings + a property set {env: prod}
    buf += _static_string(100, "env")
    buf += _static_string(101, "prod")
    prop = struct.pack("<QQ", 100, 101)
    buf += _dyn(5, struct.pack("<QI", 9, 1) + prop)
    return buf


def test_read_dependencies():
    deps = read_dependencies(UDTS, _deps_buffer())
    assert deps[42] == "src/hello.rs"
    assert deps[43] == "wide ♞"
    assert deps[7]["__type"] == "LogDesc"
    assert deps[7]["fmt"] == "src/hello.rs" and deps[7]["line"] == 33
    assert deps[9] == {"__type": "property_set", "env": "prod"}


def test_duplicate_dependency_id_rejected():
    buf = _static_string(1, "a") + _static_string(1, "b")
    with pytest.raises(ValueError, match="duplicate"):
        read_dependencies(UDTS, buf)


def test_parse_pod_events_with_references():
    deps = read_dependencies(UDTS, _deps_buffer())
    objs = b""
    objs += bytes([3]) + struct.pack("<Qq", 7, 1111)
    objs += bytes([3]) + struct.pack("<Qq", 7, 2222)
    out = list(parse_object_buffer(UDTS, deps, objs))
    assert [o["time"] for o in out] == [1111, 2222]
    assert out[0]["desc"]["fmt"] == "src/hello.rs"


def test_custom_event_readers():
    deps = read_dependencies(UDTS, _deps_buffer())
    objs = b""
    # LogStringEventV2: desc=7, time, dyn msg
    objs += _dyn(7, struct.pack("<Qq", 7, 5) + _utf8("hello world"))
    # TaggedLogString: desc=7, props=9, time, dyn msg
    objs += _dyn(6, struct.pack("<QQq", 7, 9, 6) + _utf8("tagged"))
    v2, tagged = parse_object_buffer(UDTS, deps, objs)
    assert v2["msg"] == "hello world" and v2["desc"]["line"] == 33
    assert tagged["properties"] == {"__type": "property_set", "env": "prod"}
    assert tagged["msg"] == "tagged" and tagged["time"] == 6


def test_unknown_custom_object_warns_not_raises():
    udts = UDTS + [UserDefinedType("FutureEvent", 0)]
    objs = _dyn(len(udts) - 1, b"\x01\x02\x03")
    (out,) = parse_object_buffer(udts, {}, objs)
    assert out == {"__type": "FutureEvent"}  # parser.rs:136-152 behavior


def test_block_payload_end_to_end():
    objs = bytes([3]) + struct.pack("<Qq", 7, 1234)
    payload = encode_block_payload(_deps_buffer(), objs)
    (event,) = decode_block_payload(payload, UDTS, UDTS)
    assert event["time"] == 1234
    assert event["desc"]["fmt"] == "src/hello.rs"


def test_udt_metadata_cbor_roundtrip():
    assert udts_from_cbor(udts_to_cbor(UDTS)) == UDTS


def test_corrupt_buffers_raise():
    with pytest.raises(ValueError, match="type index"):
        list(parse_object_buffer(UDTS[:1], {}, bytes([9, 0, 0, 0, 0])))
    with pytest.raises(ValueError, match="exceeds buffer"):
        list(parse_object_buffer(UDTS, {}, bytes([3]) + b"\x00" * 4))
    # reference member pointing at a missing dependency
    objs = bytes([3]) + struct.pack("<Qq", 999, 0)
    with pytest.raises(ValueError, match="dependency 999"):
        list(parse_object_buffer(UDTS, {}, objs))


# ------------------------------------------------------- streaming ingest


def test_stream_transit_blobs_exactly_once(spark, tmp_path):
    """readStream(binaryFile) over a reference-shaped blob tree decodes
    through the same transit path, exactly-once across restarts."""
    import json
    import os

    from micromegas_spark.sources.transit import stream_transit_blobs

    objs1 = bytes([3]) + struct.pack("<Qq", 7, 111)
    objs2 = (
        bytes([3]) + struct.pack("<Qq", 7, 222)
        + bytes([3]) + struct.pack("<Qq", 7, 333)
    )
    blobdir = tmp_path / "blobs" / "procA" / "streamX"
    os.makedirs(blobdir)
    (blobdir / "blk1").write_bytes(encode_block_payload(_deps_buffer(), objs1))
    (blobdir / "blk2").write_bytes(encode_block_payload(_deps_buffer(), objs2))

    meta = udts_to_cbor(UDTS)
    streams_meta = spark.createDataFrame(
        [("streamX", bytearray(meta), bytearray(meta))],
        "stream_id STRING, dependencies_metadata BINARY, objects_metadata BINARY",
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_transit_blobs(spark, str(tmp_path / "blobs"), streams_meta, out, ckpt)
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    times = sorted(json.loads(r["value"])["time"] for r in rows)
    assert times == [111, 222, 333]
    assert {r["block_id"] for r in rows} == {"blk1", "blk2"}

    # restart with one NEW blob: only the new file is processed
    (blobdir / "blk3").write_bytes(
        encode_block_payload(_deps_buffer(), bytes([3]) + struct.pack("<Qq", 7, 444))
    )
    q2 = stream_transit_blobs(spark, str(tmp_path / "blobs"), streams_meta, out, ckpt)
    q2.awaitTermination(120)
    rows2 = spark.read.parquet(out).collect()
    times2 = sorted(json.loads(r["value"])["time"] for r in rows2)
    assert times2 == [111, 222, 333, 444]  # no duplicates: exactly-once


class _TouchCounter:
    """Executor-side decode marker for the early-stop proof: .add() drops
    a unique file into a shared dir. A Spark accumulator would also work
    for steady-state observability, but an early-terminated task (LIMIT
    satisfied → worker killed, stream never drained) may not flush
    accumulator updates — files written before the stop always survive,
    which is exactly the property a "did this block decode?" probe needs
    in local[n]."""

    def __init__(self, marker_dir: str) -> None:
        self.marker_dir = marker_dir

    def add(self, n: int) -> None:
        import os
        import uuid

        with open(os.path.join(self.marker_dir, uuid.uuid4().hex), "w"):
            pass


def test_parse_transit_blocks_early_stop_under_bare_limit(spark, tmp_path):
    """The reference's block UDTFs stop decoding under a bare LIMIT
    (functions-reference.md:245); parse_block has this pinned via its
    per-block limit + iterator laziness. This pins the SPARK-side half
    for parse_transit_blocks: a LIMIT k over a multi-block scan must
    leave most blocks undecoded (the per-block generator stops being
    pulled once the limit is satisfied). Socket/Arrow buffering can
    absorb a couple of blocks past the cutoff, so the assertion is
    blocks_decoded < blocks_total/2 with 16 large blocks in ONE task."""
    import os

    from micromegas_spark.sources.transit import parse_transit_blocks

    n_blocks, objs_per_block = 16, 2000
    one = bytes([3]) + struct.pack("<Qq", 7, 1234)
    payload = encode_block_payload(_deps_buffer(), one * objs_per_block)
    meta = udts_to_cbor(UDTS)
    rows = [
        (f"blk{i:02d}", bytearray(payload), bytearray(meta), bytearray(meta))
        for i in range(n_blocks)
    ]
    df = spark.createDataFrame(
        rows,
        "block_id STRING, payload BINARY, "
        "dependencies_metadata BINARY, objects_metadata BINARY",
    ).repartition(1)

    marker_dir = str(tmp_path / "decoded")
    os.makedirs(marker_dir)
    parsed = parse_transit_blocks(df, decoded_counter=_TouchCounter(marker_dir))
    got = parsed.limit(objs_per_block // 2).collect()
    assert len(got) == objs_per_block // 2
    blocks_decoded = len(os.listdir(marker_dir))
    assert 1 <= blocks_decoded < n_blocks // 2, blocks_decoded

    # and without a LIMIT every block decodes. Spark task execution is
    # at-LEAST-once: a worker crash (e.g. the one the LIMIT-kill above can
    # leave behind) retries the whole task, deduping the OUTPUT rows but
    # not executor side effects — so the marker count is >= n_blocks, not
    # == (observed 17 under box contention). The exact row count proves
    # all 16 blocks contributed; the marker floor proves none was skipped.
    for f in os.listdir(marker_dir):
        os.unlink(os.path.join(marker_dir, f))
    assert parse_transit_blocks(
        df, decoded_counter=_TouchCounter(marker_dir)
    ).count() == n_blocks * objs_per_block
    assert len(os.listdir(marker_dir)) >= n_blocks


def test_write_transit_blobs_fs_api_file_uri(spark, tmp_path):
    """The blob writer goes through the URI-addressed filesystem layer
    (pyarrow.fs): a ``file://`` URI root and a plain-path root must both
    produce the reference blob layout with exact payload bytes, written
    from executors — and the tree must feed stream_transit_blobs
    unchanged (the reader side already takes any FS URI). On rename-
    capable filesystems the write is tmp+move, so no bare .tmp files
    survive."""
    import json
    import os

    from micromegas_spark.sources.transit import (
        stream_transit_blobs,
        write_transit_blobs,
    )

    objs = bytes([3]) + struct.pack("<Qq", 7, 555)
    payload = encode_block_payload(_deps_buffer(), objs)
    df = spark.createDataFrame(
        [("streamX", "blkA", bytearray(payload)),
         ("streamY", "blkB", bytearray(payload))],
        "stream_id STRING, block_id STRING, payload BINARY",
    )

    # file:// URI root
    uri_root = f"file://{tmp_path}/blobs_uri"
    write_transit_blobs(df, uri_root, "procZ")
    pa = tmp_path / "blobs_uri" / "procZ" / "streamX" / "blkA"
    pb = tmp_path / "blobs_uri" / "procZ" / "streamY" / "blkB"
    assert pa.read_bytes() == payload and pb.read_bytes() == payload
    leftovers = [
        f for _, _, fs in os.walk(tmp_path / "blobs_uri") for f in fs
        if f.endswith(".tmp")
    ]
    assert leftovers == []

    # plain-path root, same layout
    write_transit_blobs(df, str(tmp_path / "blobs_plain"), "procZ")
    assert (
        tmp_path / "blobs_plain" / "procZ" / "streamX" / "blkA"
    ).read_bytes() == payload

    # the written tree ingests through the streaming reader unchanged
    meta = udts_to_cbor(UDTS)
    streams_meta = spark.createDataFrame(
        [("streamX", bytearray(meta), bytearray(meta)),
         ("streamY", bytearray(meta), bytearray(meta))],
        "stream_id STRING, dependencies_metadata BINARY, "
        "objects_metadata BINARY",
    )
    q = stream_transit_blobs(
        spark, uri_root, streams_meta,
        str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    assert sorted(json.loads(r["value"])["time"] for r in rows) == [555, 555]
    assert {r["block_id"] for r in rows} == {"blkA", "blkB"}


# ------------------------------------------- native fast path (r8 #1)


def test_pure_and_native_paths_equal_on_same_vectors():
    """The dispatching xxh32/lz4_frame_decompress and the pure-python
    spec implementations must agree byte-for-byte on the same inputs.
    In a wheel-less container both dispatch to the pure path (trivially
    equal); where lz4/xxhash ARE installed this pins native==pure on the
    published vectors and a stored-frame roundtrip."""
    from micromegas_spark.sources.transit import (
        lz4_frame_decompress_py,
        xxh32_py,
    )

    for v, want in [
        (b"", 0x02CC5D05),
        (b"a", 0x550D7456),
        (b"abc", 0x32D153FF),
        (b"Nobody inspects the spammish repetition", 0xE2293B2F),
        (b"x" * 1000, xxh32_py(b"x" * 1000)),
    ]:
        assert xxh32_py(v) == want
        assert xxh32(v) == want  # dispatcher (native when installed)
    data = b"the quick brown fox " * 64
    frame = lz4_frame_store(data)
    assert lz4_frame_decompress_py(frame) == data
    assert lz4_frame_decompress(frame) == data


def test_native_wheels_when_present_decode_reference_style_frames():
    """Gate: only runs where lz4/xxhash wheels exist (not this container,
    any real deployment). A frame COMPRESSED by native lz4.frame must
    decode identically through the pure-python spec decoder — the
    cross-implementation compatibility the reference's lz4 crate relies
    on."""
    import pytest

    lz4f = pytest.importorskip("lz4.frame")
    xxh = pytest.importorskip("xxhash")
    from micromegas_spark.sources.transit import (
        lz4_frame_decompress_py,
        xxh32_py,
    )

    data = b"compressible payload " * 512
    native_frame = lz4f.compress(data, content_checksum=True)
    assert lz4_frame_decompress_py(native_frame) == data
    assert lz4_frame_decompress(native_frame) == data
    for v in [b"", b"abc", data]:
        assert xxh.xxh32_intdigest(v) == xxh32_py(v)


def test_stream_transit_blobs_routes_per_stream_metadata(spark, tmp_path):
    """Two streams with DIFFERENT UDT metadata: the stream-static join
    must route each blob to ITS stream's CBOR metadata row — the same
    type index decodes as a different POD layout per stream, so a routing
    mistake changes the decoded fields."""
    import json
    import os

    from micromegas_spark.sources.transit import stream_transit_blobs

    # streamX: the shared fixture UDTS — type 3 = LogStaticStrEvent
    # (desc ref + i64 time, 16 bytes)
    objsX = bytes([3]) + struct.pack("<Qq", 7, 1111)
    # streamY: type 3 is a bare 8-byte Tick {time i64}
    udtsY = [
        UserDefinedType("StaticString", 0),
        UserDefinedType("StaticStringDependency", 0),
        UserDefinedType(
            "LogDesc",
            20,
            [
                Member("id", "u64", 0, 8, False),
                Member("fmt", "ref", 8, 8, True),
                Member("line", "u32", 16, 4, False),
            ],
        ),
        UserDefinedType("Tick", 8, [Member("time", "i64", 0, 8, False)]),
    ]
    objsY = bytes([3]) + struct.pack("<q", 2222)

    for sid, objs in (("streamX", objsX), ("streamY", objsY)):
        d = tmp_path / "blobs" / "procA" / sid
        os.makedirs(d)
        (d / "blk").write_bytes(encode_block_payload(_deps_buffer(), objs))

    streams_meta = spark.createDataFrame(
        [
            ("streamX", bytearray(udts_to_cbor(UDTS)), bytearray(udts_to_cbor(UDTS))),
            ("streamY", bytearray(udts_to_cbor(UDTS)), bytearray(udts_to_cbor(udtsY))),
        ],
        "stream_id STRING, dependencies_metadata BINARY, objects_metadata BINARY",
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_transit_blobs(spark, str(tmp_path / "blobs"), streams_meta, out, ckpt)
    q.awaitTermination(120)
    rows = {r["type_name"]: json.loads(r["value"]) for r in spark.read.parquet(out).collect()}
    assert rows["LogStaticStrEvent"]["time"] == 1111
    assert rows["LogStaticStrEvent"]["desc"]["line"] == 33  # dep resolved
    assert rows["Tick"] == {"__type": "Tick", "time": 2222}


def test_lz4_block_compress_roundtrips():
    """Writer-side compression (round 8): the greedy block compressor's
    output must decode byte-identically through the spec decoder, and
    repetitive data must actually shrink."""
    from micromegas_spark.sources.transit import (
        lz4_block_compress,
        lz4_frame_compress,
        lz4_frame_decompress,
        lz4_frame_decompress_py,
    )

    cases = [
        b"",
        b"a",
        b"abcd",
        b"abcdabcdabcd" * 10,
        b"the quick brown fox jumps over the lazy dog " * 50,
        bytes(range(256)) * 8,           # incompressible-ish
        b"\x00" * 100000,                # long overlap matches (offset 1)
        b"ab" * 40000,                   # offset-2 overlap, >64K input
        ("header|" + "x" * 13).encode(),  # exactly past the 13-byte floor
    ]
    import os
    cases.append(os.urandom(4096))       # truly incompressible → stored
    for data in cases:
        comp = lz4_block_compress(data)
        if data:
            assert lz4_block_decompress(comp) == data
        frame = lz4_frame_compress(data)
        assert lz4_frame_decompress_py(frame) == data
        assert lz4_frame_decompress(frame) == data
    rep = b"abcdabcdabcd" * 1000
    assert len(lz4_block_compress(rep)) < len(rep) // 10
    zeros = b"\x00" * 100000
    assert len(lz4_block_compress(zeros)) < 500


def test_lz4_compressed_frame_decodes_natively_when_wheel_present():
    import pytest

    lz4f = pytest.importorskip("lz4.frame")
    from micromegas_spark.sources.transit import lz4_frame_compress

    data = b"compress me properly " * 512
    assert lz4f.decompress(lz4_frame_compress(data)) == data


def test_lz4_writer_paths_decode_equal():
    """Writer-side fast-path symmetry (round 9): lz4_frame_compress
    dispatches to liblz4 when the wheel is installed and to the pure-python
    compressor otherwise; both writer paths must decode back to the same
    input through every decoder available, on the same vectors the block
    compressor is pinned with."""
    from micromegas_spark.sources.transit import (
        _lz4frame,
        lz4_frame_compress,
        lz4_frame_compress_py,
        lz4_frame_decompress,
        lz4_frame_decompress_py,
    )

    cases = [
        b"",
        b"a",
        b"abcd",
        b"abcdabcdabcd" * 10,
        b"the quick brown fox jumps over the lazy dog " * 50,
        bytes(range(256)) * 8,
        b"\x00" * 100000,
        b"ab" * 40000,
        ("header|" + "x" * 13).encode(),
    ]
    for data in cases:
        # the dispatching writer, through both decoders
        frame = lz4_frame_compress(data)
        assert lz4_frame_decompress(frame) == data
        assert lz4_frame_decompress_py(frame) == data
        # the fallback writer explicitly (identical to the above when no
        # wheel is installed; the distinct path when one is)
        py_frame = lz4_frame_compress_py(data)
        assert lz4_frame_decompress_py(py_frame) == data
        if _lz4frame is not None:
            assert _lz4frame.decompress(py_frame) == data
            assert frame != py_frame or len(data) == 0  # genuinely two paths


def test_transit_block_payload_with_compressed_buffers():
    """encode→decode through genuinely compressed lz4 frames (not stored):
    the full parse path handles a compressed BlockPayload envelope."""
    from micromegas_spark.sources import cbor
    from micromegas_spark.sources.transit import (
        decode_block_payload,
        lz4_frame_compress,
    )

    objs = (bytes([3]) + struct.pack("<Qq", 7, 1234)) * 20
    payload = cbor.dumps(
        {
            "dependencies": lz4_frame_compress(_deps_buffer()),
            "objects": lz4_frame_compress(objs),
        }
    )
    events = decode_block_payload(payload, UDTS, UDTS)
    assert len(events) == 20 and all(e["time"] == 1234 for e in events)
    assert events[0]["desc"]["fmt"] == "src/hello.rs"


def test_lz4_compress_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from micromegas_spark.sources.transit import (
        lz4_frame_compress_py,
        lz4_frame_decompress_py,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.one_of(
            st.binary(max_size=2000),
            # repetitive shapes: short alphabet makes matches dense
            st.binary(max_size=300).map(lambda b: b * 17),
            st.text(alphabet="ab", max_size=800).map(str.encode),
        )
    )
    def check(data: bytes) -> None:
        assert lz4_frame_decompress_py(lz4_frame_compress_py(data)) == data

    check()


def test_pod_run_vectorized_equals_scalar_path():
    """The numpy run decoder must produce byte-identical objects to the
    scalar parse_pod_instance path on mixed buffers: runs interrupted by
    other types, reference members resolving through deps, an
    is_reference UDT collapsing to its id, and single (non-run)
    objects."""
    from micromegas_spark.sources import transit as T

    deps = read_dependencies(UDTS, _deps_buffer())
    # LogStaticStrEvent (idx 3, POD 16B): desc ref + i64 time
    pod = lambda t: bytes([3]) + struct.pack("<Qq", 7, t)
    # a Property pair (idx 4, POD 16B refs) and a dynamic event between runs
    prop = bytes([4]) + struct.pack("<QQ", 100, 101)
    dyn = _dyn(7, struct.pack("<Qq", 7, 5) + _utf8("hello"))
    buf = b"".join([pod(1), pod(2), pod(3), prop, dyn, pod(4), prop, prop, pod(5)])

    old = T.VECTORIZE_POD_RUNS
    try:
        T.VECTORIZE_POD_RUNS = True
        fast = list(parse_object_buffer(UDTS, deps, buf))
        T.VECTORIZE_POD_RUNS = False
        slow = list(parse_object_buffer(UDTS, deps, buf))
    finally:
        T.VECTORIZE_POD_RUNS = old
    assert fast == slow
    assert [o["time"] for o in fast if o.get("__type") == "LogStaticStrEvent"] == [1, 2, 3, 4, 5]
    assert fast[3] == {"__type": "Property", "name": "env", "value": "prod"}

    # an unknown dependency inside a RUN raises the same error
    bad = pod(1) + bytes([3]) + struct.pack("<Qq", 999, 2)
    try:
        T.VECTORIZE_POD_RUNS = True
        with pytest.raises(ValueError, match="dependency 999 not found"):
            list(parse_object_buffer(UDTS, deps, bad))
    finally:
        T.VECTORIZE_POD_RUNS = old


def test_pod_run_vectorized_property():
    """Property pin: random interleavings of two POD types and a dynamic
    type decode identically through both paths."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from micromegas_spark.sources import transit as T

    deps = read_dependencies(UDTS, _deps_buffer())
    pieces = {
        0: lambda i: bytes([3]) + struct.pack("<Qq", 7, i),
        1: lambda i: bytes([4]) + struct.pack("<QQ", 100, 101),
        2: lambda i: _dyn(7, struct.pack("<Qq", 7, i) + _utf8(f"m{i}")),
    }

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(0, 2), max_size=40))
    def check(kinds):
        buf = b"".join(pieces[k](i) for i, k in enumerate(kinds))
        old = T.VECTORIZE_POD_RUNS
        try:
            T.VECTORIZE_POD_RUNS = True
            fast = list(parse_object_buffer(UDTS, deps, buf))
            T.VECTORIZE_POD_RUNS = False
            slow = list(parse_object_buffer(UDTS, deps, buf))
        finally:
            T.VECTORIZE_POD_RUNS = old
        assert fast == slow

    check()


def test_xxh32_chunked_loop_matches_naive_at_boundaries():
    """The batched stripe loop must agree with a naive per-stripe
    implementation at and around the 64 KB unpack-chunk boundaries and
    for every tail length 0..16."""
    import struct as _struct

    from micromegas_spark.sources.transit import _M32, _rotl32, xxh32_py

    P1, P2, P3, P4, P5 = (
        2654435761, 2246822519, 3266489917, 668265263, 374761393,
    )

    def naive(data: bytes, seed: int = 0) -> int:
        n = len(data); i = 0
        if n >= 16:
            v1 = (seed + P1 + P2) & _M32
            v2 = (seed + P2) & _M32
            v3 = seed & _M32
            v4 = (seed - P1) & _M32
            while i <= n - 16:
                l1, l2, l3, l4 = _struct.unpack_from("<IIII", data, i)
                v1 = (_rotl32((v1 + l1 * P2) & _M32, 13) * P1) & _M32
                v2 = (_rotl32((v2 + l2 * P2) & _M32, 13) * P1) & _M32
                v3 = (_rotl32((v3 + l3 * P2) & _M32, 13) * P1) & _M32
                v4 = (_rotl32((v4 + l4 * P2) & _M32, 13) * P1) & _M32
                i += 16
            h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
        else:
            h = (seed + P5) & _M32
        h = (h + n) & _M32
        while i <= n - 4:
            (l,) = _struct.unpack_from("<I", data, i)
            h = (_rotl32((h + l * P3) & _M32, 17) * P4) & _M32
            i += 4
        while i < n:
            h = (_rotl32((h + data[i] * P5) & _M32, 11) * P1) & _M32
            i += 1
        h ^= h >> 15; h = (h * P2) & _M32
        h ^= h >> 13; h = (h * P3) & _M32
        h ^= h >> 16
        return h

    base = bytes(range(251)) * 600  # ~150 KB, crosses two chunk boundaries
    for n in [0, 1, 15, 16, 17, 31, 32, 4095,
              65519, 65520, 65521, 65535, 65536, 65537,
              131071, 131072, 131073, len(base)]:
        d = base[:n]
        assert xxh32_py(d) == naive(d), n
        assert xxh32_py(d, seed=12345) == naive(d, seed=12345), n

"""Regression tests for round-5 ADVICE findings."""

from __future__ import annotations

import pytest


def test_read_varint_truncated_raises_valueerror():
    from micromegas_spark.flightsql.pb import _read_varint

    # continuation bit set, then buffer ends: must be ValueError (the
    # raw-SQL ticket fallback catches ValueError, not IndexError)
    with pytest.raises(ValueError):
        _read_varint(b"\x80", 0)
    with pytest.raises(ValueError):
        _read_varint(b"", 0)


def test_read_varint_shift_capped():
    from micromegas_spark.flightsql.pb import _read_varint

    # 11 continuation bytes would shift past 63 — adversarial input must
    # not build arbitrarily large ints
    with pytest.raises(ValueError):
        _read_varint(b"\xff" * 11 + b"\x01", 0)
    # 10-byte uint64 max still decodes
    v, pos = _read_varint(b"\xff" * 9 + b"\x01", 0)
    assert pos == 10 and v == (1 << 63) | ((1 << 63) - 1)


def test_raw_sql_ticket_that_parses_as_truncated_protobuf():
    # b"0" decodes as tag(field=6, wiretype=0) with a missing varint value;
    # the ticket parser must fall back to raw SQL, not crash with IndexError
    from micromegas_spark.flightsql import pb

    with pytest.raises(ValueError):
        pb.decode_fields(b"0")


def test_kmv_sketches_empty_input(spark):
    from micromegas_spark.operators.sketch import kmv_sketches

    empty = spark.createDataFrame([], "side string, h bigint")
    out = kmv_sketches(empty, k=16)
    assert out.columns == ["side", "ks"]
    assert out.count() == 0


def _bmp32(w: int, h: int, bgra_rows: bytes) -> bytes:
    import struct

    off = 54
    size = off + len(bgra_rows)
    file_hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, off)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(bgra_rows), 0, 0, 0, 0)
    return file_hdr + info_hdr + bgra_rows


def test_bmp32_header_and_pixel_channel_counts_agree():
    from micromegas_spark.operators.imagecodec import decode_image, decode_image_array

    # 1x1 bottom-up 32-bpp BMP, pixel BGRA = (1,2,3,255): alpha is dropped
    # by the pixel path, so the header path must also report 3 channels
    payload = _bmp32(1, 1, bytes([1, 2, 3, 255]))
    fmt, w, h, c = decode_image(payload)
    arr = decode_image_array(payload)
    assert (fmt, w, h) == ("bmp", 1, 1)
    assert c == arr.shape[2] == 3
    assert arr[0, 0].tolist() == [3, 2, 1]

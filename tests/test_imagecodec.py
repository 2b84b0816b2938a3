"""Pure-numpy image codec (operators/imagecodec): the dependency-free real
decoder behind multimodal backend='numpy'. PPM/PGM round-trips, BMP
stride/flip/BGR handling, corrupt-payload contracts, nearest resize."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from micromegas_spark.operators.imagecodec import (
    decode_image,
    decode_image_array,
    encode_ppm,
    resize_nearest,
)


def _rgb(h, w, seed=0):
    return ((seed + np.arange(h * w * 3)) % 256).astype("uint8").reshape(h, w, 3)


def test_ppm_roundtrip_exact():
    arr = _rgb(5, 7, seed=11)
    payload = encode_ppm(arr)
    assert decode_image(payload) == ("ppm", 7, 5, 3)
    out = decode_image_array(payload)
    assert out.shape == (5, 7, 3) and np.array_equal(out, arr)


def test_pgm_roundtrip_and_header_comments():
    gray = (np.arange(6 * 4) % 256).astype("uint8").reshape(6, 4)
    payload = encode_ppm(gray)
    assert payload[:2] == b"P5"
    assert decode_image(payload) == ("pgm", 4, 6, 1)
    assert np.array_equal(decode_image_array(payload)[:, :, 0], gray)
    # netpbm headers may carry '#' comments between tokens
    commented = b"P5\n# a comment\n4 6\n255\n" + gray.tobytes()
    assert decode_image(commented) == ("pgm", 4, 6, 1)
    assert np.array_equal(decode_image_array(commented)[:, :, 0], gray)


def _bmp24(arr, top_down=False):
    """Build an uncompressed 24-bit BMP: BGR pixel order, rows padded to
    4 bytes, bottom-up unless top_down."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = arr[:, :, ::-1]  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    body = b"".join(
        rows[y].tobytes() + b"\x00" * (stride - w * 3) for y in range(h)
    )
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h if not top_down else -h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + info + body


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_decode_stride_flip_bgr(top_down):
    arr = _rgb(3, 5, seed=7)  # w=5 -> 15-byte rows pad to 16
    payload = _bmp24(arr, top_down=top_down)
    assert decode_image(payload) == ("bmp", 5, 3, 3)
    out = decode_image_array(payload)
    assert out.shape == (3, 5, 3) and np.array_equal(out, arr)


def test_corrupt_payloads_yield_none_not_raise():
    for p in (None, b"", b"P6", b"P6\n-3 4\n255\n", b"BMxx", b"\x89PNG\r\n",
              b"P6\n10 10\n255\n" + b"\x01" * 10):  # truncated pixel data
        assert decode_image_array(p) is None
        assert decode_image(p) is None or p == b"P6\n10 10\n255\n" + b"\x01" * 10


def test_resize_nearest_matches_index_formula():
    arr = _rgb(8, 12, seed=3)
    out = resize_nearest(arr, 5, 4)
    assert out.shape == (4, 5, 3)
    for y in range(4):
        for x in range(5):
            assert np.array_equal(out[y, x], arr[(y * 8) // 4, (x * 12) // 5])


def test_spark_numpy_backend_end_to_end(spark):
    """decode_media/resize_images backend='numpy' against real PPM bytes:
    dims from the actual header, oversized payloads genuinely downscaled
    and re-encoded, small ones passed through."""
    from micromegas_spark.operators.multimodal import decode_media, resize_images

    big = encode_ppm(_rgb(40, 60, seed=1))
    small = encode_ppm(_rgb(4, 6, seed=2))
    junk = b"not an image"
    df = spark.createDataFrame(
        [(1, "image", bytearray(big), {}), (2, "image", bytearray(small), {}),
         (3, "image", bytearray(junk), {})],
        "media_id bigint, media_type string, payload binary, metadata map<string,string>",
    )
    dec = {r.media_id: r for r in decode_media(df, backend="numpy").collect()}
    assert (dec[1].width, dec[1].height) == (60, 40)
    assert (dec[2].width, dec[2].height) == (6, 4)
    assert dec[3].width is None and dec[3].height is None

    rs = {r.media_id: r for r in resize_images(df, max_side=30, backend="numpy").collect()}
    assert (rs[1].new_width, rs[1].new_height) == (30, 20)
    rearr = decode_image_array(bytes(rs[1].payload))
    assert rearr.shape == (20, 30, 3)
    assert np.array_equal(rearr, resize_nearest(_rgb(40, 60, seed=1), 30, 20))
    assert (rs[2].new_width, rs[2].new_height) == (6, 4)
    assert bytes(rs[2].payload) == small  # pass-through, not re-encoded
    assert rs[3].new_width is None and bytes(rs[3].payload) == junk

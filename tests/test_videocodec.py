"""Unit tests for the pure-numpy AVI codec (operators/videocodec):
encode→decode round-trips (including odd widths that exercise DIB row
padding), container-walk robustness, and the corrupt-payload contract.
"""

import struct

import numpy as np
import pytest

from micromegas_spark.operators.videocodec import decode_avi, encode_avi


def _frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(n)]


def test_roundtrip_basic():
    frames = _frames(3, 6, 8)
    w, h, fps, out = decode_avi(encode_avi(frames, fps=10))
    assert (w, h, fps, len(out)) == (8, 6, 10, 3)
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("w", [1, 2, 3, 5, 7])
def test_roundtrip_row_padding(w):
    # row length w*3 not a multiple of 4 exercises the DIB pad bytes
    frames = _frames(2, 4, w, seed=w)
    dw, dh, _, out = decode_avi(encode_avi(frames, fps=5))
    assert (dw, dh) == (w, 4)
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


def test_single_frame_and_fps():
    frames = _frames(1, 2, 2)
    _, _, fps, out = decode_avi(encode_avi(frames, fps=24))
    assert fps == 24 and len(out) == 1


def test_order_sensitivity():
    # a row-flipped re-encode must NOT equal the original frames
    frames = _frames(1, 4, 4)
    flipped = [frames[0][::-1].copy()]
    _, _, _, out = decode_avi(encode_avi(flipped, fps=1))
    assert not np.array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[0], flipped[0])


@pytest.mark.parametrize(
    "payload",
    [
        None,
        b"",
        b"RIFF\x04\x00\x00\x00WAVE",  # wrong form type
        b"not a video",
    ],
)
def test_corrupt_payloads_yield_none(payload):
    assert decode_avi(payload) is None


def test_compressed_frames_rejected():
    payload = bytearray(encode_avi(_frames(1, 2, 2), fps=1))
    # flip biCompression (offset 16 into strf body) to MJPG
    at = payload.index(b"strf") + 8 + 16
    payload[at : at + 4] = struct.pack("<I", 0x47504A4D)
    assert decode_avi(bytes(payload)) is None


def test_truncated_movi_salvages_whole_frames():
    frames = _frames(4, 4, 4)
    full = encode_avi(frames, fps=2)
    # cut mid-way through the last frame chunk: the partial frame is
    # dropped, the three whole ones are salvaged
    w, h, fps, out = decode_avi(full[: len(full) - 10])
    assert (w, h, len(out)) == (4, 4, 3)
    for a, b in zip(frames[:3], out):
        np.testing.assert_array_equal(a, b)


def test_mismatched_frame_shapes_rejected_on_encode():
    with pytest.raises(ValueError):
        encode_avi([np.zeros((2, 2, 3), np.uint8), np.zeros((3, 2, 3), np.uint8)])
    with pytest.raises(ValueError):
        encode_avi([])


def test_unknown_chunks_tolerated():
    payload = encode_avi(_frames(2, 3, 3), fps=4)
    # splice a JUNK chunk right after the hdrl LIST
    hdrl_at = payload.index(b"hdrl") - 8
    (hlen,) = struct.unpack("<I", payload[hdrl_at + 4 : hdrl_at + 8])
    ins = hdrl_at + 8 + hlen
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    spliced = payload[:ins] + junk + payload[ins:]
    w, h, fps, out = decode_avi(spliced)
    assert (w, h, fps, len(out)) == (3, 3, 4, 2)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 5),
    st.integers(1, 12),
    st.integers(1, 12),
    st.integers(0, 10**6),
)
def test_roundtrip_property(n, h, w, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(n)]
    dw, dh, _, out = decode_avi(encode_avi(frames, fps=7))
    assert (dw, dh, len(out)) == (w, h, n)
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


def test_audio_stream_strl_before_video_ignored():
    """An audio strl whose 40-byte WAVEFORMAT strf precedes the video
    strl must not be misread as the video BITMAPINFOHEADER."""
    frames = _frames(2, 4, 4, seed=3)
    payload = encode_avi(frames, fps=6)

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    # audio strh ('auds') + a 40-byte strf (wBitsPerSample=16 at the
    # offset where BITMAPINFOHEADER keeps biBitCount)
    astrh = b"auds" + b"\x00" * 52
    astrf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16) + b"\x00" * 24
    audio_strl = chunk(b"LIST", b"strl" + chunk(b"strh", astrh) + chunk(b"strf", astrf))
    # splice the audio strl at the head of hdrl, before avih
    hdrl_at = payload.index(b"hdrl")
    ins = hdrl_at + 4
    spliced = bytearray(payload[:ins] + audio_strl + payload[ins:])
    # grow the hdrl LIST and RIFF sizes
    (hlen,) = struct.unpack("<I", spliced[hdrl_at - 4 : hdrl_at])
    spliced[hdrl_at - 4 : hdrl_at] = struct.pack("<I", hlen + len(audio_strl))
    (rlen,) = struct.unpack("<I", spliced[4:8])
    spliced[4:8] = struct.pack("<I", rlen + len(audio_strl))

    dec = decode_avi(bytes(spliced))
    assert dec is not None
    w, h, fps, out = dec
    # video stream is now stream 1, so its frames are the 00db chunks of
    # stream 0 in the original file — rewrite their ids to 01db
    assert (w, h, fps) == (4, 4, 6)
    fixed = bytes(spliced).replace(b"00db", b"01db")
    _, _, _, out2 = decode_avi(fixed)
    assert len(out2) == 2
    for a, b in zip(frames, out2):
        np.testing.assert_array_equal(a, b)
    # and the original 00db chunks no longer belong to the video stream
    assert len(out) == 0


def test_no_hasindex_flag_without_idx1():
    payload = encode_avi(_frames(1, 2, 2), fps=1)
    avih_at = payload.index(b"avih") + 8
    (flags,) = struct.unpack("<I", payload[avih_at + 12 : avih_at + 16])
    assert flags & 0x10 == 0  # AVIF_HASINDEX must be off: no idx1 written


def test_corrupt_fps_clamped():
    payload = bytearray(encode_avi(_frames(1, 2, 2), fps=1))
    strh_at = payload.index(b"strh") + 8
    # dwScale=1, dwRate=0xFFFFFFFF → fps past int32: reported as 0
    payload[strh_at + 20 : strh_at + 28] = struct.pack("<II", 1, 0xFFFFFFFF)
    dec = decode_avi(bytes(payload))
    assert dec is not None and dec[2] == 0

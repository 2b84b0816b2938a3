"""Unit tests for the pure-numpy WAV/PCM codec (operators/audiocodec).

Mirrors test_imagecodec.py: encode→decode round-trips, chunk-walk
robustness (extra chunks, padding), corrupt-payload contract, and the
deterministic resampler's index mapping.
"""

import struct

import numpy as np
import pytest

from micromegas_spark.operators.audiocodec import (
    decode_wav,
    encode_wav,
    resample_nearest,
)


def test_roundtrip_mono():
    s = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
    rate, nch, out = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and nch == 1
    np.testing.assert_array_equal(out[:, 0], s.astype(np.int32))


def test_roundtrip_stereo_interleave():
    s = np.stack(
        [np.arange(10, dtype=np.int16), -np.arange(10, dtype=np.int16)], axis=1
    )
    rate, nch, out = decode_wav(encode_wav(s, 44100))
    assert (rate, nch) == (44100, 2)
    np.testing.assert_array_equal(out, s.astype(np.int32))


def test_extra_chunks_tolerated():
    payload = encode_wav(np.array([5, -5], dtype=np.int16), 16000)
    # splice a LIST chunk (odd length → pad byte) between fmt and data
    fmt_end = payload.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    rate, nch, out = decode_wav(spliced)
    assert rate == 16000
    np.testing.assert_array_equal(out[:, 0], [5, -5])


def test_pcm8_recentred():
    # hand-build an 8-bit PCM file: values 0..255 decode to -128..127
    data = bytes(range(256))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, nch, out = decode_wav(payload)
    assert rate == 8000 and nch == 1
    np.testing.assert_array_equal(out[:, 0], np.arange(256) - 128)


@pytest.mark.parametrize(
    "payload",
    [
        None,
        b"",
        b"RIFF\x00\x00\x00\x00AIFF",  # wrong form type
        b"not audio at all",
        encode_wav(np.array([1], dtype=np.int16), 8000)[:-1],  # truncated data
    ],
)
def test_corrupt_payloads_yield_none(payload):
    assert decode_wav(payload) is None


def test_compressed_tag_rejected():
    payload = bytearray(encode_wav(np.array([1, 2], dtype=np.int16), 8000))
    fmt_at = payload.index(b"fmt ") + 8
    payload[fmt_at : fmt_at + 2] = struct.pack("<H", 85)  # MP3 format tag
    assert decode_wav(bytes(payload)) is None


def test_resample_index_mapping():
    s = np.arange(8, dtype=np.int32)[:, None]
    down = resample_nearest(s, 8000, 4000)
    np.testing.assert_array_equal(down[:, 0], [0, 2, 4, 6])
    up = resample_nearest(s, 4000, 8000)
    assert up.shape[0] == 16
    np.testing.assert_array_equal(up[:4, 0], [0, 0, 1, 1])
    same = resample_nearest(s, 8000, 8000)
    assert same is s


def test_truncated_final_frame_dropped():
    payload = bytearray(encode_wav(np.array([[1, 2], [3, 4]], dtype=np.int16), 8000))
    # grow the declared data length by 2 bytes and append half a frame
    data_at = payload.index(b"data")
    (dlen,) = struct.unpack("<I", payload[data_at + 4 : data_at + 8])
    payload[data_at + 4 : data_at + 8] = struct.pack("<I", dlen + 2)
    payload += b"\x07\x00"
    riff_at = 4
    (rlen,) = struct.unpack("<I", payload[riff_at : riff_at + 4])
    payload[riff_at : riff_at + 4] = struct.pack("<I", rlen + 2)
    rate, nch, out = decode_wav(bytes(payload))
    assert out.shape == (2, 2)  # the dangling half-frame is dropped


from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


@settings(max_examples=50, deadline=None)
@given(
    arrays(
        np.int16,
        st.tuples(st.integers(0, 64), st.integers(1, 4)),
        elements=st.integers(-32768, 32767),
    ),
    st.sampled_from([8000, 16000, 44100]),
)
def test_roundtrip_property(samples, rate):
    dec = decode_wav(encode_wav(samples, rate))
    assert dec is not None
    r, nch, out = dec
    assert (r, nch) == (rate, samples.shape[1])
    np.testing.assert_array_equal(out, samples.astype(np.int32))


def test_insane_sample_rate_rejected():
    payload = bytearray(encode_wav(np.array([1, 2], dtype=np.int16), 8000))
    fmt_at = payload.index(b"fmt ") + 8
    payload[fmt_at + 4 : fmt_at + 8] = struct.pack("<I", 3_000_000_000)
    assert decode_wav(bytes(payload)) is None

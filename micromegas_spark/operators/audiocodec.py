"""Pure-numpy WAV/PCM audio codec — the audio analog of operators/imagecodec.

The multimodal pipeline treats audio as opaque BINARY columns (SURVEY
§1.3; the reference stores binary payloads the same way). The container
ships no audio libraries, so like the image path this implements a REAL
decoder for a real public container format with zero optional deps:
RIFF/WAVE with PCM (format tag 1) at 8 or 16 bits per sample — the
canonical uncompressed interchange format. Compressed codecs (MP3, Opus,
FLAC) stay behind the env-gated optional-dependency route, mirroring how
PIL covers compressed images.

Decode walks the RIFF chunk list (so LIST/INFO/fact chunks between `fmt `
and `data` are tolerated), returns samples as an (n_frames, n_channels)
int32 ndarray in the signed domain (8-bit unsigned PCM is recentred by
-128 per the WAV spec), and yields None for anything unrecognized —
same corrupt-blob contract as the image codec.

Everything here runs inside Arrow-batched mapInPandas stages
(operators/multimodal.audio_stats); nothing touches Spark directly.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav", "resample_nearest"]


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 PCM samples as a canonical RIFF/WAVE byte string.

    ``samples``: shape (n_frames,) or (n_frames, n_channels), any integer
    dtype fitting int16. Interleaved little-endian PCM16, the layout every
    WAV reader understands.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be 1-D or 2-D (frames, channels)")
    n_channels = arr.shape[1]
    data = arr.astype("<i2").tobytes()  # interleaved: C order over (frame, ch)
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes | None):
    """Decode a RIFF/WAVE PCM payload.

    Returns ``(sample_rate, n_channels, samples)`` with ``samples`` an
    (n_frames, n_channels) int32 array, or None if the payload is not a
    WAV this codec reads (missing chunks, compressed format tag,
    unsupported bit depth, truncated data).
    """
    if not payload or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt_info = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            return None  # truncated chunk
        if cid == b"fmt " and clen >= 16:
            fmt_info = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + clen + (clen & 1)
    if fmt_info is None or data is None:
        return None
    tag, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt_info
    # sample_rate is a uint32 on the wire; a value past int32 is not a
    # real rate and would overflow downstream Int32 stat columns —
    # corrupt-payload contract applies
    if tag != 1 or n_channels < 1 or not 1 <= sample_rate <= 0x7FFFFFFF:
        return None
    if bits == 16:
        frame_bytes = 2 * n_channels
        usable = len(data) - len(data) % frame_bytes
        samples = (
            np.frombuffer(data[:usable], dtype="<i2")
            .astype(np.int32)
            .reshape(-1, n_channels)
        )
    elif bits == 8:
        frame_bytes = n_channels
        usable = len(data) - len(data) % frame_bytes
        samples = (
            np.frombuffer(data[:usable], dtype=np.uint8).astype(np.int32) - 128
        ).reshape(-1, n_channels)
    else:
        return None
    return sample_rate, n_channels, samples


def resample_nearest(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Nearest-sample (zero-order-hold) resample — deterministic, exact
    integer index mapping so oracles can mirror it: output frame i takes
    input frame floor(i * src / dst)."""
    if src_rate == dst_rate:
        return samples
    n_in = samples.shape[0]
    n_out = max(int(n_in * dst_rate // src_rate), 1) if n_in else 0
    if n_out == 0:
        return samples[:0]
    idx = (np.arange(n_out, dtype=np.int64) * src_rate) // dst_rate
    return samples[np.minimum(idx, n_in - 1)]

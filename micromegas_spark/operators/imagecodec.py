"""Dependency-free image codec: PPM/PGM (netpbm binary) and uncompressed
BMP, in pure numpy.

Why this exists: the multimodal pipeline (operators/multimodal.py) treats
images as opaque BINARY columns decoded inside Arrow-batched mapInPandas
stages — the reference decodes image payloads in its images view the same
way (rust/analytics/src/images_table.rs). This container ships no Pillow,
which previously left only an env-gated PIL path and a deterministic fake.
Netpbm and uncompressed BMP are trivial public formats (a text header /
a fixed little-endian header + raw pixels), so a real decode path can run
ANYWHERE numpy exists: `backend="numpy"` in decode_media/resize_images is
an actual decoder, with PIL remaining the optional path for compressed
formats (JPEG/PNG).

All functions operate on bytes <-> numpy arrays; Spark never sees this
module except through the mapInPandas stages that call it per Arrow batch.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_ppm",
    "decode_image",
    "decode_image_array",
    "resize_nearest",
]


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6) bytes; (h, w) -> PGM (P5)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (h, w, 3) or (h, w), got {a.shape}")
    h, w = a.shape[0], a.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def _parse_netpbm_header(payload: bytes):
    """Return (magic, width, height, maxval, data_offset) or None.

    Netpbm headers are whitespace-separated ASCII tokens with '#' comments;
    the pixel data starts exactly one whitespace byte after maxval."""
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in b"56":
        return None
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        c = payload[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
        else:
            start = pos
            while pos < n and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(payload[start:pos])
    if len(tokens) < 3 or pos >= n:
        return None
    try:
        w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    except ValueError:
        return None
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        return None
    return payload[:2], w, h, maxval, pos + 1  # +1: single whitespace after maxval


def _parse_bmp_header(payload: bytes):
    """Uncompressed 24/32-bit BITMAPINFOHEADER BMP -> (w, h, bpp,
    data_offset, top_down) or None."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        return None
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if w <= 0 or h == 0 or compression != 0 or bpp not in (24, 32):
        return None
    return w, abs(h), bpp, data_offset, h < 0


def decode_image(payload: bytes):
    """Header-only decode: (format, width, height, channels) or None for
    unrecognized/corrupt payloads (never raises — at 100 TB some corrupt
    blobs are a certainty)."""
    try:
        hdr = _parse_netpbm_header(payload or b"")
        if hdr is not None:
            magic, w, h, _maxval, _off = hdr
            return ("ppm" if magic == b"P6" else "pgm", w, h, 3 if magic == b"P6" else 1)
        bmp = _parse_bmp_header(payload or b"")
        if bmp is not None:
            w, h, bpp, _off, _td = bmp
            # decode_image_array drops the alpha plane of 32-bpp BMPs
            # (rows[:, :, 2::-1]), so header metadata reports the channel
            # count the pixel path actually yields
            return ("bmp", w, h, min(bpp // 8, 3))
    except Exception:
        return None
    return None


def decode_image_array(payload: bytes):
    """Full pixel decode -> (h, w, c) uint8 array (c = 1 or 3; BMP rows
    un-padded and flipped bottom-up -> top-down, BGR -> RGB) or None."""
    try:
        hdr = _parse_netpbm_header(payload or b"")
        if hdr is not None:
            magic, w, h, maxval, off = hdr
            if maxval > 255:
                return None  # 16-bit netpbm: out of scope
            c = 3 if magic == b"P6" else 1
            need = w * h * c
            raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
            if raw.size < need:
                return None
            return raw.reshape(h, w, c)
        bmp = _parse_bmp_header(payload or b"")
        if bmp is not None:
            w, h, bpp, off, top_down = bmp
            c = bpp // 8
            stride = (w * c + 3) & ~3  # rows pad to 4-byte multiples
            need = stride * h
            raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
            if raw.size < need:
                return None
            rows = raw.reshape(h, stride)[:, : w * c].reshape(h, w, c)
            if not top_down:
                rows = rows[::-1]
            return rows[:, :, 2::-1] if c >= 3 else rows  # BGR(A)->RGB
    except Exception:
        return None
    return None


def resize_nearest(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps — the deterministic
    resize used by resize_images(backend='numpy'); index i maps to
    floor(i * old / new), matching the closed form oracles can mirror."""
    h, w = arr.shape[0], arr.shape[1]
    yi = (np.arange(new_h) * h) // new_h
    xi = (np.arange(new_w) * w) // new_w
    return arr[yi][:, xi]

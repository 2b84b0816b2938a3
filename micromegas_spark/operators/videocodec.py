"""Pure-numpy AVI video codec — completes the multimodal real-decode trio
(images: operators/imagecodec, audio: operators/audiocodec).

AVI is RIFF like WAV: a 'hdrl' LIST describes the streams (avih main
header, one 'strl' per stream with strh/strf), a 'movi' LIST carries the
frame chunks. This codec writes and reads the uncompressed-video subset
— 24-bit DIB frames ('00db' chunks; bottom-up BGR rows padded to 4-byte
boundaries, the classic BITMAPINFOHEADER layout) — in pure struct+numpy,
so REAL frame extraction runs in this container with zero optional deps.
Compressed codecs (MJPEG, H.264) stay behind env-gated optional
dependencies, exactly like PIL for compressed images.

Decode walks the chunk tree tolerantly (unknown chunks and LISTs are
skipped, odd sizes consume their pad byte) and returns None for anything
it doesn't read — the corrupt-blob contract shared by the image and
audio codecs. Frames come back as (h, w, 3) uint8 RGB, top-down.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_avi", "decode_avi"]


def _dib_from_frame(frame: np.ndarray) -> bytes:
    """(h, w, 3) RGB top-down → bottom-up BGR rows padded to 4 bytes."""
    h, w = frame.shape[0], frame.shape[1]
    bgr = frame[::-1, :, ::-1]  # flip rows, swap channels
    row_len = w * 3
    pad = (-row_len) % 4
    if pad:
        rows = np.zeros((h, row_len + pad), dtype=np.uint8)
        rows[:, :row_len] = bgr.reshape(h, row_len)
        return rows.tobytes()
    return np.ascontiguousarray(bgr).tobytes()


def _frame_from_dib(data: bytes, w: int, h: int) -> np.ndarray | None:
    row_len = w * 3
    stride = row_len + ((-row_len) % 4)
    if len(data) < stride * h:
        return None
    rows = np.frombuffer(data[: stride * h], dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, :row_len].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()  # back to top-down RGB


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Encode (h, w, 3) uint8 RGB frames as an uncompressed 24-bit AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one (h, w, 3) shape")
    frame_bytes = [_dib_from_frame(np.asarray(f, dtype=np.uint8)) for f in frames]
    buf_size = max(len(b) for b in frame_bytes)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        buf_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags: no AVIF_HASINDEX — this writer emits no idx1 chunk
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        buf_size,
        w,
        h,
        0, 0, 0, 0,
    )
    # AVISTREAMHEADER, 56 bytes: fccType fccHandler dwFlags wPriority
    # wLanguage dwInitialFrames dwScale dwRate dwStart dwLength
    # dwSuggestedBufferSize dwQuality dwSampleSize rcFrame[4×int16]
    strh = b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII4h",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate (rate/scale = fps)
        0,  # dwStart
        len(frames),  # dwLength (frames for video streams)
        buf_size,  # dwSuggestedBufferSize
        0xFFFFFFFF,  # dwQuality (-1 = driver default)
        0,  # dwSampleSize
        0, 0, int(w), int(h),  # rcFrame
    )
    assert len(strh) == 56
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        w,
        h,  # positive = bottom-up DIB
        1,  # biPlanes
        24,  # biBitCount
        0,  # BI_RGB
        len(frame_bytes[0]),
        0, 0, 0, 0,
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (chunk_id, list_type_or_None, body_start, body_len)."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        start = pos + 8
        if start + clen > end:
            # truncated tail: a LIST clamps so whole inner chunks are
            # salvaged; a plain chunk (partial frame) is dropped
            if cid == b"LIST" and start + 4 <= end:
                yield cid, buf[start : start + 4], start + 4, end - start - 4
            return
        if cid == b"LIST" and clen >= 4:
            yield cid, buf[start : start + 4], start + 4, clen - 4
        else:
            yield cid, None, start, clen
        pos = start + clen + (clen & 1)


def decode_avi(payload: bytes | None):
    """Decode an uncompressed 24-bit AVI.

    Returns ``(width, height, fps, frames)`` with frames a list of
    (h, w, 3) uint8 RGB arrays, or None if the payload is not an AVI
    this codec reads (no video stream header, compressed frames,
    truncated chunks)."""
    if (
        not payload
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        return None
    w = h = None
    fps = 0
    stream_idx = -1  # index of the last strh seen, in stream order
    video_stream = None  # stream index of the first DIB video stream
    await_strf = False  # next strf belongs to that stream
    frame_chunks: list[tuple[int, int]] = []

    class _Unsupported(Exception):
        pass

    def visit(pos: int, end: int):
        nonlocal w, h, fps, stream_idx, video_stream, await_strf
        for cid, ltype, start, clen in _walk_chunks(payload, pos, end):
            if cid == b"LIST":
                visit(start, start + clen)
            elif cid == b"strh" and clen >= 32:
                # stream headers appear in stream order; the strf that
                # follows belongs to THIS stream — an audio stream's
                # 40-byte WAVEFORMAT must not be misread as the
                # BITMAPINFOHEADER, so strf is bound to its strh
                stream_idx += 1
                await_strf = False
                if (
                    payload[start : start + 4] == b"vids"
                    and video_stream is None
                ):
                    if payload[start + 4 : start + 8] not in (
                        b"DIB ",
                        b"\x00\x00\x00\x00",
                    ):
                        raise _Unsupported()  # compressed video
                    video_stream = stream_idx
                    scale, rate = struct.unpack(
                        "<II", payload[start + 20 : start + 28]
                    )
                    fps = rate // scale if scale else 0
                    if fps > 0x7FFFFFFF:  # corrupt rate/scale: fps unknown
                        fps = 0
                    await_strf = True
            elif cid == b"strf":
                if await_strf:
                    if clen < 40:
                        raise _Unsupported()
                    bi = struct.unpack("<IiiHHI", payload[start : start + 20])
                    if bi[4] != 24 or bi[5] != 0:  # 24-bit BI_RGB only
                        raise _Unsupported()
                    w, h = bi[1], abs(bi[2])
                await_strf = False
            elif cid[2:4] in (b"db", b"dc"):
                frame_chunks.append((cid[:2], start, clen))

    try:
        visit(12, len(payload))
    except _Unsupported:
        return None
    if video_stream is not None:
        want = b"%02d" % video_stream
        frame_chunks = [(c, s, n) for c, s, n in frame_chunks if c == want]
    if w is None or h is None or w <= 0 or h <= 0:
        return None
    frames = []
    for _, start, clen in frame_chunks:
        f = _frame_from_dib(payload[start : start + clen], w, h)
        if f is None:
            return None
        frames.append(f)
    return w, h, fps, frames

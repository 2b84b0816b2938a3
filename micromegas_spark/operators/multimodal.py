"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The reference stores raw binary payloads and image blobs the same way
(images_table.rs; payload BinaryType, SURVEY §1.3/§1.4). For the
training-data-pipeline surface we add the decode / feature-extract /
resize / frame-sample stages a 100 TB multimodal pipeline needs.

Decode backends: ``backend='fake'`` (default) produces deterministic
pseudo-decodes from the payload bytes (stable across engines and runs —
used by the oracle-checked queries and by tests validating the Spark-side
plumbing: schema, batching, 1→N row fan-out). ``backend='pil'`` is a REAL
decoder — dims/mode/format/EXIF via Pillow, and a real downscale +
re-encode in ``resize_images`` — used when Pillow is importable on the
executors (tests are importorskip-gated); without Pillow it raises
NotImplementedError at plan-build time. ``backend='numpy'`` is a REAL
decoder with no optional deps (operators/imagecodec: PPM/PGM +
uncompressed BMP in pure numpy) — the in-container real-decode path,
differentially checked end-to-end by the media_ppm_roundtrip query.
All backends share identical mapInPandas signatures, schemas, and
partitioning, so swapping backends changes no plan shape.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


IMAGE_DETAILS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("format", StringType()),
        StructField("exif", MapType(StringType(), StringType())),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def _fake_dims(payload: bytes) -> tuple[int, int]:
    h = hashlib.md5(payload or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def _require_pil():
    try:
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError as e:
        raise NotImplementedError(
            "backend='pil' requires pillow on driver and executors; this "
            "environment ships none — use backend='fake' for plumbing tests"
        ) from e


def decode_media(df: DataFrame, backend: str = "fake") -> DataFrame:
    """Decode stage: BINARY payload → typed metadata rows. mapInPandas so a
    real decoder amortizes setup per Arrow batch, not per row.

    ``backend='pil'`` decodes REAL image bytes (width/height via Pillow;
    an undecodable payload yields NULL dims rather than failing the
    task — at 100 TB some corrupt blobs are a certainty). The reference
    decodes image payloads the same way in its images view
    (rust/analytics/src/images_table.rs).

    ``backend='numpy'`` is a REAL decoder with zero optional deps
    (operators/imagecodec): PPM/PGM and uncompressed BMP headers parsed
    in pure numpy — the in-container real-decode path; PIL stays the
    route for compressed formats. Unrecognized payloads yield NULL dims,
    same contract as the PIL path."""
    if backend == "numpy":
        from micromegas_spark.operators.imagecodec import decode_image

        def run_np(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                dims = [decode_image(p) for p in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "media_type": pdf["media_type"],
                        "width": pd.array(
                            [d[1] if d else None for d in dims], dtype="Int32"
                        ),
                        "height": pd.array(
                            [d[2] if d else None for d in dims], dtype="Int32"
                        ),
                        "n_bytes": [len(p or b"") for p in pdf["payload"]],
                        "content_hash": [
                            hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]
                        ],
                    }
                )

        return df.mapInPandas(run_np, schema=DECODED_SCHEMA)
    if backend == "pil":
        _require_pil()

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from PIL import Image

            for pdf in batches:
                widths, heights = [], []
                for p in pdf["payload"]:
                    try:
                        with Image.open(io.BytesIO(p or b"")) as im:
                            widths.append(im.width)
                            heights.append(im.height)
                    except Exception:
                        widths.append(None)
                        heights.append(None)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "media_type": pdf["media_type"],
                        "width": pd.array(widths, dtype="Int32"),
                        "height": pd.array(heights, dtype="Int32"),
                        "n_bytes": [len(p or b"") for p in pdf["payload"]],
                        "content_hash": [
                            hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]
                        ],
                    }
                )

        return df.mapInPandas(run, schema=DECODED_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "content_hash": [
                        hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def decode_image_details(df: DataFrame) -> DataFrame:
    """Rich per-image metadata (PIL only): mode, container format, and
    stringified EXIF tags — the properties the reference carries per
    image row (images_table.rs). Undecodable payloads yield NULL fields;
    EXIF is a string→string map so the schema is stable across tag
    vocabularies."""
    _require_pil()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [],
                "mode": [], "format": [], "exif": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    with Image.open(io.BytesIO(p or b"")) as im:
                        exif = {}
                        try:
                            exif = {
                                str(k): str(v) for k, v in (im.getexif() or {}).items()
                            }
                        except Exception:
                            pass
                        out["width"].append(im.width)
                        out["height"].append(im.height)
                        out["mode"].append(im.mode)
                        out["format"].append(im.format)
                        out["exif"].append(exif)
                except Exception:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mode"].append(None)
                    out["format"].append(None)
                    out["exif"].append(None)
            out["width"] = pd.array(out["width"], dtype="Int32")
            out["height"] = pd.array(out["height"], dtype="Int32")
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=IMAGE_DETAILS_SCHEMA)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stage: payload → float vector (deterministic
    pseudo-embedding from the content hash; a real model swaps in behind
    the same Arrow-batched signature). Output feeds the similarity-search
    operators (operators/similarity.py) unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                # deterministic pseudo-embedding straight from digest bytes
                # (cheaper than seeding an RNG per row); zero-centered
                raw = (hashlib.md5(p or b"").digest() * ((dim // 16) + 1))[:dim]
                v = (np.frombuffer(raw, dtype=np.uint8).astype("float32") - 127.5) / 73.9
                feats.append(v.tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, backend: str = "fake") -> DataFrame:
    """Frame-sampling stage (video): 1 row → up to n_frames rows, the
    fan-out UDF shape.

    ``backend='fake'`` slices the payload deterministically (plumbing
    stand-in). ``backend='avi'`` is REAL keyframe extraction with no
    optional deps: the pure-numpy AVI codec (operators/videocodec)
    decodes the container, picks n_frames evenly spaced frames
    (frame j = floor(j * total / n_frames)), and re-encodes each as PPM
    (operators/imagecodec) so downstream image stages — pixel_stats,
    resize — consume sampled frames unchanged. Undecodable payloads
    yield zero rows, the skip-corrupt contract."""
    if backend == "avi":
        from micromegas_spark.operators.imagecodec import encode_ppm
        from micromegas_spark.operators.videocodec import decode_avi

        def run_avi(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"media_id": [], "frame_idx": [], "frame_payload": []}
                for mid, mtype, p in zip(
                    pdf["media_id"], pdf["media_type"], pdf["payload"]
                ):
                    if mtype != "video":
                        continue
                    dec = decode_avi(bytes(p) if p is not None else None)
                    if dec is None or not dec[3]:
                        continue
                    frames = dec[3]
                    take = min(n_frames, len(frames))
                    for j in range(take):
                        fi = j * len(frames) // take
                        out["media_id"].append(mid)
                        out["frame_idx"].append(fi)
                        out["frame_payload"].append(encode_ppm(frames[fi]))
                yield pd.DataFrame(out)

        return df.mapInPandas(run_avi, schema=FRAMES_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, mtype, p in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                if mtype != "video":
                    continue
                p = p or b""
                step = max(len(p) // n_frames, 1)
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(p[i * step : (i + 1) * step])
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def video_stats(df: DataFrame) -> DataFrame:
    """Frame-level video statistics through the REAL numpy AVI decoder
    (operators/videocodec): per decodable payload the frame count, dims,
    fps, exact mean pixel value, and an order-weighted checksum
    Σ v·(idx+1) over the flattened (frame, row, col, channel) order —
    the stat that catches a row-flip or BGR/RGB swap a plain mean would
    forgive. NULL stats for unrecognized bytes. Arrow-batched
    mapInPandas, map-side only — no shuffle."""
    from pyspark.sql.types import DoubleType

    from micromegas_spark.operators.videocodec import decode_avi

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("n_frames", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("fps", IntegerType()),
            StructField("mean_px", DoubleType()),
            StructField("weighted_px", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in (
                "media_id", "n_frames", "width", "height", "fps",
                "mean_px", "weighted_px",
            )}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                cols["media_id"].append(mid)
                dec = decode_avi(bytes(p) if p is not None else None)
                if dec is None or not dec[3]:
                    for k in ("n_frames", "width", "height", "fps",
                              "mean_px", "weighted_px"):
                        cols[k].append(None)
                    continue
                w, h, fps, frames = dec
                flat = np.concatenate([f.reshape(-1) for f in frames]).astype(np.int64)
                cols["n_frames"].append(len(frames))
                cols["width"].append(w)
                cols["height"].append(h)
                cols["fps"].append(fps)
                # integer sum < 2^53: exact in float64, oracle's AVG
                # matches; floor-truncate (see audio_stats) — the exact
                # rational mean can land on a half-ulp of the 6th decimal
                # where Python and SQL rounding modes diverge
                cols["mean_px"].append(
                    math.floor(float(flat.sum() / flat.size) * 1e6) / 1e6
                )
                cols["weighted_px"].append(
                    int((flat * (np.arange(flat.size, dtype=np.int64) + 1)).sum())
                )
            for k, dt in (("n_frames", "Int32"), ("width", "Int32"),
                          ("height", "Int32"), ("fps", "Int32"),
                          ("weighted_px", "Int64")):
                cols[k] = pd.array(cols[k], dtype=dt)
            yield pd.DataFrame(cols)

    return df.mapInPandas(run, schema=schema)


def images_view(media: DataFrame, processes: DataFrame | None = None) -> DataFrame:
    """The reference's `images` view shape (images_table.rs; SURVEY §1.4):
    binary image payloads with decoded metadata, optionally enriched with
    process identity. Media rows with media_type='image' only."""
    imgs = media.where(F.col("media_type") == "image")
    decoded = decode_media(imgs).drop("media_type")
    out = imgs.select("media_id", "payload", "metadata").join(decoded, "media_id")
    if processes is not None:
        out = out.join(
            F.broadcast(processes.select("process_id", "exe")),
            F.element_at(F.col("metadata"), "process_id") == F.col("process_id"),
            "left",
        )
    return out


def resize_images(df: DataFrame, max_side: int = 256, backend: str = "fake") -> DataFrame:
    """Resize stage. ``backend='fake'``: metadata-only scale computation,
    derived columns added JVM-side (the plumbing demo for this
    container). ``backend='pil'``: REAL downscale — payloads whose longest
    side exceeds ``max_side`` are thumbnailed (aspect-preserving, PIL
    LANCZOS) and re-encoded as PNG inside the Arrow batch; already-small
    or undecodable payloads pass through unchanged. One Python crossing,
    no shuffle: a map-side stage either way.

    ``backend='numpy'``: REAL aspect-preserving nearest-neighbor downscale
    for PPM/PGM/BMP payloads (operators/imagecodec, no optional deps),
    re-encoded as PPM/PGM; new dims use the same floor-scale formula as
    the fake path so oracles mirror them."""
    if backend == "numpy":
        from micromegas_spark.operators.imagecodec import (
            decode_image_array,
            encode_ppm,
            resize_nearest,
        )

        def run_np(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"media_id": [], "new_width": [], "new_height": [], "payload": []}
                for mid, p in zip(pdf["media_id"], pdf["payload"]):
                    out["media_id"].append(mid)
                    arr = decode_image_array(p)
                    if arr is None:
                        out["new_width"].append(None)
                        out["new_height"].append(None)
                        out["payload"].append(p)
                        continue
                    h, w = arr.shape[0], arr.shape[1]
                    if max(h, w) > max_side:
                        scale = max_side / max(h, w)
                        nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                        arr = resize_nearest(arr, nw, nh)
                        sq = arr[:, :, 0] if arr.shape[2] == 1 else arr
                        out["payload"].append(encode_ppm(sq))
                        out["new_width"].append(nw)
                        out["new_height"].append(nh)
                    else:
                        out["payload"].append(p)
                        out["new_width"].append(w)
                        out["new_height"].append(h)
                out["new_width"] = pd.array(out["new_width"], dtype="Int32")
                out["new_height"] = pd.array(out["new_height"], dtype="Int32")
                yield pd.DataFrame(out)

        return df.mapInPandas(run_np, schema=RESIZED_SCHEMA)
    if backend == "pil":
        _require_pil()

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from PIL import Image

            for pdf in batches:
                out = {"media_id": [], "new_width": [], "new_height": [], "payload": []}
                for mid, p in zip(pdf["media_id"], pdf["payload"]):
                    out["media_id"].append(mid)
                    try:
                        with Image.open(io.BytesIO(p or b"")) as im:
                            if max(im.size) > max_side:
                                im.thumbnail((max_side, max_side), Image.LANCZOS)
                                buf = io.BytesIO()
                                im.save(buf, format="PNG")
                                out["payload"].append(buf.getvalue())
                            else:
                                out["payload"].append(p)
                            out["new_width"].append(im.width)
                            out["new_height"].append(im.height)
                    except Exception:
                        out["new_width"].append(None)
                        out["new_height"].append(None)
                        out["payload"].append(p)
                out["new_width"] = pd.array(out["new_width"], dtype="Int32")
                out["new_height"] = pd.array(out["new_height"], dtype="Int32")
                yield pd.DataFrame(out)

        return df.mapInPandas(run, schema=RESIZED_SCHEMA)

    decoded = decode_media(df)
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return decoded.select(
        "media_id",
        "width",
        "height",
        scale.alias("scale"),
        F.floor(F.col("width") * scale).cast("int").alias("new_width"),
        F.floor(F.col("height") * scale).cast("int").alias("new_height"),
    )


def audio_stats(df: DataFrame, silence_threshold: int = 64) -> DataFrame:
    """Sample-level audio statistics through the REAL numpy WAV decoder
    (operators/audiocodec): per decodable payload the sample rate, channel
    count, frame count, duration, RMS amplitude, peak, and silence ratio
    (fraction of frames whose max channel magnitude is below
    ``silence_threshold``). NULL stats for unrecognized bytes. Like
    pixel_stats this is the stage that proves decode is real — RMS and
    the silence ratio depend on every sample byte, so one wrong header
    offset, endianness, or interleave order fails the differential
    oracle. Arrow-batched mapInPandas, map-side only — no shuffle."""
    from pyspark.sql.types import DoubleType

    from micromegas_spark.operators.audiocodec import decode_wav

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_channels", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("duration_ms", LongType()),
            StructField("rms", DoubleType()),
            StructField("peak", IntegerType()),
            StructField("silence_ratio", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "n_frames",
                "duration_ms", "rms", "peak", "silence_ratio",
            )}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                cols["media_id"].append(mid)
                dec = decode_wav(bytes(p) if p is not None else None)
                if dec is None or dec[2].shape[0] == 0:
                    for k in ("sample_rate", "n_channels", "n_frames",
                              "duration_ms", "rms", "peak", "silence_ratio"):
                        cols[k].append(None)
                    continue
                rate, nch, s = dec
                n = s.shape[0]
                # sum of squares in int64 stays exact; < 2^53 so the
                # float64 mean (and the oracle's AVG) reproduce it exactly
                sumsq = int((s.astype(np.int64) ** 2).sum())
                peak = int(np.abs(s).max())
                frame_peak = np.abs(s).max(axis=1)
                silent = int((frame_peak < silence_threshold).sum())
                cols["sample_rate"].append(rate)
                cols["n_channels"].append(nch)
                cols["n_frames"].append(n)
                cols["duration_ms"].append(n * 1000 // rate)
                cols["rms"].append(round(float(np.sqrt(sumsq / (n * nch))), 6))
                cols["peak"].append(peak)
                # floor-truncate, not round(): silent/n is an exact small
                # rational and CAN land exactly on a half-ulp of the 6th
                # decimal (10/256 = 0.0390625 does), where Python's
                # banker's rounding and SQL's half-away-from-zero diverge;
                # floor of the identical IEEE product is tie-free
                cols["silence_ratio"].append(
                    math.floor(silent / n * 1e6) / 1e6
                )
            for k, dt in (("sample_rate", "Int32"), ("n_channels", "Int32"),
                          ("n_frames", "Int64"), ("duration_ms", "Int64"),
                          ("peak", "Int32")):
                cols[k] = pd.array(cols[k], dtype=dt)
            yield pd.DataFrame(cols)

    return df.mapInPandas(run, schema=schema)


def pixel_stats(df: DataFrame) -> DataFrame:
    """Pixel-level statistics through the REAL numpy decoder
    (operators/imagecodec): (media_id, width, height, n_px, mean_px) per
    decodable payload — NULL stats for unrecognized bytes. The stage that
    proves decode is real: the stats depend on every pixel byte, so a
    single wrong stride/offset/channel-order in the codec fails the
    differential oracle. Arrow-batched mapInPandas, map-side only."""
    from pyspark.sql.types import DoubleType

    from micromegas_spark.operators.imagecodec import decode_image_array

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_px", LongType()),
            StructField("mean_px", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_px": [], "mean_px": []}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                arr = decode_image_array(p)
                if arr is None:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_px"].append(None)
                    out["mean_px"].append(None)
                else:
                    out["width"].append(arr.shape[1])
                    out["height"].append(arr.shape[0])
                    out["n_px"].append(int(arr.size))
                    # exact in float64 (sum < 2^53), so the oracle's AVG
                    # reproduces it bit-for-bit; floor-truncate (see
                    # audio_stats) because the exact rational mean can tie
                    # at the 6th decimal where rounding modes diverge
                    out["mean_px"].append(
                        math.floor(float(arr.astype("int64").mean()) * 1e6) / 1e6
                    )
            out["width"] = pd.array(out["width"], dtype="Int32")
            out["height"] = pd.array(out["height"], dtype="Int32")
            out["n_px"] = pd.array(out["n_px"], dtype="Int64")
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=schema)

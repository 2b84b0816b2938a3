"""Micro-bench for the native-transit block decode — the one genuinely hot
Python decode path this repo owns. Mirrors the reference's parse_block
bench (rust/analytics/benches/parse_block.rs:1-30: a block of log entries,
timed end-to-end through fetch_block_payload+parse), re-shaped for the two
layers here:

1. ``decode_block_payload`` — the single-process inner loop (CBOR envelope
   → lz4-frame → dependency map → object stream), blocks/s, objects/s and
   payload MB/s per core.
2. ``parse_transit_blocks`` — the Spark mapInPandas surface over N blocks,
   wall-clock rows/s on local[$SPARK_GRAFT_CPUS].

Each block holds OBJECTS_PER_BLOCK LogStringEventV2 entries (the dominant
real event type: desc ref + time + dynamic utf-8 message), matching the
reference bench's log-entry payloads. Prints ONE JSON line; also reports
which lz4/xxh32 implementation ran (native wheels vs the pure-python spec
fallback), since that is the variable the bench exists to measure.

Usage: python scripts/bench_transit_decode.py [--blocks N] [--spark]
"""

from __future__ import annotations

import argparse
import json
import struct
import time

from micromegas_spark.sources.transit import (
    Member,
    UserDefinedType,
    _lz4frame,
    decode_block_payload,
    encode_block_payload,
    udts_to_cbor,
)

OBJECTS_PER_BLOCK = 4096

UDTS = [
    UserDefinedType("StaticString", 0),
    UserDefinedType(
        "LogDesc",
        20,
        [
            Member("id", "u64", 0, 8, False),
            Member("fmt", "ref", 8, 8, True),
            Member("line", "u32", 16, 4, False),
        ],
    ),
    UserDefinedType("LogStringEventV2", 0),
]


def _dyn(idx: int, body: bytes) -> bytes:
    return bytes([idx]) + struct.pack("<I", len(body)) + body


def build_block(n_objects: int = OBJECTS_PER_BLOCK) -> bytes:
    deps = _dyn(0, struct.pack("<Q", 42) + b"src/bench.rs")
    deps += bytes([1]) + struct.pack("<QQI", 7, 42, 33)  # LogDesc id=7
    msg = "benchmark log line with some payload text".encode("utf-8")
    one = _dyn(
        2,
        struct.pack("<Qq", 7, 0)
        + bytes([2])
        + struct.pack("<I", len(msg))
        + msg,
    )
    return encode_block_payload(deps, one * n_objects)


POD_UDTS = [
    UserDefinedType("StaticString", 0),
    UserDefinedType(
        "MeasureEvent",
        24,
        [
            Member("etype", "ref", 0, 8, True),
            Member("time", "i64", 8, 8, False),
            Member("value", "f64", 16, 8, False),
        ],
    ),
]


def build_pod_block(n_objects: int = OBJECTS_PER_BLOCK) -> bytes:
    """The metrics shape: one long run of a fixed-size MeasureEvent POD —
    the case the numpy run decoder (_decode_pod_run) vectorizes."""
    deps = _dyn(0, struct.pack("<Q", 9) + b"frame_time")
    one = bytes([1]) + struct.pack("<Qqd", 9, 0, 16.6)
    return encode_block_payload(deps, one * n_objects)


def bench_inner_loop(payload: bytes, udts=None, min_seconds: float = 2.0) -> dict:
    udts = udts or UDTS
    n_blocks = 0
    n_objects = 0
    t0 = time.perf_counter()
    while True:
        objs = decode_block_payload(payload, udts, udts)
        n_objects += len(objs)
        n_blocks += 1
        dt = time.perf_counter() - t0
        if dt >= min_seconds:
            break
    return {
        "blocks_per_sec": round(n_blocks / dt, 3),
        "objects_per_sec": round(n_objects / dt),
        "payload_mb_per_sec": round(n_blocks * len(payload) / dt / 2**20, 3),
        "objects_per_block": n_objects // n_blocks,
        "payload_bytes": len(payload),
    }


def bench_spark(payload: bytes, n_blocks: int) -> dict:
    from micromegas_spark.session import get_spark
    from micromegas_spark.sources.transit import parse_transit_blocks

    spark = get_spark()
    meta = udts_to_cbor(UDTS)
    rows = [(f"blk{i:05d}", bytearray(payload), bytearray(meta), bytearray(meta))
            for i in range(n_blocks)]
    df = spark.createDataFrame(
        rows,
        "block_id STRING, payload BINARY, dependencies_metadata BINARY, "
        "objects_metadata BINARY",
    ).repartition(spark.sparkContext.defaultParallelism)
    parse_transit_blocks(df).count()  # warm (JVM+Arrow spin-up excluded)
    t0 = time.perf_counter()
    n_rows = parse_transit_blocks(df).count()
    dt = time.perf_counter() - t0
    return {
        "spark_blocks": n_blocks,
        "spark_rows": n_rows,
        "spark_wall_sec": round(dt, 3),
        "spark_rows_per_sec": round(n_rows / dt),
        "spark_blocks_per_sec": round(n_blocks / dt, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--spark", action="store_true")
    ap.add_argument("--pod", action="store_true",
                    help="also bench the fixed-size MeasureEvent run shape "
                         "(vectorized vs scalar within the same run)")
    args = ap.parse_args()
    from micromegas_spark.sources import transit as _T

    payload = build_block()
    out = {
        "bench": "transit_decode",
        "lz4_impl": "native" if _lz4frame is not None else "pure-python",
        **bench_inner_loop(payload),
    }
    if args.pod:
        pod_payload = build_pod_block()
        pod = bench_inner_loop(pod_payload, POD_UDTS)
        out.update({f"pod_{k}": v for k, v in pod.items()})
        _T.VECTORIZE_POD_RUNS = False
        try:
            scalar = bench_inner_loop(pod_payload, POD_UDTS)
        finally:
            _T.VECTORIZE_POD_RUNS = True
        out["pod_scalar_objects_per_sec"] = scalar["objects_per_sec"]
        out["pod_vector_speedup"] = round(
            pod["objects_per_sec"] / scalar["objects_per_sec"], 2
        )
    if args.spark:
        out.update(bench_spark(payload, args.blocks))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

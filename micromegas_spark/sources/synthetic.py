"""Deterministic synthetic telemetry generator — the analogue of the
reference's `telemetry-generator` used by its Python e2e suite
(python/micromegas/tests/test_utils.py:1-30). Produces the reference's
metadata + event world (FIXTURES.md shapes):

    processes ← streams ← blocks ← {log_entries | measures | thread events}

Used by tests and by the Lakehouse demo pipeline; everything is seeded and
pure-Python so the same rows can be rebuilt anywhere.
"""

from __future__ import annotations

import random
import uuid
from datetime import datetime, timedelta, timezone

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

LEVELS = [1, 2, 3, 4, 5, 6]
LEVEL_WEIGHTS = [0.001, 0.02, 0.08, 0.6, 0.2, 0.099]
TARGETS = [f"module::{c}" for c in "abcdefghij"]
METRIC_NAMES = [("cpu_usage", "%"), ("memory_rss", "B"), ("frame_time", "ms"), ("queue_len", "1")]


def _uuid(rng: random.Random) -> str:
    return str(uuid.UUID(int=rng.getrandbits(128)))


def generate(
    seed: int = 42,
    n_processes: int = 4,
    streams_per_process: int = 3,
    blocks_per_stream: int = 5,
    events_per_block: int = 40,
    window_hours: int = 4,
) -> dict[str, list[dict]]:
    """Returns dict of row-lists: processes, streams, blocks, log_entries,
    measures. Timestamps are epoch-ns BIGINTs (ns-native like the
    reference); insert_time trails event time by seconds, with ~5% of
    blocks arriving late (minutes) to exercise insert-vs-event-time
    semantics (SURVEY §2.9)."""
    rng = random.Random(seed)
    t0 = int(EPOCH.timestamp() * 1e9)
    window_ns = window_hours * 3600 * int(1e9)

    processes, streams, blocks = [], [], []
    log_entries, measures = [], []

    for pi in range(n_processes):
        process_id = _uuid(rng)
        start = t0 + rng.randint(0, window_ns // 4)
        exe = rng.choice(["game-client", "analytics-srv", "web-srv"])
        processes.append(
            {
                "process_id": process_id,
                "exe": exe,
                "username": f"user{pi % 3}",
                "computer": f"host{pi % 2}",
                "start_time_ns": start,
                "insert_time_ns": start + rng.randint(0, int(5e9)),
                "properties": {"env": rng.choice(["production", "staging"]), "build-version": f"1.{pi}"},
            }
        )
        for si in range(streams_per_process):
            stream_id = _uuid(rng)
            tags = ["log"] if si == 0 else (["metrics"] if si == 1 else ["cpu"])
            streams.append(
                {
                    "stream_id": stream_id,
                    "process_id": process_id,
                    "tags": tags,
                    "properties": {"thread-name": f"t{si}"} if "cpu" in tags else {},
                    "insert_time_ns": start,
                }
            )
            t = start
            offset = 0
            for bi in range(blocks_per_stream):
                block_id = _uuid(rng)
                begin = t
                n_obj = events_per_block + rng.randint(-5, 5)
                dur = rng.randint(int(30e9), int(120e9))
                end = begin + dur
                late = rng.random() < 0.05
                insert = end + (rng.randint(300, 3600) if late else rng.randint(0, 10)) * int(1e9)
                blocks.append(
                    {
                        "block_id": block_id,
                        "stream_id": stream_id,
                        "process_id": process_id,
                        "begin_time_ns": begin,
                        "end_time_ns": end,
                        "nb_objects": n_obj,
                        "object_offset": offset,
                        "payload_size": 64 * n_obj,
                        "insert_time_ns": insert,
                    }
                )
                offset += n_obj
                if "log" in tags:
                    for _ in range(n_obj):
                        et = rng.randint(begin, end)
                        lvl = rng.choices(LEVELS, LEVEL_WEIGHTS)[0]
                        log_entries.append(
                            {
                                "process_id": process_id,
                                "stream_id": stream_id,
                                "block_id": block_id,
                                "time_ns": et,
                                "insert_time_ns": insert,
                                "level": lvl,
                                "target": rng.choice(TARGETS),
                                "msg": f"event {rng.randint(0, 999)}",
                                "properties": (
                                    {"error_code": str(rng.randint(1, 20))} if lvl <= 2 else {}
                                ),
                            }
                        )
                elif "metrics" in tags:
                    for k in range(n_obj):
                        name, unit = METRIC_NAMES[k % len(METRIC_NAMES)]
                        measures.append(
                            {
                                "process_id": process_id,
                                "stream_id": stream_id,
                                "block_id": block_id,
                                "time_ns": begin + (dur * k) // max(n_obj, 1),
                                "insert_time_ns": insert,
                                "name": name,
                                "unit": unit,
                                "value": round(rng.uniform(0, 100), 3),
                            }
                        )
                t = end
    return {
        "processes": processes,
        "streams": streams,
        "blocks": blocks,
        "log_entries": log_entries,
        "measures": measures,
    }

"""Measure registry queries at a scale dir: wall seconds, result rows,
and peak scratch-disk draw (the shared volume also holds Spark shuffle
spill, so the draw is measured as start_free - min_free during the run).

This is the committed form of the ad-hoc timing used for the sf5/sf10
rows in SCALE.md (count-only runs: pair-output queries are counted, not
collected — a 10^8-row pair stream has no business on the driver; the
count is also the cross-run correctness check, since re-measures at the
same corpus must reproduce it exactly).

Usage:
    SPARK_DRIVER_MEMORY=64g python scripts/measure_scale.py /tmp/sf30 \
        docs_ngram_jaccard docs_containment_dups ...

Prints one JSON line per query:
    {"query": ..., "sf_dir": ..., "rows": N, "wall_sec": W,
     "peak_scratch_gb": G}

Run scale steps with SPARK_DRIVER_MEMORY=64g (sf>=5) per the SCALE.md
runbook — the 8g default GC-thrashes under 32 concurrent tasks.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class DiskMonitor:
    """Samples free bytes on the scratch volume twice a second; the draw
    is start_free - min_free (robust to other tenants only insofar as the
    box is quiet — same caveat as every number on this shared volume)."""

    def __init__(self, path: str = "/tmp"):
        self.path = path
        self.start_free = self._free()
        self.min_free = self.start_free
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _free(self) -> int:
        st = os.statvfs(self.path)
        return st.f_bavail * st.f_frsize

    def _run(self) -> None:
        while not self._stop.wait(0.5):
            self.min_free = min(self.min_free, self._free())

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(2)

    @property
    def peak_draw_gb(self) -> float:
        return round((self.start_free - self.min_free) / 1e9, 1)


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        print("usage: measure_scale.py SF_DIR QUERY [QUERY ...]", file=sys.stderr)
        return 2

    from micromegas_spark.queries import REGISTRY
    from micromegas_spark.session import get_spark

    spark = get_spark("measure-scale")
    for name in names:
        fn = REGISTRY[name].spark
        with DiskMonitor() as mon:
            t0 = time.monotonic()
            rows = fn(spark, sf_dir).count()
            wall = round(time.monotonic() - t0, 1)
        print(json.dumps({
            "query": name,
            "sf_dir": sf_dir,
            "rows": rows,
            "wall_sec": wall,
            "peak_scratch_gb": mon.peak_draw_gb,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

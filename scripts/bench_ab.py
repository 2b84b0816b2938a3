"""Controlled same-box bench A/B vs the previous round's snapshot
(VERDICT r8 #5, making round 8's one-off protocol permanent).

Cross-round wall-clock comparisons on this shared box are unreliable —
round 8 measured the SAME round-7 commit at 1.148x its committed numbers
purely from box state (SCALE.md "Bench-noise control"). This script
replays the previous end-of-round snapshot in a detached git worktree
and runs BOTH benches back-to-back in one session, so the ratio between
them is a same-box measurement. The result lands in BENCH_AB.json at
the repo root; bench.py folds `same_box_median_ratio` into its compact
stdout line (and BENCH_full.json) while the A/B is fresh (<48 h), so the
driver's BENCH_r{N}.json carries its own noise control.

Usage:
    python scripts/bench_ab.py [--ref <commit>] [--sf-dir DIR] [--cpus N]

Default --ref: the most recent commit whose subject matches
"round N: end-of-round snapshot".
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKTREE = "/tmp/bench_ab_prev"


def _git(*args: str, cwd: str = REPO) -> str:
    return subprocess.run(
        ["git", *args], cwd=cwd, check=True, capture_output=True, text=True
    ).stdout.strip()


def _run_bench(tree: str, env_extra: dict) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, env=env,
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench in {tree} failed rc={proc.returncode}: {proc.stderr[-500:]}"
        )
    with open(os.path.join(tree, "BENCH_full.json")) as f:
        return json.load(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default=None,
                    help="previous-round commit (default: latest "
                         "'end-of-round snapshot' commit)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--rounds", type=int, default=1,
                    help="alternations of the two arms; per-query min "
                         "per arm (storm robustness)")
    args = ap.parse_args()

    # Subject-anchored: --grep matches the full message, and round-9
    # commits MENTION the snapshot convention in their bodies, which made
    # the unanchored pattern resolve to a same-round commit instead of
    # the previous round's snapshot.
    ref = args.ref or _git(
        "log", "-E", "--grep", r"^round [0-9]+: end-of-round snapshot",
        "-n", "1", "--format=%H",
    )
    if not ref:
        print("no end-of-round snapshot commit found; pass --ref", file=sys.stderr)
        return 2
    short = _git("rev-parse", "--short", ref)
    print(f"A/B: HEAD vs {short} at {args.sf_dir}", flush=True)

    # fresh detached worktree for the previous round's code
    subprocess.run(["git", "worktree", "remove", "--force", WORKTREE],
                   cwd=REPO, capture_output=True)
    _git("worktree", "add", "--detach", WORKTREE, ref)
    env_extra = {"SPARK_GRAFT_SF_DIR": args.sf_dir,
                 "SPARK_GRAFT_CPUS": str(args.cpus)}
    try:
        # prev first, then current — same order every round so any
        # warmup asymmetry (page cache on the parquet inputs) biases the
        # SAME direction each time. --rounds N alternates the arms N
        # times and keeps each query's MIN per arm: this box's invisible
        # co-tenant storms last minutes and poison whole stretches of a
        # single run (measured: untouched scan-agg queries at 6.5x in
        # one arm); the per-arm min over alternated runs needs a storm
        # to cover the SAME query in BOTH of an arm's runs to survive.
        prev = _run_bench(WORKTREE, env_extra)
        cur = _run_bench(REPO, env_extra)
        for _ in range(args.rounds - 1):
            p2 = _run_bench(WORKTREE, env_extra)
            c2 = _run_bench(REPO, env_extra)
            for q, v in p2["queries"].items():
                if q in prev["queries"]:
                    prev["queries"][q] = min(prev["queries"][q], v)
            for q, v in c2["queries"].items():
                if q in cur["queries"]:
                    cur["queries"][q] = min(cur["queries"][q], v)
            prev["value"] = round(sum(prev["queries"].values()), 4)
            cur["value"] = round(sum(cur["queries"].values()), 4)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", WORKTREE],
                       cwd=REPO, capture_output=True)

    common = sorted(set(prev["queries"]) & set(cur["queries"]))
    # full per-query ratio vector (VERDICT r10 #2): median+worst alone
    # can't attribute a flagged committed number to load vs code later —
    # the vector lets any query's same-box ratio be looked up after the
    # fact
    ratios = {
        q: round(cur["queries"][q] / prev["queries"][q], 3)
        for q in common
        if prev["queries"][q] > 0
    }
    median_ratio = (
        round(statistics.median(ratios.values()), 3) if ratios else None
    )
    worst = max(ratios, key=ratios.get) if ratios else None

    out = {
        "prev_ref": short,
        "prev_total_sec": prev["value"],
        "cur_total_sec": cur["value"],
        "n_common": len(common),
        "same_box_median_ratio": median_ratio,
        "worst_query": worst,
        "worst_ratio": ratios.get(worst) if worst else None,
        "ratios": ratios,
        "sf_dir": args.sf_dir,
        "ts": time.time(),
    }
    with open(os.path.join(REPO, "BENCH_AB.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())

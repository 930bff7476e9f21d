#!/usr/bin/env python
"""Quiet-gated N-vs-4N scaling collection on a shared host.

Interleaves single timed link runs at the two parallelism levels, but
GATES each run on ambient load (1-min loadavg below --quiet) so co-tenant
bursts don't pollute the measurement; each run's before/after load is
recorded so polluted runs are identifiable afterward. Appends one JSON
line per run to --out. min-per-level over clean runs is the engine's
number (throughput is a property of the engine, not the neighbors).

Usage: python tools/scaling_collect.py <pages_dir> [--levels 2,8]
       [--repeats 3] [--quiet 2.5] [--out /tmp/scaling_runs.jsonl]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def wait_quiet(thresh: float, poll: int = 45, max_wait: int = 2400) -> bool:
    waited = 0
    streak = 0
    while waited < max_wait:
        if load1() < thresh:
            streak += 1
            if streak >= 2:
                return True
        else:
            streak = 0
        time.sleep(poll)
        waited += poll
    return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pages_dir")
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--quiet", type=float, default=2.5)
    ap.add_argument("--out", default="/tmp/scaling_runs.jsonl")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    for rep in range(args.repeats):
        for cores in levels:
            ok = wait_quiet(args.quiet)
            print(
                f"rep {rep} cores {cores}: quiet={ok} load={load1()}",
                file=sys.stderr,
                flush=True,
            )
            r = subprocess.run(
                [
                    sys.executable,
                    os.path.join(REPO, "tools", "scaling_run.py"),
                    str(cores),
                    args.pages_dir,
                ],
                capture_output=True,
                text=True,
            )
            line = (r.stdout.strip().splitlines() or [""])[-1]
            if line:
                with open(args.out, "a") as f:
                    f.write(line + "\n")
                print(line, file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Run bench.py wrapped in /proc/stat steal measurement.

The bench host is a VM that can lose up to ~40% of busy-time CPU cycles
to hypervisor steal while loadavg sits near zero, so loadavg does NOT
predict capture quality (protocol derived in round 14, seven-capture
steal table in OPTIMIZATION_r14.md). This helper makes the protocol
reusable:

    python plans/steal_bench.py [--out plans/r15/bench_X.json] [--cpus N]

It records /proc/stat before and after the run, computes steal as a
percentage of busy (non-idle) ticks across the run, injects
``steal_pct_busy`` into the bench JSON, and writes the annotated
capture to --out (bench.py still writes BENCH_LOCAL.json itself —
restore the committed capture afterwards if this was an experiment).

Keep the capture only if steal < ~2% of busy; otherwise rerun.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_ticks() -> list[int]:
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu "):
                return [int(x) for x in line.split()[1:]]
    raise RuntimeError("no cpu line in /proc/stat")


def steal_pct_busy(before: list[int], after: list[int]) -> float:
    d = [a - b for a, b in zip(after, before)]
    total = sum(d)
    idle = d[3] + d[4]  # idle + iowait
    steal = d[7] if len(d) > 7 else 0
    busy = total - idle
    return 100.0 * steal / busy if busy > 0 else 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="annotated capture path")
    ap.add_argument("--cpus", default=None, help="override SPARK_GRAFT_CPUS")
    args = ap.parse_args()

    env = dict(os.environ)
    if args.cpus:
        env["SPARK_GRAFT_CPUS"] = str(args.cpus)

    before = cpu_ticks()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    after = cpu_ticks()
    pct = steal_pct_busy(before, after)

    sys.stderr.write(proc.stderr)
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    if proc.returncode != 0 or not line:
        print(f"bench failed rc={proc.returncode}", file=sys.stderr)
        return proc.returncode or 1
    payload = json.loads(line)
    payload["steal_pct_busy"] = round(pct, 2)
    out = json.dumps(payload)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    print(out)
    print(
        f"steal={pct:.2f}% of busy "
        f"({'KEEP' if pct < 2.0 else 'RERUN — noisy'})",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Run ``bench.py --scaling`` N times, each gated on a genuinely idle host.

This sandbox host shows intermittent EXTERNAL load spikes (loadavg 17+
with nothing of ours running) that steal cores mid-child and corrupt the
8-vs-32 efficiency ratio (see BASELINE.md methodology note). Each trial
here waits for loadavg < ``--max-load`` sustained over ``--settle`` seconds
before launching, then appends the result JSON to ``--out``.

Usage: python scripts/scaling_batch.py [--n 3] [--out /tmp/scaling_batch.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def wait_idle(max_load: float, settle: int, timeout: int) -> bool:
    """True once loadavg stays < max_load for ``settle`` consecutive seconds."""
    quiet_since = None
    start = time.time()
    while time.time() - start < timeout:
        la = loadavg()
        if la < max_load:
            if quiet_since is None:
                quiet_since = time.time()
            elif time.time() - quiet_since >= settle:
                return True
        else:
            quiet_since = None
        time.sleep(10)
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--out", default="/tmp/scaling_batch.jsonl")
    ap.add_argument("--max-load", type=float, default=1.5)
    ap.add_argument("--settle", type=int, default=30)
    ap.add_argument("--timeout", type=int, default=1800, help="per-trial idle wait cap")
    args = ap.parse_args()

    for i in range(args.n):
        idle = wait_idle(args.max_load, args.settle, args.timeout)
        rec = {"trial": i, "idle_gate_met": idle, "loadavg_at_start": loadavg()}
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "bench.py", "--scaling"],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        rec["wall_sec"] = round(time.time() - t0, 1)
        if proc.returncode == 0 and proc.stdout.strip():
            rec["result"] = json.loads(proc.stdout.strip().splitlines()[-1])
        else:
            rec["error"] = proc.stderr[-1500:]
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec.get("result", rec)), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

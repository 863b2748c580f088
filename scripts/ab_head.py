"""Steal-annotated A/B runner for single bench heads (r16 tool).

Runs ``bench.py --one <head>`` N times (cold JVM each, bench
discipline) and prints wall / tree-CPU / host-steal-cores per rep —
so an optimization A/B is adjudicated the way the bench parent
adjudicates its reps, instead of being fooled by the sandbox's
intermittent hypervisor steal.

Usage: python scripts/ab_head.py <head> [reps=3]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    head = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if bench._head_has_setup(head):
        bench._run_prepare_child(head)
    for _ in range(reps):
        pre = bench._host_stat_ticks()
        w0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(bench.__file__), "--one", head],
            capture_output=True,
            text=True,
            timeout=900,
        )
        wall = time.time() - w0
        interf = bench._interference_cores(pre, bench._host_stat_ticks(), wall)
        line = [l for l in proc.stdout.splitlines() if l.startswith('{"query"')]
        rec = json.loads(line[-1]) if line else {"err": proc.stderr[-300:]}
        rec["steal_cores"], rec["iowait_cores"] = interf or (None, None)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

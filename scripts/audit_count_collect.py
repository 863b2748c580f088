"""Count-vs-collect materialization audit at bench scale (r9 verdict
task #1).

Through round 8 the bench harness materialized each head with
``count()``; round 9 switched to ``collect()`` after finding that
``count()`` lets Catalyst prune per-row heads' computed columns and
constant-fold ungrouped-aggregate heads outright. The round-9
blast-radius audit ran at sf0.01 and under-detected heads whose
pruned-column delta scales with rows — six heads then moved 1.4-1.8×
at sf0.1 on untouched code.

This script measures every HEADLINE head BOTH ways at the target SF
(default the bench's sf0.1), cold JVM per rep exactly like bench.py
(it reuses ``bench.py --one`` with the audit-only
``SPARK_GRAFT_BENCH_MATERIALIZE`` toggle), and writes one JSON file::

    {"sf_dir": ..., "reps": N,
     "heads": {name: {"collect": [...], "count": [...],
                      "collect_min": s, "count_min": s,
                      "ratio": collect_min / count_min}}}

Interpretation (the COVERAGE.md audit table is derived from this):
ratio >≈ 1.15 ⇒ the head's count-era (r1-r8) numbers under-measured
at bench scale and are VOID as baselines; BENCH_r09 onward is the
honest comparison base for it. Min-of-reps, not median: the audit ran
concurrently with other work on the box, and min is the
contention-robust statistic (COVERAGE.md round-6 attribution
doctrine).

Usage::

    python scripts/audit_count_collect.py [out.json] [reps]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench  # noqa: E402


def _run(name: str, mode: str) -> float | None:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_MATERIALIZE"] = mode
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py"), "--one", name],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith('{"query"')]
    if proc.returncode != 0 or not lines:
        print(f"  {name}[{mode}]: FAILED\n{proc.stderr[-300:]}", file=sys.stderr)
        return None
    return json.loads(lines[-1])["sec"]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "AUDIT_COUNT_COLLECT_r10.json"
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    heads: dict[str, dict] = {}
    for name in bench.HEADLINE:
        rec: dict = {"collect": [], "count": []}
        # interleave modes so slow drift in box load hits both equally
        for _ in range(reps):
            for mode in ("collect", "count"):
                s = _run(name, mode)
                if s is not None:
                    rec[mode].append(s)
        if rec["collect"] and rec["count"]:
            rec["collect_min"] = min(rec["collect"])
            rec["count_min"] = min(rec["count"])
            rec["ratio"] = round(rec["collect_min"] / rec["count_min"], 3)
        heads[name] = rec
        print(f"  {name}: {rec}", file=sys.stderr, flush=True)
        # checkpoint after every head so a crash loses nothing
        with open(out_path, "w") as f:
            json.dump(
                {"sf_dir": bench.SF_DIR, "reps": reps, "heads": heads}, f, indent=1
            )
    print(json.dumps({"done": True, "out": out_path, "n": len(heads)}))


if __name__ == "__main__":
    main()

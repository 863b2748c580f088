"""dedup_audio warm-band attribution A/B (r13 verdict task #4).

The one head still breathing ~2× warm after the r13 race fix is
dedup_audio (5.6-11.3 s warm samples; the r13 note said "FFT-side").
This script isolates the python-worker compute — synth + WAV decode +
Haitsma-Kalker fingerprint, the exact per-clip work the Spark workers
do — OUTSIDE Spark, so scheduler/JIT/cache effects are gone and only
the numpy-process term remains. Three axes:

* parallelism: 1 process (control) vs 32 processes (the bench shape).
  A band that exists only at 32 procs is CONTENTION, not compute.
* allocator: default glibc vs MALLOC_MMAP_THRESHOLD_/TRIM raised to
  128 MB. subfingerprints allocates ~3 MB of >128 KB temporaries per
  clip (idx, frames, spec) — glibc serves those via mmap/munmap,
  and 32 processes unmapping concurrently storm the TLB (kernel
  IPIs), a classic multi-process numpy slowdown. If the band
  collapses under the raised threshold, the term is allocator churn.
* BLAS/OMP threads capped to 1: numpy 1.26's pocketfft is
  single-threaded and this box's OpenBLAS builds with MAX_THREADS=2,
  so this axis is expected flat — included to PIN the negative
  (the "FFT thread contention" hypothesis).

Usage:
    python scripts/audio_warmband_ab.py [--clips 800] [--reps 5]

Prints one JSON line per configuration: median/min/max wall and the
max/min band ratio. Interpret: band(32p, default) >> band(1p) and
band(32p, mmap-capped) ~ band(1p) => allocator churn attribution.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORKER = """
import os, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
from sensorstream_scalable_sensor_data_pipeline_spark.operators.audio_fp import (
    synth_clip, fingerprint_wav,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.codecs import encode_wav

lo, hi = int(sys.argv[1]), int(sys.argv[2])
# synthesis is part of the bench head's worker profile too, but the
# timed term we care about is decode+FFT over already-encoded bytes —
# pre-encode, then time the fingerprint loop
payloads = [encode_wav(synth_clip(i), 8000) for i in range(lo, hi)]
t0 = time.time()
for p in payloads:
    fingerprint_wav(p)
print(time.time() - t0)
"""


def run_rep(n_procs: int, clips_per_proc: int, env: dict) -> float:
    """One rep: n_procs concurrent fingerprint loops; returns the
    MAX per-proc wall (the straggler defines the stage time, same as
    a Spark stage barrier)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for i in range(n_procs):
        lo = i * clips_per_proc
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER.format(repo=repo),
                 str(lo), str(lo + clips_per_proc)],
                stdout=subprocess.PIPE,
                env={**os.environ, **env},
            )
        )
    walls = []
    for p in procs:
        out, _ = p.communicate()
        walls.append(float(out.strip()))
    return max(walls)


CONFIGS = {
    "1proc_default": (1, {}),
    "32proc_default": (32, {}),
    "32proc_mmapcap": (
        32,
        {
            "MALLOC_MMAP_THRESHOLD_": "134217728",
            "MALLOC_TRIM_THRESHOLD_": "134217728",
        },
    ),
    "32proc_threads1": (
        32,
        {
            "OMP_NUM_THREADS": "1",
            "OPENBLAS_NUM_THREADS": "1",
            "MKL_NUM_THREADS": "1",
        },
    ),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=800,
                    help="total clips per rep in the 32-proc shape")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    for name, (n_procs, env) in CONFIGS.items():
        per_proc = max(1, args.clips // max(n_procs, 1))
        if n_procs == 1:
            per_proc = max(1, args.clips // 32)  # same per-proc work
        walls = [run_rep(n_procs, per_proc, env) for _ in range(args.reps)]
        walls_s = sorted(walls)
        print(
            json.dumps(
                {
                    "config": name,
                    "n_procs": n_procs,
                    "clips_per_proc": per_proc,
                    "median": round(walls_s[len(walls_s) // 2], 3),
                    "min": round(walls_s[0], 3),
                    "max": round(walls_s[-1], 3),
                    "band": round(walls_s[-1] / walls_s[0], 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

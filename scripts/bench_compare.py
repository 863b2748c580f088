"""Compare two bench JSON records head-by-head, the way rounds should
be compared: per-head ratios (median and min-of-samples), flagged
against a spread threshold so contended samples are visible instead
of silently poisoning the medians (COVERAGE.md "Round-6 bench
attribution").

Usage::

    python scripts/bench_compare.py BENCH_r01.json BENCH_r06.json

Accepts either the raw driver record (``{"tail": "..."}`` wrapper) or
bench.py's own one-line JSON. Prints one row per head present in
both: base / new medians, median ratio, min ratio (the
contention-robust statistic when samples are recorded), and the
intra-head spread (max/min of samples) of the NEW record.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        rec = json.load(f)
    if "tail" in rec:  # driver wrapper: the JSON line lives in stdout tail
        line = [
            ln
            for ln in rec["tail"].splitlines()
            if ln.startswith('{"metric"')
        ][-1]
        rec = json.loads(line)
    return rec


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    base, new = load(sys.argv[1]), load(sys.argv[2])
    bq, nq = base["queries"], new["queries"]
    bs, ns = base.get("samples", {}), new.get("samples", {})
    shared = [h for h in bq if h in nq]
    print(
        f"{'head':34} {'base':>7} {'new':>7} {'med×':>6} {'min×':>6} {'spread':>7}"
    )
    tot_b = tot_n = 0.0
    for h in shared:
        b_med, n_med = bq[h], nq[h]
        tot_b += b_med
        tot_n += n_med
        b_min = min(bs.get(h, [b_med]))
        n_min = min(ns.get(h, [n_med]))
        n_samples = ns.get(h, [n_med])
        spread = max(n_samples) / min(n_samples)
        flag = " <-- spread" if spread > 1.5 else ""
        print(
            f"{h:34} {b_med:7.2f} {n_med:7.2f} {n_med / b_med:6.2f}"
            f" {n_min / b_min:6.2f} {spread:6.1f}x{flag}"
        )
    print(
        f"{'TOTAL (shared heads)':34} {tot_b:7.2f} {tot_n:7.2f}"
        f" {tot_n / tot_b:6.2f}"
    )
    only_new = sorted(set(nq) - set(bq))
    if only_new:
        print("new-only heads: " + ", ".join(f"{h}={nq[h]}s" for h in only_new))


if __name__ == "__main__":
    main()

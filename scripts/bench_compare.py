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


#: Scalar keys in the bench JSON that are not head names.
_NON_HEADS = {"metric", "value", "sf", "cpus", "n", "rc", "reps"}


def load(path: str) -> dict:
    with open(path) as f:
        rec = json.load(f)
    if "tail" in rec:  # driver wrapper: the JSON line lives in stdout tail
        lines = [
            ln for ln in rec["tail"].splitlines() if ln.startswith('{"metric"')
        ]
        if lines:
            return json.loads(lines[-1])
        # The driver truncates tails to their last ~2000 chars, which
        # cuts the JSON line's head off — recover per-head data by
        # regex: sample arrays ("head": [a, b, c]) carry the medians;
        # scalar entries cover sample-less records (r1).
        import re
        import statistics

        t = rec["tail"]
        samples = {
            m.group(1): [float(x) for x in m.group(2).split(",")]
            for m in re.finditer(r'"(\w+)": \[([\d.eE+\-, ]+)\]', t)
        }
        queries = {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"(\w+)": ([\d.]+)[,}]', t)
            if m.group(1) not in _NON_HEADS
        }
        for h, s in samples.items():
            queries.setdefault(h, statistics.median(s))
        if not queries:
            raise ValueError(f"{path}: no bench line and no parsable tail")
        return {"queries": queries, "samples": samples}
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

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


def _rekey_positional(rec: dict) -> dict:
    """cpu/steal ship as POSITIONAL lists aligned with the queries
    dict's insertion order (bench.py's compact-line budget, r15+) —
    rekey them by head name so comparisons can align by head."""
    rec = dict(rec)
    heads = list(rec.get("queries", {}))
    for key in ("cpu", "steal"):
        if isinstance(rec.get(key), list) and len(rec[key]) == len(heads):
            rec[key] = dict(zip(heads, rec[key]))
    return rec


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        rec = json.loads(text)
    except json.JSONDecodeError:
        # raw bench stdout: the JSON line is the first line, the
        # human-readable per-head log follows
        rec = json.loads(text.splitlines()[0])
    if "parsed" in rec and isinstance(rec["parsed"], dict):
        # driver wrapper with the full bench line pre-parsed (r15+)
        return _rekey_positional(rec["parsed"])
    if "queries" in rec:  # bench.py's own one-line JSON: the FULL
        # line keys per-head dicts as cpu_seconds/steal_cores/
        # burst_heads; the compact archive line abbreviates them
        for full, short in (
            ("cpu_seconds", "cpu"),
            ("steal_cores", "steal"),
            ("burst_heads", "burst"),
        ):
            if full in rec and short not in rec:
                rec[short] = rec[full]
        return _rekey_positional(rec)
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


def verdict(
    wall_ratio: float,
    cpu_ratio: float | None,
    steal: float | None,
) -> str:
    """Three-way cross-round adjudication (r16, r15 verdict task #3 —
    the fingerprint three consecutive judges applied by hand, now
    computed): wall inflated with FLAT CPU under visible steal is the
    host, not the code; wall AND CPU both up is a real regression;
    wall down is a real improvement. ``cross-check`` marks the
    wall-up/CPU-flat/low-steal corner that needs a quiet-window
    replay — steady interference below the steal meter's floor and a
    genuine IO/plan change look identical there."""
    if wall_ratio < 0.8:
        return "improved"
    if wall_ratio <= 1.25:
        return "steady"
    if cpu_ratio is None:
        return "cross-check"  # pre-r15 base: no CPU axis to test
    if cpu_ratio > 1.1:
        # a heavily-stolen window (>1 core) inflates wall AND smears
        # cpu_s (frequency/IPC under co-tenant pressure) — don't call
        # code on a contaminated read; demand a quiet-window replay
        if steal is not None and steal > 1.0:
            return "cross-check"
        return "code-regression"
    if steal is not None and steal > 0.5:
        return "host-bound"
    return "cross-check"


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    base, new = load(sys.argv[1]), load(sys.argv[2])
    bq, nq = base["queries"], new["queries"]
    bs, ns = base.get("samples", {}), new.get("samples", {})
    bcpu, ncpu = base.get("cpu", {}), new.get("cpu", {})
    nsteal = new.get("steal", {})
    nburst = set(new.get("burst", []))
    shared = [h for h in bq if h in nq]
    print(
        f"{'head':34} {'base':>7} {'new':>7} {'wall×':>6} {'cpu×':>6}"
        f" {'steal':>6} {'verdict':>15}"
    )
    tot_b = tot_n = 0.0
    verdicts: dict[str, str] = {}
    for h in shared:
        b_med, n_med = bq[h], nq[h]
        tot_b += b_med
        tot_n += n_med
        wall_ratio = n_med / b_med
        cpu_ratio = (
            ncpu[h] / bcpu[h]
            if h in ncpu and h in bcpu and bcpu[h]
            else None
        )
        steal = nsteal.get(h)
        v = verdict(wall_ratio, cpu_ratio, steal)
        verdicts[h] = v
        n_samples = ns.get(h, [n_med])
        spread = max(n_samples) / min(n_samples)
        flags = []
        if spread > 1.5:
            flags.append("spread")
        if h in nburst:
            flags.append("burst")
        suffix = (" <-- " + ",".join(flags)) if flags else ""
        cpu_s = f"{cpu_ratio:6.2f}" if cpu_ratio is not None else f"{'-':>6}"
        steal_s = f"{steal:6.2f}" if steal is not None else f"{'-':>6}"
        print(
            f"{h:34} {b_med:7.2f} {n_med:7.2f} {wall_ratio:6.2f}"
            f" {cpu_s} {steal_s} {v:>15}{suffix}"
        )
    print(
        f"{'TOTAL (shared heads)':34} {tot_b:7.2f} {tot_n:7.2f}"
        f" {tot_n / tot_b:6.2f}"
    )
    counts: dict[str, int] = {}
    for v in verdicts.values():
        counts[v] = counts.get(v, 0) + 1
    print(
        "VERDICTS "
        + json.dumps(
            {
                "counts": counts,
                "code_regressions": sorted(
                    h for h, v in verdicts.items() if v == "code-regression"
                ),
                "host_bound": sorted(
                    h for h, v in verdicts.items() if v == "host-bound"
                ),
                "cross_check": sorted(
                    h for h, v in verdicts.items() if v == "cross-check"
                ),
            },
            sort_keys=True,
        )
    )
    only_new = sorted(set(nq) - set(bq))
    if only_new:
        print("new-only heads: " + ", ".join(f"{h}={nq[h]}s" for h in only_new))


if __name__ == "__main__":
    main()

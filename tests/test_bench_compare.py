"""Cross-round bench adjudication (r16, r15 verdict task #3): the
three-way verdict the judges applied by hand is now computed —
wall-up/CPU-flat/steal-elevated is the host, wall-and-CPU-up is the
code, wall-down is an improvement."""

from __future__ import annotations

import importlib.util
import json
import sys


def _mod():
    spec = importlib.util.spec_from_file_location(
        "bench_compare", "scripts/bench_compare.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_verdict_fingerprints():
    v = _mod().verdict
    assert v(1.51, 1.00, 0.9) == "host-bound"
    assert v(1.31, 1.01, 0.7) == "host-bound"
    assert v(1.42, 1.13, 0.8) == "code-regression"
    assert v(1.37, 1.12, 2.26) == "cross-check"  # stolen window: replay
    assert v(1.27, 1.07, 0.1) == "cross-check"  # low steal, flat CPU
    assert v(1.27, None, None) == "cross-check"  # pre-r15 base record
    assert v(0.62, 0.9, 0.1) == "improved"
    assert v(1.05, 1.02, 0.4) == "steady"
    assert v(1.25, 1.0, 0.9) == "steady"  # boundary inclusive


def test_load_rekeys_positional_cpu_steal(tmp_path):
    rec = {
        "parsed": {
            "queries": {"a": 1.0, "b": 2.0},
            "cpu": [10.0, 20.0],
            "steal": [0.1, 0.9],
            "burst": ["b"],
        }
    }
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(rec))
    out = _mod().load(str(p))
    assert out["cpu"] == {"a": 10.0, "b": 20.0}
    assert out["steal"] == {"a": 0.1, "b": 0.9}


def test_end_to_end_r14_vs_r15(capsys):
    """The archived r14/r15 records adjudicate to the documented
    round-15 outcome: the ten-head wall inflation resolves to
    host-bound/cross-check, not code regressions, with
    dedup_minhash_lsh host-bound at flat CPU."""
    m = _mod()
    argv = sys.argv
    sys.argv = ["bench_compare", "BENCH_r14.json", "BENCH_r15.json"]
    try:
        m.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    line = next(
        ln for ln in out.splitlines() if ln.startswith("VERDICTS ")
    )
    v = json.loads(line[len("VERDICTS "):])
    assert "dedup_minhash_lsh" in v["host_bound"]
    assert v["counts"].get("code-regression", 0) <= 1

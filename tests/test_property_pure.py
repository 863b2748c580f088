"""Hypothesis property tests for the pure driver-side helpers (no
SparkSession — these run in milliseconds and explore the input space
the example-based tests cannot)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from sensorstream_scalable_sensor_data_pipeline_spark.backfill import (
    expected_months,
    plan_backfill,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.dedup_fuzzy import (
    _union_find_components,
)

# ------------------------------------------------------------- months

dates = st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2040, 12, 31))


@given(a=dates, b=dates)
def test_expected_months_contiguous_and_bounded(a, b):
    if b < a:
        a, b = b, a
    ms = expected_months(a, b)
    assert ms[0] == (a.year, a.month) and ms[-1] == (b.year, b.month)
    for (y1, m1), (y2, m2) in zip(ms, ms[1:]):
        assert (y2, m2) == ((y1 + 1, 1) if m1 == 12 else (y1, m1 + 1))
    assert len(ms) == (b.year - a.year) * 12 + b.month - a.month + 1


@given(a=dates, b=dates, chunk=st.integers(1, 7))
@settings(max_examples=60)
def test_plan_backfill_covers_missing_exactly(tmp_path_factory, a, b, chunk):
    if b < a:
        a, b = b, a
    # empty layout -> every month missing -> windows tile the range
    empty = str(tmp_path_factory.mktemp("empty"))
    wins = plan_backfill(empty, a, b, chunk_months=chunk)
    covered = []
    for s, e in wins:
        assert s < e
        y, m = s.year, s.month
        while (y, m) < (e.year, e.month):
            covered.append((y, m))
            y, m = (y + 1, 1) if m == 12 else (y, m + 1)
    assert covered == expected_months(a, b)
    # chunk bound respected
    for s, e in wins:
        n = (e.year - s.year) * 12 + e.month - s.month
        assert 1 <= n <= chunk


# --------------------------------------------------------- union-find


class _FakeSpark:
    def createDataFrame(self, rows, schema):
        return rows  # the test only needs the (doc_id, rep) pairs


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(
            lambda e: e[0] != e[1]
        ),
        max_size=60,
    )
)
@settings(max_examples=100)
def test_union_find_matches_naive_closure(edges):
    got = dict(_union_find_components([tuple(e) for e in edges], _FakeSpark()))
    # naive transitive closure
    nodes = {n for e in edges for n in e}
    comp = {n: {n} for n in nodes}
    for a, b in edges:
        if comp[a] is not comp[b]:
            merged = comp[a] | comp[b]
            for n in merged:
                comp[n] = merged
    assert set(got) == nodes
    for n in nodes:
        assert got[n] == min(comp[n])  # rep is the component min


# ------------------------------------------------------------- morton


@given(
    xs=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
def test_python_morton_bijective_and_bounded(xs):
    from tests.test_zorder import py_morton

    codes = [py_morton(list(p), 8) for p in xs]
    assert len(set(codes)) == len(xs)  # injective on the grid
    assert all(0 <= c < (1 << 16) for c in codes)
    # de-interleave inverts
    for (x, y), c in zip(xs, codes):
        rx = sum(((c >> (2 * b)) & 1) << b for b in range(8))
        ry = sum(((c >> (2 * b + 1)) & 1) << b for b in range(8))
        assert (rx, ry) == (x, y)


# -------------------------------------------------- temperature budgets


@given(
    totals=st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        st.integers(0, 10_000),
        min_size=1,
        max_size=8,
    ),
    alpha=st.floats(0.0, 2.0, allow_nan=False),
    budget=st.integers(0, 50_000),
)
@settings(max_examples=150)
def test_temperature_budgets_invariants(totals, alpha, budget):
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.sampling import (
        temperature_budgets,
    )

    b = temperature_budgets(totals, alpha, budget)
    assert set(b) == set(totals)
    for s in totals:
        assert 0 <= b[s] <= totals[s]  # never exceed what a stratum has
    target = min(budget, sum(t for t in totals.values() if t > 0))
    assert sum(b.values()) == target  # water-filling fully allocates


def test_temperature_budgets_shapes():
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.sampling import (
        temperature_budgets,
    )

    totals = {"big": 9000, "small": 1000}
    # alpha=1: natural proportions
    b1 = temperature_budgets(totals, 1.0, 1000)
    assert b1 == {"big": 900, "small": 100}
    # alpha=0: uniform split boosts the small stratum
    b0 = temperature_budgets(totals, 0.0, 1000)
    assert b0 == {"big": 500, "small": 500}
    # 0 < alpha < 1 sits between
    bh = temperature_budgets(totals, 0.5, 1000)
    assert b0["small"] >= bh["small"] >= b1["small"]
    # capping: budget above a stratum's total spills to the other
    bc = temperature_budgets(totals, 0.0, 6000)
    assert bc == {"big": 5000, "small": 1000}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_budgets(totals, -0.1, 100)

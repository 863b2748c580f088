"""PageRank (operators/graph.py) vs a numpy power-iteration oracle
replaying the exact grid arithmetic, plus structural properties."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.graph import pagerank

GRID = 1_000_000.0


def np_pagerank(edges: list[tuple], iters: int, damping: float) -> dict:
    """Addend-exact replay: grid-floored contribution sums, same op
    order as the Spark implementation."""
    e = sorted(set(edges))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    n = len(nodes)
    out: dict = {}
    for a, b in e:
        out.setdefault(a, []).append(b)
    rank = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n

    def gsum(vals):
        return float(sum(math.floor(v * GRID) for v in vals)) / GRID

    for _ in range(iters):
        dangling = gsum([rank[v] for v in nodes if v not in out]) if any(
            v not in out for v in nodes
        ) else 0.0
        contrib: dict = {v: [] for v in nodes}
        for a, targets in out.items():
            c = rank[a] / len(targets)
            for b in targets:
                contrib[b].append(c)
        rank = {
            v: base + damping * (gsum(contrib[v]) + dangling / n)
            if contrib[v]
            else base + damping * (0.0 + dangling / n)
            for v in nodes
        }
    return rank


EDGE_SETS = {
    "star": [(1, 0), (2, 0), (3, 0), (0, 1)],
    "cycle": [(0, 1), (1, 2), (2, 3), (3, 0)],
    "dangling": [(0, 1), (0, 2), (1, 2)],  # 2 has no out-edges
    "two-comp": [(0, 1), (1, 0), (2, 3), (3, 2), (4, 2)],
}


@pytest.mark.parametrize("name", sorted(EDGE_SETS))
def test_pagerank_matches_numpy_oracle(spark, name):
    edges = EDGE_SETS[name]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=15).collect()}
    want = np_pagerank(edges, 15, 0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), (name, v)
    # mass conservation (grid flooring leaks < iters * n / 1e6)
    assert abs(sum(got.values()) - 1.0) < 1e-3
    # the hub of the star out-ranks the leaves
    if name == "star":
        assert got[0] == max(got.values())


def test_pagerank_partitioning_stable(spark):
    edges = [(i, (i * 7 + 3) % 23) for i in range(23)] + [(5, 11), (11, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank"] for r in pagerank(df, iters=10).collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank(df.repartition(9), iters=10).collect()
    }
    assert a == b  # grid sums: bit-identical under any partitioning


def test_pagerank_duplicate_edges_collapse(spark):
    df1 = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    df2 = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 0)], "src long, dst long"
    )
    r1 = {r["node"]: r["rank"] for r in pagerank(df1, iters=5).collect()}
    r2 = {r["node"]: r["rank"] for r in pagerank(df2, iters=5).collect()}
    assert r1 == r2
    with pytest.raises(ValueError):
        pagerank(df1, iters=0)
    with pytest.raises(ValueError):
        pagerank(df1, damping=1.5)


def test_connected_components_both_paths_agree(spark):
    """The distributed min-label loop (driver_max_pairs=0) and the
    driver union-find fast path produce identical components on a
    multi-component graph with a chain (diameter > 2)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(df, driver_max_pairs=0).collect()
    }
    assert fast == dist
    comp_of = dict(fast)
    assert {comp_of[n] for n in (1, 2, 3, 4, 5)} == {1}
    assert {comp_of[n] for n in (10, 11)} == {10}
    assert {comp_of[n] for n in (20, 21, 22)} == {20}

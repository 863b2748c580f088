"""Z-order layout (sources/writers.py::morton_code / write_zorder):
bit-interleave correctness vs a Python oracle, and the multi-column
footer-narrowing property that 1-D range sorting cannot give."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.sources.writers import (
    morton_code,
    write_range_sorted,
    write_zorder,
)


def py_morton(vals: list[int], bits: int) -> int:
    code = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            code |= ((v >> b) & 1) << (b * len(vals) + i)
    return code


def test_morton_code_matches_python_oracle(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", morton_code([F.col("x"), F.col("y")], bits=4).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == py_morton([x, y], 4), (x, y)
    # interleave is a bijection on the grid
    assert len(set(got.values())) == len(rows)
    with pytest.raises(ValueError):
        morton_code([F.col("x")], 4)
    with pytest.raises(ValueError):
        morton_code([F.col("x"), F.col("y")], 32)


def _file_spans(path: str, cols: list[str]) -> list[dict]:
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.read_metadata(f)
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    mn, mx = col.statistics.min, col.statistics.max
                    lo[name] = mn if lo[name] is None else min(lo[name], mn)
                    hi[name] = mx if hi[name] is None else max(hi[name], mx)
        out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def test_zorder_narrows_every_dimension(spark, tmp_path):
    """200×200 uniform grid, 16 files: the Z-curve layout bounds BOTH
    columns' per-file footer spans well under the global span, while
    the 1-D range sort leaves its secondary column full-span in every
    file — the multi-dimension pruning argument, measured on footers
    (engine-independent: any parquet reader skips on these stats)."""
    n = 200
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zorder(df, zpath, ["x", "y"], n_files=16, bits=8)
    write_range_sorted(df, rpath, "x", n_files=16)

    zspans = _file_spans(zpath, ["x", "y"])
    rspans = _file_spans(rpath, ["x", "y"])
    assert len(zspans) == len(rspans) == 16

    def mean_span(spans, c):
        return sum(s[c][1] - s[c][0] for s in spans) / len(spans)

    gx = gy = n - 1
    # Z-order: every dimension narrow (16 files ~ 4x4 curve tiles)
    assert mean_span(zspans, "x") <= 0.45 * gx
    assert mean_span(zspans, "y") <= 0.45 * gy
    # 1-D range sort: sorted column disjoint-narrow, the OTHER full
    assert mean_span(rspans, "x") <= 0.15 * gx
    assert mean_span(rspans, "y") >= 0.9 * gy
    # roundtrip: same rows
    back = spark.read.parquet(zpath)
    assert back.count() == n * n
    assert back.select(F.sum("x"), F.sum("y")).collect() == df.select(
        F.sum("x"), F.sum("y")
    ).collect()


def test_zorder_handles_nulls_and_constant_cols(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, 1.0), (5, 1.0), (9, 1.0)], "x int, y double"
    )
    p = str(tmp_path / "t")
    write_zorder(df, p, ["x", "y"], n_files=2, bits=4)
    back = spark.read.parquet(p)
    assert back.count() == 3
    assert back.filter("x IS NULL").count() == 1
    with pytest.raises(ValueError):
        write_zorder(df, p, ["x", "y"], n_files=2, bits=0)


def test_zorder_all_null_column_grid_zero(spark, tmp_path):
    """An entirely-NULL listed column folds to grid 0 (the docstring
    contract) instead of crashing on NULL bounds (review-found)."""
    df = spark.createDataFrame(
        [(1, None), (5, None), (9, None)], "x int, y double"
    )
    p = str(tmp_path / "t")
    write_zorder(df, p, ["x", "y"], n_files=2, bits=4)
    back = spark.read.parquet(p)
    assert back.count() == 3
    assert back.filter("y IS NULL").count() == 3

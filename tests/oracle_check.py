"""Local twin of the driver's Spark-vs-DuckDB comparison.

The driver (per __spark_entry__.py contract) compares row count,
schema, and an order-insensitive value hash with columns sorted by
name. This helper reproduces that as closely as we can locally so a
query that passes here passes the driver's t2 gate: columns sorted by
name, rows sorted by all columns, values normalized (timestamps →
epoch µs int64, floats compared bit-exactly after float64 coercion).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            import datetime as dt

            if len(s) and isinstance(s.iloc[0], (dt.date, dt.datetime)):
                df[c] = pd.to_datetime(s).astype("datetime64[us]").astype("int64")
            else:
                df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column sets differ: spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # the driver hashes RAW BYTES, so an int64-vs-float64
        # mismatch is driver-red even when numpy's == says equal
        # (found r14: DuckDB sum(BIGINT) → HUGEINT → float64 while
        # Spark returns long — the local suite passed, the driver
        # MISMATCHed). Faithful twin = identical post-normalization
        # dtype required (_normalize coerces widths to int64/float64,
        # so this is a kind check in practice — full equality shuts
        # the door on any future width-preserving normalization).
        assert av.dtype == bv.dtype, (
            f"{name}: column {c!r} dtype differs (driver hashes "
            f"bytes): spark={av.dtype} duck={bv.dtype} — cast the "
            f"oracle (e.g. CAST(sum(x) AS BIGINT)) or the query"
        )
        if av.dtype.kind == "f":
            ok = (av == bv) | (np.isnan(av) & np.isnan(bv))
        else:
            ok = av == bv
        if not bool(np.all(ok)):
            bad = np.nonzero(~ok)[0][:5]
            raise AssertionError(
                f"{name}: column {c!r} differs at rows {bad.tolist()}: "
                f"spark={av[bad].tolist()} duck={bv[bad].tolist()}"
            )

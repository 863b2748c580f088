"""Simulate the correctness driver end-to-end.

Builds a PLAIN SparkSession (none of the engine's confs — exactly the
cold session the driver would hand us), imports __spark_entry__, runs
entry() and every queries() entry at the given sf dir, executes each
oracle_sql() in DuckDB over the same parquet views, and compares
row count + column names + an order-insensitive value hash.

Usage: python scripts/driver_sim.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILTER = sys.argv[2] if len(sys.argv) > 2 else ""

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    import datetime as dt

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
            if len(s) and isinstance(s.iloc[0], (dt.date, dt.datetime)):
                df[c] = pd.to_datetime(s).astype("datetime64[us]").astype("int64")
            else:
                df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for c in df.columns:
        arr = df[c].to_numpy()
        if arr.dtype.kind == "f":
            arr = np.nan_to_num(arr, nan=-0.123456789e300)
        h.update(np.asarray(arr).tobytes() if arr.dtype.kind != "O" else str(arr.tolist()).encode())
    return h.hexdigest()[:16]


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    t0 = time.time()
    edf = entrymod.entry(spark)
    rows = edf.collect()
    print(
        json.dumps(
            {
                "entry_rows": len(rows),
                "entry_schema": [f.name for f in edf.schema.fields],
                "entry_sec": round(time.time() - t0, 2),
            }
        )
    )
    assert len(rows) > 0

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name in sorted(queries):
        if FILTER and FILTER not in name:
            continue
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
            status: dict = {"query": name, "rows": len(sdf), "sec": round(time.time() - t0, 2)}
            if name in oracles:
                ddf = con.sql(oracles[name]).df()
                a, b = norm(sdf), norm(ddf)
                ok = (
                    list(a.columns) == list(b.columns)
                    and len(a) == len(b)
                    and value_hash(a) == value_hash(b)
                )
                status["oracle"] = "match" if ok else "MISMATCH"
                if not ok:
                    status["spark_cols"] = list(a.columns)
                    status["duck_cols"] = list(b.columns)
                    status["spark_rows"], status["duck_rows"] = len(a), len(b)
                    n_fail += 1
                else:
                    n_pass += 1
            else:
                status["oracle"] = "rows-only"
                n_pass += 1
        except Exception as e:
            status = {"query": name, "error": str(e)[:300]}
            n_fail += 1
        print(json.dumps(status))
    print(json.dumps({"pass": n_pass, "fail": n_fail, "sf_dir": SF_DIR}))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

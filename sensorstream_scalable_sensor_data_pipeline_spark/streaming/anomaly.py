"""Streaming anomaly detection: stateful rolling z-scores over a
reading stream (§2.10 extension — the live face of
operators/anomaly.py::rolling_zscore).

Batch z-scoring replays the whole history per run; a monitoring
deployment wants each reading scored ONCE, as it arrives, against the
key's trailing window — per-key state that survives micro-batch
boundaries. That is exactly ``applyInPandasWithState``: GroupState
holds the trailing window's readings as three parallel arrays
(epoch-µs, grid-v, grid-v²; the same exact integer grid as the batch
operator, so a score computed here is BIT-IDENTICAL to the batch one
over the same window), each batch's readings are folded in ascending
time order, and entries older than ``window_seconds`` behind the
newest reading are evicted — state per key is bounded by the window's
row capacity, not the stream's length.

ORDERING CONTRACT, pinned by tests: with in-order delivery (every
micro-batch's readings no older than the previous batch's) the
drained scores equal the batch operator's bit-for-bit. A LATE reading
is still scored exactly over the retained entries at or before its
timestamp — but entries already evicted (older than the newest
reading minus the window) are gone, so a sufficiently late reading
scores against a truncated window. That is the honest streaming
trade: exact-once scoring at arrival vs hindsight. Deployments that
need hindsight-exact late scores run the batch operator over the
day's landing data (the engine's batch/stream pair makes both sides
of that trade available).

The per-key fold is a Python loop over the batch's readings (numpy
windows over the buffer) — already on the sanctioned Arrow path;
state I/O, not this loop, dominates at realistic batch sizes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

GRID = 1_000_000.0


def stream_rolling_zscore(
    stream: DataFrame,
    on: str,
    time_col: str,
    value_col: str,
    window_seconds: int,
    z_threshold: float = 3.0,
    min_points: int = 5,
) -> DataFrame:
    """Score every reading of a keyed stream against its key's
    trailing ``window_seconds``: emits (key, ts_us, value, zscore,
    is_anomaly) per reading, append semantics (each reading scored
    exactly once, in its batch). Identical math to the batch
    operator: mean = s1/1e6/n, var = s2/1e6/n − mean², NULL z under
    ``min_points`` readings or zero variance."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    w_us = int(window_seconds) * 1_000_000
    zt = float(z_threshold)
    mp = int(min_points)
    # the key column keeps ITS OWN type (string sensor ids are as
    # common as numeric ones); hardcoding long here broke non-long
    # keys at the Arrow boundary (review-found)
    key_type = dict(stream.dtypes)[on]
    out_schema = (
        f"{on} {key_type}, ts_us long, {value_col} double, "
        "zscore double, is_anomaly boolean"
    )

    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.exists:
            b_us, b_g1, b_g2 = (
                np.array(a, dtype=np.int64) for a in state.get
            )
        else:
            b_us = b_g1 = b_g2 = np.empty(0, dtype=np.int64)
        frames = [p for p in pdfs if len(p)]
        if not frames:
            # timeout/no-data call: nothing to score, state unchanged;
            # yielding nothing is valid (and type-agnostic on the key)
            return
        batch = pd.concat(frames, ignore_index=True)
        # r16: same per-group pandas trim as stream_funnel — .values
        # is the to_datetime+tz_localize(None) epoch without the two
        # per-group calls (guide §4.5)
        us = batch[time_col].values.astype("datetime64[us]").astype("int64")
        vals = batch[value_col].astype("float64").to_numpy()
        order = np.argsort(us, kind="stable")
        out_us, out_v, out_z, out_flag = [], [], [], []
        for i in order:
            cur, v = int(us[i]), float(vals[i])
            # insert the reading (buffer stays time-sorted)
            pos = int(np.searchsorted(b_us, cur, side="right"))
            b_us = np.insert(b_us, pos, cur)
            b_g1 = np.insert(b_g1, pos, math.floor(v * GRID))
            b_g2 = np.insert(b_g2, pos, math.floor(v * v * GRID))
            # trailing window [cur - w, cur] over retained entries
            lo = int(np.searchsorted(b_us, cur - w_us, side="left"))
            hi = int(np.searchsorted(b_us, cur, side="right"))
            n = hi - lo
            z, flag = None, False
            if n >= mp:
                s1, s2 = int(b_g1[lo:hi].sum()), int(b_g2[lo:hi].sum())
                mean = float(s1) / GRID / n
                var = float(s2) / GRID / n - mean * mean
                if var > 0:
                    z = (v - mean) / math.sqrt(var)
                    flag = abs(z) >= zt
            out_us.append(cur)
            out_v.append(v)
            out_z.append(z)
            out_flag.append(flag)
        # evict: keep the window behind the newest retained reading
        keep = int(np.searchsorted(b_us, int(b_us[-1]) - w_us, side="left"))
        state.update(
            (
                [int(x) for x in b_us[keep:]],
                [int(x) for x in b_g1[keep:]],
                [int(x) for x in b_g2[keep:]],
            )
        )
        yield pd.DataFrame(
            {
                on: key[0],
                "ts_us": pd.Series(out_us, dtype="int64"),
                value_col: pd.Series(out_v, dtype="float64"),
                "zscore": pd.Series(out_z, dtype="float64"),
                "is_anomaly": pd.Series(out_flag, dtype="bool"),
            }
        )

    return stream.groupBy(on).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="us array<long>, g1 array<long>, g2 array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

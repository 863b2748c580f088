"""Backfill planning over the runner's (year, month) partition layout
(§3.2 orchestration analog — the gap-repair half of scheduling).

The incremental runner moves the cutoff forward; it cannot notice a
HOLE behind the cutoff (a month whose run failed silently, a
partition someone deleted, an upstream that back-delivered). Backfill
planning is the diff between the calendar and the layout:

* :func:`expected_months` — the (year, month) sequence a date range
  covers;
* :func:`existing_months` — the months PHYSICALLY present under a
  ``partitionBy(..., year, month)`` dataset, read from directory
  names alone (a driver-side listing per partition level, no data
  scan, no footer reads — the same metadata the engine's partition
  pruning uses);
* :func:`plan_backfill` — expected − existing, as a work list of
  month-bounded (start, end) windows ready to feed the runner one
  chunk at a time (chunked reruns bound each job's memory and make
  partial progress durable — rerunning a 3-year hole as one job is
  how backfills OOM at 100 TB).

Writing a manifest next to data (:mod:`sources.writers`) guards
integrity WITHIN a partition; this plans across partitions.
"""

from __future__ import annotations

import datetime as dt
import os
import re

from pyspark.sql import SparkSession


def expected_months(
    start: dt.date, end: dt.date
) -> list[tuple[int, int]]:
    """Every (year, month) touched by [start, end] inclusive."""
    if end < start:
        raise ValueError("end must be >= start")
    out = []
    y, m = start.year, start.month
    while (y, m) <= (end.year, end.month):
        out.append((y, m))
        y, m = (y + 1, 1) if m == 12 else (y, m + 1)
    return out


def existing_months(path: str) -> set[tuple[int, int]]:
    """(year, month) pairs physically present under a layout whose
    directory names contain ``year=YYYY/month=M`` at any depth (the
    runner nests them under tagpath). Pure directory walk — no Spark
    job, no file opens; empty set for a missing dataset."""
    found: set[tuple[int, int]] = set()
    pat_y = re.compile(r"^year=(\d+)$")
    pat_m = re.compile(r"^month=(\d+)$")
    for root, dirs, _ in os.walk(path):
        my = pat_y.match(os.path.basename(root))
        if not my:
            continue
        for d in dirs:
            mm = pat_m.match(d)
            if mm:
                found.add((int(my.group(1)), int(mm.group(1))))
    return found


def plan_backfill(
    state_path: str,
    start: dt.date,
    end: dt.date,
    chunk_months: int = 1,
) -> list[tuple[dt.datetime, dt.datetime]]:
    """The missing-month work list as half-open datetime windows
    [window_start, window_end), consecutive missing months coalesced
    into chunks of at most ``chunk_months`` (one runner invocation
    each — a bounded job per chunk, durable progress between them).
    Empty list = layout complete for the range."""
    if chunk_months < 1:
        raise ValueError("chunk_months must be >= 1")
    have = existing_months(state_path)  # ONE directory walk, not one per month
    missing = [ym for ym in expected_months(start, end) if ym not in have]
    windows: list[tuple[dt.datetime, dt.datetime]] = []
    run: list[tuple[int, int]] = []

    def next_month(y: int, m: int) -> tuple[int, int]:
        return (y + 1, 1) if m == 12 else (y, m + 1)

    def flush():
        while run:
            chunk, rest = run[:chunk_months], run[chunk_months:]
            s = dt.datetime(chunk[0][0], chunk[0][1], 1)
            ey, em = next_month(*chunk[-1])
            windows.append((s, dt.datetime(ey, em, 1)))
            run[:] = rest

    for ym in missing:
        if run and ym != next_month(*run[-1]):
            flush()
        run.append(ym)
    flush()
    return windows


def verify_complete(
    spark: SparkSession,
    state_path: str,
    start: dt.date,
    end: dt.date,
) -> None:
    """Gate form: raise listing every missing month. The check a
    scheduled pipeline runs before declaring a range servable."""
    have = existing_months(state_path)
    missing = [ym for ym in expected_months(start, end) if ym not in have]
    if missing:
        pretty = ", ".join(f"{y}-{m:02d}" for y, m in missing)
        raise RuntimeError(
            f"layout at {state_path} is missing {len(missing)} month(s): {pretty}"
        )


def vacuum_months(
    state_path: str,
    keep_after: dt.date,
    dry_run: bool = True,
) -> list[tuple[int, int]]:
    """Retention enforcement over the (year, month) layout: every
    month STRICTLY BEFORE ``keep_after``'s month is deleted (all its
    ``month=`` directories, under every tagpath). ``dry_run=True``
    (the default — deletion must be opted into) only reports.

    Returns the sorted affected (year, month) list. Deletion walks
    the same directory names the planner reads — no data scan; the
    per-month directory is the deletion unit, which is exactly why
    the layout partitions by month in the first place (dropping a
    partition is a rename/delete, rewriting nothing). A deletion that
    FAILS partway raises listing the affected paths — a half-deleted
    month reads as silently truncated data AND as "present" to the
    backfill planner, so it must never report success."""
    import shutil

    cutoff = (keep_after.year, keep_after.month)
    doomed = sorted(ym for ym in existing_months(state_path) if ym < cutoff)
    if dry_run or not doomed:
        return doomed
    pat_y = re.compile(r"^year=(\d+)$")
    pat_m = re.compile(r"^month=(\d+)$")
    failures: list[str] = []
    for root, dirs, _ in os.walk(state_path, topdown=False):
        my = pat_y.match(os.path.basename(root))
        if not my:
            continue
        y = int(my.group(1))
        for d in list(dirs):
            mm = pat_m.match(d)
            if mm and (y, int(mm.group(1))) < cutoff:
                target = os.path.join(root, d)
                try:
                    shutil.rmtree(target)
                except OSError as exc:
                    failures.append(f"{target}: {exc}")
        # prune a year dir left empty
        try:
            if not os.listdir(root):
                os.rmdir(root)
        except OSError:
            pass
    if failures:
        raise RuntimeError(
            "vacuum left partially-deleted months (backfill will NOT "
            "repair them — the directories still exist): "
            + "; ".join(failures)
        )
    return doomed

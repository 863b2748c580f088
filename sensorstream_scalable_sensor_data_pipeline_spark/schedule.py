"""Scheduling analog of the reference's Airflow DAG (SURVEY §3.2).

The reference's daily ``sensor_data_pipeline`` DAG (Airflow Dags.docx)
contributes three orchestration behaviors the engine itself does not
have:

* ``max_active_runs=1`` — at most one pipeline run at a time;
* ``retries=3`` with a delay — transient-failure tolerance;
* ``write_mode='append'`` on the 1st of the month, else
  ``'overwrite'`` (the ``get_config`` task's date switch).

This module provides those behaviors as a minimal, dependency-free
layer driving :func:`runner.run_pipeline`. It is NOT a scheduler —
cron/Airflow/Dagster owns *when*; this owns the per-run contract
(lock, retry, mode selection), which is exactly what the DAG's task
code does around ``main_with_config``.

Scale note: the run lock is a filesystem lock directory (atomic
``mkdir``) next to the output — on an object store, replace with a
conditional-put object; the semantics (acquire-or-fail, stale-age
takeover) are the same.
"""

from __future__ import annotations

import datetime as dt
import os
import time
from collections.abc import Callable
from dataclasses import replace
from typing import Any

from sensorstream_scalable_sensor_data_pipeline_spark.config import PipelineConfig


class RunLockHeld(RuntimeError):
    """Another active run holds the lock (``max_active_runs=1``)."""


class RunLock:
    """Filesystem run lock: atomic ``mkdir`` acquire, atomic stale
    takeover, ownership-checked release.

    Mirrors ``max_active_runs=1`` (Airflow Dags.docx DAG args): a
    second concurrent run fails fast instead of racing the writer. A
    lock older than ``stale_after_s`` is presumed dead (the DAG's
    2-hour ``execution_timeout``) and is reaped.

    Concurrency contract (race-tested with simultaneous acquirers):

    * acquire = one atomic ``mkdir`` + an owner-token file inside;
    * takeover = ``rename`` the stale dir aside (exactly one renamer
      can win) and RE-RUN the atomic ``mkdir`` — never ``utime`` on
      the shared dir, which lets every observer of staleness proceed
      at once;
    * release checks the owner token first, so a holder that was
      reaped while running cannot delete the new holder's lock.
    """

    def __init__(self, lock_dir: str, stale_after_s: float = 2 * 3600) -> None:
        import uuid

        self.lock_dir = lock_dir
        self.stale_after_s = stale_after_s
        self._token = f"{os.getpid()}:{uuid.uuid4().hex}"

    @property
    def _owner_file(self) -> str:
        return os.path.join(self.lock_dir, "owner")

    def _try_acquire(self) -> bool:
        try:
            os.makedirs(self.lock_dir, exist_ok=False)
        except FileExistsError:
            return False
        with open(self._owner_file, "w") as fh:
            fh.write(self._token)
        return True

    def _age(self) -> float | None:
        try:
            return time.time() - os.path.getmtime(self.lock_dir)
        except OSError:
            return None  # lock vanished (released) since we looked

    def __enter__(self) -> "RunLock":
        if self._try_acquire():
            return self
        age = self._age()
        if age is None:
            # Holder released between our mkdir failure and the stat —
            # one immediate retry of the atomic acquire.
            if self._try_acquire():
                return self
            raise RunLockHeld(
                f"lock {self.lock_dir} held (lost acquire race); "
                "max_active_runs=1"
            )
        if age < self.stale_after_s:
            raise RunLockHeld(
                f"lock {self.lock_dir} held (age {age:.0f}s); "
                "max_active_runs=1"
            )
        # Stale: reap under a dedicated reap mutex, RE-CHECKING
        # staleness inside it. Without the mutex two observers of the
        # same stale lock race: the first renames-and-reacquires, the
        # second's rename then steals the FIRST's fresh lock (the
        # takeover TOCTOU the r2 utime scheme had in worse form). With
        # it, the second reaper re-stats, sees a fresh lock, and backs
        # off; a crash-orphaned mutex older than the stale bound is
        # cleared rather than wedging takeover forever.
        import shutil

        mutex = self.lock_dir + ".reaping"
        try:
            os.makedirs(mutex, exist_ok=False)
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(mutex) >= self.stale_after_s:
                    os.rmdir(mutex)
            except OSError:
                pass
            raise RunLockHeld(
                f"lock {self.lock_dir} stale but another process is "
                "reaping it; max_active_runs=1"
            ) from None
        try:
            age = self._age()
            if age is not None and age >= self.stale_after_s:
                reaped = f"{self.lock_dir}.reaped.{self._token.split(':')[-1]}"
                try:
                    os.rename(self.lock_dir, reaped)
                except OSError:
                    pass
                else:
                    shutil.rmtree(reaped, ignore_errors=True)
        finally:
            try:
                os.rmdir(mutex)
            except OSError:
                pass
        if self._try_acquire():
            return self
        raise RunLockHeld(
            f"lock {self.lock_dir} held (lost acquire race); max_active_runs=1"
        )

    def __exit__(self, *exc: object) -> None:
        try:
            with open(self._owner_file) as fh:
                if fh.read() != self._token:
                    return  # reaped + re-acquired by someone else
            os.remove(self._owner_file)
            os.rmdir(self.lock_dir)
        except OSError:
            pass


def write_mode_for(run_date: dt.date) -> str:
    """The DAG's date switch (Airflow Dags.docx ``get_config``):
    append on the 1st of the month, overwrite otherwise."""
    return "append" if run_date.day == 1 else "overwrite"


def retry(
    fn: Callable[[], Any],
    retries: int = 3,
    delay_s: float = 0.0,
    backoff: float = 2.0,
) -> Any:
    """Run ``fn`` with up to ``retries`` retries and exponential
    backoff (DAG ``retries=3`` / ``retry_delay``). Re-raises the last
    error. A held run lock is NOT retried — a concurrent run is not a
    transient fault."""
    attempt = 0
    while True:
        try:
            return fn()
        except RunLockHeld:
            raise
        except Exception:
            attempt += 1
            if attempt > retries:
                raise
            if delay_s:
                time.sleep(delay_s * backoff ** (attempt - 1))


def scheduled_run(
    spark,
    cfg: PipelineConfig,
    run_date: dt.date | None = None,
    retries: int = 3,
    retry_delay_s: float = 0.0,
    run_fn: Callable[..., dict] | None = None,
    write_mode: str | None = None,
) -> dict:
    """One scheduled pipeline execution with the DAG's contract:
    lock → date-based write mode → retried run → stats.

    ``write_mode`` pins the mode, bypassing the 1st-of-month date
    switch (the CLI's ``--write-mode``). ``run_fn`` is injectable for
    tests; defaults to :func:`runner.run_pipeline`.
    """
    if run_fn is None:
        from sensorstream_scalable_sensor_data_pipeline_spark.runner import run_pipeline

        run_fn = run_pipeline
    run_date = run_date or dt.date.today()
    cfg = replace(cfg, write_mode=write_mode or write_mode_for(run_date))
    lock = RunLock(os.path.join(cfg.output_dir, "_run_lock"))
    with lock:
        stats = retry(
            lambda: run_fn(spark, cfg),
            retries=retries,
            delay_s=retry_delay_s,
        )
    return {**stats, "write_mode": cfg.write_mode, "run_date": run_date.isoformat()}

"""Python-worker daemon with the engine's heavy deps preloaded.

Spark forks Python workers from a long-lived daemon process
(``python -m pyspark.daemon``). Module imports that happen AFTER the
fork are paid once per worker: with 32 cores, the first Arrow/pandas
stage of every cold JVM spawns 32 workers that each import numpy,
pyarrow and pandas concurrently (~1-2 s apiece, all fighting for the
same cores as the tasks they serve). Measured on ``ivf_serve_large``
(r16): the NumPy scoring stage ran 26 executor-CPU-seconds but 195
run-seconds — wait, mostly first-use worker spawn — and a warm
session re-ran the same serve in 3.3 s vs 10.6 s cold.

This module is a drop-in ``spark.python.daemon.module`` target that
imports those deps ONCE in the daemon, so every forked worker
inherits them by copy-on-write — the standard preload-then-fork
pattern. Set by ``session.get_spark`` (a static conf; external
sessions can adopt it the same way they adopt ``ALLOCATOR_PINS``).

Import-time safety: none of these imports starts threads (thread
pools in OpenBLAS/pyarrow are created lazily on first use), so the
fork inherits no locked mutexes.
"""

import numpy  # noqa: F401  (preload: every Arrow scorer / decode path)
import pyarrow  # noqa: F401  (preload: Arrow batch serialization)

try:  # pandas is the heaviest worker import (mapInPandas paths)
    import pandas  # noqa: F401
except ImportError:  # pragma: no cover - pandas ships with pyspark
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()

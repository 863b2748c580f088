"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Runs the engine's headline queries on ``local[$SPARK_GRAFT_CPUS]``
against ``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) and
prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each head runs in its OWN subprocess/JVM, timed after an in-session
warmup job. Isolation is deliberate, not cosmetic: a long-lived local
JVM degrades monotonically as generated classes accumulate (JIT code
cache pressure + megamorphic call sites) — measured 6.4 s fresh vs
66 s after nine prior heads for the same query. Per-head isolation
measures the engine, not the harness history; JVM startup is excluded
by timing only the query inside the child.

Each head runs ``$SPARK_GRAFT_BENCH_REPS`` times (default 3) in
SEPARATE child JVMs and reports the per-head MEDIAN: n=1 samples made
round-over-round deltas unactionable (r4's +41 % `sim_ann_signlsh`
swing on byte-identical code; r3's e2e +14 %). Separate JVMs keep
every rep cold — an in-JVM repeat would measure the JIT-warm path and
break comparability with earlier rounds' cold numbers. All samples
ship in the JSON (``samples``) so spread is visible. When a head's
spread exceeds ~1.5×, the machine was contended: compare MIN-of-reps
and head-vs-control ratios across rounds, never absolute medians
(COVERAGE.md "Round-6 bench attribution" — r5's uniform 1.25-3.9×
inflation on frozen code re-measured at ×0.98-1.23 on a quiet box).

Heads with a ``<name>_setup`` hook in their EXTRA_HEADS module run it
BEFORE the timer (e.g. ``ivf_query_batch`` builds the index untimed —
the build is its own timed head; amortized serving cost is exactly
what the pair of numbers demonstrates). Setup hooks are additionally
PRE-RUN once in a throwaway ``--setup-only`` child before the timed
reps (r10 fix): when a setup does real work on the first rep only —
the PQ head's ~90 s index build into the shared cache dir — that
rep's JVM enters the timed region JIT/codegen-warm and reads ~2×
FASTER than the honest cold-JVM serve (measured r10: 6.3 s
build-rep vs 12.4/13.7 s cache-hit reps; the r9 5.8/13.5/11.8 s
inversion on this head was exactly this). The prepare child absorbs
the one-time work so every timed rep is a uniform cache-hit.

Each query is materialized with ``collect()`` over the full result
(r9 harness fix). Through round 8 the harness used ``count()``, which
lets Catalyst prune every column nobody consumes — the r5 doctrine
("end heads in an aggregate that consumes the computed columns",
plans/temporal.py, measured 0.29 s vs 8.56 s on a 20 M-row as-of
join) protected the EXTRA heads but was itself insufficient: (a) a
registry head returning PER-ROW output still loses its computed
expressions under count() (text_quality_score measured 0.28 s counted
vs 1.48 s collected at sf0.01 — which also explains the r7/r8
"movement on unchanged code": the counted number was a scan-plus-
startup residual, mostly noise), and (b) an ungrouped-aggregate head
constant-folds COMPLETELY — one output row needs none of its inputs
(dedup_substring: 1.87 s counted vs 7.07 s collected at sf0.1).
``collect()`` forces every output column; results are aggregate/top-k
sized so driver transfer is noise. Affected heads' r1-r8 numbers
under-measure; BENCH_r09 re-baselines them (audit table in
COVERAGE.md).

BASELINE-ERA DOCTRINE (r16 verdict item 9): ``_python_warmup`` (added
in r16) absorbs Python-worker-pool startup in the untimed region, so
**BENCH_r16 is the first record of the post-python-warmup era** —
wall-clock comparisons for Python-boundary heads are valid only
against BENCH_r16 and later; comparing against BENCH_r15 or earlier
conflates ~2-7 s/head of absorbed startup with code changes.
Cross-era (and cross-host-window) comparisons must use the per-head
``cpu_seconds`` axis, which is warmup-insensitive — and even CPU is
host-window-sensitive on this sandbox (measured ~8× CPU-seconds
inflation at 32-way concurrency, drifting between sessions on
identical code: the r17 session read the untouched skew pair at
1.5-2× its r16 CPU at zero steal). Same-host same-window A/Bs
(scripts/ab_head.py, min-steal rep) are the only change-attribution
signal; round-over-round absolutes are host-weather.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: Headline benchmark heads: the reference's end-to-end pipeline flow,
#: the hypertable rollup, the analytics suite, reshaping, and the
#: north-star text/dedup/similarity extensions.
HEADLINE = [
    "sensor_pipeline_e2e",
    "sensor_hourly_rollup",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "topk_per_group",
    "w1_pivot_wide",
    "text_token_stats",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "w2_sessionize",
    "sensor_sliding_rollup",
    "stream_hourly_rollup",
    "q6_forecast_revenue",
    "docs_curate_corpus",
    # Round 2: ANN heads added once driver-green (r1 judge #9); the 17
    # heads above are unchanged for round-over-round comparability.
    "sim_ann_ivf",
    "sim_ann_signlsh",
    # Round 3: the full curation composition — the end-to-end flow a
    # training-data user actually runs (r2 judge #8). Not in the
    # registry (driver 50-row cap); resolved via EXTRA_HEADS.
    "curate_training_corpus",
    # Round 5: the temporal-join family (sensor-domain daily drivers,
    # r3/r4 verdict "What's missing #1") and the persisted-IVF
    # build/serve split (r4 verdict task #6). The 20 heads above are
    # unchanged for round-over-round comparability.
    "asof_join",
    "range_join",
    "resample_locf",
    "rate_of_change",
    "ivf_index_build",
    "ivf_query_batch",
    # Round 6: the SQ8 serving tier vs the float tier (r5 verdict #5)
    # and the hot-key skew pair (r5 verdict #6) — plain vs bucketed
    # as-of on a deliberately skewed 6.4 M-row workload. The 26 heads
    # above are unchanged for round-over-round comparability.
    "ivf_query_batch_sq8",
    "asof_join_skewed",
    "asof_join_skewed_bucketed",
    # Round 6 (session 2): the learned-cluster semantic dedup chain,
    # the rolling-anomaly window, and native streaming sessionization.
    # The 29 heads above are unchanged for comparability.
    "semdedup",
    "rolling_zscore",
    "stream_sessionize",
    # Round 8: the large-corpus (300k × 96-dim) float-vs-SQ8 serving
    # pair — byte accounting where list size is material (r7 verdict
    # task #5) — and span-level exact-substring dedup over documents.
    # The 32 heads above are unchanged for comparability.
    "ivf_serve_large",
    "ivf_serve_large_sq8",
    "dedup_substring",
    # Round 9: the true stream-stream as-of join — correctness-pinned
    # since r8 but sessionize was the only streaming head with a
    # recorded cost (r8 verdict task #5) — and the curation capstone
    # WITH the span-level stage (r8 task #6; a separate head so the
    # carried capstone number stays comparable and the span stage's
    # cost is an explicit delta). The 35 heads above are unchanged
    # for comparability.
    "stream_asof_join",
    "curate_with_span_dedup",
    # Round 9 (session 2): the IVFPQ storage tier — third point of
    # the serving family (float 237 MB / SQ8 38 MB / PQ 7.9 MB lists
    # at 300k×96) with ADC LUT scoring. The 37 heads above are
    # unchanged for comparability.
    "ivf_serve_large_pq",
    # Round 10: HTML → text extraction (operators/html.py) over a
    # deterministic markup wrap of the documents table — the web-
    # corpus first stage's regex-chain throughput as a recorded
    # number, and the time-decay EWMA recurrence smoother
    # (operators/recurrence.py) over every event. The 38 heads above
    # are unchanged for comparability.
    "html_extract_corpus",
    "ewma_smooth",
    # Round 11: perceptual-hash image dedup (operators/phash.py) —
    # executor-side decode+hash over a 4×|documents| synthetic image
    # corpus with planted re-encode/rescale variants, rotating-block
    # Hamming candidates, closure, anti-join — and the streaming
    # funnel (r10 verdict task #6: the face's standing perf evidence,
    # like the other stream_* heads): the full event stream delivered
    # as 4 interleaved micro-batches + a watermark flush through the
    # 3-step funnel. The 40 heads above are unchanged for
    # comparability.
    "dedup_phash",
    "stream_funnel",
    "dedup_audio",
    # Round 13 (r12 verdict task #2): the decontamination twins — the
    # newest cross-table chains in the repo — promoted to standing
    # heads so a plan regression is visible round-over-round; both
    # assert their survivor count + id-sum against the planted closed
    # form IN-HEAD. The 43 heads above are unchanged for
    # comparability.
    "decontaminate_audio",
    "decontaminate_video",
    # Round 16: the incremental NEAR-dup text ingest — two-batch
    # delivery through the real staging/commit protocol with exact
    # re-deliveries rejected against signature state, structural
    # invariants asserted in-head. The 45 heads above are unchanged
    # for round-over-round comparability.
    "ingest_fuzzy",
]

#: Bench heads that are not registry entries (the registry sits at the
#: driver's 50-row cap): name → (module, attribute). If the module
#: also defines ``<attribute>_setup(spark, sf_dir)``, the child runs
#: it before starting the timer (untimed fixture construction).
EXTRA_HEADS = {
    "curate_training_corpus": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.text",
        "curate_training_corpus",
    ),
    # Round 8: q6 rotated out of the 50-slot driver registry (its slot
    # now carries the temporal family) but stays a HEADLINE head for
    # round-over-round comparability — resolved directly.
    "q6_forecast_revenue": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.analytics",
        "q6_forecast_revenue",
    ),
    "asof_join": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.temporal",
        "asof_join_head",
    ),
    "range_join": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.temporal",
        "range_join_head",
    ),
    "resample_locf": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.temporal",
        "resample_locf_head",
    ),
    "rate_of_change": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.temporal",
        "rate_of_change_head",
    ),
    "ivf_index_build": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.ann_serving",
        "ivf_index_build",
    ),
    "ivf_query_batch": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.ann_serving",
        "ivf_query_batch",
    ),
    "ivf_query_batch_sq8": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.ann_serving",
        "ivf_query_batch_sq8",
    ),
    "ivf_serve_large": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.ann_serving",
        "ivf_serve_large",
    ),
    "ivf_serve_large_sq8": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.ann_serving",
        "ivf_serve_large_sq8",
    ),
    "ivf_serve_large_pq": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.ann_serving",
        "ivf_serve_large_pq",
    ),
    "dedup_substring": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.dedup",
        "dedup_substring_head",
    ),
    "asof_join_skewed": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.temporal",
        "asof_join_skewed_head",
    ),
    "asof_join_skewed_bucketed": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.temporal",
        "asof_join_skewed_bucketed_head",
    ),
    "semdedup": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.dedup",
        "semdedup_head",
    ),
    "rolling_zscore": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.temporal",
        "rolling_zscore_head",
    ),
    "stream_sessionize": (
        "sensorstream_scalable_sensor_data_pipeline_spark.streaming.sessions",
        "stream_sessionize_head",
    ),
    "stream_asof_join": (
        "sensorstream_scalable_sensor_data_pipeline_spark.streaming.temporal",
        "stream_asof_join_head",
    ),
    "curate_with_span_dedup": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.text",
        "curate_with_span_dedup_head",
    ),
    "html_extract_corpus": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.text",
        "html_extract_corpus_head",
    ),
    "ewma_smooth": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.temporal",
        "ewma_smooth_head",
    ),
    "dedup_phash": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.multimodal",
        "dedup_phash_head",
    ),
    "stream_funnel": (
        "sensorstream_scalable_sensor_data_pipeline_spark.streaming.funnel",
        "stream_funnel_head",
    ),
    "dedup_audio": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.multimodal",
        "dedup_audio_head",
    ),
    # EXTRA_HEADS-only (not HEADLINE): the constant-alpha EWMA form's
    # scale rung for scripts/stress_sf1.py (ewma_smooth covers the
    # irregular form in the headline list).
    "ewma_constant": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.temporal",
        "ewma_constant_head",
    ),
    # EXTRA_HEADS-only: the banded (sampled-bit LSH) image-dedup
    # candidate path's scale rung — the subquadratic alternative to
    # dedup_phash's recall-guaranteed pigeonhole join.
    "dedup_phash_banded": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.multimodal",
        "dedup_phash_banded_head",
    ),
    # EXTRA_HEADS-only: frame-sampled video dedup's scale rung.
    "dedup_video": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.multimodal",
        "dedup_video_head",
    ),
    # EXTRA_HEADS-only (r12): fuzzy frame-match mode — pigeonhole
    # frame join at max_hamming=2, whose 21-bit blocks keep the
    # bucket term trivial (the measured de-scope boundary for the
    # image family's quadratic wall).
    "dedup_video_fuzzy": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.multimodal",
        "dedup_video_fuzzy_head",
    ),
    # EXTRA_HEADS-only: the image-curation capstone's scale rung
    # (metadata gate -> pHash dedup -> content-keyed split).
    "curate_image_corpus": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.multimodal",
        "curate_image_corpus_head",
    ),
    # Round 13: the decontamination twins (HEADLINE; r12 verdict
    # task #2) — cross-table audio probe-vote-verify and video
    # frame-match-offset-vote against staged stride-50 eval sets,
    # survivor counts asserted in-head.
    "decontaminate_audio": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.multimodal",
        "decontaminate_audio_head",
    ),
    "decontaminate_video": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.multimodal",
        "decontaminate_video_head",
    ),
    # Round 16: the incremental near-dup text ingest (HEADLINE) —
    # the newest incremental-family member's standing perf evidence.
    "ingest_fuzzy": (
        "sensorstream_scalable_sensor_data_pipeline_spark.plans.dedup",
        "ingest_fuzzy_head",
    ),
}


def _resolve_head(name: str):
    """Return (query_fn, setup_fn_or_None) for a head name."""
    if name in EXTRA_HEADS:
        import importlib

        mod, attr = EXTRA_HEADS[name]
        module = importlib.import_module(mod)
        return getattr(module, attr), getattr(module, f"{attr}_setup", None)
    from sensorstream_scalable_sensor_data_pipeline_spark import plans

    return plans.all_queries()[name], None


def run_setup_only(name: str) -> None:
    """Prepare-child mode: run the head's setup hook in a throwaway
    JVM so one-time work (index builds into the shared cache dir,
    stream input staging) never lands inside a timed rep's process.
    Without this, the first rep's setup does the heavy build and its
    JVM enters the timed region JIT-warm — measured 2× faster than
    the honest cold-JVM serve on ``ivf_serve_large_pq`` (r10)."""
    fn, setup = _resolve_head(name)
    if setup is None:
        return
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-setup-{name}",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
    )
    setup(spark, SF_DIR)
    spark.stop()


def _python_warmup(spark) -> None:
    """Neutral PYTHON-RUNTIME warmup (r16 optimization round, same
    doctrine as ``_stream_warmup`` below): the FIRST Python-boundary
    stage in a cold JVM pays the worker-daemon launch plus one
    serialized worker fork+handshake per core — thread dumps during
    ``decontaminate_video`` stage 6 showed 31/32 task threads BLOCKED
    on ``SparkEnv.createPythonWorker`` (the factory serializes
    creation), plus ArrowPythonRunner/classloader contention, all of
    it landing inside the timed region of whichever Python stage runs
    first. That is per-process startup — exactly what the untimed
    region-count warmup exists to absorb for the JVM half — not query
    work. One trivial ``mapInArrow`` over CPUS single-row partitions
    starts the daemon and forks a full worker pool outside the timed
    region (workers are reused by the head: spark.python.worker.reuse
    defaults true). Zero overlap with any head's inputs. Old-
    methodology numbers: BENCH_r15.json / BENCH_r16_baseline_self."""

    def _ident(batches):
        yield from batches

    n = int(spark.sparkContext.defaultParallelism)
    spark.range(0, n, 1, n).mapInArrow(_ident, "id long").collect()


def _stream_warmup(spark) -> None:
    """Neutral STREAMING warmup for ``stream_*`` heads (r10, quiet-
    stream-heads task): the FIRST streaming query in a JVM pays
    ~3-4.5 s of one-time machinery — streaming class loading, state
    store + offset/commit log init, micro-batch codegen — with high
    variance; measured cold-JVM `stream_hourly_rollup` reps spanned
    4.4-6.1 s (1.4×) while the same query warm ran 1.4 s with a
    stable ~0.85 s addBatch. The batch warmup above can't absorb any
    of it. This runs a 3-row windowed-count file stream through a
    memory sink — every piece of shared streaming machinery, zero
    overlap with any head's inputs or intermediates (throwaway
    parquet, throwaway checkpoint)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    wdir = tempfile.mkdtemp(prefix="bench_stream_warm_")
    try:
        spark.range(3).select(
            F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
            F.col("id").alias("v"),
        ).write.mode("overwrite").parquet(os.path.join(wdir, "in"))
        warm = (
            spark.readStream.schema("ts timestamp, v long")
            .parquet(os.path.join(wdir, "in"))
            .withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 second"))
            .count()
        )
        wq = (
            warm.writeStream.format("memory")
            .queryName("bench_stream_warm")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(wdir, "ckpt"))
            .start()
        )
        wq.awaitTermination(120)
    finally:
        shutil.rmtree(wdir, ignore_errors=True)


def _tree_cpu_seconds() -> float:
    """Total CPU seconds (user+sys, live + reaped-dead) consumed by
    THIS process and every descendant — the bench child's JVM and its
    Python workers included. Deltas of this around the timed region
    give a compute metric that is stable where wall breathes (r12
    verdict task #3: the decode-dominated heads' warm wall varies
    ±25-40 % across identical cold JVMs, wide enough to hide a real
    1.3× regression; CPU-seconds is work, not wait). Python-side
    decode work happens in Python WORKER processes, which Spark's own
    ``executorCpuTime`` metric excludes (the task thread blocks on
    the worker socket) — hence the process tree, not the REST API.
    Dead-child CPU is captured via the parents' cutime/cstime (rolled
    up at reap), live processes via their own utime/stime; a process
    is never counted both ways."""
    clk = os.sysconf("SC_CLK_TCK")
    stats: dict[int, tuple[int, float]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                rest = f.read().rsplit(")", 1)[1].split()
        except OSError:
            continue  # raced a process exit
        ppid = int(rest[1])
        cpu = (
            int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        ) / clk
        stats[int(d)] = (ppid, cpu)
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in stats.items():
        children.setdefault(ppid, []).append(pid)
    total, stack = 0.0, [os.getpid()]
    while stack:
        p = stack.pop()
        if p in stats:
            total += stats[p][1]
            stack.extend(children.get(p, []))
    return total


def _host_stat_ticks() -> tuple[int, int] | None:
    """(steal, iowait) tick counters from /proc/stat's aggregate cpu
    line — the host-interference signal. Two consecutive rounds'
    full-suite archives carried measured interference bursts that
    cost builder AND judge replay sessions to adjudicate by hand
    (r14 verdict task #3); sampling this around each rep makes the
    adjudication part of the record."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        # cpu user nice system idle iowait irq softirq steal ...
        return int(parts[8]), int(parts[5])
    except (OSError, IndexError, ValueError):
        return None


def _interference_cores(
    pre: tuple[int, int] | None, post: tuple[int, int] | None, wall: float
) -> tuple[float, float] | None:
    """Average cores lost to hypervisor steal / iowait across the
    window — tick deltas over wall, the same normalization as the
    r13/r14 manual adjudications (~141 core-s/min ≈ 2.3 cores)."""
    if pre is None or post is None or wall <= 0:
        return None
    clk = os.sysconf("SC_CLK_TCK")
    return (
        round((post[0] - pre[0]) / clk / wall, 2),
        round((post[1] - pre[1]) / clk / wall, 2),
    )


#: A head is auto-flagged as host-burst-suspect when its wall spread
#: across reps exceeds this while its CPU-seconds stay flat (work
#: unchanged, wait inflated — the interference fingerprint the r13/
#: r14 judges corroborated by manual replay).
BURST_WALL_SPREAD = 1.5
BURST_CPU_FLAT = 1.2


def run_one(name: str) -> None:
    """Child mode: build a session, warm up, run the head's untimed
    setup hook (if any), time one query."""
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-{name}",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
    )
    fn, setup = _resolve_head(name)
    # Warmup: absorb session/JVM/scan-machinery startup with a neutral
    # job — NOT the query under test (that would pre-populate its
    # persisted intermediates and under-report honest cost).
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

    load_table(spark, SF_DIR, "region").count()
    _python_warmup(spark)
    if name.startswith("stream_"):
        _stream_warmup(spark)
    if setup is not None:
        setup(spark, SF_DIR)
    t0 = time.time()
    # collect(), NOT count() (r9 harness fix): count() lets Catalyst
    # (a) prune every computed column of a per-row head — the scan and
    # row count survive but the expressions under test do not
    # (text_quality_score: 0.28 s counted vs 1.48 s collected at
    # sf0.01) — and (b) constant-fold a global-aggregate head outright
    # (an ungrouped aggregate always yields one row, so count()=1
    # needs none of its inputs; dedup_substring: 1.87 s vs 7.07 s at
    # sf0.1). collect() materializes every output column; head result
    # sets are aggregate/top-k sized (≤ ~100k narrow rows), so driver
    # transfer is noise. Affected heads' r1-r8 numbers under-measure;
    # BENCH_r09 is the honest re-baseline (see COVERAGE.md).
    cpu0 = _tree_cpu_seconds()
    df = fn(spark, SF_DIR)
    if os.environ.get("SPARK_GRAFT_BENCH_MATERIALIZE") == "count":
        # AUDIT-ONLY mode (scripts/audit_count_collect.py): reproduce
        # the pre-r9 count() harness so the counted-vs-collected delta
        # can be measured per head at bench scale. Never the default.
        rows = df.count()
    else:
        rows = len(df.collect())
    dt = round(time.time() - t0, 3)
    cpu_s = round(_tree_cpu_seconds() - cpu0, 3)
    print(json.dumps({"query": name, "sec": dt, "cpu_s": cpu_s, "rows": rows}))
    spark.stop()


#: Cold-JVM repetitions per head; the reported number is the median.
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def _run_child(name: str) -> dict | None:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one", name],
        capture_output=True,
        text=True,
        timeout=900,
    )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith('{"query"')]
    if proc.returncode != 0 or not line:
        print(f"  {name}: FAILED\n{proc.stderr[-500:]}", file=sys.stderr)
        return None
    return json.loads(line[-1])


def _head_has_setup(name: str) -> bool:
    """Parent-side check (module import only, no JVM) for whether a
    head declares a ``<name>_setup`` hook — gates the prepare child."""
    if name not in EXTRA_HEADS:
        return False
    import importlib

    mod, attr = EXTRA_HEADS[name]
    try:
        module = importlib.import_module(mod)
    except Exception:
        return False
    return getattr(module, f"{attr}_setup", None) is not None


def _run_prepare_child(name: str) -> None:
    """One throwaway ``--setup-only`` JVM per head with a setup hook,
    BEFORE its timed reps, so cache builds/input staging never warm a
    timed rep's JVM (see module docstring, r10 fix)."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--setup-only", name],
            capture_output=True,
            text=True,
            timeout=3600,
        )
    except subprocess.TimeoutExpired:
        print(f"  {name}: setup-only child timed out", file=sys.stderr)
        return
    if proc.returncode != 0:
        # a failed prepare means the FIRST timed rep would do the build
        # itself — the exact JIT-warm inversion this child exists to
        # remove — so warn loudly rather than record distorted reps
        print(
            f"  {name}: setup-only child FAILED (rc={proc.returncode}); "
            f"first timed rep may self-build and be distorted\n"
            f"{proc.stderr[-500:]}",
            file=sys.stderr,
        )


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--setup-only":
        run_setup_only(sys.argv[2])
        return

    per_query: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    cpu: dict[str, float] = {}
    cpu_samples: dict[str, list[float]] = {}
    steal: dict[str, float] = {}
    steal_samples: dict[str, list] = {}
    iowait: dict[str, float] = {}
    burst_heads: list[str] = []
    total = 0.0
    for name in HEADLINE:
        if _head_has_setup(name):
            _run_prepare_child(name)
        secs, cpus, rows = [], [], None
        steals, iowaits = [], []
        for _ in range(REPS):
            pre = _host_stat_ticks()
            w0 = time.time()
            rec = _run_child(name)
            interf = _interference_cores(
                pre, _host_stat_ticks(), time.time() - w0
            )
            if rec is not None:
                secs.append(rec["sec"])
                cpus.append(rec.get("cpu_s"))
                rows = rec["rows"]
                if interf is not None:
                    steals.append(interf[0])
                    iowaits.append(interf[1])
        if not secs:
            continue
        med = sorted(secs)[len(secs) // 2]
        per_query[name] = med
        samples[name] = secs
        cpus = [c for c in cpus if c is not None]
        if cpus:
            # CPU-seconds median: the compute metric that stays flat
            # where wall breathes (decode-dominated heads' ±25-40 %
            # band) — regressions in those heads are judged on THIS
            cpu[name] = sorted(cpus)[len(cpus) // 2]
            cpu_samples[name] = cpus
        if steals:
            steal[name] = sorted(steals)[len(steals) // 2]
            steal_samples[name] = steals
            iowait[name] = sorted(iowaits)[len(iowaits) // 2]
        # host-burst fingerprint: wall spread with flat CPU — work
        # unchanged, wait inflated. Flagged heads' medians should be
        # adjudicated against the steal annotation, not re-replayed.
        if (
            len(secs) >= 2
            and min(secs) > 0
            and max(secs) > BURST_WALL_SPREAD * min(secs)
            and cpus
            and min(cpus) > 0
            and max(cpus) <= BURST_CPU_FLAT * min(cpus)
        ):
            burst_heads.append(name)
        total += med
        print(
            f"  {name}: {med}s median of {secs} ({rows} rows; "
            f"cpu {cpu.get(name)}s of {cpus}; "
            f"steal {steal.get(name)} cores of {steals}, "
            f"iowait {iowait.get(name)})",
            file=sys.stderr,
            flush=True,
        )

    sf = None
    base = os.path.basename(SF_DIR.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "reps": REPS,
                "samples": samples,
                "cpu_seconds": cpu,
                "cpu_samples": cpu_samples,
                "steal_cores": steal,
                "steal_samples": steal_samples,
                "iowait_cores": iowait,
                "burst_heads": burst_heads,
                "sf": sf,
                "cpus": CPUS,
                "sf_dir": SF_DIR,
            }
        ),
        flush=True,
    )
    # The driver archives only the LAST 2000 chars of stdout and
    # json-parses the final line; the full record above outgrew that
    # window when per-rep samples landed (parsed=null since r6;
    # BENCH_r13's tail lost even the wall medians — r13 verdict task
    # #1). This SECOND, compact line is printed LAST so the archived
    # tail always carries the hard perf signal and parses again:
    # "queries" keeps the original scalar-medians contract; "cpu" is
    # the per-head CPU-seconds medians in the SAME key order as
    # "queries" (an aligned array so head names aren't paid twice —
    # ~1.5k chars at 45 heads, inside the window). "steal" (r15) is
    # the per-head median host-steal cores in the same order, and
    # "burst" lists heads whose wall spread exceeded 1.5x while CPU
    # stayed flat — the host-interference fingerprint, so burst
    # adjudication cites the archive instead of replay sessions.
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(total, 1),
                "unit": "sec",
                "queries": {k: round(v, 1) for k, v in per_query.items()},
                "cpu": [
                    round(cpu[k], 1) if k in cpu else None for k in per_query
                ],
                "steal": [
                    round(steal[k], 1) if k in steal else None
                    for k in per_query
                ],
                "burst": burst_heads,
                "sf": sf,
                "cpus": CPUS,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Scale-stress the most expensive bench heads at sf1 (~10× sf0.1).

The per-round bench runs at sf0.1; the engine's claims are about what
happens at 10-1000× that. This harness (r6 verdict task #7) builds a
deterministic sf1 by amplifying the driver's sf0.1 tables 10× —
organically, not by copy-pasting rows:

* ``documents``: replica 0 is the original; replicas 1-9 deterministically
  REORDER each document's tokens (sort by md5(token, doc_id, rep)) so
  replicas share token multisets but essentially no shingles — they do
  NOT become near-duplicates of the original (a naive 10× copy would
  make every doc a 10-clique of near-dups and blow the LSH candidate
  volume quadratically, measuring an artifact instead of scale-up).
* ``embeddings``: replicas rotate the 64 dims by ``rep`` (norms and
  value distribution preserved, neighborhoods changed); ``vec_id``
  strides by 2000 (a multiple of 100, so the heads' ``vec_id % 100``
  query-batch pattern scales organically).
* ``events``: replicas stride ``event_id``/``user_id`` and shift ``ts``
  by ``rep`` microseconds (all timestamps stay distinct).
* the small dimension tables copy through unchanged.

Then each requested head runs ONCE per scale in its own child JVM
(bench.py cold-measurement discipline) with the Spark UI enabled so
the child can sum per-stage shuffle read/write bytes from the REST
status API after the run. Output: one JSON line per (head, sf).

Usage:
    python scripts/stress_sf1.py [--gen-only] [--heads a,b,c] [out_dir]
    python scripts/stress_sf1.py --one <head> <sf_dir>   # child mode

Results land in stdout; the curated numbers + root-cause notes live in
COVERAGE.md ("sf1 scale-stress").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/tmp/spark_graft_sf1"
REPS = 10  # amplification factor

#: The most expensive heads of the r7 bench (median sec at sf0.1):
#: curate_training_corpus 9.99, semdedup 8.60, ivf_index_build 8.54,
#: dedup_minhash_lsh 8.07, sim_ann_ivf 7.99.
HEADS = [
    "curate_training_corpus",
    "semdedup",
    "ivf_index_build",
    "dedup_minhash_lsh",
    "sim_ann_ivf",
    # Round 9 (r8 verdict tasks #5/#8): the r8/r9 heads without sf1
    # evidence. The large-serving pair ignores sf_dir (fixed synthetic
    # corpus), so its 10× point scales the CORPUS instead via
    # SPARK_GRAFT_ANN_LARGE_N (see _head_env).
    "dedup_substring",
    "stream_asof_join",
    "ivf_serve_large",
    "ivf_serve_large_sq8",
    # Round 10 (r9 verdict task #5): the PQ tier's 3M×96 rung — the
    # ~15-25 min 3M build runs once, untimed, into the keyed cache.
    "ivf_serve_large_pq",
    # Round 10: the web-corpus extraction stage (zero-shuffle regex
    # chain — its scale trend is pure scan CPU) and the EWMA
    # linear-recurrence smoother (chunk-fold + carry-chain shape).
    "html_extract_corpus",
    "ewma_smooth",
    # Round 11 (r10 verdict task #4 + new-family coverage): the batch
    # funnel (three keyed as-of passes — wall and shuffle should scale
    # linearly), the CONSTANT-alpha EWMA form (the irregular form is
    # ewma_smooth's rung), the streaming funnel, and perceptual-hash
    # image dedup.
    "funnel_match",
    "ewma_constant",
    "stream_funnel",
    "dedup_phash",
    "dedup_audio",
    "dedup_video",
    "curate_image_corpus",
]

#: 10× corpus for the scale-fixed serving pair at the sf1 rung.
_ANN_LARGE_N_SF1 = 3_000_000


def _head_env(head: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    if head.startswith("ivf_serve_large") and sf_dir != SRC:
        env["SPARK_GRAFT_ANN_LARGE_N"] = str(_ANN_LARGE_N_SF1)
    return env


def generate(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    rep = F.explode(F.sequence(F.lit(0), F.lit(REPS - 1))).alias("rep")

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    # Stride by max+1 like the events branch — a count() stride
    # collides replica ids the moment the id space has a gap or offset
    # (review-found; sf0.1 happens to be dense 0..n-1, so the recorded
    # r8 numbers are unaffected).
    n_docs = int(docs.agg(F.max("doc_id") + 1).collect()[0][0])
    toks = F.split(F.col("text"), " ")
    reordered = F.array_join(
        F.expr(
            "transform(array_sort(transform(split(text, ' '), "
            "t -> struct(md5(concat(t, '|', cast(doc_id as string), '|', "
            "cast(rep as string))) as k, t as t))), s -> s.t)"
        ),
        " ",
    )
    (
        docs.select("*", rep)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(n_docs)).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(reordered)
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    vec_stride = 2000  # max vec_id 1999; multiple of 100 → query pattern scales
    dim = 64
    rotated = F.expr(
        f"concat(slice(embedding, rep + 1, {dim} - rep), slice(embedding, 1, rep))"
    )
    (
        emb.select("*", rep)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(vec_stride)).alias("vec_id"),
            F.when(F.col("rep") == 0, F.col("embedding"))
            .otherwise(rotated)
            .alias("embedding"),
            "label",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )

    # events.ts physically ships as TIMESTAMP_NTZ in this testdata
    # generation (verify skill gotcha) — load via load_table so the
    # normalization applies; the sf1 copy is written as plain TIMESTAMP.
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, SRC, "events")
    bounds = ev.agg(
        (F.max("event_id") + 1).alias("es"), (F.max("user_id") + 1).alias("us")
    ).collect()[0]
    (
        ev.select("*", rep)
        .select(
            (F.col("event_id") + F.col("rep") * F.lit(int(bounds["es"]))).alias(
                "event_id"
            ),
            F.timestamp_micros(F.unix_micros(F.col("ts")) + F.col("rep")).alias("ts"),
            (F.col("user_id") + F.col("rep") * F.lit(int(bounds["us"]))).alias(
                "user_id"
            ),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "events.parquet"))
    )

    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        spark.read.parquet(os.path.join(SRC, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{t}.parquet"))


def _shuffle_bytes(spark) -> tuple[int, int]:
    """Sum (shuffleReadBytes, shuffleWriteBytes) over all completed
    stages via the UI REST API (child sessions enable the UI)."""
    url = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{url}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{url}/api/v1/applications/{app_id}/stages")
    )
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return rd, wr


def run_one(head: str, sf_dir: str) -> None:
    import bench
    from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name=f"stress-{head}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
        extra_conf={"spark.ui.enabled": "true"},
    )
    from sensorstream_scalable_sensor_data_pipeline_spark import plans
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
        load_table,
    )

    setup = None
    if head in bench.EXTRA_HEADS:
        import importlib

        mod, attr = bench.EXTRA_HEADS[head]
        m = importlib.import_module(mod)
        fn = getattr(m, attr)
        # untimed fixture hook, same contract as bench.py's child:
        # without this the serving heads would lazily run their index
        # BUILD inside the timed region and the number measures the
        # wrong thing
        setup = getattr(m, f"{attr}_setup", None)
    else:
        fn = plans.all_queries()[head]
    load_table(spark, sf_dir, "region").count()  # warmup (negligible shuffle)
    if setup is not None:
        setup(spark, sf_dir)
    # baseline the stage counters so untimed setup/warmup shuffle
    # (e.g. the serving heads' index build) doesn't pollute the
    # measured head's bytes
    rd0, wr0 = _shuffle_bytes(spark)
    t0 = time.time()
    # collect(), not count() — same r9 harness fix as bench.py: count()
    # prunes computed columns / constant-folds global-agg heads
    rows = len(fn(spark, sf_dir).collect())
    dt = round(time.time() - t0, 3)
    rd, wr = _shuffle_bytes(spark)
    rd, wr = rd - rd0, wr - wr0
    print(
        json.dumps(
            {
                "head": head,
                "sf_dir": sf_dir,
                "sec": dt,
                "rows": rows,
                "shuffle_read_mb": round(rd / 1e6, 1),
                "shuffle_write_mb": round(wr / 1e6, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 3 and sys.argv[1] == "--one":
        run_one(sys.argv[2], sys.argv[3])
        return
    gen_only = "--gen-only" in sys.argv
    heads = HEADS
    argv = list(sys.argv[1:])
    if "--heads" in argv:
        i = argv.index("--heads")
        heads = argv[i + 1].split(",")
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    out_dir = args[0] if args else DEFAULT_OUT
    if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
        from sensorstream_scalable_sensor_data_pipeline_spark.session import get_spark

        spark = get_spark(app_name="gen-sf1", master="local[32]")
        t0 = time.time()
        generate(spark, out_dir)
        print(f"generated sf1 at {out_dir} in {time.time() - t0:.1f}s", file=sys.stderr)
        spark.stop()
    if gen_only:
        return
    for sf_dir in (SRC, out_dir):
        for head in heads:
            # prepare child (r10, same fix as bench.py): a head whose
            # setup hook does one-time work — the serving heads' index
            # BUILD into the keyed cache — must not do it inside the
            # timed child, where the untimed build JIT-warms the JVM
            # and the timed serve reads ~2× fast (measured on
            # ivf_serve_large_pq). Run the setup in a throwaway JVM
            # first so the timed child is a uniform cache-hit.
            env = _head_env(head, sf_dir)
            env["SPARK_GRAFT_SF_DIR"] = sf_dir
            bench_py = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "bench.py",
            )
            prep = subprocess.run(
                [sys.executable, bench_py, "--setup-only", head],
                capture_output=True,
                text=True,
                timeout=3000,
                env=env,
            )
            if prep.returncode != 0:
                print(
                    f"{head} @ {sf_dir}: setup-only child FAILED "
                    f"(rc={prep.returncode}); timed rep may self-build "
                    f"and be distorted\n{prep.stderr[-500:]}",
                    file=sys.stderr,
                )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", head, sf_dir],
                capture_output=True,
                text=True,
                timeout=3000,
                env=_head_env(head, sf_dir),
            )
            lines = [l for l in proc.stdout.splitlines() if l.startswith('{"head"')]
            if proc.returncode != 0 or not lines:
                print(f"{head} @ {sf_dir}: FAILED\n{proc.stderr[-800:]}", file=sys.stderr)
                continue
            print(lines[-1], flush=True)


if __name__ == "__main__":
    main()

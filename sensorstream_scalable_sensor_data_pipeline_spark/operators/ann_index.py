"""Persisted IVF index: build once, query many (§2.12 similarity
family, production shape).

``sim_ann_ivf`` trains + queries in one plan — right for a benchmark
head, wrong for serving, where the corpus is indexed once and queried
by many small batches. This module materializes the index the
Spark-native way:

* ``centroids/`` — the trained coarse quantizer, k rows;
* ``lists/`` — every corpus vector with its centroid assignment,
  written ``partitionBy(j)``: the inverted lists ARE the partition
  directories, so probing nprobe of k centroids is *partition
  pruning* — a query batch physically reads nprobe/k of the corpus
  bytes (plan-pinned: the list scan shows PartitionFilters on ``j``).

That is the classic IVF promise (FAISS's inverted lists) expressed
with nothing but a partitioned parquet layout + Catalyst pruning — no
custom storage, and any engine that reads parquet can serve it.

Scale notes: the build is one training pass + one assignment pass +
one partitioned write (all keyed/partial-aggregated, see
``plans/similarity.py``); queries broadcast the (tiny) centroid table
and the (small) probe set, so the only data-sized work is the pruned
list scan and one per-query top-k shuffle. The probe centroid ids are
collected to the driver — bounded by nprobe·|batch| ≤ k distinct
values, the same k·dim scale as the quantizer itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.functions.vectors import (
    grid_dot,
    int_dot,
)


def _grid_l2(a: F.Column, c: F.Column) -> F.Column:
    from sensorstream_scalable_sensor_data_pipeline_spark.plans.similarity import (
        _grid_l2 as impl,
    )

    return impl(a, c)


def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    out_dir: str,
    k: int = 10,
    sample_per_mille: int | None = None,
    quantize: bool = False,
) -> str:
    """Train the quantizer and materialize ``centroids/`` +
    ``lists/`` (inverted lists as ``partitionBy(j)`` directories).
    ``emb`` must carry (vec_id, embedding). Returns ``out_dir``.

    ``quantize=True`` stores the lists as SQ8 ``(codes, scale)``
    (operators/quantize.py) instead of float arrays — FAISS's
    IndexIVFScalarQuantizer tier: ~4× narrower list scans on the
    serving path for a small recall cost (ranking fidelity pinned in
    tests). ``n2`` is computed on the DEQUANTIZED vector so query-time
    cosines are exactly the cosines of the reconstructed vectors —
    scoring needs no knowledge of how lists are stored beyond the
    dequantize step."""
    from sensorstream_scalable_sensor_data_pipeline_spark.plans.similarity import (
        ivf_train,
    )

    from sensorstream_scalable_sensor_data_pipeline_spark.functions.localframe import (
        tiny_local_frame,
    )

    cent = tiny_local_frame(
        spark,
        ivf_train(spark, emb, k, sample_per_mille=sample_per_mille),
        "j int, c array<double>",
    )
    corpus_d = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", "j", _grid_l2(F.col("embedding"), F.col("c")).alias("dist"))
    )
    assigned = corpus_d.groupBy("vec_id").agg(
        F.min_by("j", F.struct("dist", "j")).alias("j")
    )
    joined = assigned.join(emb.select("vec_id", "embedding"), "vec_id")
    if quantize:
        from sensorstream_scalable_sensor_data_pipeline_spark.operators.quantize import (
            dequantize_embedding,
            quantize_embedding,
        )

        codes, scale = quantize_embedding(F.col("embedding"))
        staged = joined.select(
            "j", "vec_id", codes.alias("codes"), scale.alias("scale")
        )
        # Stage the dequantized array as an attribute before the dot:
        # grid_dot over a raw transform() would nest HOFs (the
        # dedup_fuzzy codegen cliff).
        staged = staged.withColumn(
            "_deq", dequantize_embedding(F.col("codes"), F.col("scale"))
        )
        lists = staged.select(
            "j",
            "vec_id",
            "codes",
            "scale",
            grid_dot(F.col("_deq"), F.col("_deq")).alias("n2"),
        )
    else:
        lists = joined.select(
            "j",
            "vec_id",
            "embedding",
            grid_dot(F.col("embedding"), F.col("embedding")).alias("n2"),
        )
    lists.write.mode("overwrite").partitionBy("j").parquet(
        os.path.join(out_dir, "lists")
    )
    cent.write.mode("overwrite").parquet(os.path.join(out_dir, "centroids"))
    return out_dir


def load_ivf_lists(
    spark: SparkSession, index_dir: str, probe_js: list[int] | None = None
) -> DataFrame:
    """The list scan; with ``probe_js`` the filter is a literal IN over
    the partition column, so Catalyst prunes to those directories."""
    lists = spark.read.parquet(os.path.join(index_dir, "lists"))
    if probe_js is not None:
        lists = lists.filter(F.col("j").isin(probe_js))
    return lists


def query_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    score: str = "auto",
    impl: str = "arrow",
) -> DataFrame:
    """Top-k cosine neighbors for a (query_id, embedding) batch from a
    persisted index: rank centroids per query (broadcast-k, window
    over the tiny query×k frame), prune the list scan to the probed
    partitions, score candidates, per-query top-k. Returns
    (query_id, nbr_id, cosine, rank).

    ``score`` applies only to SQ8-stored lists and picks the scoring
    arithmetic over the pruned candidates:

    * ``"int8"`` (and ``"auto"``, the default) — symmetric ADC, the
      FAISS-style fast path: the query batch is ALSO quantized once
      up front, and each candidate scores as
      ``q_scale·scale·Σ q_code_i·code_i`` — one exact BIGINT
      ``zip_with`` per candidate, no reconstructed float array, no
      per-element double multiply/floor. Exact integer arithmetic →
      order/engine-deterministic by construction. Ranking fidelity
      vs the float index is pinned in tests (the extra query-side
      quantization adds error ≤ max|q|/254 per component on top of
      the stored-code error the dequant path already has). Note the
      denominator reuses the STORED ``n2`` — the grid-floored norm
      of the float32-rounded reconstruction — while the numerator is
      the exact int8 dot, so the reported value is not exactly
      cos(q̂, x̂): it can marginally exceed 1 in magnitude and
      differs from the dequant path at the ULP level (harmless for
      ranking; pinned ≥0.8 top-k agreement in tests).
    * ``"dequant"`` — reconstruct each candidate vector
      (``codes·scale``) and grid-dot it against the float query:
      bit-identical cosines to a float index built from the
      dequantized vectors, at ~1.5× the float path's CPU (the r8
      driver-measured dequantize overhead this option preserves for
      when exact dequantized-cosine parity matters).

    Float-stored lists ignore ``score``.

    ``impl`` picks the candidate-scoring execution (r16 optimization,
    guide §4.2): ``"arrow"`` (default) runs the per-candidate grid
    arithmetic as NumPy over Arrow batches with a per-batch local
    top-k (functions/arrow_scoring.py — bit-identical cosines, the
    r16 stage profile put ~247 of this path's ~250 executor-CPU-
    seconds in interpreted HOF lambdas at the 300k corpus);
    ``"expr"`` keeps the fully-Catalyst expression path (the two are
    pinned equal in tests/test_ann_index.py).

    EAGER-SNAPSHOT SEMANTICS of ``impl="arrow"`` (documented r17, per
    the r16 advisory): building the returned DataFrame runs small
    Spark jobs NOW (the probe ranking is collected and baked into the
    ``mapInArrow`` closure), so re-executing the returned frame after
    the index directory is appended/rebuilt replays the snapshot's
    probes rather than re-deriving them. Callers that hold the frame
    lazily across index mutations should use ``impl="expr"``, whose
    fully-lazy plan recomputes probes at each execution."""
    if score not in ("auto", "int8", "dequant"):
        raise ValueError("score must be 'auto', 'int8' or 'dequant'")
    if impl not in ("arrow", "expr"):
        raise ValueError("impl must be 'arrow' or 'expr'")
    cent = spark.read.parquet(os.path.join(index_dir, "centroids"))
    qs = queries.select(
        F.col("query_id"),
        F.col("embedding").alias("q_emb"),
        grid_dot(F.col("embedding"), F.col("embedding")).alias("q_n2"),
    )
    qd = (
        qs.crossJoin(F.broadcast(cent))
        .select("query_id", "j", _grid_l2(F.col("q_emb"), F.col("c")).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy("dist", "j")
    probes = (
        qd.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "j")
    )
    # ≤ k distinct centroid ids for the whole batch — driver-bounded.
    probe_js = sorted({r["j"] for r in probes.select("j").distinct().collect()})
    lists = load_ivf_lists(spark, index_dir, probe_js)
    quantized = "codes" in lists.columns
    if quantized and score == "dequant":
        # SQ8-stored lists, dequant scoring: reconstruct vectors AFTER
        # partition pruning, so the narrow (codes, scale) form is what
        # crosses the scan; staged as an attribute before the dot (HOF
        # nesting discipline).
        from sensorstream_scalable_sensor_data_pipeline_spark.operators.quantize import (
            dequantize_embedding,
        )

        lists = lists.withColumn(
            "embedding", dequantize_embedding(F.col("codes"), F.col("scale"))
        ).select("j", "vec_id", "embedding", "n2")
    if quantized and score != "dequant":
        # symmetric int8 ADC: quantize the (tiny, broadcast) query
        # batch once; each candidate then costs ONE exact BIGINT
        # zip_with — no reconstructed array, no double mult/floor
        from sensorstream_scalable_sensor_data_pipeline_spark.operators.quantize import (
            quantize_embedding,
        )

        qc, qsc = quantize_embedding(F.col("q_emb"))
        bq = (
            probes.join(qs, "query_id")
            .select(
                "query_id", "j", qc.alias("q_codes"), qsc.alias("q_scale")
            )
            .withColumn(
                "q_hn2",
                F.col("q_scale")
                * F.col("q_scale")
                * int_dot(F.col("q_codes"), F.col("q_codes")).cast("double"),
            )
        )
        if impl == "arrow":
            # r16 (guide §4.2): the probe×query frame is the SAME
            # driver-bounded table F.broadcast(bq) already collects to
            # the driver; hand it to the NumPy ADC scorer instead and
            # score whole Arrow batches (exact int64 matmul). The
            # scorer emits per-(batch, query) top-k only, so the
            # window exchange shrinks from every candidate to ~k rows
            # per batch per query.
            from sensorstream_scalable_sensor_data_pipeline_spark.functions.arrow_scoring import (
                SCORED_SCHEMA,
                adc_int8_scorer,
            )

            scored = lists.select(
                "j", "vec_id", "codes", "scale", "n2"
            ).mapInArrow(adc_int8_scorer(bq.collect(), k), SCORED_SCHEMA)
        else:
            scored = (
                F.broadcast(bq)
                .join(lists, "j")
                .filter(F.col("vec_id") != F.col("query_id"))
                .select(
                    "query_id",
                    F.col("vec_id").alias("nbr_id"),
                    (
                        (F.col("q_scale") * F.col("scale"))
                        * int_dot(F.col("q_codes"), F.col("codes")).cast("double")
                        / (F.sqrt(F.col("q_hn2")) * F.sqrt(F.col("n2")))
                    ).alias("cosine"),
                )
            )
    elif impl == "arrow":
        # r16 (guide §4.2): same replacement for float-stored (and
        # dequant-staged) lists — NumPy reproduces the grid arithmetic
        # bit-exactly (functions/arrow_scoring.py module docstring).
        from sensorstream_scalable_sensor_data_pipeline_spark.functions.arrow_scoring import (
            SCORED_SCHEMA,
            grid_cosine_scorer,
        )

        probe_q = probes.join(qs, "query_id").select(
            "query_id", "j", "q_emb", "q_n2"
        )
        scored = lists.select("j", "vec_id", "embedding", "n2").mapInArrow(
            grid_cosine_scorer(probe_q.collect(), k), SCORED_SCHEMA
        )
    else:
        scored = (
            F.broadcast(probes.join(qs, "query_id"))
            .join(lists, "j")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("nbr_id"),
                (
                    grid_dot(F.col("q_emb"), F.col("embedding"))
                    / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("n2")))
                ).alias("cosine"),
            )
        )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def append_to_ivf_index(
    spark: SparkSession,
    index_dir: str,
    new_emb: DataFrame,
) -> int:
    """Incremental index maintenance: assign NEW vectors against the
    FROZEN trained quantizer and append them to the inverted lists —
    no retraining, no rewrite of existing lists (the partitioned
    parquet append lands only in the touched ``j=`` directories).
    This is how a serving index absorbs a daily embedding batch; the
    assignment is the same broadcast argmin as the build, so an
    appended vector lands exactly where a full rebuild with these
    centroids would put it (pinned in tests). Returns rows appended.

    Staleness contract, stated not hidden: centroids reflect the
    corpus at training time. Appends preserve CORRECTNESS of the
    probe (every vector is in its nearest frozen cell) but recall
    degrades as the distribution drifts away from the trained
    centroids — monitor mean assignment distance
    (:func:`assignment_drift`) and rebuild when it climbs.

    ``new_emb.vec_id`` must be disjoint from the indexed ids (the
    caller's contract — ids are content-addressed upstream; a dup id
    would serve twice)."""
    cent = spark.read.parquet(os.path.join(index_dir, "centroids"))
    assigned = (
        new_emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            F.col("j"),
            _grid_l2(F.col("embedding"), F.col("c")).alias("dist"),
        )
        .groupBy("vec_id")
        .agg(
            F.min_by(F.struct("j", "embedding"), F.struct("dist", "j")).alias("_a")
        )
        .select("vec_id", F.col("_a.j").alias("j"), F.col("_a.embedding").alias("embedding"))
    )
    sample = spark.read.parquet(os.path.join(index_dir, "lists")).limit(0)
    quantized = "codes" in sample.columns
    if quantized:
        from sensorstream_scalable_sensor_data_pipeline_spark.operators.quantize import (
            dequantize_embedding,
            quantize_embedding,
        )

        codes, scale = quantize_embedding(F.col("embedding"))
        staged = assigned.select(
            "j", "vec_id", codes.alias("codes"), scale.alias("scale")
        ).withColumn("_deq", dequantize_embedding(F.col("codes"), F.col("scale")))
        rows = staged.select(
            "j", "vec_id", "codes", "scale",
            grid_dot(F.col("_deq"), F.col("_deq")).alias("n2"),
        )
    else:
        rows = assigned.select(
            "j", "vec_id", "embedding",
            grid_dot(F.col("embedding"), F.col("embedding")).alias("n2"),
        )
    # count the CHEAP side: one row lands per input vec_id, so the
    # expensive crossJoin/quantize plan runs once (for the write), not
    # twice (review-found double execution)
    n = new_emb.select("vec_id").distinct().count()
    rows.write.mode("append").partitionBy("j").parquet(
        os.path.join(index_dir, "lists")
    )
    return n


def assignment_drift(
    spark: SparkSession, index_dir: str, emb: DataFrame
) -> float:
    """Mean grid-L2 distance of ``emb`` to its nearest FROZEN
    centroid — the rebuild-trigger metric for appended indexes
    (compare a fresh batch's drift against the trained corpus's own
    baseline; a sustained climb means the quantizer no longer fits
    the data). One broadcast argmin + one scalar mean. An EMPTY batch
    returns NaN — the monitoring job keeps running and the gap is
    visible, rather than a crash on a quiet day."""
    cent = spark.read.parquet(os.path.join(index_dir, "centroids"))
    d = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", _grid_l2(F.col("embedding"), F.col("c")).alias("dist"))
        .groupBy("vec_id")
        .agg(F.min("dist").alias("d"))
    )
    mean = d.agg(F.avg("d")).collect()[0][0]
    return float("nan") if mean is None else float(mean)

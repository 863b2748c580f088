"""Product quantization (PQ) storage tier for the ANN family.

SQ8 (operators/quantize.py) stores 1 byte per DIMENSION (96 B + scale
for the 96-dim corpus). PQ stores 1 byte per SUBSPACE: split each
vector into ``m`` contiguous subvectors, train a tiny k-means codebook
(``ksub`` ≤ 128 centroids — codes are one SIGNED byte, Spark has no
uint8) per subspace, and store each vector as ``m`` byte code
indices — 8 bytes/vector at ``m=8``, a further ~12× under
SQ8 and ~48× under float. That is FAISS's IndexIVFPQ storage shape
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011), and the tier that makes billion-vector serving fit in
memory at all.

Everything is Catalyst expressions — zero UDFs:

* **Train**: one subvector explode (``slice`` over ``sequence``),
  deterministic strided seeds per subspace, one Lloyd update with the
  same µ-grid integer sums as ``plans/similarity.ivf_train`` — the
  codebook (m·ksub·dsub doubles) is the only driver materialization.
* **Encode**: corpus × (m·ksub) broadcast argmin (``min_by`` partial
  aggregate, map-side combined — the shuffle carries one row per
  (vector, subspace)), then one ``array_sort(collect_list)`` fold to
  the ``codes`` array. ``n2`` (‖x̂‖²) falls out EXACTLY as the sum of
  the chosen centroids' squared norms — subspaces are orthogonal
  coordinate blocks, so the reconstruction has no cross terms.
* **Serve (ADC)**: per query, a lookup table ``lut[m][c] =
  grid_dot(q_sub_m, centroid_{m,c})`` (m·ksub grid dots over the
  broadcast-tiny query batch); each pruned candidate then scores as
  ``aggregate(zip_with(codes, lut, (c, row) → row[c+1]))`` — m array
  lookups and m-1 adds per candidate, NO per-dimension work at all.
  dot(q, x̂) = Σ_m dot(q_m, ĉ_m) exactly, so the ADC numerator is the
  true dot against the reconstruction; cosine uses the stored ‖x̂‖²
  and the query's own grid norm. Every float op is a fixed-order
  single IEEE op over deterministic grid dots → partition- and
  engine-deterministic, replayed bit-exactly in tests.

Scale notes (the reason this tier exists): at 10⁹+ vectors the
inverted lists are the dominant bytes; PQ cuts the pruned-partition
read another ~12× below SQ8 while ADC makes per-candidate CPU
*cheaper* than both float and SQ8 paths (no per-dimension multiply).
The codebook is m·ksub·dsub doubles — broadcast-trivial. The encode
pass fans out ×ksub per subspace map-side; it is the build-time
price, paid once, partial-aggregated, and bounded per row by
``m·ksub`` distance terms of ``dsub`` dims each (= ksub full-vector
distances — the same cost class as the coarse assignment).

Two encodings (both classic, Jégou et al. §IV / FAISS):

* **Raw** (default): PQ codes quantize the vector itself; one global
  codebook, ADC LUT per query, numerator = Σ_m lut[m][code_m].
* **Residual** (``residual=True``, FAISS's IVFPQ default): codes
  quantize ``x − c_j`` (the coarse cell's centroid). The codebook
  only has to cover the residual ball, not the whole space — at
  identical bytes the cells are tighter wherever the corpus actually
  clusters (pinned in tests on a clustered corpus; on a uniform
  corpus the gain collapses to ~nothing, which the test also
  records). Serving adds one scalar per (query, probe):
  numerator = grid_dot(q, c_j) + Σ_m lut[m][code_m], with the LUT
  dotted against residual centroids; ``n2`` stores the exact grid
  norm of the joint reconstruction ``c_j + r̂`` (per-(j,m,ci) sums,
  orthogonal blocks) so cosine stays engine-deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from sensorstream_scalable_sensor_data_pipeline_spark.functions.localframe import (
    tiny_local_frame,
)
from sensorstream_scalable_sensor_data_pipeline_spark.functions.vectors import (
    GRID,
    grid_dot,
)

#: Re-used grid literal for the Lloyd update's integer sums.
_GRID = GRID


def _grid_l2(a: F.Column, c: F.Column) -> F.Column:
    from sensorstream_scalable_sensor_data_pipeline_spark.plans.similarity import (
        _grid_l2 as impl,
    )

    return impl(a, c)


def subvector_frame(emb: DataFrame, m: int, dsub: int) -> DataFrame:
    """(vec_id, m, sub): one row per (vector, subspace), ``sub`` the
    dsub-dim contiguous slice. One ``posexplode`` over a ``slice``
    transform — scan-speed, no shuffle."""
    return emb.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" i -> slice(embedding, i * {dsub} + 1, {dsub}))"
            )
        ).alias("m", "sub"),
    )


def train_pq(
    spark: SparkSession,
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    sample_per_mille: int | None = None,
) -> list:
    """Train per-subspace codebooks; returns
    ``[(m, ci, centroid: list[float], sq: float)]`` with ``sq`` the
    centroid's grid squared norm (the ‖x̂‖² addend).

    Same shape as ``ivf_train``: deterministic strided seeds (the
    SAME seed vectors' slices seed every subspace), one Lloyd update
    as µ-grid integer sums grouped by (subspace, centroid, dim) —
    m·ksub·dsub rows to the driver, the codebook itself.
    ``sample_per_mille`` bounds training to the deterministic
    hash-bucket sample (sparse-id-safe seeding, min-id per stratum).

    Dense-ci contract: downstream ADC scoring indexes the per-query
    LUT POSITIONALLY (``element_at(row, code+1)``), so the returned
    codebook's ``ci`` values are always re-indexed to exactly
    ``range(n_seeds)`` here — sparse ``vec_id`` inputs (which would
    otherwise leave gaps in the strided ``vec_id // stride`` keys and
    silently mis-score every code above the first gap) are safe."""
    dim = len(emb.select("embedding").first()["embedding"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if not 2 <= ksub <= 128:
        raise ValueError(
            "ksub must be in [2, 128] (codes are one SIGNED byte — "
            "Spark has no uint8; 128 centroids/subspace is the "
            "byte-true ceiling here)"
        )
    dsub = dim // m
    base = emb.select("vec_id", "embedding")
    if sample_per_mille is not None:
        from sensorstream_scalable_sensor_data_pipeline_spark.plans.similarity import (
            ivf_seed_sampled_frame,
            ivf_training_sample,
        )

        base = ivf_training_sample(emb, sample_per_mille).select(
            "vec_id", "embedding"
        )
        seed_rows = sorted(
            ivf_seed_sampled_frame(base, ksub).collect(), key=lambda r: r["_b"]
        )
        seed_vecs = {i: [float(x) for x in r["e"]] for i, r in enumerate(seed_rows)}
    else:
        n = base.count()
        stride = max(1, n // ksub)
        strided = {
            int(r["vec_id"]) // stride: [float(x) for x in r["embedding"]]
            for r in base.filter(
                (F.col("vec_id") % stride == 0)
                & (F.col("vec_id") < stride * ksub)
            ).collect()
        }
        if len(strided) < min(ksub, n):
            # sparse / shifted ids: the dense-id modulo predicate
            # under-fills (possibly to zero) — fall back to the
            # hash-stratum seeding the sampled path uses
            from sensorstream_scalable_sensor_data_pipeline_spark.plans.similarity import (
                ivf_seed_sampled_frame,
            )

            strided = {
                int(r["_b"]): [float(x) for x in r["e"]]
                for r in ivf_seed_sampled_frame(base, ksub).collect()
            }
        # re-index to dense ci 0..len-1 (gapped keys would break
        # ADC's positional LUT lookup, which requires ci ==
        # range(n_seeds) exactly)
        seed_vecs = {
            i: v for i, (_, v) in enumerate(sorted(strided.items()))
        }
    # slice the seed vectors into per-subspace seed centroids
    seeds = {
        (mi, ci): v[mi * dsub : (mi + 1) * dsub]
        for ci, v in seed_vecs.items()
        for mi in range(m)
    }
    cb0 = tiny_local_frame(
        spark,
        [(mi, ci, c) for (mi, ci), c in sorted(seeds.items())],
        "m int, ci int, c array<double>",
    )
    sub = subvector_frame(base, m, dsub)
    # argmin per (vector, subspace): broadcast m·ksub rows, equi-join
    # on the subspace key so the fan-out is ×ksub (not ×m·ksub)
    d0 = sub.join(F.broadcast(cb0), "m").select(
        "vec_id", "m", "ci", _grid_l2(F.col("sub"), F.col("c")).alias("dist")
    )
    a0 = d0.groupBy("vec_id", "m").agg(
        F.min_by("ci", F.struct("dist", "ci")).alias("ci")
    )
    gexp = a0.join(sub, ["vec_id", "m"]).select(
        "m",
        "ci",
        F.posexplode(
            F.transform(
                "sub",
                lambda x: F.floor(x.cast("double") * F.lit(_GRID)).cast("long"),
            )
        ).alias("pos", "g"),
    )
    sums = gexp.groupBy("m", "ci", "pos").agg(
        F.sum("g").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()
    trained = {key: list(c) for key, c in seeds.items()}  # empty-cluster fallback
    for row in sums:
        # fixed op order (sum → /GRID → /count), same as ivf_train
        trained[(row["m"], row["ci"])][row["pos"]] = (
            row["s"] / _GRID / row["n"]
        )
    out = []
    for (mi, ci), c in sorted(trained.items()):
        # grid squared norm, same arithmetic the engine's grid_dot
        # applies (floor(c_i·c_i·GRID) exact-int sum, one descale)
        sq = sum(int(_floor(x * x * _GRID)) for x in c) / _GRID
        out.append((mi, ci, c, sq))
    return out


def _floor(x: float) -> float:
    """math.floor over a double product — single IEEE op chain,
    identical in Python, Spark and DuckDB."""
    import math

    return math.floor(x)


def _check_codebook_dim(df: DataFrame, col: str, m: int, dsub: int) -> None:
    """First-row probe (same probe ``train_pq`` uses): the input dim
    must equal ``m * dsub`` or ``slice`` silently yields short final
    subvectors → wrong codes / LUT dots with no error."""
    row = df.select(col).first()
    if row is None:
        return
    dim = len(row[col])
    if dim != m * dsub:
        raise ValueError(
            f"embedding dim {dim} != m*dsub = {m}*{dsub} = {m * dsub}: "
            "corpus/query dim and PQ codebook disagree"
        )


def codebook_df(spark: SparkSession, codebook: list) -> DataFrame:
    return tiny_local_frame(
        spark, codebook, "m int, ci int, c array<double>, sq double"
    )


def pq_encode(
    spark: SparkSession, emb: DataFrame, codebook: list
) -> DataFrame:
    """(vec_id, codes array<tinyint>[m], n2 double): per-subspace
    argmin against the broadcast codebook, folded into the code array
    ordered by subspace. ``n2`` = Σ_m ‖ĉ_{m,code_m}‖² — EXACTLY the
    reconstruction's squared norm (orthogonal coordinate blocks: no
    cross terms), summed in fixed subspace order."""
    m = 1 + max(r[0] for r in codebook)
    dsub = len(codebook[0][2])
    _check_codebook_dim(emb, "embedding", m, dsub)
    cb = codebook_df(spark, codebook)
    sub = subvector_frame(emb.select("vec_id", "embedding"), m, dsub)
    assigned = (
        sub.join(F.broadcast(cb), "m")
        .select(
            "vec_id",
            "m",
            "ci",
            "sq",
            _grid_l2(F.col("sub"), F.col("c")).alias("dist"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min_by(F.struct("ci", "sq"), F.struct("dist", "ci")).alias("a"))
        .select("vec_id", "m", F.col("a.ci").alias("ci"), F.col("a.sq").alias("sq"))
    )
    return (
        assigned.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("m", "ci", "sq"))).alias("s"))
        .select(
            "vec_id",
            F.transform("s", lambda e: e["ci"].cast("tinyint")).alias("codes"),
            F.aggregate(
                F.transform("s", lambda e: e["sq"]),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("n2"),
        )
    )


def build_ivfpq_index(
    spark: SparkSession,
    emb: DataFrame,
    out_dir: str,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    sample_per_mille: int | None = None,
    residual: bool = False,
) -> str:
    """IVF partition layout (lists ARE ``partitionBy(j)`` directories,
    probing = partition pruning — same contract as
    ``operators/ann_index.build_ivf_index``) with PQ-coded rows:
    ``(j, vec_id, codes[m], n2)`` — m bytes of payload per vector.
    Writes ``centroids/`` (coarse), ``codebook/`` (PQ), ``meta/``
    (the encoding flag) and ``lists/``. Returns ``out_dir``.

    ``residual=True`` (FAISS's IVFPQ default) trains and encodes the
    PQ over ``x − c_j`` instead of ``x`` — same bytes, tighter cells
    on clustered corpora (module docstring). ``n2`` then stores the
    exact grid norm of the JOINT reconstruction ``c_j + r̂`` via a
    per-(j, m, ci) sum table (k·m·ksub rows, driver-computed,
    broadcast), so serving cosine stays exact-replayable."""
    from sensorstream_scalable_sensor_data_pipeline_spark.plans.similarity import (
        ivf_train,
    )

    cent_rows = ivf_train(spark, emb, k, sample_per_mille=sample_per_mille)
    cent = tiny_local_frame(spark, cent_rows, "j int, c array<double>")
    assigned = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", "j", _grid_l2(F.col("embedding"), F.col("c")).alias("dist"))
        .groupBy("vec_id")
        .agg(F.min_by("j", F.struct("dist", "j")).alias("j"))
    )
    if residual:
        base = (
            emb.select("vec_id", "embedding")
            .join(assigned, "vec_id")
            .join(F.broadcast(cent), "j")
            .select(
                "vec_id",
                F.zip_with(
                    "embedding", "c", lambda x, c: x.cast("double") - c
                ).alias("embedding"),
            )
        )
        codebook = train_pq(
            spark, base, m=m, ksub=ksub, sample_per_mille=sample_per_mille
        )
        coded = pq_encode(spark, base, codebook).select("vec_id", "codes")
        # joint-reconstruction grid norms per (coarse cell, subspace,
        # code): ‖c_j,m + ĉ_m,ci‖² with the engine's exact floor-sum
        dsub = len(codebook[0][2])
        jsq_rows = []
        for j, cvec in cent_rows:
            for mi, ci, rc, _ in codebook:
                joint = [
                    cvec[mi * dsub + d] + rc[d] for d in range(dsub)
                ]
                sq = sum(int(_floor(x * x * _GRID)) for x in joint) / _GRID
                jsq_rows.append((int(j), mi, ci, sq))
        jsq = tiny_local_frame(
            spark, jsq_rows, "j int, m int, ci int, jsq double"
        )
        n2 = (
            coded.join(assigned, "vec_id")
            .select(
                "vec_id",
                "j",
                F.posexplode(
                    F.transform("codes", lambda c: c.cast("int"))
                ).alias("m", "ci"),
            )
            .join(F.broadcast(jsq), ["j", "m", "ci"])
            .groupBy("vec_id")
            .agg(F.array_sort(F.collect_list(F.struct("m", "jsq"))).alias("s"))
            .select(
                "vec_id",
                F.aggregate(
                    F.transform("s", lambda e: e["jsq"]),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("n2"),
            )
        )
        coded = coded.join(n2, "vec_id")
    else:
        codebook = train_pq(
            spark, emb, m=m, ksub=ksub, sample_per_mille=sample_per_mille
        )
        coded = pq_encode(spark, emb, codebook)
    lists = assigned.join(coded, "vec_id").select("j", "vec_id", "codes", "n2")
    lists.write.mode("overwrite").partitionBy("j").parquet(
        os.path.join(out_dir, "lists")
    )
    cent.write.mode("overwrite").parquet(os.path.join(out_dir, "centroids"))
    codebook_df(spark, codebook).write.mode("overwrite").parquet(
        os.path.join(out_dir, "codebook")
    )
    spark.createDataFrame([(bool(residual),)], "residual boolean").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "meta"))
    return out_dir


def _query_luts(qs: DataFrame, cb: DataFrame, m: int, dsub: int) -> DataFrame:
    """Per-query ADC lookup table ``(query_id, lut)`` with
    ``lut[m][ci] = grid_dot(q_sub_m, ĉ_{m,ci})``: explode queries into
    subvectors, dot against the broadcast codebook, fold back
    ci-ordered then m-ordered — the whole frame is |batch|·m·ksub
    rows, broadcast-sized. ``qs`` must carry (query_id, q_emb)."""
    qsub = qs.select(
        "query_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" i -> slice(q_emb, i * {dsub} + 1, {dsub}))"
            )
        ).alias("m", "sub"),
    )
    return (
        qsub.join(F.broadcast(cb), "m")
        .select(
            "query_id", "m", "ci",
            grid_dot(F.col("sub"), F.col("c")).alias("v"),
        )
        .groupBy("query_id", "m")
        .agg(F.array_sort(F.collect_list(F.struct("ci", "v"))).alias("s"))
        .select(
            "query_id", "m",
            F.transform("s", lambda e: e["v"]).alias("row"),
        )
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("m", "row"))).alias("s"))
        .select(
            "query_id",
            F.transform("s", lambda e: e["row"]).alias("lut"),
        )
    )


def _adc_lut_sum() -> F.Column:
    """Σ_m lut[m][code_m] over a row carrying ``codes`` and ``lut`` —
    m positional array lookups + m−1 adds per candidate, folded in
    fixed subspace order from 0.0 (the order every exact replay —
    numpy and DuckDB — mirrors op for op)."""
    return F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("lut"),
            lambda c, row: F.element_at(row, c.cast("int") + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_topk(
    spark: SparkSession,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    codebook: list | None = None,
) -> DataFrame:
    """Flat-PQ ADC top-k cosine — the FAISS ``IndexPQ`` tier: train
    the per-subspace codebook (or reuse ``codebook``), encode the
    corpus to m-byte codes + one stored ‖x̂‖², and score EVERY
    candidate against the per-query LUT. A full scan, but over
    ~m + 8 bytes per vector instead of the raw floats (~16× narrower
    than the 64-dim float32 corpus at m=8) and each candidate costs
    m array lookups + m adds — no per-dimension work. The coarse-pruned
    ``build_ivfpq_index``/``query_ivfpq_index`` pair is the 100 TB
    serving path; flat PQ is the right tier when the corpus fits a
    scan but raw vectors don't, and it is the registry-shaped face of
    the PQ family (r13 rotation queue): train → encode → LUT → fold
    is grid-integer exact throughout, so a DuckDB oracle replays the
    whole chain value-for-value.

    Returns (query_id, nbr_id, cosine, rank); ties rank by nbr_id.

    SELF-EXCLUSION contract (family-wide, shared with the IVF
    servers and the registry oracle): a candidate whose ``vec_id``
    NUMERICALLY equals the row's ``query_id`` is excluded — the
    convention assumes queries are drawn from the corpus (the
    registry shape). If your queries come from a SEPARATE table whose
    ``query_id`` namespace happens to overlap corpus ``vec_id``
    values, re-key one side (e.g. offset the query ids) before
    calling, or a legitimate corpus neighbor with the colliding id is
    silently dropped from that query's top-k (r12 ADVICE)."""
    cb_list = (
        codebook if codebook is not None else train_pq(spark, emb, m=m, ksub=ksub)
    )
    m = 1 + max(r[0] for r in cb_list)
    dsub = len(cb_list[0][2])
    _check_codebook_dim(emb, "embedding", m, dsub)
    cb = codebook_df(spark, cb_list)
    codes = pq_encode(spark, emb, cb_list)
    qs = queries.select(
        "query_id",
        F.col("embedding").alias("q_emb"),
        grid_dot(F.col("embedding"), F.col("embedding")).alias("q_n2"),
    )
    bq = qs.select("query_id", "q_n2").join(
        _query_luts(qs, cb, m, dsub), "query_id"
    )
    # query batches are broadcast-tiny by contract (plans/similarity
    # module doctrine) — the BNL join fans the scan out ×|batch| over
    # ~24-byte rows (m codes + n2 + id), never the raw vectors
    scored = (
        codes.crossJoin(F.broadcast(bq))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("nbr_id"),
            (
                _adc_lut_sum() / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("n2")))
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


def query_ivfpq_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    impl: str = "arrow",
) -> DataFrame:
    """Top-k ADC cosine from a persisted IVFPQ index. Probe selection
    is identical to the float/SQ8 index (broadcast coarse centroids,
    per-query top-nprobe, pruned partition scan). Scoring builds the
    per-query LUT — ``lut[m][ci] = grid_dot(q_sub_m, ĉ_{m,ci})``,
    m·ksub grid dots over the tiny broadcast query batch — then each
    candidate costs m array lookups + m−1 adds:
    ``aggregate(zip_with(codes, lut, (c, row) → row[c+1]))``.
    For a residual index (``meta/``), the LUT is dotted against the
    residual codebook and each candidate's numerator adds the scalar
    ``grid_dot(q, c_j)`` carried on its probe row — one extra add per
    candidate, no per-dimension work.

    ``impl="arrow"`` (default) carries the same EAGER-SNAPSHOT
    semantics as ``query_ivf_index`` (documented r17, per the r16
    advisory): probe rows and LUTs are collected at frame-construction
    time and baked into the ``mapInArrow`` closure, so re-executing
    the returned frame after an index append replays the snapshot;
    hold frames lazily across index mutations only with
    ``impl="expr"``.

    Returns (query_id, nbr_id, cosine, rank)."""
    cent = spark.read.parquet(os.path.join(index_dir, "centroids"))
    cb = spark.read.parquet(os.path.join(index_dir, "codebook"))
    # Detect residual encoding through the same IO layer as the rest of
    # the index (HDFS/S3 URIs work everywhere spark.read.parquet does;
    # os.path.exists would silently return False there and score a
    # residual index as raw). Fall back to raw ONLY when the path truly
    # lacks a meta/ dataset (pre-residual indexes).
    residual = False
    try:
        residual = bool(
            spark.read.parquet(os.path.join(index_dir, "meta")).first()["residual"]
        )
    except AnalysisException:
        residual = False
    qs = queries.select(
        "query_id",
        F.col("embedding").alias("q_emb"),
        grid_dot(F.col("embedding"), F.col("embedding")).alias("q_n2"),
    )
    qd = qs.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "j",
        _grid_l2(F.col("q_emb"), F.col("c")).alias("dist"),
        grid_dot(F.col("q_emb"), F.col("c")).alias("qc"),
    )
    w = Window.partitionBy("query_id").orderBy("dist", "j")
    probes = (
        qd.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "j", "qc")
    )
    probe_js = sorted({r["j"] for r in probes.select("j").distinct().collect()})
    lists = spark.read.parquet(os.path.join(index_dir, "lists")).filter(
        F.col("j").isin(probe_js)
    )
    mq = cb.agg(F.max("m")).collect()[0][0] + 1
    dsub = len(cb.select("c").first()["c"])
    _check_codebook_dim(queries, "embedding", mq, dsub)
    bq = probes.join(qs.select("query_id", "q_n2"), "query_id").join(
        _query_luts(qs, cb, mq, dsub), "query_id"
    )
    if impl == "arrow":
        # r16 (guide §4.2): the probe×LUT frame is the same
        # driver-bounded table F.broadcast(bq) collects anyway; hand
        # it to the NumPy ADC-LUT scorer (sequential subspace fold —
        # bit-identical to the Catalyst aggregate; see
        # functions/arrow_scoring.py) and score whole Arrow batches,
        # emitting per-(batch, query) top-k only.
        from sensorstream_scalable_sensor_data_pipeline_spark.functions.arrow_scoring import (
            SCORED_SCHEMA,
            adc_lut_scorer,
        )

        scored = lists.select("j", "vec_id", "codes", "n2").mapInArrow(
            adc_lut_scorer(bq.collect(), k, residual), SCORED_SCHEMA
        )
    else:
        lut_sum = _adc_lut_sum()
        numerator = (lut_sum + F.col("qc")) if residual else lut_sum
        scored = (
            F.broadcast(bq)
            .join(lists, "j")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("nbr_id"),
                (
                    numerator / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("n2")))
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

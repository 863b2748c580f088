"""Similarity search over the ``embeddings`` table (SURVEY §2.12):
brute-force cosine top-k as the exactness baseline, an IVF-style
partition-probed variant as the scale path, and a sign-LSH bucketing
variant. Top-k ranking literature: PAPERS.md (EDBT'20 / ICDE'21
threshold-&-rank algorithms); the Spark realization is the built-in
Window group-limit (operators/topk.py) — Catalyst pushes ``rn <= k``
into the window sort so each partition retains only k rows per query.

All cosines are grid-exact (functions/vectors.py), so ranks and
thresshold cuts are deterministic across engines — which is what makes
a *similarity ranking* oracle-checkable at all. Ties broken by
neighbor id in every query.

Scale notes: the query side is always the small side — broadcast it;
the corpus scan is then shuffle-free for brute force, and the IVF /
LSH variants add one keyed equi-join on the coarse bucket (uniform
for IVF with balanced centroids; sign-LSH bucket occupancy is
data-dependent and AQE-skew-splittable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.functions.vectors import (
    grid_cosine_sql,
    grid_dot,
    grid_dot_sql,
)
from sensorstream_scalable_sensor_data_pipeline_spark.functions.localframe import (
    tiny_local_frame,
)
from sensorstream_scalable_sensor_data_pipeline_spark.plans.registry import query
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

#: Query subset: every 100th vector plays the "incoming query" role.
_QUERY_PRED = "vec_id % 100 = 0"
_K = 5

_COS_QC = grid_cosine_sql("q.embedding", "c.embedding")


def _queries_and_corpus(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("nbr_id"),
        F.col("embedding").alias("c_emb"),
        F.col("label").alias("c_label"),
        grid_dot(F.col("embedding"), F.col("embedding")).alias("c_n2"),
    )
    qs = emb.filter(F.expr(_QUERY_PRED)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
        grid_dot(F.col("embedding"), F.col("embedding")).alias("q_n2"),
    )
    return qs, corpus


def _topk(scored: DataFrame, k: int = _K) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


@query(
    "sim_topk_cosine",
    oracle=f"""
    SELECT query_id, nbr_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             {_COS_QC} AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_COS_QC} DESC, c.vec_id ASC
             ) AS rank
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.{_QUERY_PRED}
    ) WHERE rank <= {_K}
    """,
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query set
    against the full corpus, rank per query with a window group-limit.
    The corpus side never shuffles for scoring — the only shuffle is
    the per-query top-k (keyed by query_id, k rows survive per
    partition before the shuffle). This is the exactness baseline the
    ANN variants are measured against; at 100 TB you run it only on
    sampled slices."""
    qs, corpus = _queries_and_corpus(spark, sf_dir)
    scored = (
        F.broadcast(qs)
        .join(corpus, F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            (
                grid_dot(F.col("q_emb"), F.col("c_emb"))
                / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("c_n2")))
            ).alias("cosine"),
        )
    )
    return _topk(scored)


# --- IVF: trained coarse quantizer -----------------------------------
#
# k strided seed centroids — every vector whose id is a multiple of
# ⌊n/k⌋, selected by a PUSHED-DOWN modulo filter on the id column (a
# deterministic spread-out init; first-k seeding measured 0.44-0.52
# recall@5 vs 0.96-1.00 for strided) — refined by ONE Lloyd iteration
# with exact µ-grid arithmetic, so the *training* — not just the
# assignment — replays bit-identically in DuckDB: squared-L2 distances
# are floored onto the grid and summed as BIGINTs (exact argmin, ties
# → smaller centroid id), and centroid updates are exact integer
# per-dimension sums divided in a fixed order (sum/GRID/count, each a
# single IEEE op).
#
# Scale shape of seed selection: NO window anywhere — the r2 version
# ranked the whole corpus through one unpartitioned row_number task to
# pick k rows; the modulo filter selects the same k seeds (ids here
# are dense 0..n-1, so id ≡ rank) as a scan-level predicate that
# parallelizes like any filter. The Lloyd pass itself is one
# partial-aggregated (cluster, dim) shuffle over the corpus — the same
# cost class as the index build's mandatory assignment scan. For
# corpora where even that one extra pass matters (or ids are sparse),
# ``ivf_train(..., sample_per_mille=...)`` bounds every training job
# to a deterministic hash-bucket sample — FAISS/ScaNN practice (train
# the coarse quantizer on 10⁴-10⁶ sampled vectors); the registered
# query keeps the full-table default, which its oracle replays.
# nprobe=2: each query probes its two nearest centroids — candidates
# shrink ~×(k/nprobe) vs brute force.

_IVF_K = 10
_IVF_NPROBE = 2
_GRID_LIT = "1000000.0"  # functions/vectors.py GRID, as a SQL literal
#: Salt for the opt-in training sample (decorrelated from any
#: split/sample the corpus also carries — operators/sampling.py).
_IVF_SAMPLE_SALT = "ivf"


def ivf_training_sample(emb: DataFrame, per_mille: int) -> DataFrame:
    """Deterministic training sample: the same salted md5 bucket
    identity as operators/sampling.py (oracle-replayable)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.sampling import (
        hash_bucket,
    )

    return emb.filter(
        hash_bucket(F.col("vec_id"), salt=_IVF_SAMPLE_SALT) < per_mille
    )


def ivf_seed_frame(emb: DataFrame, k: int, stride: int) -> DataFrame:
    """The ≤k strided seeds as (j, c): a pushed-down modulo filter on
    the id column — no corpus-wide window anywhere in seed selection
    (tests pin the plan as Window-free). ``j = vec_id ÷ stride`` so
    both engines label seeds identically without ranking anything.

    DENSE-ID PATH ONLY: the modulo predicate assumes ids 0..n−1 (id ≡
    rank). On a sparse-id frame — e.g. a hash-bucket training sample —
    it selects ~k·density seeds instead of k (possibly zero);
    :func:`ivf_seed_sampled_frame` is the sparse-safe variant."""
    return (
        emb.select("vec_id", "embedding")
        .filter((F.col("vec_id") % stride == 0) & (F.col("vec_id") < stride * k))
        .select(
            F.expr(f"CAST(vec_id DIV {stride} AS INT)").alias("j"),
            F.transform("embedding", lambda x: x.cast("double")).alias("c"),
        )
    )


def ivf_seed_sampled_frame(base: DataFrame, k: int) -> DataFrame:
    """Sparse-id-safe seeding: bucket ids into k deterministic md5
    strata (the same salted hash identity as operators/sampling.py)
    and take the min-id vector per stratum — exactly one seed per
    non-empty stratum, regardless of how sparse the ids are. One
    map-side-combined ``min_by`` aggregate over the (already small)
    sample; still no window, no rank, no driver data beyond the k
    seeds themselves. With a uniform hash and sample ≫ k the
    probability of an empty stratum is negligible (k·(1−1/k)^n)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.sampling import (
        hash_bucket,
    )

    b = hash_bucket(F.col("vec_id"), buckets=k, salt="ivf-seed")
    return (
        base.select(b.alias("_b"), "vec_id", "embedding")
        .groupBy("_b")
        .agg(F.min_by("embedding", "vec_id").alias("e"))
    )


def _grid_l2(a: F.Column, c: F.Column) -> F.Column:
    """Exact grid squared-L2 between a float array and a double array
    (argmin-safe across engines; not descaled — comparisons only)."""
    terms = F.zip_with(
        a,
        c,
        lambda x, y: F.floor(
            (x.cast("double") - y) * (x.cast("double") - y) * F.lit(1_000_000.0)
        ).cast("long"),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc + v)


def _grid_l2_sql(a: str, c: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> CAST(FLOOR((CAST({a}[i] AS DOUBLE) - {c}[i])"
        f" * (CAST({a}[i] AS DOUBLE) - {c}[i]) * {_GRID_LIT}) AS BIGINT)))"
    )


def ivf_train(
    spark: SparkSession,
    emb: DataFrame,
    k: int = _IVF_K,
    sample_per_mille: int | None = None,
) -> list:
    """Train the coarse quantizer: deterministic strided seeds + one
    Lloyd update. Returns ``[(j, centroid: list[float])]``.

    Scale shape: seed selection is a pushed-down modulo filter (no
    window, no rank — see :func:`ivf_seed_frame`); the assignment pass
    is a corpus × k broadcast nested-loop carrying no payload ×k; the
    update is one partial-aggregated shuffle of (cluster, dim) keyed
    grid sums — k·dim rows out. The only driver materialization is
    k·dim doubles (the quantizer itself), which is what ships to
    executors as the index. ``sample_per_mille`` bounds every training
    job to the deterministic hash-bucket sample when even one full
    training pass is too much; the default trains on the full table —
    one extra partial-agg pass, the same cost class as the index's
    mandatory assignment scan.

    Seeding is path-aware: the full table has dense ids 0..n−1, so
    the strided modulo filter selects exactly k spread-out seeds at
    scan speed; a hash-bucket sample has SPARSE ids, where that
    predicate would pick ~k·per_mille/1000 seeds (possibly zero) and
    silently train a degenerate quantizer — the sampled path instead
    seeds by min-id per md5 stratum (:func:`ivf_seed_sampled_frame`),
    which yields exactly one seed per non-empty stratum on any id
    distribution."""
    if sample_per_mille is None:
        base = emb.select("vec_id", "embedding")
        n = base.count()
        stride = max(1, n // k)
        seeds = {
            r["j"]: list(r["c"]) for r in ivf_seed_frame(base, k, stride).collect()
        }
    else:
        base = ivf_training_sample(emb, sample_per_mille).select(
            "vec_id", "embedding"
        )
        rows = sorted(
            ivf_seed_sampled_frame(base, k).collect(), key=lambda r: r["_b"]
        )
        seeds = {j: [float(x) for x in r["e"]] for j, r in enumerate(rows)}
    cent0 = tiny_local_frame(
        spark, sorted(seeds.items()), "j int, c array<double>"
    )
    # Argmin as a min_by aggregate (ties → smaller j via struct
    # ordering): partial aggregation collapses the ×k fan-out map-side,
    # so the shuffle carries one row per vector — cheaper than a
    # row_number window, which shuffles and sorts all k rows per key.
    d0 = base.crossJoin(F.broadcast(cent0)).select(
        "vec_id", "j", _grid_l2(F.col("embedding"), F.col("c")).alias("dist")
    )
    a0 = d0.groupBy("vec_id").agg(
        F.min_by("j", F.struct("dist", "j")).alias("j")
    )
    # Join the embeddings back for the update (keyed equi-join; the
    # crossJoin above never carries the 64-double payload ×k).
    gexp = a0.join(base, "vec_id").select(
        "j",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * F.lit(1_000_000.0)).cast("long"),
            )
        ).alias("pos", "g"),
    )
    sums = gexp.groupBy("j", "pos").agg(
        F.sum("g").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()
    trained = {j: list(c) for j, c in seeds.items()}  # empty-cluster fallback
    for row in sums:
        # Fixed op order (sum → /GRID → /count) mirrored in the oracle.
        trained[row["j"]][row["pos"]] = row["s"] / 1_000_000.0 / row["n"]
    return [(j, trained[j]) for j in sorted(trained)]


_IVF_ORACLE = f"""
WITH st AS (SELECT greatest(1, count(*) // {_IVF_K}) AS stride FROM embeddings),
seeds AS (
  SELECT CAST(vec_id // stride AS INT) AS j,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
  FROM embeddings, st
  WHERE vec_id % stride = 0 AND vec_id < stride * {_IVF_K}
),
d0 AS (
  SELECT e.vec_id, s.j, {_grid_l2_sql('e.embedding', 's.c')} AS dist
  FROM embeddings e CROSS JOIN seeds s
),
a0 AS (
  SELECT vec_id, j FROM (
    SELECT vec_id, j,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
    FROM d0
  ) WHERE rn = 1
),
gexp AS (
  SELECT a0.j, u.pos, u.g
  FROM a0 JOIN (
    SELECT vec_id,
           unnest(list_transform(embedding,
                  x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_GRID_LIT}) AS BIGINT))) AS g,
           unnest(generate_series(1, len(embedding))) AS pos
    FROM embeddings
  ) u USING (vec_id)
),
upd AS (
  SELECT j, list(CAST(s AS DOUBLE) / {_GRID_LIT} / n ORDER BY pos) AS c
  FROM (SELECT j, pos, SUM(g) AS s, COUNT(*) AS n FROM gexp GROUP BY j, pos)
  GROUP BY j
),
cent AS (
  SELECT seeds.j, COALESCE(upd.c, seeds.c) AS c
  FROM seeds LEFT JOIN upd ON seeds.j = upd.j
),
d1 AS (
  SELECT e.vec_id, cent.j, {_grid_l2_sql('e.embedding', 'cent.c')} AS dist
  FROM embeddings e CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, j FROM (
    SELECT vec_id, j,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
    FROM d1
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, j FROM (
    SELECT vec_id, j,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rn
    FROM d1 WHERE vec_id % 100 = 0
  ) WHERE rn <= {_IVF_NPROBE}
)
SELECT query_id, nbr_id, cosine, rank FROM (
  SELECT p.query_id, a.vec_id AS nbr_id,
         {grid_cosine_sql('q.embedding', 'c.embedding')} AS cosine,
         row_number() OVER (
           PARTITION BY p.query_id
           ORDER BY {grid_cosine_sql('q.embedding', 'c.embedding')} DESC,
                    a.vec_id ASC
         ) AS rank
  FROM probes p
  JOIN assigned a ON a.j = p.j AND a.vec_id <> p.query_id
  JOIN embeddings q ON q.vec_id = p.query_id
  JOIN embeddings c ON c.vec_id = a.vec_id
) WHERE rank <= {_K}
"""


@query("sim_ann_ivf", oracle=_IVF_ORACLE)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with a genuinely *trained* coarse
    quantizer (k-means: deterministic seeding + one exact-arithmetic
    Lloyd step, ``ivf_train``) and multi-probe search (nprobe=2 via
    per-query top-2 centroid ranking). Corpus vectors carry their
    centroid assignment as a column; the scoring join is a keyed
    equi-join on the centroid id, so scored pairs shrink by
    ~×(k/nprobe) versus brute force — the standard recall/cost dial.
    Seed selection is a pushed-down modulo filter — no unpartitioned
    window touches the corpus anywhere in this head (plan-pinned by
    tests/test_plans.py); the oracle replays seeding, assignment, the
    Lloyd update, probing, and ranking bit-identically (µ-grid
    arithmetic throughout). The index build is inherently multi-pass
    (count + seeds + Lloyd + assignment + scoring); persisting the
    corpus for those passes was MEASURED to cost ~0.5 s net at bench
    scale (cache materialization latency vs re-scanning a small
    parquet), so the head leaves caching to the deployment: persist
    the embeddings table before calling when the corpus is large
    relative to scan bandwidth — every pass here re-reads through
    whatever cache the session holds."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent = tiny_local_frame(
        spark, ivf_train(spark, emb), "j int, c array<double>"
    )
    qs, corpus = _queries_and_corpus(spark, sf_dir)

    corpus_d = (
        emb.select(F.col("vec_id"), "embedding")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", "j", _grid_l2(F.col("embedding"), F.col("c")).alias("dist"))
    )
    # Corpus assignment: min_by partial aggregate (one row per vector
    # leaves each task); the window form would shuffle+sort all k rows
    # per key. Probing ranks only the query subset (~1% of rows) — a
    # window there is negligible.
    assigned = (
        corpus_d.groupBy("vec_id")
        .agg(F.min_by("j", F.struct("dist", "j")).alias("j"))
        .select(F.col("vec_id").alias("nbr_id"), "j")
        .join(corpus, "nbr_id")
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "j")
    probes = (
        corpus_d.filter(F.expr(_QUERY_PRED))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "j")
        .join(qs, "query_id")
    )
    scored = (
        F.broadcast(probes)
        .join(assigned, "j")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            (
                grid_dot(F.col("q_emb"), F.col("c_emb"))
                / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("c_n2")))
            ).alias("cosine"),
        )
    )
    return _topk(scored)


# Sign-LSH: genuine random-hyperplane LSH with deterministic
# Rademacher planes. Plane p is the ±1 vector whose i-th component is
# +1 iff the first hex digit of md5("p:i") is odd — a seeded
# pseudo-random rotation both engines can reproduce (the r1 version
# used axis-aligned planes, i.e. only the first 8 raw dimensions; a
# Rademacher projection mixes ALL dimensions into every bit, the real
# Charikar construction). The projection v·r_p is computed on the
# exact µ-grid (floor(±x·GRID) summed as BIGINT) so the SIGN of a
# near-zero projection is identical across engines — float summation
# order could flip it.
_SIGN_BITS = 8


def _plane_sign(p: int, i: int, table: int = 0) -> int:
    import hashlib

    key = f"{p}:{i}" if table == 0 else f"{table}:{p}:{i}"
    return 1 if int(hashlib.md5(key.encode()).hexdigest()[0], 16) % 2 else -1


def _sign_bucket(emb, dim: int, table: int = 0, n_bits: int = _SIGN_BITS) -> F.Column:
    bits = []
    for p in range(n_bits):
        planes = F.array(
            *[F.lit(float(_plane_sign(p, i, table))) for i in range(dim)]
        )
        terms = F.zip_with(
            emb,
            planes,
            lambda x, s: F.floor(s * x.cast("double") * F.lit(1_000_000.0)).cast(
                "long"
            ),
        )
        dot = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc + v)
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _sign_bucket_sql(e: str) -> str:
    def dot(p: int) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, len({e})), i ->"
            f" CAST(FLOOR((CASE WHEN CAST(concat('0x',"
            f" substr(md5(concat('{p}', ':', CAST(i - 1 AS VARCHAR))), 1, 1))"
            f" AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END)"
            f" * CAST({e}[i] AS DOUBLE) * {_GRID_LIT}) AS BIGINT)))"
        )

    terms = " + ".join(
        f"(CASE WHEN {dot(p)} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(_SIGN_BITS)
    )
    return f"({terms})"


@query(
    "sim_ann_signlsh",
    oracle=f"""
    SELECT query_id, nbr_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
             {_COS_QC} AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_COS_QC} DESC, c.vec_id ASC
             ) AS rank
      FROM embeddings q JOIN embeddings c
        ON {_sign_bucket_sql("c.embedding")} = {_sign_bucket_sql("q.embedding")}
       AND c.vec_id <> q.vec_id
      WHERE q.{_QUERY_PRED}
    ) WHERE rank <= {_K}
    """,
)
def sim_ann_signlsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (Charikar) sign-LSH top-k: 8 deterministic
    Rademacher planes project every dimension into each sign bit; the
    8-bit code is a 256-way bucket key and only same-bucket pairs are
    scored. The seeded ±1 planes are reproduced from md5 in both
    engines and the projections use exact grid sums, so even the
    bucketing is oracle-checkable. Same plan shape as any blocked
    join: per-row codegen bucket id feeding one keyed join."""
    qs, corpus = _queries_and_corpus(spark, sf_dir)
    dim = len(
        load_table(spark, sf_dir, "embeddings").select("embedding").first()["embedding"]
    )
    qs = qs.withColumn("bucket", _sign_bucket(F.col("q_emb"), dim))
    corpus = corpus.withColumn("bucket", _sign_bucket(F.col("c_emb"), dim))
    scored = (
        F.broadcast(qs)
        .join(corpus, ["bucket"])
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            (
                grid_dot(F.col("q_emb"), F.col("c_emb"))
                / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("c_n2")))
            ).alias("cosine"),
        )
    )
    return _topk(scored)


def sim_signlsh_multitable(
    spark: SparkSession, sf_dir: str, n_tables: int = 4, n_bits: int = _SIGN_BITS
) -> DataFrame:
    """OR-amplified sign-LSH: L independent Rademacher hash tables,
    candidates = union of same-bucket pairs across tables (the
    standard LSH recall amplifier — a true neighbor is missed only if
    it separates from the query in EVERY table, so miss probability
    decays exponentially in L). Not registered (the registry sits at
    the driver's 50-row cap); recall uplift over the single-table
    query is pinned by tests/test_queries_vs_oracle.py.

    Scale shape: each table contributes one keyed equi-join on its
    bucket id — L ordinary shuffles, unioned and deduped on the pair
    key. Candidate volume grows ~linearly in L while recall approaches
    1; verification (exact cosine) still touches candidates only."""
    qs, corpus = _queries_and_corpus(spark, sf_dir)
    dim = len(
        load_table(spark, sf_dir, "embeddings").select("embedding").first()["embedding"]
    )
    pair_lists = []
    for t in range(n_tables):
        q_t = qs.withColumn(
            "bucket", _sign_bucket(F.col("q_emb"), dim, table=t, n_bits=n_bits)
        )
        c_t = corpus.withColumn(
            "bucket", _sign_bucket(F.col("c_emb"), dim, table=t, n_bits=n_bits)
        )
        pair_lists.append(
            F.broadcast(q_t.select("query_id", "bucket"))
            .join(c_t.select("nbr_id", "bucket"), ["bucket"])
            .filter(F.col("nbr_id") != F.col("query_id"))
            .select("query_id", "nbr_id")
        )
    from functools import reduce

    cands = reduce(lambda a, b: a.unionByName(b), pair_lists).distinct()
    scored = (
        cands.join(F.broadcast(qs), "query_id")
        .join(corpus, "nbr_id")
        .select(
            "query_id",
            "nbr_id",
            (
                grid_dot(F.col("q_emb"), F.col("c_emb"))
                / (F.sqrt(F.col("q_n2")) * F.sqrt(F.col("c_n2")))
            ).alias("cosine"),
        )
    )
    return _topk(scored)


# ---------------------------------------------------- flat-PQ serving

#: Flat-PQ codebook shape for the registry-scale corpus: 8 subspaces
#: of dim/8 dims, 16 centroids each — 8 one-byte codes per vector.
_PQ_M, _PQ_KSUB = 8, 16

#: sim_pq_adc_topk's oracle (QUEUED for the r13 registry rotation —
#: "a PQ serving query", now concrete): DuckDB replays the ENTIRE
#: flat-PQ chain value-for-value — per-subspace strided seeds, one
#: µ-grid integer Lloyd update (sum → /GRID → /count, the exact op
#: order of operators/pq.py::train_pq), grid-L2 argmin encoding with
#: ties to the smaller ci, stored ‖x̂‖² as the ordered fold of the
#: chosen centroids' grid squared norms, the per-query ADC LUT of
#: grid dots, and the candidate numerator as the SAME fixed-order
#: left-to-right double fold (list_reduce over the m-ordered picks ≡
#: Spark's aggregate from 0.0 — adding 0.0 first is an exact no-op
#: since grid dots never produce -0.0). Every float op is a single
#: IEEE op in the same order on both engines, so cosine hash-matches
#: bit for bit — the same exact-replay discipline as _IVF_ORACLE.
SIM_PQ_ADC_TOPK_ORACLE = f"""
WITH st AS (SELECT greatest(1, count(*) // {_PQ_KSUB}) AS stride,
                   max(len(embedding)) // {_PQ_M} AS dsub
            FROM embeddings),
seeds AS (
  SELECT CAST(vec_id // stride AS INT) AS ci,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings, st
  WHERE vec_id % stride = 0 AND vec_id < stride * {_PQ_KSUB}
),
subs AS (
  SELECT e.vec_id, mi.range AS m,
         list_slice(e.embedding, mi.range * st.dsub + 1,
                    (mi.range + 1) * st.dsub) AS sub
  FROM embeddings e, range({_PQ_M}) mi, st
),
seedsub AS (
  SELECT s.ci, mi.range AS m,
         list_slice(s.v, mi.range * st.dsub + 1,
                    (mi.range + 1) * st.dsub) AS c
  FROM seeds s, range({_PQ_M}) mi, st
),
d0 AS (
  SELECT sub.vec_id, sub.m, ss.ci, {_grid_l2_sql('sub.sub', 'ss.c')} AS dist
  FROM subs sub JOIN seedsub ss ON sub.m = ss.m
),
a0 AS (
  SELECT vec_id, m, ci FROM (
    SELECT vec_id, m, ci,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, ci) AS rn
    FROM d0
  ) WHERE rn = 1
),
gexp AS (
  SELECT a0.m, a0.ci, u.pos, u.g
  FROM a0 JOIN (
    SELECT vec_id, m,
           unnest(list_transform(sub,
                  x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_GRID_LIT}) AS BIGINT))) AS g,
           unnest(generate_series(1, len(sub))) AS pos
    FROM subs
  ) u ON u.vec_id = a0.vec_id AND u.m = a0.m
),
upd AS (
  SELECT m, ci, list(CAST(s AS DOUBLE) / {_GRID_LIT} / n ORDER BY pos) AS c
  FROM (SELECT m, ci, pos, SUM(g) AS s, COUNT(*) AS n
        FROM gexp GROUP BY m, ci, pos)
  GROUP BY m, ci
),
cb AS (
  SELECT ss.m, ss.ci, COALESCE(upd.c, ss.c) AS c
  FROM seedsub ss LEFT JOIN upd ON ss.m = upd.m AND ss.ci = upd.ci
),
cbsq AS (
  SELECT m, ci, c,
         CAST(list_sum(list_transform(c,
              x -> CAST(FLOOR(x * x * {_GRID_LIT}) AS BIGINT))) AS DOUBLE)
           / {_GRID_LIT} AS sq
  FROM cb
),
d1 AS (
  SELECT s.vec_id, s.m, cs.ci, {_grid_l2_sql('s.sub', 'cs.c')} AS dist
  FROM subs s JOIN cbsq cs ON s.m = cs.m
),
a1 AS (
  SELECT vec_id, m, ci FROM (
    SELECT vec_id, m, ci,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, ci) AS rn
    FROM d1
  ) WHERE rn = 1
),
n2s AS (
  SELECT a1.vec_id,
         list_reduce(list(cs.sq ORDER BY a1.m), (a, b) -> a + b) AS n2
  FROM a1 JOIN cbsq cs ON a1.m = cs.m AND a1.ci = cs.ci
  GROUP BY a1.vec_id
),
q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE {_QUERY_PRED}),
qn AS (SELECT query_id, {grid_dot_sql('embedding', 'embedding')} AS q_n2 FROM q),
qsub AS (
  SELECT query_id, mi.range AS m,
         list_slice(embedding, mi.range * st.dsub + 1,
                    (mi.range + 1) * st.dsub) AS sub
  FROM q, range({_PQ_M}) mi, st
),
lutv AS (
  SELECT qs.query_id, qs.m, cs.ci, {grid_dot_sql('qs.sub', 'cs.c')} AS v
  FROM qsub qs JOIN cbsq cs ON qs.m = cs.m
),
adc AS (
  SELECT lv.query_id, a1.vec_id AS nbr_id,
         list_reduce(list(lv.v ORDER BY lv.m), (a, b) -> a + b) AS num
  FROM a1 JOIN lutv lv ON lv.m = a1.m AND lv.ci = a1.ci
  GROUP BY lv.query_id, a1.vec_id
)
SELECT query_id, nbr_id, cosine, rank FROM (
  SELECT adc.query_id, adc.nbr_id,
         adc.num / (sqrt(qn.q_n2) * sqrt(n2s.n2)) AS cosine,
         row_number() OVER (
           PARTITION BY adc.query_id
           ORDER BY adc.num / (sqrt(qn.q_n2) * sqrt(n2s.n2)) DESC,
                    adc.nbr_id ASC
         ) AS rank
  FROM adc
  JOIN qn ON qn.query_id = adc.query_id
  JOIN n2s ON n2s.vec_id = adc.nbr_id
  WHERE adc.nbr_id <> adc.query_id
) WHERE rank <= {_K}
"""


@query("sim_pq_adc_topk", oracle=SIM_PQ_ADC_TOPK_ORACLE)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-PQ ADC top-k over the embeddings table — the registry-
    shaped face of the product-quantization tier (registry slot since
    the r13 rotation; operators/pq.py::pq_topk). Train → encode →
    per-query LUT → m-lookup ADC fold, all grid-integer exact; the
    oracle above replays the whole chain, so one mis-trained
    centroid, one mis-assigned code, or one out-of-order float add
    anywhere in the PQ family breaks the value hash."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.pq import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.expr(_QUERY_PRED)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk(spark, emb, qs, k=_K, m=_PQ_M, ksub=_PQ_KSUB)

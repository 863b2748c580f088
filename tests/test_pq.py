"""Product-quantization tier (operators/pq.py): encode argmin pinned
against an independent numpy replay, training partition-independence,
IVFPQ layout + byte accounting vs SQ8/float, recall floors, and the
ADC cosine replayed EXACTLY (==) outside Spark."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.ann_index import (
    build_ivf_index,
    query_ivf_index,
)
from sensorstream_scalable_sensor_data_pipeline_spark.operators.pq import (
    build_ivfpq_index,
    pq_encode,
    query_ivfpq_index,
    train_pq,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

_GRID = 1_000_000.0
_M, _KSUB, _K, _NPROBE = 16, 64, 6, 2


@pytest.fixture(scope="module")
def indexes(spark, sf_dir, tmp_path_factory):
    """One shared build: float IVF, SQ8 IVF and IVFPQ over the same
    corpus with the same coarse quantizer params."""
    tmp = tmp_path_factory.mktemp("pq_idx")
    emb = load_table(spark, sf_dir, "embeddings")
    fidx = build_ivf_index(spark, emb, str(tmp / "f"), k=_K)
    sidx = build_ivf_index(spark, emb, str(tmp / "s"), k=_K, quantize=True)
    pidx = build_ivfpq_index(
        spark, emb, str(tmp / "p"), k=_K, m=_M, ksub=_KSUB
    )
    return {"emb": emb, "f": fidx, "s": sidx, "p": pidx}


def _queries(emb):
    return emb.filter(F.expr("vec_id % 20 = 0")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _grid_l2_np(a: np.ndarray, c: np.ndarray) -> int:
    return int(np.floor((a - c) * (a - c) * _GRID).astype(np.int64).sum())


def _grid_dot_np(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.floor((a * b) * _GRID).astype(np.int64).sum()) / _GRID


def test_pq_encode_matches_numpy_argmin(spark, sf_dir):
    """codes = per-subspace grid-L2 argmin (ties → smaller ci) and
    n2 = Σ chosen centroids' grid squared norms, both replayed
    independently in numpy — exact equality."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = train_pq(spark, emb, m=8, ksub=16)
    dsub = len(cb[0][2])
    cents = {}  # (m, ci) -> (centroid, sq)
    for mi, ci, c, sq in cb:
        cents[(mi, ci)] = (np.asarray(c, dtype=np.float64), sq)
    got = {
        r["vec_id"]: (list(r["codes"]), r["n2"])
        for r in pq_encode(spark, emb, cb).collect()
    }
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    assert set(got) == set(vecs)
    for vid, x in vecs.items():
        want_codes, want_n2 = [], 0.0
        for mi in range(8):
            sub = x[mi * dsub : (mi + 1) * dsub]
            best = min(
                (ci for (mj, ci) in cents if mj == mi),
                key=lambda ci: (_grid_l2_np(sub, cents[(mi, ci)][0]), ci),
            )
            want_codes.append(best)
            want_n2 += cents[(mi, best)][1]  # fixed subspace order
        assert got[vid][0] == want_codes, vid
        assert got[vid][1] == want_n2, vid
    # the code space is actually used (not a degenerate all-zeros map)
    assert len({tuple(c) for c, _ in got.values()}) > len(got) // 4


def test_pq_train_partition_independent(spark, sf_dir):
    """Identical codebook regardless of input partitioning — the
    µ-grid integer Lloyd update is associative by construction."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = train_pq(spark, emb.repartition(7), m=8, ksub=16)
    b = train_pq(spark, emb.repartition(2), m=8, ksub=16)
    assert a == b


def test_pq_validation(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="SIGNED byte"):
        train_pq(spark, emb, m=8, ksub=200)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(spark, emb, m=7)


def test_pq_train_sparse_ids_dense_ci(spark, sf_dir):
    """Sparse / non-contiguous vec_ids (every 3rd id dropped, ids
    shifted by 1000) still yield a codebook with ci exactly
    range(n_seeds) per subspace — the dense-ci contract the
    positional ADC LUT lookup depends on — and encoding against it
    produces only in-range codes."""
    emb = load_table(spark, sf_dir, "embeddings")
    sparse = emb.filter(F.expr("vec_id % 3 != 0")).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1000)
    )
    cb = train_pq(spark, sparse, m=8, ksub=16)
    per_m = {}
    for mi, ci, _, _ in cb:
        per_m.setdefault(mi, []).append(ci)
    assert set(per_m) == set(range(8))
    for mi, cis in per_m.items():
        assert sorted(cis) == list(range(len(cis))), (mi, sorted(cis))
    n_ci = len(per_m[0])
    codes = pq_encode(spark, sparse, cb).select(
        F.explode("codes").alias("c")
    )
    assert codes.filter((F.col("c") < 0) | (F.col("c") >= n_ci)).count() == 0


def test_pq_dim_mismatch_raises(spark, sf_dir):
    """Encoding or querying with a corpus whose dim != m*dsub of the
    codebook raises instead of silently slicing short subvectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    cb = train_pq(spark, emb, m=8, ksub=16)
    short = emb.select("vec_id", F.expr("slice(embedding, 1, 60)").alias("embedding"))
    with pytest.raises(ValueError, match="codebook disagree"):
        pq_encode(spark, short, cb)


def test_ivfpq_layout_and_byte_accounting(spark, indexes):
    """Lists are partitionBy(j) directories of (vec_id, codes[m], n2)
    with one-byte codes — and the storage tiers order as designed:
    PQ < SQ8 < float bytes on disk for the SAME corpus."""
    pidx = indexes["p"]
    lists = spark.read.parquet(os.path.join(pidx, "lists"))
    assert dict(lists.dtypes)["codes"] == "array<tinyint>"
    assert set(lists.columns) == {"j", "vec_id", "codes", "n2"}
    assert lists.filter(F.size("codes") != _M).count() == 0
    jdirs = [
        d
        for d in os.listdir(os.path.join(pidx, "lists"))
        if d.startswith("j=")
    ]
    assert len(jdirs) == _K

    def du(d):
        total = 0
        for root, _, files in os.walk(os.path.join(d, "lists")):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    b_f, b_s, b_p = du(indexes["f"]), du(indexes["s"]), du(indexes["p"])
    assert b_p < b_s < b_f, (b_p, b_s, b_f)


def test_ivfpq_recall_floors(spark, indexes):
    """Every query fully answered; ADC top-5 overlaps the float
    index's top-5 and lands inside its top-20 at the measured floors
    (raw-vector PQ on near-random synthetic vectors — the hard case;
    clustered production embeddings do better)."""
    q = _queries(indexes["emb"])
    nq = q.count()
    fp5 = {
        (r["query_id"], r["nbr_id"])
        for r in query_ivf_index(
            spark, indexes["f"], q, k=5, nprobe=_NPROBE
        ).collect()
    }
    fp20 = {
        (r["query_id"], r["nbr_id"])
        for r in query_ivf_index(
            spark, indexes["f"], q, k=20, nprobe=_NPROBE
        ).collect()
    }
    pp = {
        (r["query_id"], r["nbr_id"])
        for r in query_ivfpq_index(
            spark, indexes["p"], q, k=5, nprobe=_NPROBE
        ).collect()
    }
    assert len(pp) == 5 * nq
    assert len(fp5 & pp) / len(fp5) >= 0.5
    assert len(fp20 & pp) / len(pp) >= 0.9


def test_ivfpq_adc_cosine_matches_numpy_replay(spark, indexes):
    """Engine determinism of the ADC cosine: for served pairs, an
    independent numpy replay of the SAME arithmetic — per-subspace
    grid dots into the LUT, left-to-right double sum of the m picked
    entries, one divide by the grid norms — reproduces Spark's
    cosine EXACTLY (every float op is a single IEEE op in the same
    order)."""
    pidx = indexes["p"]
    q = _queries(indexes["emb"])
    got = query_ivfpq_index(spark, pidx, q, k=3, nprobe=_NPROBE).collect()
    assert got
    cb = {
        (r["m"], r["ci"]): (np.asarray(r["c"]), r["sq"])
        for r in spark.read.parquet(os.path.join(pidx, "codebook")).collect()
    }
    dsub = len(next(iter(cb.values()))[0])
    lists = {
        r["vec_id"]: (list(r["codes"]), r["n2"])
        for r in spark.read.parquet(os.path.join(pidx, "lists")).collect()
    }
    qvecs = {
        r["query_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in q.collect()
    }
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"]))[:6]:
        qv = qvecs[r["query_id"]]
        codes, n2 = lists[r["nbr_id"]]
        adc = 0.0
        for mi, ci in enumerate(codes):
            sub = qv[mi * dsub : (mi + 1) * dsub]
            adc = adc + _grid_dot_np(sub, cb[(mi, ci)][0])
        q_n2 = _grid_dot_np(qv, qv)
        want = adc / (math.sqrt(q_n2) * math.sqrt(n2))
        assert want == r["cosine"], (r["query_id"], r["nbr_id"], want, r["cosine"])


# ------------------------------------------------- residual encoding


def _clustered_emb(spark, n=800, kc=8, dim=32, noise=0.05):
    """Clustered synthetic corpus: kc well-separated centers + noise —
    the geometry residual encoding exists for (cells are tight around
    c_j, so the residual ball is ~noise-sized while the raw codebook
    must span the whole space)."""
    rng = np.random.default_rng(42)
    centers = rng.normal(0.0, 1.0, (kc, dim))
    labels = rng.integers(0, kc, n)
    vecs = centers[labels] + rng.normal(0.0, noise, (n, dim))
    return (
        spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        ),
        vecs,
    )


def _recon_mse(spark, idx, vecs) -> float:
    """Mean ‖x − x̂‖² over the corpus, reconstructing from the stored
    codes (+ coarse centroid for a residual index)."""
    cb = {
        (r["m"], r["ci"]): np.asarray(r["c"])
        for r in spark.read.parquet(os.path.join(idx, "codebook")).collect()
    }
    cent = {
        r["j"]: np.asarray(r["c"])
        for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
    }
    res = spark.read.parquet(os.path.join(idx, "meta")).first()["residual"]
    errs = []
    for r in spark.read.parquet(os.path.join(idx, "lists")).collect():
        rec = np.concatenate(
            [cb[(mi, int(c))] for mi, c in enumerate(r["codes"])]
        )
        if res:
            rec = rec + cent[r["j"]]
        errs.append(float(((vecs[r["vec_id"]] - rec) ** 2).sum()))
    return float(np.mean(errs))


def _true_topk(vecs, qids, topk):
    norms = np.linalg.norm(vecs, axis=1)
    out = {}
    for qi in qids:
        cos = (vecs @ vecs[qi]) / (norms * norms[qi])
        cos[qi] = -np.inf
        out[qi] = set(np.argsort(-cos)[:topk])
    return out


def test_ivfpq_residual_beats_raw_on_clustered_corpus(spark, tmp_path):
    """At IDENTICAL bytes (same k/m/ksub), residual encoding must
    measurably beat raw encoding on a clustered corpus — the reason
    it is FAISS's IVFPQ default — on both axes:

    * reconstruction MSE (Jégou et al.'s own objective): tight-cluster
      corpus (σ=0.05), residual ≤ 0.6× raw (measured 1.51 vs 5.33);
    * recall@5 vs the exact top-5: looser clusters (σ=0.4, where
      within-cell ranking is resolvable at all at these code sizes),
      m=8/ksub=16 — measured raw 0.17 vs residual 0.32.
    """
    tight, tight_vecs = _clustered_emb(spark, noise=0.05)
    kc = 8
    raw_t = build_ivfpq_index(
        spark, tight, str(tmp_path / "rawt"), k=kc, m=4, ksub=8
    )
    res_t = build_ivfpq_index(
        spark, tight, str(tmp_path / "rest"), k=kc, m=4, ksub=8, residual=True
    )
    mse_raw = _recon_mse(spark, raw_t, tight_vecs)
    mse_res = _recon_mse(spark, res_t, tight_vecs)
    assert mse_res <= 0.6 * mse_raw, (mse_raw, mse_res)

    loose, loose_vecs = _clustered_emb(spark, noise=0.4)
    raw_l = build_ivfpq_index(
        spark, loose, str(tmp_path / "rawl"), k=kc, m=8, ksub=16
    )
    res_l = build_ivfpq_index(
        spark, loose, str(tmp_path / "resl"), k=kc, m=8, ksub=16, residual=True
    )
    q = loose.filter(F.expr("vec_id % 40 = 0")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qids = [r["query_id"] for r in q.select("query_id").collect()]
    truth = _true_topk(loose_vecs, qids, 5)

    def recall(idx):
        got = {}
        for r in query_ivfpq_index(spark, idx, q, k=5, nprobe=3).collect():
            got.setdefault(r["query_id"], set()).add(r["nbr_id"])
        hits = sum(len(got.get(qi, set()) & truth[qi]) for qi in qids)
        return hits / (5 * len(qids))

    r_raw, r_res = recall(raw_l), recall(res_l)
    assert r_res >= r_raw + 0.1, (r_raw, r_res)
    assert r_res >= 0.25, r_res


def test_ivfpq_residual_adc_cosine_matches_numpy_replay(spark, tmp_path):
    """Residual ADC determinism: numerator = grid_dot(q, c_j) +
    Σ_m grid_dot(q_sub, residual centroid), denominator the stored
    joint grid norm — replayed EXACTLY (==) outside Spark."""
    emb, _ = _clustered_emb(spark, n=300)
    idx = build_ivfpq_index(
        spark, emb, str(tmp_path / "r"), k=4, m=4, ksub=8, residual=True
    )
    q = emb.filter(F.expr("vec_id % 50 = 0")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = query_ivfpq_index(spark, idx, q, k=3, nprobe=2).collect()
    assert got
    cb = {
        (r["m"], r["ci"]): np.asarray(r["c"])
        for r in spark.read.parquet(os.path.join(idx, "codebook")).collect()
    }
    cent = {
        r["j"]: np.asarray(r["c"])
        for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
    }
    dsub = len(next(iter(cb.values())))
    lists = {
        r["vec_id"]: (int(r["j"]), list(r["codes"]), r["n2"])
        for r in spark.read.parquet(os.path.join(idx, "lists")).collect()
    }
    qvecs = {
        r["query_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in q.collect()
    }
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"]))[:6]:
        qv = qvecs[r["query_id"]]
        j, codes, n2 = lists[r["nbr_id"]]
        adc = 0.0
        for mi, ci in enumerate(codes):
            sub = qv[mi * dsub : (mi + 1) * dsub]
            adc = adc + _grid_dot_np(sub, cb[(mi, ci)])
        qc = _grid_dot_np(qv, cent[j])
        q_n2 = _grid_dot_np(qv, qv)
        want = (adc + qc) / (math.sqrt(q_n2) * math.sqrt(n2))
        assert want == r["cosine"], (r["query_id"], r["nbr_id"], want, r["cosine"])


def test_ivfpq_meta_flag_roundtrip(spark, indexes):
    """A raw index (built before or after the meta file existed)
    serves identically: meta says residual=false and the numerator is
    the plain LUT sum (covered by the raw replay test); the residual
    flag is stored and read back."""
    meta = spark.read.parquet(os.path.join(indexes["p"], "meta")).collect()
    assert len(meta) == 1 and meta[0]["residual"] is False

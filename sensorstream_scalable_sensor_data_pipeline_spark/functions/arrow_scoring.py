"""Arrow-batch candidate scoring for the IVF serving path.

WHY THIS EXISTS (optimization round r16, guide §4.2): the serving
heads score ~4.5M candidates × 96 dims per batch through Catalyst
``zip_with``/``aggregate`` higher-order functions. HOF *lambdas* run
interpreted per element (functions/vectors.py line 26 has always said
so), and the r16 stage profile put 247 of ``ivf_serve_large``'s
~250 executor-CPU-seconds in that one scoring stage (~55 µs per
candidate ≈ 96 interpreted lambda evaluations). The guide's §4.2 rule
applies exactly: let Spark do distribution and pruning, hand whole
Arrow batches to NumPy for the per-candidate arithmetic.

BIT-EXACTNESS — the reason this is safe on oracle-pinned outputs: the
grid arithmetic (functions/vectors.py) was designed to be order- and
engine-exact — per-element ``floor(double(x)·double(y)·GRID)`` summed
as int64, one IEEE divide at the end. NumPy reproduces every step with
the same IEEE-754 double ops in the same order:

* ``float32 → float64`` widening is exact in both engines;
* each product/scale is a single IEEE double multiply, associativity
  preserved (``(x*y)*GRID``, elementwise — never a fused matmul for
  the float path, FMA would contract the rounding);
* ``floor`` then int64 conversion is exact (|terms| ≪ 2^53);
* the int64 sum is associative integer math;
* the final ``(sum/GRID) / (sqrt(q_n2)·sqrt(n2))`` is the identical
  op sequence.

The int8 ADC path is exact integer arithmetic end-to-end (int64 dot of
int8 codes), so there NumPy may use a real matmul.

Equivalence is pinned by tests/test_ann_index.py::
test_index_query_matches_one_shot_head (this path vs the fully
Catalyst, DuckDB-oracled ``sim_ann_ivf``) and the PQ/SQ8 agreement
tests.

LOCAL TOP-K: each scorer emits, per (arrow batch, query), only the
top-k candidates by (cosine DESC NULLS?, nbr_id ASC) instead of every
scored row — the global window top-k over the union of local top-ks
is unchanged (any global top-k member is a local top-k member of its
batch), and the exchange feeding the window shrinks from every
candidate to ~k rows per (batch, query). NaN cosines (0/0 on a
zero-norm pair) sort FIRST, matching Spark's NaN-greatest ordering.

Zero-UDF doctrine note: this module is ``mapInArrow`` — batch-level
Arrow compute, not a row-at-a-time UDF. The §2.11 discipline still
bans scalar ``udf``/``pandas_udf``; it has always allowed Arrow batch
operators where they beat Catalyst, and here the measured gap is an
order of magnitude on the suite's most CPU-expensive stage.

INPUT CONTRACT (r17, per the r16 advisory): bit-exactness vs the expr
path holds for FINITE, NON-NULL, uniform-width embedding vectors —
which is everything the index builders can persist (embeddings come
from the generator/normalizer chain; index lists store what the
oracle-pinned build wrote). On data OUTSIDE that contract the paths
deliberately diverge rather than silently agree:
``np.floor(NaN/Inf).astype(int64)`` is platform-defined where Spark's
non-ANSI cast yields 0, and ``_np_2d`` raises ``ValueError`` on
null/ragged lists where Catalyst would emit a null cosine. Callers
feeding arbitrary external vectors must use ``impl="expr"`` or
pre-validate; an unconditional finiteness scan here would tax every
batch of the suite's hottest stage to defend data the engine cannot
produce.
"""

from __future__ import annotations

from typing import Iterator

GRID = 1_000_000.0


def _np_2d(col, dtype):
    """Arrow list<numeric> column → (n, d) ndarray (uniform widths)."""
    import numpy as np

    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    offs = arr.offsets.to_numpy()
    vals = arr.values.to_numpy(zero_copy_only=False)
    n = len(offs) - 1
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    widths = np.diff(offs)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged embedding arrays in list scan")
    return (
        vals[int(offs[0]) : int(offs[0]) + n * d].reshape(n, d).astype(dtype)
    )


def _local_topk(qid: int, vid, cos, k: int):
    """Per-(batch, query) top-k by (cosine DESC, nbr_id ASC), NaN
    first (Spark orders NaN above +Inf). Returns (ids, cosines)."""
    import numpy as np

    if len(vid) > k:
        nan = np.isnan(cos)
        # stable lexsort: primary -cosine (desc), secondary nbr_id asc
        order = np.lexsort((vid, -cos))
        if nan.any():
            nan_ids = vid[nan]
            nan_order = np.argsort(nan_ids, kind="stable")
            order = np.concatenate(
                (np.flatnonzero(nan)[nan_order], order[~nan[order]])
            )
        order = order[:k]
        vid, cos = vid[order], cos[order]
    return vid, cos


def _emit(out_rows):
    import numpy as np
    import pyarrow as pa

    if not out_rows:
        return None
    qids = np.concatenate([r[0] for r in out_rows])
    vids = np.concatenate([r[1] for r in out_rows])
    coss = np.concatenate([r[2] for r in out_rows])
    return pa.RecordBatch.from_arrays(
        [
            pa.array(qids, type=pa.int64()),
            pa.array(vids, type=pa.int64()),
            pa.array(coss, type=pa.float64()),
        ],
        names=["query_id", "nbr_id", "cosine"],
    )


#: Output schema every scorer yields (the window top-k consumes it).
SCORED_SCHEMA = "query_id long, nbr_id long, cosine double"


def grid_cosine_scorer(probe_rows, k: int):
    """Scorer factory for FLOAT-stored lists.

    ``probe_rows``: collected (query_id, j, q_emb, q_n2) rows — the
    same driver-bounded probe×query frame the Catalyst path
    broadcasts (≤ nprobe·|batch| rows). Returns a ``mapInArrow``
    function over (j, vec_id, embedding, n2) emitting per-batch
    top-k (query_id, nbr_id, cosine) rows with cosines bit-identical
    to ``grid_dot(q,e)/(sqrt(q_n2)·sqrt(n2))``.
    """
    import numpy as np

    by_j: dict[int, list] = {}
    for r in probe_rows:
        by_j.setdefault(int(r["j"]), []).append(
            (
                int(r["query_id"]),
                np.asarray(r["q_emb"], dtype=np.float64),
                float(r["q_n2"]),
            )
        )

    def score(batches: Iterator) -> Iterator:
        import numpy as np

        for b in batches:
            names = b.schema.names
            jcol = b.column(names.index("j")).to_numpy().astype(np.int64)
            vid = b.column(names.index("vec_id")).to_numpy().astype(np.int64)
            n2 = b.column(names.index("n2")).to_numpy().astype(np.float64)
            emb = _np_2d(b.column(names.index("embedding")), np.float64)
            out = []
            for j in np.unique(jcol):
                probes = by_j.get(int(j))
                if not probes:
                    continue
                sel = jcol == j
                E, V, N2 = emb[sel], vid[sel], n2[sel]
                sq_n2 = np.sqrt(N2)
                for qid, q, qn2 in probes:
                    # exact grid dot: (x*y)*GRID per element, floor,
                    # int64 sum — the same IEEE op sequence as
                    # functions/vectors.py::grid_dot
                    dots = (
                        np.floor((E * q) * GRID).astype(np.int64).sum(axis=1)
                    )
                    cos = (dots.astype(np.float64) / GRID) / (
                        np.sqrt(qn2) * sq_n2
                    )
                    m = V != qid
                    ids, cs = _local_topk(qid, V[m], cos[m], k)
                    out.append((np.full(len(ids), qid, dtype=np.int64), ids, cs))
            rb = _emit(out)
            if rb is not None:
                yield rb

    return score


def adc_int8_scorer(bq_rows, k: int):
    """Scorer factory for SQ8-stored lists, symmetric int8 ADC.

    ``bq_rows``: collected (query_id, j, q_codes, q_scale, q_hn2)
    rows. Returns a ``mapInArrow`` function over
    (j, vec_id, codes, scale, n2) emitting per-batch top-k rows with
    cosines bit-identical to
    ``(q_scale·scale)·int_dot(q_codes,codes)/(sqrt(q_hn2)·sqrt(n2))``
    — the dot is exact int64 arithmetic, so a real matmul is safe.
    """
    import numpy as np

    by_j: dict[int, list] = {}
    for r in bq_rows:
        by_j.setdefault(int(r["j"]), []).append(
            (
                int(r["query_id"]),
                np.asarray(r["q_codes"], dtype=np.int64),
                float(r["q_scale"]),
                float(r["q_hn2"]),
            )
        )

    def score(batches: Iterator) -> Iterator:
        import numpy as np

        for b in batches:
            names = b.schema.names
            jcol = b.column(names.index("j")).to_numpy().astype(np.int64)
            vid = b.column(names.index("vec_id")).to_numpy().astype(np.int64)
            n2 = b.column(names.index("n2")).to_numpy().astype(np.float64)
            scale = (
                b.column(names.index("scale")).to_numpy().astype(np.float64)
            )
            codes = _np_2d(b.column(names.index("codes")), np.int64)
            out = []
            for j in np.unique(jcol):
                probes = by_j.get(int(j))
                if not probes:
                    continue
                sel = jcol == j
                C, V, N2, S = codes[sel], vid[sel], n2[sel], scale[sel]
                sq_n2 = np.sqrt(N2)
                for qid, qc, qs, qhn2 in probes:
                    dots = C @ qc  # exact int64
                    cos = ((qs * S) * dots.astype(np.float64)) / (
                        np.sqrt(qhn2) * sq_n2
                    )
                    m = V != qid
                    ids, cs = _local_topk(qid, V[m], cos[m], k)
                    out.append((np.full(len(ids), qid, dtype=np.int64), ids, cs))
            rb = _emit(out)
            if rb is not None:
                yield rb

    return score


def adc_lut_scorer(bq_rows, k: int, residual: bool):
    """Scorer factory for PQ-coded lists (IVFPQ serving).

    ``bq_rows``: collected (query_id, j, q_n2, lut[, qc]) probe rows —
    the same frame the Catalyst path broadcasts. Returns a
    ``mapInArrow`` function over (j, vec_id, codes, n2) emitting
    per-batch top-k rows.

    EXACTNESS NOTE — double adds are NOT associative, and the
    Catalyst fold is ``aggregate(..., 0.0, acc + v)``: a strict
    left-to-right sum over subspaces. NumPy's ``sum`` uses pairwise
    summation, so the fold here is an explicit sequential loop over
    the m subspaces (m vectorized adds), preserving the op order
    bit-for-bit. The residual variant adds the probe row's scalar
    ``qc`` AFTER the fold, as the expression does.
    """
    import numpy as np

    by_j: dict[int, list] = {}
    for r in bq_rows:
        by_j.setdefault(int(r["j"]), []).append(
            (
                int(r["query_id"]),
                np.asarray(r["lut"], dtype=np.float64),  # (m, ksub)
                float(r["q_n2"]),
                float(r["qc"]) if residual else 0.0,
            )
        )

    def score(batches: Iterator) -> Iterator:
        import numpy as np

        for b in batches:
            names = b.schema.names
            jcol = b.column(names.index("j")).to_numpy().astype(np.int64)
            vid = b.column(names.index("vec_id")).to_numpy().astype(np.int64)
            n2 = b.column(names.index("n2")).to_numpy().astype(np.float64)
            codes = _np_2d(b.column(names.index("codes")), np.int64)
            out = []
            for j in np.unique(jcol):
                probes = by_j.get(int(j))
                if not probes:
                    continue
                sel = jcol == j
                C, V, N2 = codes[sel], vid[sel], n2[sel]
                sq_n2 = np.sqrt(N2)
                m = C.shape[1] if len(C) else 0
                for qid, lut, qn2, qc in probes:
                    acc = np.zeros(len(C), dtype=np.float64)
                    for mi in range(m):  # left-to-right, like the fold
                        acc = acc + lut[mi][C[:, mi]]
                    if residual:
                        acc = acc + qc
                    cos = acc / (np.sqrt(qn2) * sq_n2)
                    msk = V != qid
                    ids, cs = _local_topk(qid, V[msk], cos[msk], k)
                    out.append((np.full(len(ids), qid, dtype=np.int64), ids, cs))
            rb = _emit(out)
            if rb is not None:
                yield rb

    return score

"""BM25 keyword search (operators/search.py) vs a DuckDB oracle
replaying the same grid arithmetic, plus ranking properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.search import (
    bm25_scores,
    keyword_search,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

K1, B = 1.2, 0.75
TERMS = ["window", "merge", "zyzzyva"]  # two common + one absent


def _oracle(duck, terms, k1=K1, b=B):
    tlist = ", ".join(f"'{t}'" for t in terms)
    sql = rf"""
    WITH tk AS (
      SELECT doc_id,
             string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+') AS toks
      FROM documents
    ),
    d AS (SELECT doc_id, len(toks) AS dl, toks FROM tk),
    tot AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM d),
    post AS (
      SELECT doc_id, dl, t, count(*) AS tf
      FROM (SELECT doc_id, dl, unnest(toks) AS t FROM d)
      WHERE t IN ({tlist})
      GROUP BY doc_id, dl, t
    ),
    dft AS (SELECT t, count(*) AS df FROM post GROUP BY t),
    sc AS (
      SELECT p.doc_id,
             CAST(FLOOR(
               ln((tot.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
               * CAST(p.tf AS DOUBLE) * {k1 + 1.0}
               / (CAST(p.tf AS DOUBLE)
                  + {k1} * ({1.0 - b} + {b} * CAST(p.dl AS DOUBLE) / tot.avgdl))
               * 1000000.0) AS BIGINT) AS g
      FROM post p JOIN dft USING (t) CROSS JOIN tot
    )
    SELECT doc_id, CAST(sum(g) AS DOUBLE) / 1000000.0 AS score,
           count(*) AS n_terms
    FROM sc GROUP BY doc_id
    """
    return {
        int(r[0]): (float(r[1]), int(r[2])) for r in duck.execute(sql).fetchall()
    }


def test_bm25_matches_duckdb_oracle(spark, duck, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["score"], r["n_terms_matched"])
        for r in bm25_scores(docs, TERMS).collect()
    }
    want = _oracle(duck, TERMS)
    assert set(got) == set(want)
    assert got  # the query matched something
    for d in got:
        assert got[d][1] == want[d][1], d  # matched-term counts exact
        # ln is libm (last-ulp may differ across engines): per-term
        # grid cells can differ by one step, so tolerance is
        # grid_step x matched terms
        assert abs(got[d][0] - want[d][0]) <= 2e-6 * got[d][1], d


def test_bm25_duplicate_terms_collapse(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    once = {
        r["doc_id"]: r["score"] for r in bm25_scores(docs, ["window"]).collect()
    }
    twice = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["window", "window"]).collect()
    }
    assert once == twice


def test_keyword_search_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    top = keyword_search(docs, "Window MERGE", k=5).collect()
    assert len(top) == 5
    # ranked: descending score, id-tiebreak
    keys = [(-r["score"], r["doc_id"]) for r in top]
    assert keys == sorted(keys)
    # agrees with the full scored frame's head
    full = (
        bm25_scores(docs, ["window", "merge"])
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(5)
        .collect()
    )
    assert [r["doc_id"] for r in top] == [r["doc_id"] for r in full]


def test_rarer_term_outscores_common_at_same_tf(spark):
    """IDF sanity on crafted docs: with identical tf and dl, the doc
    matching the rarer term ranks above the doc matching the common
    one."""
    rows = [(0, "rare alpha beta"), (1, "common alpha beta")] + [
        (i, "common alpha beta") for i in range(2, 10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["rare", "common"]).collect()
    }
    assert got[0] > got[1]


def test_search_rejects_empty(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        bm25_scores(docs, [])
    with pytest.raises(ValueError):
        keyword_search(docs, "   ")


# ------------------------------------------------------------- chunking


def test_chunk_documents_matches_oracle(spark, duck, sf_dir):
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.search import (
        chunk_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    w, s = 32, 24  # overlap 8
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, w, 8).collect()
    }
    want = {
        (int(d), int(c)): (t, int(n))
        for d, c, t, n in duck.execute(rf"""
            WITH tk AS (
              SELECT doc_id,
                     string_split_regex(lower(regexp_replace(text,
                       '^\s+|\s+$', '', 'g')), '\s+') AS toks
              FROM documents
            ),
            d AS (SELECT doc_id, toks, len(toks) AS n FROM tk),
            st AS (
              SELECT doc_id, toks, n,
                     unnest(generate_series(0,
                       CASE WHEN n > {w}
                            THEN ((n - {w} + {s} - 1) // {s}) * {s}
                            ELSE 0 END, {s})) AS start
              FROM d
            )
            SELECT doc_id, start // {s} AS chunk_id,
                   array_to_string(toks[start + 1 :
                                        least(start + {w}, n)], ' ') AS txt,
                   least({w}, n - start) AS n_tokens
            FROM st
        """).fetchall()
    }
    assert got == want and got


def test_chunk_documents_coverage_and_short_doc(spark):
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.search import (
        chunk_documents,
    )

    toks = [f"t{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b c")], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(docs, 4, 2).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    d1 = [(r["chunk_id"], r["chunk_text"], r["n_tokens"]) for r in rows if r["doc_id"] == 1]
    assert d1 == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t2 t3 t4 t5", 4),
        (2, "t4 t5 t6 t7", 4),
        (3, "t6 t7 t8 t9", 4),
    ]
    # every token covered; last chunk reaches the end
    d2 = [(r["chunk_id"], r["chunk_text"], r["n_tokens"]) for r in rows if r["doc_id"] == 2]
    assert d2 == [(0, "a b c", 3)]  # short doc -> itself, once
    # zero overlap reconstructs the document exactly
    rec = sorted(
        chunk_documents(docs.filter("doc_id = 1"), 3, 0).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert " ".join(r["chunk_text"] for r in rec) == " ".join(toks)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, 0)
    with _pytest.raises(ValueError):
        chunk_documents(docs, 4, 4)


# ------------------------------------------------------------------ rrf


def test_rrf_fuse_hand_computed(spark):
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(11, 1), (13, 2)], "doc_id long, rank long")
    rows = rrf_fuse([a, b], k=60).collect()
    got = {r["doc_id"]: (r["rrf_score"], r["n_lists"]) for r in rows}
    exp = {
        10: (1 / 61, 1),
        11: (1 / 62 + 1 / 61, 2),
        12: (1 / 63, 1),
        13: (1 / 62, 1),
    }
    assert set(got) == set(exp)
    for d, (s, n) in exp.items():
        assert got[d][1] == n
        assert abs(got[d][0] - s) < 1e-15
    # ordering: doc 11 (both lists) first
    assert rows[0]["doc_id"] == 11
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rrf_fuse([])


def test_rrf_hybrid_bm25_plus_embedding(spark, sf_dir):
    """Hybrid retrieval shape: BM25 top-k fused with an embedding
    cosine top-k (exact brute force over the embeddings table keyed to
    doc ids). The fused list contains the head of both lists."""
    from pyspark.sql import Window

    from sensorstream_scalable_sensor_data_pipeline_spark.operators.search import (
        keyword_search,
        rrf_fuse,
    )

    docs = load_table(spark, sf_dir, "documents")
    kw = keyword_search(docs, "window merge", k=10).withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id"))
        ),
    )
    # stand-in dense list: nearest docs to doc 0 by embedding cosine
    from sensorstream_scalable_sensor_data_pipeline_spark.functions.vectors import grid_dot

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    q = emb.filter("doc_id = 0").select(
        F.col("embedding").alias("qe"), F.lit(1).alias("_j")
    )
    cos = grid_dot(F.col("embedding"), F.col("qe")) / (
        F.sqrt(grid_dot(F.col("embedding"), F.col("embedding")))
        * F.sqrt(grid_dot(F.col("qe"), F.col("qe")))
    )
    dense = (
        emb.withColumn("_j", F.lit(1))
        .join(F.broadcast(q), "_j")
        .filter("doc_id != 0")
        .select("doc_id", cos.alias("cosine"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("cosine").desc(), F.col("doc_id"))
            ),
        )
        .limit(10)
    )
    fused = rrf_fuse([kw.select("doc_id", "rank"), dense.select("doc_id", "rank")])
    ids = [r["doc_id"] for r in fused.collect()]
    assert kw.collect()[0]["doc_id"] in ids
    assert dense.collect()[0]["doc_id"] in ids
    assert len(ids) == len(set(ids))


def test_bm25_empty_corpus_returns_empty_frame(spark):
    """An empty corpus must yield an empty scored frame with the
    normal schema — not ZeroDivisionError on avgdl or int(None) on
    the zero-row length sum (r7 verdict "What's wrong #3")."""
    docs = spark.createDataFrame([], "doc_id long, text string")
    got = bm25_scores(docs, ["sensor"])
    assert got.columns == ["doc_id", "score", "n_terms_matched"]
    assert got.count() == 0

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

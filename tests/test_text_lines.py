"""Line-level boilerplate removal (operators/text_lines.py) vs a
DuckDB oracle on crafted multi-line documents."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.text_lines import (
    drop_boilerplate_lines,
    line_doc_frequency,
)

FOOTER = "subscribe to our newsletter for updates"
NAV = "home | products | about us | contact"


def _docs(spark):
    rows = [
        (1, f"{NAV}\nunique first article body text here\n{FOOTER}"),
        (2, f"{NAV}\nanother distinct article body\n\n{FOOTER}"),
        (3, f"{NAV}\nthird page unique content line\n{FOOTER}"),
        (4, "a fully unique page with no chrome at all\nsecond unique line"),
        (5, f"{FOOTER}"),  # all-boilerplate doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_doc_frequency(spark):
    freq = {
        r["sample_line"]: r["n_docs"]
        for r in line_doc_frequency(_docs(spark)).collect()
    }
    assert freq[NAV] == 3
    assert freq[FOOTER] == 4
    assert freq["second unique line"] == 1
    # empty line (doc 2) is exempt -> absent from the table
    assert "" not in freq


def test_drop_boilerplate_matches_oracle(spark):
    docs = _docs(spark)
    got = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in drop_boilerplate_lines(docs, max_doc_frequency=2).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text TEXT)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)",
        [(r["doc_id"], r["text"]) for r in docs.collect()],
    )
    want = {
        int(d): (t, int(k), int(x))
        for d, t, k, x in con.execute(r"""
            WITH lines AS (
              SELECT doc_id,
                     generate_subscripts(string_split(text, chr(10)), 1) AS line_no,
                     unnest(string_split(text, chr(10))) AS line
              FROM docs
            ),
            t AS (
              SELECT *, regexp_replace(line, '^\s+|\s+$', '', 'g') AS tl
              FROM lines
            ),
            freq AS (
              SELECT md5(tl) AS h, count(DISTINCT doc_id) AS n
              FROM t WHERE len(tl) >= 10 GROUP BY 1
            ),
            tagged AS (
              SELECT t.*, (len(tl) >= 10 AND f.n > 2) AS dropped
              FROM t LEFT JOIN freq f ON len(tl) >= 10 AND md5(tl) = f.h
            )
            SELECT doc_id,
                   string_agg(CASE WHEN NOT COALESCE(dropped, FALSE)
                                   THEN line END, chr(10) ORDER BY line_no),
                   sum(CASE WHEN NOT COALESCE(dropped, FALSE) THEN 1 ELSE 0 END),
                   sum(CASE WHEN COALESCE(dropped, FALSE) THEN 1 ELSE 0 END)
            FROM tagged GROUP BY doc_id
        """).fetchall()
    }
    con.close()
    # string_agg skips NULLs -> all-dropped doc yields NULL, ours ""
    want[5] = ("", want[5][1], want[5][2])
    assert got == want
    # chrome gone, bodies intact, order preserved
    assert got[1][0] == "unique first article body text here"
    assert got[2][0] == "another distinct article body\n"
    assert got[4] == (
        "a fully unique page with no chrome at all\nsecond unique line", 2, 0,
    )
    assert got[5] == ("", 0, 1)


def test_threshold_and_exemption_edges(spark):
    docs = _docs(spark)
    # threshold above every frequency -> nothing dropped, text intact
    out = drop_boilerplate_lines(docs, max_doc_frequency=10)
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out.collect():
        assert r["text"] == orig[r["doc_id"]]
        assert r["n_lines_dropped"] == 0
    # a short repeated line ('1.') is exempt even at threshold 1
    short = spark.createDataFrame(
        [(1, "1.\nlong unique content line one"),
         (2, "1.\nlong unique content line two")],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]: r["text"]
        for r in drop_boilerplate_lines(short, max_doc_frequency=1).collect()
    }
    assert kept[1].startswith("1.\n") and kept[2].startswith("1.\n")
    with pytest.raises(ValueError):
        drop_boilerplate_lines(docs, max_doc_frequency=0)

"""HTML → text extraction (operators/html.py): hand-pinned fixtures
for the structural rules (drop-content elements, block newlines,
entity ordering) and the corpus-pass contract (passthrough columns,
empty-shell filter)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.html import (
    extract_html_text,
    html_title,
    html_to_text,
)


def _one(spark, html: str) -> str:
    return (
        spark.range(1)
        .select(html_to_text(F.lit(html)).alias("t"))
        .first()["t"]
    )


def test_html_tags_strip_and_blocks_break(spark):
    html = (
        "<html><body><h1>Title Here</h1>"
        "<p>First <b>bold</b> paragraph.</p>"
        "<p>Second<br>line</p>"
        "<ul><li>one</li><li>two</li></ul></body></html>"
    )
    out = _one(spark, html)
    assert "<" not in out and ">" not in out
    lines = out.split("\n")
    assert lines[0] == "Title Here"
    assert "First bold paragraph." in lines  # inline <b> leaves no break
    assert "one" in lines and "two" in lines
    # <br> breaks within the second paragraph
    i = lines.index("Second")
    assert lines[i + 1] == "line"


def test_html_drop_content_elements_and_comments(spark):
    html = (
        "<head><title>T</title><style>p{color:red}</style></head>"
        "<script>var x = '<p>fake</p>';</script>"
        "<noscript>enable js</noscript>"
        "<!-- secret comment -->"
        "<p>real text</p>"
    )
    out = _one(spark, html)
    assert out == "real text"
    # script CONTENT is gone, including the tag-looking string inside
    assert "fake" not in out and "color" not in out
    assert "secret" not in out and "enable" not in out


def test_html_entities_decode_with_amp_last(spark):
    # &amp;lt; is an ESCAPED "&lt;" — must decode to the literal text
    # "&lt;", never double-decode to "<"; same for the numeric form
    out = _one(spark, "<p>a &lt; b &amp;lt; c &#38;lt; &quot;q&quot; &#39;s&#39;</p>")
    assert out == "a < b &lt; c &lt; \"q\" 's'"
    out2 = _one(spark, "<p>caf&#xe9; stays; x&#160;y &#x3c;tag&#x3e;</p>")
    # un-enumerated numeric entity stays literal (honest degradation)
    assert "caf&#xe9;" in out2
    assert "x y" in out2 and "<tag>" in out2


def test_html_whitespace_normalizes(spark):
    html = "<div>a</div>\n\n\n<div>b</div><p>  c   d  </p>"
    out = _one(spark, html)
    assert out == "a\nb\nc d"


def test_html_title(spark):
    row = (
        spark.range(1)
        .select(
            html_title(
                F.lit("<head><title> A &amp;\n B </title></head><body/>")
            ).alias("t"),
            html_title(F.lit("<p>no title</p>")).alias("none"),
        )
        .first()
    )
    assert row["t"] == "A & B"
    assert row["none"] == ""


def test_extract_html_text_corpus_pass(spark):
    docs = spark.createDataFrame(
        [
            (1, "<p>keep me</p>", "en"),
            (2, "<style>all chrome</style>", "en"),  # empty shell
            (3, "<title>T3</title><p>body3</p>", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    out = extract_html_text(docs).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1, 3]  # shell dropped
    assert out[0]["text"] == "keep me" and out[0]["lang"] == "en"
    assert out[1]["title"] == "T3" and out[1]["text"] == "body3"
    # title disabled: column absent
    no_title = extract_html_text(docs, title_col=None)
    assert "title" not in no_title.columns
    with pytest.raises(ValueError, match="min_chars"):
        extract_html_text(docs, min_chars=-1)


def test_html_extract_corpus_head_semantics(spark, sf_dir):
    """The bench head's wrap→extract round trip must conserve the
    corpus: every document survives (no shell ever — real text inside
    the chrome), every title extracts, and total extracted chars sit
    in a tight band around the original text volume (sentence breaks
    are length-neutral '. '→'.\\n'; the footer adds a fixed ~21 chars
    per doc; whitespace collapse can only shrink)."""
    from sensorstream_scalable_sensor_data_pipeline_spark.plans.text import (
        html_extract_corpus_head,
    )
    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    orig_chars = docs.agg(F.sum(F.length("text"))).first()[0]
    got = html_extract_corpus_head(spark, sf_dir)
    tot = got.agg(
        F.sum("n_docs").alias("n"),
        F.sum("total_chars").alias("c"),
        F.sum("total_title_chars").alias("t"),
    ).first()
    assert tot["n"] == n_docs
    footer = len("footer © nav & chrome") + 1  # + its block newline
    assert orig_chars * 0.95 <= tot["c"] <= orig_chars + n_docs * footer
    # every title is "Doc & title #<id>" — at least 14 chars each
    assert tot["t"] >= n_docs * 14


def _duckdb_html_to_text(duck, s: str) -> str:
    """DuckDB (RE2) replay of the EXACT html_to_text chain, step by
    step, driven from the module's own constants so the oracle cannot
    drift from the implementation order."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.html import (
        _BLOCK_TAGS,
        _DROP_CONTENT,
        _ENTITIES,
    )

    def rre(v, pat, repl):
        return duck.execute(
            "SELECT regexp_replace(?, ?, ?, 'g')", [v, pat, repl]
        ).fetchone()[0]

    def lit(v, frm, to):
        return duck.execute(
            "SELECT replace(?, ?, ?)", [v, frm, to]
        ).fetchone()[0]

    for el in _DROP_CONTENT:
        s = rre(s, f"(?is)<{el}\\b[^>]*>.*?</{el}>", " ")
    s = rre(s, "(?s)<!--.*?-->", " ")
    s = rre(s, f"(?i)</?(?:{_BLOCK_TAGS})\\b[^>]*>", "\n")
    s = rre(s, "(?s)<[^>]*>", "")
    for ent, repl in (
        ("&#34;", '"'), ("&#x22;", '"'),
        ("&#60;", "<"), ("&#x3c;", "<"),
        ("&#62;", ">"), ("&#x3e;", ">"),
        ("&#160;", " "), ("&#xa0;", " "),
        ("&#39;", "'"), ("&#x27;", "'"),
        ("&#38;", "\x00amp\x00"), ("&#x26;", "\x00amp\x00"),
    ):
        s = lit(s, ent, repl)
    for ent, repl in _ENTITIES:
        s = lit(s, ent, repl)
    s = lit(s, "\x00amp\x00", "&")
    s = rre(s, "[ \\t\\r\\f]+", " ")
    s = rre(s, " ?\\n ?", "\n")
    s = rre(s, "\\n{2,}", "\n")
    s = rre(s, "^\\s+|\\s+$", "")
    return s


def test_html_to_text_matches_duckdb_replay(spark, sf_dir):
    """Engine-replay oracle: Spark's html_to_text output equals a
    step-by-step DuckDB (RE2) replay of the same chain — over the
    bench head's wrapped real documents AND crafted edge strings."""
    import duckdb

    from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").limit(25)
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Doc &amp; #"),
            F.col("doc_id").cast("string"),
            F.lit("</title><style>p{}</style></head><body><p>"),
            F.regexp_replace(F.col("text"), "\\. ", ".</p>\n<p>"),
            F.lit("</p><div>footer &copy; nav &#38; chrome</div></body></html>"),
        ).alias("html"),
    )
    edge = [
        (9001, "<p>a &amp;lt; b</p><script>x<y</script>"),
        (9002, "no markup at all"),
        (9003, "<DIV CLASS='x'>upper</DIV><br/><p>mixed</p>"),
        (9004, "<p>broken <unclosed attr='v' </p>trailing"),
    ]
    rows = wrapped.collect() + [
        {"doc_id": i, "html": s} for i, s in edge  # type: ignore[misc]
    ]
    duck = duckdb.connect()
    got = {
        v["doc_id"]: v["t"]
        for v in spark.createDataFrame(
            [(r["doc_id"], r["html"]) for r in rows],
            "doc_id long, html string",
        )
        .select("doc_id", html_to_text(F.col("html")).alias("t"))
        .collect()
    }
    for r in rows:
        want = _duckdb_html_to_text(duck, r["html"])
        assert got[r["doc_id"]] == want, f"doc {r['doc_id']} diverged"


def test_html_extract_composes_with_curation(spark, tmp_path):
    """The claimed composition: extract_html_text output written as a
    documents table feeds curate_training_corpus directly (doc_id +
    text contract) — the web-pipeline shape HTML → extract → curate."""
    from sensorstream_scalable_sensor_data_pipeline_spark.plans.text import (
        curate_training_corpus,
    )

    body = (
        "the quick brown fox jumps over the lazy dog and then it "
        "runs far away into the quiet green hills where the sun is "
        "warm and the water is clear for token {i} of this corpus"
    )
    docs = spark.createDataFrame(
        [
            (i, f"<html><body><p>{body.format(i=i)}</p></body></html>")
            for i in range(30)
        ]
        + [(99, "<style>pure chrome</style>")],
        "doc_id long, text string",
    )
    extracted = extract_html_text(docs, title_col=None)
    sf = str(tmp_path)
    extracted.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = curate_training_corpus(spark, sf)
    ids = {r["doc_id"] for r in out.collect()}
    assert 99 not in ids  # the shell never reached curation
    assert len(ids) > 0


def test_extract_html_text_stays_codegen(spark):
    """The whole pass is Catalyst expressions — no BatchEvalPython /
    ArrowEvalPython node may appear (zero-UDF discipline, §2.11)."""
    docs = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, text string")
    plan = (
        extract_html_text(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan

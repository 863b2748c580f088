"""URL/domain curation (operators/urls.py): canonicalization pinned
case-by-case and vs a DuckDB regexp replay, plus blocklist/cap/profile
behavior on the documents table's source column."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.operators.urls import (
    TRACKING_PARAMS,
    canonicalize_url,
    cap_per_domain,
    domain_profile,
    filter_blocked_domains,
    registrable_domain,
    url_domain,
)
from sensorstream_scalable_sensor_data_pipeline_spark.sources.tables import load_table

CASES = [
    # (raw, canonical, domain)
    (
        "HTTPS://Example.COM/Path?a=1&utm_source=x&b=2#frag",
        "https://example.com/Path?a=1&b=2",
        "example.com",
    ),
    (
        "http://a.b.Example.com/?utm_campaign=spring",
        "http://a.b.example.com",
        "a.b.example.com",
    ),
    (
        "https://shop.example.co.uk/item?fbclid=abc&gclid=Z",
        "https://shop.example.co.uk/item",
        "shop.example.co.uk",
    ),
    (
        "https://example.com/page?utm_source=x&keep=1",
        "https://example.com/page?keep=1",
        "example.com",
    ),
    ("https://example.com/plain", "https://example.com/plain", "example.com"),
    ("not a url at all", "", ""),
]


def test_canonicalize_and_domain_cases(spark):
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], "raw string")
    rows = df.select(
        "raw",
        canonicalize_url(F.col("raw")).alias("canon"),
        url_domain(F.col("raw")).alias("dom"),
    ).collect()
    got = {r["raw"]: (r["canon"], r["dom"]) for r in rows}
    for raw, canon, dom in CASES:
        assert got[raw] == (canon, dom), raw


def test_canonicalize_idempotent(spark):
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], "raw string")
    once = df.select(canonicalize_url(F.col("raw")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c2")).collect()
    want = [r["c"] for r in once.collect()]
    assert [r["c2"] for r in twice] == want


def test_tracking_strip_matches_duckdb(spark):
    """The tracking-param strip (the dedup-critical piece) replays in
    DuckDB RE2 with the same pattern list."""
    raws = [r for r, _, _ in CASES] + [
        "https://x.io/p?mc_eid=7&a=1",
        "https://x.io/p?a=1&msclkid=9",
    ]
    df = spark.createDataFrame([(r,) for r in raws], "raw string")
    got = [
        r["c"]
        for r in df.select(
            F.col("raw"), canonicalize_url(F.col("raw")).alias("c")
        ).orderBy("raw").collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE u (raw TEXT)")
    con.executemany("INSERT INTO u VALUES (?)", [(r,) for r in raws])
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.urls import (
        _STRIP_PASSES,
        _TP,
    )

    expr = "regexp_replace(raw, '#.*$', '')"
    expr = (
        "lower(regexp_extract(" + expr + ", '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))"
        " || regexp_extract(" + expr + ", '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1)"
    )
    for _ in range(_STRIP_PASSES):
        expr = f"regexp_replace({expr}, '([?&]){_TP}=[^&#]*&', '\\1', 'g')"
        expr = f"regexp_replace({expr}, '[?&]{_TP}=[^&#]*$', '', 'g')"
    expr = f"regexp_replace({expr}, '^(https?://[^/?#]+)/$', '\\1')"
    want = [r[0] for r in con.execute(f"SELECT {expr} FROM u ORDER BY raw").fetchall()]
    con.close()
    assert got == want


def test_registrable_domain_approximation(spark):
    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.com",), ("localhost",)], "h string"
    )
    got = [
        r["d"]
        for r in df.select(registrable_domain(F.col("h")).alias("d")).collect()
    ]
    assert got == ["example.com", "example.com", ""]


def test_blocklist_cap_profile_on_sources(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    block = spark.createDataFrame([("SRC1",), ("src2",)], "source string")
    kept = filter_blocked_domains(docs, block, "source")
    assert kept.filter(F.col("source").isin("src1", "src2")).count() == 0
    assert kept.count() == docs.filter("source NOT IN ('src1','src2')").count()

    capped = cap_per_domain(docs, "source", 10)
    per = capped.groupBy("source").count().collect()
    assert all(r["count"] == 10 for r in per)  # every source has 25 docs
    # deterministic under repartition
    again = cap_per_domain(docs.repartition(9), "source", 10)
    assert {r["doc_id"] for r in again.select("doc_id").collect()} == {
        r["doc_id"] for r in capped.select("doc_id").collect()
    }

    prof = {r["source"]: r for r in domain_profile(docs, "source").collect()}
    one = docs.filter("source = 'src3'")
    assert prof["src3"]["n_docs"] == one.count()
    assert prof["src3"]["total_chars"] == one.agg(
        F.sum(F.length("text"))
    ).collect()[0][0]

"""URL canonicalization & source/domain-level curation (§2.12
LLM-pipeline extension — the provenance half of web-corpus cleaning).

Web corpora are filtered at three provenance grains: the URL (strip
rotating tracking parameters so the same page keys identically — the
companion of operators/scrub.py, which REDACTS urls from text; this
module normalizes them as metadata), the domain (blocklists,
per-domain caps so one crawler-friendly site cannot dominate a
training mix), and the source label (the ``documents.source`` column
here). Everything is scan-speed regexp/column math plus broadcast
joins; nothing shuffles more than per-domain aggregate rows.

Patterns use plain ASCII classes shared by Java regex (Spark) and
RE2 (DuckDB) — the scrub-module discipline — so every op is
locally oracle-replayable.

``url_domain`` returns the full lowercased host; the
``registrable_domain`` helper folds it to the last two labels — a
deliberate approximation of the Public Suffix List (a real PSL needs
the suffix table, which is a broadcast-joinable data file, not code;
the approximation is documented rather than silently wrong:
``co.uk``-style suffixes fold one label short).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tracking parameters every canonicalizer strips (utm family and the
#: big ad-click ids). Kept as an explicit tuple — the contract IS the
#: list, and tests replay it in DuckDB.
TRACKING_PARAMS = ("utm_[a-z]+", "fbclid", "gclid", "msclkid", "mc_eid")

#: One alternation over every tracked parameter name.
_TP = "(?:" + "|".join(TRACKING_PARAMS) + ")"

#: Strip passes: regexp_replace is a single non-overlapping
#: left-to-right scan in BOTH Java and RE2, so one pass removes every
#: other parameter of an adjacent tracked run (the separator of the
#: next match is consumed by the previous one). Each pass halves the
#: longest surviving run; 3 passes clear runs of up to 8 adjacent
#: tracking params — beyond any real URL. RE2 has no lookbehind, so
#: this is the engine-portable form.
_STRIP_PASSES = 3


def canonicalize_url(url: Column) -> Column:
    """Normalize a URL for identity comparison: lowercase scheme+host,
    drop the fragment, strip tracking query parameters (keeping the
    ``?``/``&`` structure of survivors intact), drop a trailing slash
    on a bare host. Rotating tracking decorations stop defeating
    exact dedup — the same motivation as scrub-before-fingerprint,
    applied to the metadata column."""
    c = F.regexp_replace(url, r"#.*$", "")  # fragment
    # lowercase scheme://host (path stays case-sensitive)
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$", 1),
    )
    for _ in range(_STRIP_PASSES):
        # mid-query param: keep its leading separator for the successor
        c = F.regexp_replace(c, rf"([?&]){_TP}=[^&#]*&", "$1")
        # final param: the separator goes with it
        c = F.regexp_replace(c, rf"[?&]{_TP}=[^&#]*$", "")
    c = F.regexp_replace(c, r"^(https?://[^/?#]+)/$", "$1")
    return c


def url_domain(url: Column) -> Column:
    """Lowercased host of a URL ('' when there is none): the
    blocklist/caps key."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1))


def registrable_domain(host: Column) -> Column:
    """Last two dot-labels of a host — the PSL approximation (module
    docstring caveat). 'a.b.example.com' → 'example.com'."""
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def filter_blocked_domains(
    docs: DataFrame,
    blocklist: DataFrame,
    domain_col: str,
) -> DataFrame:
    """Drop documents whose domain is blocklisted: one broadcast
    anti-join (blocklists are list-sized, never corpus-sized).
    ``blocklist`` carries one column named like ``domain_col``;
    matching is exact on the lowercased value."""
    b = blocklist.select(F.lower(F.col(domain_col)).alias(domain_col)).distinct()
    return docs.withColumn(domain_col, F.lower(F.col(domain_col))).join(
        F.broadcast(b), domain_col, "left_anti"
    )


def cap_per_domain(
    docs: DataFrame,
    domain_col: str,
    max_docs: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``max_docs`` documents per domain, chosen
    deterministically by salted content hash — the anti-dominance cap
    (one crawler-friendly domain must not swamp the mixture). Exactly
    operators/sampling.py::sample_per_group with the domain as the
    stratum; same one-keyed-window cost, same repartition stability."""
    from sensorstream_scalable_sensor_data_pipeline_spark.operators.sampling import (
        sample_per_group,
    )

    return sample_per_group(docs, domain_col, id_col, max_docs, salt="domain-cap")


def domain_profile(
    docs: DataFrame,
    domain_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-domain curation report: doc count, total/mean chars —
    the artifact blocklist and cap decisions are made from. One
    map-side-combined aggregate; rows = distinct domains."""
    chars = F.length(F.col(text_col)).cast("long")
    return docs.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(chars).alias("total_chars"),
        F.avg(chars).alias("mean_chars"),
    )

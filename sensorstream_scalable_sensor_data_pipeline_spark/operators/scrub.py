"""Pattern-based text scrubbing (§2.12 extension): redact
machine-recognizable PII-ish spans (emails, URLs, IPv4s) before a
corpus ships to training — the standard cleaning stage between
quality filtering and dedup. Pure chained ``regexp_replace`` column
math: scan-speed, zero UDFs, zero shuffles.

Pattern discipline: every pattern is written in the common subset of
Java regex (Spark) and RE2 (DuckDB) — no backrefs, no lookaround —
so the scrub is oracle-checkable byte-for-byte, and redaction COUNTS
(``regexp_extract_all`` size) replay identically too. Order matters
and is fixed: URLs first (an email-looking userinfo inside a URL
must redact as part of the URL), then emails, then bare IPv4s.

Scale note: scrubbing BEFORE dedup also repairs dedup recall — two
documents identical except for a rotating tracking URL become exact
duplicates once scrubbed; run it upstream of the fingerprint stage
(operators/dedup_incremental.py) for that reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) applied in order.
SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def scrub_text(col: Column) -> Column:
    """Redact every configured pattern, in order."""
    out = col
    for _, pat, repl in SCRUB_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_docs(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Scrubbed text plus per-pattern redaction counts (the audit
    columns a compliance review asks for). Counts are measured on the
    progressively-scrubbed text so overlapping patterns are not
    double-counted — same order as the replacements."""
    out_col = out_col or text_col
    cur = F.col(text_col)
    counted = df
    for name, pat, repl in SCRUB_PATTERNS:
        counted = counted.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        )
        cur = F.regexp_replace(cur, pat, repl)
    return counted.withColumn(out_col, cur)

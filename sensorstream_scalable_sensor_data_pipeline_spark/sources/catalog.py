"""Catalog discovery + month-table pruning (S4, F7, X9).

The reference's fact data is manually month-partitioned into many
PostgreSQL tables named ``<base>_YYYY_MM``, discovered at runtime from
``information_schema.tables`` (main_pipeline.py:283-286) and pruned
driver-side by parsing names against the cutoff date
(``filter_tables``, main_pipeline.py:179-187).

The idiomatic Spark replacement is a single dataset partitioned by
``(year, month)`` — Catalyst's static/dynamic partition pruning then
replaces the name parsing entirely (SURVEY §4 X9); see
``sources/writers.py::write_partitioned``. This module keeps the
*capability* for catalogs that really do expose table-per-month:

* ``list_tables`` — S4 via ``spark.catalog.listTables`` (no hand-built
  information_schema SQL).
* ``prune_month_tables`` — pure-driver name pruning with the
  reference's semantics: keep ``<base>_YYYY_MM`` tables whose month
  is >= the cutoff month (a table covers its whole month, so the
  cutoff's own month is kept).
* ``union_month_tables`` — fold of ``unionByName`` across the
  surviving scans (the reference's U1 as *intended*: its
  ``dfs[0].unionByName(*dfs[1:])`` at main_pipeline.py:301-303 is a
  varargs bug for >2 tables; the prototype's ``pd.concat`` fixes the
  semantics, Initial pipeline with pandas.txt:71).

Scale note: a unioned scan of K monthly relations plans as one job
with K leaf scans — no shuffle is introduced by the union itself, and
per-leaf filters still push down.
"""

from __future__ import annotations

import datetime as dt
from functools import reduce

from pyspark.sql import DataFrame, SparkSession


def list_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """S4: enumerate table names via the session catalog."""
    return [t.name for t in spark.catalog.listTables(database)]


def parse_month_table(name: str, base: str) -> tuple[int, int] | None:
    """Parse ``<base>_YYYY_MM`` → (year, month), else None.

    Mirrors filter_tables' split/digit checks (main_pipeline.py:179-187)
    without its assumption that the base name contains no underscores.
    """
    if not name.startswith(base + "_"):
        return None
    parts = name[len(base) + 1 :].split("_")
    if len(parts) != 2 or not all(p.isdigit() for p in parts):
        return None
    year, month = int(parts[0]), int(parts[1])
    if not 1 <= month <= 12:
        return None
    return year, month


def prune_month_tables(names: list[str], base: str, cutoff: dt.datetime) -> list[str]:
    """F7/X9: keep month-tables that can contain rows at/after cutoff."""
    keep = []
    for n in names:
        ym = parse_month_table(n, base)
        if ym is not None and ym >= (cutoff.year, cutoff.month):
            keep.append(n)
    return sorted(keep)


def union_month_tables(dfs: list[DataFrame]) -> DataFrame:
    """U1: N-ary UNION ALL by name as a fold (bug-free form of
    main_pipeline.py:301-303)."""
    if not dfs:
        raise ValueError("no tables to union")
    return reduce(lambda a, b: a.unionByName(b), dfs)


#: Regex-match predicate templates per SQL dialect. Postgres partial-
#: matches with ``~`` (the operator the reference pushes,
#: main_pipeline.py:347); DuckDB's ``~`` is regexp_full_match, so its
#: partial-match spelling is ``regexp_matches``.
_REGEX_PREDICATES = {
    "postgres": "{col} ~ '{pat}'",
    "duckdb": "regexp_matches({col}, '{pat}')",
}


def regex_predicate_sql(
    column: str, patterns: list[str], dialect: str = "postgres"
) -> str:
    """P8 as pushed SQL: the OR-fold of regex predicates the reference
    embeds in its tag-selection query (``_get_matching_ids``,
    main_pipeline.py:343-350), with the dialect spelled out so the
    same engine code drives Postgres (``~``) or an embedded test
    database. Patterns are validated to exclude quotes — they come
    from config, not user input, and the reference's f-string
    interpolation is kept ONLY under that invariant.

    Prefer the declarative form (``operators/filters.py::regex_filter``
    on a JDBC relation — Spark 3.3+ pushes RLIKE to JDBC sources via
    V2 pushdown) when reading whole tables; this helper is for the
    reference-parity path where the SQL string IS the interface."""
    if not patterns:
        raise ValueError("at least one pattern required")
    if dialect not in _REGEX_PREDICATES:
        raise ValueError(f"unknown dialect {dialect!r}")
    for p in patterns:
        if "'" in p or "\\" in p:
            raise ValueError(f"pattern {p!r} must not contain quotes/backslashes")
    tmpl = _REGEX_PREDICATES[dialect]
    return "(" + " OR ".join(tmpl.format(col=column, pat=p) for p in patterns) + ")"

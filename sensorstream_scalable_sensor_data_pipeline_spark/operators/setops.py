"""Set operations (U1, U2 in SURVEY §2.7).

``union_by_name_fold`` fixes the reference's varargs bug: its
``dfs[0].unionByName(*dfs[1:])`` (main_pipeline.py:301-303) breaks for
more than two frames; the intended semantics (prototype ``pd.concat``,
Initial pipeline with pandas.txt:71) is a left fold. Union is a purely
logical combinator — no shuffle; each input's scan parallelism is
preserved.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name_fold(dfs: list[DataFrame], allow_missing_columns: bool = False) -> DataFrame:
    """U1: N-ary UNION ALL matching columns by name."""
    if not dfs:
        raise ValueError("no DataFrames to union")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing_columns), dfs)


def union_positional(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2: positional UNION ALL (history-append path,
    main_pipeline.py:321-325)."""
    return a.union(b)

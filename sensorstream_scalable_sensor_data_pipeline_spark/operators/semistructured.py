"""Semi-structured column extraction (§2.12 — the ``events.props``
JSON payload and every schema-on-read sidecar like it).

The events table carries a JSON string column the relational surface
ignores; real pipelines need its fields as TYPED columns without a
pre-declared table schema. Three disciplines, strictest first:

* :func:`extract_json_fields` — explicit (name → path, type) map,
  ``get_json_object`` + cast per field: pure codegen, absent paths
  and type mismatches become NULL (never a job failure), exactly
  DuckDB's ``json_extract`` semantics for the oracle twin.
* :func:`parse_json_col` — full ``from_json`` with an explicit
  schema plus a ``_corrupt`` flag (non-null string that parses to
  nothing), the JSONL-source quarantine discipline
  (sources/readers.py) applied to a column.
* :func:`infer_json_schema` — bootstrap helper: infer the schema
  from a BOUNDED driver-side sample (never the whole column — schema
  inference over 100 TB is a full scan for metadata). The inferred
  schema is a starting point to pin down in code, not a runtime
  dependency; production paths pass explicit schemas (the engine's
  never-infer rule).

Plus :func:`flatten_struct` — promote struct fields to top-level
``parent_child`` columns (one select, no shuffle) so downstream
relational ops see flat columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def extract_json_fields(
    df: DataFrame,
    col: str,
    fields: dict[str, tuple[str, str]],
) -> DataFrame:
    """Add one typed column per entry of ``fields`` = {out_name:
    (json_path, spark_type)} — e.g. ``{"k": ("$.k", "long")}``.
    Missing paths / unparseable values → NULL."""
    if not fields:
        raise ValueError("fields must be non-empty")
    out = df
    for name, (path, typ) in fields.items():
        # try_cast, not cast: the session runs ANSI mode, where a
        # malformed value would fail the JOB; the contract here is
        # NULL (match json_extract-then-cast oracle semantics)
        out = out.withColumn(
            name, F.get_json_object(F.col(col), path).try_cast(typ)
        )
    return out


def parse_json_col(
    df: DataFrame,
    col: str,
    schema: StructType | str,
    out: str = "parsed",
    corrupt_flag: str = "_corrupt",
) -> DataFrame:
    """Parse a JSON string column against an EXPLICIT schema into one
    struct column, flagging rows whose non-null string failed to
    parse: the quarantine predicate — route flagged rows aside
    instead of silently nulling them.

    PERMISSIVE ``from_json`` yields a struct of NULL FIELDS for a
    corrupt record, not a NULL struct (indistinguishable from
    ``'{}'``), so corruption is detected the schema-sanctioned way: a
    corrupt-record column is appended to the parse schema and its
    non-nullness IS the flag. A NULL input string parses to a NULL
    ``out`` struct and is NOT corrupt (absent ≠ malformed)."""
    from pyspark.sql.types import StringType, StructField

    base = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    crec = "_corrupt_record"
    if crec in base.fieldNames():
        raise ValueError(f"schema may not contain {crec!r}")
    full = StructType(list(base.fields) + [StructField(crec, StringType())])
    parsed = F.from_json(F.col(col), full, {"columnNameOfCorruptRecord": crec})
    flag = F.coalesce(parsed[crec].isNotNull(), F.lit(False))
    clean = F.when(
        F.col(col).isNotNull() & ~flag,
        F.struct(*[parsed[f.name].alias(f.name) for f in base.fields]),
    )
    return df.withColumn(out, clean).withColumn(corrupt_flag, flag)


def infer_json_schema(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    sample_rows: int = 1000,
) -> StructType:
    """Infer a schema from up to ``sample_rows`` values — a BOUNDED
    collect (bytes ≈ sample × payload size), then Spark's JSON
    reader over the in-memory sample. Bootstrap tooling only; see
    module docstring."""
    sample = [
        r[0]
        for r in df.select(col).filter(F.col(col).isNotNull())
        .limit(int(sample_rows))
        .collect()
    ]
    if not sample:
        raise ValueError(f"no non-null values in {col!r} to infer from")
    return spark.read.json(
        spark.createDataFrame([(s,) for s in sample], "v string")
        .rdd.map(lambda r: r[0])
    ).schema


def flatten_struct(df: DataFrame, col: str, sep: str = "_") -> DataFrame:
    """Replace one struct column with top-level ``<col><sep><field>``
    columns (single select — column metadata only, no data movement).
    Nested structs flatten one level; call again for deeper."""
    dtype = df.schema[col].dataType
    if not isinstance(dtype, StructType):
        raise ValueError(f"{col!r} is not a struct column")
    keep = [c for c in df.columns if c != col]
    flat = [
        F.col(f"{col}.{f.name}").alias(f"{col}{sep}{f.name}")
        for f in dtype.fields
    ]
    return df.select(*keep, *flat)

"""Schema registry + validation core (SURVEY.md §1.2, M1).

The reference declares fixed, explicitly-typed flat schemas
(class ``PipelineSchemas``, /root/reference/main_pipeline.py:76-97)
and *enforces* them on every boundary (``_validate_schema``,
main_pipeline.py:202-211): force-cast present columns, raise on
missing non-nullable columns, prune extras with a final select.

This module re-expresses that contract as engine utilities:

* ``TAGS`` / ``SENSOR_RAW`` / ``OUTPUT`` — the reference's three
  declared relations (main_pipeline.py:80-97).
* ``enforce_schema`` — cast + require + prune, fully declarative
  (``select`` of ``cast`` expressions → a single Project node that
  Catalyst collapses into the scan; zero extra shuffles or jobs).

Scale note: schema enforcement is a narrow map-side projection; it
survives any scale-up unchanged. Explicit ``spark.read.schema(...)``
additionally skips parquet footer schema-merge planning over many
files, which matters when a 100 TB table has 10^5+ files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- reference-native schemas (main_pipeline.py:76-97) -----------------

#: Sensor metadata dimension (main_pipeline.py:80-85). Small — always
#: the broadcast side of an enrichment join (main_pipeline.py:196).
TAGS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("tagpath", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("unit", T.StringType(), True),
    ]
)

#: Fact table: one row per (sensor, instant) reading
#: (main_pipeline.py:87-92). t_stamp is epoch **milliseconds**.
SENSOR_RAW = T.StructType(
    [
        T.StructField("tagid", T.IntegerType(), False),
        T.StructField("t_stamp", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("dataintegrity", T.IntegerType(), False),
    ]
)

#: Per-sensor output series (main_pipeline.py:94-97); the value column
#: is renamed to the sensor's flattened tagpath at emit time
#: (main_pipeline.py:315-320).
OUTPUT = T.StructType(
    [
        T.StructField("datetime", T.TimestampType(), False),
        T.StructField("sensor_value", T.DoubleType(), True),
    ]
)


class SchemaValidationError(ValueError):
    """A required (non-nullable) column is absent from the input."""


def enforce_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast/require/prune ``df`` to ``schema``.

    Mirrors the reference's ``_validate_schema``
    (main_pipeline.py:202-211): every declared column present is cast
    to its declared type; a missing non-nullable column raises; a
    missing nullable column materializes as typed NULL; undeclared
    columns are dropped. Emitted as ONE ``select`` so Catalyst sees a
    single Project it can push into the scan (column pruning, X10).
    """
    present = set(df.columns)
    cols = []
    for field in schema.fields:
        if field.name in present:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        elif not field.nullable:
            raise SchemaValidationError(
                f"required column {field.name!r} missing from input "
                f"(have: {sorted(present)})"
            )
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def drop_all_null_columns(df: DataFrame) -> DataFrame:
    """Drop columns whose every value is NULL (P11 — prototype
    ``dropna(axis=1, how='all')``, Initial pipeline with
    pandas.txt:181).

    Unlike ``enforce_schema`` (which prunes *undeclared* columns),
    this prunes *declared but empty* ones. One ``count(col)``-per-
    column aggregate (nulls excluded by COUNT semantics) — a single
    scan with partial aggregation, one-row exchange — then a driver
    select of the surviving columns. The extra job is inherent: the
    output schema depends on the data.
    """
    counts = df.agg(
        *[F.count(F.col(c)).alias(c) for c in df.columns]
    ).first()
    keep = [c for c in df.columns if counts[c] > 0]
    return df.select(*keep)

"""Text sources: the reference's ``.txt`` table format, plus CSV/JSON.

The reference ingests exactly one text format — tab-separated rows written by
``RandomDB`` (``src/RandomDB.java:117-145``) and type-converted against the
``.md`` schema by ``ConvertTxtToTbl`` (``src/ConvertTxtToTbl.java:40-63``).
Here that is a schema'd ``spark.read.csv`` with a tab separator: the schema
(from a :class:`TableSpec` or explicit ``StructType``) drives the same
per-column conversion, but distributed and with malformed-row accounting
instead of a hard exit.

CSV and JSON are the obvious neighbours with identical scan properties
(splittable text input → full-scan parallelism; no pushdown beyond partition
pruning — parquet remains the performance path, see catalog module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from spj_query_engine_spark.sources.schema import TableSpec, spec_to_struct


def _schema_of(schema: TableSpec | T.StructType) -> T.StructType:
    return spec_to_struct(schema) if isinstance(schema, TableSpec) else schema


def read_tab_text(
    spark: SparkSession, path: str, schema: TableSpec | T.StructType
) -> DataFrame:
    """The ``<T>.txt`` source: tab-separated, no header, schema-converted.
    ``mode=PERMISSIVE`` yields nulls for malformed fields (the reference's
    converter calls ``System.exit`` instead, ``ConvertTxtToTbl.java:50-60``)."""
    return spark.read.csv(path, sep="\t", header=False, schema=_schema_of(schema))


def read_csv(
    spark: SparkSession,
    path: str,
    schema: TableSpec | T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        return reader.csv(path, schema=_schema_of(schema))
    return reader.option("inferSchema", True).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: TableSpec | T.StructType | None = None
) -> DataFrame:
    if schema is not None:
        return spark.read.json(path, schema=_schema_of(schema))
    return spark.read.json(path)


def read_orc(
    spark: SparkSession, path: str, schema: TableSpec | T.StructType | None = None
) -> DataFrame:
    """ORC source — the columnar neighbour of the parquet path with the
    same scan properties (predicate pushdown, column pruning, splittable
    stripes); included so a lake standardized on ORC can feed the engine
    without conversion.  Schema is optional: ORC files self-describe, a
    provided spec just pins the read types."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(_schema_of(schema))
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)

"""Result sink — the reference's output contract, as a distributed write.

``QueryMain`` drains the root operator and prints tab-separated values with
``-NULL-`` for nulls, floats via ``String.valueOf`` (``src/QueryMain.java:
230-244``); the first line is the schema header (``printSchema``, ``:214-228``).

Spark-first: rows are formatted *inside the plan* (``concat_ws`` over
per-column casts — codegen, no driver loop) and written with the text
datasource, so a 100 TB result streams straight from executors to storage.
A header line cannot be "first" in a distributed write; it is written as a
sidecar ``_header`` file instead (or folded in by ``collect_result`` for
driver-side use, which is only for small results by definition).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_TOKEN = "-NULL-"  # QueryMain.java:237-238


def _fmt(col: Column) -> Column:
    return F.when(col.isNull(), F.lit(NULL_TOKEN)).otherwise(col.cast("string"))


def result_lines(df: DataFrame) -> DataFrame:
    """One string column ``value``: tab-joined, ``-NULL-`` for nulls."""
    # concat_ws skips nulls rather than rendering them, so nulls are replaced
    # per-column BEFORE joining
    return df.select(
        F.concat_ws("\t", *[_fmt(F.col(c)) for c in df.columns]).alias("value")
    )


def write_result_text(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Write the reference-format result to ``path`` (a directory of part
    files — the scalable shape).  ``single_file=True`` coalesces to one
    partition first: only for small results, it serializes the write."""
    lines = result_lines(df)
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)
    with open(os.path.join(path, "_header"), "w", encoding="utf-8") as fh:
        fh.write("\t".join(df.columns) + "\n")


def collect_result(df: DataFrame, limit: int | None = None) -> str:
    """Driver-side render (header + rows) for interactive use — the direct
    analog of the reference's console path.  Collects; small results only."""
    if limit is not None:
        df = df.limit(limit)
    rows = [r["value"] for r in result_lines(df).collect()]
    return "\n".join(["\t".join(df.columns)] + rows)


def write_result_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV sink (deterministic column order = plan order; one file per
    partition — the scalable shape)."""
    df.write.mode("overwrite").option("header", header).csv(path)


def write_result_parquet(df: DataFrame, path: str) -> None:
    """Parquet sink — the hand-off format for downstream pipeline stages
    (keeps types exactly; no text round-trip)."""
    df.write.mode("overwrite").parquet(path)

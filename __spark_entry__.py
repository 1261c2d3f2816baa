"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (pricing summary over lineitem) at sf0.001.
``queries()``   — every implemented operator/query from SURVEY.md §2 plus the
                  beyond-reference pipeline operators, as (spark, sf_dir) →
                  DataFrame callables.
``oracle_sql()``— matching ANSI-SQL DuckDB oracles (keys without an oracle get
                  the driver's weaker rows-only check; those are the
                  non-SQL-expressible ops and are flagged in their docstrings).

The engine lives in ``spj_query_engine_spark``; this module only adapts it to
the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spj_query_engine_spark.session import tune_session
from spj_query_engine_spark.workload import all_oracles, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return all_queries()["q14_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    fns = all_queries()

    def tuned(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return wrapped

    return {name: tuned(fn) for name, fn in fns.items()}


def oracle_sql() -> dict[str, str]:
    return all_oracles()

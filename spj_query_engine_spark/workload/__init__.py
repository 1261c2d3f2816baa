"""Query workload registry — every capability from SURVEY.md §2 (and the
beyond-reference pipeline operators) as (spark, sf_dir) -> DataFrame
callables, each paired with an ANSI-SQL DuckDB oracle where expressible."""

from spj_query_engine_spark.workload.registry import (  # noqa: F401
    WorkloadQuery,
    all_oracles,
    all_queries,
    register,
    REGISTRY,
)
from spj_query_engine_spark.workload import parity  # noqa: F401  (registers itself)
from spj_query_engine_spark.workload import text  # noqa: F401  (registers itself)
from spj_query_engine_spark.workload import dedup_queries  # noqa: F401  (registers itself)
from spj_query_engine_spark.workload import similarity_queries  # noqa: F401  (registers itself)
from spj_query_engine_spark.workload import temporal_queries  # noqa: F401  (registers itself)
from spj_query_engine_spark.workload import pipeline_queries  # noqa: F401  (registers itself)

"""Plan construction: dialect IR → DataFrame."""

from spj_query_engine_spark.plans.builder import build_plan  # noqa: F401

"""Registry plumbing for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class WorkloadQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    bench: bool = True  # include in bench.py's headline set


REGISTRY: dict[str, WorkloadQuery] = {}


def register(name: str, oracle: str | None, doc: str = "", bench: bool = True):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = WorkloadQuery(
            name=name, fn=fn, oracle=oracle, doc=doc, bench=bench
        )
        return fn

    return wrap


def all_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}

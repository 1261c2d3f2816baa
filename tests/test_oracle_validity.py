"""Every registered oracle must PARSE AND BIND in DuckDB against the real
table schemas — a seconds-fast guard that catches oracle typos and binder
breaks (nested windows, CTE name clashes, wrong column names) without
paying the multi-minute full gate."""

from __future__ import annotations

import duckdb
import pytest

from spj_query_engine_spark.catalog import TABLES, table_path
from spj_query_engine_spark.workload import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck_bound():
    con = duckdb.connect()
    for name in TABLES:
        path = table_path(SF_DIR, name)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}') LIMIT 0"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n in sorted(REGISTRY) if REGISTRY[n].oracle is not None]
)
def test_oracle_parses_and_binds(duck_bound, name):
    duck_bound.execute(f"EXPLAIN {REGISTRY[name].oracle}")

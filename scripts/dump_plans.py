"""Dump .explain('formatted') for the named registry entries to files.

Usage: python scripts/dump_plans.py <outdir> <suffix> <name...>
Writes <outdir>/<name>_<suffix>.txt for each entry.

LAZY MODE IS THE DEFAULT (r10, VERDICT r09 item 8): barriers/coarse scopes
no-op (the plan-hygiene suite's SPJ_LAZY_PLANS escape hatch, enabled here
by faking the pytest marker env var) so every file shows the FULL logical
subtree — before/after pairs stay comparable instead of an eager "after"
dump truncating to `Scan ExistingRDD` at the first barrier.

With SPJ_DUMP_EAGER=1 the barriers execute and the dump shows exactly the
plan that runs in production (useful to verify a barrier IS in place, at
the cost of running the materialization jobs and truncating the subtree).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spj_query_engine_spark.session import get_spark  # noqa: E402
from spj_query_engine_spark.workload import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    if os.environ.get("SPJ_DUMP_EAGER") != "1":
        # barrier()/coarse_materialize() honor SPJ_LAZY_PLANS only under
        # pytest; fake the marker so the dumped plan keeps the full subtree
        os.environ["SPJ_LAZY_PLANS"] = "1"
        os.environ.setdefault("PYTEST_CURRENT_TEST", "dump_plans_lazy_view")
    spark = get_spark("dump_plans", master="local[32]")
    for name in names:
        wq = REGISTRY[name]
        df = wq.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Break a sub-second registry entry's wall into package overhead vs Spark.

For each named entry, times separately over N iterations:
  * fn_build   — wq.fn(spark, sf_dir): Python-side plan construction
                 (load_tables py4j hops, dialect parse, DataFrame calls)
  * jvm_plan   — df._jdf.queryExecution().executedPlan() forced: analysis +
                 optimization + physical planning in the JVM (no job)
  * exec_only  — noop save on the ALREADY-planned frame: job scheduling +
                 task execution (+ write-path re-planning Spark does anyway)
  * end_to_end — fresh fn() + noop save, the exact bench measurement

Usage: python scripts/profile_floor.py q03_join2_project q14_pricing_summary
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spj_query_engine_spark.session import get_spark  # noqa: E402
from spj_query_engine_spark.workload import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("PROFILE_ITERS", "5"))


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("profile_floor", master="local[32]", shuffle_partitions=32)
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    for name in names:
        wq = REGISTRY[name]
        # one full warmup (codegen + any persisted intermediates)
        wq.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        build_t, plan_t, exec_t, e2e_t = [], [], [], []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            df = wq.fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            spark.catalog.clearCache()
            build_t.append(t1 - t0)
            plan_t.append(t2 - t1)
            exec_t.append(t3 - t2)
            gc.collect()
        for _ in range(ITERS):
            t0 = time.perf_counter()
            wq.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            e2e_t.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()
        med = lambda xs: round(statistics.median(xs), 4)  # noqa: E731
        print(
            f"{name}: build={med(build_t)} jvm_plan={med(plan_t)} "
            f"exec={med(exec_t)} e2e={med(e2e_t)}"
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Batch 3 interleaved A/B: GENERIC coarse-scope wrap — the registry entry
is built unchanged but on the coarse sub-session (fixed floor partitions for
the A/B), barriered, and rerooted back.  If wins confirm, the wiring gets
the proper optimizer-estimate clamp.

Usage: python scripts/ab_coarse3_r10.py [iters] name-substr...
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spj_query_engine_spark.operators.core import (  # noqa: E402
    _coarse_subsession,
    _reroot,
    barrier,
)
from spj_query_engine_spark.session import get_spark  # noqa: E402
from spj_query_engine_spark.workload import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET = int(os.environ.get("AB_COARSE_TARGET", "8"))


def coarse_entry(name):
    def fn(spark, sf_dir):
        sub = _coarse_subsession(spark)
        sub.conf.set("spark.sql.shuffle.partitions", str(TARGET))
        out = barrier(REGISTRY[name].fn(sub, sf_dir))
        return _reroot(out, spark)

    return fn


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:]
    spark = get_spark("ab_coarse3", master="local[32]", shuffle_partitions=32)
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    results = []
    for name in names:
        full = [n for n in REGISTRY if name in n]
        if len(full) != 1:
            print(f"skip {name}: matches {full}")
            continue
        name = full[0]
        old_fn, new_fn = REGISTRY[name].fn, coarse_entry(name)
        try:
            a = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
            b = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
            eq = "OK" if a == b else f"MISMATCH {len(a)} vs {len(b)}"
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        for fn in (old_fn, new_fn):
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        olds, news = [], []
        for _ in range(iters):
            for fn, out in ((old_fn, olds), (new_fn, news)):
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                out.append(time.time() - t0)
                spark.catalog.clearCache()
                import gc

                gc.collect()
        mo, mn = statistics.median(olds), statistics.median(news)
        results.append((name, mo, mn, mn / mo, eq))
        print(
            f"{name:28s} old {mo:6.3f}  new {mn:6.3f}  ratio {mn/mo:5.3f}  eq={eq}",
            flush=True,
        )
    print("\nsummary (ratio < 0.9 = wrap wins):")
    for name, mo, mn, r, eq in sorted(results, key=lambda x: x[3]):
        print(f"  {name:28s} {mo:6.3f} -> {mn:6.3f}  x{r:5.3f}  {eq}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Interleaved A/B: AQE on/off x shuffle-partition count for tiny-input
dialect queries, built LAZILY on a pre-configured clone session (no barrier,
no reroot — the frame just executes under the clone's conf).

Usage: python scripts/ab_aqe_r10.py [iters] name-substr...
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spj_query_engine_spark.session import clone_session, get_spark  # noqa: E402
from spj_query_engine_spark.workload import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:]
    spark = get_spark("ab_aqe", master="local[32]", shuffle_partitions=32)
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    arms = {"base": spark}
    for tag, (aqe, parts) in {
        "noaqe32": ("false", 32),
        "noaqe8": ("false", 8),
        "aqe8": ("true", 8),
    }.items():
        sub = clone_session(spark, parts)
        sub.conf.set("spark.sql.adaptive.enabled", aqe)
        arms[tag] = sub

    for name in names:
        full = [n for n in REGISTRY if name in n]
        if len(full) != 1:
            print(f"skip {name}: {full}")
            continue
        name = full[0]
        fn = REGISTRY[name].fn
        base_rows = None
        times = {}
        for tag, sess in arms.items():
            try:
                rows = sorted(map(tuple, fn(sess, SF_DIR).collect()))
            except Exception as exc:  # noqa: BLE001
                print(f"{name}/{tag}: ERROR {exc}", file=sys.stderr)
                times[tag] = float("nan")
                continue
            if base_rows is None:
                base_rows = rows
            eq = rows == base_rows
            fn(sess, SF_DIR).write.format("noop").mode("overwrite").save()
            if not eq:
                times[tag] = float("nan")
                print(f"{name}/{tag}: MISMATCH")
        for i in range(iters):
            for tag, sess in arms.items():
                if times.get(tag, 0) != times.get(tag, 0):
                    continue
                t0 = time.perf_counter()
                fn(sess, SF_DIR).write.format("noop").mode("overwrite").save()
                times.setdefault(tag, [])
                if isinstance(times[tag], list):
                    times[tag].append(time.perf_counter() - t0)
                sess.catalog.clearCache()
                import gc

                gc.collect()
        meds = {
            t: statistics.median(v) if isinstance(v, list) else v
            for t, v in times.items()
        }
        base = meds["base"]
        print(
            f"{name:26s} "
            + "  ".join(
                f"{t}={meds[t]:.3f}({meds[t]/base:.2f})" for t in arms if t in meds
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

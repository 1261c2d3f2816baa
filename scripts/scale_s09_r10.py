#!/usr/bin/env python
"""VERDICT r09 items 6 & 7: settle the s09/d12 scale questions.

Mode "ab100" — s09 assignment-barrier A/B at 100x (item 7): the r09
barrier materializes the n x n_probe `topp` frame once (homes sliced from
probes); its bench-scale A/B read 1.03 (flat) and it was kept on an
at-scale argument.  This runs knn_join_2level at 100x with the barrier ON
(shipped shape) vs OFF (core.barrier selectively no-opped for the
(vid, leaf, rnk) frame only — the leaf_all centroid barrier stays ON in
both arms), alternating, in one session.

Mode "x1000" — s09/d12 at 1000x (item 6): single measured run of each
(warmup skipped: ~2 s codegen is noise at this scale) plus the candidate
PAIR VOLUME (probes x homes on the leaf key — the quantity the r09
prefix_rows fix is supposed to make ~linear; the r08 `id < n` predicate
under-selected centroids 10x on the sparse 1000x id space).

Usage:
    python scripts/scale_s09_r10.py ab100  [iters]
    python scripts/scale_s09_r10.py x1000
"""
from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spj_query_engine_spark.session import get_spark  # noqa: E402
from spj_query_engine_spark.workload import REGISTRY  # noqa: E402

BASE = "/root/testdata/sf0.1"
SCALE100 = os.environ.get("SPARK_GRAFT_SCALE100_DIR", "/tmp/spj_scale100")
# pair families run on the pair-structure-CONTROLLED level-2 corpus
# (bench_scale_1000.build_scaled_pairs) — the plain level-2 corpus has no
# embeddings table and deliberately-unsalted duplicate structure
SCALE1000 = os.environ.get("SPARK_GRAFT_SCALE1000P_DIR", "/tmp/spj_scale1000p")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def ab100(iters: int = 2) -> None:
    from spj_query_engine_spark.operators import core

    spark = get_spark("scale_s09", master="local[32]", shuffle_partitions=32)
    fn = REGISTRY["s09_knn_join_2level"].fn

    real_barrier = core.barrier

    def no_topp_barrier(df):
        if [f.name for f in df.schema.fields] == ["vid", "leaf", "rnk"]:
            return df
        return real_barrier(df)

    times = {"on": [], "off": []}
    # one warmup per arm (codegen)
    for arm in ("on", "off"):
        core.barrier = real_barrier if arm == "on" else no_topp_barrier
        _noop(fn(spark, SCALE100))
        spark.catalog.clearCache()
        gc.collect()
    for i in range(iters):
        for arm in ("on", "off") if i % 2 == 0 else ("off", "on"):
            core.barrier = real_barrier if arm == "on" else no_topp_barrier
            t0 = time.time()
            _noop(fn(spark, SCALE100))
            times[arm].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
            print(f"  iter {i} barrier={arm}: {times[arm][-1]}s", flush=True)
    core.barrier = real_barrier
    on, off = statistics.median(times["on"]), statistics.median(times["off"])
    print(
        json.dumps(
            {
                "query": "s09_knn_join_2level",
                "corpus": SCALE100,
                "barrier_on": times["on"],
                "barrier_off": times["off"],
                "med_on": on,
                "med_off": off,
                "on_over_off": round(on / off, 3),
            }
        )
    )


def pair_volume(spark, sf_dir: str) -> dict:
    """Candidate pair volume of the two-level kNN join — the quantity the
    prefix_rows fix must keep ~linear.  Captures the operator's OWN `topp`
    assignment frame (schema (vid, leaf, rnk)) as it passes through
    core.barrier while the real query builds, then computes
    Σ_leaf probes(leaf) × homes(leaf): exactly the rerank join's row count
    before its qid != mid filter (no internals duplicated — the captured
    frame IS the executed assignment)."""
    from spj_query_engine_spark.operators import core

    real_barrier = core.barrier
    captured: dict = {}

    def capture(df):
        out = real_barrier(df)
        if [f.name for f in df.schema.fields] == ["vid", "leaf", "rnk"]:
            captured["topp"] = out
        return out

    core.barrier = capture
    try:
        REGISTRY["s09_knn_join_2level"].fn(spark, sf_dir)  # builds + barriers
    finally:
        core.barrier = real_barrier
    topp = captured["topp"]
    probes = topp.groupBy("leaf").agg(F.count(F.lit(1)).alias("p"))
    homes = (
        topp.filter(F.col("rnk") == 1)
        .groupBy("leaf")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    row = (
        probes.join(homes, "leaf")
        .agg(
            F.sum(F.col("p") * F.col("h")).alias("pairs"),
            F.count(F.lit(1)).alias("n_leaves"),
            F.max("h").alias("max_cell"),
        )
        .collect()[0]
    )
    n_vec = topp.select("vid").distinct().count()
    return {
        "candidate_pairs": int(row["pairs"]),
        "n_leaves_probed": int(row["n_leaves"]),
        "max_cell": int(row["max_cell"]),
        "n_vectors": int(n_vec),
    }


def x1000() -> None:
    spark = get_spark("scale_s09_1000", master="local[32]", shuffle_partitions=32)
    out: dict = {}
    # pair-volume geometry at each decade (cheap relative to the rerank)
    for label, d in (("1x", BASE), ("100x", SCALE100), ("1000x", SCALE1000)):
        if not os.path.isdir(d):
            continue
        vol = pair_volume(spark, d)
        out[f"s09_pair_volume_{label}"] = vol
        print(f"  s09 pair volume {label}: {vol}", flush=True)
        spark.catalog.clearCache()
        gc.collect()
    # s09's 1000x wall is recorded by bench_scale_1000.py (PAIR_FAMILY);
    # only d12 needs a dedicated 1000x wall here
    for name in ("d12_near_dup_2level",):
        fn = REGISTRY[name].fn
        t0 = time.time()
        _noop(fn(spark, SCALE1000))
        dt = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.time()
        _noop(fn(spark, BASE))
        base_dt = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        gc.collect()
        out[name] = {
            "sf0.1_sec": base_dt,
            "x1000_sec": dt,
            "ratio": round(dt / base_dt, 2) if base_dt else None,
        }
        print(f"  {name}: 1x {base_dt}s -> 1000x {dt}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ab100"
    if mode == "ab100":
        ab100(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    else:
        x1000()

#!/usr/bin/env python
"""Interleaved A/B over every coarse-wrapped entry: AQE partition COALESCING
on vs off INSIDE the
coarse sub-session (the scope that only activates when the optimizer proves
the input tiny).  Equivalence checked by sorted collect per entry.

Usage: python scripts/ab_coarse_aqe_r10.py [iters] [name-substr ...]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spj_query_engine_spark.operators import core  # noqa: E402
from spj_query_engine_spark.session import get_spark  # noqa: E402
from spj_query_engine_spark.workload import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ENTRIES = [
    "d02_minhash_lsh", "d04_simhash_pairs", "d05_ngram_jaccard",
    "d07_dup_clusters", "d09_cc_alternating", "d10_contamination",
    "d11_incremental_dedup", "d12_near_dup_2level", "d14_embedding_dedup",
    "d17_containment_pairs", "d18_minhash_calibration", "d21_lsh_band_tuning",
    "d25_neardup_weights", "d26_shingle_df_histogram", "d29_semantic_dedup",
    "g01_pagerank", "g02_triangle_count", "g03_kcore", "g04_bfs_distances",
    "g05_link_prediction", "g06_copurchase", "g07_clustering_coeff",
    "g08_personalized_pagerank", "g09_harmonic_centrality",
    "g10_assortativity", "g11_component_census",
    "p07_leakage_safe_split", "q45_recursive_closure", "t19_bpe_apply",
    "s02_ann_lsh", "s06_knn_join", "s09_knn_join_2level", "s11_lsh_recall",
    "s13_sq_topk", "s14_mmr_topk", "s16_rrf_fusion", "s17_nn_descent",
    "s18_multiprobe_lsh", "s19_sim_histogram",
]

AQE_OFF = {"v": False}
_orig = core.coarse_materialize


def patched(build, df, floor=8, per_partition=1 << 20, aqe=True):  # noqa: ARG001 - arm B overrides the entry's own aqe choice
    spark_ = df.sparkSession
    if getattr(spark_, "_spj_coarse_sub", False):
        return core.barrier(build(df))
    target = core._coarse_target(df, floor, per_partition)
    if target is None:
        return core.barrier(build(df))
    sub = core._coarse_subsession(spark_)
    sub.conf.set("spark.sql.shuffle.partitions", str(target))
    # arm B (r10 refinement): keep AQE's join re-planning, disable only
    # partition coalescing — the advisory-size coalescer collapses every
    # tiny exchange to one task, serializing compute-carrying stages
    sub.conf.set("spark.sql.adaptive.enabled", "true")
    sub.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled",
        "false" if AQE_OFF["v"] else "true",
    )
    out = core.barrier(build(core._reroot(df, sub)))
    return core._reroot(out, spark_)


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    only = sys.argv[2:]
    core.coarse_materialize = patched
    spark = get_spark("ab_coarse_aqe", master="local[32]", shuffle_partitions=32)
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    results = []
    for name in ENTRIES:
        if only and not any(s in name for s in only):
            continue
        fn = REGISTRY[name].fn
        try:
            AQE_OFF["v"] = False
            a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
            AQE_OFF["v"] = True
            b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
            eq = "OK" if a == b else f"MISMATCH {len(a)} vs {len(b)}"
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        gc.collect()
        for v in (False, True):
            AQE_OFF["v"] = v
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            gc.collect()
        on, off = [], []
        for _ in range(iters):
            for v, out in ((False, on), (True, off)):
                AQE_OFF["v"] = v
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                out.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
                gc.collect()
        mo, mf = statistics.median(on), statistics.median(off)
        results.append((name, mo, mf, mf / mo, eq))
        print(
            f"{name:28s} on {mo:6.3f}  off {mf:6.3f}  ratio {mf/mo:5.3f}  eq={eq}",
            flush=True,
        )
    print("\nsummary (ratio < 1 = coalescing-off wins inside the coarse scope):")
    for name, mo, mf, r, eq in sorted(results, key=lambda x: x[3]):
        print(f"  {name:28s} {mo:6.3f} -> {mf:6.3f}  x{r:5.3f}  {eq}")


if __name__ == "__main__":
    main()

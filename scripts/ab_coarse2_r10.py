#!/usr/bin/env python
"""Batch 2 interleaved A/B: coarse-scope wrap candidates across the s-, q-,
m- and p-families.  Same protocol as scripts/ab_coarse_r10.py.

Usage: python scripts/ab_coarse2_r10.py [iters] [name-substr ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spj_query_engine_spark.catalog import load_tables  # noqa: E402
from spj_query_engine_spark.operators import multimodal, similarity  # noqa: E402
from spj_query_engine_spark.operators.core import coarse_materialize  # noqa: E402
from spj_query_engine_spark.session import get_spark  # noqa: E402
from spj_query_engine_spark.workload import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _emb(spark, sf_dir):
    return load_tables(spark, sf_dir, ("embeddings",))["embeddings"]


def _mm(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return multimodal.attach_payload(docs)


def wrap_emb(op):
    return lambda spark, sf: coarse_materialize(op, _emb(spark, sf))


def wrap_mm(op):
    return lambda spark, sf: coarse_materialize(op, _mm(spark, sf))


CANDIDATES = {
    "s02_ann_lsh": wrap_emb(similarity.lsh_topk),
    "s03_ann_ivf": wrap_emb(similarity.ivf_topk),
    "s05_ivf_trained_recall": wrap_emb(similarity.ivf_trained_recall),
    "s10_range_search": wrap_emb(similarity.range_search),
    "s11_lsh_recall": wrap_emb(similarity.lsh_recall),
    "s12_ivf_pq": wrap_emb(similarity.ivf_pq_topk),
    "s13_sq_topk": wrap_emb(similarity.sq_topk),
    "s14_mmr_topk": wrap_emb(similarity.mmr_topk),
    "s16_rrf_fusion": wrap_emb(similarity.rrf_fusion),
    "s18_multiprobe_lsh": wrap_emb(similarity.multiprobe_lsh_topk),
    "s21_ivf_probe_sweep": wrap_emb(similarity.ivf_probe_sweep),
    "s22_embedding_drift": wrap_emb(similarity.embedding_drift),
    "m07_frame_dup_pairs": wrap_mm(multimodal.frame_dup_pairs),
    "m13_ahash_pairs": wrap_mm(multimodal.ahash_pairs),
}


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = sys.argv[2:]
    spark = get_spark("ab_coarse2", master="local[32]", shuffle_partitions=32)
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    results = []
    for name, new_fn in CANDIDATES.items():
        if only and not any(s in name for s in only):
            continue
        old_fn = REGISTRY[name].fn
        try:
            a = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
            b = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
            eq = "OK" if a == b else f"MISMATCH {len(a)} vs {len(b)}"
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        for fn in (old_fn, new_fn):  # warm both
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

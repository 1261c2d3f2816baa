#!/usr/bin/env python
"""Batch 4 interleaved A/B: current registry shape vs coarse wrap WITH
coalescing disabled (the knob that flipped d14 from a 1.44 loss to a 0.56
win).  Re-tests the batch-1/2 wrap losers.

Usage: python scripts/ab_coarse4_r10.py [iters] [name-substr ...]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spj_query_engine_spark.catalog import load_tables  # noqa: E402
from spj_query_engine_spark.operators import (  # noqa: E402
    dedup,
    multimodal,
    similarity,
    textops,
)
from spj_query_engine_spark.operators.core import coarse_materialize  # noqa: E402
from spj_query_engine_spark.session import get_spark  # noqa: E402
from spj_query_engine_spark.workload import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _docs(spark, sf):
    return load_tables(spark, sf, ("documents",))["documents"]


def _emb(spark, sf):
    return load_tables(spark, sf, ("embeddings",))["embeddings"]


def _mm(spark, sf):
    return multimodal.attach_payload(_docs(spark, sf))


def w(op, src):
    return lambda spark, sf: coarse_materialize(
        op, {"d": _docs, "e": _emb, "m": _mm}[src](spark, sf), coalesce=False
    )


CANDIDATES = {
    "d03_simhash_fp": w(dedup.simhash_fingerprints, "d"),
    "d06_embedding_near_dup": w(dedup.embedding_near_dup, "e"),
    "d13_chunk_dedup": w(dedup.chunk_dedup_stats, "d"),
    "d15_strip_boilerplate": w(dedup.strip_boilerplate, "d"),
    "d19_span_dup_pairs": w(dedup.span_dup_pairs, "d"),
    "d27_span_coverage": w(dedup.span_coverage, "d"),
    "d28_dup_span_extents": w(dedup.dup_span_extents, "d"),
    "s03_ann_ivf": w(similarity.ivf_topk, "e"),
    "s08_pq_adc_topk": w(similarity.pq_adc_topk, "e"),
    "s10_range_search": w(similarity.range_search, "e"),
    "s12_ivf_pq": w(similarity.ivf_pq_topk, "e"),
    "s21_ivf_probe_sweep": w(similarity.ivf_probe_sweep, "e"),
    "s22_embedding_drift": w(similarity.embedding_drift, "e"),
    "t17_bigram_novelty": w(textops.bigram_novelty, "d"),
    "t18_bigram_lm": w(textops.bigram_lm_score, "d"),
    "t27_doc_keyphrases": w(textops.doc_keyphrases, "d"),
    "t31_bpe_train": w(textops.bpe_train_hist, "d"),
    "m07_frame_dup_pairs": w(multimodal.frame_dup_pairs, "m"),
    "m13_ahash_pairs": w(multimodal.ahash_pairs, "m"),
}


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = sys.argv[2:]
    spark = get_spark("ab_coarse4", master="local[32]", shuffle_partitions=32)
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
        gc.collect()
        for fn in (old_fn, new_fn):
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            gc.collect()
        olds, news = [], []
        for _ in range(iters):
            for fn, out in ((old_fn, olds), (new_fn, news)):
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                out.append(time.time() - t0)
                spark.catalog.clearCache()
                gc.collect()
        mo, mn = statistics.median(olds), statistics.median(news)
        results.append((name, mo, mn, mn / mo, eq))
        print(
            f"{name:28s} old {mo:6.3f}  new {mn:6.3f}  ratio {mn/mo:5.3f}  eq={eq}",
            flush=True,
        )
    print("\nsummary (ratio < 0.9 = coalesce-off wrap wins):")
    for name, mo, mn, r, eq in sorted(results, key=lambda x: x[3]):
        print(f"  {name:28s} {mo:6.3f} -> {mn:6.3f}  x{r:5.3f}  {eq}")


if __name__ == "__main__":
    main()

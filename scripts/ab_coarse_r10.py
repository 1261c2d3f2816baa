#!/usr/bin/env python
"""Batch interleaved A/B: current registry shape vs coarse-scope wrap.

For each candidate entry, arm A = REGISTRY[name].fn (current code), arm B =
the same operator under coarse_materialize (the d07/_graph_materialized
treatment).  Runs alternate A/B in ONE session; equivalence is checked once
per entry by sorted collect.  Prints a table of medians + ratios.

Usage: python scripts/ab_coarse_r10.py [iters] [name-substr ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spj_query_engine_spark.catalog import load_tables  # noqa: E402
from spj_query_engine_spark.operators import dedup, similarity, textops  # noqa: E402
from spj_query_engine_spark.operators.core import coarse_materialize  # noqa: E402
from spj_query_engine_spark.session import get_spark  # noqa: E402
from spj_query_engine_spark.workload import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ("documents",))["documents"]


def _emb(spark, sf_dir):
    return load_tables(spark, sf_dir, ("embeddings",))["embeddings"]


def wrap_docs(op):
    return lambda spark, sf: coarse_materialize(op, _docs(spark, sf))


def wrap_emb(op):
    return lambda spark, sf: coarse_materialize(op, _emb(spark, sf))


CANDIDATES = {
    "d03_simhash_fp": wrap_docs(dedup.simhash_fingerprints),
    "d04_simhash_pairs": wrap_docs(dedup.simhash_pairs),
    "d05_ngram_jaccard": wrap_docs(dedup.ngram_jaccard_pairs),
    "d10_contamination": wrap_docs(dedup.contamination),
    "d11_incremental_dedup": wrap_docs(dedup.incremental_dedup),
    "d13_chunk_dedup": wrap_docs(dedup.chunk_dedup_stats),
    "d15_strip_boilerplate": wrap_docs(dedup.strip_boilerplate),
    "d17_containment_pairs": wrap_docs(dedup.containment_pairs),
    "d18_minhash_calibration": wrap_docs(dedup.minhash_calibration),
    "d19_span_dup_pairs": wrap_docs(dedup.span_dup_pairs),
    "d21_lsh_band_tuning": wrap_docs(dedup.lsh_band_tuning),
    "d26_shingle_df_histogram": wrap_docs(dedup.shingle_df_histogram),
    "d27_span_coverage": wrap_docs(dedup.span_coverage),
    "d28_dup_span_extents": wrap_docs(dedup.dup_span_extents),
    "t17_bigram_novelty": wrap_docs(textops.bigram_novelty),
    "t18_bigram_lm": wrap_docs(textops.bigram_lm_score),
    "t27_doc_keyphrases": wrap_docs(textops.doc_keyphrases),
    "t31_bpe_train": wrap_docs(textops.bpe_train_hist),
    "s19_sim_histogram": wrap_emb(similarity.sim_histogram),
}


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = sys.argv[2:]
    spark = get_spark("ab_coarse", master="local[32]", shuffle_partitions=32)
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

#!/usr/bin/env python
"""Interleaved in-session A/B for the r10 g05/d12 restructures.

Arms (alternating, same session, N runs each, noop sink):
  g05_old — r09 shape: serial shingle-index barrier + 5-leg pool inside a
            coarse scope, wedge pipeline on the PARENT session.
  g05_new — r10 shape (dedup.common_neighbor_pairs): index built as a 6th
            concurrent job; WHOLE pipeline (wedges included) inside the
            coarse scope.
  d12_old — direct embedding_near_dup_2level on the parent session.
  d12_new — the same under the _emb_materialized coarse scope.

Also asserts both arms return identical rows (sorted collect) once.

Usage: python scripts/ab_g05_r10.py [g05|d12] [iters]
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spj_query_engine_spark.catalog import load_tables  # noqa: E402
from spj_query_engine_spark.operators import dedup  # noqa: E402
from spj_query_engine_spark.operators.core import (  # noqa: E402
    barrier,
    coarse_materialize,
)
from spj_query_engine_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _fused_old(d):
    inv = barrier(dedup.shingle_index(d))
    builders = [
        lambda: dedup.minhash_lsh_pairs(d, inv=inv).select("doc_a", "doc_b"),
        lambda: dedup.simhash_pairs(d).select("doc_a", "doc_b"),
        lambda: dedup.ngram_jaccard_pairs(d, inv=inv).select("doc_a", "doc_b"),
        lambda: dedup.containment_pairs(d, inv=inv).select(
            F.least("inner_id", "outer_id").alias("doc_a"),
            F.greatest("inner_id", "outer_id").alias("doc_b"),
        ),
        lambda: dedup.span_dup_pairs(d).select("doc_a", "doc_b"),
    ]
    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        mh, sh, ng, ct, sp = pool.map(lambda b: barrier(b()), builders)
    return (
        mh.unionByName(sh)
        .unionByName(ng)
        .unionByName(ct)
        .unionByName(sp)
        .distinct()
    )


def g05_old(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = coarse_materialize(_fused_old, docs)
    return dedup.common_neighbor_pairs_from_pairs(pairs)


def g05_new(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.common_neighbor_pairs(docs)


def g05_coarse_only(spark, sf_dir):
    """Whole-pipeline coarse scope but the r09 SERIAL shingle index."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return coarse_materialize(
        lambda d: dedup.common_neighbor_pairs_from_pairs(_fused_old(d)), docs
    )


def g05_idx_only(spark, sf_dir):
    """Concurrent shingle index (r10 fused_dup_edges) but wedges on the
    parent session (r09 scope)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = coarse_materialize(dedup.fused_dup_edges, docs)
    return dedup.common_neighbor_pairs_from_pairs(pairs)


def d12_old(spark, sf_dir):
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return dedup.embedding_near_dup_2level(emb)


def d12_new(spark, sf_dir):
    from spj_query_engine_spark.workload.dedup_queries import _emb_materialized

    return _emb_materialized(spark, sf_dir, dedup.embedding_near_dup_2level)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "g05"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    arms = {
        "g05": (g05_old, g05_new),
        "g05c": (g05_old, g05_coarse_only),
        "g05i": (g05_old, g05_idx_only),
        "d12": (d12_old, d12_new),
    }
    old_fn, new_fn = arms[which]

    spark = get_spark("ab_" + which, master="local[32]", shuffle_partitions=32)
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    # equivalence check once
    a = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
    assert a == b, f"ARMS DISAGREE: {len(a)} vs {len(b)} rows"
    print(f"equivalence OK ({len(a)} rows)")
    spark.catalog.clearCache()

    # warm both arms
    for fn in (old_fn, new_fn):
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    olds, news = [], []
    for i in range(iters):
        for fn, out in ((old_fn, olds), (new_fn, news)):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            out.append(time.time() - t0)
            spark.catalog.clearCache()
            import gc

            gc.collect()
    mo, mn = statistics.median(olds), statistics.median(news)
    print(f"old: med {mo:.3f}  runs {[round(x,3) for x in olds]}")
    print(f"new: med {mn:.3f}  runs {[round(x,3) for x in news]}")
    print(f"ratio new/old: {mn/mo:.3f}")


if __name__ == "__main__":
    main()

"""A/B harness for the MinHash-LSH pair-derivation subplan (r07 task 1).

BENCH_VARIANCE.md localized the g-family session variance to `ckpt_edges`
(shingle window + distinct + band self-join — ~10 stages of sub-100 ms tasks).
This script times the CURRENT subplan (A) against restructured variants in
ONE session, interleaved, so session-phase cannot masquerade as a code win.

Run:  python scripts/variance_ab.py [n_iters] [sf_dir]
"""
from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from spj_query_engine_spark.functions.hashing import h32  # noqa: E402
from spj_query_engine_spark.operators import dedup  # noqa: E402
from spj_query_engine_spark.operators.dedup import (  # noqa: E402
    SHINGLE_N,
    _minhash_bands,
    minhash_lsh_pairs,
    shingle_index,
)
from spj_query_engine_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 6


def edges_current(docs):
    """Variant A — exactly g01's ckpt_edges: pairs -> symmetric edges -> ckpt."""
    pairs = minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    return edges.localCheckpoint(eager=True)


def _inv_flat(docs, P):
    """Inverted index without the window: HOF builds gram STRINGS (cheap
    concat only), explode, hash in flat codegen, one repartition on doc_id
    so the distinct AND the signature groupBy are both partition-local."""
    words = F.split(F.col("text"), r"\s+")
    n = F.size(words)
    gram_strs = F.when(
        n >= SHINGLE_N,
        F.transform(
            F.sequence(F.lit(0), n - SHINGLE_N),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j + 1) for j in range(SHINGLE_N)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col("doc_id"), F.explode(gram_strs).alias("gram"))
        .select("doc_id", h32(F.col("gram")).alias("g"))
        .repartition(P, "doc_id")
        .distinct()
    )


def _pairs_from_inv(inv, bucket_pairs: bool):
    bands = _minhash_bands(dedup.minhash_perdoc(inv))
    if bucket_pairs:
        buckets = (
            bands.groupBy("band", "key")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .filter(F.size("ids") > 1)
        )
        cand = (
            buckets.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids)), "
                        "y -> struct(x AS doc_a, y AS doc_b))))"
                    )
                ).alias("p")
            )
            .select("p.doc_a", "p.doc_b")
            .distinct()
        )
    else:
        left = bands.alias("a")
        right = bands.alias("b")
        cand = (
            left.join(
                right,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
    sizes = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ia = inv.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("g_a"))
    ib = inv.select(F.col("doc_id").alias("doc_b2"), F.col("g").alias("g_b"))
    common = (
        cand.join(ia, "doc_a")
        .join(ib, (F.col("doc_b") == F.col("doc_b2")) & (F.col("g_a") == F.col("g_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jacc = F.col("n_common").cast("double") / F.greatest(
        F.col("n_a") + F.col("n_b") - F.col("n_common"), F.lit(1)
    ).cast("double")
    from spj_query_engine_spark.functions.hashing import portable_round

    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", portable_round(jacc, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= dedup.JACCARD_T)
    )


def edges_variant(docs, P, bucket_pairs):
    inv = _inv_flat(docs, P).persist()
    pairs = _pairs_from_inv(inv, bucket_pairs).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    out = edges.localCheckpoint(eager=True)
    inv.unpersist()
    return out


def main():
    spark = get_spark("variance_ab", master="local[32]")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from spj_query_engine_spark.operators.core import barrier

    variants = {
        "A_current": lambda: edges_current(docs),
        "B_flat_join": lambda: edges_variant(docs, 8, False),
        "C_flat_bucket": lambda: edges_variant(docs, 8, True),
        # D vs E: the SAME pair materialization under the session default
        # vs through coarse_materialize (r09's isolated-subsession scope) —
        # the coarse-win attribution the r07 A/B established, re-proven
        # against the per-plan mechanism
        "D_pairs_default": lambda: barrier(
            minhash_lsh_pairs(docs).select("doc_a", "doc_b")
        ),
        "E_pairs_coarse": lambda: dedup.lsh_pairs_ckpt(docs),
    }
    # correctness cross-check first (also warms cache/JIT)
    counts = {}
    for name, fn in variants.items():
        e = fn()
        counts[name] = e.count()
        rows = sorted(map(tuple, e.collect()))
        counts[name] = (counts[name], hash(tuple(rows)))
    print("edge (count, hash) per variant:", counts, flush=True)
    times = {k: [] for k in variants}
    for it in range(N):
        for name, fn in variants.items():
            t0 = time.time()
            e = fn()
            e.count()
            dt = time.time() - t0
            times[name].append(dt)
            print(f"iter {it} {name}: {dt:.2f}s", flush=True)
    summary = {
        k: {
            "med": round(statistics.median(v), 3),
            "min": round(min(v), 3),
            "max": round(max(v), 3),
            "runs": [round(x, 2) for x in v],
        }
        for k, v in times.items()
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

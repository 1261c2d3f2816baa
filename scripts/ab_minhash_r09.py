"""r09 A/B: minhash_lsh_pairs internal restructure candidates.

Variants (all value-identical to A by construction; cross-checked first):

  A_current      — minhash_lsh_pairs as shipped (window inv persisted,
                   band self-join, cand×shingles verify joins).
  F_fused_verify — ONE groupBy(doc_id) computes the 12 signature mins AND
                   collect_list(g) (inv is already distinct); candidates
                   unchanged; verify = two array joins + array_intersect
                   (codegen'd) instead of cand→ia→ib→groupBy→sizes×2.
  G_fused_bucket — F plus bucket-expansion candidates: groupBy(band,key),
                   sorted id list, HOF pair expansion (1 exchange instead
                   of the self-join's 2).

Interleaved in one session so session phase cannot masquerade as a win.
Run: python scripts/ab_minhash_r09.py [iters] [sf_dir]
"""
from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from spj_query_engine_spark.functions.hashing import portable_round  # noqa: E402
from spj_query_engine_spark.operators import dedup  # noqa: E402
from spj_query_engine_spark.operators.dedup import (  # noqa: E402
    _MINHASH_AB,
    JACCARD_T,
    LSH_BANDS,
    LSH_ROWS,
    minhash_lsh_pairs,
    shingle_index,
)
from spj_query_engine_spark.functions.hashing import minhash_perm  # noqa: E402
from spj_query_engine_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def _perdoc(docs):
    inv = shingle_index(docs)
    return inv.groupBy("doc_id").agg(
        F.collect_list("g").alias("gs"),
        *[
            F.min(minhash_perm(F.col("g"), a, b)).alias(f"m{j}")
            for j, (a, b) in enumerate(_MINHASH_AB)
        ],
    )


def _bands_from_perdoc(perdoc):
    return perdoc.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[F.col(f"m{b * LSH_ROWS + r}") for r in range(LSH_ROWS)],
                        ).alias("key"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")


def _verify_arrays(cand, perdoc):
    pa = perdoc.select(F.col("doc_id").alias("doc_a"), F.col("gs").alias("gs_a"))
    pb = perdoc.select(F.col("doc_id").alias("doc_b"), F.col("gs").alias("gs_b"))
    n_common = F.size(F.array_intersect(F.col("gs_a"), F.col("gs_b")))
    n_a, n_b = F.size(F.col("gs_a")), F.size(F.col("gs_b"))
    jacc = n_common.cast("double") / F.greatest(
        n_a + n_b - n_common, F.lit(1)
    ).cast("double")
    return (
        cand.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select("doc_a", "doc_b", portable_round(jacc, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_T)
    )


def pairs_F(docs):
    perdoc = _perdoc(docs).persist()
    bands = _bands_from_perdoc(perdoc)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    out = _verify_arrays(cand, perdoc)
    return out, perdoc


def pairs_G(docs):
    perdoc = _perdoc(docs).persist()
    bands = _bands_from_perdoc(perdoc)
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
    out = _verify_arrays(cand, perdoc)
    return out, perdoc


def run_A(docs):
    return dedup.lsh_pairs_ckpt(docs, with_jaccard=True)


def run_variant(docs, builder):
    from spj_query_engine_spark.operators.core import coarse_materialize

    holder = {}

    def build(d):
        out, perdoc = builder(d)
        holder["p"] = perdoc
        return out

    res = coarse_materialize(build, docs)
    if "p" in holder:
        holder["p"].unpersist()
    return res


def main():
    spark = get_spark("ab_minhash_r09", master="local[32]")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    variants = {
        "A_current": lambda: run_A(docs),
        "F_fused_verify": lambda: run_variant(docs, pairs_F),
        "G_fused_bucket": lambda: run_variant(docs, pairs_G),
    }
    # value cross-check (also warms JIT)
    sigs = {}
    for name, fn in variants.items():
        rows = sorted(map(tuple, fn().collect()))
        sigs[name] = (len(rows), hash(tuple(rows)))
    print("result (count, hash) per variant:", sigs, flush=True)
    assert len({v for v in sigs.values()}) == 1, "VARIANTS DISAGREE"

    times = {k: [] for k in variants}
    for it in range(N):
        for name, fn in variants.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[name].append(dt)
            print(f"iter {it} {name}: {dt:.2f}s", flush=True)
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                k: {
                    "med": round(statistics.median(v), 3),
                    "min": round(min(v), 3),
                    "runs": [round(x, 2) for x in v],
                }
                for k, v in times.items()
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()

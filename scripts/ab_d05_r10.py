#!/usr/bin/env python
"""Interleaved SAME-SESSION A/B for the r10 d05/d10 shapes: the old
(r08/r09) explode-index + size-join form is reconstructed inline, the new
form comes from the package, and the two alternate in one session so
machine phase lands on both symmetrically (the ab_minhash_r09.py pattern).

Usage: python scripts/ab_d05_r10.py [iters]
"""
from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spj_query_engine_spark.catalog import load_tables  # noqa: E402
from spj_query_engine_spark.functions.hashing import (  # noqa: E402
    h32,
    portable_round,
)
from spj_query_engine_spark.operators import dedup  # noqa: E402
from spj_query_engine_spark.operators.dedup import (  # noqa: E402
    JACCARD_T,
    NGRAM_MAX_DF,
    CONTAM_T,
    EVAL_MOD,
    shingle_index,
)
from spj_query_engine_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_d05(docs):
    inv = shingle_index(docs).persist()
    sizes = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    df_ok = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        (F.col("df") <= NGRAM_MAX_DF) & (F.col("df") >= 2)
    )
    inv = inv.join(df_ok.select("g"), "g")
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jacc = F.col("n_common").cast("double") / F.greatest(
        F.col("n_a") + F.col("n_b") - F.col("n_common"), F.lit(1)
    ).cast("double")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", portable_round(jacc, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_T)
    )


def old_d10(docs):
    inv_all = shingle_index(docs)
    sizes = inv_all.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    df_ok = (
        inv_all.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") <= NGRAM_MAX_DF) & (F.col("df") >= 2))
    )
    inv = inv_all.join(df_ok.select("g"), "g")
    is_eval = (F.col("doc_id") % EVAL_MOD) == 0
    tr = inv.filter(~is_eval).select("doc_id", "g")
    ev = inv.filter(is_eval).select(F.col("doc_id").alias("eval_id"), "g")
    common = (
        tr.join(ev, "g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    maxov = common.groupBy("doc_id").agg(F.max("n_common").alias("max_common"))
    frac = portable_round(
        F.col("max_common").cast("double")
        / F.greatest(F.col("n_sh"), F.lit(1)).cast("double"),
        6,
    )
    return (
        maxov.join(sizes, "doc_id")
        .select("doc_id", frac.alias("contamination"))
        .filter(F.col("contamination") >= CONTAM_T)
    )


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("ab_d05", master="local[32]", shuffle_partitions=32)
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    variants = {
        "d05_old": lambda: old_d05(docs),
        "d05_new": lambda: dedup.ngram_jaccard_pairs(docs),
        "d10_old": lambda: old_d10(docs),
        "d10_new": lambda: dedup.contamination(docs),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    # warmup every variant once (codegen)
    for k, b in variants.items():
        b().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        gc.collect()
    for i in range(iters):
        for k, b in variants.items():
            t0 = time.time()
            b().write.format("noop").mode("overwrite").save()
            times[k].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
    for k, ts in times.items():
        print(f"{k}: med {statistics.median(ts):.3f} runs {ts}")
    for q in ("d05", "d10"):
        r = statistics.median(times[f"{q}_new"]) / statistics.median(times[f"{q}_old"])
        print(f"{q} new/old: {r:.3f}")


if __name__ == "__main__":
    main()

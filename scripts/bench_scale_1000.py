#!/usr/bin/env python
"""1000x scale demonstration for the linear scan-bound operators.

The 10x/100x records (SCALING_r*.json / SCALING100_r*.json) certify the
banded/bucketed designs of the pair-generating families.  This script takes
the LINEAR operators one decade further — ~5M documents (≈1e9 exploded token
rows for the token-stats entry) and 1e8 events on the same fixed 32 cores —
to demonstrate the flat-per-row cost a 100 TB deployment extrapolates from:
on fixed cores a linear operator's wall should track input volume (ratio
≈ replicas), with no superlinear term from shuffles or skew.

Corpus construction reuses the official 100x replica
(scripts/bench_scale.py, SPARK_GRAFT_SCALE_REPLICAS=100 — run that first)
and replicates it 10x again with disjoint id spaces.  Documents keep their
level-1 word-salt but are NOT re-salted at level 2: exact-duplicate text
across level-2 replicas is the realistic web-crawl shape for exact dedup
(dup groups of ~10), and the entries run here are content-hash / token /
window aggregations whose cost is volume, not pair structure — the
pair-generating families are certified at 100x where their candidate
growth is the controlled variable.

Usage: python scripts/bench_scale_1000.py [out_json]
Writes one JSON object mirroring SCALING100_r*.json (replicas: 1000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spj_query_engine_spark.session import get_spark
from spj_query_engine_spark.workload import REGISTRY

BASE = "/root/testdata/sf0.1"
BASE100 = os.environ.get("SPARK_GRAFT_SCALE100_DIR", "/tmp/spj_scale100")
SCALED = os.environ.get("SPARK_GRAFT_SCALE1000_DIR", "/tmp/spj_scale1000")
SCALED_PAIRS = os.environ.get(
    "SPARK_GRAFT_SCALE1000P_DIR", "/tmp/spj_scale1000p"
)
LEVEL2 = 10  # on top of the 100x base

#: linear scan-bound entries: per-row cost flat, no pair generation
FAMILY = [
    "t01_token_stats",
    "d01_exact_dedup",
    "p01_train_split",
    "e01_tumbling_rollup",
    "e09_percentiles",
    # r08: the TTL sessionize replay — 1e8 events through the stateful fold
    # with the parquet foreachBatch sink (event-sized output stays
    # executor-side; the r07 memory sink would materialize ~1e8 session
    # rows on the driver).  Per-row cost flat: one lexsort + numpy fold per
    # bucket, state one blob per bucket.
    "e50_session_ttl",
]

#: bucketed quadratic-hazard families at 1000x — the r06 verdict's ask.
#: These run on a PAIR-STRUCTURE-CONTROLLED corpus (see
#: build_scaled_pairs): the plain 1000x documents corpus deliberately
#: leaves level-2 replicas unsalted (exact-dup groups of 10 — right for
#: content-hash entries, but it multiplies LSH bucket membership and the
#: verified pair count by ~45x/doc, so a d02 ratio on it measures the
#: DATA's duplication structure, not the algorithm's scaling).  With
#: level-2 re-salting the planted pair structure replicates exactly
#: 1000x, the same controlled variable as the 10x/100x records.
PAIR_FAMILY = [
    "d02_minhash_lsh",
    "g01_pagerank",
    "s09_knn_join_2level",
]


def build_scaled(spark) -> None:
    marker = os.path.join(SCALED, "_DONE")
    if os.path.exists(marker):
        return
    os.makedirs(SCALED, exist_ok=True)
    docs = spark.read.parquet(os.path.join(BASE100, "documents.parquet"))
    events = spark.read.parquet(os.path.join(BASE100, "events.parquet"))
    # level-1 offsets were +r*1e7 (doc/user) and +r*1e8 (event) for r<100,
    # so level-2 offsets start a decade above the level-1 ceiling
    doc_parts = [
        docs.select(
            (F.col("doc_id") + F.lit(r * 10_000_000_000)).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        )
        for r in range(LEVEL2)
    ]
    ev_parts = [
        events.select(
            (F.col("event_id") + F.lit(r * 100_000_000_000)).alias("event_id"),
            (F.col("user_id") + F.lit(r * 10_000_000_000)).alias("user_id"),
            *[c for c in events.columns if c not in ("event_id", "user_id")],
        )
        for r in range(LEVEL2)
    ]
    all_docs = doc_parts[0]
    for p in doc_parts[1:]:
        all_docs = all_docs.unionByName(p)
    all_ev = ev_parts[0]
    for p in ev_parts[1:]:
        all_ev = all_ev.unionByName(p)
    # 64 output files ≈ 250 MB each for the 17 GB corpus — the multi-split
    # layout a real table would have, so the scan parallelizes
    all_docs.repartition(64).write.mode("overwrite").parquet(
        os.path.join(SCALED, "documents.parquet")
    )
    all_ev.repartition(64).write.mode("overwrite").parquet(
        os.path.join(SCALED, "events.parquet")
    )
    open(marker, "w").close()


def build_scaled_pairs(spark) -> None:
    """Level-2 corpus for the pair families, pair structure CONTROLLED:

    * documents: replica r re-salts every word with ``w<r>`` on top of the
      level-1 ``zr`` salt (token count constant, same trick as level 1) —
      within-replica shingle Jaccard is preserved exactly, across-replica
      shingle sets share nothing, so the near-dup pair graph replicates
      exactly 1000x.
    * embeddings: replica r flips coordinate SIGNS by a fixed per-replica
      ±1 pattern (hash(i, r) parity).  The same pattern applies to both
      sides of every within-replica pair, so inner products — hence cosine
      near-dups, IVF cell structure, and kNN top-k — are EXACTLY preserved
      per replica; across replicas (and against every level-1 rotation)
      cosines scramble.
    """
    marker = os.path.join(SCALED_PAIRS, "_DONE")
    if os.path.exists(marker):
        return
    os.makedirs(SCALED_PAIRS, exist_ok=True)
    docs = spark.read.parquet(os.path.join(BASE100, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE100, "embeddings.parquet"))
    dim = 64
    doc_parts = [
        docs.select(
            (F.col("doc_id") + F.lit(r * 10_000_000_000)).alias("doc_id"),
            (
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1w{r}")
                if r
                else F.col("text")
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        for r in range(LEVEL2)
    ]
    all_docs = doc_parts[0]
    for p in doc_parts[1:]:
        all_docs = all_docs.unionByName(p)
    all_docs.repartition(64).write.mode("overwrite").parquet(
        os.path.join(SCALED_PAIRS, "documents.parquet")
    )
    emb_parts = []
    for r in range(LEVEL2):
        if r == 0:
            rolled = emb.select(
                F.col("vec_id").alias("vec_id"), "embedding", "label"
            )
        else:
            # deterministic ±1 pattern per (replica, coordinate)
            signs = [1.0 if (i * 2654435761 + r * 40503) % 7 < 4 else -1.0
                     for i in range(dim)]
            rolled = emb.select(
                (F.col("vec_id") + F.lit(r * 10_000_000_000)).alias("vec_id"),
                F.array(
                    *[
                        (F.col("embedding")[i] * F.lit(signs[i])).cast("float")
                        for i in range(dim)
                    ]
                ).alias("embedding"),
                "label",
            )
        emb_parts.append(rolled)
    all_emb = emb_parts[0]
    for p in emb_parts[1:]:
        all_emb = all_emb.unionByName(p)
    all_emb.repartition(64).write.mode("overwrite").parquet(
        os.path.join(SCALED_PAIRS, "embeddings.parquet")
    )
    open(marker, "w").close()


def run(spark, name: str, sf_dir: str, warmup: bool = True) -> float:
    import gc

    fn = REGISTRY[name].fn
    if warmup:  # pair-family 1000x runs skip it: ~2 s of codegen inside a
        # many-minute run is noise, a second full run is half an hour
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        gc.collect()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    spark.catalog.clearCache()
    gc.collect()
    return round(dt, 3)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="spj-scale1000",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    if not os.path.exists(os.path.join(BASE100, "documents.parquet")):
        raise SystemExit(
            f"{BASE100} missing - run scripts/bench_scale.py with "
            "SPARK_GRAFT_SCALE_REPLICAS=100 first"
        )
    build_scaled(spark)
    build_scaled_pairs(spark)
    name_filter = sys.argv[2:]
    # resume support mirrors bench_scale.py: partial results survive kills
    results: dict[str, dict] = {}
    if out_path and os.path.exists(out_path):
        try:
            results = json.load(open(out_path)).get("queries", {})
        except Exception:
            results = {}
    for name, scaled_dir in [(n, SCALED) for n in FAMILY] + [
        (n, SCALED_PAIRS) for n in PAIR_FAMILY
    ]:
        if name_filter and not any(f in name for f in name_filter):
            continue
        if name in results:
            continue
        try:
            base_s = run(spark, name, BASE)
            scale_s = run(spark, name, scaled_dir, warmup=scaled_dir == SCALED)
        except Exception as exc:  # noqa: BLE001
            print(f"  {name}: ERROR {str(exc)[:160]}", flush=True)
            continue
        results[name] = {
            "sf0.1_sec": base_s,
            "x1000_sec": scale_s,
            "ratio": round(scale_s / base_s, 2) if base_s else None,
        }
        print(f"  {name}: 1x {base_s}s -> 1000x {scale_s}s "
              f"(ratio {results[name]['ratio']})", flush=True)
        if out_path:
            payload = {"replicas": 1000, "base": BASE, "queries": results}
            with open(out_path, "w") as fh:
                fh.write(json.dumps(payload) + "\n")
    payload = {"replicas": 1000, "base": BASE, "queries": results}
    line = json.dumps(payload)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

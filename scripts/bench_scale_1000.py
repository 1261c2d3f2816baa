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
LEVEL2 = 10  # on top of the 100x base

#: linear scan-bound entries: per-row cost flat, no pair generation
FAMILY = [
    "t01_token_stats",
    "d01_exact_dedup",
    "p01_train_split",
    "e01_tumbling_rollup",
    "e09_percentiles",
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


def run(spark, name: str, sf_dir: str) -> float:
    import gc

    fn = REGISTRY[name].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
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
    results: dict[str, dict] = {}
    for name in FAMILY:
        base_s = run(spark, name, BASE)
        scale_s = run(spark, name, SCALED)
        results[name] = {
            "sf0.1_sec": base_s,
            "x1000_sec": scale_s,
            "ratio": round(scale_s / base_s, 2) if base_s else None,
        }
        print(f"  {name}: 1x {base_s}s -> 1000x {scale_s}s "
              f"(ratio {results[name]['ratio']})", flush=True)
    payload = {"replicas": 1000, "base": BASE, "queries": results}
    line = json.dumps(payload)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

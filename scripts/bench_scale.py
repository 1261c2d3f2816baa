#!/usr/bin/env python
"""Scale-up validation for the dedup/ANN family: does wall time grow
~linearly when the corpus grows 10×?

The shipped testdata tops out at sf0.1 (5 000 documents / 2 000 embeddings),
so this script builds a 10× corpus FROM sf0.1 with the repo's own transforms
(never touching /root/testdata):

* documents: 10 replicas; replica r suffixes every word with ``zr<r>`` —
  a word-salt that keeps the TOKEN COUNT constant (an earlier version
  inserted a salt token between words, which tripled the shingle volume and
  made per-input ratios unreadable).  Within a replica every planted
  near-dup pair keeps its shingle Jaccard (both sides get the same salt),
  while ACROSS replicas shingle sets share nothing, so near-dup pairs grow
  ~10×, not quadratically.  doc_id' = doc_id + r·10^7.
* embeddings: 10 replicas; replica r rotates the coordinate order by r
  positions.  A same-permutation applies to both sides of every pair, so
  within-replica inner products — hence cosine near-dups and ANN top-k
  structure — are EXACTLY preserved; across replicas cosines scramble.
* events: 10 replicas; replica r shifts user_id/event_id into a disjoint id
  space and keeps timestamps — per-user session/window/funnel structure is
  identical per replica, so temporal operators see 10× users with the same
  per-user shape (the scaling axis a real event stream grows along).

Usage: python scripts/bench_scale.py [out_json]
Writes one JSON object with per-query seconds at 1× and 10× and the ratio.
A ratio ≲ 12 for a 10× input certifies the banded/inverted-index designs;
quadratic blowup would show ratios ≳ 50.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spj_query_engine_spark.session import get_spark
from spj_query_engine_spark.catalog import load_tables
from spj_query_engine_spark.workload import REGISTRY

BASE = "/root/testdata/sf0.1"
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
SCALED = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", f"/tmp/spj_scale{REPLICAS}"
)
FAMILY = [
    "d01_exact_dedup",
    "d02_minhash_lsh",
    "d03_simhash_fp",
    "d04_simhash_pairs",
    "d05_ngram_jaccard",
    "d06_embedding_near_dup",
    "d12_near_dup_2level",
    "d07_dup_clusters",
    "d09_cc_alternating",
    "s01_ann_bruteforce",
    "s02_ann_lsh",
    "s03_ann_ivf",
    # round-2 document-based additions (events/orders entries have no
    # scaled twin — the replica transform covers documents/embeddings)
    "d10_contamination",
    "t09_repetition",
    "t11_quality_filter",
    "p05_pack_sequences",
    "p04_uniform_k_sample",
    # temporal family over the 10×-users events replica
    "e01_tumbling_rollup",
    "e02_sessionize",
    "e03_asof_join",
    "e08_funnel",
    "e09_percentiles",
    "e11_moving_stats",
    "e12_native_session",
    "e14_gap_fill",
    # round-2 late additions
    "d13_chunk_dedup",
    "t13_tfidf_top_terms",
    "u02_grouped_mad",
    "e17_cohort_retention",
    "e18_heavy_hitters",
    "e19_gap_histogram",
    "e20_range_window",
    "t14_vocab_stats",
    # round-2 session-3 additions
    "d15_strip_boilerplate",
    "s06_knn_join",
    "s07_pq_encode",
    "s08_pq_adc_topk",
    "p06_overlap_chunks",
    "e21_approx_percentile",
    "e22_growth_accounting",
    "s09_knn_join_2level",
    "e23_user_features",
    "e25_sliding_rollup",
    "e26_event_transitions",
    "e28_json_props",
    "m06_payload_dedup",
    "t15_bpe_pairs",
    "t16_langid_confusion",
    "p07_leakage_safe_split",
    # round-2 session-4 additions
    "t17_bigram_novelty",
    "g01_pagerank",
    "e29_status_intervals",
    "e30_cdc_apply",
    # round-2 session-5 additions
    "g02_triangle_count",
    "s10_range_search",
    "s11_lsh_recall",
    "p08_temperature_sample",
    "p09_curriculum_order",
    "t18_bigram_lm",
    "e34_daily_anomalies",
    "s12_ivf_pq",
    "u04_arrow_map",
    "g03_kcore",
    "g04_bfs_distances",
    "t19_bpe_apply",
    "s13_sq_topk",
    "e35_active_users",
    "t20_readability",
    "d17_containment_pairs",
    "p11_export_manifest",
    "m08_integrity_audit",
    "u06_udtf_sentences",
    "d18_minhash_calibration",
    # round-2 session-6 additions
    "d19_span_dup_pairs",
    "g05_link_prediction",
    "s14_mmr_topk",
    "e37_out_of_orderness",
    "p12_data_card",
    "d20_dedup_impact",
    "e39_sketch_rollup",
    "p13_balanced_sample",
    "t21_collocations",
    "g06_copurchase",
    "s15_filtered_ann",
    "d21_lsh_band_tuning",
    "d22_sentence_dedup",
    "m09_format_sniff",
    "u07_sql_udf",
    "s16_rrf_fusion",
    "g07_clustering_coeff",
    "p14_e2e_pipeline",
    "p15_dsir_selection",
    # round-3 additions
    "d23_bloom_dedup",
    "g08_personalized_pagerank",
    "s17_nn_descent",
    "m10_cdc_chunking",
    "e41_watermark_sweep",
    "p16_interleave_sources",
    "t22_vocab_power_law",
    "m11_shot_boundaries",
    "p17_token_budget_pack",
    "t23_coverage_curve",
    "d24_dedup_weights",
    "e42_attribution",
    "e43_funnel_latency",
    "g09_harmonic_centrality",
    "s18_multiprobe_lsh",
    "e44_incremental_rollup",
    "m12_active_segments",
    "d25_neardup_weights",
    "e45_session_funnel",
    "p18_epoch_orders",
    "t24_heaps_curve",
    # round-3 session-2 additions
    "e46_ohlc_bars",
    "e47_ewma_daily",
    "t25_encoding_audit",
    "t26_truncation_loss",
    "p19_balanced_shards",
    "s19_sim_histogram",
    "s20_ivf_cell_census",
    "g10_assortativity",
    "g11_component_census",
    "m13_ahash_pairs",
    "s21_ivf_probe_sweep",
    "d26_shingle_df_histogram",
    "e48_seasonality_profile",
    "m14_pair_alignment",
    "t27_doc_keyphrases",
    "e49_cusum_shifts",
    "s22_embedding_drift",
    "p20_source_quality_mix",
    "d27_span_coverage",
    "s23_sq_error_audit",
    "t28_source_divergence",
    "s24_cell_purity",
    "d14_embedding_dedup",
    "p21_rendezvous_shards",
    "t29_pii_redact",
    # round-4 additions
    "t30_hashed_classifier",
    "d28_dup_span_extents",
    "p22_source_cap",
    "e50_session_ttl",
    # round-5 additions: every entry >= 2.5 s at sf0.1 gets a measured
    # 100x ratio (q17/q45/e10 ride the orders/lineitem/documents replicas;
    # the rest of the >=2.5 s set was already listed above)
    "e10_stream_asof",
    "q17_salted_join_agg",
    "q45_recursive_closure",
    "d29_semantic_dedup",
    # round-8 additions: the sub-second set-op/outer-join parity family —
    # the r07 driver sweep flagged q22/q23 at 3.4-3.7x floors with no
    # scaling evidence either way; a measured 100x point settles whether
    # they are fixed-overhead-dominated (expected: shuffle startup + tiny
    # exchange on sf0.1) or hide a small-input-only plan
    "e06_stream_sessionize",
    "q21_left_join_agg",
    "q22_anti_join",
    "q23_semi_join",
    "q24_union",
    "q25_intersect",
    "q26_except",
]


def build_scaled(spark) -> None:
    if os.path.exists(os.path.join(SCALED, "_DONE_V3")):
        return
    shutil.rmtree(SCALED, ignore_errors=True)
    os.makedirs(SCALED, exist_ok=True)
    t = load_tables(spark, BASE, ("documents", "embeddings", "events"))
    docs, emb, events = t["documents"], t["embeddings"], t["events"]
    dim = 64
    doc_parts = []
    emb_parts = []
    ev_parts = []
    for r in range(REPLICAS):
        salted = docs.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            (
                F.regexp_replace(F.col("text"), r"(\S+)", f"$1zr{r}")
                if r
                else F.col("text")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        doc_parts.append(salted)
        rot = r % dim  # rotation must stay within the dimensionality
        rolled = emb.select(
            (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
            (
                F.concat(
                    F.slice(F.col("embedding"), rot + 1, dim - rot),
                    F.slice(F.col("embedding"), 1, rot),
                )
                if rot
                else F.col("embedding")
            ).alias("embedding"),
            "label",
        )
        emb_parts.append(rolled)
        ev_parts.append(
            events.select(
                (F.col("event_id") + F.lit(r * 100_000_000)).alias("event_id"),
                (F.col("user_id") + F.lit(r * 10_000_000)).alias("user_id"),
                "ts",
                "event_type",
                "value",
                "props",
            )
        )
    all_docs = doc_parts[0]
    for p in doc_parts[1:]:
        all_docs = all_docs.unionByName(p)
    all_emb = emb_parts[0]
    for p in emb_parts[1:]:
        all_emb = all_emb.unionByName(p)
    all_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SCALED, "documents.parquet")
    )
    all_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SCALED, "embeddings.parquet")
    )
    all_ev = ev_parts[0]
    for p in ev_parts[1:]:
        all_ev = all_ev.unionByName(p)
    all_ev.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SCALED, "events.parquet")
    )
    open(os.path.join(SCALED, "_DONE_V3"), "w").close()


def build_scaled_lineitem(spark) -> None:
    """Additive: replicate lineitem for the market-basket family (g06).
    Replica r shifts order and part keys into disjoint id spaces, so each
    replica keeps the exact per-basket structure — the axis a transaction
    log actually grows along (more orders, same basket shape)."""
    marker = os.path.join(SCALED, "_DONE_LINEITEM")
    if os.path.exists(marker):
        return
    li = load_tables(spark, BASE, ("lineitem",))["lineitem"]
    parts = [
        li.select(
            (F.col("l_orderkey") + F.lit(r * 100_000_000)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(r * 10_000_000)).alias("l_partkey"),
            *[c for c in li.columns if c not in ("l_orderkey", "l_partkey")],
        )
        for r in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SCALED, "lineitem.parquet")
    )
    open(marker, "w").close()


def build_scaled_orders(spark) -> None:
    """Additive: replicate orders for the as-of family (e03).  Replica r
    shifts o_orderkey (+r·10^8) and o_custkey by the SAME +r·10^7 offset
    events.user_id gets, so every replicated event sees exactly its
    replica's order history — per-customer as-of depth is preserved while
    customers grow 10×/100×, the axis an event-to-entity join scales on."""
    marker = os.path.join(SCALED, "_DONE_ORDERS")
    if os.path.exists(marker):
        return
    orders = load_tables(spark, BASE, ("orders",))["orders"]
    parts = [
        orders.select(
            (F.col("o_orderkey") + F.lit(r * 100_000_000)).alias("o_orderkey"),
            (F.col("o_custkey") + F.lit(r * 10_000_000)).alias("o_custkey"),
            *[c for c in orders.columns if c not in ("o_orderkey", "o_custkey")],
        )
        for r in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SCALED, "orders.parquet")
    )
    open(marker, "w").close()


def build_scaled_customer(spark) -> None:
    """Additive: replicate customer for the set-op/outer-join parity family
    (q21-q26).  Replica r shifts c_custkey by the SAME +r·10^7 offset
    orders.o_custkey gets, so per-replica join fan-out (orders per
    customer, never-ordered customers) is exactly preserved while the
    customer base grows — the axis an OLTP mirror actually scales on."""
    marker = os.path.join(SCALED, "_DONE_CUSTOMER")
    if os.path.exists(marker):
        return
    cust = load_tables(spark, BASE, ("customer",))["customer"]
    parts = [
        cust.select(
            (F.col("c_custkey") + F.lit(r * 10_000_000)).alias("c_custkey"),
            *[c for c in cust.columns if c != "c_custkey"],
        )
        for r in range(REPLICAS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SCALED, "customer.parquet")
    )
    open(marker, "w").close()


def _scaled_fn(name: str, sf_dir: str):
    """The callable to measure — now ALWAYS the registered entry itself.

    Earlier rounds pinned deployment knobs here (quantizer cell count,
    sample block count ∝ corpus) because the operators froze them to the
    oracle's constants; since r4 the operators derive those knobs FROM THE
    CORPUS (resolve_quantizer_cells / HIST_BLOCK_TARGET: conf override,
    else max(floor, ceil(n/target)), with a two-level assignment switch
    past the flat-quantizer threshold) and the oracles compute the same
    values as scalar subqueries — so the registered entries self-scale and
    the measurement IS the deployment."""
    return REGISTRY[name].fn


def run(spark, name: str, sf_dir: str) -> float:
    import gc

    fn = _scaled_fn(name, sf_dir)
    # one warmup for codegen, then a measured steady-state run (same
    # protocol as bench.py, INCLUDING the per-run gc.collect(): iterative
    # entries localCheckpoint() intermediates, and the JVM only frees those
    # blocks when Python GC drops the py4j refs — without this the block
    # manager fills across a sweep and later entries measure 4-10x slow,
    # inflating 1x bases and corrupting ratios)
    for _ in range(1):
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
    name_filter = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="spj-bench-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    build_scaled(spark)
    build_scaled_lineitem(spark)
    build_scaled_orders(spark)
    build_scaled_customer(spark)
    # resume support: a killed run leaves its partial results on disk
    results: dict[str, dict] = {}
    if out_path and os.path.exists(out_path):
        try:
            results = json.load(open(out_path)).get("queries", {})
        except Exception:
            results = {}
    for name in FAMILY:
        if name_filter and not any(f in name for f in name_filter):
            continue
        if name in results:
            continue
        try:
            base_s = run(spark, name, BASE)
            scale_s = run(spark, name, SCALED)
        except Exception as exc:  # record and continue — one bad entry must
            # not abort the whole sweep (exit code hides in a pipeline)
            print(f"  {name}: ERROR {str(exc)[:160]}", flush=True)
            continue
        results[name] = {
            "sf0.1_sec": base_s,
            f"x{REPLICAS}_sec": scale_s,
            "ratio": round(scale_s / base_s, 2) if base_s else None,
        }
        print(
            f"  {name}: 1x {base_s}s -> {REPLICAS}x {scale_s}s "
            f"(ratio {results[name]['ratio']})",
            flush=True,
        )
        if out_path:  # incremental write — survives a timeout kill
            payload = {"replicas": REPLICAS, "base": BASE, "queries": results}
            with open(out_path, "w") as fh:
                fh.write(json.dumps(payload) + "\n")
    print(json.dumps({"replicas": REPLICAS, "base": BASE, "queries": results}))


if __name__ == "__main__":
    main()

"""Plan hygiene across the entire registry: no accidental cartesian
products, nested-loop joins only where deliberately chosen.

This is the automated version of the '.explain and iterate' discipline —
a regression here means a join lost its equi-key or a broadcast hint."""

from __future__ import annotations

import re

import pytest

from spj_query_engine_spark.workload import REGISTRY

from tests.conftest import SF_DIR

#: streaming entries execute to completion during build (their final plan is
#: a memory-sink scan); s04 fits a model.  Plan inspection is meaningless.
SKIP = {
    "e05_streaming_rollup",
    "e06_stream_sessionize",
    "e13_stream_session",
    "e16_stream_stream_join",
    "s04_ann_ivf_trained",
    "s05_ivf_trained_recall",  # composes s04 (model fit) + s01 (whitelisted BNLJ)
    "u10_foreach_batch_sink",  # streams to scratch dirs; returns a local relation
}

#: deliberate broadcast nested-loop joins:
#: - s03: the centroid assignment crossJoin (16 broadcast centroids/vector)
#: - s01: broadcast query set joined on an inequality (no equi key by design)
#: - d06: the IVF blocking reuses s03's centroid-assignment crossJoin
#: - t12: broadcast single-row corpus-total cross join
BNLJ_OK = {
    "s03_ann_ivf",
    "s01_ann_bruteforce",
    "d06_embedding_near_dup",
    "d12_near_dup_2level",
    "t12_unigram_commonness",
    "t13_tfidf_top_terms",  # broadcast single-row N_docs cross join
    "d14_embedding_dedup",  # composes d12's whitelisted centroid assignment
    "s06_knn_join",  # same broadcast centroid-assignment crossJoin as s03
    "q36_global_sales_opportunity",  # broadcast single-row scalar threshold
    "s09_knn_join_2level",  # broadcast level-1 centroid crossJoin (d12 shape)
    "s10_range_search",  # same broadcast centroid-assignment crossJoin as s03
    "p08_temperature_sample",  # broadcast single-row mixture-total cross join
    "s11_lsh_recall",  # composes s01's whitelisted broadcast query join
    "q62_important_nations",  # broadcast single-row global-total cross join
    "s12_ivf_pq",  # broadcast centroid-assignment crossJoin (s03 shape)
    "t21_collocations",  # broadcast single-row corpus-total cross join (t12 shape)
    "d20_dedup_impact",  # broadcast single-row fused-docs-count cross join
    "s15_filtered_ann",  # broadcast centroid-assignment crossJoin (s03 shape)
    "s16_rrf_fusion",  # composes s01's whitelisted broadcast query join
    "p14_e2e_pipeline",  # broadcast single-row quality-median cross join
    "p15_dsir_selection",  # broadcast single-row totals + quantile-cutoff cross joins
    "p17_token_budget_pack",  # broadcast single-row corpus-token-total cross join
    "p19_balanced_shards",  # broadcast single-row corpus-token-total cross join
    "s19_sim_histogram",  # broadcast single-row pair-total cross join
    "s20_ivf_cell_census",  # broadcast centroid-assignment crossJoin (s03 shape)
    "g11_component_census",  # broadcast single-row graph-node-total cross join
    "s21_ivf_probe_sweep",  # composes s01/s03 whitelisted broadcast joins + scalar denom
    "m14_pair_alignment",  # broadcast single-row id-slot-total cross join
    "d26_shingle_df_histogram",  # broadcast single-row posting-total cross join
    "t27_doc_keyphrases",  # broadcast single-row corpus-total cross join (t21 shape)
    "s22_embedding_drift",  # broadcast centroid-assignment crossJoin (s03 shape)
    "t28_source_divergence",  # broadcast single-row corpus-total cross join
    "s24_cell_purity",  # broadcast centroid-assignment crossJoin (s03 shape)
    "g10_assortativity",  # broadcast single-row sxy-moment cross join
    "d29_semantic_dedup",  # composes d06's whitelisted centroid assignment
}


#: the broadcast side of a whitelisted nested-loop join must be BOUNDED BY
#: CONSTRUCTION — its physical subtree proves a row bound, not just a name
#: on the whitelist.  Two sanctioned shapes: a grouping-free aggregate
#: (exactly one row) or a plan whose every parquet leaf carries a pushed
#: `id < literal` filter with the literal under this bound (centroid /
#: query-set scans).  A whitelisted entry whose broadcast side silently
#: becomes a full corpus scan fails here.
BNLJ_BUILD_ROW_BOUND = 4096

_LESS_THAN = re.compile(r"LessThan\(\w+,(\d+)\)")
_TOP_LIMIT = re.compile(r"(?:TakeOrderedAndProject|GlobalLimit|CollectLimit)\(?limit=(\d+)")


def _bounded_build_side(subtree: str) -> str | None:
    """Classify a BNLJ build-side physical subtree as bounded, else None."""
    head = "\n".join(subtree.splitlines()[:2])
    if "HashAggregate(keys=[]" in head:
        return "scalar-agg"
    # prefix_rows (dedup.py): orderBy(id).limit(n) compiles to
    # TakeOrderedAndProject(limit=n, ...) — bounded by construction
    # whatever the id space, provided the literal is within the bound
    m = _TOP_LIMIT.search(head)
    if m and int(m.group(1)) <= BNLJ_BUILD_ROW_BOUND:
        return "limit"
    lits = [int(x) for x in _LESS_THAN.findall(subtree)]
    scans = [ln for ln in subtree.splitlines() if "FileScan" in ln]
    if (
        lits
        and max(lits) <= BNLJ_BUILD_ROW_BOUND
        and scans
        and all(_LESS_THAN.search(ln) for ln in scans)
    ):
        return "bounded-filter"
    if not scans and "LocalTableScan" in subtree:
        return "local"
    return None


def _walk(jnode):
    yield jnode
    for i in range(jnode.children().size()):
        yield from _walk(jnode.children().apply(i))


@pytest.fixture(autouse=True)
def _lazy_plans(monkeypatch):
    """Audit FULL plans: the r07 coarse-shuffle rework materializes the
    graph family's pair subplans behind eager localCheckpoint barriers
    (operators/core.py:barrier), which would replace the audited subtree
    with an ExistingRDD scan and make these assertions vacuous.  The env
    switch (read at call time) keeps those barriers lazy here — and only
    here — so every cartesian/pushdown/BNLJ check still sees the real
    subplan."""
    monkeypatch.setenv("SPJ_LAZY_PLANS", "1")


@pytest.mark.parametrize("name", [n for n in REGISTRY if n not in SKIP])
def test_no_cartesian_and_bounded_nlj(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans an unexpected nested-loop join"
        )
    else:
        # walk the pre-AQE physical plan (the adaptive wrapper hides its
        # children) and prove every nested-loop broadcast side bounded
        for node in _walk(qe.sparkPlan()):
            if node.nodeName() != "BroadcastNestedLoopJoin":
                continue
            side = node.buildSide().toString()
            child = node.left() if side == "BuildLeft" else node.right()
            subtree = child.toString()
            assert _bounded_build_side(subtree) is not None, (
                f"{name}: BNLJ broadcast side is not provably bounded "
                f"(need a grouping-free aggregate or id<literal<="
                f"{BNLJ_BUILD_ROW_BOUND} on every parquet leaf):\n"
                + subtree[:800]
            )
    spark.catalog.clearCache()


#: entries whose scans must show pushed predicates (filter → parquet scan)
PUSHDOWN_EXPECTED = {
    "q02_filter_project": "EqualTo(c_mktsegment,BUILDING)",
    "q06_join4_filters_star": "PushedFilters: [IsNotNull",
    "q32_shipping_priority": "LessThan(o_orderdate",
    # partition pruning: the modality filter must prune at planning time
    "m05_modality_lake": "PartitionFilters: [isnotnull(modality",
    # q63: the runtime dynamic-pruning subquery must reach the fact scan
    "q63_dpp_join": "dynamicpruning",
}


@pytest.mark.parametrize("name", sorted(PUSHDOWN_EXPECTED))
def test_filters_reach_the_scan(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert PUSHDOWN_EXPECTED[name] in plan, (
        f"{name}: expected pushed filter {PUSHDOWN_EXPECTED[name]!r} not in scan"
    )
    spark.catalog.clearCache()


#: entries whose plans must use the named join strategy
JOIN_STRATEGY_EXPECTED = {
    "q04_join3_star": "BroadcastHashJoin",  # dimension tables broadcast
    "q32_shipping_priority": "BroadcastHashJoin",  # filtered dims broadcast
    "q18_topk_orders": "TakeOrderedAndProject",  # top-k, not a global sort
    # decorrelated scalar subquery: the 25-row per-nation aggregate must
    # broadcast, never shuffle the supplier scan
    "q66_correlated_subquery": "BroadcastHashJoin",
    # EqualNullSafe is a hash-join key — a nested loop here would mean the
    # null-safe predicate fell out of the equi-key extractor
    "q67_null_safe_join": "BroadcastHashJoin",
}


@pytest.mark.parametrize("name", sorted(JOIN_STRATEGY_EXPECTED))
def test_physical_strategy(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert JOIN_STRATEGY_EXPECTED[name] in plan, (
        f"{name}: expected {JOIN_STRATEGY_EXPECTED[name]} in physical plan"
    )
    spark.catalog.clearCache()


def test_gate_priority_names_resolve():
    """Every GATE_PRIORITY name must be a registered entry — a typo here
    silently drops the entry out of the driver gate's recorded prefix."""
    from spj_query_engine_spark.workload.registry import GATE_PRIORITY

    unresolved = [n for n in GATE_PRIORITY if n not in REGISTRY]
    assert not unresolved, f"GATE_PRIORITY names not in REGISTRY: {unresolved}"
    assert len(set(GATE_PRIORITY)) == len(GATE_PRIORITY), "duplicate names"


def test_unproven_entries_fill_gate_window():
    """The driver's gate records only the first 50 queries() entries per
    round.  Every entry not yet proven by a prior CORRECTNESS_r*.json must
    sit inside that window, or it can never convert to driver-proven."""
    from spj_query_engine_spark.workload.registry import (
        _gate_order,
        _proven_names,
    )

    order = _gate_order()
    assert set(order) == set(REGISTRY)
    unproven = [n for n in order if n not in _proven_names()]
    window = set(order[:50])
    overflow = [n for n in unproven[:50] if n not in window]
    assert not overflow, f"unproven entries outside the 50-slot gate window: {overflow}"

"""Robustness sweep: every registry entry executes on EMPTY tables.

A library-safe operator must degrade to an empty (or well-defined
global-aggregate) result on zero rows — not crash in a window, a quantizer,
or a schema inference.  This catches the classic lazy-plan landmines:
reading back an empty partitioned write, fitting on an empty side, windows
over empty partitions.
"""

from __future__ import annotations

import os

import pytest

from spj_query_engine_spark.catalog import TABLES, load_tables, table_path
from spj_query_engine_spark.workload import REGISTRY

from tests.conftest import SF_DIR

#: entries that legitimately REQUIRE data:
#: - s04/s05: k-means cannot fit zero vectors (documented precondition)
SKIP = {"s04_ann_ivf_trained", "s05_ivf_trained_recall"}


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """A scale-factor directory with every table present but zero rows
    (schemas copied from sf0.001)."""
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for name, df in load_tables(spark, SF_DIR).items():
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    return out


#: entries with a non-zero well-defined row count on empty input:
#: global aggregates yield exactly ONE row (SQL semantics); the funnel emits
#: one zero-count row per static step (its oracle does the same)
EXPECTED_ON_EMPTY = {
    "q16_global_agg": 1,
    "q56_forecast_revenue": 1,  # global agg: one NULL-sum/zero-count row
    "q58_promo_revenue": 1,  # global agg over the join, same
    "q60_bracket_revenue": 1,  # global agg over the join, same
    "q34_small_qty_revenue": 1,
    "q38_table_profile": 4,  # one profile row per profiled column
    "q44_referential_audit": 3,  # one global-agg row per FK check
    "t10_approx_cardinality": 1,
    "e21_approx_percentile": 1,
    "t14_vocab_stats": 1,
    "m05_modality_lake": 1,
    "e08_funnel": 3,
    "e45_session_funnel": 3,  # same static-step form as e08, its oracle too
    "u05_python_datasource": 10,  # table-independent synthetic source
    "u09_stream_python_source": 10,  # table-independent synthetic stream
    "d20_dedup_impact": 1,  # the FUSED global-agg row (0 pairs) survives
}


@pytest.mark.parametrize("name", [n for n in sorted(REGISTRY) if n not in SKIP])
def test_runs_on_empty_tables(spark, empty_sf, name):
    df = REGISTRY[name].fn(spark, empty_sf)
    rows = df.count()
    expected = EXPECTED_ON_EMPTY.get(name, 0)
    assert rows == expected, f"{name}: {rows} rows on empty input, expected {expected}"
    spark.catalog.clearCache()


def test_null_and_empty_text_rows(spark):
    """NULL/empty text rows degrade gracefully through every document
    operator: shingle-based paths drop them (no shingles), projection-based
    paths carry them with null/zero stats — never a crash."""
    from spj_query_engine_spark.operators import dedup, textops

    rows = [
        (0, "hello world foo bar baz qux quux corge"),
        (1, None),
        (2, ""),
        (3, "hello world foo bar baz qux quux corge"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # exact dedup: identical texts group; null and empty are distinct groups
    groups = {r["keep_id"]: r["n_copies"] for r in dedup.exact_dedup(docs).collect()}
    assert groups[0] == 2 and groups[1] == 1 and groups[2] == 1
    # shingle paths see only the two real docs → exactly the planted pair
    pairs = dedup.minhash_lsh_pairs(docs).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(0, 3)]
    # projection paths keep every row
    assert textops.token_stats(docs).count() == 4
    assert textops.quality_score(docs).count() == 4


def test_null_and_empty_text_through_new_block_ops(spark):
    """The block/window document operators added this round drop NULL and
    token-less docs identically to their oracles: only real docs emit
    blocks/chunks/pairs."""
    from spj_query_engine_spark.operators import dedup, sampling, textops

    rows = [
        (0, "hello world foo bar baz qux quux corge nine ten"),
        (1, None),
        (2, ""),
        (3, "   "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sb = dedup.strip_boilerplate(docs).collect()
    assert sorted(r["doc_id"] for r in sb) == [0]
    oc = sampling.overlap_chunks(docs).collect()
    assert sorted({r["doc_id"] for r in oc}) == [0]
    bp = textops.bpe_pair_counts(docs).collect()
    assert all(" " in r["pair"] for r in bp) and len(bp) == 9
    ls = sampling.leakage_safe_split(docs).collect()
    assert len(ls) == 4  # the split labels EVERY doc, text or not

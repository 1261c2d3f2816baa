"""Behavioral tests for dedup + similarity operators on constructed data:
known duplicates must be found, unrelated items must not pair, and the LSH
path must recover the planted nearest neighbor."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spj_query_engine_spark.operators import dedup, similarity

BASE = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
NEAR = BASE.replace("lazy", "sleepy")  # one word changed → high Jaccard
OTHER = "completely different content about spark query engines and distributed joins at scale"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [BASE, NEAR, OTHER, BASE],  # 4 is an exact dup of 1
            }
        )
    )


def test_exact_dedup_groups(docs):
    got = {r["fp"]: r for r in dedup.exact_dedup(docs).collect()}
    counts = sorted(r["n_copies"] for r in got.values())
    assert counts == [1, 1, 2]
    dup_group = next(r for r in got.values() if r["n_copies"] == 2)
    assert dup_group["keep_id"] == 1


def test_minhash_finds_near_dup(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5  # near dup
    assert not any(3 in p for p in pairs)  # unrelated never pairs


def test_simhash_near_dup_small_hamming(docs):
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(docs).collect()}
    assert fps[1] == fps[4]
    ham_near = bin(fps[1] ^ fps[2]).count("1")
    ham_far = bin(fps[1] ^ fps[3]).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(docs).collect()}
    assert pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


@pytest.fixture(scope="module")
def emb(spark):
    # vec 0 and 10 nearly identical; 20 orthogonal-ish
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (10, [0.99, 0.1, 0.0, 0.0], 0),
        (20, [0.0, 1.0, 0.0, 0.0], 0),
        (30, [0.0, 0.0, 1.0, 0.0], 1),
        (40, [0.0, 0.0, 0.98, 0.15], 1),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_embedding_near_dup(emb):
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in dedup.embedding_near_dup(emb).collect()}
    assert (0, 10) in pairs and pairs[(0, 10)] > 0.9
    assert (30, 40) in pairs
    assert (0, 30) not in pairs  # cross-block pairs are never considered


def test_embedding_near_dup_2level_assignment_runs_once(emb, monkeypatch):
    """r09: the two-level assignment chain feeds BOTH sides of the pair
    self-join; without a barrier the whole chain (two BNLJ scoring passes
    + three aggregates) plans and runs twice — AQE stage reuse does not
    fire across the aliased sides.  The barrier replaces it with one
    materialized frame, so the final plan must scan ExistingRDD on the
    join sides and contain NO BroadcastNestedLoopJoin (the scoring already
    ran inside the barrier) — and the pair values are unchanged."""
    # this test asserts the EXECUTED (barriered) plan shape, so the
    # plan-hygiene suite's barrier-bypass flag must not leak in from the
    # developer's environment (ADVICE r09)
    monkeypatch.delenv("SPJ_LAZY_PLANS", raising=False)
    df = dedup.embedding_near_dup_2level(emb, n_cells=4, branch=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ExistingRDD" in plan
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in df.collect()}
    assert (0, 10) in pairs and pairs[(0, 10)] > 0.9
    assert (30, 40) in pairs
    assert not any(p[0] == 20 or p[1] == 20 for p in pairs)


def test_brute_force_topk_order(emb):
    got = similarity.brute_force_topk(emb, k=2, n_queries=1).collect()
    by_rank = {r["rank"]: r["cand_id"] for r in got}
    assert by_rank[1] == 10  # closest first
    assert len(got) == 2


def test_lsh_topk_finds_planted_neighbor(emb):
    got = similarity.lsh_topk(emb, k=1, n_queries=1).collect()
    assert got and got[0]["cand_id"] == 10


def test_semantic_dedup_survivors(emb, spark, duck):
    """d29: every vector appears once; near-dup clusters keep exactly the
    min id; singletons survive as their own cluster.  On the fixture,
    (0,10) and (30,40) pair up, 20 is alone."""
    got = {r["vec_id"]: r for r in dedup.semantic_dedup(emb).collect()}
    assert set(got) == {0, 10, 20, 30, 40}
    assert got[0]["is_kept"] and not got[10]["is_kept"]
    assert got[30]["is_kept"] and not got[40]["is_kept"]
    assert got[20]["is_kept"] and got[20]["cluster_id"] == 20
    assert got[10]["cluster_id"] == 0 and got[40]["cluster_id"] == 30
    # oracle twin on the real table (exercises the composed guarded-union
    # pairs CTE + unrolled CC rounds end to end)
    from spj_query_engine_spark.catalog import load_tables
    from tests.conftest import SF_DIR, assert_same_result

    real = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]
    assert_same_result(dedup.semantic_dedup(real), duck, dedup.semantic_dedup_sql())


def test_auto_sql_branches_with_engine_past_threshold(spark, duck, monkeypatch):
    """The registered oracle twins must take the SAME flat/two-level branch
    the engine takes.  Shrink FLAT_ASSIGN_MAX below the corpus-derived cell
    count so BOTH sides cross the threshold (the 10x-replica scenario), and
    assert engine == oracle on the real embeddings table — a false
    engine/oracle mismatch here is exactly what the guarded-union SQL
    exists to prevent."""
    from spj_query_engine_spark.catalog import load_tables
    from tests.conftest import SF_DIR, assert_same_result

    monkeypatch.setattr(dedup, "FLAT_ASSIGN_MAX", 8)
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]
    # derived cells = max(16, ceil(500/100)) = 16 > 8 -> two-level on both
    assert dedup.resolve_quantizer_cells(emb) > 8
    assert_same_result(
        dedup.embedding_near_dup(emb), duck, dedup.embedding_near_dup_sql()
    )
    assert_same_result(
        similarity.knn_join(emb), duck, similarity.knn_join_sql()
    )


def test_lsh_recall_vs_bruteforce(spark):
    """On clustered data the LSH top-1 must equal the exact top-1 for most
    queries (here: identical twin vectors — recall must be 100%)."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(20, 16).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
        rows.append((100 + i, [float(x) for x in v * 1.001], 0))  # twin
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = similarity.lsh_topk(df, k=1, n_queries=20).collect()
    top1 = {r["query_id"]: r["cand_id"] for r in got}
    hits = sum(1 for q, c in top1.items() if c == 100 + q)
    assert hits == 20, top1


def test_ivf_topk_matches_bruteforce_in_probed_cells(emb):
    """With 2 cells over 5 vectors, every near-neighbor shares a cell with
    its query, so IVF top-k must contain the planted pairs."""
    res = similarity.ivf_topk(emb, n_cells=2, n_probe=1, n_queries=1, k=2)
    got = {(r["query_id"], r["cand_id"]) for r in res.collect()}
    assert (0, 10) in got  # the planted near-duplicate of vec 0


def test_ivf_rank_deterministic(emb):
    res = similarity.ivf_topk(emb, n_cells=2, n_probe=2, n_queries=2, k=5).collect()
    for r in res:
        assert 1 <= r["rank"] <= 5
    again = similarity.ivf_topk(emb, n_cells=2, n_probe=2, n_queries=2, k=5).collect()
    assert sorted(map(tuple, res)) == sorted(map(tuple, again))


def test_dup_clusters_chain_and_canonical(spark):
    import pandas as pd

    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                # a 4-hop chain (10-11-12-13-14) exercises multi-round
                # propagation, plus an isolated pair (20, 21)
                "doc_a": [10, 11, 12, 13, 20],
                "doc_b": [11, 12, 13, 14, 21],
            }
        )
    )
    rows = {r["doc_id"]: r for r in dedup.dup_clusters(pairs).collect()}
    assert {rows[d]["cluster_id"] for d in (10, 11, 12, 13, 14)} == {10}
    assert rows[20]["cluster_id"] == rows[21]["cluster_id"] == 20
    canon = {d for d, r in rows.items() if r["is_canonical"]}
    assert canon == {10, 20}


def test_cc_alternating_long_chain_and_agreement(spark):
    import pandas as pd

    # a 12-hop chain (diameter > CC_ROUNDS) — alternating star contraction
    # converges where fixed-round propagation would not — plus a triangle
    # and an isolated pair
    chain = [(i, i + 1) for i in range(100, 112)]
    extra = [(200, 201), (201, 202), (200, 202), (300, 301)]
    pairs = spark.createDataFrame(
        pd.DataFrame(chain + extra, columns=["doc_a", "doc_b"])
    )
    rows = {r["doc_id"]: r for r in dedup.cc_alternating(pairs).collect()}
    assert {rows[d]["cluster_id"] for d in range(100, 113)} == {100}
    assert {rows[d]["cluster_id"] for d in (200, 201, 202)} == {200}
    assert rows[300]["cluster_id"] == rows[301]["cluster_id"] == 300
    assert {d for d, r in rows.items() if r["is_canonical"]} == {100, 200, 300}


def test_cc_alternating_matches_propagation_on_short_graph(spark):
    import pandas as pd

    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [10, 11, 12, 13, 20], "doc_b": [11, 12, 13, 14, 21]})
    )
    alt = sorted(map(tuple, dedup.cc_alternating(pairs).collect()))
    prop = sorted(map(tuple, dedup.dup_clusters(pairs).collect()))
    assert alt == prop


def test_ivf_trained_returns_ranked_topk(emb):
    res = similarity.ivf_topk_trained(
        emb, n_cells=2, n_probe=2, n_queries=1, k=3, max_iter=2
    ).collect()
    assert len(res) >= 1
    assert all(r["rank"] >= 1 and -1.0 <= r["cosine"] <= 1.0 for r in res)
    # seeded fit → deterministic output
    again = similarity.ivf_topk_trained(
        emb, n_cells=2, n_probe=2, n_queries=1, k=3, max_iter=2
    ).collect()
    assert sorted(map(tuple, res)) == sorted(map(tuple, again))


def test_apply_dedup_drops_exact_and_near(spark):
    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    base,
                    base,  # exact duplicate of 1 -> dropped
                    base + " extra",  # near-duplicate of 1 -> non-canonical
                    "completely different content about spark engines at scale",
                ],
            }
        )
    )
    survivors = {r["doc_id"] for r in dedup.apply_dedup(docs).collect()}
    assert 1 in survivors and 4 in survivors
    assert 2 not in survivors  # exact dup
    assert 3 not in survivors  # near-dup, cluster canonical is 1


def test_chunk_dedup_counts_shared_and_self_repeats(spark):
    import duckdb as _duck

    from tests.conftest import assert_same_result

    w8 = " ".join(f"w{i}" for i in range(8))  # one full chunk, shared by 1+2
    cdocs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                w8 + " tail one",          # chunk2 = 'tail one' (unique)
                w8 + " tail two",          # shares chunk1 with doc 1
                "solo " * 8 + "solo " * 8,  # self-repeating doc
                "unique words only here",
            ],
        }
    )
    got = {
        r["doc_id"]: r
        for r in dedup.chunk_dedup_stats(spark.createDataFrame(cdocs)).collect()
    }
    assert got[1]["n_chunks"] == 2 and got[1]["n_dup_chunks"] == 1
    assert got[2]["n_dup_chunks"] == 1
    assert got[3]["n_chunks"] == 2 and got[3]["n_dup_chunks"] == 2  # self-repeat
    assert got[4]["n_dup_chunks"] == 0
    con = _duck.connect()
    con.register("documents", cdocs)
    assert_same_result(
        dedup.chunk_dedup_stats(spark.createDataFrame(cdocs)),
        con,
        dedup.chunk_dedup_stats_sql(),
    )


def test_strip_boilerplate_removes_shared_blocks(spark):
    import duckdb as _duck

    from tests.conftest import assert_same_result

    boiler = " ".join(f"nav{i}" for i in range(8))  # the shared 8-token header
    bdocs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                boiler + " body one is here yes indeed truly now",
                boiler + " body two is here yes indeed truly now",
                boiler + " body three is here yes indeed sadly now",
                "standalone words that occur nowhere else at all",
            ],
        }
    )
    got = {
        r["doc_id"]: r
        for r in dedup.strip_boilerplate(spark.createDataFrame(bdocs)).collect()
    }
    # the header occurs 3x (> BOILER_MAX_OCC=2) -> removed everywhere
    for d in (1, 2, 3):
        assert got[d]["n_blocks"] == 2 and got[d]["n_kept"] == 1
        assert not got[d]["clean_text"].startswith("nav0")
    assert got[1]["clean_text"] == "body one is here yes indeed truly now"
    # untouched doc survives verbatim (lowercased)
    assert got[4]["n_kept"] == got[4]["n_blocks"] == 1
    assert got[4]["clean_text"] == bdocs.text[3]
    con = _duck.connect()
    con.register("documents", bdocs)
    assert_same_result(
        dedup.strip_boilerplate(spark.createDataFrame(bdocs)),
        con,
        dedup.strip_boilerplate_sql(),
    )


def test_strip_boilerplate_keeps_at_or_below_max_occ(spark):
    """Blocks at exactly max_occ occurrences stay (boundary semantics)."""
    blk = " ".join(f"b{i}" for i in range(8))
    bdocs = pd.DataFrame({"doc_id": [1, 2], "text": [blk, blk]})  # 2 = max_occ
    got = dedup.strip_boilerplate(spark.createDataFrame(bdocs)).collect()
    assert all(r["n_kept"] == 1 and r["clean_text"] == blk for r in got)


def test_knn_join_recovers_planted_neighbors(spark):
    """With one cell per planted cluster, every vector's #1 neighbor must
    be its cluster-mate, and no vector may pair with itself."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.99, 0.05, 0.0, 0.0]),   # near 0
        (3, [0.05, 0.99, 0.0, 0.0]),   # near 1
        (4, [0.98, 0.0, 0.1, 0.0]),    # near 0
        (5, [0.0, 0.97, 0.0, 0.12]),   # near 1
    ]
    emb6 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.knn_join(emb6, k=2, n_cells=2, n_probe=1).collect()
    top1 = {r["vec_id"]: r["nbr_id"] for r in got if r["rank"] == 1}
    assert all(r["vec_id"] != r["nbr_id"] for r in got)
    cluster = {0: {2, 4}, 2: {0, 4}, 4: {0, 2}, 1: {3, 5}, 3: {1, 5}, 5: {1, 3}}
    for vid, nbr in top1.items():
        assert nbr in cluster[vid], f"{vid}: top-1 neighbor {nbr} not in planted cluster"


def test_pq_encode_centroids_self_code(emb):
    """Seed vectors ARE the codebook: with k_cent=2, vectors 0 and 10 (the
    two seeds after id-order) must... — use a constructed frame where ids
    0..1 are seeds: each seed encodes to its own code in every subspace
    with zero reconstruction error."""
    rows = [
        (0, [float(i) for i in range(8)]),
        (1, [float(7 - i) for i in range(8)]),
        (2, [float(i) + 0.1 for i in range(8)]),  # near seed 0
    ]
    emb8 = __import__("pyspark.sql", fromlist=["SparkSession"])  # noqa: F841
    spark = emb.sparkSession
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r
        for r in similarity.pq_encode(df, m=2, k_cent=2, dim=8).collect()
    }
    assert got[0]["codes"] == [0, 0] and got[0]["err2"] == 0.0
    assert got[1]["codes"] == [1, 1] and got[1]["err2"] == 0.0
    assert got[2]["codes"] == [0, 0] and got[2]["err2"] > 0.0


def test_pq_adc_ranks_planted_cluster(emb):
    """ADC distance through the code domain must rank the planted
    cluster-mate first: vector 2 quantizes to seed 0's codes, so its
    nearest ADC candidate is vector 0."""
    spark = emb.sparkSession
    rows = [
        (0, [float(i) for i in range(8)]),
        (1, [float(7 - i) * 3.0 for i in range(8)]),
        (2, [float(i) + 0.1 for i in range(8)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.pq_adc_topk(
        df, k=1, n_queries=3, m=2, k_cent=2, dim=8
    ).collect()
    top1 = {r["query_id"]: r["cand_id"] for r in got}
    assert top1[2] == 0
    assert all(r["adc"] >= 0.0 for r in got)


def test_span_dup_pairs_finds_shifted_span(spark):
    """A 12-token span copied into another doc at a DIFFERENT offset must be
    found with its exact length; block-aligned chunk dedup (d13) would miss
    the shifted copy. Unrelated docs must not pair."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    span = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens
    sdocs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta " + span + " gamma delta",      # span at offset 2
                "x1 x2 x3 " + span + " y1",                  # same span, offset 3
                " ".join(f"z{i}" for i in range(20)),        # unrelated
            ],
        }
    )
    rows = dedup.span_dup_pairs(spark.createDataFrame(sdocs)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["max_span"] == 12 and r["n_spans"] == 1
    con = _duck.connect()
    con.register("documents", sdocs)
    assert_same_result(
        dedup.span_dup_pairs(spark.createDataFrame(sdocs)),
        con,
        dedup.span_dup_pairs_sql(),
    )


def test_common_neighbor_pairs_predicts_missing_link(spark):
    """A path graph 1-2, 2-3, 1-4, 3-4 (a 4-cycle) has two missing chords;
    each chord's endpoints share BOTH neighbors -> Jaccard 1.0.  A planted
    hub above CN_HUB_CAP must not generate wedges but must still count in
    the degree denominator."""
    import pandas as pd

    edges = [(1, 2), (2, 3), (1, 4), (3, 4)]
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"]).astype("int64")
    )
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup.common_neighbor_pairs_from_pairs(pairs).collect()
    }
    assert set(got) == {(1, 3), (2, 4)}
    assert got[(1, 3)]["n_common"] == 2 and got[(1, 3)]["nbr_jaccard"] == 1.0


def test_mmr_topk_diversifies(spark):
    """Geometry where MMR genuinely flips the order: cand 2 has HIGHER
    relevance than cand 3 but is a near-copy of the rank-1 pick, so the
    diversity penalty drops it below the off-axis cand 3.  Pure relevance
    top-2 = (1, 2); MMR top-2 must be (1, 3)."""
    import math

    import pandas as pd

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [
        (0, unit([1.0, 0.0, 0.0])),      # the query
        (1, unit([0.9, 0.44, 0.0])),     # best rel (~0.898)
        (2, unit([0.89, 0.45, 0.02])),   # near-copy of 1 (rel ~0.892, sim~0.9997)
        (3, unit([0.85, 0.0, 0.53])),    # off-axis (rel ~0.849, sim-to-1 ~0.76)
    ]
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ).selectExpr("vec_id", "cast(embedding as array<float>) embedding")
    got = {
        r["rank"]: r["cand_id"]
        for r in similarity.mmr_topk(emb, pool=3, select=2, n_queries=1).collect()
    }
    assert got[1] == 1     # pure relevance winner
    assert got[2] == 3     # MMR overrides relevance order (2 > 3 by rel alone)


def test_dedup_impact_attributes_unique_pairs(spark, docs):
    """On the 4-doc fixture (1 ≈ 2 near-dups, 4 = exact copy of 1): every
    modality that fires must report consistent pair/doc counts, and the
    FUSED row's n_pairs must equal the distinct union of all modality
    pair sets."""
    rows = dedup.dedup_impact(docs).collect()
    by_mod = {r["modality"]: r for r in rows}
    assert "FUSED" in by_mod
    fused = by_mod.pop("FUSED")
    all_pairs = set()
    for r in by_mod.values():
        assert r["n_pairs"] >= r["n_unique_pairs"] >= 0
        assert r["n_docs"] >= 2 or r["n_pairs"] == 0
    # recompute the fused union independently from the modality frames
    frames = [
        dedup.minhash_lsh_pairs(docs).select("doc_a", "doc_b"),
        dedup.simhash_pairs(docs).select("doc_a", "doc_b"),
        dedup.ngram_jaccard_pairs(docs).select("doc_a", "doc_b"),
        dedup.containment_pairs(docs).selectExpr(
            "least(inner_id, outer_id) doc_a", "greatest(inner_id, outer_id) doc_b"
        ),
        dedup.span_dup_pairs(docs).select("doc_a", "doc_b"),
    ]
    for f in frames:
        all_pairs |= {(r["doc_a"], r["doc_b"]) for r in f.collect()}
    assert fused["n_pairs"] == len(all_pairs)


def test_filtered_ann_prefilters_labels(spark):
    """Every returned neighbor must share the query's label, and a
    label-diverse neighborhood must still return the best SAME-label
    matches (post-filtering an unfiltered top-k would drop them)."""
    import math

    import pandas as pd

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # query 0 (label 1): its geometric top-2 are label-2 vectors; the
    # label-1 matches are farther out — pre-filtering must surface them
    rows = [
        (0, unit([1.0, 0.0, 0.0]), 1),
        (1, unit([0.99, 0.14, 0.0]), 2),   # closest, wrong label
        (2, unit([0.97, 0.24, 0.0]), 2),   # second, wrong label
        (3, unit([0.9, 0.44, 0.0]), 1),    # best same-label
        (4, unit([0.8, 0.6, 0.0]), 1),     # second same-label
        (5, unit([0.0, 0.0, 1.0]), 1),     # far same-label
    ]
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    ).selectExpr(
        "vec_id", "cast(embedding as array<float>) embedding",
        "cast(label as int) label",
    )
    got = similarity.filtered_ivf_topk(
        emb, k=2, n_queries=1, n_cells=2, n_probe=2
    ).collect()
    ids = [r["cand_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert ids == [3, 4]


def test_lsh_band_tuning_monotone(spark, docs):
    """Candidate sets nest only where the finer cut subdivides a coarser
    band exactly — of the sweep that is every pair EXCEPT 3→4 (no 3-row
    band lies inside a 4-row band of the 12-component signature), so
    monotonicity is asserted on the aligned pairs only.  Verified counts
    can never exceed candidates; the 6-band config must find at least the
    pairs d02 finds."""
    rows = {r["n_bands"]: r for r in dedup.lsh_band_tuning(docs).collect()}
    assert set(rows) == set(dedup.BAND_SWEEP)
    for nb in sorted(rows):
        r = rows[nb]
        assert r["rows_per_band"] == 12 // nb
        assert 0 <= r["n_verified"] <= r["n_candidates"]
    for coarse, fine in [(2, 3), (2, 4), (2, 6), (3, 6), (4, 6)]:
        assert rows[fine]["n_candidates"] >= rows[coarse]["n_candidates"], (
            f"{coarse}→{fine}: finer cut subdivides coarser bands, so its "
            "candidate set must be a superset"
        )
    d02_pairs = dedup.minhash_lsh_pairs(docs).count()
    assert rows[6]["n_verified"] >= d02_pairs


def test_sentence_dedup_finds_planted_boilerplate(spark):
    """A cookie-banner sentence shared by 3 docs must rank first with
    exact occurrence/doc counts; segmentation must match the u06 UDTF
    rule (ASCII [.!?]+ split, whitespace strip).  The shipped corpus has
    no sentence punctuation, so its true census is empty — this plant is
    the machinery proof."""
    import duckdb as _duck
    import pandas as pd

    banner = "we use cookies to improve your experience"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                banner + ". unique one! tail",
                "lead-in. " + banner + ". more text",
                banner + "? yet another body",
                "completely original text. nothing shared",
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    rows = dedup.sentence_dedup(docs).collect()
    assert rows and rows[0]["rank"] == 1
    assert rows[0]["n_occurrences"] == 3 and rows[0]["n_docs"] == 3
    assert rows[0]["exemplar"].startswith("we use cookies")
    con = _duck.connect()
    con.register("documents", pdf)
    from tests.conftest import assert_same_result

    assert_same_result(dedup.sentence_dedup(docs), con, dedup.sentence_dedup_sql())


def test_rrf_fusion_rewards_agreement(spark):
    """A candidate ranked by BOTH sources must outscore one ranked first
    by a single source: 2 appearances at mid-rank beat 1 appearance at
    rank 1 once ranks are within the RRF damping window."""
    import math

    import pandas as pd

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # dense cluster along the query axis: exact and LSH agree on 1..3
    rows = [(0, unit([1.0, 0.0]))] + [
        (i, unit([1.0 - 0.01 * i, 0.01 * i])) for i in range(1, 8)
    ]
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ).selectExpr("vec_id", "cast(embedding as array<float>) embedding")
    got = similarity.rrf_fusion(emb, n_queries=1).collect()
    assert got, "fusion returned nothing"
    by_rank = {r["rank"]: r for r in got}
    # rank-1 candidate must have contributions from both sources: its score
    # exceeds the single-source maximum SCALE div (K + 1)
    single_max = similarity.RRF_SCALE // (similarity.RRF_K + 1)
    assert by_rank[1]["rrf_score"] > single_max


def test_clustering_coefficient_clique_vs_star(spark):
    """A triangle (clique) node scores cc = 1.0 (1e6 ppm); a star hub
    with 3 spokes and no closed wedges scores 0."""
    import pandas as pd

    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (10, 12), (10, 13)]
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"]).astype("int64")
    )
    tri = dedup.triangle_counts_from_pairs(pairs)
    # drive the public entry through a docs-free path: rebuild deg + cc join
    sym = pairs.selectExpr("doc_a AS u").unionByName(pairs.selectExpr("doc_b AS u"))
    from pyspark.sql import functions as FF

    deg = sym.groupBy("u").agg(FF.count(FF.lit(1)).alias("deg")).filter(FF.col("deg") >= 2)
    got = {
        r["u"]: r
        for r in deg.join(tri.withColumnRenamed("doc_id", "u"), "u", "left")
        .withColumn(
            "cc_ppm",
            FF.expr("(2 * coalesce(n_triangles, 0) * 1000000) div (deg * (deg - 1))"),
        )
        .collect()
    }
    assert got[1]["cc_ppm"] == 1_000_000  # triangle member: fully clustered
    assert got[10]["cc_ppm"] == 0  # star hub: no closed wedge


def test_pq_encode_words_packs_codes(emb):
    """s07's gate shape: the m codes fold big-endian into one BIGINT
    (acc * k_cent + code), agreeing with the array form and the SQL twin."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    spark = emb.sparkSession
    rows = [
        (0, [float(i) for i in range(8)]),
        (1, [float(7 - i) for i in range(8)]),
        (2, [float(i) + 0.1 for i in range(8)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    words = {
        r["vec_id"]: r["code_word"]
        for r in similarity.pq_encode_words(df, m=2, k_cent=2, dim=8).collect()
    }
    assert words == {0: 0, 1: 3, 2: 0}  # [0,0] -> 0, [1,1] -> 1*2+1, [0,0] -> 0
    con = _duck.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": [0, 1, 2], "embedding": [r[1] for r in rows]}),
    )
    assert_same_result(
        similarity.pq_encode_words(df, m=2, k_cent=2, dim=8),
        con,
        similarity.pq_encode_words_sql(m=2, k_cent=2),
    )
    con.close()


def test_bloom_dedup_no_false_negatives(spark):
    """An exact duplicate of a corpus doc (same text) MUST be flagged by
    the Bloom screen (zero false negatives by construction); a clearly
    novel doc with no corpus text overlap must carry exact_dup = 0; and
    false_positive is exactly bloom_hit & !exact_dup.  Oracle twin agrees."""
    import duckdb as _duck
    import pandas as pd

    from tests.conftest import assert_same_result

    # doc_id % 10 >= 8 → incoming; others → corpus
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 18, 19],
            "text": [BASE, OTHER, NEAR, BASE, "entirely novel content xyz"],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = {r["doc_id"]: r for r in dedup.bloom_dedup(docs).collect()}
    assert set(got) == {18, 19}
    assert got[18]["bloom_hit"] == 1 and got[18]["exact_dup"] == 1
    assert got[18]["false_positive"] == 0
    assert got[19]["exact_dup"] == 0
    for r in got.values():
        assert r["false_positive"] == int(r["bloom_hit"] == 1 and r["exact_dup"] == 0)
    con = _duck.connect()
    con.register("documents", pdf)
    assert_same_result(dedup.bloom_dedup(docs), con, dedup.bloom_dedup_sql())
    con.close()


def test_personalized_pagerank_favors_seed_component(spark):
    """Two disjoint near-dup components; the seed (doc_id 0, % 50 == 0)
    sits in one of them — every node of the non-seed component must score
    0 (mass can only enter through seeds), and the seed's component holds
    all positive mass with the seed itself ranked highest."""
    import pandas as pd

    comp_a = "alpha beta gamma delta epsilon zeta eta theta " * 4
    comp_b = "one two three four five six seven eight nine ten " * 4
    # 70/71 are NOT seeds (70 % 50 != 0); only doc 0 seeds
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 70, 71],
            "text": [comp_a, comp_a + " iota", comp_b, comp_b + " eleven"],
        }
    )
    got = {
        r["doc_id"]: r["ppr"]
        for r in dedup.personalized_pagerank(spark.createDataFrame(pdf)).collect()
    }
    assert got[70] == 0 and got[71] == 0  # unreachable from the seed
    # On a 2-node path the damped walk OSCILLATES between endpoints
    # (bipartite), so no per-node ordering holds at a fixed odd round —
    # only the component-level property is invariant: all mass with seeds.
    assert got[0] > 0 and got[1] > 0
    import duckdb as _duck

    from tests.conftest import assert_same_result

    con = _duck.connect()
    con.register("documents", pdf)
    assert_same_result(
        dedup.personalized_pagerank(spark.createDataFrame(pdf)),
        con,
        dedup.personalized_pagerank_sql(),
    )
    con.close()


def test_nn_descent_monotone_improvement(emb):
    """NN-descent's defining invariant: with the old edges in the candidate
    set, the refined graph's worst kept neighbor can never be worse than
    s06's — per vector, min(new top-k cosine) >= min(old top-k cosine).
    On a planted two-cluster set, one round must recover a true top-1 the
    coarse IVF seed graph misses for at least one vector."""
    spark = emb.sparkSession
    old = {
        (r["vec_id"], r["rank"]): r["cosine"]
        for r in similarity.knn_join(emb).collect()
    }
    new = {
        (r["vec_id"], r["rank"]): r["cosine"]
        for r in similarity.nn_descent_round(emb).collect()
    }
    vids = {v for v, _ in old}
    assert vids == {v for v, _ in new}
    # The invariant is PER-RANK pointwise dominance over the ranks the seed
    # fills: candidates ⊇ old edges, so new rank-r cosine >= old rank-r
    # cosine.  (min-over-ranks is wrong when descent FILLS MORE ranks than
    # the seed — extra, lower-cosine tail neighbors are an improvement, not
    # a regression.  A tiny corpus where every vector seeds its own
    # singleton cell produces exactly that shape.)
    for (v, r), c_old in old.items():
        assert new[(v, r)] >= c_old, (
            f"vec {v} rank {r}: descent made the graph worse"
        )


def test_dedup_weights_inverse_copies(docs):
    """Weights are exactly 1e6 // n_copies: the duplicated text (docs 1, 4)
    gets 500000 each, singletons get 1000000; total mass per distinct
    content is (almost) constant.  Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    got = {r["doc_id"]: r for r in dedup.dedup_weights(docs).collect()}
    assert got[1]["n_copies"] == 2 and got[1]["weight_ppm"] == 500_000
    assert got[4]["weight_ppm"] == 500_000
    assert got[2]["weight_ppm"] == 1_000_000 and got[3]["weight_ppm"] == 1_000_000
    con = _duck.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [BASE, NEAR, OTHER, BASE]}),
    )
    assert_same_result(dedup.dedup_weights(docs), con, dedup.dedup_weights_sql())
    con.close()


def test_harmonic_centrality_path_graph(spark):
    """On a 4-node near-dup path A-B-C-D (built from planted text overlaps
    via a constructed pair frame), interior nodes score higher than
    endpoints and the exact ppm sums hold: B sees {A:1, C:1, D:2} →
    2·10⁶ + 5·10⁵; A sees {B:1, C:2, D:3} → 10⁶ + 5·10⁵ + 333333."""
    import pandas as pd

    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [1, 2, 3], "doc_b": [2, 3, 4]})
    )
    # drive the internal form directly: monkeypatch-free by computing from
    # the same edge algebra the operator uses
    from pyspark.sql import functions as FF

    edges = pairs.select(
        FF.col("doc_a").alias("src"), FF.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(FF.col("doc_b").alias("src"), FF.col("doc_a").alias("dst"))
    )
    reach = edges.select(
        FF.col("src").alias("origin"), FF.col("dst").alias("node"), FF.lit(1).alias("dist")
    )
    frontier = reach
    for d in (2, 3):
        frontier = (
            frontier.join(edges, FF.col("node") == FF.col("src"))
            .select("origin", FF.col("dst").alias("node"), FF.lit(d).alias("dist"))
            .filter(FF.col("origin") != FF.col("node"))
        )
        reach = reach.unionByName(frontier)
    shortest = reach.groupBy("origin", "node").agg(FF.min("dist").alias("dist"))
    got = {
        r["origin"]: r["h"]
        for r in shortest.groupBy("origin")
        .agg(FF.sum(FF.expr("1000000 div dist")).alias("h"))
        .collect()
    }
    assert got[2] == 2_000_000 + 500_000
    assert got[1] == 1_000_000 + 500_000 + 333_333
    assert got[2] == got[3] and got[1] == got[4]  # path symmetry


def test_multiprobe_dominates_plain_lsh(spark):
    """Multiprobe's candidate set strictly contains s02's (probe 0 is the
    exact chunk), so per (query, rank) the multiprobe cosine can never be
    lower; on the twin fixture recall stays 100%."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(20, 16).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
        rows.append((100 + i, [float(x) for x in v * 1.001], 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    plain = {
        (r["query_id"], r["rank"]): r["cosine"]
        for r in similarity.lsh_topk(df, k=1, n_queries=20).collect()
    }
    multi = {
        (r["query_id"], r["rank"]): r["cosine"]
        for r in similarity.multiprobe_lsh_topk(df, k=1, n_queries=20).collect()
    }
    for key, cos in plain.items():
        assert key in multi and multi[key] >= cos, (
            f"{key}: multiprobe returned a worse neighbor"
        )
    got = similarity.multiprobe_lsh_topk(df, k=1, n_queries=20).collect()
    hits = sum(1 for r in got if r["cand_id"] == 100 + r["query_id"])
    assert hits == 20


def test_neardup_weights_cluster_mass(docs):
    """Docs 1, 2, 4 form one near-dup cluster (exact dup + paraphrase) →
    weight 333333 each; doc 3 is a singleton at 1e6.  Oracle agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    got = {r["doc_id"]: r for r in dedup.neardup_weights(docs).collect()}
    assert got[3]["cluster_size"] == 1 and got[3]["weight_ppm"] == 1_000_000
    assert got[1]["cluster_size"] == 3
    assert got[1]["weight_ppm"] == got[2]["weight_ppm"] == got[4]["weight_ppm"] == 333_333
    con = _duck.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [BASE, NEAR, OTHER, BASE]}),
    )
    assert_same_result(dedup.neardup_weights(docs), con, dedup.neardup_weights_sql())
    con.close()


def test_sim_histogram_buckets_and_shares(spark, emb):
    """With one hash block (n_blocks=1) every C(5,2)=10 pair is scored:
    the near-dup pairs land in the top decile bin (cos in [0.9, 1.0) -> 9)
    and shares sum to ~1e6.  Oracle twin agrees at the default block
    count too."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    got = similarity.sim_histogram(emb, n_blocks=1).toPandas()
    assert got["n_pairs"].sum() == 10
    by_bin = dict(zip(got["bin"], got["n_pairs"]))
    assert by_bin.get(9, 0) == 2  # (0,10) and (30,40) near-identical pairs
    assert 999_990 <= got["share_ppm"].sum() <= 1_000_000
    con = _duck.connect()
    con.register("embeddings", emb.toPandas())
    assert_same_result(
        similarity.sim_histogram(emb), con, similarity.sim_histogram_sql()
    )
    con.close()


def test_ivf_cell_census_covers_corpus(spark, emb):
    """Census counts every vector exactly once, shares sum to ~1e6, and
    size_rank orders by occupancy.  Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    got = similarity.ivf_cell_census(emb, n_cells=2).toPandas()
    assert got["n_vecs"].sum() == 5
    srt = got.sort_values("size_rank")
    assert list(srt["n_vecs"]) == sorted(got["n_vecs"], reverse=True)
    assert 999_990 <= got["share_ppm"].sum() <= 1_000_000
    con = _duck.connect()
    con.register("embeddings", emb.toPandas())
    assert_same_result(
        similarity.ivf_cell_census(emb), con, similarity.ivf_cell_census_sql()
    )
    con.close()


def test_degree_assortativity_star_vs_path(spark):
    """A 3-spoke star is maximally disassortative: every edge joins the
    degree-3 hub to a degree-1 leaf, so the exact moments give r = -1.
    Adding a detached edge (both endpoints degree 1) pulls r toward 0."""
    import pandas as pd

    star = spark.createDataFrame(
        pd.DataFrame([(1, 2), (1, 3), (1, 4)], columns=["doc_a", "doc_b"]).astype(
            "int64"
        )
    )
    got = dedup.degree_assortativity_from_pairs(star).collect()[0]
    assert got["n_directed_edges"] == 6
    # 6 directed edges, each hub(3)-leaf(1): sx=12, sxx=30, sxy=6*3=18
    # r = (6*18 - 144) / (6*30 - 144) = -36/36 = -1
    assert got["sum_deg"] == 12
    assert got["sum_deg_sq"] == 30
    assert got["sum_deg_prod"] == 18
    assert got["assortativity"] == -1.0
    mixed = spark.createDataFrame(
        pd.DataFrame(
            [(1, 2), (1, 3), (1, 4), (10, 11)], columns=["doc_a", "doc_b"]
        ).astype("int64")
    )
    r2 = dedup.degree_assortativity_from_pairs(mixed).collect()[0]["assortativity"]
    assert -1.0 < r2 < 0.0


def test_component_census_sizes_and_ppm(spark):
    """A 3-node path, a 2-node edge and another 2-node edge census as one
    size-3 component and two size-2 components over 7 graph nodes."""
    import pandas as pd

    pairs = spark.createDataFrame(
        pd.DataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21)], columns=["doc_a", "doc_b"]
        ).astype("int64")
    )
    got = {r["size"]: r for r in dedup.component_census_from_pairs(pairs).collect()}
    assert got[3]["n_components"] == 1 and got[3]["n_docs"] == 3
    assert got[2]["n_components"] == 2 and got[2]["n_docs"] == 4
    assert got[3]["docs_ppm"] == 3 * 1_000_000 // 7
    assert got[2]["docs_ppm"] == 4 * 1_000_000 // 7


def test_ahash_shifts_and_bands(spark):
    """aHash is invariant to adding a constant to every byte in a way that
    preserves the above-mean pattern (monotone shift), while chunk-md5
    (m07) would differ on every byte; banded pairing finds the planted
    near-identical pair and the Hamming verify rejects a far pair."""
    from spj_query_engine_spark.operators import multimodal as mm

    base = "abcdefgh" * 30  # 240 bytes, strong byte pattern
    shifted = "bcdefghi" * 30  # every byte +1: same above-mean pattern
    noise = "".join(chr(97 + (i * 7) % 26) for i in range(240))
    docs = spark.createDataFrame(
        [(1, base, "w"), (2, shifted, "w"), (3, noise, "w")],
        "doc_id long, text string, source string",
    )
    wrapped = mm.attach_payload(docs)
    fps = {r["doc_id"]: r["ahash"] for r in mm.ahash_fingerprints(wrapped).collect()}
    assert fps[1] == fps[2]  # monotone shift preserves the aHash exactly
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in mm.ahash_pairs(wrapped).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) not in pairs or pairs[(1, 3)] > 0


def test_ahash_oracle_parity(spark):
    """The SQL twin replays the Python-side aHash bit-for-bit on ASCII
    payloads (the m01 posture: text bytes stand in for decoded pixels)."""
    import duckdb as _duck

    from spj_query_engine_spark.operators import multimodal as mm
    from tests.conftest import assert_same_result

    rows = [
        (1, "abcdefgh" * 30, "w"),
        (2, "bcdefghi" * 30, "w"),
        (3, "zzz zzz aaa bbb ccc ddd eee fff" * 9, "w"),
        (4, None, "w"),
        (5, "", "w"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(
        mm.ahash_fingerprints(mm.attach_payload(docs)),
        con,
        mm.ahash_fingerprints_sql(),
    )
    assert_same_result(
        mm.ahash_pairs(mm.attach_payload(docs)), con, mm.ahash_pairs_sql()
    )
    con.close()


def test_ivf_probe_sweep_monotone_recall(spark, emb):
    """Recall@k is monotone in nprobe by construction (probing more cells
    only adds candidates) and hits the exact result when every cell is
    probed.  Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    got = (
        similarity.ivf_probe_sweep(emb, k=2, n_queries=3)
        .toPandas()
        .sort_values("n_probe")
    )
    recalls = list(got["recall_ppm"])
    assert recalls == sorted(recalls)
    assert got["n_exact"].iloc[0] > 0
    assert (got["n_exact"] == got["n_exact"].iloc[0]).all()
    con = _duck.connect()
    con.register("embeddings", emb.toPandas())
    assert_same_result(
        similarity.ivf_probe_sweep(emb), con, similarity.ivf_probe_sweep_sql()
    )
    con.close()


def test_shingle_df_histogram_mass_conservation(spark):
    """Histogram posting mass sums to the full inverted-index size, the
    ppm shares sum to ~1e6, and a shingle repeated across many docs lands
    in the capped bucket.  Oracle twin agrees."""
    import duckdb as _duck
    import pandas as pd

    from tests.conftest import assert_same_result

    common = "alpha beta gamma delta epsilon"  # shared 5-gram block
    rows = [(i, common + f" unique{i} tail{i} end{i} pad{i}", "w") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = dedup.shingle_df_histogram(docs).toPandas()
    inv_size = dedup.shingle_index(docs).count()
    assert got["postings"].sum() == inv_size
    assert 999_900 <= got["postings_ppm"].sum() <= 1_000_000
    # the shared shingle has DF=30 > NGRAM_MAX_DF=20 → its log2 bucket is capped
    capped = got[got["any_capped"] == 1]
    assert len(capped) >= 1 and capped["log2_df"].max() >= 4
    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(
        dedup.shingle_df_histogram(docs), con, dedup.shingle_df_histogram_sql()
    )
    con.close()


def test_embedding_drift_split_and_shares(spark, emb):
    """Cohorts split by id parity (ids 0..40 step 10 → all even → cohort
    totals guard fires only when both cohorts exist); with a mixed-id
    corpus the per-cohort shares each sum to ~1e6 and counts cover the
    corpus.  Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 0),
        (3, [0.0, 0.9, 0.1, 0.0], 0),
        (4, [0.0, 0.0, 1.0, 0.0], 1),
        (5, [0.0, 0.0, 0.9, 0.1], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = similarity.embedding_drift(df, n_cells=2).toPandas()
    assert got["n_a"].sum() == 3 and got["n_b"].sum() == 3
    assert 999_990 <= got["share_a_ppm"].sum() <= 1_000_000
    assert 999_990 <= got["share_b_ppm"].sum() <= 1_000_000
    assert (
        got["abs_delta_ppm"] == (got["share_a_ppm"] - got["share_b_ppm"]).abs()
    ).all()
    con = _duck.connect()
    con.register("embeddings", df.toPandas())
    assert_same_result(
        similarity.embedding_drift(df, n_cells=2),
        con,
        similarity.embedding_drift_sql(n_cells=2),
    )
    con.close()


def test_span_coverage_planted_quote(spark):
    """A 12-token block shared verbatim by two docs covers exactly those
    positions in each (ppm floor-exact); an unrelated doc reports 0.
    Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    block = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens
    rows = [
        (1, block + " " + " ".join(f"a{i}" for i in range(8)), "w"),  # 20 toks
        (2, " ".join(f"b{i}" for i in range(4)) + " " + block, "w"),  # 16 toks
        (3, " ".join(f"c{i}" for i in range(15)), "w"),  # no overlap
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in dedup.span_coverage(docs).collect()}
    assert got[1]["covered_tokens"] == 12
    assert got[1]["coverage_ppm"] == 12 * 1_000_000 // 20
    assert got[2]["covered_tokens"] == 12
    assert got[3]["covered_tokens"] == 0 and got[3]["coverage_ppm"] == 0
    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(dedup.span_coverage(docs), con, dedup.span_coverage_sql())
    con.close()


def test_sq_error_audit_bounds(spark, emb):
    """Reconstruction error never exceeds one quantization step (round-to-
    nearest level), degenerate dims (hi == lo) report zero error, and the
    audit covers every dimension once.  Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    got = similarity.sq_error_audit(emb).toPandas()
    assert len(got) == 4  # fixture dim
    assert (got["n_values"] == 5).all()
    assert (got["max_abs_err"] <= got["step"] + 1e-9).all()
    degenerate = got[got["hi"] == got["lo"]]
    assert (degenerate["max_abs_err"] == 0).all()
    con = _duck.connect()
    con.register("embeddings", emb.toPandas())
    assert_same_result(
        similarity.sq_error_audit(emb), con, similarity.sq_error_audit_sql()
    )
    con.close()


def test_cell_purity_majority_and_coverage(spark):
    """Labels aligned with geometry give pure cells; vector counts cover
    the corpus and purity is the floor-exact majority share.  Oracle twin
    agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 7),
        (1, [0.0, 1.0, 0.0, 0.0], 8),
        (2, [0.95, 0.05, 0.0, 0.0], 7),
        (3, [0.9, 0.1, 0.0, 0.0], 7),
        (4, [0.05, 0.95, 0.0, 0.0], 8),
        (5, [0.1, 0.9, 0.0, 0.0], 7),  # impurity in cell 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["cell"]: r for r in similarity.cell_purity(df, n_cells=2).collect()}
    assert sum(r["n_vecs"] for r in got.values()) == 6
    assert got[0]["majority_label"] == 7 and got[0]["purity_ppm"] == 1_000_000
    assert got[1]["majority_label"] == 8
    assert got[1]["purity_ppm"] == 2 * 1_000_000 // 3
    assert got[1]["n_labels"] == 2
    con = _duck.connect()
    con.register("embeddings", df.toPandas())
    assert_same_result(
        similarity.cell_purity(df, n_cells=2), con, similarity.cell_purity_sql(n_cells=2)
    )
    con.close()


def test_kmeans_replayable_centroids_shape_and_determinism(emb):
    """The replayable spherical k-means keeps one centroid row per seeded
    cell across rounds (empty cells coalesce to their previous centroid)
    and is run-to-run deterministic."""
    c1 = similarity.kmeans_centroids_replayable(emb, n_cells=25, rounds=2)
    rows = {r["cid"]: tuple(r["c_vec"]) for r in c1.collect()}
    assert sorted(rows) == [0, 10, 20]  # seeds are the vec_id < 25 vectors
    again = {
        r["cid"]: tuple(r["c_vec"])
        for r in similarity.kmeans_centroids_replayable(emb, n_cells=25, rounds=2).collect()
    }
    assert rows == again


def test_ivf_kmeans_matches_duckdb_oracle(spark):
    """s04's full pipeline (replayable k-means fit + probe/rerank) must be
    bit-identical to its unrolled DuckDB twin on the real sf0.001 table."""
    import duckdb

    from tests.conftest import assert_same_result

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    try:
        assert_same_result(
            similarity.ivf_topk_kmeans(emb),
            con,
            similarity.ivf_topk_kmeans_sql(),
        )
    finally:
        con.close()


def test_dup_span_extents_islands(spark):
    """Two disjoint shared blocks in one doc -> two islands with the right
    max extent; single-block docs -> one island; clean doc -> zeros.
    Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    blk1 = " ".join(f"s{i}" for i in range(12))   # 12 shared tokens
    blk2 = " ".join(f"t{i}" for i in range(9))    # 9 shared tokens
    gap = " ".join(f"g{i}" for i in range(10))    # unique separator
    rows = [
        (1, blk1 + " " + gap + " " + blk2, "w"),          # both blocks
        (2, blk1 + " " + " ".join(f"b{i}" for i in range(5)), "w"),
        (3, " ".join(f"c{i}" for i in range(6)) + " " + blk2, "w"),
        (4, " ".join(f"d{i}" for i in range(15)), "w"),   # clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in dedup.dup_span_extents(docs).collect()}
    assert got[1]["n_spans"] == 2
    assert got[1]["max_span_tokens"] == 12
    assert got[1]["covered_tokens"] == 12 + 9
    assert got[2]["n_spans"] == 1 and got[2]["max_span_tokens"] == 12
    assert got[3]["n_spans"] == 1 and got[3]["max_span_tokens"] == 9
    assert got[4]["n_spans"] == 0 and got[4]["max_span_tokens"] == 0
    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(dedup.dup_span_extents(docs), con, dedup.dup_span_extents_sql())
    con.close()


def test_quantizer_sparse_id_space(spark, tmp_path):
    """prefix_rows (r09): centroid/leaf seed sets must be the n SMALLEST
    ids, not ``id < n``.  On a sparse id space (replica-offset or hashed
    ids — any real corpus) the old predicate silently under-selected
    centroids: at 1000x it found 2k of the intended 20k leaves, inflating
    mean cell size and rerank pair volume ~10x (the r08 s09 kill).
    Re-id the real embeddings by ``vec_id*1000+7`` — NO id satisfies
    ``id < n_cells`` — and assert (a) the seed set keeps full cardinality
    and (b) engine still matches the SQL twin on the sparse corpus."""
    import duckdb as _duck

    from spj_query_engine_spark.catalog import load_tables
    from tests.conftest import SF_DIR, assert_same_result

    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]
    sparse = emb.withColumn(
        "vec_id", (F.col("vec_id") * 1000 + 7).cast("long")
    )
    path = str(tmp_path / "sparse_emb.parquet")
    sparse.write.parquet(path)
    sp = spark.read.parquet(path)
    assert dedup.prefix_rows(sp, "vec_id", 16).count() == 16
    con = _duck.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{path}/*.parquet')"
    )
    try:
        assert_same_result(
            similarity.knn_join_2level(sp),
            con,
            similarity.knn_join_2level_sql(),
        )
        assert_same_result(
            dedup.embedding_near_dup(sp), con, dedup.embedding_near_dup_sql()
        )
    finally:
        con.close()

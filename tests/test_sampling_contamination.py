"""Unit tests for the mixture sampler and the decontamination operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spj_query_engine_spark.operators import dedup, sampling

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    from spj_query_engine_spark.catalog import load_tables

    return load_tables(spark, SF_DIR, ("documents",))["documents"]


def test_mixture_sample_respects_rates(docs):
    got = sampling.mixture_sample(docs).toPandas()
    # every kept row's bucket is under its source's rate
    assert (got["bucket"] < got["keep_pct"]).all()
    # the 100%-tier source keeps everything
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert (got["source"] == "src0").sum() == n_src0


def test_mixture_sample_monotone_in_rate(docs):
    """Raising a rate strictly grows the kept set (stable bucket per key) —
    the recipe-tuning property the docstring promises."""
    low = sampling.mixture_sample(docs, weights={"src1": 20}, default_pct=5)
    high = sampling.mixture_sample(docs, weights={"src1": 60}, default_pct=15)
    low_ids = {r["doc_id"] for r in low.collect()}
    high_ids = {r["doc_id"] for r in high.collect()}
    assert low_ids < high_ids


def test_mixture_sample_layout_independent(docs):
    a = {r["doc_id"] for r in sampling.mixture_sample(docs).collect()}
    b = {r["doc_id"] for r in sampling.mixture_sample(docs.repartition(7)).collect()}
    assert a == b


def test_contamination_flags_planted_dup(spark):
    # doc 0 is eval (0 % 17 == 0); doc 5 shares all its shingles with doc 0
    # → contamination 1.0.  doc 6 shares nothing.
    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(0, text), (5, text), (6, "one two three four five six seven")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["contamination"] for r in dedup.contamination(docs).collect()}
    assert got[5] == 1.0
    assert 6 not in got
    assert 0 not in got  # eval docs are never flagged


def test_contamination_partial_overlap(spark):
    # doc 1 shares a 5-word run with eval doc 0 → some but not all shingles
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon completely different tail words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["contamination"] for r in dedup.contamination(docs).collect()}
    assert 0.0 < got[1] < 1.0


def test_overlap_chunks_boundaries(spark):
    """Chunk count = max(1, ceil((n - overlap)/stride)); every token is
    covered; consecutive chunks overlap by exactly size - stride tokens."""
    import duckdb as _duck
    import pandas as pd

    from spj_query_engine_spark.operators.sampling import (
        overlap_chunks,
        overlap_chunks_sql,
    )
    from tests.conftest import assert_same_result

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            # boundary cases around size=32 / stride=24 / overlap=8:
            "text": [words(8), words(32), words(33), words(56), words(57)],
        }
    )
    sdf = spark.createDataFrame(docs)
    got = overlap_chunks(sdf).toPandas()
    n_chunks = got.groupby("doc_id").size().to_dict()
    assert n_chunks == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3}
    # every chunk starts on the stride grid and the last covers the tail
    for doc_id, n in [(3, 33), (4, 56), (5, 57)]:
        sub = got[got.doc_id == doc_id].sort_values("chunk_idx")
        assert list(sub.tok_start) == [24 * i for i in range(len(sub))]
        last = sub.iloc[-1]
        assert last.tok_start + last.n_tok_chunk == n  # tail covered
    con = _duck.connect()
    con.register("documents", docs)
    assert_same_result(overlap_chunks(sdf), con, overlap_chunks_sql())


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """Both sides of a planted near-dup pair (and an exact dup) must land
    in the SAME split; singletons keep p01-style hash placement."""
    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                base,
                base.replace("lazy", "sleepy"),  # near-dup of 1
                base,  # exact dup of 1
                "entirely different content about distributed query engines at scale",
            ],
        }
    )
    got = {
        r["doc_id"]: r
        for r in sampling.leakage_safe_split(spark.createDataFrame(docs)).collect()
    }
    assert len(got) == 4
    assert got[1]["group_id"] == got[2]["group_id"] == got[3]["group_id"] == 1
    assert got[1]["split"] == got[2]["split"] == got[3]["split"]
    assert got[4]["group_id"] == 4


def test_bpe_pairs_counts_planted_bigram(spark):
    import pandas as pd

    from spj_query_engine_spark.operators.textops import bpe_pair_counts

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["new york new york", "new york city", "solo"],
        }
    )
    got = bpe_pair_counts(spark.createDataFrame(docs), k=3).collect()
    by_rank = {r["rank"]: (r["pair"], r["n"]) for r in got}
    assert by_rank[1] == ("new york", 3)
    assert by_rank[2] == ("york city", 1)  # tie broken lexicographically


def test_data_card_per_source(spark):
    """Data card: dominant language picked by count with lexicographic
    tie-break, token totals consistent with t01's token definition."""
    import duckdb as _duck
    import pandas as pd

    from spj_query_engine_spark.operators.sampling import data_card, data_card_sql
    from tests.conftest import assert_same_result

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["one two", "three four five", "sechs sieben", "uno"],
            "lang": ["en", "en", "de", "es"],
            "source": ["web", "web", "web", "books"],
            "n_chars": [7, 15, 12, 3],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = {r["source"]: r for r in data_card(docs).collect()}
    assert got["web"]["n_docs"] == 3 and got["web"]["n_langs"] == 2
    assert got["web"]["top_lang"] == "en" and got["web"]["total_tokens"] == 7
    assert got["books"]["top_lang"] == "es" and got["books"]["median_chars"] == 3.0
    con = _duck.connect()
    con.register("documents", pdf)
    assert_same_result(data_card(docs), con, data_card_sql())


def test_balanced_sample_exact_k_and_underfull(spark):
    """Exactly k per stratum when the stratum has >= k rows; under-full
    strata keep everything; the pick is stable under repartitioning."""
    import pandas as pd

    from spj_query_engine_spark.operators.sampling import balanced_sample

    pdf = pd.DataFrame(
        {
            "doc_id": range(100),
            "text": ["x"] * 100,
            "lang": ["en"] * 80 + ["de"] * 20,
            "source": ["s"] * 100,
            "n_chars": [1] * 100,
        }
    )
    docs = spark.createDataFrame(pdf)
    got = balanced_sample(docs, k=30).toPandas()
    counts = got.groupby("stratum")["doc_id"].count().to_dict()
    assert counts == {"en": 30, "de": 20}
    again = balanced_sample(docs.repartition(7), k=30).toPandas()
    assert set(got["doc_id"]) == set(again["doc_id"])


def test_e2e_pipeline_manifest_and_oracle(spark, docs, duck):
    """p14: the end-to-end curation chain — splits partition the survivor
    set (doc counts sum to the post-filter post-dedup census) and the
    whole composition matches its DuckDB twin."""
    got = sampling.e2e_pipeline(docs).toPandas()
    assert set(got["split"]) <= {"train", "val", "test"}
    # recompute the survivor census independently: quality >= median, then
    # one survivor per exact-text digest
    from spj_query_engine_spark.operators.textops import quality_score

    q = quality_score(docs).select("doc_id", "quality")
    med = q.approxQuantile("quality", [0.5], 0.0)[0]
    kept = docs.join(q, "doc_id").filter(F.col("quality") >= med)
    n_survivors = kept.select(F.md5("text")).distinct().count()
    assert int(got["n_docs"].sum()) == n_survivors
    from tests.conftest import assert_same_result

    assert_same_result(sampling.e2e_pipeline(docs), duck, sampling.e2e_pipeline_sql())


def test_dsir_selection_recovers_target(spark, docs, duck):
    """p15: on a planted corpus with disjoint vocabularies the target
    language's docs all clear the selection cutoff; on the real corpus the
    target posts the highest mean weight and matches the DuckDB twin."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(20),
            # 4 'en' docs share a vocabulary disjoint from 16 'xx' docs
            "text": ["alpha beta gamma delta"] * 4 + ["uno dos tres quatro"] * 16,
            "lang": ["en"] * 4 + ["xx"] * 16,
        }
    )
    planted = spark.createDataFrame(pdf)
    got = {r["lang"]: r for r in sampling.dsir_selection(planted).collect()}
    # every target doc is target-like; the raw-majority 'xx' docs are not
    assert got["en"]["n_selected"] == 4 and got["xx"]["n_selected"] == 0
    assert got["en"]["mean_weight"] > got["xx"]["mean_weight"]
    # real corpus: target language ranks first by mean weight + oracle match
    rows = sampling.dsir_selection(docs).collect()
    top = max(rows, key=lambda r: r["mean_weight"])
    assert top["lang"] == "en"
    from tests.conftest import assert_same_result

    assert_same_result(sampling.dsir_selection(docs), duck, sampling.dsir_selection_sql())


def test_interleave_sources_round_robins(spark):
    """3 sources with 3/2/1 docs: positions must alternate A,B,C while all
    sources last, then continue with the survivors; shard striping is
    position mod INTERLEAVE_SHARDS; and the oracle twin agrees."""
    import duckdb as _duck
    import pandas as pd

    from tests.conftest import assert_same_result

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "source": ["A", "A", "A", "B", "B", "C"],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = sampling.interleave_sources(docs).collect()
    by_pos = [r["source"] for r in sorted(got, key=lambda r: r["position"])]
    assert by_pos == ["A", "B", "C", "A", "B", "A"]
    for r in got:
        assert r["shard"] == (r["position"] - 1) % sampling.INTERLEAVE_SHARDS
    con = _duck.connect()
    con.register("documents", pdf)
    assert_same_result(
        sampling.interleave_sources(docs), con, sampling.interleave_sources_sql()
    )
    con.close()


def test_token_budget_pack_fills_budget_exactly(spark):
    """Equal-quality docs (tie-broken by id) with 10 tokens each and a 30%
    budget over 100 tokens: the pack must keep docs 1..3 (30 tokens) —
    cum through doc 3 == budget, and doc 4 must NOT enter (its cum-before
    == budget, not < budget).  With budget 35 the crossing doc IS kept.
    Oracle twin agrees."""
    import duckdb as _duck
    import pandas as pd

    from tests.conftest import assert_same_result

    text = "tok " * 10  # 10 tokens, identical quality for every doc
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, 11)),
            "text": [text.strip()] * 10,
            "n_chars": [len(text.strip())] * 10,
        }
    )
    docs = spark.createDataFrame(pdf)
    got = sorted(
        r["doc_id"] for r in sampling.token_budget_pack(docs, budget_pct=30).collect()
    )
    assert got == [1, 2, 3]
    got35 = sorted(
        r["doc_id"] for r in sampling.token_budget_pack(docs, budget_pct=35).collect()
    )
    assert got35 == [1, 2, 3, 4]  # the budget-crossing doc is kept
    con = _duck.connect()
    con.register("documents", pdf)
    assert_same_result(
        sampling.token_budget_pack(docs, budget_pct=30),
        con,
        sampling.token_budget_pack_sql(budget_pct=30),
    )
    con.close()


def test_epoch_orders_decorrelate(docs):
    """Each epoch's positions are a permutation of 1..n; epochs 0 and 1
    displace on average a substantial fraction of n (uniform expectation
    ~n/3) — a broken salt would show displacement 0 everywhere."""
    got = sampling.epoch_orders(docs).toPandas()
    n = len(got)
    assert sorted(got["pos_e0"]) == list(range(1, n + 1))
    assert sorted(got["pos_e1"]) == list(range(1, n + 1))
    assert got["displacement"].mean() > n / 10  # decorrelated, not identity


def test_balanced_shards_snake_balance(spark):
    """16 docs with sizes 16..1 dealt to 8 shards snake-order: every shard
    gets exactly 2 docs and a token total of 17 (perfect balance for this
    arithmetic series), and ppm shares are equal.  Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    rows = [
        (i, " ".join(["w"] * (17 - i)), "web") for i in range(1, 17)
    ]  # doc 1 has 16 tokens ... doc 16 has 1 token
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sampling.balanced_shards(docs).toPandas().sort_values("shard")
    assert list(got["n_docs"]) == [2] * 8
    assert list(got["shard_tokens"]) == [17] * 8
    assert len(set(got["share_ppm"])) == 1
    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(
        sampling.balanced_shards(docs), con, sampling.balanced_shards_sql()
    )
    con.close()


def test_source_quality_mix_bands_and_shares(spark):
    """Each source's band shares sum to ~1e6, doc counts cover the corpus,
    and a deliberately junky doc (no stopwords, no punctuation, short)
    bands strictly below a clean prose doc.  Oracle twin agrees."""
    import duckdb as _duck

    from spj_query_engine_spark.operators import sampling as smp
    from tests.conftest import assert_same_result

    clean = (
        "the quick brown fox and the lazy dog are in the house with a friend. "
        * 8
    )
    junk = "zxqj kvw pqr"
    docs = spark.createDataFrame(
        [(1, clean, "web"), (2, junk, "web"), (3, clean, "books")],
        "doc_id long, text string, source string",
    )
    got = smp.source_quality_mix(docs).toPandas()
    assert got["n_docs"].sum() == 3
    for src, grp in got.groupby("source"):
        assert 999_990 <= grp["share_ppm"].sum() <= 1_000_000
    web = got[got["source"] == "web"].set_index("band")
    assert len(web) == 2  # clean and junk land in different bands
    bands = sorted(web.index)
    assert bands[0] < bands[-1]
    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(
        smp.source_quality_mix(docs), con, smp.source_quality_mix_sql()
    )
    con.close()


def test_rendezvous_shards_movers_go_to_new_shard_only(spark):
    """HRW invariants on a 400-doc corpus: (1) every shard 0..n-1 appears,
    (2) a doc moves under the n+1-shard world IFF its argmax over ALL n+1
    scores is the NEW shard — so total movers == docs whose global argmax
    is shard n, (3) moved share is far below the ~100% a mod-N reshard
    would cause (binomial bound around 1/(n+1)).  Oracle twin agrees."""
    import duckdb as _duck

    from pyspark.sql import functions as F
    from spj_query_engine_spark.functions.hashing import h32
    from tests.conftest import assert_same_result

    n = sampling.RDV_SHARDS
    rows = [(i, "x", "web") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sampling.rendezvous_shards(docs).toPandas()
    assert sorted(got["shard"]) == list(range(n))
    assert int(got["n_docs"].sum()) == 400

    # independent mover truth: argmax over all n+1 shards == the new shard
    scored = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(n))).alias("shard")
    ).select(
        "doc_id",
        "shard",
        h32(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("@"),
                F.col("shard").cast("string"),
            )
        ).alias("wt"),
    )
    winner = scored.groupBy("doc_id").agg(
        F.max_by("shard", F.struct(F.col("wt"), -F.col("shard"))).alias("w")
    )
    n_to_new = winner.filter(F.col("w") == n).count()
    assert int(got["n_moved"].sum()) == n_to_new
    # ~1/(n+1) of 400 ≈ 44; allow a wide deterministic band
    assert 10 <= n_to_new <= 110

    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(
        sampling.rendezvous_shards(docs), con, sampling.rendezvous_shards_sql()
    )
    con.close()


def test_source_cap_threshold_equals_window(spark):
    """The salted two-level cutoff must flag exactly the same rows as the
    textbook per-source row_number window, including sub-cap sources
    (everything kept) and quality ties (doc_id tie-break).  Oracle agrees."""
    import duckdb as _duck
    import pandas as pd

    from spj_query_engine_spark.operators import sampling
    from tests.conftest import assert_same_result

    rows = []
    # source A: 40 docs (above cap), B: 5 docs (below cap), C: all-tied text
    for i in range(40):
        rows.append((i, "the quick brown fox " * (1 + i % 7), "en", "A", 0))
    for i in range(40, 45):
        rows.append((i, "of and is to in a " * (1 + i % 3), "en", "B", 0))
    for i in range(45, 65):
        rows.append((i, "identical tie text here", "en", "C", 0))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    )
    out = sampling.source_cap(docs).toPandas()
    kept = out[out.kept]
    per_src = kept.groupby("source").size().to_dict()
    assert per_src["A"] == sampling.SOURCE_CAP_K
    assert per_src["B"] == 5  # sub-cap source keeps everything
    assert per_src["C"] == sampling.SOURCE_CAP_K
    # tie source: the K LOWEST doc_ids survive (deterministic tie-break)
    assert sorted(kept[kept.source == "C"].doc_id) == list(
        range(45, 45 + sampling.SOURCE_CAP_K)
    )
    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(sampling.source_cap(docs), con, sampling.source_cap_sql())
    con.close()

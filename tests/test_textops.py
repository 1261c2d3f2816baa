"""Text-analysis operator tests: literal-DataFrame correctness vs DuckDB, and
plan-shape checks (these must be pure projections — zero shuffles)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F
from spj_query_engine_spark.operators import textops

from tests.conftest import assert_same_result

DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "The quick brown fox, jumps over the lazy dog!",
            "le chat est sur la table et le chien est dans le jardin",
            "x" * 5,
            "der hund ist nicht ein katze und das ist gut",
        ],
    }
)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS)


@pytest.fixture(scope="module")
def docs_duck():
    con = duckdb.connect()
    con.register("documents", DOCS)
    yield con
    con.close()


def test_token_stats(docs_df, docs_duck):
    assert_same_result(textops.token_stats(docs_df), docs_duck, textops.token_stats_sql())


def test_token_stats_values(docs_df):
    rows = {r["doc_id"]: r for r in (r.asDict() for r in textops.token_stats(docs_df).collect())}
    assert rows[1]["n_words"] == 9
    assert rows[3]["n_words"] == 1 and rows[3]["n_chars"] == 5
    # BPE-ish: words + punctuation marks tokenized separately
    assert rows[1]["n_tokens"] == 11


def test_quality_score(docs_df, docs_duck):
    assert_same_result(textops.quality_score(docs_df), docs_duck, textops.quality_score_sql())


def test_language_id(docs_df, docs_duck):
    assert_same_result(textops.language_id(docs_df), docs_duck, textops.language_id_sql())


def test_language_id_values(docs_df):
    got = {r["doc_id"]: r["lang_pred"] for r in textops.language_id(docs_df).collect()}
    assert got[1] == "en" and got[2] == "fr" and got[4] == "de" and got[3] == "und"


def test_fingerprint(docs_df, docs_duck):
    assert_same_result(textops.fingerprint(docs_df), docs_duck, textops.fingerprint_sql())


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "b a"]})
    )
    fps = [r["fp_rolling"] for r in textops.fingerprint(df).collect()]
    assert fps[0] != fps[1]


@pytest.mark.parametrize(
    "op", [textops.token_stats, textops.quality_score, textops.language_id, textops.fingerprint]
)
def test_no_shuffle_in_plan(docs_df, op):
    """100 TB design check: these are per-row projections — a shuffle in the
    plan would mean an accidental wide dependency."""
    plan = op(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pii_flags(docs_df, docs_duck):
    assert_same_result(textops.pii_flags(docs_df), docs_duck, textops.pii_flags_sql())


def test_pii_flags_positives(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "contact bob@example.com or alice@test.org today",
                    "call 555-123-4567 maybe",
                    "ssn 078-05-1120 leaked from 192.168.0.1",
                    "nothing sensitive here",
                ],
            }
        )
    )
    rows = {r["doc_id"]: r.asDict() for r in textops.pii_flags(df).collect()}
    assert rows[1]["n_emails"] == 2 and rows[1]["has_pii"]
    assert rows[2]["n_phones"] == 1
    assert rows[3]["n_ssns"] == 1 and rows[3]["n_ipv4s"] == 1
    assert rows[4]["has_pii"] is False


def test_pii_flags_oracle_on_positives(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["mail x@y.io, ip 10.0.0.1", "math 3.14 is not an ip"],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    assert_same_result(
        textops.pii_flags(spark.createDataFrame(pdf)), con, textops.pii_flags_sql()
    )
    con.close()


def test_pii_no_shuffle(docs_df):
    plan = textops.pii_flags(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_train_split_deterministic_and_proportional(spark):
    from spj_query_engine_spark.operators import sampling

    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = sampling.train_split(df).cache()
    frac = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert 0.75 < frac["train"] / 10_000 < 0.85
    assert 0.07 < frac["val"] / 10_000 < 0.13
    assert 0.07 < frac["test"] / 10_000 < 0.13
    # repartitioning must NOT change any row's split (the df.sample failure mode)
    again = sampling.train_split(df.repartition(7))
    joined = out.select("doc_id", F.col("split").alias("a")).join(
        again.select("doc_id", F.col("split").alias("b")), "doc_id"
    )
    assert joined.filter(F.col("a") != F.col("b")).count() == 0
    out.unpersist()


def test_normalize_text(docs_df, docs_duck):
    assert_same_result(textops.normalize_text(docs_df), docs_duck, textops.normalize_text_sql())


def test_normalize_values(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["  The   QUICK\t\tFox  "]})
    )
    [r] = textops.normalize_text(df).collect()
    assert r["norm_text"] == "the quick fox"
    assert r["norm_len"] == 13


def test_top_quality_per_lang(docs_df, docs_duck):
    assert_same_result(
        textops.top_quality_per_lang(docs_df), docs_duck, textops.top_quality_per_lang_sql()
    )


def test_term_doc_freq(docs_df, docs_duck):
    assert_same_result(textops.term_doc_freq(docs_df), docs_duck, textops.term_doc_freq_sql())


def test_term_doc_freq_counts_docs_not_occurrences(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["cat cat cat dog", "cat bird"]})
    )
    got = {r["term"]: r["doc_freq"] for r in textops.term_doc_freq(df).collect()}
    assert got == {"cat": 2, "dog": 1, "bird": 1}  # per-doc dedup before count


def test_stratified_sample_per_stratum_independence(spark):
    from spj_query_engine_spark.operators import sampling

    df = (
        spark.range(20_000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("fr"))
    )
    out = sampling.stratified_sample(df, pct=10).cache()
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 0.07 < by_lang["en"] / 10_000 < 0.13
    assert 0.07 < by_lang["fr"] / 10_000 < 0.13
    # stratum-salted hash: a key kept in one stratum must not be forced to
    # the same decision in the other (a global hash correlates them)
    en_keys = {r["doc_id"] // 2 for r in out.filter(F.col("lang") == "en").collect()}
    fr_keys = {r["doc_id"] // 2 for r in out.filter(F.col("lang") == "fr").collect()}
    assert en_keys != fr_keys
    # layout-independent (the df.sample failure mode)
    again = sampling.stratified_sample(df.repartition(7), pct=10)
    assert again.count() == out.count()
    assert again.join(out.select("doc_id"), "doc_id").count() == out.count()
    out.unpersist()


def test_tfidf_top_terms(docs_df, docs_duck):
    assert_same_result(
        textops.tfidf_top_terms(docs_df), docs_duck, textops.tfidf_top_terms_sql()
    )


def test_tfidf_ranks_rare_terms_above_stopwords(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "shared shared zebra",
                    "shared shared yak",
                    "shared shared shared",  # tf(shared)=3 but df=3 → low idf
                ],
            }
        )
    )
    got = {
        (r["doc_id"], r["rank"]): r["term"]
        for r in textops.tfidf_top_terms(df, k=1).collect()
    }
    # the unique term beats the corpus-wide one despite lower tf
    assert got[(1, 1)] == "zebra" and got[(2, 1)] == "yak"
    assert got[(3, 1)] == "shared"


def test_quality_mad_by_lang(spark):
    ldocs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "lang": ["en", "en", "en", "fr", "fr"],
            "text": [
                "the cat is on the mat",
                "a dog and a fox",
                "x",
                "le chat est la",
                "un deux trois quatre cinq six sept",
            ],
        }
    )
    con = duckdb.connect()
    con.register("documents", ldocs)
    assert_same_result(
        textops.quality_mad_by_lang(spark.createDataFrame(ldocs)),
        con,
        textops.quality_mad_by_lang_sql(),
    )
    got = {r["lang"]: r for r in textops.quality_mad_by_lang(spark.createDataFrame(ldocs)).collect()}
    assert got["en"]["n_docs"] == 3 and got["fr"]["n_docs"] == 2
    # two-doc group: MAD = half the gap between the two qualities
    assert got["fr"]["mad_quality"] >= 0.0


def test_vocab_stats_hapax(spark):
    vdocs = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a a b unique", "b c C"]}
    )
    row = textops.vocab_stats(spark.createDataFrame(vdocs)).collect()[0]
    assert row["n_tokens"] == 7
    assert row["vocab_size"] == 4  # a, b, unique, c (lowercased)
    assert row["n_hapax"] == 1  # only 'unique'
    con = duckdb.connect()
    con.register("documents", vdocs)
    assert_same_result(
        textops.vocab_stats(spark.createDataFrame(vdocs)), con, textops.vocab_stats_sql()
    )


def test_collocations_lift_beats_frequency(spark):
    """'san francisco' (always together, rare words) must out-lift
    'the cat' (frequent words, loosely bound) even when the latter pair
    occurs more often — the ranking property that distinguishes t21 from
    t15's raw frequency; lift values must be exact BIGINT."""
    import duckdb as _duck
    import pandas as pd

    from spj_query_engine_spark.operators.textops import (
        collocations,
        collocations_sql,
    )
    from tests.conftest import assert_same_result

    texts = (
        ["san francisco is great"] * 5
        + ["the cat sat on the mat"] * 6
        + ["the dog and the cat played"] * 2
    )
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    docs = spark.createDataFrame(pdf)
    got = collocations(docs, k=50).toPandas()
    by_pair = {(r.w1, r.w2): r for r in got.itertuples()}
    assert ("san", "francisco") in by_pair
    sf = by_pair[("san", "francisco")]
    tc = by_pair.get(("the", "cat"))
    assert tc is not None and sf.lift_ppm > tc.lift_ppm
    con = _duck.connect()
    con.register("documents", pdf)
    assert_same_result(collocations(docs, k=50), con, collocations_sql(k=50))


def test_vocab_power_law_buckets_exact(spark):
    """Planted frequencies 1/2/3/4 land in bit-length buckets 0/1/1/2 with
    exact word and token tallies; the oracle twin agrees."""
    import duckdb as _duck
    import pandas as pd

    from tests.conftest import assert_same_result

    # a:4, b:2, c:1, d:3  → buckets: a→2, b→1, d→1, c→0
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a a b d", "a a b d d c"],
        }
    )
    docs = spark.createDataFrame(pdf)
    from spj_query_engine_spark.operators import textops

    got = {r["freq_bucket"]: r for r in textops.vocab_power_law(docs).collect()}
    assert got[0]["n_words"] == 1 and got[0]["n_tokens"] == 1   # c
    assert got[1]["n_words"] == 2 and got[1]["n_tokens"] == 5   # b(2) + d(3)
    assert got[2]["n_words"] == 1 and got[2]["n_tokens"] == 4   # a
    con = _duck.connect()
    con.register("documents", pdf)
    assert_same_result(
        textops.vocab_power_law(docs), con, textops.vocab_power_law_sql()
    )
    con.close()


def test_vocab_coverage_curve_exact(spark):
    """a:6 b:3 c:1 → top-10 covers everything; a planted sweep value below
    the vocab must cover only the head words.  Oracle twin agrees."""
    import duckdb as _duck
    import pandas as pd

    from spj_query_engine_spark.operators import textops
    from tests.conftest import assert_same_result

    pdf = pd.DataFrame({"doc_id": [1], "text": ["a a a a a a b b b c"]})
    docs = spark.createDataFrame(pdf)
    got = {r["vocab_cut"]: r for r in textops.vocab_coverage_curve(docs).collect()}
    assert set(got) == set(textops.COVERAGE_SWEEP)
    for n, r in got.items():
        assert r["total_tokens"] == 10
        assert r["n_words"] == min(n, 3)
        assert r["tokens_covered"] == 10  # every cut >= vocab size here
        assert r["coverage_ppm"] == 1_000_000
    con = _duck.connect()
    con.register("documents", pdf)
    assert_same_result(
        textops.vocab_coverage_curve(docs), con, textops.vocab_coverage_curve_sql()
    )
    con.close()


def test_heaps_curve_exact_prefix_vocab(spark):
    """Constructed corpus with known first-occurrence positions: doc 1 =
    'a b a', doc 2 = 'c a d' → global first positions a:1 b:2 c:4 d:6;
    a 4-token prefix (patched sweep via direct internals is unnecessary —
    default cuts all exceed 6 tokens, so every cut sees the full vocab of
    4) and monotonicity in N must hold.  Oracle twin agrees."""
    import duckdb as _duck
    import pandas as pd

    from spj_query_engine_spark.operators import textops
    from tests.conftest import assert_same_result

    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["a b a", "c a d"]})
    docs = spark.createDataFrame(pdf)
    got = {r["prefix_tokens"]: r for r in textops.heaps_curve(docs).collect()}
    assert set(got) == set(textops.HEAPS_SWEEP)
    sizes = [got[n]["vocab_size"] for n in sorted(got)]
    assert sizes == sorted(sizes)  # monotone in N
    assert all(r["vocab_total"] == 4 for r in got.values())
    assert got[min(got)]["vocab_size"] == 4  # all firsts within 6 tokens
    con = _duck.connect()
    con.register("documents", pdf)
    assert_same_result(textops.heaps_curve(docs), con, textops.heaps_curve_sql())
    con.close()


def test_encoding_audit_flags_each_artifact(spark):
    """One doc per artifact class: the replacement char, a C0 control
    char, plain non-ASCII, the Latin-1 mojibake signature, and a clean
    ASCII doc plus a NULL - counts land in the right columns and ppm is
    floor-exact.  Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    rows = [
        (1, "clean ascii text", "web"),
        (2, "lost � here", "web"),
        (3, "bell \x07 char", "web"),
        (4, "café au lait", "web"),
        (5, "broken Ã© double decode", "web"),
        (6, None, "books"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in textops.encoding_audit(docs).collect()}
    web = got["web"]
    assert web["n_docs"] == 5
    assert web["n_replacement"] == 1
    assert web["n_control"] == 1
    # non-ASCII: the replacement char, cafe-with-accent and the mojibake doc
    assert web["n_nonascii"] == 3
    assert web["n_mojibake"] == 1
    assert web["replacement_ppm"] == 1_000_000 // 5
    assert got["books"]["n_docs"] == 1 and got["books"]["n_nonascii"] == 0
    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(textops.encoding_audit(docs), con, textops.encoding_audit_sql())
    con.close()


def test_truncation_loss_exact_sweep(spark):
    """Docs of 100, 600 and 3000 tokens against the (128, 512, 2048)
    sweep: only the 3000-token doc exceeds every cut, and the lost token
    mass is the exact sum of overhangs.  Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    rows = [
        (1, " ".join(["a"] * 100), "web"),
        (2, " ".join(["b"] * 600), "web"),
        (3, " ".join(["c"] * 3000), "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["ctx_len"]: r for r in textops.truncation_loss(docs).collect()}
    total = 100 + 600 + 3000
    assert got[128]["docs_over"] == 2
    assert got[128]["tokens_lost"] == (600 - 128) + (3000 - 128)
    assert got[512]["docs_over"] == 2
    assert got[512]["tokens_lost"] == (600 - 512) + (3000 - 512)
    assert got[2048]["docs_over"] == 1
    assert got[2048]["tokens_lost"] == 3000 - 2048
    assert all(r["total_tokens"] == total for r in got.values())
    assert got[2048]["lost_ppm"] == (3000 - 2048) * 1_000_000 // total
    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(textops.truncation_loss(docs), con, textops.truncation_loss_sql())
    con.close()


def test_doc_keyphrases_rank_by_lift(spark):
    """A bigram that always co-occurs ("neural network", 5 docs) outranks
    a loosely bound one built from very common words; sub-support
    bigrams never appear.  Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    rows = []
    for i in range(5):
        rows.append((i, f"neural network the cat the dog filler{i} the end", "w"))
    rows.append((10, "the cat the dog walks alone", "w"))
    rows.append((11, "one off pair here", "w"))  # support 1 → excluded
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = textops.doc_keyphrases(docs).toPandas()
    top_by_doc = got[got["rank"] == 1].set_index("doc_id")["phrase"].to_dict()
    assert top_by_doc[0] == "neural network"
    assert "one off" not in set(got["phrase"])
    assert got.groupby("doc_id")["rank"].max().max() <= textops.KEYPHRASE_K
    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(textops.doc_keyphrases(docs), con, textops.doc_keyphrases_sql())
    con.close()


def test_source_divergence_redundant_vs_distinct(spark):
    """Two sources with identical text diverge ~0 from the corpus; a
    lexically disjoint source shows high TV and its coverage equals its
    own corpus share.  Oracle twin agrees."""
    import duckdb as _duck

    from tests.conftest import assert_same_result

    same = "alpha beta gamma delta " * 5
    rows = [
        (1, same, "web"),
        (2, same, "mirror"),
        (3, "zeta eta theta iota kappa " * 4, "books"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in textops.source_divergence(docs).collect()}
    # web and mirror each see exactly the words the corpus majority has
    assert got["web"]["tv_ppm"] == got["mirror"]["tv_ppm"]
    assert got["books"]["tv_ppm"] > got["web"]["tv_ppm"]
    # disjoint source: TV = 1 - own_share (its words) /2*2 → sizable
    assert got["books"]["tv_ppm"] > 400_000
    con = _duck.connect()
    con.register("documents", docs.toPandas())
    assert_same_result(
        textops.source_divergence(docs), con, textops.source_divergence_sql()
    )
    con.close()


def test_pii_redact_planted_and_oracle(spark):
    """Planted PII: placeholders land, counts match the plant, char deltas
    are exact, the clean doc round-trips unchanged, and overlap between
    classes (email local part shaped like an IP) counts per-class on the
    ORIGINAL text in both engines.  Oracle twin agrees."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "contact bob@example.com or alice@test.org today",
                "call 555-123-4567 about ssn 078-05-1120 at 10.0.0.1",
                "1.2.3.4@mail.com hides an ip-shaped local part",
                "nothing sensitive here",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = {r["doc_id"]: r.asDict() for r in textops.pii_redact(df).collect()}
    assert rows[1]["n_redactions"] == 2
    assert rows[2]["n_redactions"] == 3
    # email replaced first consumes the ip-shaped local part, but the
    # per-class counts are on the original text: email + ipv4 = 2
    assert rows[3]["n_redactions"] == 2
    assert rows[4]["n_redactions"] == 0
    assert rows[4]["n_chars_before"] == rows[4]["n_chars_after"]
    import hashlib

    assert rows[4]["redacted_md5"] == hashlib.md5(
        b"nothing sensitive here"
    ).hexdigest()
    # redacted doc 1 is exactly the placeholder form
    red1 = "contact <EMAIL> or <EMAIL> today"
    assert rows[1]["n_chars_after"] == len(red1)
    assert rows[1]["redacted_md5"] == hashlib.md5(red1.encode()).hexdigest()
    con = duckdb.connect()
    con.register("documents", pdf)
    assert_same_result(textops.pii_redact(df), con, textops.pii_redact_sql())
    con.close()


def test_pii_redact_no_shuffle(docs_df):
    plan = textops.pii_redact(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_hashed_classifier_oracle(docs_df, docs_duck):
    assert_same_result(
        textops.hashed_classifier_score(docs_df),
        docs_duck,
        textops.hashed_classifier_score_sql(),
    )


def test_hashed_classifier_invariants(spark):
    # short/empty docs: 0 tokens -> 'empty' + NULL mean; 1 token -> 1 feature
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["", "  ", "hello"]})
    )
    rows = {
        r["doc_id"]: r
        for r in textops.hashed_classifier_score(docs).collect()
    }
    assert rows[1]["label"] == "empty" and rows[1]["n_feats"] == 0
    assert rows[2]["label"] == "empty" and rows[2]["mean_w"] is None
    assert rows[3]["n_feats"] == 1  # one unigram, no bigram
    assert rows[3]["label"] in ("keep", "drop")
    # score is the sum of per-feature weights, each within the weight range
    assert abs(rows[3]["score"]) <= textops.HC_WRANGE


def test_hashed_classifier_bag_semantics(spark):
    # duplicate tokens count twice (bag, not set): "a a" has feats
    # [a, a, "a a"] = 3; distinct-set semantics would give 2
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a a"]}))
    row = textops.hashed_classifier_score(docs).collect()[0]
    assert row["n_feats"] == 3

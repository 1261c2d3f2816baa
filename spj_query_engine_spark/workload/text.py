"""Workload entries for the text-analysis operators over the documents table
(beyond-reference training-data-pipeline surface; BASELINE.json north star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spj_query_engine_spark.catalog import load_tables
from spj_query_engine_spark.operators import textops
from spj_query_engine_spark.workload.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("documents",))["documents"]


@register(
    "t01_token_stats",
    textops.token_stats_sql(),
    doc="Token counting: whitespace words + BPE-ish regex tokens + mean word "
    "length; single codegen'd projection (no shuffle).",
)
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_stats(_docs(spark, sf_dir))


@register(
    "t02_quality_score",
    textops.quality_score_sql(),
    doc="Quality scoring: punctuation density, stopword ratio, length — "
    "one pass, rounded 4dp for exact cross-engine match.",
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_score(_docs(spark, sf_dir))


@register(
    "t03_language_id",
    textops.language_id_sql(),
    doc="Heuristic language ID: argmax of per-language stopword hit counts "
    "with deterministic tie-breaking.",
)
def t03_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.language_id(_docs(spark, sf_dir))


@register(
    "t04_fingerprint",
    textops.fingerprint_sql(),
    doc="Document fingerprinting: rolling base-31 polynomial hash over the "
    "char stream + 32-bit md5 prefix; both engine-portable.",
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.fingerprint(_docs(spark, sf_dir))


@register(
    "t05_pii_flags",
    textops.pii_flags_sql(),
    doc="PII hit counts (email/phone/SSN/IPv4) + any-PII flag; portable "
    "regexp_count projections — the pre-redaction scan of a data pipeline.",
)
def t05_pii_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.pii_flags(_docs(spark, sf_dir))


@register(
    "t06_normalize",
    textops.normalize_text_sql(),
    doc="Text normalization (lowercase, whitespace collapse, trim) — the "
    "canonicalization pass before hashing/dedup; pure codegen projection.",
)
def t06_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.normalize_text(_docs(spark, sf_dir))


@register(
    "t07_top_quality_per_lang",
    textops.top_quality_per_lang_sql(),
    doc="Corpus curation composition: language-ID + quality score + "
    "per-language top-%s window (window functions over operator output)."
    % textops.TOP_PER_LANG,
)
def t07_top_quality_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.top_quality_per_lang(_docs(spark, sf_dir))


@register(
    "t08_term_doc_freq",
    textops.term_doc_freq_sql(),
    doc="Top-%s terms by document frequency (vocabulary/IDF building block): "
    "per-doc dedup map-side before the explode, term counts shuffle once, "
    "top-k via TakeOrderedAndProject." % textops.TOP_TERMS,
)
def t08_term_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.term_doc_freq(_docs(spark, sf_dir))


@register(
    "t09_repetition",
    textops.repetition_stats_sql(),
    doc="Repetition quality filter: per-doc duplicate word-%s-gram fraction "
    "and top-gram fraction (Gopher-style repetition heuristics); "
    "explode + lead() grams, two map-side-partial aggregates, no per-row "
    "gram arrays." % textops.REP_N,
)
def t09_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.repetition_stats(_docs(spark, sf_dir))


@register(
    "t10_approx_cardinality",
    textops.approx_cardinality_check_sql(),
    doc="HLL++ approximate distinct counts per lang (approx_count_distinct, "
    "rsd=%s) gated in-engine against the exact distinct count (max relative "
    "error <= %s, constant oracle) — fixed-size mergeable sketch state, the "
    "100 TB cardinality tool." % (textops.APPROX_RSD, textops.APPROX_MAX_ERR),
    bench=False,  # self-check (computes the exact path too)
)
def t10_approx_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.approx_cardinality_check(_docs(spark, sf_dir))


@register(
    "t11_quality_filter",
    textops.quality_median_filter_sql(),
    doc="Relative quality cut: keep docs at/above their language's median "
    "quality (absolute thresholds skew against under-rated languages); "
    "score is a projection, thresholds broadcast - the corpus never "
    "shuffles.",
)
def t11_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_median_filter(_docs(spark, sf_dir))


@register(
    "t12_unigram_commonness",
    textops.unigram_commonness_sql(),
    doc="Unigram commonness score (transparent LM-perplexity analog): "
    "per-doc average corpus token frequency x1e6; integer sums + one final "
    "division keep the value hash exact - no logs, no float accumulation.",
)
def t12_unigram_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.unigram_commonness(_docs(spark, sf_dir))


@register(
    "t13_tfidf_top_terms",
    textops.tfidf_top_terms_sql(),
    doc="Top-%d characteristic terms per doc by integer-exact TF-IDF "
    "(score = tf x (N x 1e6 div df) - BIGINT arithmetic, no libm log "
    "drift); ranking window runs over the (doc, term, tf) aggregate, "
    "never raw text." % textops.TFIDF_TOP_K,
)
def t13_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.tfidf_top_terms(_docs(spark, sf_dir))


@register(
    "u02_grouped_mad",
    textops.quality_mad_by_lang_sql(),
    doc="Grouped-map pandas surface (applyInPandas): per-language quality "
    "median + MAD, each group one Arrow batch - the whole-group-in-memory "
    "statistics shape, value-hash verified against quantile_cont.",
)
def u02_grouped_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_mad_by_lang(_docs(spark, sf_dir))


@register(
    "t14_vocab_stats",
    textops.vocab_stats_sql(),
    doc="Corpus vocabulary profile: token total, vocab size, hapax count "
    "and fraction (Heaps'/Zipf health check) - one token groupBy with "
    "map-side partials, rollup bounded by the vocabulary.",
)
def t14_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.vocab_stats(_docs(spark, sf_dir))


@register(
    "t15_bpe_pairs",
    textops.bpe_pair_counts_sql(),
    doc="BPE tokenizer training, iteration 1: adjacent-token pair counts "
    "ranked to the top-%d merge candidates - pair extraction is a pure "
    "projection over the token array, counts partial-aggregate map-side, "
    "and the ranking window runs over the pair VOCABULARY frame, never "
    "the corpus." % textops.BPE_TOP_K,
)
def t15_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.bpe_pair_counts(_docs(spark, sf_dir))


@register(
    "t16_langid_confusion",
    textops.langid_confusion_sql(),
    doc="Model evaluation at corpus scale: t03's language classifier vs "
    "the labeled lang column as a confusion matrix (count + row share per "
    "(actual, predicted) cell) - scoring is the only full pass, the "
    "rollup and share window run over the langs^2 cell frame.",
)
def t16_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.langid_confusion(_docs(spark, sf_dir))


@register(
    "t17_bigram_novelty",
    textops.bigram_novelty_sql(),
    doc="Per-doc bigram novelty: fraction of a doc's distinct adjacent "
    "bigrams appearing in no other document (boilerplate ~0, novel text "
    "~1) - integer counts, two vocabulary-bounded shuffles, one final "
    "division; the dedup-adjacent quality signal.",
)
def t17_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.bigram_novelty(_docs(spark, sf_dir))


@register(
    "t18_bigram_lm",
    textops.bigram_lm_score_sql(),
    doc="Per-doc average bigram conditional probability (ppm) - the "
    "transparent LM-perplexity analog one level up from t12's unigrams: "
    "P(w|prev) = integer floor-div of corpus counts, per-doc mean as one "
    "double division of exact integer sums.  Vocabulary-bounded count "
    "tables; bigram extraction is a pure array projection.",
)
def t18_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.bigram_lm_score(_docs(spark, sf_dir))


@register(
    "t19_bpe_apply",
    textops.bpe_apply_sql(),
    doc="Iterative BPE training APPLIED (%d unrolled rounds): count pairs -> "
    "top pair -> merge non-overlapping occurrences corpus-wide.  The "
    "greedy left-to-right skip rule is pure window algebra (even offsets "
    "within runs of consecutive matches start merges), so the loop needs "
    "no sequential state and replays exactly in SQL; per round one "
    "vocabulary rollup + one per-doc window pass." % textops.BPE_ROUNDS,
)
def t19_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.core import coarse_materialize

    # per-round window passes + lineage barriers are many short stages at
    # bench scale — materialize under the coarse scope (no-op at 100 TB)
    return coarse_materialize(textops.bpe_apply, _docs(spark, sf_dir), coalesce=False)


@register(
    "t20_readability",
    textops.readability_sql(),
    doc="Flesch-style readability (syllables ~ vowel groups): one codegen "
    "projection, fixed-order double arithmetic, portable-rounded - the "
    "boilerplate/word-salad flag alongside t02/t09/t12/t18.",
)
def t20_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.readability(_docs(spark, sf_dir))


@register(
    "t21_collocations",
    textops.collocations_sql(),
    doc="Collocation mining: top-%d bigrams by integer lift "
    "n(w1w2)*N*1e6 div (n(w1)*n(w2)) - the PMI ranking with the monotone "
    "log dropped so every term is an exact BIGINT; the phrase-discovery "
    "complement to t15's raw-frequency BPE statistic, all rollups "
    "vocabulary-bounded." % textops.COLL_TOP_K,
)
def t21_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.collocations(_docs(spark, sf_dir))


@register(
    "t22_vocab_power_law",
    textops.vocab_power_law_sql(),
    doc="Vocabulary power-law (Zipf) histogram: words and token mass per "
    "floor(log2(frequency)) bucket, the distribution behind tokenizer "
    "vocab sizing and coverage cuts (t14's scalars expanded); bucket is "
    "the integer bit-length, so no floating log can misplace a "
    "power-of-two boundary - one vocabulary-bounded rollup then a "
    "~40-row rollup.",
)
def t22_vocab_power_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return textops.vocab_power_law(docs)


@register(
    "t23_coverage_curve",
    textops.vocab_coverage_curve_sql(),
    doc="Vocabulary coverage curve: token-mass share covered by the top-N "
    "words for N in %s - the measurement that picks a tokenizer vocab "
    "size ('how big for 99%% coverage'); one vocabulary-bounded rank "
    "window, sweep as conditional sums (candidates never multiply "
    "vocabulary rows), coverage integer-exact ppm."
    % (textops.COVERAGE_SWEEP,),
)
def t23_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return textops.vocab_coverage_curve(docs)


@register(
    "t24_heaps_curve",
    textops.heaps_curve_sql(),
    doc="Heaps'-law curve: distinct words within the first N corpus tokens "
    "for N in %s - vocabulary GROWTH, completing the tokenizer trio (t22 "
    "frequency shape, t23 cut coverage): V(N)~K*N^0.5 for natural text, "
    "linear growth screams unnormalized IDs.  Global positions from one "
    "per-DOC cumulative window (never a token-row order); sweep as "
    "conditional sums." % (textops.HEAPS_SWEEP,),
)
def t24_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return textops.heaps_curve(docs)


@register(
    "t25_encoding_audit",
    textops.encoding_audit_sql(),
    doc="Per-source encoding-artifact audit: U+FFFD replacement chars, C0 "
    "control chars, non-ASCII presence and the Latin-1 mojibake "
    "signature, with ppm rates - the corpus-intake screen run before "
    "tokenization (decode loss and double-decode bugs poison a "
    "vocabulary); pure regexp projections + one tiny-key rollup.",
)
def t25_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return textops.encoding_audit(docs)


@register(
    "t26_truncation_loss",
    textops.truncation_loss_sql(),
    doc="Context-length truncation loss: docs exceeding L tokens and the "
    "corpus token mass (ppm) beyond position L for L in %s - the "
    "measurement that picks a training sequence length (t23 sizes the "
    "vocab, this sizes the context; p05 then packs to the chosen L); "
    "one corpus pass, sweep as conditional sums."
    % (textops.TRUNC_SWEEP,),
)
def t26_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return textops.truncation_loss(docs)


@register(
    "t27_doc_keyphrases",
    textops.doc_keyphrases_sql(),
    doc="Per-document keyphrases: top-%d bigrams by the CORPUS lift table "
    "(t21's integer PMI, applied per doc) - the extractive tagger behind "
    "search facets and data-card topics; lift table is "
    "vocabulary-bounded, doc bigrams re-join it on the bigram key, "
    "top-k window partitions per doc (no corpus-global order)."
    % textops.KEYPHRASE_K,
)
def t27_doc_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    from spj_query_engine_spark.operators.core import coarse_materialize

    # r10: coarse scope + coalescing off (interleaved A/B 0.853,
    # scripts/ab_coarse4_r10.py); plain wrap measured 1.12 in batch 1
    return coarse_materialize(textops.doc_keyphrases, docs, coalesce=False)


@register(
    "t28_source_divergence",
    textops.source_divergence_sql(),
    doc="Per-source lexical divergence: total-variation distance (ppm) "
    "between each source's unigram distribution and the corpus-wide one "
    "plus vocab coverage - the mixture-diversity measurement behind "
    "source weighting (TV ~ 0 sources are redundant; high-TV sources "
    "bring the new text); runs entirely on ppm floors of exact counts "
    "where float KL/JS (logs) never value-replays.",
)
def t28_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return textops.source_divergence(docs)


@register(
    "t29_pii_redact",
    textops.pii_redact_sql(),
    doc="PII redaction transform (the step t05 only measures): typed "
    "placeholders replace every email/phone/SSN/IPv4 match in fixed class "
    "order; emits per-doc redaction count, char delta and redacted-text "
    "md5 - pure codegen regexp projections, zero shuffle.",
)
def t29_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.pii_redact(_docs(spark, sf_dir))


@register(
    "t30_hashed_classifier",
    textops.hashed_classifier_score_sql(),
    doc="Model-based quality filtering in the fastText linear shape "
    "(Joulin et al. 2016): hashing-trick buckets over the bag of "
    "unigrams+bigrams, integer slot weights (deterministic pseudo-model; "
    "trained weights would broadcast into the same plan), doc score = "
    "sum of slot weights, keep/drop label - one codegen'd projection + "
    "one map-side-combinable groupBy on doc_id.",
)
def t30_hashed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.hashed_classifier_score(_docs(spark, sf_dir))


@register(
    "t31_bpe_train",
    textops.bpe_train_hist_sql(),
    doc="Classical character-level BPE tokenizer TRAINING on the word "
    "HISTOGRAM (Sennrich et al. 2016's trainer reduction): the corpus is "
    "touched once (one word-count shuffle); all %d merge rounds then run "
    "over the distinct-word table weighted by count - O(vocabulary) per "
    "round, not O(corpus) like t19's stream replay.  Best pair per round "
    "is a struct-min aggregate (-count, a, b) so ties break identically "
    "in both engines; merging is an identical nested-replace function on "
    "both sides, so the learned merge table (rnd, tok_a, tok_b, "
    "pair_count) matches bit-for-bit." % textops.BPE_TRAIN_ROUNDS,
)
def t31_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.bpe_train_hist(_docs(spark, sf_dir))

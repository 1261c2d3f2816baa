"""Text analysis operators for large-scale training-data pipelines.

Beyond-reference capability (the reference has NO scalar functions at all —
its select list and predicates are bare columns, ``parser.cup:193-227``).
These are the text-quality primitives an LLM-data pipeline runs over billions
of documents: token statistics, heuristic language ID, quality scoring, and
document fingerprinting.

Design for 100 TB: every operator is a pure per-row projection built from
JVM-side expressions (``regexp_count``, ``aggregate``, ``split`` — all inside
whole-stage codegen).  No Python UDFs, no shuffles, no driver collection;
the plans scale linearly with input splits.

Each operator has a ``*_SQL`` twin generating the equivalent DuckDB oracle
expression from the SAME constants, so the driver's value-hash gate verifies
them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spj_query_engine_spark.functions.hashing import (
    h32,
    h32_sql,
    portable_round,
    portable_round_sql,
)

# ---------------------------------------------------------------------------
# shared constants (inlined into BOTH Spark and oracle SQL)
# ---------------------------------------------------------------------------

#: Heuristic language markers: tiny high-frequency stopword sets.  A real
#: pipeline would plug a trained model in here (as a pandas_udf); the
#: *operator shape* — argmax over per-language regex hit counts — is the same.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "fr": ("le", "la", "les", "et", "un", "une", "est"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
}
LANG_FALLBACK = "und"

#: BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WORD_RE = r"\S+"
PUNCT_RE = r"[.,!?;:]"
STOPWORD_QUALITY = ("the", "a", "of", "and", "is", "to", "in")

FINGERPRINT_MOD = 2147483647  # 2^31 - 1, rolling polynomial base-31 hash


def _marker_re(words: tuple[str, ...]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


# ---------------------------------------------------------------------------
# operators (DataFrame → DataFrame)
# ---------------------------------------------------------------------------


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics: chars, whitespace words, BPE-ish
    tokens, mean word length (rounded to 4dp for cross-engine exactness)."""
    n_words = F.regexp_count(F.col(text_col), F.lit(WORD_RE))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    return docs.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n_words.alias("n_words"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE)).alias("n_tokens"),
        portable_round(n_alpha / F.greatest(n_words, F.lit(1)).cast("double"), 4).alias("avg_word_len"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cheap quality heuristics: punctuation density, stopword ratio, mean
    word length — combined into a [0,1]-ish score.  The exact formula is
    arbitrary; what matters at scale is that it is a single codegen'd
    projection over the corpus."""
    n_words = F.greatest(F.regexp_count(F.col(text_col), F.lit(WORD_RE)), F.lit(1))
    punct = F.regexp_count(F.col(text_col), F.lit(PUNCT_RE))
    stop = F.regexp_count(F.col(text_col), F.lit(_marker_re(STOPWORD_QUALITY)))
    stop_ratio = stop / n_words
    punct_ratio = punct / n_words
    score = (
        F.lit(0.5) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * F.least(F.col("n_chars_") / 1000.0, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio, F.lit(1.0)))
    )
    return (
        docs.withColumn("n_chars_", F.length(text_col).cast("double"))
        .select(
            F.col(id_col),
            portable_round(stop_ratio, 4).alias("stopword_ratio"),
            portable_round(punct_ratio, 4).alias("punct_ratio"),
            portable_round(score, 4).alias("quality"),
        )
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic n-gram/stopword language ID: count marker hits per language,
    argmax with strict-majority tie-breaking to 'und'.  Langs compare in the
    fixed LANG_MARKERS order, so ties resolve identically in both engines."""
    lower = F.lower(F.col(text_col))
    counts = {
        lang: F.regexp_count(lower, F.lit(_marker_re(words)))
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    # winner = first lang (in declaration order) whose count is strictly
    # greater than every other count; otherwise 'und'
    pred = F.lit(LANG_FALLBACK)
    for lang in reversed(langs):
        others = [counts[o] for o in langs if o != lang]
        strictly_best = (counts[lang] > F.lit(0))
        for o in others:
            strictly_best = strictly_best & (counts[lang] >= o)
        earlier = [counts[o] for o in langs[: langs.index(lang)]]
        for o in earlier:
            strictly_best = strictly_best & (counts[lang] > o)
        pred = F.when(strictly_best, F.lit(lang)).otherwise(pred)
    return docs.select(F.col(id_col), pred.alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprints: a base-31 rolling polynomial hash
    over the character stream (order-sensitive — reordered words change it)
    plus a 32-bit md5 prefix (content hash).  Both are portable across
    engines; at scale the md5 fp feeds exact dedup, the rolling fp cheap
    near-ordering checks."""
    from spj_query_engine_spark.functions.hashing import h32

    chars = F.split(F.col(text_col), "")
    roll = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % FINGERPRINT_MOD,
    )
    return docs.select(
        F.col(id_col),
        roll.alias("fp_rolling"),
        h32(F.col(text_col)).alias("fp_md5_32"),
    )


# ---------------------------------------------------------------------------
# oracle SQL twins (DuckDB dialect, same constants)
# ---------------------------------------------------------------------------


def token_stats_sql(table: str = "documents") -> str:
    n_alpha = "length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE"
    n_words = f"greatest(len(regexp_extract_all(text, '{WORD_RE}')), 1)"
    avg_word_len = portable_round_sql(f"{n_alpha} / {n_words}", 4)
    return f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '{WORD_RE}')) AS n_words,
           len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_tokens,
           {avg_word_len} AS avg_word_len
    FROM {table}
    """


def quality_score_sql(table: str = "documents") -> str:
    stop_re = _marker_re(STOPWORD_QUALITY)
    return f"""
    WITH t AS (
      SELECT doc_id,
             greatest(len(regexp_extract_all(text, '{WORD_RE}')), 1)::DOUBLE AS n_words,
             len(regexp_extract_all(text, '{PUNCT_RE}'))::DOUBLE AS punct,
             len(regexp_extract_all(text, '{stop_re}'))::DOUBLE AS stop,
             length(text)::DOUBLE AS n_chars
      FROM {table}
    )
    SELECT doc_id,
           {portable_round_sql('stop / n_words', 4)} AS stopword_ratio,
           {portable_round_sql('punct / n_words', 4)} AS punct_ratio,
           {portable_round_sql('0.5 * least(stop / n_words * 4, 1.0) + 0.3 * least(n_chars / 1000.0, 1.0) + 0.2 * (1.0 - least(punct / n_words, 1.0))', 4)} AS quality
    FROM t
    """


def language_id_sql(table: str = "documents") -> str:
    langs = list(LANG_MARKERS)
    count_exprs = {
        lang: f"len(regexp_extract_all(lower(text), '{_marker_re(words)}'))"
        for lang, words in LANG_MARKERS.items()
    }
    cte_cols = ",\n             ".join(f"{e} AS c_{lang}" for lang, e in count_exprs.items())
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"c_{lang} > 0"]
        for j, other in enumerate(langs):
            if j == i:
                continue
            op = ">" if j < i else ">="
            conds.append(f"c_{lang} {op} c_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{LANG_FALLBACK}' END"
    return f"""
    WITH t AS (
      SELECT doc_id,
             {cte_cols}
      FROM {table}
    )
    SELECT doc_id, {case_sql} AS lang_pred FROM t
    """


def fingerprint_sql(table: str = "documents") -> str:
    from spj_query_engine_spark.functions.hashing import h32_sql

    return f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
                          list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
             (acc, x) -> (acc * 31 + x) % {FINGERPRINT_MOD}) AS fp_rolling,
           {h32_sql('text')} AS fp_md5_32
    FROM {table}
    """


# ---------------------------------------------------------------------------
# PII detection flags
# ---------------------------------------------------------------------------

#: Deliberately simple, engine-portable patterns (no lookaround, no \b —
#: identical semantics in Java regex and DuckDB's RE2): the shapes a
#: training-data pipeline redacts before anything else.
PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_phones": r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "n_ssns": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "n_ipv4s": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_flags(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts + an any-PII flag.  Pure ``regexp_count``
    projections (codegen, no shuffle); the redaction step in a real pipeline
    is ``regexp_replace`` over the same patterns — same scan shape."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(name)
        for name, pat in PII_PATTERNS.items()
    ]
    out = docs.select(F.col(id_col), *counts)
    flag = None
    for name in PII_PATTERNS:
        c = F.col(name) > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)


def pii_flags_sql(table: str = "documents") -> str:
    cols = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS {name}"
        for name, pat in PII_PATTERNS.items()
    )
    flag = " OR ".join(f"{name} > 0" for name in PII_PATTERNS)
    return f"""
    SELECT doc_id, {cols},
           ({flag}) AS has_pii
    FROM {table}
    """


#: replacement tokens per PII class — no ``$`` or ``\`` so Java and RE2
#: replacement semantics cannot diverge
PII_PLACEHOLDERS = {
    "n_emails": "<EMAIL>",
    "n_phones": "<PHONE>",
    "n_ssns": "<SSN>",
    "n_ipv4s": "<IP>",
}


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII REDACTION — the transform t05 only measures: replace every match
    of the portable PII patterns with a typed placeholder, in the FIXED
    class order of ``PII_PATTERNS`` (email → phone → SSN → IPv4), and emit
    the audit row a redaction job logs per document: matches redacted,
    char counts before/after, and the md5 of the redacted text (the
    payload a downstream exact-dedup keys on).  Per-class counts are taken
    on the ORIGINAL text in both engines, so overlap between classes (an
    address swallowed by an earlier replacement) can never make the twins
    disagree.

    Pure codegen regexp projections, zero shuffle — at 100 TB this fuses
    into the scan exactly like t06's normalization; the d15 pattern
    (measure-op next to transform-op) applied to PII."""
    total = None
    for pat in PII_PATTERNS.values():
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        total = c if total is None else total + c
    red = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, PII_PLACEHOLDERS[name])
    return docs.select(
        F.col(id_col),
        total.alias("n_redactions"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_before"),
        F.length(red).cast("long").alias("n_chars_after"),
        F.md5(red).alias("redacted_md5"),
    )


def pii_redact_sql(table: str = "documents") -> str:
    red = "text"
    for name, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '{PII_PLACEHOLDERS[name]}', 'g')"
    total = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for pat in PII_PATTERNS.values()
    )
    return f"""
    SELECT doc_id,
           CAST({total} AS BIGINT) AS n_redactions,
           CAST(len(text) AS BIGINT) AS n_chars_before,
           CAST(len({red}) AS BIGINT) AS n_chars_after,
           md5({red}) AS redacted_md5
    FROM {table}
    """


# ---------------------------------------------------------------------------
# Text normalization
# ---------------------------------------------------------------------------


def normalize_text(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical text normalization before hashing/dedup: lowercase, collapse
    whitespace runs, strip.  Pure codegen projection; at 100 TB this runs
    fused into whatever scan feeds the dedup/fingerprint stage."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select(
        F.col(id_col),
        norm.alias("norm_text"),
        F.length(norm).alias("norm_len"),
    )


def normalize_text_sql(table: str = "documents") -> str:
    norm = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
    return f"""
    SELECT doc_id, {norm} AS norm_text, length({norm})::INT AS norm_len
    FROM {table}
    """


# ---------------------------------------------------------------------------
# Windowed composition: top-quality docs per predicted language
# ---------------------------------------------------------------------------

TOP_PER_LANG = 3


def top_quality_per_lang(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = TOP_PER_LANG
) -> DataFrame:
    """Composition query: language-ID + quality-score + per-language top-k
    window — the 'pick the best documents per language' selection step of a
    corpus curation pipeline.  Demonstrates window functions (a category the
    reference lacks entirely, SURVEY.md §2.3) over other operators' output;
    one shuffle on lang_pred for the window."""
    from pyspark.sql import Window

    q = quality_score(docs, text_col, id_col)
    lang = language_id(docs, text_col, id_col)
    joined = q.join(lang, id_col)
    w = Window.partitionBy("lang_pred").orderBy(F.desc("quality"), F.asc(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "lang_pred", "quality", "rank")
    )


def top_quality_per_lang_sql(table: str = "documents", k: int = TOP_PER_LANG) -> str:
    return f"""
    WITH q AS ({quality_score_sql(table)}),
    l AS ({language_id_sql(table)}),
    j AS (
      SELECT q.doc_id, l.lang_pred, q.quality,
             row_number() OVER (PARTITION BY l.lang_pred
                                ORDER BY q.quality DESC, q.doc_id ASC) AS rank
      FROM q JOIN l ON q.doc_id = l.doc_id
    )
    SELECT doc_id, lang_pred, quality, rank::BIGINT AS rank FROM j WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Corpus-level term document frequency (the vocabulary/IDF building block)
# ---------------------------------------------------------------------------

TOP_TERMS = 25


def term_doc_freq(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = TOP_TERMS
) -> DataFrame:
    """Top-``k`` terms by document frequency: lowercase whitespace tokens,
    deduped per document (array_distinct BEFORE explode — the per-doc dedup
    happens map-side, so the shuffle carries one row per (doc, distinct
    term), never per occurrence), then a count-distinct-free groupBy count.
    The vocabulary/IDF step of a text pipeline; at 100 TB the top-k is a
    TakeOrderedAndProject over the term counts — no global sort."""
    term = F.explode(
        F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    ).alias("term")
    return (
        docs.select(F.col(id_col), term)
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(k)
    )


def term_doc_freq_sql(table: str = "documents", k: int = TOP_TERMS) -> str:
    return f"""
    WITH terms AS (
      SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS term
      FROM {table}
    )
    SELECT term, count(*) AS doc_freq FROM terms WHERE term <> ''
    GROUP BY term ORDER BY doc_freq DESC, term ASC LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Repetition detection (duplicate n-gram fractions — the Gopher-style filter)
# ---------------------------------------------------------------------------

REP_N = 2  # word n-gram size for the repetition signals


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals over word ``REP_N``-grams: total gram
    count, duplicate-gram fraction (1 − distinct/total) and top-gram fraction
    (occurrences of the most frequent gram / total) — the standard
    repetition quality filters (public methodology: Gopher / MassiveText
    repetition heuristics).  Docs shorter than REP_N words drop out.

    Shape: posexplode tokens → lead() window builds grams (one shuffle on
    doc_id, codegen string ops) → two groupBy aggregates on (doc_id, gram)
    then doc_id — map-side partials throughout, no arrays held per row, so a
    100 MB document costs its gram count, not a giant in-memory list."""
    from pyspark.sql import Window as W

    from spj_query_engine_spark.operators.core import spread

    words = F.split(F.col(text_col), r"\s+")
    tok = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"), F.posexplode(words).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, REP_N)]
    grams = tok.select(
        "doc_id", F.concat_ws(" ", *leads).alias("gram"), leads[-1].alias("tail")
    ).filter(F.col("tail").isNotNull())
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        portable_round(
            F.lit(1.0) - F.count(F.lit(1)).cast("double") / F.sum("cnt").cast("double"),
            4,
        ).alias("dup_gram_ratio"),
        portable_round(
            F.max("cnt").cast("double") / F.sum("cnt").cast("double"), 4
        ).alias("top_gram_ratio"),
    )


def repetition_stats_sql(table: str = "documents") -> str:
    gram = " || ' ' || ".join(f"w[i + {j + 1}]" for j in range(REP_N))
    return f"""
    WITH words AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM {table}
    ),
    grams AS (
      SELECT doc_id, unnest(list_transform(range(len(w) - {REP_N - 1}), i -> {gram})) AS gram
      FROM words WHERE len(w) >= {REP_N}
    ),
    per_gram AS (
      SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_grams,
           {portable_round_sql('1.0 - count(*)::DOUBLE / SUM(cnt)::DOUBLE', 4)} AS dup_gram_ratio,
           {portable_round_sql('MAX(cnt)::DOUBLE / SUM(cnt)::DOUBLE', 4)} AS top_gram_ratio
    FROM per_gram GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# Approximate distinct counting (HLL++ sketch) with an in-engine error gate
# ---------------------------------------------------------------------------

APPROX_RSD = 0.05  # requested relative standard deviation for the sketch
APPROX_MAX_ERR = 0.15  # per-group relative error the gate asserts (≈3σ)


def approx_cardinality_check(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Sketch-based distinct counting — ``approx_count_distinct`` (HLL++,
    Heule et al. 2013) of text fingerprints per group — verified IN-ENGINE
    against the exact distinct count: one row (n_groups, max_rel_err_ok)
    with a constant oracle, the same driver-provable pattern as the
    trained-ANN recall gate (s05).

    The sketch is THE cardinality tool at 100 TB: fixed-size state
    (~1.5 KB/group at rsd=0.05) merged map-side, one narrow shuffle —
    versus the exact path's shuffle of every distinct value.  The sketch
    hash isn't replayable in DuckDB, so like k-means the OUTCOME is gated:
    every group's estimate must land within APPROX_MAX_ERR of exact."""
    fp = F.md5(F.col(text_col))
    per_group = (
        docs.select(F.col(group_col).alias("grp"), fp.alias("fp"))
        .groupBy("grp")
        .agg(
            F.approx_count_distinct("fp", rsd=APPROX_RSD).alias("approx_n"),
            F.count_distinct(F.col("fp")).alias("exact_n"),
        )
    )
    rel_err = F.abs(F.col("approx_n") - F.col("exact_n")) / F.greatest(
        F.col("exact_n"), F.lit(1)
    )
    return per_group.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        (F.max(rel_err) <= APPROX_MAX_ERR).cast("long").alias("max_rel_err_ok"),
    )


def approx_cardinality_check_sql(table: str = "documents", group_col: str = "lang") -> str:
    """Constant oracle: the group count is exact (DuckDB recomputes it);
    the error bound is the assertion the Spark side must reproduce."""
    return (
        f"SELECT CAST(count(DISTINCT {group_col}) AS BIGINT) AS n_groups, "
        f"1::BIGINT AS max_rel_err_ok FROM {table}"
    )


# ---------------------------------------------------------------------------
# Per-language quality-median filter (composition: score → threshold → keep)
# ---------------------------------------------------------------------------


def quality_median_filter(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep documents whose quality score is at or above their LANGUAGE's
    median — the relative-threshold quality cut (absolute thresholds skew
    against languages the scorer under-rates).  Composition of the engine's
    own pieces: t02's scorer → exact per-lang median (one tiny aggregate —
    at 100 TB swap in approx_percentile, same shape) → broadcast the
    per-lang thresholds back onto the scored corpus.  The corpus never
    shuffles: score is a projection and the threshold join broadcasts."""
    scored = quality_score(docs, text_col, id_col).select(id_col, "quality")
    langd = docs.select(id_col, "lang")
    sl = scored.join(langd, id_col)
    med = sl.groupBy("lang").agg(
        portable_round(F.expr("percentile(quality, 0.5)"), 4).alias("med_quality")
    )
    return (
        sl.join(F.broadcast(med), "lang")
        .filter(F.col("quality") >= F.col("med_quality"))
        .select(id_col, "lang", "quality", "med_quality")
    )


def quality_median_filter_sql(table: str = "documents") -> str:
    return f"""
    WITH q AS ({quality_score_sql(table)}),
    sl AS (SELECT q.doc_id, q.quality, d.lang FROM q JOIN {table} d ON q.doc_id = d.doc_id),
    med AS (
      SELECT lang, {portable_round_sql('quantile_cont(quality, 0.5)', 4)} AS med_quality
      FROM sl GROUP BY lang
    )
    SELECT sl.doc_id, sl.lang, sl.quality, med.med_quality
    FROM sl JOIN med USING (lang)
    WHERE sl.quality >= med.med_quality
    """


# ---------------------------------------------------------------------------
# Unigram commonness score (transparent LM-style quality signal)
# ---------------------------------------------------------------------------


def unigram_commonness(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average corpus-frequency of its tokens, scaled ×10⁶ —
    the transparent unigram analog of LM-perplexity quality filters (docs of
    rare/garbage tokens score low, boilerplate scores high; both tails get
    reviewed in a real pipeline).

    Exactness design: the score is Σ corpus_count(token) × 10⁶ /
    (corpus_total × doc_tokens) — INTEGER sums (exact, order-free in both
    engines) with ONE final double division of identical integers, so the
    value hash can never drift; no logs, no float accumulation.  Shapes:
    token explode → corpus count groupBy (one shuffle), occurrence re-join
    on token (one shuffle), per-doc integer aggregate; the corpus total is
    a broadcast single-row cross join."""
    tok = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    cnt = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    per_doc = (
        tok.join(cnt, "tok")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("sum_cnt"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )
    score = (F.col("sum_cnt") * F.lit(1_000_000.0)) / (
        F.col("total") * F.col("n_tok")
    ).cast("double")
    return per_doc.crossJoin(F.broadcast(total)).select(
        F.col(id_col), portable_round(score, 6).alias("commonness")
    )


def unigram_commonness_sql(table: str = "documents") -> str:
    score = "(sum_cnt * 1000000.0) / CAST(total * n_tok AS DOUBLE)"
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM {table}
    ),
    tok_f AS (SELECT * FROM tok WHERE tok <> ''),
    cnt AS (SELECT tok, count(*) AS cnt FROM tok_f GROUP BY tok),
    tot AS (SELECT count(*)::BIGINT AS total FROM tok_f),
    per_doc AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS sum_cnt, count(*) AS n_tok
      FROM tok_f JOIN cnt USING (tok) GROUP BY doc_id
    )
    SELECT doc_id, {portable_round_sql(score, 6)} AS commonness
    FROM per_doc, tot
    """


# ---------------------------------------------------------------------------
# TF-IDF top terms per document (t13)
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3  # terms kept per document
IDF_SCALE = 1_000_000  # integer idf = (N_docs * IDF_SCALE) div document_freq


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = TFIDF_TOP_K
) -> DataFrame:
    """Top-k characteristic terms per document by an integer-exact TF-IDF:
    score = tf × ((N_docs × 10⁶) div df).  The integer ratio replaces
    log(N/df) — same monotone ordering in df for fixed tf, but pure BIGINT
    arithmetic, so the cross-engine hash can never drift on libm log ulps.

    Scale shape: after the explode, everything runs on the (doc, term, tf)
    aggregate — one shuffle to build it, one equi-join on term against the
    document-frequency frame (stop-term rows fan out at most N_docs wide,
    AQE's skew split handles the head terms), one ranking window per doc.
    Raw text never shuffles; N_docs is a broadcast single-row aggregate."""
    tf = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.expr(f"tf * ((n_docs * {IDF_SCALE}) div df)"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", F.col("score").cast("long").alias("score"), "rank")
    )


def tfidf_top_terms_sql(table: str = "documents", k: int = TFIDF_TOP_K) -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM {table}
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*)::BIGINT AS n_docs FROM {table}),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf * ((n.n_docs * {IDF_SCALE}) // df.df) AS BIGINT) AS score
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Grouped-map pandas surface: per-language robust quality stats (u02)
# ---------------------------------------------------------------------------


def quality_mad_by_lang(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-language robust quality statistics — median and median absolute
    deviation — computed in a GROUPED-MAP pandas UDF (``applyInPandas``).

    This is the module's deliberate exception to the no-Python rule: the
    grouped Arrow batch is the right surface for statistics that need the
    whole group in memory (MAD is two dependent order-statistics passes).
    One shuffle on the grouping key; each group arrives as a single Arrow
    batch, so per-language medians are exact.  Groups are language-sized —
    at 100 TB you'd pre-aggregate to (lang, quality-histogram) first; the
    operator SHAPE (shuffle → grouped Arrow batch → per-group pandas) is
    what this entry proves, value-hash-verified against the oracle."""
    import numpy as np
    import pandas as pd

    scored = quality_score(docs, text_col, id_col).select(id_col, "quality")
    sl = scored.join(docs.select(id_col, "lang"), id_col)

    def mad_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["quality"].to_numpy(dtype=np.float64)
        med = float(np.median(q))
        mad = float(np.median(np.abs(q - med)))

        def pround(x: float, d: int) -> float:
            s = float(10**d)
            return np.floor(x * s + 0.5) / s

        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(q)],
                "med_quality": [pround(med, 4)],
                "mad_quality": [pround(mad, 4)],
            }
        )

    return sl.groupBy("lang").applyInPandas(
        mad_fn, "lang string, n_docs long, med_quality double, mad_quality double"
    )


def quality_mad_by_lang_sql(table: str = "documents") -> str:
    """Oracle: the same two order statistics via quantile_cont (numpy median
    on a sorted float64 array ≡ quantile_cont(0.5) linear interpolation)."""
    med = portable_round_sql("quantile_cont(quality, 0.5)", 4)
    mad = portable_round_sql("quantile_cont(abs_dev, 0.5)", 4)
    return f"""
    WITH q AS ({quality_score_sql(table)}),
    sl AS (SELECT q.doc_id, q.quality, d.lang FROM q JOIN {table} d ON q.doc_id = d.doc_id),
    med AS (SELECT lang, quantile_cont(quality, 0.5) AS med_quality FROM sl GROUP BY lang),
    dev AS (
      SELECT sl.lang, sl.quality, abs(sl.quality - med.med_quality) AS abs_dev
      FROM sl JOIN med USING (lang)
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           {med.replace('quality', 'dev.quality')} AS med_quality,
           {mad} AS mad_quality
    FROM dev GROUP BY lang
    """


# ---------------------------------------------------------------------------
# Corpus vocabulary statistics (t14)
# ---------------------------------------------------------------------------


def vocab_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level vocabulary profile (t14): total token occurrences,
    distinct vocabulary size, hapax legomena count and fraction — the
    Heaps'/Zipf-law health numbers a tokenizer-training or dedup run checks
    before touching a new corpus.

    Scale shape: one explode → one groupBy(token) with map-side partial
    counts, then a single-row rollup OVER THE VOCABULARY frame (bounded by
    distinct tokens, not occurrences).  All-integer outputs except the one
    final fraction."""
    tok = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
    )
    per_tok = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    return per_tok.agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n_hapax"),
    ).select(
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "vocab_size",
        F.col("n_hapax").cast("long").alias("n_hapax"),
        portable_round(
            F.col("n_hapax") / F.col("vocab_size").cast("double"), 6
        ).alias("hapax_frac"),
    )


def vocab_stats_sql(table: str = "documents") -> str:
    frac = portable_round_sql("n_hapax / CAST(vocab_size AS DOUBLE)", 6)
    return f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM {table}
    ),
    per_tok AS (SELECT tok, count(*) AS cnt FROM tok WHERE tok <> '' GROUP BY tok)
    SELECT CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           {frac} AS hapax_frac
    FROM per_tok
    """


# ---------------------------------------------------------------------------
# BPE merge-candidate counting (t15)
# ---------------------------------------------------------------------------

BPE_TOP_K = 20  # merge candidates reported


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = BPE_TOP_K
) -> DataFrame:
    """The first iteration of BPE tokenizer training: count every ADJACENT
    token pair across the corpus and rank the top-``k`` merge candidates —
    the statistic each BPE round recomputes after applying the previous
    merge.  (Real training loops this; one exact round is the verifiable
    unit, and the loop is this same query re-run on re-paired tokens.)

    Scale shape: pair extraction is a pure projection (token array →
    ``transform`` over a sequence — raw text never explodes before the
    pair rollup), the count partial-aggregates map-side, and the final
    ranking window runs over the pair-count frame, bounded by distinct
    pair vocabulary, never corpus size."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    pairs = (
        docs.select(toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> concat(toks[i], ' ', toks[i + 1]))"
                )
            ).alias("pair")
        )
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("pair", "n", F.col("rank").cast("long").alias("rank"))
    )


def bpe_pair_counts_sql(table: str = "documents", k: int = BPE_TOP_K) -> str:
    return f"""
    WITH t AS (
      SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM {table}
    ),
    pairs AS (
      SELECT toks[i + 1] || ' ' || toks[i + 2] AS pair
      FROM t, unnest(range(0, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 2
    ),
    counts AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair)
    SELECT pair, n, rank::BIGINT AS rank FROM (
      SELECT *, row_number() OVER (ORDER BY n DESC, pair ASC) AS rank
      FROM counts
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (t16) — model evaluation at corpus scale
# ---------------------------------------------------------------------------


def langid_confusion(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Evaluate the t03 language classifier against the corpus's labeled
    ``lang`` column as a CONFUSION MATRIX — one row per (actual, predicted)
    cell with count and row-relative share.  The model-eval-at-scale
    shape: score (projection) → join labels on the row key → two-key
    rollup bounded by langs², never corpus size; at 100 TB the only full
    pass is the scoring projection itself.

    The share denominator is the per-actual row total via a window over
    the CELL frame (langs² rows), so no second corpus pass exists."""
    pred = language_id(docs, text_col, id_col)
    labeled = docs.select(F.col(id_col), F.col("lang").alias("lang_actual"))
    cells = (
        labeled.join(pred, id_col)
        .groupBy("lang_actual", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang_actual")
    return cells.select(
        "lang_actual",
        "lang_pred",
        "n",
        portable_round(
            F.col("n") / F.sum("n").over(w).cast("double"), 6
        ).alias("share"),
    )


def langid_confusion_sql(table: str = "documents") -> str:
    share = portable_round_sql(
        "n / CAST(SUM(n) OVER (PARTITION BY lang_actual) AS DOUBLE)", 6
    )
    return f"""
    WITH pred AS ({language_id_sql(table)}),
    cells AS (
      SELECT d.lang AS lang_actual, p.lang_pred, count(*) AS n
      FROM {table} d JOIN pred p ON p.doc_id = d.doc_id
      GROUP BY 1, 2
    )
    SELECT lang_actual, lang_pred, n, {share} AS share FROM cells
    """


# ---------------------------------------------------------------------------
# Bigram novelty (t17) — how much of a document is phrasing seen nowhere else
# ---------------------------------------------------------------------------


def bigram_novelty(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document BIGRAM NOVELTY: the fraction of a doc's distinct
    adjacent-token bigrams that occur in no other document.  The
    dedup-adjacent quality signal — boilerplate-heavy docs score near 0,
    genuinely novel text near 1 — computed with integer counts and one
    final division so the value hash is exact.

    Scale shape: bigram extraction is the t15 projection
    (``transform`` over a token sequence, no pre-rollup explode of raw
    text), per-doc DISTINCT bounds each doc's contribution, document
    frequency is one groupBy over the bigram vocabulary, and the per-doc
    rollup re-joins on the bigram key — two shuffles total, both on keys
    whose cardinality is the bigram vocabulary, never corpus bytes.
    Docs with fewer than two tokens emit zero bigrams and report NULL
    novelty (no denominator), preserved by the LEFT join from the full
    document list."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    from spj_query_engine_spark.operators.core import barrier

    # r09 (§2.4): doc_bigrams feeds the DF rollup AND the per-doc rollup —
    # lazily the tokenize+explode pass over the corpus ran twice.
    doc_bigrams = barrier(
        docs.select(F.col(id_col), toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(0, size(toks) - 2), "
                        "i -> concat(toks[i], ' ', toks[i + 1]))"
                    )
                )
            ).alias("bg"),
        )
    )
    df_counts = doc_bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        doc_bigrams.join(df_counts, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("n_unique"), F.lit(0)).cast("long").alias("n_unique"),
            portable_round(
                F.col("n_unique") / F.col("n_bigrams").cast("double"), 6
            ).alias("novelty"),
        )
    )


def bigram_novelty_sql(table: str = "documents") -> str:
    novelty = portable_round_sql("n_unique / CAST(n_bigrams AS DOUBLE)", 6)
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM {table}
    ),
    doc_bigrams AS (
      SELECT DISTINCT doc_id, toks[i + 1] || ' ' || toks[i + 2] AS bg
      FROM t, unnest(range(0, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 2
    ),
    df_counts AS (SELECT bg, count(*) AS df FROM doc_bigrams GROUP BY bg),
    per_doc AS (
      SELECT d.doc_id,
             count(*) AS n_bigrams,
             SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS n_unique
      FROM doc_bigrams d JOIN df_counts f ON f.bg = d.bg
      GROUP BY d.doc_id
    )
    SELECT a.doc_id,
           CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(p.n_unique, 0) AS BIGINT) AS n_unique,
           {novelty} AS novelty
    FROM {table} a LEFT JOIN per_doc p ON p.doc_id = a.doc_id
    """


# ---------------------------------------------------------------------------
# Bigram conditional-probability LM score (t18)
# ---------------------------------------------------------------------------


def bigram_lm_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average bigram conditional probability — the bigram
    upgrade of t12's unigram commonness and the transparent stand-in for an
    LM-perplexity quality filter: P(w_i | w_{i-1}) estimated from the corpus
    itself, averaged over the doc's adjacent-token transitions.  Word-salad
    scores near 0 ppm; formulaic boilerplate scores high.

    Exactness: each distinct bigram's conditional probability is
    ``count(bigram) × 10⁶ div count(prefix-in-nonfinal-position)`` —
    INTEGER floor division — and the per-doc mean performs ONE double
    division of exact integer sums, so no float accumulates and the value
    hash cannot drift between engines (no logs, no smoothing floats).

    Scale shape: bigram extraction is a pure array projection (t15/t17's
    ``transform``, no window pass); both count tables are bounded by the
    bigram/prefix VOCABULARY, not corpus bytes; the prefix totals derive
    from the bigram counts themselves (one vocabulary-sized rollup, no
    second corpus pass); occurrences re-join the probability table on the
    bigram key — two corpus-key shuffles total."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    from spj_query_engine_spark.operators.core import barrier

    # r09 (§2.4): occ feeds the bigram-count chain AND the per-doc rollup —
    # lazily the tokenize+explode pass over the corpus ran twice.
    occ = barrier(
        docs.select(F.col(id_col), toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> struct(toks[i] AS prefix, "
                    "concat(toks[i], ' ', toks[i + 1]) AS bg))"
                )
            ).alias("p"),
        )
        .select(F.col(id_col), F.col("p.prefix").alias("prefix"), F.col("p.bg").alias("bg"))
    )
    bg_cnt = occ.groupBy("prefix", "bg").agg(F.count(F.lit(1)).alias("bg_cnt"))
    pre_cnt = bg_cnt.groupBy("prefix").agg(F.sum("bg_cnt").alias("pre_cnt"))
    ppm = (
        bg_cnt.join(pre_cnt, "prefix")
        .select("bg", F.expr("(bg_cnt * 1000000) div pre_cnt").alias("ppm"))
    )
    per_doc = (
        occ.join(ppm, "bg")
        .groupBy(id_col)
        .agg(F.sum("ppm").alias("sum_ppm"), F.count(F.lit(1)).alias("n_bg"))
    )
    score = portable_round(
        F.col("sum_ppm").cast("double") / F.col("n_bg").cast("double"), 6
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bg"), F.lit(0)).cast("long").alias("n_bigrams"),
            score.alias("lm_ppm"),
        )
    )


def bigram_lm_score_sql(table: str = "documents") -> str:
    score = portable_round_sql("CAST(sum_ppm AS DOUBLE) / CAST(n_bg AS DOUBLE)", 6)
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM {table}
    ),
    occ AS (
      SELECT doc_id, toks[i + 1] AS prefix, toks[i + 1] || ' ' || toks[i + 2] AS bg
      FROM t, unnest(range(0, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 2
    ),
    bg_cnt AS (SELECT prefix, bg, count(*) AS bg_cnt FROM occ GROUP BY 1, 2),
    pre_cnt AS (SELECT prefix, SUM(bg_cnt) AS pre_cnt FROM bg_cnt GROUP BY 1),
    ppm AS (
      SELECT bg, (bg_cnt * 1000000) // pre_cnt AS ppm
      FROM bg_cnt JOIN pre_cnt USING (prefix)
    ),
    per_doc AS (
      SELECT occ.doc_id, SUM(ppm) AS sum_ppm, count(*) AS n_bg
      FROM occ JOIN ppm USING (bg) GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_bg, 0) AS BIGINT) AS n_bigrams,
           {score} AS lm_ppm
    FROM {table} d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """


# ---------------------------------------------------------------------------
# BPE merge application (t19) — iterative tokenizer training, applied
# ---------------------------------------------------------------------------

BPE_ROUNDS = 2  # unrolled train-and-apply merge rounds


def _bpe_apply_round(t: DataFrame) -> DataFrame:
    """One BPE round over an exploded (doc_id, pos, tok) frame: find the
    globally most frequent adjacent pair, then merge its non-overlapping
    left-to-right occurrences.  The sequential "skip the next token after a
    merge" rule — the part that looks inherently imperative — is pure window
    algebra: within each maximal RUN of consecutive matching positions,
    exactly the even offsets start a merge (positions 0, 2, 4, … of the
    run), so a match flag, a run id (cumsum of run boundaries) and an
    offset-parity test reproduce greedy left-to-right merging with no
    sequential state.  Both engines replay the identical windows."""
    from pyspark.sql import Window

    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    withnxt = t.withColumn("nxt", F.lead("tok").over(wdoc))
    # top pair as a GLOBAL AGGREGATE (min of (-count, tok, nxt) struct), not
    # orderBy+limit: the aggregate always yields exactly one row, so a
    # pairless corpus produces (NULL, NULL) instead of an empty frame that
    # would annihilate the crossJoin below
    top = (
        withnxt.filter(F.col("nxt").isNotNull())
        .groupBy("tok", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.min(
                F.struct(
                    (-F.col("n")).alias("negn"),
                    F.col("tok").alias("a"),
                    F.col("nxt").alias("b"),
                )
            ).alias("s")
        )
        .select(F.col("s.a").alias("m_a"), F.col("s.b").alias("m_b"))
    )
    x = withnxt.crossJoin(F.broadcast(top))
    m = (F.col("tok") == F.col("m_a")) & (F.col("nxt") == F.col("m_b"))
    x = x.withColumn("m", F.coalesce(m, F.lit(False)))
    x = x.withColumn(
        "boundary",
        (F.col("m") & ~F.coalesce(F.lag("m").over(wdoc), F.lit(False))).cast("int"),
    )
    x = x.withColumn("run", F.sum("boundary").over(wdoc))
    wrun = Window.partitionBy("doc_id", "run")
    x = x.withColumn(
        "m_start",
        F.col("m")
        & ((F.col("pos") - F.min(F.when(F.col("m"), F.col("pos"))).over(wrun)) % 2 == 0),
    )
    x = x.withColumn(
        "skip", F.coalesce(F.lag("m_start").over(wdoc), F.lit(False))
    )
    out = x.filter(~F.col("skip")).select(
        "doc_id",
        F.when(F.col("m_start"), F.concat(F.col("tok"), F.col("nxt")))
        .otherwise(F.col("tok"))
        .alias("tok"),
        F.row_number().over(wdoc).alias("pos"),
    )
    return out


def bpe_apply(docs: DataFrame, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Iterative BPE tokenizer training APPLIED (t19): ``rounds`` cycles of
    (count adjacent pairs → pick the global top pair → merge its
    non-overlapping occurrences corpus-wide) — t15 counts the first round's
    merge candidates, this executes the loop, producing the per-document
    token stream a trained tokenizer would emit after ``rounds`` merges.

    Scale shape per round: one vocabulary-bounded pair rollup (map-side
    partial), one broadcast single-row top pair, one per-document window
    pass (shuffle on doc_id — Spark keeps the same partitioning across
    rounds so AQE elides repeats), with a lineage barrier per round.
    Output: (doc_id, n_tokens, digest) — token count and md5 of the
    space-joined merged stream, exact in both engines."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    t = (
        docs.select(F.col("doc_id"), F.posexplode(toks).alias("pos", "tok"))
    )
    for _ in range(rounds):
        t = _bpe_apply_round(t).localCheckpoint(eager=True)
    # digest from an explicitly position-sorted array (collect_list order
    # alone is nondeterministic)
    per_doc = t.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr("transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok)"),
            )
        ).alias("digest"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("digest"), F.md5(F.lit(""))).alias("digest"),
        )
    )


def bpe_apply_sql(table: str = "documents", rounds: int = BPE_ROUNDS) -> str:
    ctes = [
        f"""t0 AS MATERIALIZED (
      SELECT doc_id, i + 1 AS pos, toks[i + 1] AS tok
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
            FROM {table}), unnest(range(0, len(toks))) AS u(i)
    )"""
    ]
    prev = "t0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"""n{r} AS MATERIALIZED (
      SELECT doc_id, pos, tok,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      FROM {prev}
    ),
    top{r} AS MATERIALIZED (
      SELECT s.negn IS NOT NULL AS _has, s.a AS m_a, s.b AS m_b FROM (
        SELECT MIN({{'negn': -n, 'a': tok, 'b': nxt}}) AS s
        FROM (SELECT tok, nxt, count(*) AS n FROM n{r} WHERE nxt IS NOT NULL
              GROUP BY tok, nxt)
      )
    ),
    f{r} AS MATERIALIZED (
      SELECT doc_id, pos, tok, nxt,
             COALESCE(tok = m_a AND nxt = m_b, false) AS m
      FROM n{r} CROSS JOIN top{r}
    ),
    b{r} AS MATERIALIZED (
      SELECT *, CASE WHEN m AND NOT COALESCE(
                 lag(m) OVER (PARTITION BY doc_id ORDER BY pos), false)
                 THEN 1 ELSE 0 END AS boundary
      FROM f{r}
    ),
    g{r} AS MATERIALIZED (
      SELECT *, SUM(boundary)
             OVER (PARTITION BY doc_id ORDER BY pos) AS run
      FROM b{r}
    ),
    h{r} AS MATERIALIZED (
      SELECT *, m AND ((pos - MIN(CASE WHEN m THEN pos END)
                 OVER (PARTITION BY doc_id, run)) % 2 = 0) AS m_start
      FROM g{r}
    ),
    s{r} AS MATERIALIZED (
      SELECT *, COALESCE(lag(m_start) OVER (PARTITION BY doc_id ORDER BY pos),
                         false) AS skip
      FROM h{r}
    ),
    t{r} AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN m_start THEN tok || nxt ELSE tok END AS tok,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS pos
      FROM s{r}
      WHERE NOT skip
    )"""
        )
        prev = f"t{r}"
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"""
    , per_doc AS (
      SELECT doc_id, count(*) AS n_tokens,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS digest
      FROM {prev} GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           COALESCE(p.digest, md5('')) AS digest
    FROM {table} d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """
    )


# ---------------------------------------------------------------------------
# Readability score (t20) — Flesch-style, fully portable
# ---------------------------------------------------------------------------


def readability(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Flesch-style readability per document: 206.835 − 1.015·(words/
    sentences) − 84.6·(syllables/words), with syllables approximated by
    vowel-group counts (the standard heuristic when no dictionary is in
    the loop).  The score joins t02/t09/t12/t18 as a quality-filter
    signal — wildly high/low readability flags boilerplate and word salad.

    A pure single-pass codegen projection (three regexp_count + fixed-order
    double arithmetic, portable-rounded) — scan-speed at any corpus size;
    sentence/word counts are floored at 1 so empty docs score the formula's
    fixed point instead of dividing by zero."""
    words = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z0-9]+")), F.lit(1)
    ).cast("double")
    sentences = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("double")
    syllables = F.greatest(
        F.regexp_count(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+")), F.lit(1)
    ).cast("double")
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / words)
    )
    return docs.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        portable_round(score, 4).alias("flesch"),
    )


def readability_sql(table: str = "documents") -> str:
    words = "greatest(len(regexp_extract_all(text, '[A-Za-z0-9]+')), 1)::DOUBLE"
    sentences = "greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::DOUBLE"
    syllables = "greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)::DOUBLE"
    score = f"206.835 - 1.015 * ({words} / {sentences}) - 84.6 * ({syllables} / {words})"
    return f"""
    SELECT doc_id,
           CAST({words} AS BIGINT) AS n_words,
           CAST({sentences} AS BIGINT) AS n_sentences,
           CAST({syllables} AS BIGINT) AS n_syllables,
           {portable_round_sql(score, 4)} AS flesch
    FROM {table}
    """


# ---------------------------------------------------------------------------
# Collocation mining (t21) — integer-lift phrase discovery
# ---------------------------------------------------------------------------

COLL_MIN_N = 5  # minimum bigram support
COLL_TOP_K = 20  # collocations reported


def collocations(docs: DataFrame, text_col: str = "text", k: int = COLL_TOP_K) -> DataFrame:
    """Corpus-level COLLOCATIONS: the top-``k`` bigrams by integer lift
    ``n(w1 w2)·N·10⁶ div (n(w1)·n(w2))`` — the PMI ranking (Church & Hanks
    1990) with the log dropped (log is monotone, so the ranking is
    identical) and every term an exact BIGINT, so the result value-replays
    across engines where a floating PMI never would.  Collocation mining
    is the phrase-discovery step before tokenizer/vocab construction —
    t15 ranks raw pair frequency (BPE's statistic); lift surfaces the
    *statistically bound* phrases frequency buries.

    Shape: one token explode → unigram rollup (vocabulary-bounded), one
    pair projection → bigram rollup (pair-vocabulary-bounded), a 1-row
    total broadcast, a support filter BEFORE the ranking window.  At
    int64 limits: the numerator n_bigram·N·10⁶ must stay under 2⁶³, and
    for natural text the top bigram count is ~N/20, so overflow hits
    around N ≈ 10⁸–10⁹ tokens (with ANSI off Spark would wrap silently
    and corrupt the ranking) — swap the lift to DECIMAL(38,0) beyond
    that; the plan shape is unchanged."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    base = docs.select(toks.alias("toks"))
    uni = (
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    total = uni.agg(F.sum("n_w").alias("n_total"))
    big = (
        base.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_big"))
        .filter(F.col("n_big") >= COLL_MIN_N)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    # BIGINT div, never double /: the numerator tops 2^53 long before the
    # int64 limit, so a float division would floor to the wrong integer
    lift = F.expr("(n_big * n_total * 1000000) div (n_w1 * n_w2)")
    scored = (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "n_big", lift.cast("long").alias("lift_ppm"))
    )
    # two-phase top-k (s01's pattern): a global ORDER BY window would move
    # the whole scored pair vocabulary to ONE partition; phase 1 ranks
    # within a hash salt, phase 2 ranks only the <= n_salt*k survivors
    n_salt = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    order = [F.desc("lift_ppm"), F.asc("w1"), F.asc("w2")]
    w1s = Window.partitionBy("salt").orderBy(*order)
    partial = (
        scored.withColumn("salt", F.pmod(F.crc32(F.concat_ws(" ", "w1", "w2")), F.lit(n_salt)))
        .withColumn("r1", F.row_number().over(w1s))
        .filter(F.col("r1") <= k)
    )
    w = Window.orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("w1", "w2", "n_big", "lift_ppm", F.col("rank").cast("long").alias("rank"))
    )


def collocations_sql(table: str = "documents", k: int = COLL_TOP_K) -> str:
    return f"""
    WITH t AS (
      SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM {table}
    ),
    uni AS (
      SELECT unnest(toks) AS w FROM t
    ),
    unic AS (SELECT w, count(*) AS n_w FROM uni GROUP BY w),
    total AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_total FROM unic),
    big AS (
      SELECT toks[i + 1] AS w1, toks[i + 2] AS w2
      FROM t, unnest(range(0, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 2
    ),
    bigc AS (
      SELECT w1, w2, count(*) AS n_big FROM big GROUP BY 1, 2
      HAVING count(*) >= {COLL_MIN_N}
    ),
    scored AS (
      SELECT b.w1, b.w2, CAST(b.n_big AS BIGINT) AS n_big,
             CAST((b.n_big * total.n_total * 1000000) // (u1.n_w * u2.n_w) AS BIGINT)
               AS lift_ppm
      FROM bigc b
      JOIN unic u1 ON u1.w = b.w1
      JOIN unic u2 ON u2.w = b.w2, total
    )
    SELECT w1, w2, n_big, lift_ppm, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (ORDER BY lift_ppm DESC, w1 ASC, w2 ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Vocabulary power-law profile (t22) — the Zipf histogram behind vocab sizing
# ---------------------------------------------------------------------------


def vocab_power_law(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """VOCABULARY POWER-LAW profile: bucket every word by
    ``floor(log2(frequency))`` and report words/occurrences per bucket —
    the rank-frequency (Zipf) histogram that sizes tokenizer vocabularies
    and coverage targets (how many singleton/doubleton words a vocab cut
    strands, what share of tokens the head buckets carry).  t14 reports
    the scalar vocab stats; this is the full distribution they summarize.

    Exactness: the bucket is ``length(bin(freq)) - 1`` — the binary
    bit-length, a pure integer/string op identical in both engines — so
    no floating log can misplace a power-of-two boundary word.  Scale
    shape: one token explode → vocabulary-bounded frequency rollup (the
    t12/t14 anatomy), then a ~40-row bucket rollup; nothing after the
    first aggregate touches corpus-sized data."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    freq = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        freq.select(
            (F.length(F.bin(F.col("freq"))) - 1).cast("long").alias("freq_bucket"),
            "freq",
        )
        .groupBy("freq_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("freq").cast("long").alias("n_tokens"),
        )
    )


def vocab_power_law_sql(table: str = "documents") -> str:
    return f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS w
      FROM {table}
    ),
    freq AS (SELECT w, count(*) AS freq FROM toks GROUP BY w)
    SELECT CAST(length(bin(freq)) - 1 AS BIGINT) AS freq_bucket,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(freq) AS BIGINT) AS n_tokens
    FROM freq GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (t23) — token mass vs vocab-size cut
# ---------------------------------------------------------------------------

COVERAGE_SWEEP = (10, 100, 1_000, 10_000)  # candidate vocabulary sizes


def vocab_coverage_curve(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """VOCABULARY COVERAGE curve: for each candidate vocab size N, the
    share of corpus token mass covered by the N most frequent words — the
    curve that picks a tokenizer's vocab size (t22 shows the shape of the
    distribution; this answers "how big must the vocab be for 99%
    coverage").  Rank ties break on the word itself so both engines cut
    identically.

    Shape: one token explode → vocabulary-bounded frequency rollup, ONE
    rank window over the vocabulary (never the corpus), then the sweep is
    conditional sums — N candidates never multiply vocabulary rows.
    coverage_ppm is integer ((covered·10⁶) div total)."""
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    freq = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = freq.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("w")))
    )
    agg = ranked.agg(
        F.sum("freq").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        *[
            F.sum(F.when(F.col("rnk") <= n, F.col("freq")).otherwise(0)).alias(
                f"cov_{n}"
            )
            for n in COVERAGE_SWEEP
        ],
    )
    stacked = agg.filter(
        # an empty corpus: the global aggregate still emits its one row
        # (total NULL), but the oracle's GROUP BY over zero rows emits none
        F.col("total_tokens").isNotNull()
    ).select(
        "total_tokens",
        "vocab_size",
        F.expr(
            "stack(%d, %s) AS (cut, covered)"
            % (
                len(COVERAGE_SWEEP),
                ", ".join(f"{n}L, cov_{n}" for n in COVERAGE_SWEEP),
            )
        ),
    )
    return stacked.select(
        F.col("cut").alias("vocab_cut"),
        F.least(F.col("cut"), F.col("vocab_size")).cast("long").alias("n_words"),
        F.col("covered").cast("long").alias("tokens_covered"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.expr("(covered * 1000000) div total_tokens").cast("long").alias(
            "coverage_ppm"
        ),
    )


def vocab_coverage_curve_sql(table: str = "documents") -> str:
    cuts = ", ".join(f"({n})" for n in COVERAGE_SWEEP)
    return f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '')) AS w
      FROM {table}
    ),
    freq AS (SELECT w, count(*) AS freq FROM toks GROUP BY w),
    ranked AS (
      SELECT freq, row_number() OVER (ORDER BY freq DESC, w ASC) AS rnk
      FROM freq
    )
    SELECT c.cut::BIGINT AS vocab_cut,
           CAST(least(c.cut, count(*)) AS BIGINT) AS n_words,
           CAST(sum(CASE WHEN rnk <= c.cut THEN freq ELSE 0 END) AS BIGINT)
             AS tokens_covered,
           CAST(sum(freq) AS BIGINT) AS total_tokens,
           CAST((sum(CASE WHEN rnk <= c.cut THEN freq ELSE 0 END) * 1000000)
                // sum(freq) AS BIGINT) AS coverage_ppm
    FROM ranked, (VALUES {cuts}) AS c(cut)
    GROUP BY c.cut
    """


# ---------------------------------------------------------------------------
# Heaps'-law curve (t24) — vocabulary growth along the corpus
# ---------------------------------------------------------------------------

HEAPS_SWEEP = (1_000, 10_000, 100_000, 1_000_000)  # token-prefix cuts


def heaps_curve(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """HEAPS'-LAW curve: distinct-word count within the first N tokens of
    the corpus (deterministic doc_id order) for each N — the vocabulary
    GROWTH measurement that completes the tokenizer-diagnostics trio (t22
    shows the frequency distribution, t23 the coverage of a cut, this how
    fast new words keep arriving: V(N) ≈ K·N^β, β≈0.5 for natural text;
    a flat curve means the corpus has exhausted its domain, a linear one
    screams unnormalized noise/IDs).

    Exactness: a token's GLOBAL position is its doc's running token total
    plus its offset — one vocabulary-bounded per-doc count, one ordered
    cumulative window over DOCS (not tokens), then each word's first
    occurrence is a min over its global positions; the sweep is
    conditional sums over the word table.  Nothing orders corpus-wide
    token rows: the only global window runs over per-doc rows (range-sort
    at 100 TB, p16's documented form)."""
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    base = docs.select(F.col("doc_id"), toks.alias("toks"))
    counts = base.select("doc_id", F.size("toks").alias("n_toks"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "base_pos", F.coalesce(F.sum("n_toks").over(w), F.lit(0))
    ).select("doc_id", "base_pos")
    exploded = (
        base.join(offsets, "doc_id")
        .select(
            "base_pos", F.posexplode("toks").alias("off", "w")
        )
        .select((F.col("base_pos") + F.col("off") + 1).alias("gpos"), "w")
    )
    firsts = exploded.groupBy("w").agg(F.min("gpos").alias("first_pos"))
    agg = firsts.agg(
        F.count(F.lit(1)).alias("vocab_total"),
        *[
            F.sum(F.when(F.col("first_pos") <= n, 1).otherwise(0)).alias(f"v_{n}")
            for n in HEAPS_SWEEP
        ],
        # count(*) over an empty word table is 0, not NULL — the filter must
        # drop that row to match the oracle's empty cross join (t23's lesson)
    ).filter(F.col("vocab_total") > 0)
    return agg.select(
        F.expr(
            "stack(%d, %s) AS (prefix_tokens, vocab_size)"
            % (
                len(HEAPS_SWEEP),
                ", ".join(f"{n}L, v_{n}" for n in HEAPS_SWEEP),
            )
        ),
        F.col("vocab_total").cast("long").alias("vocab_total"),
    ).select(
        "prefix_tokens",
        F.col("vocab_size").cast("long").alias("vocab_size"),
        "vocab_total",
    )


def heaps_curve_sql(table: str = "documents") -> str:
    cuts = ", ".join(f"({n})" for n in HEAPS_SWEEP)
    return f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM {table}
    ),
    counts AS (SELECT doc_id, len(toks) AS n_toks FROM base),
    offsets AS (
      SELECT doc_id,
             COALESCE(sum(n_toks) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base_pos
      FROM counts
    ),
    exploded AS (
      SELECT o.base_pos + u.off + 1 AS gpos, b.toks[u.off + 1] AS w
      FROM base b JOIN offsets o USING (doc_id),
           unnest(range(0, len(b.toks))) AS u(off)
    ),
    firsts AS (SELECT w, min(gpos) AS first_pos FROM exploded GROUP BY w)
    SELECT c.cut::BIGINT AS prefix_tokens,
           CAST(sum(CASE WHEN first_pos <= c.cut THEN 1 ELSE 0 END) AS BIGINT)
             AS vocab_size,
           CAST(count(*) AS BIGINT) AS vocab_total
    FROM firsts, (VALUES {cuts}) AS c(cut)
    GROUP BY c.cut
    """


# ---------------------------------------------------------------------------
# Encoding-artifact audit (t25) and context-length truncation loss (t26)

CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
# UTF-8 multibyte bytes decoded as Latin-1: U+00C3 then a continuation char
MOJIBAKE_RE = "\u00c3[\u0080-\u00bf]"
REPLACEMENT_CH = "\ufffd"
NONASCII_RE = r"[^\x01-\x7F]"
TRUNC_SWEEP = (128, 512, 2048)


def encoding_audit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source encoding-artifact audit: documents containing U+FFFD
    replacement characters, C0 control characters, any non-ASCII at all,
    and the classic mojibake signature (UTF-8 multibyte sequences decoded
    as Latin-1: U+00C3 followed by a continuation char).  The corpus-intake
    screen every crawl pipeline runs before tokenization - replacement
    chars mean upstream decode loss, mojibake means a double-decode bug,
    and both poison a tokenizer's vocabulary.

    Pure regexp projections + one rollup on ``source`` (map-side combined):
    zero Python, zero extra shuffle beyond the tiny group key.  The regex
    classes are shared RE2/Java syntax so both engines test the identical
    predicate; NULL text counts in n_docs but matches nothing.  U+FFFD and
    the mojibake signature are non-ASCII by definition, so those two scans
    are short-circuited behind the cheap non-ASCII test — a clean-ASCII
    doc (the bulk of a healthy corpus) pays two regex passes, not four."""

    def has(pattern: str) -> Column:
        return F.when(F.col(text_col).rlike(pattern), 1).otherwise(0)

    na = has(NONASCII_RE)
    base = docs.select(
        "source",
        na.alias("na"),
        F.col(text_col).alias("_t"),
    )

    def gated(pattern: str) -> Column:
        return F.when(
            (F.col("na") == 1) & F.col("_t").rlike(pattern), 1
        ).otherwise(0)

    counts = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(gated(REPLACEMENT_CH)).alias("n_replacement"),
        F.sum(
            F.when(F.col("_t").rlike(CTRL_RE), 1).otherwise(0)
        ).alias("n_control"),
        F.sum(F.col("na")).alias("n_nonascii"),
        F.sum(gated(MOJIBAKE_RE)).alias("n_mojibake"),
    )
    return counts.select(
        "source",
        "n_docs",
        "n_replacement",
        "n_control",
        "n_nonascii",
        "n_mojibake",
        F.expr("(n_replacement * 1000000) div n_docs").alias("replacement_ppm"),
        F.expr("(n_mojibake * 1000000) div n_docs").alias("mojibake_ppm"),
    )


def encoding_audit_sql(table: str = "documents") -> str:
    def has(pattern: str) -> str:
        return (
            f"sum(CASE WHEN text IS NOT NULL AND "
            f"regexp_matches(text, '{pattern}') THEN 1 ELSE 0 END)"
        )

    return f"""
    WITH counts AS (
      SELECT source,
             count(*) AS n_docs,
             CAST({has(REPLACEMENT_CH)} AS BIGINT) AS n_replacement,
             CAST({has(CTRL_RE)} AS BIGINT) AS n_control,
             CAST({has(NONASCII_RE)} AS BIGINT) AS n_nonascii,
             CAST({has(MOJIBAKE_RE)} AS BIGINT) AS n_mojibake
      FROM {table}
      GROUP BY source
    )
    SELECT source, n_docs, n_replacement, n_control, n_nonascii, n_mojibake,
           (n_replacement * 1000000) // n_docs AS replacement_ppm,
           (n_mojibake * 1000000) // n_docs AS mojibake_ppm
    FROM counts
    """


def truncation_loss(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Context-length truncation loss: for each candidate context length L
    in ``TRUNC_SWEEP``, how many documents exceed L whitespace tokens and
    what share of the corpus token mass (ppm) falls beyond position L -
    the measurement that picks a training sequence length (pairs with
    t23's vocabulary-coverage curve; p05 then packs to the chosen L).

    One corpus pass computes per-doc token counts; the sweep is
    conditional sums in a single global aggregate - candidates never
    multiply document rows.  All integer; the empty corpus yields zero
    rows (total-mass filter) rather than a divide-by-NULL row."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    counts = docs.select(F.size(toks).alias("n_toks"))
    agg = counts.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        *[
            F.sum(F.when(F.col("n_toks") > n, 1).otherwise(0)).alias(f"over_{n}")
            for n in TRUNC_SWEEP
        ],
        *[
            F.sum(F.greatest(F.col("n_toks") - n, F.lit(0))).alias(f"lost_{n}")
            for n in TRUNC_SWEEP
        ],
    ).filter(F.coalesce(F.col("total_tokens"), F.lit(0)) > 0)
    return agg.select(
        F.expr(
            "stack(%d, %s) AS (ctx_len, docs_over, tokens_lost)"
            % (
                len(TRUNC_SWEEP),
                ", ".join(f"{n}L, over_{n}, lost_{n}" for n in TRUNC_SWEEP),
            )
        ),
        F.col("total_tokens").cast("long").alias("total_tokens"),
    ).select(
        "ctx_len",
        F.col("docs_over").cast("long").alias("docs_over"),
        F.col("tokens_lost").cast("long").alias("tokens_lost"),
        "total_tokens",
        F.expr("(tokens_lost * 1000000) div total_tokens").alias("lost_ppm"),
    )


def truncation_loss_sql(table: str = "documents") -> str:
    cuts = ", ".join(f"({n})" for n in TRUNC_SWEEP)
    return f"""
    WITH counts AS (
      SELECT len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '')) AS n_toks
      FROM {table}
    ),
    agg AS (
      SELECT count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS total_tokens
      FROM counts
    )
    SELECT c.cut::BIGINT AS ctx_len,
           CAST(sum(CASE WHEN n_toks > c.cut THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_over,
           CAST(sum(greatest(n_toks - c.cut, 0)) AS BIGINT) AS tokens_lost,
           CAST(max(a.total_tokens) AS BIGINT) AS total_tokens,
           (CAST(sum(greatest(n_toks - c.cut, 0)) AS BIGINT) * 1000000)
             // max(a.total_tokens) AS lost_ppm
    FROM counts, agg a, (VALUES {cuts}) AS c(cut)
    WHERE a.total_tokens > 0
    GROUP BY c.cut
    """


# ---------------------------------------------------------------------------
# Per-document keyphrases by corpus lift (t27)

KEYPHRASE_K = 3
KEYPHRASE_MIN_SUPPORT = 3


def doc_keyphrases(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = KEYPHRASE_K
) -> DataFrame:
    """Per-document keyphrases: each doc's top-``k`` bigrams ranked by the
    CORPUS lift table (t21's integer PMI ranking, per-doc instead of
    corpus-global) - the cheap extractive tagger behind search facets and
    data-card topic summaries: a bigram is a good doc keyphrase when it
    is statistically bound corpus-wide AND present in the doc.  Support
    filter >= %d keeps one-off typos out of the phrase vocabulary.

    Shape: the lift table is vocabulary-bounded (t21's two rollups + one
    scalar total); doc bigrams re-join it on the bigram key (one
    corpus-key shuffle) and the top-k window partitions per doc - no
    corpus-global ordering anywhere.  DISTINCT doc-bigrams before the
    join: a phrase repeated in one doc ranks once.""" % KEYPHRASE_MIN_SUPPORT
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    from spj_query_engine_spark.operators.core import barrier

    base = docs.select(F.col(id_col), toks.alias("toks"))
    # r09 (§2.4): `uni` feeds the two lift joins AND the corpus total, and
    # `doc_bg` feeds the bigram rollup AND the final per-doc join — lazily
    # that was FIVE tokenize+explode passes over the corpus.  Materialize
    # the vocabulary-bounded unigram rollup and the distinct doc-bigram
    # postings once each → two passes.
    uni = barrier(
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    total = uni.agg(F.sum("n_w").alias("n_total")).filter(F.col("n_total") > 0)
    doc_bg = barrier(
        base.filter(F.size("toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                )
            ).alias("p"),
        )
        .select(F.col(id_col), F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .distinct()
    )
    bgc = doc_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_docs_bg"))
    lift = (
        bgc.filter(F.col("n_docs_bg") >= KEYPHRASE_MIN_SUPPORT)
        .join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.expr("(n_docs_bg * n_total * 1000000) div (n_w1 * n_w2)").alias(
                "lift_ppm"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("lift_ppm"), F.asc("w1"), F.asc("w2")
    )
    return (
        doc_bg.join(lift, ["w1", "w2"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("rank").cast("long").alias("rank"),
            F.concat_ws(" ", "w1", "w2").alias("phrase"),
            "lift_ppm",
        )
    )


def doc_keyphrases_sql(table: str = "documents", k: int = KEYPHRASE_K) -> str:
    return f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM {table}
    ),
    uni AS (
      SELECT w, count(*) AS n_w
      FROM (SELECT unnest(toks) AS w FROM base) GROUP BY w
    ),
    total AS (
      SELECT CAST(sum(n_w) AS BIGINT) AS n_total FROM uni HAVING sum(n_w) > 0
    ),
    doc_bg AS (
      SELECT DISTINCT doc_id, toks[i + 1] AS w1, toks[i + 2] AS w2
      FROM base, unnest(range(0, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 2
    ),
    bgc AS (
      SELECT w1, w2, count(*) AS n_docs_bg FROM doc_bg GROUP BY w1, w2
      HAVING count(*) >= {KEYPHRASE_MIN_SUPPORT}
    ),
    lift AS (
      SELECT b.w1, b.w2,
             (b.n_docs_bg * t.n_total * 1000000) // (u1.n_w * u2.n_w) AS lift_ppm
      FROM bgc b
      JOIN uni u1 ON u1.w = b.w1
      JOIN uni u2 ON u2.w = b.w2
      CROSS JOIN total t
    )
    SELECT doc_id, rank::BIGINT AS rank, w1 || ' ' || w2 AS phrase, lift_ppm
    FROM (
      SELECT d.doc_id, l.w1, l.w2, l.lift_ppm,
             row_number() OVER (PARTITION BY d.doc_id
                                ORDER BY l.lift_ppm DESC, l.w1, l.w2) AS rank
      FROM doc_bg d JOIN lift l USING (w1, w2)
    )
    WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Per-source lexical divergence (t28)


def source_divergence(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source lexical divergence: the total-variation distance (ppm)
    between each source's unigram distribution and the corpus-wide one,
    plus vocabulary size and coverage - the mixture-diversity measurement
    behind source weighting (two sources at TV ~ 0 are redundant; a
    source at high TV is the one bringing new text, and dropping it
    changes the model).  TV = sum |p_src - p_corpus| / 2 runs entirely on
    ppm FLOORS of exact counts, so the statistic value-replays where a
    float KL/JS (logs) never would.

    One token explode -> (source, word) rollup; corpus totals derive from
    the same table (no second pass); the TV sum is a vocabulary-bounded
    rollup joined per source.  A word absent from a source contributes
    its corpus ppm - the full-outer semantics fall out of summing
    |p_s - p_c| over the UNION vocabulary: present words join, absent
    words add p_c, handled by summing p_c over joined words and
    complementing against 1e6."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    occ = docs.select("source", F.explode(toks).alias("w"))
    src_w = occ.groupBy("source", "w").agg(F.count(F.lit(1)).alias("n_sw"))
    src_tot = src_w.groupBy("source").agg(F.sum("n_sw").alias("n_s"))
    corp_w = src_w.groupBy("w").agg(F.sum("n_sw").alias("n_cw"))
    corp_tot = corp_w.agg(F.sum("n_cw").alias("n_c")).filter(F.col("n_c") > 0)
    joined = (
        src_w.join(src_tot, "source")
        .join(corp_w, "w")
        .crossJoin(F.broadcast(corp_tot))
        .select(
            "source",
            F.expr("(n_sw * 1000000) div n_s").alias("p_s"),
            F.expr("(n_cw * 1000000) div n_c").alias("p_c"),
        )
    )
    # TV*2 = sum over union vocab of |p_s - p_c|
    #      = sum over source vocab |p_s - p_c| + sum over absent words p_c
    # and sum over absent words p_c = (1e6-ish) - sum over present words p_c
    per_src = joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab_used"),
        F.sum(F.expr("abs(p_s - p_c)")).alias("present_abs"),
        F.sum("p_c").alias("present_pc"),
    )
    return per_src.select(
        "source",
        "vocab_used",
        F.expr(
            "(present_abs + (1000000 - least(present_pc, 1000000))) div 2"
        ).cast("long").alias("tv_ppm"),
        F.expr("least(present_pc, 1000000)").cast("long").alias("coverage_ppm"),
    )


def source_divergence_sql(table: str = "documents") -> str:
    return f"""
    WITH occ AS (
      SELECT source, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS w
      FROM {table}
    ),
    src_w AS (SELECT source, w, count(*) AS n_sw FROM occ GROUP BY 1, 2),
    src_tot AS (SELECT source, CAST(sum(n_sw) AS BIGINT) AS n_s FROM src_w GROUP BY 1),
    corp_w AS (SELECT w, CAST(sum(n_sw) AS BIGINT) AS n_cw FROM src_w GROUP BY 1),
    corp_tot AS (
      SELECT CAST(sum(n_cw) AS BIGINT) AS n_c FROM corp_w HAVING sum(n_cw) > 0
    ),
    joined AS (
      SELECT s.source,
             (s.n_sw * 1000000) // t.n_s AS p_s,
             (c.n_cw * 1000000) // ct.n_c AS p_c
      FROM src_w s
      JOIN src_tot t USING (source)
      JOIN corp_w c USING (w)
      CROSS JOIN corp_tot ct
    ),
    per_src AS (
      SELECT source, count(*) AS vocab_used,
             CAST(sum(abs(p_s - p_c)) AS BIGINT) AS present_abs,
             CAST(sum(p_c) AS BIGINT) AS present_pc
      FROM joined GROUP BY source
    )
    SELECT source, vocab_used,
           CAST((present_abs + (1000000 - least(present_pc, 1000000))) // 2
                AS BIGINT) AS tv_ppm,
           CAST(least(present_pc, 1000000) AS BIGINT) AS coverage_ppm
    FROM per_src
    """


# ---------------------------------------------------------------------------
# Hashed bag-of-n-grams linear classifier (t30)
# ---------------------------------------------------------------------------

#: hashing-trick feature table size (fastText's -bucket, scaled down so the
#: sf0.01 corpus exercises real collisions) and the integer weight range.
HC_BUCKETS = 4096
HC_WRANGE = 1000


def hashed_classifier_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model-based quality filtering, the fastText linear-classifier shape
    (Joulin et al. 2016, "Bag of Tricks for Efficient Text Classification")
    used by the GPT-3/LLaMA-style CommonCrawl quality filters: features are
    the BAG of unigrams + adjacent bigrams, the hashing trick maps each
    feature to one of ``HC_BUCKETS`` weight slots, and the doc score is the
    sum of slot weights.  Weights here are a deterministic pseudo-model —
    slot b holds ``(h32('w' || b) mod (2·HC_WRANGE+1)) − HC_WRANGE`` — so the
    arithmetic is all-integer and the DuckDB oracle replays it exactly; a
    real pipeline would broadcast trained weights into the same plan.

    Scale shape: tokenize + feature-hash + weight lookup is one codegen'd
    projection (the weight is ARITHMETIC on the bucket id, no lookup join),
    then ONE groupBy on doc_id with map-side partial sums.  Output is
    O(docs); nothing shuffles corpus bytes except the feature rows, which a
    broadcast weight table would not change.  mean_w is a single IEEE
    division of two exact integers, identical in both engines."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    feats = (
        docs.select(F.col(id_col), toks.alias("toks"))
        .select(
            F.col(id_col),
            F.explode(
                F.concat(
                    F.col("toks"),
                    # guard: sequence(0, n) DESCENDS for n < 0, so docs with
                    # fewer than 2 tokens must short-circuit to [] explicitly
                    F.expr(
                        "CASE WHEN size(toks) >= 2 THEN "
                        "transform(sequence(0, size(toks) - 2), "
                        "i -> concat(toks[i], ' ', toks[i + 1])) "
                        "ELSE CAST(array() AS array<string>) END"
                    ),
                )
            ).alias("feat"),
        )
    )
    bucket = h32(F.col("feat")) % HC_BUCKETS
    weight = (
        h32(F.concat(F.lit("w"), bucket.cast("string"))) % (2 * HC_WRANGE + 1)
    ) - HC_WRANGE
    per_doc = (
        feats.select(F.col(id_col), weight.alias("w"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_feats"), F.sum("w").alias("score"))
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"),
            F.when(F.col("n_feats").isNull(), "empty")
            .when(F.col("score") >= 0, "keep")
            .otherwise("drop")
            .alias("label"),
            portable_round(
                F.col("score") / F.col("n_feats").cast("double"), 6
            ).alias("mean_w"),
        )
    )


def hashed_classifier_score_sql(table: str = "documents") -> str:
    nb = 2 * HC_WRANGE + 1
    bucket = f"({h32_sql('feat')} % {HC_BUCKETS})"
    w_expr = h32_sql(f"'w' || {bucket}")
    mean_w = portable_round_sql("score / CAST(n_feats AS DOUBLE)", 6)
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM {table}
    ),
    feats AS (
      SELECT doc_id,
             unnest(toks || list_transform(range(0, len(toks) - 1),
                                           i -> toks[i + 1] || ' ' || toks[i + 2])) AS feat
      FROM t
    ),
    weighted AS (
      SELECT doc_id, ({w_expr} % {nb}) - {HC_WRANGE} AS w FROM feats
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS n_feats, sum(w) AS score
      FROM weighted GROUP BY doc_id
    )
    SELECT a.doc_id,
           CAST(COALESCE(p.n_feats, 0) AS BIGINT) AS n_feats,
           CAST(COALESCE(p.score, 0) AS BIGINT) AS score,
           CASE WHEN p.n_feats IS NULL THEN 'empty'
                WHEN p.score >= 0 THEN 'keep' ELSE 'drop' END AS label,
           {mean_w} AS mean_w
    FROM {table} a LEFT JOIN per_doc p ON p.doc_id = a.doc_id
    """




# ---------------------------------------------------------------------------
# BPE tokenizer TRAINING on the word histogram (t31) — the learned merges
# ---------------------------------------------------------------------------

#: character-merge rounds learned by bpe_train_hist
BPE_TRAIN_ROUNDS = 5

#: nested replace passes per merge round.  SQL replace() is a single
#: left-to-right non-overlapping pass, and consecutive occurrences share
#: the delimiting space (' a b a b ' matches once per pass), so one pass
#: under-merges runs; nesting approximates the greedy fixed point.  Parity
#: does NOT depend on full convergence: both engines apply the IDENTICAL
#: nested function, so the learned merges match bit-for-bit regardless.
BPE_REPLACE_PASSES = 6


def bpe_train_hist(docs: DataFrame, rounds: int = BPE_TRAIN_ROUNDS) -> DataFrame:
    """Classical (character-level) BPE tokenizer TRAINING, formulated the
    way a 100 TB trainer must be: the corpus is touched ONCE — a word
    histogram aggregation (one shuffle, map-side partial counts) — and all
    ``rounds`` merge iterations then run over the DISTINCT-WORD table
    weighted by count, whose size is the vocabulary, not the corpus
    (Sennrich et al. 2016's released trainer and every production BPE
    trainer use this reduction; contrast t19, which replays merges over
    the full token stream and pays corpus-scale work per round).

    Per round: adjacent-pair counts from the space-joined character
    strings (explode of zipped array slices — codegen, no Python), the
    globally best pair as a STRUCT-MIN aggregate over (-count, a, b) —
    exactly one row, highest count with lexicographic tie-break, the same
    total order in both engines — broadcast back, and a nested
    ``replace`` merge of its occurrences in every vocabulary word.
    Returns the learned merge table: (rnd, tok_a, tok_b, pair_count) —
    ``rounds`` rows, pair_count being the pre-merge weighted occurrence
    count (the standard BPE statistic, counting overlaps).

    Reference scope note: the reference engine has no tokenizer surface
    (SURVEY.md §1.2); this extends the t15/t19 BPE family with the
    training-efficiency formulation an LLM-data pipeline deploys."""
    words = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z]+"),
                    lambda x: x != F.lit(""),
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = words.select(
        F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")).alias("s"),
        F.col("wc").cast("long").alias("wc"),
    ).localCheckpoint(eager=True)

    merge_rows = []
    for r in range(1, rounds + 1):
        toks = F.split(F.col("s"), " ")
        pairs = vocab.select(
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, F.size(toks) - 1).alias("a"),
                    F.slice(toks, 2, F.size(toks) - 1).alias("b"),
                )
            ).alias("p"),
            "wc",
        ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "wc")
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("wc").alias("n"))
            .agg(
                F.min(
                    F.struct(
                        (-F.col("n")).alias("negn"),
                        F.col("a").alias("a"),
                        F.col("b").alias("b"),
                    )
                ).alias("t")
            )
            .select(
                F.col("t.a").alias("m_a"),
                F.col("t.b").alias("m_b"),
                (-F.col("t.negn")).cast("long").alias("m_n"),
            )
            # `best` feeds BOTH the merge table and the crossJoin that
            # rewrites the vocabulary — without its own barrier the
            # vocabulary-scale pair aggregation executes twice per round
            # (once via vocab's checkpoint, again when the final merge_rows
            # union evaluates).  One row; the checkpoint is ~free.
            .localCheckpoint(eager=True)
        )
        merge_rows.append(
            best.select(
                F.lit(r).alias("rnd"),
                F.col("m_a").alias("tok_a"),
                F.col("m_b").alias("tok_b"),
                F.col("m_n").alias("pair_count"),
            )
        )
        pat = F.concat(F.lit(" "), F.col("m_a"), F.lit(" "), F.col("m_b"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("m_a"), F.col("m_b"), F.lit(" "))
        merged = F.concat(F.lit(" "), F.col("s"), F.lit(" "))
        for _ in range(BPE_REPLACE_PASSES):
            merged = F.replace(merged, pat, rep)
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select(
                F.when(F.col("m_a").isNull(), F.col("s"))
                .otherwise(F.trim(merged))
                .alias("s"),
                "wc",
            )
            .localCheckpoint(eager=True)
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out.filter(F.col("tok_a").isNotNull())


def bpe_train_hist_sql(
    table: str = "documents", rounds: int = BPE_TRAIN_ROUNDS
) -> str:
    ctes = [
        f"""w0 AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  x -> x <> '')) AS w
        FROM {table})
      GROUP BY w
    ),
    v0 AS MATERIALIZED (
      SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s, wc FROM w0
    )"""
    ]
    selects = []
    for r in range(1, rounds + 1):
        merged = "' ' || s || ' '"
        for _ in range(BPE_REPLACE_PASSES):
            merged = (
                f"replace({merged}, ' ' || m_a || ' ' || m_b || ' ',"
                f" ' ' || m_a || m_b || ' ')"
            )
        ctes.append(
            f"""p{r} AS MATERIALIZED (
      SELECT toks[i + 1] AS a, toks[i + 2] AS b, wc
      FROM (SELECT string_split(s, ' ') AS toks, wc FROM v{r - 1}),
           unnest(range(0, len(toks) - 1)) AS u(i)
    ),
    t{r} AS MATERIALIZED (
      SELECT t.a AS m_a, t.b AS m_b, CAST(-t.negn AS BIGINT) AS m_n FROM (
        SELECT MIN({{'negn': -n, 'a': a, 'b': b}}) AS t
        FROM (SELECT a, b, CAST(SUM(wc) AS BIGINT) AS n FROM p{r} GROUP BY a, b)
      )
    ),
    v{r} AS MATERIALIZED (
      SELECT CASE WHEN m_a IS NULL THEN s ELSE trim({merged}) END AS s, wc
      FROM v{r - 1} CROSS JOIN t{r}
    )"""
        )
        selects.append(
            f"SELECT {r} AS rnd, m_a AS tok_a, m_b AS tok_b, m_n AS pair_count FROM t{r}"
        )
    union = "\n      UNION ALL ".join(selects)
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT * FROM ({union}) WHERE tok_a IS NOT NULL"
    )

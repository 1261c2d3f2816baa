"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference capability (BASELINE.json north star).  Five dedup families,
each expressed Spark-first (JVM expressions + shuffle-conscious joins; no
Python in the hot path) with a DuckDB oracle twin generated from the SAME
constants so the driver's value-hash gate verifies them exactly:

* exact        — hash-groupBy on md5(text); shuffles 16-byte keys, not bodies.
* MinHash+LSH  — shingle → minhash signature → banded bucket join → verified
                 Jaccard.  The classic near-dup pipeline (Broder 1997;
                 Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch.3).
* SimHash      — 60-bit hyperplane-free fingerprint (Charikar 2002), banded
                 join + Hamming verify.
* n-gram Jaccard — direct shingle-inverted-index join with a document-
                 frequency cap (stop-shingle pruning).
* embedding cosine — blocked brute-force within a coarse partition key.

100 TB scale notes (these shapes are what survive 1000 executors):

* Signatures/fingerprints are per-row projections — embarrassingly parallel.
* All candidate generation is equi-join on short keys (band hash / shingle
  hash / block id), never a cross product.  Catalyst shuffles both sides on
  the key; AQE splits skewed buckets.
* Hot buckets (boilerplate shingles, empty-text signatures) are the classic
  skew source — the DF cap drops shingles shared by > MAX_DF docs, exactly
  the "stop-shingle" trick production pipelines use.
* Pair verification joins signatures back by doc id — a narrow shuffle of
  (id, sig) pairs, not document bodies.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spj_query_engine_spark.functions.hashing import (
    MERSENNE61,
    h32,
    h32_sql,
    minhash_params,
    minhash_perm,
    minhash_perm_sql,
    portable_round,
    portable_round_sql,
)

# shared constants — inlined into BOTH engines
SHINGLE_N = 3  # word shingles
MINHASH_K = 12  # signature length
LSH_BANDS = 6  # 6 bands × 2 rows
LSH_ROWS = 2
JACCARD_T = 0.2  # verify threshold for minhash/ngram pairs
NGRAM_MAX_DF = 20  # stop-shingle cap for the inverted-index join
SIMHASH_BITS = 60
SIMHASH_BANDS = 4  # 4 bands × 15 bits
SIMHASH_MAX_HAMMING = 10
COSINE_T = 0.4  # embedding near-dup threshold

_MINHASH_AB = minhash_params(MINHASH_K, seed=42)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups keyed by md5(text).  Shuffle key = 32-hex
    digest, so the exchange carries ~40 B/row regardless of document size —
    the reason to hash before grouping at 100 TB."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_sql(table: str = "documents") -> str:
    return f"""
    SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM {table} GROUP BY md5(text)
    """


# ---------------------------------------------------------------------------
# shingles (shared by minhash + ngram jaccard)
# ---------------------------------------------------------------------------


def shingle_hashes(text: Column) -> Column:
    """Distinct uint32 hashes of word SHINGLE_N-grams (JVM higher-order
    functions only).  Docs shorter than SHINGLE_N words → empty array."""
    words = F.split(text, r"\s+")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), n - SHINGLE_N),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + j + 1) for j in range(SHINGLE_N)]
        ),
    )
    grams = F.when(n >= SHINGLE_N, grams).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.transform(grams, h32))


def _shingle_hashes_sql() -> str:
    """DuckDB twin of shingle_hashes (1-based list indexing; range() already
    yields [] for negative sizes)."""
    gram = " || ' ' || ".join(f"w[i + {j + 1}]" for j in range(SHINGLE_N))
    return (
        "list_distinct(list_transform("
        f"list_transform(range(len(w) - {SHINGLE_N - 1}), i -> {gram}),"
        f" s -> {h32_sql('s')}))"
    )


def _words_cte(table: str) -> str:
    return f"SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w FROM {table}"


def shingle_index(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exploded DISTINCT shingle-hash inverted index: (doc_id, g).

    Performance shape: Spark's array higher-order functions run interpreted
    (no whole-stage codegen), so hashing shingles inside ``transform`` costs
    ~5× the same md5 in a flat projection.  Exploding the grams first keeps
    md5/conv in codegen; the explode itself is pipelined (no shuffle).
    Downstream signature/aggregate work then happens as groupBy aggregates —
    the canonical 100 TB shape (map-side partial min/sum, one shuffle on id).
    """
    from pyspark.sql import Window as W

    from spj_query_engine_spark.operators.core import spread

    words = F.split(F.col(text_col), r"\s+")
    tok = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"), F.posexplode(words).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, SHINGLE_N)]
    # the last lead is NULL for the trailing (SHINGLE_N-1) positions — and for
    # ALL positions of docs shorter than SHINGLE_N words, which thus drop out
    grams = tok.select(
        "doc_id", F.concat_ws(" ", *leads).alias("gram"), leads[-1].alias("tail")
    ).filter(F.col("tail").isNotNull())
    return grams.select("doc_id", h32(F.col("gram")).alias("g")).distinct()


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column) -> Column:
    """MinHash signature: array of MINHASH_K minima of universal-hash
    permutations; empty shingle set → sentinel p (consistent both engines)."""
    def perm_fn(a: int, b: int):
        # closure factory: a plain single-arg lambda — default-arg captures
        # would change the arity pyspark infers for the HOF
        return lambda x: minhash_perm(x, a, b)

    mins = [
        F.coalesce(
            F.array_min(F.transform(shingles, perm_fn(a, b))),
            F.lit(MERSENNE61),
        )
        for a, b in _MINHASH_AB
    ]
    return F.array(*mins)


def minhash_perdoc(inv: DataFrame) -> DataFrame:
    """Per-doc MinHash signature AND distinct shingle-hash set from ONE
    aggregate over the inverted index: (doc_id, gs, m0..m{K-1}).

    The signature mins are MINHASH_K codegen'd MIN aggregates (one shuffle
    on doc_id, map-side partial mins) — NOT array HOFs, which run
    interpreted.  ``gs`` (collect_list over the DISTINCT index rows — a
    set, order immaterial) rides the same exchange for free and lets the
    Jaccard verify run as a codegen'd ``array_intersect`` on the candidate
    pair instead of re-joining the exploded index twice and re-aggregating
    (r09 A/B, scripts/ab_minhash_r09.py: pair derivation med 2.6 → 1.6 s,
    interleaved).  Per-doc arrays are bounded by doc length — the same
    frame the DuckDB twin's ``shset`` CTE carries — so the exchange width
    is index-sized, never pair-sized.  Docs without shingles have no rows
    here; they could only ever form jaccard-0 pairs, which the threshold
    filter drops anyway."""
    return inv.groupBy("doc_id").agg(
        F.collect_list("g").alias("gs"),
        *[
            F.min(minhash_perm(F.col("g"), a, b)).alias(f"m{j}")
            for j, (a, b) in enumerate(_MINHASH_AB)
        ],
    )


def _minhash_bands(perdoc: DataFrame) -> DataFrame:
    """(doc_id, band, key) LSH band rows from :func:`minhash_perdoc`."""
    return perdoc.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[F.col(f"m{b * LSH_ROWS + r}") for r in range(LSH_ROWS)],
                        ).alias("key"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    inv: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs: banded-LSH candidates verified by exact Jaccard
    on the shingle-hash sets.

    Plan shape: ONE per-doc aggregate (signature mins + shingle set,
    :func:`minhash_perdoc`) → explode LSH_BANDS band keys per doc →
    self-equi-join on (band, key) → distinct candidate pairs → attach the
    two per-doc shingle sets → codegen'd ``array_intersect`` Jaccard
    filter.  Every join is an equi-join on a short hash key; at 100 TB the
    band join dominates and AQE's skew splitting handles hot buckets
    (plus: identical empty-signature docs all land in one bucket — the
    n>=SHINGLE_N guard keeps that bucket bounded).  The verify shuffles
    are candidate-bounded rows carrying one doc-length-bounded array each
    — strictly narrower than the previous cand×shingles explode that
    re-joined the index twice and re-aggregated (5 exchanges → 2)."""
    if inv is None:
        inv = shingle_index(docs, text_col, id_col)
    perdoc = minhash_perdoc(inv).persist()
    return _pairs_from_perdoc(perdoc)


def _pairs_from_perdoc(perdoc: DataFrame) -> DataFrame:
    """Banded candidates + array-verify from a (persisted) perdoc frame."""
    bands = _minhash_bands(perdoc)
    left = bands.alias("a")
    right = bands.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_jaccard(cand, perdoc)


def _verify_jaccard(
    cand: DataFrame,
    perdoc: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Exact-Jaccard verify on candidate pairs via the per-doc shingle
    SETS: ``|a∩b| / |a∪b|`` with ``array_intersect`` (a codegen'd
    expression, not an interpreted HOF).  The arrays are distinct by
    construction (the inverted index is), so sizes and intersection counts
    are identical to the old explode-join-reaggregate form — same doubles,
    same rounding, same oracle."""
    pa = perdoc.select(F.col("doc_id").alias(a_col), F.col("gs").alias("gs_a"))
    pb = perdoc.select(F.col("doc_id").alias(b_col), F.col("gs").alias("gs_b"))
    n_common = F.size(F.array_intersect(F.col("gs_a"), F.col("gs_b")))
    jacc = n_common.cast("double") / F.greatest(
        F.size(F.col("gs_a")) + F.size(F.col("gs_b")) - n_common, F.lit(1)
    ).cast("double")
    return (
        cand.join(pa, a_col)
        .join(pb, b_col)
        .select(a_col, b_col, portable_round(jacc, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_T)
    )


def minhash_lsh_pairs_sql(table: str = "documents") -> str:
    perm_mins = ",\n             ".join(
        f"coalesce(list_min(list_transform(sh, x -> {minhash_perm_sql('x', a, b)})), "
        f"{MERSENNE61}) AS m{j}"
        for j, (a, b) in enumerate(_MINHASH_AB)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || '_' || ".join(f"m{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
        + " AS key FROM sigs"
        for b in range(LSH_BANDS)
    )
    jacc = (
        "len(list_intersect(sa.sh, sb.sh))::DOUBLE / "
        "greatest(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)), 1)::DOUBLE"
    )
    return f"""
    WITH words AS ({_words_cte(table)}),
    shset AS (SELECT doc_id, {_shingle_hashes_sql()} AS sh FROM words),
    sigs AS (SELECT doc_id,
             {perm_mins}
             FROM shset),
    bands AS ({band_selects}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT cand.doc_a, cand.doc_b,
           {portable_round_sql(jacc, 6)} AS jaccard
    FROM cand
    JOIN shset sa ON sa.doc_id = cand.doc_a
    JOIN shset sb ON sb.doc_id = cand.doc_b
    WHERE {portable_round_sql(jacc, 6)} >= {JACCARD_T}
    """


def lsh_pairs_ckpt(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_jaccard: bool = False,
) -> DataFrame:
    """:func:`minhash_lsh_pairs`, eagerly materialized via
    :func:`~spj_query_engine_spark.operators.core.coarse_materialize` —
    the shared entry point for every graph-family consumer of the near-dup
    pair graph.

    Two costs disappear at once:

    * **double derivation** — downstream consumers reference the pair frame
      2+ times (symmetric edge unions, degree + iteration branches);
      without a barrier the whole banded derivation re-executes per branch
      (AQE exchange reuse catches only part of it — same-session A/B,
      scripts/variance_ab.py: g01's edge build med 2.6 s → 1.7 s from the
      barrier alone);
    * **tiny-task jitter** — the derivation is ~10 stages of sub-100 ms
      tasks at local bench scale, whose scheduler latency was the
      g-family's ~2x session-phase variance (BENCH_VARIANCE.md); the
      coarse scope cut the same A/B to med 1.1 s, range 1.0–1.3 s.

    Pairs are near-dup OUTPUT — bounded and tiny next to the corpus — so
    the executor-memory materialization is 100 TB-safe, and the scope
    no-ops on large inputs by construction (optimizer-estimate clamp).
    """
    from spj_query_engine_spark.operators.core import coarse_materialize

    def _build(d: DataFrame) -> DataFrame:
        pairs = minhash_lsh_pairs(d, text_col, id_col)
        return pairs if with_jaccard else pairs.select("doc_a", "doc_b")

    return coarse_materialize(_build, docs)


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs existing corpus (ingestion-time shape)
# ---------------------------------------------------------------------------

INC_MOD = 10
INC_NEW = 8  # doc_id % INC_MOD >= INC_NEW → the incoming batch (~20%)


def incremental_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    inv: DataFrame | None = None,
) -> DataFrame:
    """Ingestion-time dedup: match an INCOMING batch against the EXISTING
    corpus only — never corpus×corpus.  (The held-out batch here is the
    deterministic ``doc_id % INC_MOD >= INC_NEW`` slice; in production the
    batch is today's crawl and the corpus side is the persisted band
    index.)

    This is the shape that makes continuous ingestion affordable at 100 TB:
    the corpus band index is computed once and reused (amortized, exactly
    like the bucketed-join lever), each new batch joins only its own bands
    against it, and the quadratic old×old direction never forms.  Output:
    each new doc's BEST corpus match at Jaccard ≥ JACCARD_T (drop these,
    keep the rest of the batch)."""
    if inv is None:
        inv = shingle_index(docs, text_col, id_col)
    perdoc = minhash_perdoc(inv).persist()
    bands = _minhash_bands(perdoc)
    is_new = (F.col("doc_id") % INC_MOD) >= INC_NEW
    nb = bands.filter(is_new).select(
        F.col("doc_id").alias("new_id"), "band", "key"
    )
    cb = bands.filter(~is_new).select(
        F.col("doc_id").alias("corpus_id"), "band", "key"
    )
    cand = nb.join(cb, ["band", "key"]).select("new_id", "corpus_id").distinct()
    scored = _verify_jaccard(cand, perdoc, a_col="new_id", b_col="corpus_id")
    from pyspark.sql import Window

    w = Window.partitionBy("new_id").orderBy(F.desc("jaccard"), F.asc("corpus_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("new_id", "corpus_id", "jaccard")
    )


def incremental_dedup_sql(table: str = "documents") -> str:
    perm_mins = ",\n             ".join(
        f"coalesce(list_min(list_transform(sh, x -> {minhash_perm_sql('x', a, b)})), "
        f"{MERSENNE61}) AS m{j}"
        for j, (a, b) in enumerate(_MINHASH_AB)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || '_' || ".join(f"m{b * LSH_ROWS + r}" for r in range(LSH_ROWS))
        + " AS key FROM sigs"
        for b in range(LSH_BANDS)
    )
    jacc = (
        "len(list_intersect(sa.sh, sb.sh))::DOUBLE / "
        "greatest(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)), 1)::DOUBLE"
    )
    return f"""
    WITH words AS ({_words_cte(table)}),
    shset AS (SELECT doc_id, {_shingle_hashes_sql()} AS sh FROM words),
    sigs AS (SELECT doc_id,
             {perm_mins}
             FROM shset),
    bands AS ({band_selects}),
    cand AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
             FROM bands n JOIN bands c
               ON n.band = c.band AND n.key = c.key
             WHERE n.doc_id % {INC_MOD} >= {INC_NEW}
               AND c.doc_id % {INC_MOD} < {INC_NEW}),
    scored AS (
      SELECT cand.new_id, cand.corpus_id, {portable_round_sql(jacc, 6)} AS jaccard
      FROM cand
      JOIN shset sa ON sa.doc_id = cand.new_id
      JOIN shset sb ON sb.doc_id = cand.corpus_id
      WHERE {portable_round_sql(jacc, 6)} >= {JACCARD_T}
    )
    SELECT new_id, corpus_id, jaccard FROM (
      SELECT *, row_number() OVER (PARTITION BY new_id
                                   ORDER BY jaccard DESC, corpus_id ASC) AS rn
      FROM scored
    ) WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text: Column) -> Column:
    """SIMHASH_BITS-bit SimHash over word tokens (with multiplicity): bit j
    is set iff more than half the tokens have bit j set in their 60-bit md5
    hash.  Pure JVM higher-order expressions — wide but shuffle-free."""
    words = F.split(text, r"\s+")
    hashes = F.transform(words, lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long"))
    n = F.size(hashes)

    def bit_test(j: int):
        return lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1

    out = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        s_j = F.size(F.filter(hashes, bit_test(j)))
        out = out + F.when(s_j * 2 > n, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fingerprints via explode + 60 codegen'd SUM aggregates (one shuffle on
    doc_id, map-side partials) — ~10× the throughput of the per-row HOF
    formulation (`simhash`), identical results."""
    from spj_query_engine_spark.operators.core import spread

    toks = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long").alias("h"),
    )
    sums = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ],
    )
    out = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        out = out + F.when(F.col(f"s{j}") * 2 > F.col("n"), F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sums.select(F.col("doc_id").alias(id_col), out.alias("simhash"))


def simhash_pairs(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash: band the 60 bits into SIMHASH_BANDS chunks
    (pigeonhole: Hamming ≤ k pairs share ≥1 of k+1 bands — with 4 bands this
    is exact for Hamming ≤ 3 and a high-recall heuristic above), equi-join on
    (band, chunk), verify with bit_count(xor) ≤ SIMHASH_MAX_HAMMING."""
    from spj_query_engine_spark.operators.core import barrier

    # r09 (§2.4): the band self-join consumes `bands` on BOTH sides, so the
    # whole fingerprint derivation (token explode + 61-aggregate shuffle)
    # planned and ran twice.  The fingerprint frame is n x 2 longs —
    # materialize it once and let both join sides read the barrier.
    fp = barrier(simhash_fingerprints(docs, text_col, id_col))
    width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << width) - 1
    bands = fp.select(
        F.col(id_col).alias("doc_id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.chunk")
    a, b = bands.alias("a"), bands.alias("b")
    # r09 (§2.3): hamming is a pure function of the pair's fingerprints, so
    # verify BEFORE the dedup exchange — only surviving pairs shuffle, and
    # the distinct runs over (doc_a, doc_b, hamming), which (doc_a, doc_b)
    # determines, so the surviving pair set is unchanged.
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


def _simhash_sql_expr() -> str:
    h60 = "('0x' || substr(md5(x), 1, 15))::BIGINT"
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h >> {j}) & 1 = 1)) > len(hs) "
        f"THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return (
        f"SELECT doc_id, ({bit_terms}) AS simhash FROM "
        f"(SELECT doc_id, list_transform(w, x -> {h60}) AS hs FROM words) _hs"
    )


def simhash_fingerprints_sql(table: str = "documents") -> str:
    return f"WITH words AS ({_words_cte(table)}) {_simhash_sql_expr()}"


def simhash_pairs_sql(table: str = "documents") -> str:
    width = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << width) - 1
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * width}) & {mask} AS chunk FROM fp"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
    WITH words AS ({_words_cte(table)}),
    fp AS ({_simhash_sql_expr()}),
    bands AS ({band_selects}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.simhash AS sim_a, b.simhash AS sim_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b))::INT AS hamming
    FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH_MAX_HAMMING}
    """


# ---------------------------------------------------------------------------
# n-gram Jaccard via inverted index
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    inv: DataFrame | None = None,
) -> DataFrame:
    """All-pairs Jaccard ≥ JACCARD_T via a shingle inverted index:
    explode distinct shingle hashes → drop shingles in > NGRAM_MAX_DF docs
    (stop-shingle skew control — THE lever that keeps the self-join from
    quadratic blowup at 100 TB) → self-join on shingle → count common
    shingles per pair → join set sizes → Jaccard filter."""
    if inv is None:
        inv = shingle_index(docs, text_col, id_col).persist()
    sizes = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # df = 1 shingles (the bulk of the index) can never intersect — dropping
    # them from the self-join input changes nothing downstream (set sizes
    # come from the UNFILTERED index above) and removes the corpus-sized
    # shuffle of unique shingles
    df_ok = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        (F.col("df") <= NGRAM_MAX_DF) & (F.col("df") >= 2)
    )
    inv = inv.join(df_ok.select("g"), "g")
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jacc = F.col("n_common").cast("double") / F.greatest(
        F.col("n_a") + F.col("n_b") - F.col("n_common"), F.lit(1)
    ).cast("double")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", portable_round(jacc, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_T)
    )


def ngram_jaccard_pairs_sql(table: str = "documents") -> str:
    jacc = "n_common::DOUBLE / greatest(len(sa.sh) + len(sb.sh) - n_common, 1)::DOUBLE"
    return f"""
    WITH words AS ({_words_cte(table)}),
    shset AS (SELECT doc_id, {_shingle_hashes_sql()} AS sh FROM words),
    inv0 AS MATERIALIZED (SELECT doc_id, unnest(sh) AS g FROM shset),
    df_ok AS (SELECT g FROM inv0 GROUP BY g
              HAVING count(*) BETWEEN 2 AND {NGRAM_MAX_DF}),
    inv AS MATERIALIZED (SELECT inv0.doc_id, inv0.g FROM inv0 JOIN df_ok USING (g)),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
               FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT doc_a, doc_b, {portable_round_sql(jacc, 6)} AS jaccard
    FROM common
    JOIN shset sa ON sa.doc_id = doc_a
    JOIN shset sb ON sb.doc_id = doc_b
    WHERE {portable_round_sql(jacc, 6)} >= {JACCARD_T}
    """


# ---------------------------------------------------------------------------
# benchmark decontamination: train-vs-eval n-gram overlap
# ---------------------------------------------------------------------------

CONTAM_T = 0.1  # flag train docs whose shingles overlap an eval doc ≥ this
EVAL_MOD = 17  # doc_id % EVAL_MOD == 0 → the held-out "benchmark" split


def contamination(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Benchmark decontamination: for every TRAIN document, the maximum
    fraction of its distinct word-shingles that also appear in any single
    EVAL document; rows with overlap ≥ CONTAM_T are flagged for removal.
    (The held-out split here is the deterministic ``doc_id % EVAL_MOD == 0``
    slice; in production the eval side is the benchmark corpus itself.)

    This is the standard exact n-gram contamination check training pipelines
    run before releasing a corpus (e.g. GPT-3 appendix C / PaLM-style 8-gram
    decontamination — public methodology).  Scale anatomy: candidate
    generation is the shingle inverted-index equi-join of d05 restricted to
    train×eval (never train×train — the expensive direction is gone), with
    the same ``NGRAM_MAX_DF`` stop-shingle cap bounding bucket fan-out; the
    eval index at 100 TB is the small side (benchmarks are MBs) and
    broadcast-joins against the train index, so the train corpus never
    shuffles on anything wider than a 4-byte shingle hash.
    """
    inv_all = shingle_index(docs, text_col, id_col)
    sizes = inv_all.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    # a df = 1 shingle cannot appear in BOTH splits — drop it from the join
    # input (overlap sizes still come from the unfiltered index)
    df_ok = (
        inv_all.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") <= NGRAM_MAX_DF) & (F.col("df") >= 2))
    )
    inv = inv_all.join(df_ok.select("g"), "g")
    is_eval = (F.col(id_col) % EVAL_MOD) == 0
    tr = inv.filter(~is_eval).select(F.col(id_col).alias("doc_id"), "g")
    ev = inv.filter(is_eval).select(F.col(id_col).alias("eval_id"), "g")
    common = (
        tr.join(ev, "g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # max overlap fraction per train doc: n_sh is constant per doc, so
    # max(n_common)/n_sh == max(n_common/n_sh) — one aggregate, no window
    maxov = common.groupBy("doc_id").agg(F.max("n_common").alias("max_common"))
    frac = portable_round(
        F.col("max_common").cast("double") / F.greatest(F.col("n_sh"), F.lit(1)).cast("double"),
        6,
    )
    return (
        maxov.join(sizes.withColumnRenamed(id_col, "doc_id"), "doc_id")
        .select("doc_id", frac.alias("contamination"))
        .filter(F.col("contamination") >= CONTAM_T)
    )


def contamination_sql(table: str = "documents") -> str:
    frac = "max_common::DOUBLE / greatest(n_sh, 1)::DOUBLE"
    return f"""
    WITH words AS ({_words_cte(table)}),
    shset AS (SELECT doc_id, {_shingle_hashes_sql()} AS sh FROM words),
    sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shset),
    inv0 AS MATERIALIZED (SELECT doc_id, unnest(sh) AS g FROM shset),
    df_ok AS (SELECT g FROM inv0 GROUP BY g
              HAVING count(*) BETWEEN 2 AND {NGRAM_MAX_DF}),
    inv AS MATERIALIZED (SELECT inv0.doc_id, inv0.g FROM inv0 JOIN df_ok USING (g)),
    common AS (
      SELECT t.doc_id, e.doc_id AS eval_id, count(*) AS n_common
      FROM inv t JOIN inv e ON t.g = e.g
      WHERE t.doc_id % {EVAL_MOD} != 0 AND e.doc_id % {EVAL_MOD} = 0
      GROUP BY 1, 2
    ),
    maxov AS (SELECT doc_id, max(n_common) AS max_common FROM common GROUP BY doc_id)
    SELECT maxov.doc_id, {portable_round_sql(frac, 6)} AS contamination
    FROM maxov JOIN sizes USING (doc_id)
    WHERE {portable_round_sql(frac, 6)} >= {CONTAM_T}
    """


# ---------------------------------------------------------------------------
# embedding cosine near-dup (blocked brute force)
# ---------------------------------------------------------------------------


def dot_product(x: Column, y: Column, dim: int | None = None) -> Column:
    """Dot product in double precision with LEFT-TO-RIGHT accumulation.

    ``dim=None`` → array-fold form (``aggregate(zip_with(...))``).
    ``dim=k`` → unrolled ``0.0 + x₁y₁ + … + xₖyₖ`` element_at chain.
    Measured head-to-head (4M 64-dim pairs, local[32]): the FOLD wins ~9×
    (1.4 s vs 13 s) — per-element ``element_at`` calls dominate the
    unrolled codegen, so the fold is the default and the unrolled form
    exists only for oracle-replay experiments.  A left-associated Add
    chain accumulates in the exact order of the fold, so both forms (and
    the DuckDB ``list_reduce`` oracle) are bit-identical."""
    if dim is None:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    out = F.lit(0.0)
    for i in range(1, dim + 1):
        out = out + F.element_at(x, i).cast("double") * F.element_at(y, i).cast("double")
    return out


def neg_desc_key(col: Column) -> Column:
    """NaN-safe descending sort key for ascending ``array_sort``.

    Plain ``-col`` leaves NaN as NaN, which ascending-sorts LAST — but both
    the ``row_number(DESC)`` window this rewrite replaced and the DuckDB
    ``ORDER BY DESC`` oracle rank NaN FIRST (NaN > everything).  Mapping NaN
    to +inf before negating restores NaN-first ordering for degenerate
    (zero-norm) vectors, so engine and oracle agree on every input."""
    return -F.when(F.isnan(col), F.lit(float("inf"))).otherwise(col)


def cosine_sim(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity with the same evaluation order as the oracle twin —
    results are bit-identical."""
    return dot_product(a, b, dim) / (
        F.sqrt(dot_product(a, a, dim)) * F.sqrt(dot_product(b, b, dim))
    )


def cosine_sim_sql(a: str, b: str) -> str:
    def dot(x: str, y: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(len({x})), i -> {x}[i+1]::DOUBLE * {y}[i+1]::DOUBLE)), "
            f"(acc, v) -> acc + v)"
        )

    return f"({dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"


NEARDUP_CELLS = 16  # coarse-quantizer cell count floor (conf `spj.neardup.cells`)
NEARDUP_ASSIGN = 2  # cells each vector is assigned to (multi-probe blocking)
#: auto-scale target: vectors per quantizer cell — the throughput/recall
#: dial.  Candidate pairs grow with the target but the two assignment
#: stages shrink with it (fanout ∝ √cells each); SWEPT at 100x (200k
#: vectors, 32 cores): target 50 → 113 s, 100 → 75 s, 200 → 137 s — the
#: two regimes cross right here, so 100 is the measured optimum, not a
#: guess.  The oracle derives the same value.
NEARDUP_CELL_TARGET = 100
FLAT_ASSIGN_MAX = 64  # above this many cells, assignment goes two-level


def prefix_rows(df: DataFrame, id_col: str, n) -> DataFrame:
    """First ``n`` rows by ascending id — the deterministic centroid seed
    set shared by the quantizer family (d06/d12/s06/s09).

    A raw ``id < n`` predicate selects the same rows ONLY on a dense
    0..N-1 id space.  Real corpora — and the replica-scaled bench
    corpora, whose ids are offset by 1e7/1e10 per replica — are sparse:
    there the predicate silently under-selects centroids.  At 1000x
    (2M vectors, intended 20,000 leaves) it found only the 2,000
    base-corpus ids, inflating mean cell size — hence exact-rerank pair
    volume — 10x: the r08 s09 kill (SCALING1000_r08) was this geometry
    defect, not rerank cost.  ``orderBy(id).limit(n)`` selects the n
    smallest ids whatever the id space; Spark compiles it to
    TakeOrderedAndProject (per-partition top-n, single merge — never a
    global sort), and every caller broadcasts the result anyway.  The
    SQL twins make the matching move: ``ORDER BY id LIMIT n`` replaces
    ``WHERE id < n``, value-identical on dense ids, so gate-scale
    results are unchanged."""
    return df.orderBy(F.col(id_col).asc()).limit(n)


def resolve_quantizer_cells(
    embeddings: DataFrame,
    conf_key: str = "spj.neardup.cells",
    default_cells: int = NEARDUP_CELLS,
    target: int = NEARDUP_CELL_TARGET,
) -> int:
    """Coarse-quantizer cell count: explicit conf override, else DERIVED
    FROM THE CORPUS as ``max(default, ceil(n / target))`` so cell size —
    and with it the per-vector candidate volume — stays ~constant at any
    scale.  A fixed cell count at 100x data is a misconfiguration
    (quadratic within-cell pairs), and burying the fix in benchmark
    harness knobs hides it from real deployments; the one extra ``count()``
    is a metadata-cheap parquet scan.  The matching SQL twins compute the
    same expression (GREATEST/CEIL over count(*)), so engine and oracle
    agree at every sf without re-baking constants."""
    try:
        conf = embeddings.sparkSession.conf.get(conf_key, "")
    except Exception:
        conf = ""
    if conf:
        return int(conf)
    # footer-exact row count attached by catalog.load_table (parquet
    # metadata, same value a count() job returns) — skips one Spark job per
    # query for every quantizer-family entry; any transformation between
    # load and here drops the attribute and the count() fallback runs
    n = getattr(embeddings, "_spj_rowcount", None)
    if n is None:
        n = embeddings.count()
    return max(default_cells, math.ceil(n / target))


def auto_cells_sql(
    table: str,
    default_cells: int = NEARDUP_CELLS,
    target: int = NEARDUP_CELL_TARGET,
) -> str:
    """Scalar-subquery twin of :func:`resolve_quantizer_cells` (no conf)."""
    return (
        f"(SELECT GREATEST({default_cells}, "
        f"CAST(CEIL(count(*) / {target}.0) AS BIGINT)) FROM {table})"
    )


def auto_branch_sql(
    table: str,
    default_branch: int = 4,
    default_cells: int = NEARDUP_CELLS,
    target: int = NEARDUP_CELL_TARGET,
) -> str:
    """Scalar-subquery twin of the auto branch = max(b, ceil(sqrt(cells)))."""
    cells = auto_cells_sql(table, default_cells, target)
    return (
        f"(SELECT GREATEST({default_branch}, "
        f"CAST(CEIL(SQRT({cells})) AS BIGINT)))"
    )


def embedding_near_dup(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    n_cells: int | None = None,
    n_assign: int = NEARDUP_ASSIGN,
) -> DataFrame:
    """Embedding near-duplicate pairs: brute-force cosine WITHIN an IVF
    quantizer cell.  Each vector is assigned to its ``n_assign`` nearest of
    ``n_cells`` seed centroids (first ``n_cells`` vec_ids — deterministic, so
    the DuckDB oracle replays cell assignment exactly); candidate pairs are
    an equi-join on cell id, deduped across the multi-probe assignments.

    Scale anatomy: blocking on a raw data column (the previous design used
    ``label``) gives O(block²) pair growth under a single dominant value —
    data decides the block sizes.  Quantizer cells put the block count under
    OUR control: pairs ≈ Σ cell² with E[cell] = n·n_assign/n_cells, and
    ``n_cells`` scales with the corpus (set conf ``spj.neardup.cells`` ≈
    n_vectors / target_cell_size at deployment; multi-probe ``n_assign=2``
    recovers pairs that straddle a cell boundary).  Assignment is a
    broadcast nested-loop over n×C pairs — map-only, no corpus shuffle —
    identical join shapes to operators.similarity.ivf_topk.

    100× scaling anatomy (SCALING100_r08, measured): the wall ratio of ~31
    sits just over the ≤30 linear-work bar because the WORK is superlinear
    on that corpus, not because the plan degrades — scored-pair volume grew
    271× for 100× vectors (371,879 → 100,668,140 pairs; the scaled corpus's
    replica geometry skews cell occupancy, and pairs ∝ Σ cell²), so
    per-pair throughput actually improved 8.6× at scale.  The cell target
    is the measured optimum (100×: target 50 → 113 s, 100 → 75 s,
    200 → 137 s); a deployment retunes it with the two confs above.
    """
    # Norms are per-VECTOR, not per-pair: compute each once before the join
    # (the pair count is quadratic in the cell size; hoisting the norm out of
    # the pair loop is a ~3× win).  The value is the same expression on the
    # same data, so the oracle's inline form matches bit-for-bit.
    def dot(x: Column, y: Column) -> Column:
        return dot_product(x, y, dim)

    from pyspark.sql import Window

    from spj_query_engine_spark.operators.core import spread

    if n_cells is None:
        n_cells = resolve_quantizer_cells(embeddings)
    if n_cells > FLAT_ASSIGN_MAX:
        # Flat assignment is n x n_cells = O(n²/cell_size) once cells scale
        # with the corpus (measured 109x wall at 100x even with norms
        # hoisted); past the threshold the assignment goes hierarchical —
        # the FAISS IVF-with-tree-quantizer move.  Pair generation and
        # scoring are unchanged; only which approximate cell a vector lands
        # in differs, and gate-scale corpora never cross the threshold, so
        # the oracle replays the flat path exactly where it runs.
        return embedding_near_dup_2level(
            embeddings,
            vec_col=vec_col,
            id_col=id_col,
            dim=dim,
            n_cells=n_cells,
            branch=max(NEARDUP_BRANCH, math.ceil(math.sqrt(n_cells))),
            n_assign=n_assign,
        )
    base = spread(embeddings, id_col).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("norm"),
    )
    cent = prefix_rows(base, "id", n_cells).select(
        F.col("id").alias("cid"),
        F.col("v").alias("c_vec"),
        F.col("norm").alias("c_nrm"),
    )
    # assignment reuses the hoisted norms (one fold per n×C row, not three)
    # and replaces the row_number window — which would sort-shuffle n×C rows
    # with vectors attached — by a map-side-combinable top-n_assign
    # aggregate: ascending sort on (-asim, cid) == (DESC asim, ASC cid)
    assign_sim = dot(F.col("v"), F.col("c_vec")) / (
        F.col("norm") * F.col("c_nrm")
    )
    blocked = (
        base.crossJoin(F.broadcast(cent))
        .select("id", "v", "norm", "cid", assign_sim.alias("asim"))
        .groupBy("id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            neg_desc_key(F.col("asim")).alias("na"),
                            F.col("cid").alias("cid"),
                        )
                    )
                ),
                1,
                n_assign,
            ).alias("tops"),
            F.first("v").alias("v"),
            F.first("norm").alias("norm"),
        )
        .select("id", "v", "norm", F.explode("tops").alias("t"))
        .select(F.col("t.cid").alias("blk"), "id", "v", "norm")
    )
    a = blocked.select(
        F.col("blk"), F.col("id").alias("id_a"), F.col("v").alias("v_a"),
        F.col("norm").alias("norm_a"),
    )
    b = blocked.select(
        F.col("blk"), F.col("id").alias("id_b"), F.col("v").alias("v_b"),
        F.col("norm").alias("norm_b"),
    )
    sim = portable_round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("norm_a") * F.col("norm_b")), 6
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= COSINE_T)
        .distinct()  # a pair sharing 2 of its probe cells appears twice
    )


NEARDUP_BRANCH = 4  # level-1 fan-out for the two-level (hierarchical) variant


def embedding_near_dup_2level(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    n_cells: int | None = None,
    branch: int | None = None,
    n_assign: int = NEARDUP_ASSIGN,
) -> DataFrame:
    """Embedding near-dup pairs with a TWO-LEVEL quantizer assignment — the
    shape that survives scaling the cell count with the corpus.

    The flat variant (:func:`embedding_near_dup`) assigns each vector by
    crossJoin against ALL ``n_cells`` centroids: with the documented
    guidance n_cells ∝ n (constant cell size), assignment cost is
    n × n_cells = O(n²/cell_size) — measured 109× wall at 100× input
    even with norms hoisted (282× before the hoist).
    Here centroids form a two-level tree (IMI/hierarchical-k-means shape,
    public methodology): ``branch`` level-1 centroids partition the
    ``n_cells`` leaf centroids, a vector finds its nearest level-1 cell
    (n × branch) then its nearest leaves WITHIN that cell
    (n × n_cells/branch) — total n × (branch + n_cells/branch), minimized
    at branch ≈ √n_cells.  All centroid choices are deterministic prefix
    vectors, so the DuckDB oracle replays the full tree exactly.

    Approximation note: a leaf inherits exactly one level-1 parent; vectors
    probe only leaves under their own level-1 cell, so pairs straddling a
    level-1 boundary are missed unless a shared leaf catches them — the
    standard hierarchical-quantizer trade, mitigated by ``n_assign``
    multi-probe at the leaf level (and level-1 cells are few and large, so
    boundary mass is small)."""

    def dot(x: Column, y: Column) -> Column:
        return dot_product(x, y, dim)

    from pyspark.sql import Window

    from spj_query_engine_spark.operators.core import spread

    if n_cells is None:
        n_cells = resolve_quantizer_cells(embeddings)
    if branch is None:
        branch = max(NEARDUP_BRANCH, math.ceil(math.sqrt(n_cells)))
    base = spread(embeddings, id_col).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("norm"),
    )
    from spj_query_engine_spark.operators.core import barrier

    # ONE TakeOrdered pass over the corpus yields every centroid: the
    # level-1 set is by construction the first `branch` rows of the leaf
    # set (both are ascending-id prefixes), so materialize the n_cells-row
    # leaf prefix once (bounded: n_cells ≪ corpus) and slice c1 from it —
    # each broadcast build below then reads the tiny materialized frame
    # instead of re-scanning the corpus per centroid set (3 scans → 1).
    leaf_all = barrier(prefix_rows(base, "id", n_cells))
    c1 = prefix_rows(leaf_all, "id", branch).select(
        F.col("id").alias("c1"),
        F.col("v").alias("c1_vec"),
        F.col("norm").alias("c1_nrm"),
    )
    leaf = leaf_all.select(
        F.col("id").alias("leaf"),
        F.col("v").alias("leaf_vec"),
        F.col("norm").alias("leaf_nrm"),
    )
    # argmax assignments are map-side-combinable max_by aggregates (not
    # row_number windows over vector-bearing rows); hoisted norms leave one
    # dot fold per scored row.  max over (sim, -id) == (DESC sim, ASC id),
    # so ranks are bit-identical to the oracle's window form.
    leaf_parent = (
        leaf.crossJoin(F.broadcast(c1))
        .select(
            "leaf", "leaf_vec", "leaf_nrm", "c1",
            (
                dot(F.col("leaf_vec"), F.col("c1_vec"))
                / (F.col("leaf_nrm") * F.col("c1_nrm"))
            ).alias("lsim"),
        )
        .groupBy("leaf")
        .agg(
            F.max_by("c1", F.struct(F.col("lsim"), -F.col("c1"))).alias("c1"),
            F.first("leaf_vec").alias("leaf_vec"),
            F.first("leaf_nrm").alias("leaf_nrm"),
        )
    )
    # each vector's level-1 cell (n × branch pairs)
    v_l1 = (
        base.crossJoin(F.broadcast(c1))
        .select(
            "id", "v", "norm", "c1",
            (
                dot(F.col("v"), F.col("c1_vec"))
                / (F.col("norm") * F.col("c1_nrm"))
            ).alias("vsim"),
        )
        .groupBy("id")
        .agg(
            F.max_by("c1", F.struct(F.col("vsim"), -F.col("c1"))).alias("c1"),
            F.first("v").alias("v"),
            F.first("norm").alias("norm"),
        )
    )
    # nearest n_assign leaves WITHIN the vector's level-1 cell — top-n via
    # ascending sort on (-asim, leaf) == (DESC asim, ASC leaf)
    blocked = (
        v_l1.join(F.broadcast(leaf_parent), "c1")
        .select(
            "id", "v", "norm", "leaf",
            (
                dot(F.col("v"), F.col("leaf_vec"))
                / (F.col("norm") * F.col("leaf_nrm"))
            ).alias("asim"),
        )
        .groupBy("id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            neg_desc_key(F.col("asim")).alias("na"),
                            F.col("leaf").alias("leaf"),
                        )
                    )
                ),
                1,
                n_assign,
            ).alias("tops"),
            F.first("v").alias("v"),
            F.first("norm").alias("norm"),
        )
        .select("id", "v", "norm", F.explode("tops").alias("t"))
        .select(F.col("t.leaf").alias("blk"), "id", "v", "norm")
    )
    # r09 (§2.4): `blocked` feeds BOTH sides of the pair self-join, and the
    # executed adaptive plan shows the whole two-level assignment chain
    # (two BNLJ scoring passes + three aggregates) planned AND run twice —
    # AQE stage reuse does not fire across the aliased sides.  One barrier
    # bounds it to a single execution (n×n_assign rows, linear in the
    # corpus).  Two-tree A/B: d12 0.92, d14 0.85.  The SAME barrier in the
    # FLAT variant measured 1.6x slower (d06) — its assignment is one
    # pipelined BNLJ+aggregate, cheaper than the materialization — so only
    # the two-level chain pays for the barrier.
    blocked = barrier(blocked)
    a = blocked.select(
        F.col("blk"), F.col("id").alias("id_a"), F.col("v").alias("v_a"),
        F.col("norm").alias("norm_a"),
    )
    b = blocked.select(
        F.col("blk"), F.col("id").alias("id_b"), F.col("v").alias("v_b"),
        F.col("norm").alias("norm_b"),
    )
    sim = portable_round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("norm_a") * F.col("norm_b")), 6
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= COSINE_T)
        .distinct()
    )


def embedding_near_dup_2level_sql(
    table: str = "embeddings",
    n_cells: int | str | None = None,
    branch: int | str | None = None,
    n_assign: int = NEARDUP_ASSIGN,
) -> str:
    if n_cells is None:
        n_cells = auto_cells_sql(table)
    if branch is None:
        branch = auto_branch_sql(table, NEARDUP_BRANCH)
    lsim = cosine_sim_sql("l.embedding", "c.embedding")
    vsim = cosine_sim_sql("b.embedding", "c.embedding")
    asim = cosine_sim_sql("v.v", "lp.leaf_vec")
    sim = portable_round_sql(cosine_sim_sql("a.v", "b.v"), 6)
    return f"""
    WITH c1 AS (SELECT vec_id AS c1, embedding FROM {table} ORDER BY vec_id LIMIT {branch}),
    leafc AS (SELECT vec_id AS leaf, embedding FROM {table} ORDER BY vec_id LIMIT {n_cells}),
    leaf_parent AS (
      SELECT leaf, leaf_vec, c1 FROM (
        SELECT l.leaf, l.embedding AS leaf_vec, c.c1,
               row_number() OVER (PARTITION BY l.leaf
                                  ORDER BY {lsim} DESC, c.c1 ASC) AS rnk
        FROM leafc l CROSS JOIN c1 c
      ) WHERE rnk = 1
    ),
    v_l1 AS (
      SELECT id, v, c1 FROM (
        SELECT b.vec_id AS id, b.embedding AS v, c.c1,
               row_number() OVER (PARTITION BY b.vec_id
                                  ORDER BY {vsim} DESC, c.c1 ASC) AS rnk
        FROM {table} b CROSS JOIN c1 c
      ) WHERE rnk = 1
    ),
    blocked AS (
      SELECT blk, id, v FROM (
        SELECT lp.leaf AS blk, v.id, v.v,
               row_number() OVER (PARTITION BY v.id
                                  ORDER BY {asim} DESC, lp.leaf ASC) AS rnk
        FROM v_l1 v JOIN leaf_parent lp ON v.c1 = lp.c1
      ) WHERE rnk <= {n_assign}
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b, {sim} AS cosine
    FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.id < b.id
    WHERE {sim} >= {COSINE_T}
    """


def branched_assign_sql(flat_sql: str, two_level_sql: str, cells_expr: str) -> str:
    """Replay the engine's flat/two-level quantizer switch in SQL: both
    formulations guarded by the SAME scalar cell-count condition the engine
    branches on, unioned.  Exactly one side survives its guard, so the
    oracle tracks the engine across the ``FLAT_ASSIGN_MAX`` threshold —
    running the correctness gate on a scaled corpus (e.g. the 10x replica,
    whose derived cell count crosses the threshold) compares like against
    like instead of reporting a false engine/oracle mismatch."""
    return f"""
    SELECT * FROM ({flat_sql}) WHERE ({cells_expr}) <= {FLAT_ASSIGN_MAX}
    UNION ALL
    SELECT * FROM ({two_level_sql}) WHERE ({cells_expr}) > {FLAT_ASSIGN_MAX}
    """


def embedding_near_dup_sql(
    table: str = "embeddings",
    n_cells: int | str | None = None,
    n_assign: int = NEARDUP_ASSIGN,
) -> str:
    if n_cells is None:
        # the corpus-derived cell count of resolve_quantizer_cells — the
        # oracle tracks the engine at any sf without re-baking constants,
        # INCLUDING the flat/two-level switch past FLAT_ASSIGN_MAX
        cells = auto_cells_sql(table)
        return branched_assign_sql(
            embedding_near_dup_sql(table, cells, n_assign),
            embedding_near_dup_2level_sql(table, n_assign=n_assign),
            cells,
        )
    assign_sim = cosine_sim_sql("b.embedding", "c.c_vec")
    sim = portable_round_sql(cosine_sim_sql("a.v", "b.v"), 6)
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS c_vec FROM {table} ORDER BY vec_id LIMIT {n_cells}
    ),
    ranked AS (
      SELECT b.vec_id AS id, b.embedding AS v, c.cid,
             row_number() OVER (PARTITION BY b.vec_id
                                ORDER BY {assign_sim} DESC, c.cid ASC) AS rnk
      FROM {table} b CROSS JOIN cent c
    ),
    blocked AS (SELECT cid AS blk, id, v FROM ranked WHERE rnk <= {n_assign})
    SELECT DISTINCT a.id AS id_a, b.id AS id_b, {sim} AS cosine
    FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.id < b.id
    WHERE {sim} >= {COSINE_T}
    """


def semantic_dedup(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style end-to-end semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cosine near-dup pairs inside corpus-derived IVF cells
    (:func:`embedding_near_dup`, flat/two-level auto-switch) → connected
    components (:func:`dup_clusters`) → keep the minimum id per cluster.
    Output covers EVERY vector: ``(vec_id, cluster_id, is_kept)`` — vectors
    in no near-dup pair are their own singleton cluster and survive; of each
    multi-vector cluster exactly the canonical (min-id) row survives.  A
    training pipeline filters ``is_kept`` and drops ~droppable semantic
    duplicates in one pass.

    Scale anatomy: the pair graph is cell-bounded (never all-pairs), the
    component loop is edge-sized joins with checkpoint barriers, and the
    final step is one left join of the id-only corpus against the clustered
    ids — payload vectors never shuffle after pair scoring."""
    pairs = embedding_near_dup(embeddings, vec_col=vec_col, id_col=id_col)
    clusters = dup_clusters(
        pairs.select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        )
    )
    ids = embeddings.select(F.col(id_col).alias("vec_id"))
    return (
        ids.join(clusters, ids["vec_id"] == clusters["doc_id"], "left")
        .select(
            "vec_id",
            F.coalesce(F.col("cluster_id"), F.col("vec_id"))
            .cast("long")
            .alias("cluster_id"),
            F.coalesce(F.col("is_canonical"), F.lit(True)).alias("is_kept"),
        )
    )


def semantic_dedup_sql(table: str = "embeddings") -> str:
    pairs_body = (
        "SELECT id_a AS doc_a, id_b AS doc_b FROM ("
        + embedding_near_dup_sql(table)
        + ")"
    )
    return f"""
    SELECT e.vec_id,
           CAST(COALESCE(c.cluster_id, e.vec_id) AS BIGINT) AS cluster_id,
           COALESCE(c.is_canonical, TRUE) AS is_kept
    FROM {table} e LEFT JOIN ({dup_clusters_sql(pairs_body)}) c
      ON c.doc_id = e.vec_id
    """


# ---------------------------------------------------------------------------
# Near-duplicate clustering: pairs -> connected components -> canonical doc
# ---------------------------------------------------------------------------

CC_ROUNDS = 6  # min-label propagation rounds (graph diameter bound)


def dup_clusters(pairs: DataFrame, rounds: int = CC_ROUNDS) -> DataFrame:
    """Connected components over a near-duplicate pair graph by ``rounds``
    of min-label propagation: every doc's cluster id converges to the
    smallest doc_id reachable within ``rounds`` hops.  Output
    (doc_id, cluster_id, is_canonical) for every doc in the graph; a dedup
    pipeline keeps ``is_canonical`` rows and drops the rest.

    A FIXED round count (not run-to-convergence) keeps the result a pure
    deterministic function of the input, so the DuckDB oracle can replay it
    as unrolled CTEs; near-dup graphs are overwhelmingly short chains
    (diameter ≤ 3 in practice), so ``rounds=6`` is the true components for
    any real corpus.  Cost: ``rounds`` × (one broadcast/shuffle join on the
    edge list + one min-aggregate).  At 100 TB the same loop applies with
    the large-star/small-star optimization (alternate joining on the high
    and low endpoint) to bound the per-round shuffle — same join shapes.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .persist()
    )
    labels = edges.groupBy("u").agg(
        F.least(F.col("u"), F.min("v")).alias("lbl")
    )
    for r in range(rounds - 1):
        # each round references `labels` twice (self + neighbor side);
        # checkpoint to truncate the lineage — without it the logical plan
        # doubles per round and the base pair query re-optimizes/re-executes
        # 2^rounds times.  localCheckpoint = executor-storage materialization,
        # the standard iteration barrier (GraphX/GraphFrames do the same).
        # Every OTHER round: between barriers the plan grows only 4×over a
        # cheap in-memory leaf, and half the barrier jobs disappear.
        if r % 2 == 0:
            labels = labels.localCheckpoint(eager=True)
        neigh = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        labels = (
            labels.join(neigh, "u", "left")
            .select(
                "u",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
            )
        )
    return labels.select(
        F.col("u").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        (F.col("u") == F.col("lbl")).alias("is_canonical"),
    )


def dup_clusters_sql(pairs_cte_body: str, rounds: int = CC_ROUNDS) -> str:
    """Oracle twin: the same propagation as ``rounds`` unrolled CTEs over any
    pair-producing query (passed in as a CTE body returning doc_a, doc_b)."""
    # MATERIALIZED throughout: DuckDB inlines CTEs, and each round
    # references its predecessor twice — inlined, the pair derivation
    # re-evaluates 2^rounds times (measured 127 s -> ~15 s on d14's oracle)
    ctes = [
        f"pairs AS MATERIALIZED ({pairs_cte_body})",
        "edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs"
        " UNION SELECT doc_b, doc_a FROM pairs)",
        "lab0 AS MATERIALIZED (SELECT u, least(u, min(v)) AS lbl FROM edges GROUP BY u)",
    ]
    prev = "lab0"
    for r in range(1, rounds):
        ctes.append(
            f"lab{r} AS MATERIALIZED (SELECT l.u, least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl "
            f"FROM {prev} l LEFT JOIN edges e ON e.u = l.u "
            f"LEFT JOIN {prev} n ON n.u = e.v GROUP BY l.u, l.lbl)"
        )
        prev = f"lab{r}"
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT u AS doc_id, lbl AS cluster_id, (u = lbl) AS is_canonical FROM {prev}
    """
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every node connects its larger neighbors to the
    minimum of its closed neighborhood.  Emits (v, m) for v ∈ Γ(u), v > u,
    m = min(Γ(u) ∪ {u})."""
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = sym.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient each edge toward its larger endpoint, then
    every node connects its smaller neighbors (and itself) to the minimum.
    Emits (v, m) for v ∈ Γ⁻(u) ∪ {u}, v ≠ m."""
    oriented = edges.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    m = oriented.groupBy("u").agg(F.least(F.col("u"), F.min("v")).alias("m"))
    return (
        oriented.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def cc_alternating(pairs: DataFrame, max_rounds: int = 25) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
    — the at-scale replacement for :func:`dup_clusters`' fixed-round label
    propagation.  Converges in O(log² n) rounds REGARDLESS of component
    diameter, and each round's shuffle is bounded by the current edge count
    (which only shrinks: both stars contract edges toward component minima),
    so a 100 TB pair graph with a pathological million-doc chain still
    terminates; plain propagation would need diameter-many rounds.

    Runs to a detected fixed point (edge multiset stable round-over-round,
    checked with a cheap count+checksum aggregate) — at the fixed point the
    edge set IS the star forest (node → component min), so labels fall out
    without any extra join.  Output matches :func:`dup_clusters`:
    (doc_id, cluster_id, is_canonical) for every node of the pair graph; the
    oracle is TRUE transitive connectivity (recursive CTE), which both this
    and — for diameter ≤ CC_ROUNDS graphs — d07 agree with.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # materialize BEFORE iterating: each star round references the edge
        # frame four times (symmetrized union joined against its own
        # aggregate) — without a barrier here the upstream pair query
        # (MinHash etc.) would execute 4× in round 1
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for r in range(max_rounds):
        edges = _small_star(_large_star(edges))
        # iteration barrier: truncate lineage every round (two join+agg
        # stages per round; without this the plan doubles — see dup_clusters)
        edges = edges.localCheckpoint(eager=True)
        sig = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("u") * 7 + F.col("v")).alias("chk"),
        ).first()
        sig = (sig["n"], sig["chk"])
        if sig == prev_sig:
            break
        prev_sig = sig
    members = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = edges.select(
        F.col("v").alias("doc_id"), F.col("v").alias("cluster_id")
    ).distinct()
    return (
        members.union(roots)
        .distinct()
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        )
    )


def cc_alternating_sql(pairs_cte_body: str) -> str:
    """Oracle: TRUE connected components — min reachable node per node via a
    recursive CTE (terminates because UNION deduplicates the frontier)."""
    return f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({pairs_cte_body}),
    edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs WHERE doc_a <> doc_b
              UNION SELECT doc_b, doc_a FROM pairs WHERE doc_a <> doc_b),
    reach(u, lbl) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.u = e.v
    )
    SELECT u AS doc_id, min(lbl) AS cluster_id, (u = min(lbl)) AS is_canonical
    FROM reach GROUP BY u
    """


def apply_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The end-product dedup pass: surviving doc_ids after dropping (a) exact
    duplicates (keep the min doc_id per md5 group) and (b) non-canonical
    members of MinHash near-duplicate clusters.

    Composition of :func:`exact_dedup` + :func:`minhash_lsh_pairs` +
    :func:`dup_clusters`: survivors = exact keepers ANTI-JOIN near-dup
    losers.  Both inputs to the anti-join are id-only frames — at 100 TB
    the anti-join shuffles longs, never text.
    """
    keepers = exact_dedup(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    losers = dup_clusters(lsh_pairs_ckpt(docs, text_col, id_col)).filter(
        ~F.col("is_canonical")
    ).select(F.col("doc_id").alias(id_col))
    return keepers.join(losers, id_col, "left_anti")


def apply_dedup_sql(table: str = "documents") -> str:
    clusters = dup_clusters_sql(minhash_lsh_pairs_sql(table))
    return f"""
    SELECT keep_id AS doc_id FROM (
      SELECT min(doc_id) AS keep_id FROM {table} GROUP BY md5(text)
    )
    WHERE keep_id NOT IN (
      SELECT doc_id FROM ({clusters}) WHERE NOT is_canonical
    )
    """


# ---------------------------------------------------------------------------
# Chunk-level boilerplate dedup (d13): non-overlapping token-block hashes
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 8  # tokens per non-overlapping chunk


def chunk_dedup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = CHUNK_TOKENS,
) -> DataFrame:
    """Per-document boilerplate fraction at sub-document granularity: split
    each doc into NON-OVERLAPPING ``chunk_tokens``-token blocks, hash each
    block, and report what fraction of a doc's blocks occur more than once
    corpus-wide (within-doc repeats count — a doc repeating its own block IS
    boilerplate).  This is the chunk-level exact-substring dedup pass LLM
    pipelines run between whole-doc exact dedup (d01) and fuzzy dedup (d02):
    it catches shared headers/footers that whole-doc hashing misses and
    near-dup shingling drowns out.

    Scale shape: chunking is a pure projection (token array → ``F.slice``
    per block — no explode of raw text rows); only 16-byte md5 digests enter
    the shuffles (a count window keyed on digest, then the per-doc rollup).
    Digest keys are uniform, so neither shuffle can skew.

    r09 (§2.3/§2.4): the global block count is a COUNT WINDOW partitioned
    by digest instead of a groupBy(digest) aggregate joined back — the join
    form planned the tokenize+chunk+md5 subtree twice (build and probe side
    are different subtrees, so Spark cannot share the scan) and paid three
    exchanges; the window form tokenizes once and pays two.  ``n_occ`` per
    (doc, digest) row is identical by definition, so every downstream
    number (and the oracle) is unchanged."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    chunked = (
        docs.select(F.col(id_col), toks.alias("toks"))
        # Token-less docs have no chunks on either engine (Spark's
        # sequence(0, -1) would otherwise count DOWN; DuckDB's range(0, 0)
        # is empty) — drop them before the chunk transform.
        .filter(F.size("toks") > 0)
        .select(
            id_col,
            F.expr(
                f"transform(sequence(0, int(ceil(size(toks) / {chunk_tokens}.0)) - 1), "
                f"i -> md5(array_join(slice(toks, i * {chunk_tokens} + 1, {chunk_tokens}), ' ')))"
            ).alias("digests"),
        )
        .select(id_col, F.explode("digests").alias("digest"))
    )
    from pyspark.sql import Window as _W

    n_occ = F.count(F.lit(1)).over(_W.partitionBy("digest"))
    per_doc = (
        chunked.withColumn("n_occ", n_occ)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
        )
    )
    return per_doc.select(
        id_col,
        "n_chunks",
        "n_dup_chunks",
        portable_round(
            F.col("n_dup_chunks") / F.col("n_chunks").cast("double"), 6
        ).alias("dup_frac"),
    )


def chunk_dedup_stats_sql(
    table: str = "documents", chunk_tokens: int = CHUNK_TOKENS
) -> str:
    frac = portable_round_sql("n_dup_chunks / CAST(n_chunks AS DOUBLE)", 6)
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM {table}
    ),
    chunked AS (
      SELECT doc_id,
             md5(array_to_string(
               list_slice(toks, i * {chunk_tokens} + 1, (i + 1) * {chunk_tokens}), ' ')) AS digest
      FROM t, unnest(range(0, CAST(ceil(len(toks) / {chunk_tokens}.0) AS BIGINT))) AS u(i)
    ),
    counts AS (SELECT digest, count(*) AS n_occ FROM chunked GROUP BY digest),
    per_doc AS (
      SELECT doc_id, count(*) AS n_chunks,
             CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
      FROM chunked JOIN counts USING (digest) GROUP BY doc_id
    )
    SELECT doc_id, n_chunks, n_dup_chunks, {frac} AS dup_frac FROM per_doc
    """


def apply_embedding_dedup(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int | None = None,
    branch: int | None = None,
) -> DataFrame:
    """Semantic (embedding-space) dedup end product (d14): survivors after
    dropping every non-canonical member of the cosine near-duplicate
    clusters — :func:`embedding_near_dup_2level` pairs →
    :func:`dup_clusters` components → keep the min-id representative.
    The embedding twin of :func:`apply_dedup` (which walks MinHash text
    clusters): both anti-join an id-only loser frame, so at 100 TB the
    final pass shuffles longs, never vectors."""
    pairs = embedding_near_dup_2level(
        embeddings, vec_col, id_col, n_cells=n_cells, branch=branch
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    losers = (
        dup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select(F.col("doc_id").alias(id_col))
    )
    return embeddings.select(id_col).join(losers, id_col, "left_anti")


def apply_embedding_dedup_sql(table: str = "embeddings") -> str:
    pairs_body = (
        "SELECT id_a AS doc_a, id_b AS doc_b FROM ("
        + embedding_near_dup_2level_sql(table)
        + ")"
    )
    clusters = dup_clusters_sql(pairs_body)
    return f"""
    SELECT vec_id FROM {table}
    WHERE vec_id NOT IN (
      SELECT doc_id FROM ({clusters}) WHERE NOT is_canonical
    )
    """


# ---------------------------------------------------------------------------
# Boilerplate removal (d15) — the transformation d13's stats point at
# ---------------------------------------------------------------------------

BOILER_MAX_OCC = 2  # blocks occurring more often corpus-wide are boilerplate


def strip_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = CHUNK_TOKENS,
    max_occ: int = BOILER_MAX_OCC,
) -> DataFrame:
    """Remove corpus-wide duplicated blocks from each document and emit the
    CLEANED text (doc_id, n_blocks, n_kept, clean_text) — the C4-style
    boilerplate strip that d13 only measures: any ``chunk_tokens``-token
    block occurring more than ``max_occ`` times across the corpus (shared
    headers, footers, navigation chrome) is dropped from every document,
    and the survivors are reassembled in original order.

    Scale shape: the boilerplate list is the SMALL side — block digests
    with count > max_occ, a tiny fraction of the corpus — so the removal
    is a LEFT ANTI join of blocks against digests (broadcastable at any
    realistic boilerplate volume).  Reassembly is one groupBy(doc) with an
    order-restoring ``array_sort(collect_list(struct(idx, block)))`` —
    per-doc state is bounded by document length, never corpus size.  Raw
    text shuffles exactly once (the rebuild); the counting aggregate moves
    16-byte digests only."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    base = (
        docs.select(F.col(id_col), toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            id_col,
            F.expr(
                f"transform(sequence(0, int(ceil(size(toks) / {chunk_tokens}.0)) - 1), "
                f"i -> array_join(slice(toks, i * {chunk_tokens} + 1, {chunk_tokens}), ' '))"
            ).alias("blocks"),
        )
    )
    # r09 (§2.3): ONE explode pass carries n_blocks alongside each block, a
    # LEFT join against the tiny boilerplate digest list marks (instead of
    # dropping) boilerplate rows, and one per-doc aggregate produces count,
    # kept-count and the rebuilt text — collect_list skips the NULL structs
    # of marked rows, so the reassembly is identical to the old anti-join
    # form.  The previous shape planned the tokenize+chunk subtree three
    # times (boiler counts, anti-join probe, totals) and paid a final
    # totals⋈rebuilt join; this shape tokenizes twice (the digest-count
    # pass is unavoidable without materializing corpus-scale state) and
    # keeps every row in one rollup, so no doc can drop out.  Raw text
    # still shuffles exactly once (the per-doc rollup); the boilerplate
    # side still moves 16-byte digests only.
    blocks = base.select(
        id_col,
        F.size("blocks").cast("long").alias("n_blocks"),
        F.posexplode("blocks").alias("idx", "block"),
    )
    boiler = (
        blocks.select(F.md5("block").alias("digest"))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") > max_occ)
        .select("digest")
    )
    marked = blocks.join(
        boiler, F.md5(F.col("block")) == F.col("digest"), "left"
    )
    keep = F.col("digest").isNull()
    return marked.groupBy(id_col).agg(
        F.max("n_blocks").alias("n_blocks"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(keep, F.struct(F.col("idx"), F.col("block")))
                    )
                ),
                lambda s: s.block,
            ),
            " ",
        ).alias("clean_text"),
    )


def strip_boilerplate_sql(
    table: str = "documents",
    chunk_tokens: int = CHUNK_TOKENS,
    max_occ: int = BOILER_MAX_OCC,
) -> str:
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM {table}
    ),
    nz AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
    blocks AS (
      SELECT doc_id, i,
             array_to_string(
               list_slice(toks, i * {chunk_tokens} + 1, (i + 1) * {chunk_tokens}), ' ') AS block
      FROM nz, unnest(range(0, CAST(ceil(len(toks) / {chunk_tokens}.0) AS BIGINT))) AS u(i)
    ),
    boiler AS (
      SELECT md5(block) AS digest FROM blocks GROUP BY 1 HAVING count(*) > {max_occ}
    ),
    kept AS (
      SELECT * FROM blocks WHERE md5(block) NOT IN (SELECT digest FROM boiler)
    ),
    rebuilt AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(block, ' ' ORDER BY i) AS clean_text
      FROM kept GROUP BY doc_id
    ),
    totals AS (
      SELECT doc_id, CAST(ceil(len(toks) / {chunk_tokens}.0) AS BIGINT) AS n_blocks
      FROM nz
    )
    SELECT totals.doc_id, totals.n_blocks,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(r.clean_text, '') AS clean_text
    FROM totals LEFT JOIN rebuilt r ON totals.doc_id = r.doc_id
    """


# ---------------------------------------------------------------------------
# PageRank over the near-dup graph (g01) — fixed-point iterative join+agg
# ---------------------------------------------------------------------------

PR_ITERS = 3  # unrolled power iterations
PR_SCALE = 10**12  # fixed-point unit: 1.0 rank == 1e12
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact rational


def pagerank_neardup(docs: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """PageRank over the MinHash near-dup pair graph (undirected →
    symmetric edges), ``iters`` unrolled power iterations in FIXED-POINT
    integer arithmetic: ranks live in units of 1e-12, every contribution
    is ``rank div degree`` (integer floor division) and the damping mix is
    ``(15·SCALE) div 100 + (85·incoming) div 100`` — no float ever enters,
    so the DuckDB oracle replays each iteration bit-for-bit (float
    PageRank sums are order-dependent and would never hash-match).

    Scale shape: each iteration is one equi-join of the rank vector to the
    edge list on the source key plus one aggregate on the destination key
    — the canonical distributed PageRank (Brin & Page '98; the
    Pregel/GraphX formulation) with per-iteration cost O(|E|).  Degrees
    are computed once.  A long-running variant would localCheckpoint
    every few rounds like cc_alternating; at 3 unrolled rounds lineage
    stays shallow.  Long arithmetic holds to ~1e6 nodes×1e12 scale;
    beyond that swap the accumulators to DECIMAL(38,0) unchanged."""
    pairs = lsh_pairs_ckpt(docs)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # The edge list feeds three join branches per iteration; without a
    # materialization barrier the MinHash pair derivation re-executes in
    # every branch and the task binary grows with unrolled lineage.
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # fold the degree onto each edge ONCE — every iteration then needs a
    # single join (rank onto the degree-annotated edges) instead of two
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    base_term = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN
    nodes = edges_deg.select("src").distinct().localCheckpoint(eager=True)
    rank = nodes.select("src", F.lit(PR_SCALE).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            edges_deg.join(rank, "src")
            .select("dst", F.expr("rank div deg").alias("c"))
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        rank = (
            nodes
            .join(incoming, F.col("src") == F.col("dst"), "left")
            .select(
                "src",
                (
                    F.lit(base_term)
                    + F.expr(f"({PR_DAMP_NUM} * coalesce(inc, 0L)) div {PR_DAMP_DEN}")
                ).cast("long").alias("rank"),
            )
        )
    return rank.select(F.col("src").alias("doc_id"), "rank")


def pagerank_neardup_sql(table: str = "documents", iters: int = PR_ITERS) -> str:
    base = str((PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN)
    sql = f"""
    WITH pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(table)})
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    rank0 AS (SELECT src, {PR_SCALE}::BIGINT AS rank FROM deg)
    """
    prev = "rank0"
    for i in range(1, iters + 1):
        sql += f"""
    , contrib{i} AS (
      SELECT e.dst, r.rank // d.deg AS c
      FROM edges e JOIN {prev} r ON r.src = e.src JOIN deg d ON d.src = e.src
    ),
    incoming{i} AS (SELECT dst, SUM(c) AS inc FROM contrib{i} GROUP BY dst),
    rank{i} AS (
      SELECT deg.src,
             ({base} + ({PR_DAMP_NUM} * COALESCE(i.inc, 0)) // {PR_DAMP_DEN})::BIGINT AS rank
      FROM deg LEFT JOIN incoming{i} i ON i.dst = deg.src
    )
    """
        prev = f"rank{i}"
    sql += f"SELECT src AS doc_id, rank FROM {prev}"
    return sql


# ---------------------------------------------------------------------------
# Edit-distance fuzzy matching (d16) — the string-similarity dedup modality
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 2  # maximum Levenshtein distance reported


def fuzzy_name_pairs(
    rows: DataFrame, name_col: str = "p_name", max_dist: int = FUZZY_MAX_DIST
) -> DataFrame:
    """Fuzzy-match pairs by Levenshtein distance ≤ ``max_dist`` — the
    edit-distance modality that completes the near-dup taxonomy (MinHash
    Jaccard d02, SimHash Hamming d04, n-gram d05, embedding cosine d06,
    exact d01).

    Scale design, in order of importance:
    1. **Pair the VOCABULARY, not the rows.**  Distinct names are
       aggregated first (with row counts), so the quadratic stage runs
       over name vocabulary — at 100 TB the name NDV is orders of
       magnitude under row count, and the row mapping rides back on the
       final (small) winner list.
    2. **Token-blocked candidate generation**: an inverted index on the
       name's whitespace tokens proposes only name pairs sharing ≥ 1
       exact token (the standard blocking lever of record-linkage /
       fuzzy-join literature — Gravano et al.'s q-gram filter is this
       with q-grams; tokens fit these space-separated names).  The
       O(vocab²) all-pairs never materializes.  Recall contract,
       documented: a pair whose every token differs (edits spread across
       all tokens) is not proposed.
    3. ``levenshtein()`` — identical classic edit-distance semantics in
       Spark and DuckDB — runs only on proposed pairs."""
    names = rows.groupBy(F.col(name_col).alias("name")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    toks = names.select(
        "name", F.explode(F.split(F.col("name"), r"\s+")).alias("tok")
    )
    a = toks.select(F.col("name").alias("name_a"), "tok")
    b = toks.select(F.col("name").alias("name_b"), "tok")
    cand = (
        a.join(b, "tok")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    scored = cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
    na = names.select(F.col("name").alias("name_a"), F.col("n_rows").alias("n_a"))
    nb = names.select(F.col("name").alias("name_b"), F.col("n_rows").alias("n_b"))
    return scored.join(na, "name_a").join(nb, "name_b").select(
        "name_a", "name_b", "dist", "n_a", "n_b"
    )


def fuzzy_name_pairs_sql(
    table: str = "part", name_col: str = "p_name", max_dist: int = FUZZY_MAX_DIST
) -> str:
    return f"""
    WITH names AS (
      SELECT {name_col} AS name, count(*) AS n_rows FROM {table} GROUP BY 1
    ),
    toks AS (
      SELECT name, unnest(string_split_regex(name, '\\s+')) AS tok FROM names
    ),
    cand AS (
      SELECT DISTINCT a.name AS name_a, b.name AS name_b
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.name < b.name
    ),
    scored AS (
      SELECT name_a, name_b, levenshtein(name_a, name_b)::BIGINT AS dist
      FROM cand
    )
    SELECT s.name_a, s.name_b, s.dist, na.n_rows AS n_a, nb.n_rows AS n_b
    FROM scored s
    JOIN names na ON na.name = s.name_a
    JOIN names nb ON nb.name = s.name_b
    WHERE s.dist <= {max_dist}
    """


# ---------------------------------------------------------------------------
# Triangle counting (g02) — degree-oriented wedge join
# ---------------------------------------------------------------------------


def triangle_counts(docs: DataFrame) -> DataFrame:
    """Per-node triangle counts over the MinHash near-dup pair graph — the
    graph-health metric between PageRank (g01) and connected components
    (d07/d09): triangle-dense neighborhoods are template families / mirror
    sets, triangle-free stars are hub-spoke boilerplate.

    Algorithm: DEGREE-ORIENTED wedge join (Cohen's MapReduce triangle
    counting / the "compact-forward" order) — orient every undirected edge
    from its (degree, id)-smaller endpoint to the larger, build wedges by
    self-joining oriented edges on their source, close each wedge with a
    semi-join against the oriented edge list.  The orientation is the whole
    scale story: joining on the LOW-degree endpoint bounds per-vertex wedge
    fan-out by that vertex's out-degree ≤ O(√m) on any graph, so total
    wedge count is O(m^1.5) worst-case instead of Σ deg² (a single
    celebrity hub never explodes), and every step stays an equi-join —
    no cross product, AQE skew-split handles residual hot keys.  The
    (degree, id) total order is a pure function of the graph, so the
    DuckDB oracle replays the identical orientation.
    """
    return triangle_counts_from_pairs(lsh_pairs_ckpt(docs))


def triangle_counts_from_pairs(pairs: DataFrame) -> DataFrame:
    """The degree-oriented wedge join over any (doc_a < doc_b) pair frame —
    see :func:`triangle_counts` for the algorithm and scale rationale."""
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("u").alias("doc_a"), F.col("deg").alias("da"))
    db = deg.select(F.col("u").alias("doc_b"), F.col("deg").alias("db"))
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("doc_a") < F.col("doc_b"))
    )
    oriented = (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            F.when(fwd, F.col("doc_a")).otherwise(F.col("doc_b")).alias("u"),
            F.when(fwd, F.col("doc_b")).otherwise(F.col("doc_a")).alias("v"),
            F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u"))
        & (
            (F.col("o1.dv") < F.col("o2.dv"))
            | ((F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v")))
        ),
    ).select(
        F.col("o1.u").alias("a"), F.col("o1.v").alias("b"), F.col("o2.v").alias("c")
    )
    # the wedge (b, c) ordering equals the orientation order, so the closing
    # edge — if present — is stored exactly as b→v=c: one semi-join closes it
    tris = wedges.join(
        oriented.select(F.col("u").alias("b"), F.col("v").alias("c")),
        ["b", "c"],
        "left_semi",
    )
    corners = (
        tris.select(F.col("a").alias("doc_id"))
        .unionAll(tris.select(F.col("b").alias("doc_id")))
        .unionAll(tris.select(F.col("c").alias("doc_id")))
    )
    return corners.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_triangles"))


def triangle_counts_sql(table: str = "documents") -> str:
    ord_fwd = "(da.deg < db.deg OR (da.deg = db.deg AND p.doc_a < p.doc_b))"
    return f"""
    WITH pairs AS (SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(table)})),
    sym AS (SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs),
    deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY u),
    oriented AS (
      SELECT CASE WHEN {ord_fwd} THEN p.doc_a ELSE p.doc_b END AS u,
             CASE WHEN {ord_fwd} THEN p.doc_b ELSE p.doc_a END AS v,
             CASE WHEN {ord_fwd} THEN db.deg ELSE da.deg END AS dv
      FROM pairs p
      JOIN deg da ON da.u = p.doc_a
      JOIN deg db ON db.u = p.doc_b
    ),
    wedges AS (
      SELECT o1.u AS a, o1.v AS b, o2.v AS c
      FROM oriented o1 JOIN oriented o2 ON o1.u = o2.u
      WHERE o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v)
    ),
    tris AS (
      SELECT w.a, w.b, w.c FROM wedges w
      WHERE EXISTS (SELECT 1 FROM oriented o WHERE o.u = w.b AND o.v = w.c)
    ),
    corners AS (
      SELECT a AS doc_id FROM tris
      UNION ALL SELECT b FROM tris
      UNION ALL SELECT c FROM tris
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# k-core decomposition (g03) and bounded-hop BFS (g04)
# ---------------------------------------------------------------------------

KCORE_K = 2  # minimum in-core degree
KCORE_ROUNDS = 3  # unrolled peel rounds (near-dup graphs peel in 1-2)


def kcore_members(docs: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> DataFrame:
    """k-core of the near-dup pair graph by ``rounds`` unrolled peeling
    rounds: repeatedly delete nodes of degree < k (with their edges); what
    survives bounded peeling approximates — and for these graphs equals —
    the true k-core (the maximal subgraph of min-degree ≥ k).  The k-core
    separates genuinely dense duplicate families (template farms, mirror
    sets — the structures worth special-casing in a dedup policy) from
    incidental pairwise matches, which a plain connected component cannot:
    a long chain is one component but has an empty 2-core.

    A FIXED round count keeps the result a pure function of the input so
    the oracle replays it as unrolled CTEs (d07's convention); each round
    is one degree aggregate + two semi-joins, all on the shrinking edge
    list, with a lineage barrier per round.  Peeling converges when a
    round deletes nothing; near-dup graphs peel in 1–2 rounds (dense cores
    + shallow fringe), and a run-to-fixed-point variant needs only the
    d09-style count-stable loop.  Output: (doc_id, core_deg) for the
    surviving nodes, core_deg = degree inside the core."""
    pairs = lsh_pairs_ckpt(docs).filter(F.col("doc_a") != F.col("doc_b"))
    return kcore_from_pairs(pairs, k, rounds)


def kcore_from_pairs(pairs: DataFrame, k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> DataFrame:
    """Bounded peeling over any (doc_a, doc_b) pair frame — see
    :func:`kcore_members`."""
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    for _ in range(rounds):
        deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("u")
        edges = (
            edges.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return edges.groupBy("u").agg(F.count(F.lit(1)).alias("core_deg")).select(
        F.col("u").alias("doc_id"), "core_deg"
    )


def kcore_members_sql(table: str = "documents", k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    # every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and each
    # peel round references its predecessor three times — inlined, the peel
    # would re-evaluate the MinHash pair derivation 3^rounds times
    ctes = [
        f"pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(table)}) "
        "WHERE doc_a <> doc_b)",
        "e0 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs "
        "UNION ALL SELECT doc_b, doc_a FROM pairs)",
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"k{r} AS MATERIALIZED (SELECT u FROM "
            f"(SELECT u, count(*) AS deg FROM {prev} GROUP BY u) "
            f"WHERE deg >= {k})"
        )
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT e.u, e.v FROM {prev} e "
            f"WHERE e.u IN (SELECT u FROM k{r}) AND e.v IN (SELECT u FROM k{r}))"
        )
        prev = f"e{r}"
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT u AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
    FROM {prev} GROUP BY u
    """
    )


BFS_SEED_MOD = 7  # nodes with doc_id % this == 0 are distance-0 seeds
BFS_HOPS = 4  # unrolled relaxation rounds = max reported distance


def bfs_distances(docs: DataFrame, seed_mod: int = BFS_SEED_MOD, hops: int = BFS_HOPS) -> DataFrame:
    """Bounded-hop BFS distances over the near-dup pair graph from a seed
    set (doc_id % ``seed_mod`` == 0 — a fixed fraction of the corpus at
    any scale): ``hops`` unrolled relaxation rounds of
    dist'(v) = min(dist(v), min over in-neighbors u of dist(u)+1) — the
    provenance query of a dedup graph ("how many hops from a known-bad
    seed is this doc?"), and the building block of seed-expansion
    contamination sweeps.

    Each round is one edge join + one min aggregate (O(|E|), the g01
    iteration shape) with a lineage barrier; a fixed hop budget both
    bounds cost at 100 TB (frontier work only grows while new nodes are
    reachable) and keeps the result SQL-replayable as unrolled CTEs —
    run-to-convergence needs diameter-many rounds, which d09's
    alternating-star sidesteps for components but no BFS can.  Output:
    (doc_id, dist ≤ hops) for reached graph nodes only."""
    pairs = lsh_pairs_ckpt(docs).filter(F.col("doc_a") != F.col("doc_b"))
    return bfs_from_pairs(pairs, seed_mod, hops)


def bfs_from_pairs(pairs: DataFrame, seed_mod: int = BFS_SEED_MOD, hops: int = BFS_HOPS) -> DataFrame:
    """Bounded-hop relaxation over any (doc_a, doc_b) pair frame — see
    :func:`bfs_distances`."""
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionByName(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    ).localCheckpoint(eager=True)
    nodes = edges.select("u").distinct()
    dist = nodes.filter(F.col("u") % seed_mod == 0).select(
        "u", F.lit(0).cast("long").alias("dist")
    )
    for _ in range(hops):
        via = (
            edges.join(dist.withColumnRenamed("u", "v"), "v")
            .select("u", (F.col("dist") + 1).alias("nd"))
        )
        dist = (
            dist.select("u", F.col("dist").alias("nd"))
            .unionByName(via.select("u", "nd"))
            .groupBy("u")
            .agg(F.min("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist.select(F.col("u").alias("doc_id"), "dist")


def bfs_distances_sql(
    table: str = "documents", seed_mod: int = BFS_SEED_MOD, hops: int = BFS_HOPS
) -> str:
    # MATERIALIZED: each round references its predecessor twice (see the
    # kcore oracle note on DuckDB CTE inlining)
    ctes = [
        f"pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(table)}) "
        "WHERE doc_a <> doc_b)",
        "edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs "
        "UNION ALL SELECT doc_b, doc_a FROM pairs)",
        f"d0 AS MATERIALIZED (SELECT u, 0::BIGINT AS dist FROM (SELECT DISTINCT u FROM edges) "
        f"WHERE u % {seed_mod} = 0)",
    ]
    prev = "d0"
    for r in range(1, hops + 1):
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT u, min(nd) AS dist FROM ("
            f"SELECT u, dist AS nd FROM {prev} "
            f"UNION ALL "
            f"SELECT e.u, p.dist + 1 AS nd FROM edges e JOIN {prev} p ON p.u = e.v"
            f") GROUP BY u)"
        )
        prev = f"d{r}"
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT u AS doc_id, dist FROM {prev}\n    "
    )


# ---------------------------------------------------------------------------
# Shingle containment (d17) — the asymmetric near-dup measure
# ---------------------------------------------------------------------------

CONTAIN_T = 0.8  # containment threshold: |A ∩ B| / |A| ≥ this


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    inv: DataFrame | None = None,
) -> DataFrame:
    """DIRECTED containment pairs (Broder's resemblance-vs-containment
    distinction): (inner, outer) where ≥ ``CONTAIN_T`` of the inner doc's
    shingles appear in the outer doc.  This is the near-dup modality
    symmetric Jaccard (d02/d05) structurally cannot catch: a short doc
    quoted whole inside a much longer one has tiny Jaccard but containment
    ≈ 1 — exactly the quote-expansion / page-plus-boilerplate duplicates a
    corpus-dedup policy wants to see.

    Same scale anatomy as d05 (one inverted index, DF-capped self-join,
    pair rollup), but the pair keeps BOTH directions (a < b ordering would
    erase which side is contained) and divides by the INNER size only.
    Exact-ordering note: the self-join emits each unordered pair once per
    direction via a != b, so no pair double-counts."""
    if inv is None:
        inv = shingle_index(docs, text_col, id_col).persist()
    sizes = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # df = 1 shingles can never co-occur — same semantics-free join-input
    # cut as d05 (inner sizes come from the unfiltered index)
    df_ok = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
        (F.col("df") <= NGRAM_MAX_DF) & (F.col("df") >= 2)
    )
    inv = inv.join(df_ok.select("g"), "g")
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("inner_id"), F.col("b.doc_id").alias("outer_id")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    si = sizes.select(F.col("doc_id").alias("inner_id"), F.col("n_sh").alias("n_inner"))
    cont = F.col("n_common").cast("double") / F.col("n_inner").cast("double")
    return (
        common.join(si, "inner_id")
        .select(
            "inner_id", "outer_id", portable_round(cont, 6).alias("containment")
        )
        .filter(F.col("containment") >= CONTAIN_T)
    )


def containment_pairs_sql(table: str = "documents") -> str:
    cont = "n_common::DOUBLE / len(si.sh)::DOUBLE"
    return f"""
    WITH words AS ({_words_cte(table)}),
    shset AS (SELECT doc_id, {_shingle_hashes_sql()} AS sh FROM words),
    inv0 AS MATERIALIZED (SELECT doc_id, unnest(sh) AS g FROM shset),
    df_ok AS (SELECT g FROM inv0 GROUP BY g
              HAVING count(*) BETWEEN 2 AND {NGRAM_MAX_DF}),
    inv AS MATERIALIZED (SELECT inv0.doc_id, inv0.g FROM inv0 JOIN df_ok USING (g)),
    common AS (SELECT a.doc_id AS inner_id, b.doc_id AS outer_id, count(*) AS n_common
               FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id != b.doc_id
               GROUP BY 1, 2)
    SELECT inner_id, outer_id, {portable_round_sql(cont, 6)} AS containment
    FROM common
    JOIN shset si ON si.doc_id = inner_id
    WHERE {portable_round_sql(cont, 6)} >= {CONTAIN_T}
    """


# ---------------------------------------------------------------------------
# MinHash calibration (d18) — sketch estimate vs exact Jaccard, in-engine
# ---------------------------------------------------------------------------


def minhash_calibration(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-pair MinHash CALIBRATION (d18): for every verified near-dup pair
    (d02's output), the sketch's own Jaccard estimate — the fraction of the
    MINHASH_K signature components that agree — next to the exact shingle
    Jaccard, with the signed error.  s11 does this for the LSH ANN index;
    this is the text-sketch twin: the measurement that justifies (or
    indicts) MINHASH_K before anyone trusts the sketch at 100 TB, as an
    engine query over the same one inverted-index pass.

    Shapes: ONE :func:`minhash_perdoc` aggregate feeds both the pair
    derivation and the component comparison (a 12-row-per-doc explode
    equi-joined on (pair, component index)) — bounded by pairs × K,
    never corpus²."""
    perdoc = minhash_perdoc(shingle_index(docs, text_col, id_col)).persist()
    pairs = _pairs_from_perdoc(perdoc).select("doc_a", "doc_b", "jaccard")
    comp = perdoc.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"m{j}") for j in range(len(_MINHASH_AB))])).alias(
            "j", "m"
        ),
    )
    ca = comp.select(
        F.col("doc_id").alias("doc_a"), F.col("j").alias("ja"), F.col("m").alias("ma")
    )
    cb = comp.select(
        F.col("doc_id").alias("doc_b2"), F.col("j").alias("jb"), F.col("m").alias("mb")
    )
    agree = (
        pairs.join(ca, "doc_a")
        .join(cb, (F.col("doc_b") == F.col("doc_b2")) & (F.col("ja") == F.col("jb")))
        .groupBy("doc_a", "doc_b", "jaccard")
        .agg(
            F.sum(F.when(F.col("ma") == F.col("mb"), 1).otherwise(0)).alias("n_agree")
        )
    )
    k = len(_MINHASH_AB)
    est = F.col("n_agree").cast("double") / F.lit(float(k))
    return agree.select(
        "doc_a",
        "doc_b",
        "jaccard",
        "n_agree",
        portable_round(est, 6).alias("est_jaccard"),
        portable_round(est - F.col("jaccard"), 6).alias("err"),
    )


def minhash_calibration_sql(table: str = "documents") -> str:
    k = len(_MINHASH_AB)
    perm_mins = ",\n             ".join(
        f"coalesce(list_min(list_transform(sh, x -> {minhash_perm_sql('x', a, b)})), "
        f"{MERSENNE61}) AS m{j}"
        for j, (a, b) in enumerate(_MINHASH_AB)
    )
    agree = " + ".join(
        f"CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END" for j in range(k)
    )
    est = f"(({agree})::DOUBLE / {float(k)})"
    return f"""
    WITH pairs AS MATERIALIZED (
      SELECT doc_a, doc_b, jaccard FROM ({minhash_lsh_pairs_sql(table)})
    ),
    words AS ({_words_cte(table)}),
    shset AS (SELECT doc_id, {_shingle_hashes_sql()} AS sh FROM words),
    sigs AS MATERIALIZED (
      SELECT doc_id,
             {perm_mins}
      FROM shset
    )
    SELECT p.doc_a, p.doc_b, p.jaccard,
           CAST({agree} AS BIGINT) AS n_agree,
           {portable_round_sql(est, 6)} AS est_jaccard,
           {portable_round_sql(f"{est} - p.jaccard", 6)} AS err
    FROM pairs p
    JOIN sigs sa ON sa.doc_id = p.doc_a
    JOIN sigs sb ON sb.doc_id = p.doc_b
    """


# ---------------------------------------------------------------------------
# Duplicated token spans (d19) — the exact-substring dedup modality
# ---------------------------------------------------------------------------

SPAN_K = 8  # overlapping window width (tokens) — the match "seed"
SPAN_MAX_DF = 20  # stop-gram cap: windows occurring more often corpus-wide drop
SPAN_MIN_TOKENS = 10  # report pairs whose longest shared span reaches this


def span_dup_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicated TOKEN SPANS across documents (the substring-level
    dedup of Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better") — per unordered doc pair, the longest run of identically
    ordered shared tokens and how many distinct runs reach ``SPAN_MIN_TOKENS``.

    d13/d15 hash NON-overlapping fixed blocks, so a duplicate shifted by one
    token escapes them; d02/d05 measure SET overlap, so they cannot say
    *where* or *how long*.  This operator closes that gap with overlapping
    ``SPAN_K``-token windows at every position:

    1. positional window index (doc_id, pos, h32(gram)) — posexplode + lead()
       window, one shuffle on doc_id; the gram string never leaves the map
       side (only its 8-byte hash is kept).
    2. stop-gram cap (``SPAN_MAX_DF`` occurrences corpus-wide) bounds the
       self-join fan-out exactly like d05's stop-shingle cap.
    3. window-hash equi-join (doc_a < doc_b) emits (pair, pos_a, pos_b)
       seeds; never a cross product.
    4. seeds on the same DIAGONAL (pos_b − pos_a) with consecutive pos_a
       form one span — the classic islands trick (pos_a − row_number), one
       window pass per pair partition.  A run of R consecutive seeds is a
       shared span of R + SPAN_K − 1 tokens.

    Scale: everything after the positional index is bounded by matching
    seeds (duplicated windows), not corpus size; the diagonal window
    partitions by (pair, diagonal) — millions of small partitions, no
    single hot key.  Reference anatomy: Scan.java/Select.java give only
    full-row equality; this is the span-level analog built the same
    inverted-index way as d05 (dedup.py:427)."""
    from pyspark.sql import Window as W

    from spj_query_engine_spark.operators.core import spread

    words = F.split(F.col(text_col), r"\s+")
    tok = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"), F.posexplode(words).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, SPAN_K)]
    grams = tok.select(
        "doc_id", "pos", F.concat_ws(" ", *leads).alias("gram"), leads[-1].alias("tail")
    ).filter(F.col("tail").isNotNull())
    idx = grams.select("doc_id", "pos", h32(F.col("gram")).alias("g"))
    # the self-join can only emit a seed from a gram that occurs >= 2 times
    # AND in >= 2 distinct docs (the join needs doc_a < doc_b) — filtering
    # those up front shrinks the join input from the whole positional index
    # (corpus-sized, overwhelmingly unique grams) to just the duplicated
    # windows; output is identical, measured 44x -> ~5x wall at 100x input
    ok = (
        idx.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("doc_id").alias("d_lo"),
            F.max("doc_id").alias("d_hi"),
        )
        .filter(
            (F.col("c") <= SPAN_MAX_DF)
            & (F.col("c") >= 2)
            & (F.col("d_lo") != F.col("d_hi"))
        )
        .select("g")
    )
    idx = idx.join(ok, "g")
    a, b = idx.alias("a"), idx.alias("b")
    seeds = a.join(
        b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pa"),
        (F.col("b.pos") - F.col("a.pos")).alias("d"),
    )
    iw = W.partitionBy("doc_a", "doc_b", "d").orderBy("pa")
    isl = seeds.withColumn("isl", F.col("pa") - F.row_number().over(iw))
    spans = isl.groupBy("doc_a", "doc_b", "d", "isl").agg(
        (F.count(F.lit(1)) + F.lit(SPAN_K - 1)).alias("span_tokens")
    )
    return (
        spans.groupBy("doc_a", "doc_b")
        .agg(
            F.max("span_tokens").alias("max_span"),
            F.sum(
                F.when(F.col("span_tokens") >= SPAN_MIN_TOKENS, 1).otherwise(0)
            ).alias("n_spans"),
        )
        .filter(F.col("max_span") >= SPAN_MIN_TOKENS)
    )


def span_dup_pairs_sql(table: str = "documents") -> str:
    gram = " || ' ' || ".join(f"w[i + {j + 1}]" for j in range(SPAN_K))
    return f"""
    WITH words AS ({_words_cte(table)}),
    grams AS (SELECT doc_id,
                     unnest(list_transform(range(len(w) - {SPAN_K - 1}), i -> {gram})) AS gram,
                     unnest(range(len(w) - {SPAN_K - 1})) AS pos
              FROM words),
    idx0 AS MATERIALIZED (SELECT doc_id, pos, {h32_sql("gram")} AS g FROM grams),
    ok AS (SELECT g FROM idx0 GROUP BY g
           HAVING count(*) BETWEEN 2 AND {SPAN_MAX_DF}
              AND min(doc_id) != max(doc_id)),
    idx AS MATERIALIZED (
      SELECT idx0.doc_id, idx0.pos, idx0.g FROM idx0 JOIN ok USING (g)),
    seeds AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa,
                     b.pos - a.pos AS d
              FROM idx a JOIN idx b ON a.g = b.g AND a.doc_id < b.doc_id),
    isl AS (SELECT doc_a, doc_b, d, pa,
                   pa - row_number() OVER (PARTITION BY doc_a, doc_b, d ORDER BY pa) AS isl
            FROM seeds),
    spans AS (SELECT doc_a, doc_b, d, isl, count(*) + {SPAN_K - 1} AS span_tokens
              FROM isl GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b,
           CAST(max(span_tokens) AS BIGINT) AS max_span,
           CAST(sum(CASE WHEN span_tokens >= {SPAN_MIN_TOKENS} THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
    FROM spans GROUP BY 1, 2
    HAVING max(span_tokens) >= {SPAN_MIN_TOKENS}
    """


# ---------------------------------------------------------------------------
# Common-neighbor link prediction (g05) — the missed-duplicate suggester
# ---------------------------------------------------------------------------

CN_HUB_CAP = 50  # centers with degree above this do not generate wedges
CN_MIN_JACCARD = 0.25  # report candidate links at/above this neighborhood overlap


def fused_dup_edges(docs: DataFrame) -> DataFrame:
    """The FUSED near-dup graph: the distinct union of every pair modality
    in this module — MinHash LSH (d02), SimHash Hamming (d04), n-gram
    Jaccard (d05), directed containment (d17, symmetrized), duplicated
    spans (d19).  Each modality catches duplicates the others miss; their
    union is the graph a production dedup pipeline actually reasons over.
    Each source is a bounded equi-join pipeline, so the union inherits
    every skew cap; distinct() collapses cross-modality agreement.

    Execution shape (guide §2.6): the five modality pipelines are
    INDEPENDENT — one union plan runs them as one mostly-serial stage DAG,
    leaving the cluster idle through every pipeline's straggler tail.
    Materializing each modality as its own concurrent job (a small driver
    thread pool; actions were only sequential because the driver called
    them sequentially) bounds the wall by the slowest modality instead of
    the sum.  The shared shingle index materializes ONCE (eager barrier)
    before the fan-out so concurrent branches read it instead of racing to
    compute it.  Pair frames are near-dup OUTPUT — bounded — so the
    barriers are 100 TB-safe; under SPJ_LAZY_PLANS (plan-hygiene audits)
    every barrier no-ops and the full lazy union is returned unchanged."""
    from spj_query_engine_spark.operators.core import barrier

    inv = barrier(shingle_index(docs))  # ONE index serves mh/ng/ct
    builders = [
        lambda: minhash_lsh_pairs(docs, inv=inv).select("doc_a", "doc_b"),
        lambda: simhash_pairs(docs).select("doc_a", "doc_b"),
        lambda: ngram_jaccard_pairs(docs, inv=inv).select("doc_a", "doc_b"),
        lambda: containment_pairs(docs, inv=inv).select(
            F.least("inner_id", "outer_id").alias("doc_a"),
            F.greatest("inner_id", "outer_id").alias("doc_b"),
        ),
        lambda: span_dup_pairs(docs).select("doc_a", "doc_b"),
    ]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        mh, sh, ng, ct, sp = pool.map(lambda b: barrier(b()), builders)
    return (
        mh.unionByName(sh)
        .unionByName(ng)
        .unionByName(ct)
        .unionByName(sp)
        .distinct()
    )


def common_neighbor_pairs(docs: DataFrame) -> DataFrame:
    """Link prediction over the FUSED near-dup graph: NON-adjacent node
    pairs ranked by neighborhood Jaccard |N(u)∩N(w)| / |N(u)∪N(w)| — the
    classic common-neighbors predictor (Liben-Nowell & Kleinberg 2003).
    On a dedup graph these are the pairs every modality *missed*: two docs
    never paired directly whose near-dup neighborhoods overlap heavily are
    almost certainly duplicates themselves — the recall-repair query a
    production dedup pipeline runs after every index build.  The fused
    graph (rather than d02 alone) is what gives the predictor signal:
    cross-modality wedges (A—B by MinHash, B—C by containment) propose
    A—C candidates no single index could.

    Scale anatomy: wedges come from a self-join of the symmetrized edge
    list on its center, so fan-out is Σ deg(center)² — the one quadratic
    hazard.  ``CN_HUB_CAP`` bounds it exactly like d05's stop-shingle cap:
    hub centers (boilerplate attractors) are excluded from wedge
    generation, everything else is equi-joins + one rollup on the
    candidate pair.  Degrees always count the FULL graph (the cap limits
    wedge generation only, not the denominator)."""
    from spj_query_engine_spark.operators.core import coarse_materialize

    # all five modality derivations materialize inside the coarse scope
    pairs = coarse_materialize(fused_dup_edges, docs)
    return common_neighbor_pairs_from_pairs(pairs)


def common_neighbor_pairs_from_pairs(pairs: DataFrame) -> DataFrame:
    sym = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    centers = sym.join(
        deg.filter(F.col("deg") <= CN_HUB_CAP).select("u"), "u"
    )  # (center u, spoke v)
    w1 = centers.select(F.col("u").alias("c"), F.col("v").alias("a"))
    w2 = centers.select(F.col("u").alias("c"), F.col("v").alias("b"))
    cand = (
        w1.alias("w1")
        .join(
            w2.alias("w2"),
            (F.col("w1.c") == F.col("w2.c")) & (F.col("w1.a") < F.col("w2.b")),
        )
        .groupBy(F.col("w1.a").alias("doc_a"), F.col("w2.b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # drop pairs that are already edges — we predict MISSING links
    cand = cand.join(pairs, ["doc_a", "doc_b"], "left_anti")
    da = deg.select(F.col("u").alias("doc_a"), F.col("deg").alias("da"))
    db = deg.select(F.col("u").alias("doc_b"), F.col("deg").alias("db"))
    jac = F.col("n_common").cast("double") / (
        F.col("da") + F.col("db") - F.col("n_common")
    ).cast("double")
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            portable_round(jac, 6).alias("nbr_jaccard"),
        )
        .filter(F.col("nbr_jaccard") >= CN_MIN_JACCARD)
    )


def fused_dup_edges_sql(table: str = "documents") -> str:
    return f"""
    SELECT DISTINCT doc_a, doc_b FROM (
      SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(table)})
      UNION ALL SELECT doc_a, doc_b FROM ({simhash_pairs_sql(table)})
      UNION ALL SELECT doc_a, doc_b FROM ({ngram_jaccard_pairs_sql(table)})
      UNION ALL SELECT least(inner_id, outer_id), greatest(inner_id, outer_id)
                 FROM ({containment_pairs_sql(table)})
      UNION ALL SELECT doc_a, doc_b FROM ({span_dup_pairs_sql(table)})
    )
    """


def common_neighbor_pairs_sql(table: str = "documents") -> str:
    jac = "n_common::DOUBLE / (da.deg + db.deg - n_common)::DOUBLE"
    return f"""
    WITH pairs AS MATERIALIZED (
      {fused_dup_edges_sql(table)}
    ),
    sym AS (SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs),
    deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY u),
    centers AS (
      SELECT s.u, s.v FROM sym s JOIN deg d ON d.u = s.u
      WHERE d.deg <= {CN_HUB_CAP}
    ),
    cand AS (
      SELECT w1.v AS doc_a, w2.v AS doc_b, count(*) AS n_common
      FROM centers w1 JOIN centers w2 ON w1.u = w2.u AND w1.v < w2.v
      GROUP BY 1, 2
    ),
    missing AS (
      SELECT c.* FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM pairs p
                        WHERE p.doc_a = c.doc_a AND p.doc_b = c.doc_b)
    )
    SELECT m.doc_a, m.doc_b, CAST(n_common AS BIGINT) AS n_common,
           {portable_round_sql(jac, 6)} AS nbr_jaccard
    FROM missing m
    JOIN deg da ON da.u = m.doc_a
    JOIN deg db ON db.u = m.doc_b
    WHERE {portable_round_sql(jac, 6)} >= {CN_MIN_JACCARD}
    """


# ---------------------------------------------------------------------------
# Dedup modality impact report (d20) — recall attribution across indexes
# ---------------------------------------------------------------------------


def dedup_impact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Recall ATTRIBUTION across the five near-dup modalities: per modality
    the pair count, distinct docs touched, and — the decision-driving
    number — how many pairs ONLY that modality found.  A modality with
    zero unique pairs is pure cost at 100 TB and can be dropped from the
    fused index; one with many is irreplaceable.  This is the dashboard a
    dedup pipeline publishes after every index build, and the fused-graph
    twin of s11/d18's per-index calibrations.

    Shape: each modality's pair set is its own bounded equi-join pipeline
    (mh/ng/ct share ONE persisted shingle index); the attribution itself
    is a tagged union → one rollup keyed by pair (pairs, not corpus) → one
    rollup keyed by modality (six rows out).  The FUSED row reports the
    distinct union and the total single-modality pairs."""
    from spj_query_engine_spark.operators.core import coarse_materialize

    def _build_tagged(d: DataFrame) -> DataFrame:
        inv = shingle_index(d, text_col, id_col).persist()
        sources = [
            ("minhash", minhash_lsh_pairs(d, text_col, id_col, inv=inv).select("doc_a", "doc_b")),
            ("simhash", simhash_pairs(d, text_col, id_col).select("doc_a", "doc_b")),
            ("ngram", ngram_jaccard_pairs(d, text_col, id_col, inv=inv).select("doc_a", "doc_b")),
            (
                "containment",
                containment_pairs(d, text_col, id_col, inv=inv)
                .select(
                    F.least("inner_id", "outer_id").alias("doc_a"),
                    F.greatest("inner_id", "outer_id").alias("doc_b"),
                )
                .distinct(),
            ),
            ("span", span_dup_pairs(d, text_col, id_col).select("doc_a", "doc_b")),
        ]
        out = None
        for tag, df in sources:
            t = df.select("doc_a", "doc_b", F.lit(tag).alias("modality"))
            out = t if out is None else out.unionByName(t)
        return out

    tagged = coarse_materialize(_build_tagged, docs)
    nm = tagged.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_modalities")
    )
    per_pairs = tagged.join(nm, ["doc_a", "doc_b"]).groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("n_modalities") == 1, 1).otherwise(0)).alias(
            "n_unique_pairs"
        ),
    )
    endpoints = tagged.select("modality", F.col("doc_a").alias("d")).unionByName(
        tagged.select("modality", F.col("doc_b").alias("d"))
    )
    per_docs = endpoints.groupBy("modality").agg(
        F.countDistinct("d").alias("n_docs")
    )
    per = per_pairs.join(per_docs, "modality").select(
        "modality", "n_pairs", "n_docs", "n_unique_pairs"
    )
    fused = nm.select(
        F.lit("FUSED").alias("modality"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.lit(None).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_modalities") == 1, 1).otherwise(0)).alias(
            "n_unique_pairs"
        ),
    )
    fused_docs = (
        nm.select(F.col("doc_a").alias("d"))
        .unionByName(nm.select(F.col("doc_b").alias("d")))
        .agg(F.countDistinct("d").alias("nd"))
    )
    fused = fused.crossJoin(fused_docs).select(
        "modality", "n_pairs", F.col("nd").alias("n_docs"), "n_unique_pairs"
    )
    return per.unionByName(fused)


def dedup_impact_sql(table: str = "documents") -> str:
    return f"""
    WITH tagged AS MATERIALIZED (
      SELECT doc_a, doc_b, 'minhash' AS modality FROM ({minhash_lsh_pairs_sql(table)})
      UNION ALL SELECT doc_a, doc_b, 'simhash' FROM ({simhash_pairs_sql(table)})
      UNION ALL SELECT doc_a, doc_b, 'ngram' FROM ({ngram_jaccard_pairs_sql(table)})
      UNION ALL SELECT DISTINCT least(inner_id, outer_id), greatest(inner_id, outer_id),
                       'containment' FROM ({containment_pairs_sql(table)})
      UNION ALL SELECT doc_a, doc_b, 'span' FROM ({span_dup_pairs_sql(table)})
    ),
    nm AS MATERIALIZED (
      SELECT doc_a, doc_b, count(*) AS n_modalities FROM tagged GROUP BY 1, 2
    ),
    per_pairs AS (
      SELECT t.modality,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN nm.n_modalities = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique_pairs
      FROM tagged t
      JOIN nm ON nm.doc_a = t.doc_a AND nm.doc_b = t.doc_b
      GROUP BY t.modality
    ),
    per_docs AS (
      SELECT modality, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
      FROM (SELECT modality, doc_a AS d FROM tagged
            UNION ALL SELECT modality, doc_b FROM tagged)
      GROUP BY modality
    ),
    per AS (
      SELECT p.modality, p.n_pairs, d.n_docs, p.n_unique_pairs
      FROM per_pairs p JOIN per_docs d ON d.modality = p.modality
    ),
    fused AS (
      SELECT 'FUSED' AS modality,
             CAST(count(*) AS BIGINT) AS n_pairs,
             (SELECT CAST(count(DISTINCT d) AS BIGINT)
              FROM (SELECT doc_a AS d FROM nm UNION ALL SELECT doc_b FROM nm)) AS n_docs,
             CAST(sum(CASE WHEN n_modalities = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique_pairs
      FROM nm
    )
    SELECT * FROM per UNION ALL SELECT * FROM fused
    """


# ---------------------------------------------------------------------------
# LSH band tuning sweep (d21) — design-of-experiments for the index itself
# ---------------------------------------------------------------------------

BAND_SWEEP = (2, 3, 4, 6)  # band counts over the MINHASH_K=12 signature


def lsh_band_tuning(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """LSH BAND-COUNT sweep: for each way of cutting the 12-component
    signature into b bands of 12/b rows, the candidate-pair count and the
    exact-Jaccard-verified count — the S-curve trade every LSH deployment
    tunes (more bands → higher recall, more junk candidates; fewer → the
    reverse).  d18 calibrates the sketch's ESTIMATES; this calibrates the
    BANDING — together they are the measurements that justify d02's
    (6 × 2) choice before anyone trusts it at 100 TB.

    Cost anatomy: ONE signature pass (the d02 MIN aggregates) feeds every
    config; per config one band equi-join (bounded exactly like d02's);
    verification joins the shingle index only for the DISTINCT union of
    candidates across configs.  Candidate sets nest only where the finer
    cut subdivides a coarser band exactly (2→3, 2→4, 2→6, 3→6, 4→6 of
    the 12-component signature); the 3→4 cut misaligns (no 3-row band
    lies inside a 4-row band), so the union — not a superset assumption —
    is what makes one verification pass sound.  Output is one row per
    config — integers only."""
    sigs = minhash_perdoc(shingle_index(docs, text_col, id_col)).persist()
    k = len(_MINHASH_AB)
    all_cands = None
    for nb in BAND_SWEEP:
        rows = k // nb
        bands = sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.concat_ws(
                                "_",
                                *[F.col(f"m{b * rows + r}") for r in range(rows)],
                            ).alias("key"),
                        )
                        for b in range(nb)
                    ]
                )
            ).alias("bk"),
        ).select("doc_id", "bk.band", "bk.key")
        a, b_ = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(
                b_,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
            .withColumn("n_bands", F.lit(nb))
        )
        all_cands = cand if all_cands is None else all_cands.unionByName(cand)
    all_cands = all_cands.localCheckpoint(eager=True)
    distinct_pairs = all_cands.select("doc_a", "doc_b").distinct()
    verified = _verify_jaccard(distinct_pairs, sigs).select("doc_a", "doc_b")
    tagged = all_cands.join(verified.withColumn("ok", F.lit(1)), ["doc_a", "doc_b"], "left")
    prec = F.expr("(n_verified * 1000000) div greatest(n_candidates, 1)")
    return (
        tagged.groupBy("n_bands")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.coalesce(F.col("ok"), F.lit(0))).alias("n_verified"),
        )
        .select(
            F.col("n_bands").cast("long").alias("n_bands"),
            (F.lit(k) / F.col("n_bands")).cast("long").alias("rows_per_band"),
            "n_candidates",
            "n_verified",
            prec.alias("precision_ppm"),
        )
    )


def lsh_band_tuning_sql(table: str = "documents") -> str:
    k = len(_MINHASH_AB)
    perm_mins = ",\n             ".join(
        f"list_min(list_transform(sh, x -> {minhash_perm_sql('x', a, b)})) AS m{j}"
        for j, (a, b) in enumerate(_MINHASH_AB)
    )
    cand_ctes = []
    cand_union = []
    for nb in BAND_SWEEP:
        rows = k // nb
        band_selects = " UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, "
            + " || '_' || ".join(f"m{b * rows + r}" for r in range(rows))
            + " AS key FROM sigs"
            for b in range(nb)
        )
        cand_ctes.append(
            f"""cand{nb} AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ({band_selects}) a JOIN ({band_selects}) b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )"""
        )
        cand_union.append(f"SELECT doc_a, doc_b, {nb} AS n_bands FROM cand{nb}")
    jacc = (
        "len(list_intersect(sa.sh, sb.sh))::DOUBLE / "
        "greatest(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)), 1)::DOUBLE"
    )
    return f"""
    WITH words AS ({_words_cte(table)}),
    shset AS MATERIALIZED (
      SELECT doc_id, {_shingle_hashes_sql()} AS sh FROM words
    ),
    sigs AS MATERIALIZED (
      SELECT doc_id,
             {perm_mins}
      FROM shset WHERE len(sh) > 0
    ),
    {", ".join(cand_ctes)},
    all_cands AS MATERIALIZED ({" UNION ALL ".join(cand_union)}),
    verified AS MATERIALIZED (
      SELECT p.doc_a, p.doc_b
      FROM (SELECT DISTINCT doc_a, doc_b FROM all_cands) p
      JOIN shset sa ON sa.doc_id = p.doc_a
      JOIN shset sb ON sb.doc_id = p.doc_b
      WHERE {portable_round_sql(jacc, 6)} >= {JACCARD_T}
    )
    SELECT CAST(c.n_bands AS BIGINT) AS n_bands,
           CAST({k} // c.n_bands AS BIGINT) AS rows_per_band,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN v.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_verified,
           CAST((sum(CASE WHEN v.doc_a IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
                // greatest(count(*), 1) AS BIGINT) AS precision_ppm
    FROM all_cands c
    LEFT JOIN verified v ON v.doc_a = c.doc_a AND v.doc_b = c.doc_b
    GROUP BY c.n_bands
    """


# ---------------------------------------------------------------------------
# Sentence-level dedup (d22) — the C4-style boilerplate-sentence census
# ---------------------------------------------------------------------------

SENT_TOP_K = 20  # most-duplicated sentences reported
SENT_MIN_OCC = 2  # a sentence is "duplicated" at this corpus-wide count
SENT_PREFIX = 40  # exemplar prefix carried for humans


def sentence_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sentence-level duplication census: the ``SENT_TOP_K`` most-repeated
    sentences corpus-wide with their occurrence and document counts — the
    natural-language-unit dedup granularity C4 (Raffel et al. 2020)
    dedupes on (they drop repeated three-sentence spans) and RefinedWeb's
    line-level filter approximates.  d13/d19 work on fixed token windows;
    sentences are the unit an editor actually copies, so this census IS
    the boilerplate removal worklist (cookie banners, footers, licence
    blurbs).

    Shape: one split+explode projection (sentence text never shuffles —
    only its md5 and a ``SENT_PREFIX``-char exemplar), one digest rollup,
    a support filter, then the two-phase salted top-k (no single-partition
    window).  Sentence boundaries are the same ASCII ``[.!?]+`` split +
    explicit strip charset as the u06 UDTF, so every sentence-level
    operator in the repo segments identically."""
    sent = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), r"[.!?]+")).alias("raw"),
        )
        .select("doc_id", F.expr("trim(BOTH ' \t\n\r' FROM raw)").alias("sentence"))
        .filter(F.col("sentence") != "")
    )
    from pyspark.sql import Window

    counts = sent.groupBy(F.md5("sentence").alias("digest")).agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min(F.substring("sentence", 1, SENT_PREFIX)).alias("exemplar"),
    ).filter(F.col("n_occurrences") >= SENT_MIN_OCC)
    n_salt = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    order = [F.desc("n_occurrences"), F.asc("digest")]
    w1 = Window.partitionBy("salt").orderBy(*order)
    partial = (
        counts.withColumn("salt", F.pmod(F.crc32(F.col("digest")), F.lit(n_salt)))
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= SENT_TOP_K)
    )
    w = Window.orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SENT_TOP_K)
        .select(
            "digest", "exemplar", "n_occurrences", "n_docs",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def sentence_dedup_sql(table: str = "documents") -> str:
    strip = "' ' || chr(9) || chr(10) || chr(13)"
    return f"""
    WITH sent AS (
      SELECT doc_id, trim(s, {strip}) AS sentence
      FROM (SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS s
            FROM {table})
      WHERE trim(s, {strip}) <> ''
    ),
    counts AS (
      SELECT md5(sentence) AS digest,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             min(substr(sentence, 1, {SENT_PREFIX})) AS exemplar
      FROM sent GROUP BY 1
      HAVING count(*) >= {SENT_MIN_OCC}
    )
    SELECT digest, exemplar, n_occurrences, n_docs, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, digest ASC) AS rank
      FROM counts
    ) WHERE rank <= {SENT_TOP_K}
    """


# ---------------------------------------------------------------------------
# Clustering coefficient (g07) — how clique-like each duplicate family is
# ---------------------------------------------------------------------------


def clustering_coefficient(docs: DataFrame) -> DataFrame:
    """Per-node LOCAL CLUSTERING COEFFICIENT over the near-dup graph:
    ``2·T(v) div (deg(v)·(deg(v)−1))`` as exact ppm — the clique-ness
    metric that separates template families (cc ≈ 1: everything matches
    everything) from hub-and-spoke boilerplate stars (cc ≈ 0: spokes
    match the hub, not each other), the decision input for whether d07's
    cluster canonicalization keeps one doc (clique) or needs review
    (star).  Triangles come from g02's degree-oriented wedge join —
    this entry adds only a degree join and one integer division on top.
    Nodes with deg < 2 have no defined coefficient and are excluded."""
    pairs = lsh_pairs_ckpt(docs)
    tri = triangle_counts_from_pairs(pairs)
    sym = pairs.select(F.col("doc_a").alias("u")).unionByName(
        pairs.select(F.col("doc_b").alias("u"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).filter(F.col("deg") >= 2)
    return (
        deg.join(tri.withColumnRenamed("doc_id", "u"), "u", "left")
        .select(
            F.col("u").alias("doc_id"),
            F.col("deg").cast("long").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
        )
        .withColumn("cc_ppm", F.expr("(2 * n_triangles * 1000000) div (degree * (degree - 1))"))
    )


def clustering_coefficient_sql(table: str = "documents") -> str:
    # outer CTE names must not collide with the CTEs inside the nested
    # pair/triangle subqueries (duckdb hits an internal recursive-CTE-scan
    # assertion when a MATERIALIZED outer CTE shadows a nested one)
    return f"""
    WITH cc_pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(table)})
    ),
    cc_tri AS MATERIALIZED (
      SELECT doc_id, n_triangles FROM ({triangle_counts_sql(table)})
    ),
    cc_deg AS (
      SELECT u, count(*) AS deg FROM (
        SELECT doc_a AS u FROM cc_pairs UNION ALL SELECT doc_b FROM cc_pairs
      ) GROUP BY u HAVING count(*) >= 2
    )
    SELECT cc_deg.u AS doc_id,
           CAST(cc_deg.deg AS BIGINT) AS degree,
           CAST(coalesce(cc_tri.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST((2 * coalesce(cc_tri.n_triangles, 0) * 1000000)
                // (cc_deg.deg * (cc_deg.deg - 1)) AS BIGINT) AS cc_ppm
    FROM cc_deg LEFT JOIN cc_tri ON cc_tri.doc_id = cc_deg.u
    """


# ---------------------------------------------------------------------------
# Bloom-filter membership dedup (d23) — the sketch-based EXACT-dup screen
# ---------------------------------------------------------------------------

BLOOM_K = 4  # hash functions
BLOOM_M = 1 << 16  # bit positions (65,536)
_BLOOM_AB = minhash_params(BLOOM_K, seed=77)


def bloom_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """BLOOM-FILTER ingestion screen: flag each incoming document whose
    ``BLOOM_K`` bit positions are ALL already set by the existing corpus —
    the constant-space membership sketch every ingestion pipeline puts in
    FRONT of content-hash dedup (d01 re-hashes the world every batch; a
    Bloom filter of the seen corpus answers "definitely new" in O(k) with
    zero false negatives).  Incoming batch = d11's deterministic
    ``doc_id % INC_MOD >= INC_NEW`` slice.

    Positions are the portable universal-hash family over the text's h32
    (same machinery as MinHash, different seed), mod ``BLOOM_M``, so both
    engines compute identical bits and even this probabilistic structure
    is value-hash replayable.  Output per incoming doc: the Bloom verdict,
    the exact-duplicate truth (md5 equality against the corpus slice), and
    the false-positive flag — the measured FP rate is the (1−e^(−kn/m))^k
    curve every deployment sizes m against.

    Scale shape: the corpus side collapses to ≤ m DISTINCT set-bit rows
    (the relational stand-in for the bitmap; at 100 TB aggregate them
    into a BLOOM_M-bit binary with bit_or and BROADCAST it — the join
    disappears, the verdict becomes a map-side expression).  The
    position equi-join is k·|batch| narrow rows against ≤ m rows — never
    corpus×corpus; the exact-truth join is digest-vs-digest (d01's
    shuffle shape) and exists here only to GRADE the sketch."""
    h = h32(F.col(text_col))
    is_new = (F.col(id_col) % INC_MOD) >= INC_NEW
    base = docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("digest"), h.alias("h"), is_new.alias("is_new")
    )
    positions = [
        (minhash_perm(F.col("h"), a, b) % BLOOM_M).alias(f"pos_{j}")
        for j, (a, b) in enumerate(_BLOOM_AB)
    ]
    wide = base.select(id_col, "digest", "is_new", *positions)
    seen_bits = (
        wide.filter(~F.col("is_new"))
        .select(
            F.explode(F.array(*[F.col(f"pos_{j}") for j in range(BLOOM_K)])).alias(
                "bit"
            )
        )
        .distinct()
    )
    new_pos = wide.filter(F.col("is_new")).select(
        F.col(id_col).alias("new_id"),
        F.col("digest").alias("new_digest"),
        F.posexplode(F.array(*[F.col(f"pos_{j}") for j in range(BLOOM_K)])).alias(
            "j", "bit"
        ),
    )
    hits = (
        new_pos.join(seen_bits, "bit", "left_semi")
        .groupBy("new_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    corpus_digests = (
        wide.filter(~F.col("is_new")).select(F.col("digest").alias("new_digest")).distinct()
    )
    truth = (
        wide.filter(F.col("is_new"))
        .select(F.col(id_col).alias("new_id"), F.col("digest").alias("new_digest"))
        .join(
            corpus_digests.withColumn("exact_dup", F.lit(1)),
            "new_digest",
            "left",
        )
    )
    return (
        truth.join(hits, "new_id", "left")
        .select(
            F.col("new_id").alias(id_col),
            (F.coalesce(F.col("n_hit"), F.lit(0)) == BLOOM_K)
            .cast("long")
            .alias("bloom_hit"),
            F.coalesce(F.col("exact_dup"), F.lit(0)).cast("long").alias("exact_dup"),
        )
        .withColumn(
            "false_positive",
            (F.col("bloom_hit") == 1).cast("long")
            * (F.col("exact_dup") == 0).cast("long"),
        )
    )


def bloom_dedup_sql(table: str = "documents") -> str:
    pos_exprs = ", ".join(
        f"({minhash_perm_sql(h32_sql('text'), a, b)}) % {BLOOM_M} AS pos_{j}"
        for j, (a, b) in enumerate(_BLOOM_AB)
    )
    pos_union = " UNION ALL ".join(
        f"SELECT doc_id, digest, is_new, pos_{j} AS bit FROM wide"
        for j in range(BLOOM_K)
    )
    return f"""
    WITH wide AS MATERIALIZED (
      SELECT doc_id, md5(text) AS digest,
             (doc_id % {INC_MOD}) >= {INC_NEW} AS is_new,
             {pos_exprs}
      FROM {table}
    ),
    pos AS MATERIALIZED ({pos_union}),
    seen_bits AS (SELECT DISTINCT bit FROM pos WHERE NOT is_new),
    hits AS (
      SELECT p.doc_id, count(*) AS n_hit
      FROM pos p JOIN seen_bits s ON s.bit = p.bit
      WHERE p.is_new GROUP BY p.doc_id
    ),
    corpus_digests AS (SELECT DISTINCT digest FROM wide WHERE NOT is_new),
    truth AS (
      SELECT w.doc_id,
             CASE WHEN c.digest IS NOT NULL THEN 1 ELSE 0 END AS exact_dup
      FROM wide w LEFT JOIN corpus_digests c ON c.digest = w.digest
      WHERE w.is_new
    )
    SELECT t.doc_id,
           CAST(CASE WHEN COALESCE(h.n_hit, 0) = {BLOOM_K} THEN 1 ELSE 0 END
                AS BIGINT) AS bloom_hit,
           CAST(t.exact_dup AS BIGINT) AS exact_dup,
           CAST(CASE WHEN COALESCE(h.n_hit, 0) = {BLOOM_K} AND t.exact_dup = 0
                THEN 1 ELSE 0 END AS BIGINT) AS false_positive
    FROM truth t LEFT JOIN hits h ON h.doc_id = t.doc_id
    """


# ---------------------------------------------------------------------------
# Personalized PageRank (g08) — seeded relevance over the near-dup graph
# ---------------------------------------------------------------------------

PPR_SEED_MOD = 50  # nodes with doc_id % PPR_SEED_MOD == 0 form the seed set


def personalized_pagerank(
    docs: DataFrame, iters: int = PR_ITERS
) -> DataFrame:
    """PERSONALIZED PageRank (g01's power iteration with the teleport mass
    pinned to a seed set): restart probability flows only to nodes with
    ``doc_id % PPR_SEED_MOD == 0``, so rank measures proximity TO THE
    SEEDS — the "more like these" primitive behind seed-based data
    curation (rank a corpus by closeness to a trusted sub-corpus) and
    item-to-item recommendation, where global PageRank only measures
    popularity.

    Same fixed-point integer arithmetic as g01 (units of 1e-12,
    ``rank div deg`` contributions, damping as an exact 85/100 rational)
    — no float enters, the oracle replays every unrolled round
    bit-for-bit.  Non-seed nodes start AND restart at 0; mass enters
    only through seeds and decays through the damped walk, so scores
    order nodes by seed-reachability.

    Scale shape: identical to g01 — per round one equi-join of the rank
    vector onto degree-annotated edges plus one aggregate on the
    destination; the seed indicator is a pure projection.  O(|E|) per
    round, localCheckpoint barriers keep lineage flat."""
    pairs = lsh_pairs_ckpt(docs)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    nodes = edges_deg.select("src").distinct().localCheckpoint(eager=True)
    seed_term = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN
    is_seed = (F.col("src") % PPR_SEED_MOD == 0).cast("long")
    rank = nodes.select(
        "src", (is_seed * F.lit(PR_SCALE)).cast("long").alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges_deg.join(rank, "src")
            .select("dst", F.expr("rank div deg").alias("c"))
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("inc"))
        rank = (
            nodes
            .join(incoming, F.col("src") == F.col("dst"), "left")
            .select(
                "src",
                (
                    is_seed * F.lit(seed_term)
                    + F.expr(f"({PR_DAMP_NUM} * coalesce(inc, 0L)) div {PR_DAMP_DEN}")
                ).cast("long").alias("rank"),
            )
        )
    return rank.select(F.col("src").alias("doc_id"), F.col("rank").alias("ppr"))


def personalized_pagerank_sql(
    table: str = "documents", iters: int = PR_ITERS
) -> str:
    seed_term = str((PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN)
    seed = f"CASE WHEN src % {PPR_SEED_MOD} = 0 THEN 1 ELSE 0 END"
    sql = f"""
    WITH pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(table)})
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    rank0 AS (SELECT src, ({seed} * {PR_SCALE})::BIGINT AS rank FROM deg)
    """
    prev = "rank0"
    for i in range(1, iters + 1):
        sql += f"""
    , contrib{i} AS (
      SELECT e.dst, r.rank // d.deg AS c
      FROM edges e JOIN {prev} r ON r.src = e.src JOIN deg d ON d.src = e.src
    ),
    incoming{i} AS (SELECT dst, SUM(c) AS inc FROM contrib{i} GROUP BY dst),
    rank{i} AS (
      SELECT deg.src,
             (({seed.replace('src', 'deg.src')}) * {seed_term}
              + ({PR_DAMP_NUM} * COALESCE(i.inc, 0)) // {PR_DAMP_DEN})::BIGINT AS rank
      FROM deg LEFT JOIN incoming{i} i ON i.dst = deg.src
    )
    """
        prev = f"rank{i}"
    sql += f"SELECT src AS doc_id, rank AS ppr FROM {prev}"
    return sql


# ---------------------------------------------------------------------------
# Duplication-aware training weights (d24) — down-weight instead of drop
# ---------------------------------------------------------------------------


def dedup_weights(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DUPLICATION-AWARE sampling weights: every document gets weight
    1/n_copies of its exact-content group (ppm, integer floor) — the
    DOWN-WEIGHT alternative to d01's drop (each distinct content
    contributes total mass 1 regardless of copy count, so popular
    boilerplate neither dominates the gradient nor vanishes entirely —
    the soft-dedup recipe when copy count itself is signal).

    Shape: d01's digest-only shuffle (md5 groupBy), one count join back on
    the digest — bodies never shuffle; the weight is a pure projection."""
    digests = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
    counts = digests.groupBy("fp").agg(F.count(F.lit(1)).alias("n_copies"))
    return digests.join(counts, "fp").select(
        id_col,
        F.col("n_copies").cast("long").alias("n_copies"),
        F.expr("1000000 div n_copies").cast("long").alias("weight_ppm"),
    )


def dedup_weights_sql(table: str = "documents") -> str:
    return f"""
    WITH d AS (SELECT doc_id, md5(text) AS fp FROM {table}),
    c AS (SELECT fp, count(*) AS n_copies FROM d GROUP BY fp)
    SELECT d.doc_id,
           CAST(c.n_copies AS BIGINT) AS n_copies,
           CAST(1000000 // c.n_copies AS BIGINT) AS weight_ppm
    FROM d JOIN c USING (fp)
    """


# ---------------------------------------------------------------------------
# Harmonic centrality (g09) — bounded-radius closeness over the dup graph
# ---------------------------------------------------------------------------

HC_RADIUS = 3  # hops counted; 1/1 + 1/2 + 1/3 terms (exact ppm: floor-div)
HC_HUB_CAP = 50  # frontier-expansion cap per node (g05's hub-cap discipline)


def harmonic_centrality(docs: DataFrame, radius: int = HC_RADIUS) -> DataFrame:
    """HARMONIC CENTRALITY within ``radius`` hops: h(v) = Σ_u 1/d(v,u) over
    nodes within distance ``radius`` — the centrality that separates docs
    EMBEDDED in a duplication neighborhood (template families, mirrored
    corpora: high h) from incidental one-off matches (low h), and unlike
    closeness it is well-defined on disconnected graphs.  Exact integer
    ppm: each distance d contributes 10⁶ div d, so the hash can't drift.

    Computation is multi-source BFS as relational algebra: the frontier
    (src, node, dist) table joins the edge list once per hop, a min-dist
    aggregate dedups re-reached nodes, and each round is one equi-join +
    one aggregate — g04's single-source BFS run from EVERY node at once.
    Work per hop is Σ|ball(v, h)| rows; the per-node cap (``HC_HUB_CAP``
    highest-degree spokes skipped at expansion, g05's hub discipline)
    bounds ball growth on boilerplate stars while degrees and output
    still cover every node."""
    pairs = lsh_pairs_ckpt(docs)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    edges = edges.localCheckpoint(eager=True)
    # hub cap: expansion skips the highest-degree centers (their balls are
    # the quadratic hazard); they still appear as destinations and sources
    # of the FIRST hop, so every node keeps a score
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    exp_edges = edges.join(
        deg.filter(F.col("deg") <= HC_HUB_CAP).select("src"), "src"
    ).localCheckpoint(eager=True)
    # dist table: (origin, node, dist), dist >= 1
    reach = edges.select(
        F.col("src").alias("origin"), F.col("dst").alias("node"),
        F.lit(1).alias("dist"),
    )
    frontier = reach
    for d in range(2, radius + 1):
        frontier = (
            frontier.join(
                exp_edges, F.col("node") == F.col("src")
            )
            .select("origin", F.col("dst").alias("node"), F.lit(d).alias("dist"))
            .filter(F.col("origin") != F.col("node"))
        )
        reach = reach.unionByName(frontier)
    shortest = reach.groupBy("origin", "node").agg(F.min("dist").alias("dist"))
    return (
        shortest.groupBy("origin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum(F.expr("1000000 div dist")).cast("long").alias("harmonic_ppm"),
        )
        .select(F.col("origin").alias("doc_id"), "n_reached", "harmonic_ppm")
    )


def harmonic_centrality_sql(table: str = "documents", radius: int = HC_RADIUS) -> str:
    sql = f"""
    WITH pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(table)})
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    exp_edges AS MATERIALIZED (
      SELECT e.src, e.dst FROM edges e JOIN deg d ON d.src = e.src
      WHERE d.deg <= {HC_HUB_CAP}
    ),
    hop1 AS MATERIALIZED (SELECT src AS origin, dst AS node, 1 AS dist FROM edges)
    """
    prev = "hop1"
    hops = ["SELECT * FROM hop1"]
    for d in range(2, radius + 1):
        sql += f"""
    , hop{d} AS MATERIALIZED (
      SELECT f.origin, e.dst AS node, {d} AS dist
      FROM {prev} f JOIN exp_edges e ON e.src = f.node
      WHERE f.origin != e.dst
    )"""
        hops.append(f"SELECT * FROM hop{d}")
        prev = f"hop{d}"
    union = " UNION ALL ".join(hops)
    return (
        sql
        + f"""
    , reach AS ({union}),
    shortest AS (
      SELECT origin, node, min(dist) AS dist FROM reach GROUP BY origin, node
    )
    SELECT origin AS doc_id,
           CAST(count(*) AS BIGINT) AS n_reached,
           CAST(sum(1000000 // dist) AS BIGINT) AS harmonic_ppm
    FROM shortest GROUP BY origin
    """
    )


# ---------------------------------------------------------------------------
# Near-dup cluster weights (d25) — d24's soft dedup at MinHash granularity
# ---------------------------------------------------------------------------


def neardup_weights(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """NEAR-DUP cluster weights: every document weighs 1/|cluster| of its
    MinHash near-dup cluster (d07's propagation clusters; docs outside the
    pair graph are singletons at full weight) — d24 down-weights EXACT
    copies, this down-weights template families and light paraphrases:
    each near-dup equivalence class contributes total mass ≈ 1, the
    soft alternative to d08's hard drop when paraphrase count is signal.

    Shape: the pair graph + bounded propagation are d02/d07's (banded
    equi-joins, never all-pairs); cluster sizes are one rollup of the
    bounded cluster table; the corpus takes ONE left join on doc_id and a
    projection — bodies never shuffle."""
    clusters = dup_clusters(lsh_pairs_ckpt(docs, text_col, id_col)).select(
        id_col, "cluster_id"
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    member = clusters.join(sizes, "cluster_id")
    return (
        docs.select(id_col)
        .join(member, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_size"), F.lit(1))
            .cast("long")
            .alias("cluster_size"),
            F.expr("1000000 div coalesce(cluster_size, 1)")
            .cast("long")
            .alias("weight_ppm"),
        )
    )


def neardup_weights_sql(table: str = "documents") -> str:
    clusters = dup_clusters_sql(minhash_lsh_pairs_sql(table))
    return f"""
    WITH clusters AS MATERIALIZED (
      SELECT doc_id, cluster_id FROM ({clusters})
    ),
    sizes AS (
      SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY 1
    ),
    member AS (
      SELECT c.doc_id, s.cluster_size
      FROM clusters c JOIN sizes s USING (cluster_id)
    )
    SELECT t.doc_id,
           CAST(COALESCE(m.cluster_size, 1) AS BIGINT) AS cluster_size,
           CAST(1000000 // COALESCE(m.cluster_size, 1) AS BIGINT) AS weight_ppm
    FROM {table} t LEFT JOIN member m ON m.doc_id = t.doc_id
    """


# ---------------------------------------------------------------------------
# Degree assortativity (g10) and component-size census (g11) over the
# MinHash near-dup pair graph


def degree_assortativity(docs: DataFrame) -> DataFrame:
    """Degree assortativity of the near-dup pair graph: the Pearson
    correlation of endpoint degrees over directed (symmetrized) edges -
    THE one-number topology diagnostic for a dup graph.  Template families
    make near-cliques (assortativity ~ +1: high-degree nodes pair with
    high-degree nodes); hub-and-spoke boilerplate (one page quoted by
    thousands of one-off docs) drives it negative; near-zero means
    unstructured scatter.  Curation reads this before choosing d07 vs d09
    cluster handling and before trusting d25's per-cluster down-weights.

    All three moments (sum deg, sum deg^2, sum du*dv) are EXACT integer
    sums over the degree-annotated edge list - one degree rollup + one
    rank-onto-edges equi-join, O(|E|) total, the g01 anatomy without the
    iteration.  The final correlation is one double expression over six
    exact integers, so portable_round(4) is engine-stable.  BIGINT holds
    to sum(deg^2) < 2^63 (~3e9 edges of degree 1e3); past that the three
    accumulators move to DECIMAL(38,0) unchanged."""
    return degree_assortativity_from_pairs(lsh_pairs_ckpt(docs))


def degree_assortativity_from_pairs(pairs: DataFrame) -> DataFrame:
    """g10 on an explicit (doc_a, doc_b) pair frame."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # the edge frame feeds multiple plan branches; without a barrier the
    # upstream pair derivation (MinHash banding + Jaccard verify) re-executes
    # per branch — measured 35x wall at 100x data vs 25x with the barrier
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # moment algebra keeps the EDGE-sized join count at ONE: over the
    # symmetrized edge list, sum_edges deg(src) = sum_v deg(v)^2 and
    # sum_edges deg(src)^2 = sum_v deg(v)^3 (each node is src deg(v)
    # times), so m/sx/sxx come from the node-sized degree table alone;
    # only sxy = sum_v deg(v) * sum_{u->v} deg(u) touches the edges
    node_moments = deg.agg(
        F.sum("deg").alias("m"),
        F.sum(F.expr("deg * deg")).alias("sx"),
        F.sum(F.expr("deg * deg * deg")).alias("sxx"),
    ).filter(F.col("m") > 0)
    s_in = (
        edges.join(deg, "src")
        .groupBy("dst")
        .agg(F.sum("deg").alias("s_in"))
    )
    sxy = (
        s_in.join(deg.select(F.col("src").alias("dst"), "deg"), "dst")
        .agg(F.sum(F.expr("deg * s_in")).alias("sxy"))
    )
    sums = node_moments.crossJoin(F.broadcast(sxy))
    r = (
        (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")).cast("double")
        / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return sums.select(
        F.col("m").cast("long").alias("n_directed_edges"),
        F.col("sx").cast("long").alias("sum_deg"),
        F.col("sxx").cast("long").alias("sum_deg_sq"),
        F.col("sxy").cast("long").alias("sum_deg_prod"),
        portable_round(r, 4).alias("assortativity"),
    )


def degree_assortativity_sql(table: str = "documents") -> str:
    r = portable_round_sql(
        "(m * sxy - sx * sx)::DOUBLE / (m * sxx - sx * sx)::DOUBLE", 4
    )
    return f"""
    WITH pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql(table)})
    ),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    node_moments AS (
      SELECT CAST(sum(deg) AS BIGINT) AS m,
             CAST(sum(deg * deg) AS BIGINT) AS sx,
             CAST(sum(deg * deg * deg) AS BIGINT) AS sxx
      FROM deg
      HAVING sum(deg) > 0
    ),
    s_in AS (
      SELECT e.dst, CAST(sum(d.deg) AS BIGINT) AS s_in
      FROM edges e JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    sxy_t AS (
      SELECT CAST(sum(d.deg * s.s_in) AS BIGINT) AS sxy
      FROM s_in s JOIN deg d ON s.dst = d.src
    ),
    sums AS (SELECT * FROM node_moments, sxy_t)
    SELECT m AS n_directed_edges, sx AS sum_deg, sxx AS sum_deg_sq,
           sxy AS sum_deg_prod, {r} AS assortativity
    FROM sums
    """


def component_census(docs: DataFrame) -> DataFrame:
    """Component-size census of the near-dup graph: for every component
    SIZE, how many components have it, how many docs they hold, and that
    mass as ppm of all graph nodes - the shape report behind dedup
    budgeting (a census dominated by 2-node components means pair dedup
    suffices; a giant component means template collapse and d08's
    canonical-survivor policy deletes a measurable corpus share, which
    this quantifies BEFORE the deletion runs).

    Composition: d09's alternating-star components (O(log^2 n) rounds,
    the at-scale CC), one rollup to component sizes, one rollup to the
    census - each a strict reduction, so the census costs two tiny
    shuffles beyond the CC itself.  Oracle = true transitive connectivity
    (recursive CTE) aggregated the same way."""
    return component_census_from_pairs(lsh_pairs_ckpt(docs))


def component_census_from_pairs(pairs: DataFrame) -> DataFrame:
    """g11 on an explicit (doc_a, doc_b) pair frame."""
    comps = cc_alternating(pairs)
    sizes = comps.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    census = sizes.groupBy("size").agg(
        F.count(F.lit(1)).alias("n_components"),
    )
    total = comps.agg(F.count(F.lit(1)).alias("total_nodes")).filter(
        F.col("total_nodes") > 0
    )
    return census.crossJoin(F.broadcast(total)).select(
        F.col("size").cast("long").alias("size"),
        "n_components",
        F.expr("size * n_components").cast("long").alias("n_docs"),
        F.expr("(size * n_components * 1000000) div total_nodes").alias("docs_ppm"),
    )


def component_census_sql(table: str = "documents") -> str:
    cc = cc_alternating_sql(minhash_lsh_pairs_sql(table))
    return f"""
    WITH comps AS MATERIALIZED (SELECT * FROM ({cc})),
    sizes AS (
      SELECT cluster_id, count(*) AS size FROM comps GROUP BY cluster_id
    ),
    census AS (
      SELECT size, count(*) AS n_components FROM sizes GROUP BY size
    ),
    total AS (
      SELECT CAST(count(*) AS BIGINT) AS total_nodes FROM comps
      HAVING count(*) > 0
    )
    SELECT size::BIGINT AS size, n_components,
           CAST(size * n_components AS BIGINT) AS n_docs,
           (size * n_components * 1000000) // total_nodes AS docs_ppm
    FROM census, total
    """


def shingle_df_histogram(docs: DataFrame) -> DataFrame:
    """Shingle document-frequency histogram: distinct shingles and posting
    mass per floor(log2 DF) bucket, plus each bucket's share (ppm) of ALL
    postings and whether the bucket survives the ``NGRAM_MAX_DF`` stop cap
    - the TUNING MEASUREMENT behind the cap that every inverted-index
    operator here keys on (d05/d10/d17/d19/m07's skew lever): candidate
    pairs grow as sum(DF^2), so the curve's high-DF tail IS the join cost,
    and the dropped_ppm column says what recall the cap trades for it.
    (s19 plays this role for the cosine threshold; this is the
    lexical-index twin.)

    One corpus pass to the inverted index, one vocabulary rollup to DFs,
    one O(vocab) rollup to the histogram - the bucket is the integer
    bit-length of DF (t22's device), so no float log can misplace a
    power-of-two boundary."""
    inv = shingle_index(docs)
    dfs = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    bucketed = dfs.select(
        (F.length(F.bin(F.col("df"))) - 1).alias("log2_df"),
        "df",
    )
    hist = bucketed.groupBy("log2_df").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("df").alias("postings"),
        F.max(F.when(F.col("df") > NGRAM_MAX_DF, 1).otherwise(0)).alias("any_capped"),
    )
    total = hist.agg(F.sum("postings").alias("total_postings")).filter(
        F.coalesce(F.col("total_postings"), F.lit(0)) > 0
    )
    return hist.crossJoin(F.broadcast(total)).select(
        F.col("log2_df").cast("long").alias("log2_df"),
        "n_shingles",
        F.col("postings").cast("long").alias("postings"),
        F.expr("(postings * 1000000) div total_postings").alias("postings_ppm"),
        F.col("any_capped").cast("long").alias("any_capped"),
    )


def shingle_df_histogram_sql(table: str = "documents") -> str:
    return f"""
    WITH words AS ({_words_cte(table)}),
    shset AS (SELECT doc_id, {_shingle_hashes_sql()} AS sh FROM words),
    inv AS (SELECT doc_id, unnest(sh) AS g FROM shset),
    dfs AS (SELECT g, count(*) AS df FROM inv GROUP BY g),
    hist AS (
      SELECT length(bin(df)) - 1 AS log2_df,
             count(*) AS n_shingles,
             CAST(sum(df) AS BIGINT) AS postings,
             CAST(max(CASE WHEN df > {NGRAM_MAX_DF} THEN 1 ELSE 0 END) AS BIGINT)
               AS any_capped
      FROM dfs GROUP BY 1
    ),
    total AS (
      SELECT CAST(sum(postings) AS BIGINT) AS total_postings FROM hist
      HAVING sum(postings) > 0
    )
    SELECT log2_df::BIGINT AS log2_df, n_shingles, postings,
           (postings * 1000000) // total_postings AS postings_ppm, any_capped
    FROM hist, total
    """


def span_coverage(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document duplicated-span COVERAGE: how many of a doc's token
    positions sit inside some span shared verbatim with another doc, as
    count + ppm of the doc - d19 reports per-PAIR span lengths, this
    answers the per-DOC curation question ("is this doc 5%% quoted or 95%%
    boilerplate?") that decides drop-vs-keep and feeds span-level
    EXCISION (Lee et al. 2022 cut spans, not docs).

    Anatomy: d19's positional window index (overlapping SPAN_K-grams,
    stop-gram DF cap) - but coverage needs no PAIRS at all: a position is
    covered iff its gram occurs in >= 2 distinct docs, which is a per-gram
    ``min(doc) != max(doc)`` aggregate - so the d19 hash self-join (O(c^2)
    rows per gram, the 15x-at-100x hotspot) collapses to one gram-keyed
    groupBy.  A seed at position p covers [p, p+K): covered mass is one
    explode of K offsets + one distinct + one per-doc rollup.  Bounded by
    corpus token count, never corpus^2; docs with zero shared spans are
    reported at 0 via the left join."""
    from pyspark.sql import Window as W

    from spj_query_engine_spark.operators.core import spread

    words = F.split(F.col(text_col), r"\s+")
    tok = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"), F.posexplode(words).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, SPAN_K)]
    grams = tok.select(
        "doc_id", "pos", F.concat_ws(" ", *leads).alias("gram"), leads[-1].alias("tail")
    ).filter(F.col("tail").isNotNull())
    idx = grams.select("doc_id", "pos", h32(F.col("gram")).alias("g"))
    # gram is "shared" iff it survives the DF cap AND spans >= 2 docs;
    # min != max is the cheap multi-doc test (no countDistinct shuffle)
    shared = (
        idx.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("doc_id").alias("d_lo"),
            F.max("doc_id").alias("d_hi"),
        )
        .filter((F.col("c") <= SPAN_MAX_DF) & (F.col("d_lo") != F.col("d_hi")))
        .select("g")
    )
    # idx has one row per (doc, pos), so the join preserves uniqueness —
    # every position of a shared gram is a seed (some OTHER doc has it)
    seeds = idx.join(shared, "g").select("doc_id", "pos")
    covered = (
        seeds
        .select(
            "doc_id", F.explode(F.expr(f"sequence(pos, pos + {SPAN_K - 1})")).alias("cp")
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("covered_tokens"))
    )
    sizes = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(words, lambda x: x != F.lit(""))).alias("n_toks"),
    ).filter(F.col("n_toks") > 0)
    return sizes.join(covered, "doc_id", "left").select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias(
            "covered_tokens"
        ),
        F.expr(
            "(coalesce(covered_tokens, 0) * 1000000) div n_toks"
        ).alias("coverage_ppm"),
    )


def span_coverage_sql(table: str = "documents") -> str:
    gram = " || ' ' || ".join(f"w[i + {j + 1}]" for j in range(SPAN_K))
    return f"""
    WITH words AS ({_words_cte(table)}),
    grams AS (SELECT doc_id,
                     unnest(list_transform(range(len(w) - {SPAN_K - 1}), i -> {gram})) AS gram,
                     unnest(range(len(w) - {SPAN_K - 1})) AS pos
              FROM words),
    idx0 AS MATERIALIZED (SELECT doc_id, pos, {h32_sql("gram")} AS g FROM grams),
    shared AS (SELECT g FROM idx0 GROUP BY g
               HAVING count(*) <= {SPAN_MAX_DF} AND min(doc_id) != max(doc_id)),
    seeds AS (SELECT idx0.doc_id, idx0.pos FROM idx0 JOIN shared USING (g)),
    covered AS (
      SELECT doc_id, count(*) AS covered_tokens FROM (
        SELECT DISTINCT doc_id, pos + u.i AS cp
        FROM seeds, unnest(range(0, {SPAN_K})) AS u(i)
      ) GROUP BY doc_id
    ),
    sizes AS (
      SELECT doc_id,
             len(list_filter(w, x -> x <> '')) AS n_toks
      FROM words
    )
    SELECT s.doc_id, CAST(s.n_toks AS BIGINT) AS n_toks,
           CAST(COALESCE(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
           (COALESCE(c.covered_tokens, 0) * 1000000) // s.n_toks AS coverage_ppm
    FROM sizes s LEFT JOIN covered c ON c.doc_id = s.doc_id
    WHERE s.n_toks > 0
    """


def dup_span_extents(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document duplicated-span EXTENTS: the island structure of d27's
    covered positions — how many maximal contiguous duplicated spans a doc
    has, and how long the longest one runs.  This is the per-doc statistic
    of exact-substring dedup (Lee et al. 2022): excision cuts the spans
    themselves, and the drop-vs-excise decision reads max extent (one
    50-token quote vs wall-to-wall boilerplate), which d27's coverage ppm
    alone cannot distinguish.

    Anatomy: identical pair-free seed derivation as :func:`span_coverage`
    (gram DF cap + multi-doc min/max test, one gram-keyed groupBy), then
    gaps-and-islands over the distinct covered positions: island id =
    ``cp − row_number()`` per doc (ORDER BY cp is unique after DISTINCT, so
    the window is deterministic), one groupBy per (doc, island) for run
    lengths, one per-doc rollup.  All frames are O(corpus tokens); the
    window partitions on doc_id — high cardinality, bounded per-doc size —
    so no single-task scan appears at any scale."""
    from pyspark.sql import Window as W

    from spj_query_engine_spark.operators.core import spread

    words = F.split(F.col(text_col), r"\s+")
    tok = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"), F.posexplode(words).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, SPAN_K)]
    grams = tok.select(
        "doc_id", "pos", F.concat_ws(" ", *leads).alias("gram"), leads[-1].alias("tail")
    ).filter(F.col("tail").isNotNull())
    idx = grams.select("doc_id", "pos", h32(F.col("gram")).alias("g"))
    shared = (
        idx.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("doc_id").alias("d_lo"),
            F.max("doc_id").alias("d_hi"),
        )
        .filter((F.col("c") <= SPAN_MAX_DF) & (F.col("d_lo") != F.col("d_hi")))
        .select("g")
    )
    covered_pos = (
        idx.join(shared, "g")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(pos, pos + {SPAN_K - 1})")).alias("cp"),
        )
        .distinct()
    )
    wi = W.partitionBy("doc_id").orderBy("cp")
    runs = (
        covered_pos.withColumn("isl", F.col("cp") - F.row_number().over(wi))
        .groupBy("doc_id", "isl")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    ext = runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("run_len").alias("covered_tokens"),
        F.max("run_len").alias("max_span_tokens"),
    )
    sizes = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(words, lambda x: x != F.lit(""))).alias("n_toks"),
    ).filter(F.col("n_toks") > 0)
    return sizes.join(ext, "doc_id", "left").select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias(
            "covered_tokens"
        ),
        F.coalesce(F.col("max_span_tokens"), F.lit(0)).cast("long").alias(
            "max_span_tokens"
        ),
    )


def dup_span_extents_sql(table: str = "documents") -> str:
    gram = " || ' ' || ".join(f"w[i + {j + 1}]" for j in range(SPAN_K))
    return f"""
    WITH words AS ({_words_cte(table)}),
    grams AS (SELECT doc_id,
                     unnest(list_transform(range(len(w) - {SPAN_K - 1}), i -> {gram})) AS gram,
                     unnest(range(len(w) - {SPAN_K - 1})) AS pos
              FROM words),
    idx0 AS MATERIALIZED (SELECT doc_id, pos, {h32_sql("gram")} AS g FROM grams),
    shared AS (SELECT g FROM idx0 GROUP BY g
               HAVING count(*) <= {SPAN_MAX_DF} AND min(doc_id) != max(doc_id)),
    seeds AS (SELECT idx0.doc_id, idx0.pos FROM idx0 JOIN shared USING (g)),
    cov AS (SELECT DISTINCT doc_id, pos + u.i AS cp
            FROM seeds, unnest(range(0, {SPAN_K})) AS u(i)),
    runs AS (SELECT doc_id,
                    cp - row_number() OVER (PARTITION BY doc_id ORDER BY cp) AS isl
             FROM cov),
    islands AS (SELECT doc_id, isl, count(*) AS run_len
                FROM runs GROUP BY doc_id, isl),
    ext AS (SELECT doc_id, count(*) AS n_spans, sum(run_len) AS covered_tokens,
                   max(run_len) AS max_span_tokens
            FROM islands GROUP BY doc_id),
    sizes AS (SELECT doc_id, len(list_filter(w, x -> x <> '')) AS n_toks FROM words)
    SELECT s.doc_id, CAST(s.n_toks AS BIGINT) AS n_toks,
           CAST(COALESCE(e.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(e.covered_tokens, 0) AS BIGINT) AS covered_tokens,
           CAST(COALESCE(e.max_span_tokens, 0) AS BIGINT) AS max_span_tokens
    FROM sizes s LEFT JOIN ext e ON e.doc_id = s.doc_id
    WHERE s.n_toks > 0
    """

"""Deterministic sampling & dataset splitting.

Beyond-reference capability: a training-data pipeline's last step is almost
always a reproducible split (train/val/test) or a down-sample.  Spark's
``df.sample`` is seed-stable only per partitioning, which breaks
reproducibility under repartition/AQE; these operators derive the decision
from a PORTABLE hash of the row key instead — the same row lands in the same
split on any cluster layout, any engine (the DuckDB oracle replays the hash
exactly), any day.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spj_query_engine_spark.functions.hashing import h32, h32_sql

SPLIT_BUCKETS = 100


def _bucket_raw(key: Column, seed: int) -> Column:
    """Full-range salted portable hash (uint32) of a row key."""
    return h32(F.concat(key.cast("string"), F.lit(f"#{seed}")))


def _bucket_raw_sql(key: str, seed: int) -> str:
    return h32_sql(f"({key}::VARCHAR || '#{seed}')")


def _bucket(key: Column, seed: int) -> Column:
    return F.pmod(_bucket_raw(key, seed), F.lit(SPLIT_BUCKETS))


def _bucket_sql(key: str, seed: int) -> str:
    return f"{_bucket_raw_sql(key, seed)} % {SPLIT_BUCKETS}"


def train_split(
    df: DataFrame,
    key_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Label every row train/val/test by hash bucket of its key — a pure
    projection (no shuffle, no sampling state), reproducible across engines
    and cluster layouts.  Filter on ``split`` downstream; at 100 TB the
    filter pushes into the scan of any materialized copy."""
    b = _bucket(F.col(key_col), seed)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(F.col(key_col), b.cast("int").alias("bucket"), split.alias("split"))


def stratified_sample(
    df: DataFrame,
    key_col: str = "doc_id",
    strata_col: str = "lang",
    pct: int = 10,
    seed: int = 7,
) -> DataFrame:
    """Deterministic ``pct``% sample WITHIN each stratum: the hash is salted
    with the stratum value, so the kept set in one stratum is statistically
    independent of every other stratum (a single global hash would keep the
    same keys everywhere, correlating strata that share keys).  Like
    :func:`train_split` this is a pure projection + filter — no shuffle, no
    sampling state, reproducible on any cluster layout, and the filter
    pushes to the scan of a materialized copy."""
    b = _bucket(F.concat(F.col(strata_col).cast("string"), F.lit("|"), F.col(key_col).cast("string")), seed)
    return df.select(
        F.col(key_col), F.col(strata_col), b.cast("int").alias("bucket")
    ).filter(F.col("bucket") < pct)


def stratified_sample_sql(
    table: str = "documents",
    key_col: str = "doc_id",
    strata_col: str = "lang",
    pct: int = 10,
    seed: int = 7,
) -> str:
    b = _bucket_sql(f"({strata_col}::VARCHAR || '|' || {key_col}::VARCHAR)", seed)
    return f"""
    SELECT {key_col}, {strata_col}, CAST({b} AS INT) AS bucket
    FROM {table} WHERE {b} < {pct}
    """


def train_split_sql(
    table: str = "documents",
    key_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    seed: int = 42,
) -> str:
    b = _bucket_sql(key_col, seed)
    return f"""
    SELECT {key_col},
           CAST({b} AS INT) AS bucket,
           CASE WHEN {b} < {train_pct} THEN 'train'
                WHEN {b} < {train_pct + val_pct} THEN 'val'
                ELSE 'test' END AS split
    FROM {table}
    """


#: per-source keep rates for the mixture sample (percent of SPLIT_BUCKETS);
#: sources not listed fall back to DEFAULT_MIX_PCT — the "everything else"
#: tier of a real data-mixing recipe
MIXTURE_WEIGHTS = {"src0": 100, "src1": 50, "src2": 50, "src3": 25}
DEFAULT_MIX_PCT = 10
MIX_SEED = 11


def mixture_sample(
    df: DataFrame,
    key_col: str = "doc_id",
    source_col: str = "source",
    weights: dict[str, int] | None = None,
    default_pct: int = DEFAULT_MIX_PCT,
    seed: int = MIX_SEED,
) -> DataFrame:
    """Weighted source-mixture sampling — the data-mixing step of a training
    pipeline (keep 100% of a high-quality source, 50% of mid tiers, N% of
    the long tail).  Decision = salted portable hash bucket < per-source
    rate, so the kept set is reproducible on any cluster layout and engine,
    and re-running with a RAISED rate strictly grows the kept set (bucket
    ordering is stable per key) — the property that lets a recipe be tuned
    without churning previously-selected documents.

    Pure projection + filter: no shuffle, no sampler state; the rate lookup
    compiles to a CASE chain over the source column (weights are a small
    static recipe, not data), so at 100 TB this runs scan-speed with the
    filter eligible for pushdown to a materialized copy."""
    w = MIXTURE_WEIGHTS if weights is None else weights
    b = _bucket(
        F.concat(F.col(source_col).cast("string"), F.lit("|"), F.col(key_col).cast("string")),
        seed,
    )
    rate = F.lit(default_pct)
    for src, pct in sorted(w.items()):
        rate = F.when(F.col(source_col) == src, F.lit(pct)).otherwise(rate)
    return df.select(
        F.col(key_col),
        F.col(source_col),
        b.cast("int").alias("bucket"),
        rate.cast("int").alias("keep_pct"),
    ).filter(F.col("bucket") < F.col("keep_pct"))


def mixture_sample_sql(
    table: str = "documents",
    key_col: str = "doc_id",
    source_col: str = "source",
    weights: dict[str, int] | None = None,
    default_pct: int = DEFAULT_MIX_PCT,
    seed: int = MIX_SEED,
) -> str:
    w = MIXTURE_WEIGHTS if weights is None else weights
    b = _bucket_sql(f"({source_col}::VARCHAR || '|' || {key_col}::VARCHAR)", seed)
    whens = " ".join(
        f"WHEN {source_col} = '{src}' THEN {pct}" for src, pct in sorted(w.items())
    )
    rate = f"(CASE {whens} ELSE {default_pct} END)"
    return f"""
    SELECT {key_col}, {source_col},
           CAST({b} AS INT) AS bucket,
           CAST({rate} AS INT) AS keep_pct
    FROM {table} WHERE {b} < {rate}
    """


SAMPLE_K = 100
SAMPLE_SEED = 23


def uniform_k_sample(
    df: DataFrame,
    key_col: str = "doc_id",
    k: int = SAMPLE_K,
    seed: int = SAMPLE_SEED,
) -> DataFrame:
    """Exactly-k uniform sample as a BOTTOM-K SKETCH: keep the k rows with
    the smallest salted portable hash of their key.  The hash imposes a
    uniform random total order, so the bottom k is a uniform k-subset —
    reservoir sampling's result without reservoir sampling's sequential
    state, and mergeable: bottom-k of a union = bottom-k of the per-part
    bottom-ks, which is exactly how Spark executes ORDER BY + LIMIT
    (TakeOrderedAndProject: per-partition top-k, then merge — no global
    sort, no driver collect of the corpus).  Deterministic across engines,
    layouts and reruns; ties (hash collisions) break on the key."""
    h = _bucket_raw(F.col(key_col), seed)
    return (
        df.select(F.col(key_col), h.alias("rank_hash"))
        .orderBy("rank_hash", key_col)
        .limit(k)
    )


def uniform_k_sample_sql(
    table: str = "documents",
    key_col: str = "doc_id",
    k: int = SAMPLE_K,
    seed: int = SAMPLE_SEED,
) -> str:
    h = _bucket_raw_sql(key_col, seed)
    return f"""
    SELECT {key_col}, {h} AS rank_hash FROM {table}
    ORDER BY rank_hash, {key_col} LIMIT {k}
    """


PACK_CTX = 512  # tokens per packed training sequence
PACK_BUCKETS = 8  # independent packing streams (the distributed-packing unit)
PACK_SEED = 31


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    ctx: int = PACK_CTX,
    n_buckets: int = PACK_BUCKETS,
    seed: int = PACK_SEED,
) -> DataFrame:
    """Deterministic sequence packing — the concat-and-chunk step of LLM
    pretraining: documents are concatenated in a fixed order and cut every
    ``ctx`` tokens; each doc learns which chunk(s) it lands in and at what
    offset.

    Distribution model: docs hash into ``n_buckets`` independent packing
    STREAMS (salted portable hash, layout-independent), and the running
    token offset is a window cumsum WITHIN a stream — so the sort/cumsum
    parallelism is ``n_buckets`` and no global single-partition sequence
    exists.  At 100 TB you raise ``n_buckets`` with the corpus (each stream
    packs independently, exactly how distributed packers shard); chunk ids
    are (bucket, local_chunk) pairs so streams never coordinate.  Output:
    one row per doc with its stream, token count, start offset, and the
    first/last chunk it occupies (a doc spanning a cut boundary appears in
    chunk_first..chunk_last)."""
    n_tok = F.size(F.split(F.col(text_col), r"\s+"))
    b = F.pmod(
        h32(F.concat(F.col(key_col).cast("string"), F.lit(f"#{seed}"))),
        F.lit(n_buckets),
    )
    from pyspark.sql import Window

    base = df.select(
        F.col(key_col),
        b.cast("int").alias("pack_bucket"),
        n_tok.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        key_col,
        "pack_bucket",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("start_offset"),
        F.floor((cum - F.col("n_tokens")) / ctx).cast("long").alias("chunk_first"),
        F.floor((cum - 1) / ctx).cast("long").alias("chunk_last"),
    )


def pack_sequences_sql(
    table: str = "documents",
    text_col: str = "text",
    key_col: str = "doc_id",
    ctx: int = PACK_CTX,
    n_buckets: int = PACK_BUCKETS,
    seed: int = PACK_SEED,
) -> str:
    h = h32_sql(f"({key_col}::VARCHAR || '#{seed}')")
    return f"""
    WITH base AS (
      SELECT {key_col},
             CAST({h} % {n_buckets} AS INT) AS pack_bucket,
             CAST(len(regexp_split_to_array({text_col}, '\\s+')) AS BIGINT) AS n_tokens
      FROM {table}
    ),
    cumd AS (
      SELECT *, SUM(n_tokens) OVER (PARTITION BY pack_bucket ORDER BY {key_col}
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM base
    )
    SELECT {key_col}, pack_bucket, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start_offset,
           CAST(floor((cum - n_tokens) / {ctx}) AS BIGINT) AS chunk_first,
           CAST(floor((cum - 1) / {ctx}) AS BIGINT) AS chunk_last
    FROM cumd
    """

# ---------------------------------------------------------------------------
# Overlapping-window chunking (p06) — RAG / long-context splitting
# ---------------------------------------------------------------------------

RAG_CHUNK = 32  # tokens per chunk
RAG_STRIDE = 24  # chunk start step (overlap = RAG_CHUNK - RAG_STRIDE)


def overlap_chunks(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    size: int = RAG_CHUNK,
    stride: int = RAG_STRIDE,
) -> DataFrame:
    """Split each document into OVERLAPPING ``size``-token windows every
    ``stride`` tokens — the retrieval/RAG chunking step (p05 packs for
    pretraining with hard cuts; retrieval needs overlap so no answer span
    straddles a boundary unseen).  Emits one row per chunk:
    (doc_id, chunk_idx, tok_start, n_tok_chunk, digest) with the digest
    standing in for chunk text so downstream dedup/embedding stages move
    16-byte keys, not strings.

    Chunk count is ``max(1, ceil((n - overlap) / stride))`` — every token
    is covered, the last chunk is never a strict sub-span of its
    predecessor, and a short doc yields exactly one chunk.  Scale shape:
    pure per-row projection (sequence → transform → posexplode); no
    shuffle at all, and the ~size/stride row fan-out is the declared cost."""
    overlap = size - stride
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    base = df.select(F.col(key_col), toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    starts = F.expr(
        f"transform(sequence(0, greatest(1, "
        f"int(ceil((size(toks) - {overlap}) / {stride}.0))) - 1), "
        f"i -> i * {stride})"
    )
    return (
        base.select(
            key_col,
            "toks",
            F.posexplode(starts).alias("chunk_idx", "tok_start"),
        )
        .select(
            key_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("tok_start").cast("long").alias("tok_start"),
            F.expr(f"slice(toks, tok_start + 1, {size})").alias("chunk"),
        )
        .select(
            key_col,
            "chunk_idx",
            "tok_start",
            F.size("chunk").cast("long").alias("n_tok_chunk"),
            F.md5(F.array_join("chunk", " ")).alias("digest"),
        )
    )


def overlap_chunks_sql(
    table: str = "documents",
    size: int = RAG_CHUNK,
    stride: int = RAG_STRIDE,
) -> str:
    overlap = size - stride
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM {table}
    ),
    nz AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
    chunks AS (
      SELECT doc_id, i AS chunk_idx, i * {stride} AS tok_start,
             list_slice(toks, i * {stride} + 1, i * {stride} + {size}) AS chunk
      FROM nz, unnest(range(0, greatest(1,
             CAST(ceil((len(toks) - {overlap}) / {stride}.0) AS BIGINT)))) AS u(i)
    )
    SELECT doc_id, chunk_idx, tok_start,
           CAST(len(chunk) AS BIGINT) AS n_tok_chunk,
           md5(array_to_string(chunk, ' ')) AS digest
    FROM chunks
    """


# ---------------------------------------------------------------------------
# Leakage-safe split (p07) — near-duplicates must share a split
# ---------------------------------------------------------------------------

LEAK_SEED = 53


def leakage_safe_split(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    seed: int = LEAK_SEED,
) -> DataFrame:
    """Train/val/test split that CANNOT leak near-duplicates across the
    boundary: p01 hashes each doc independently, so the two sides of a
    MinHash near-dup pair can land in train and test — the contamination
    a held-out set must exclude.  Here the split key is the doc's
    near-dup CLUSTER id (min reachable doc_id via d02 pairs → d07
    components; singletons key on themselves), so every member of a
    cluster lands in the same split by construction.

    Scale shape: the cluster frame (only docs that appear in some pair —
    a small fraction of the corpus) left-joins the id-only doc list; the
    split itself stays a pure hash projection.  Components come from the
    alternating-star contraction (:func:`~spj_query_engine_spark.operators.
    dedup.cc_alternating` — O(log² n) rounds at any diameter, the at-scale
    CC), with TRUE transitive connectivity as the oracle.  Output:
    (doc_id, group_id, split)."""
    from spj_query_engine_spark.operators.dedup import cc_alternating, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, text_col, key_col).select("doc_a", "doc_b")
    clusters = cc_alternating(pairs).select(
        F.col("doc_id").alias(key_col), "cluster_id"
    )
    keyed = docs.select(key_col).join(clusters, key_col, "left").select(
        F.col(key_col),
        F.coalesce(F.col("cluster_id"), F.col(key_col)).alias("group_id"),
    )
    b = _bucket(F.col("group_id"), seed)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return keyed.select(key_col, "group_id", split.alias("split"))


def leakage_safe_split_sql(
    table: str = "documents",
    key_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    seed: int = LEAK_SEED,
) -> str:
    from spj_query_engine_spark.operators.dedup import (
        cc_alternating_sql,
        minhash_lsh_pairs_sql,
    )

    pairs_body = (
        "SELECT doc_a, doc_b FROM (" + minhash_lsh_pairs_sql(table) + ")"
    )
    clusters = cc_alternating_sql(pairs_body)
    b = _bucket_sql("group_id", seed)
    return f"""
    WITH clusters AS ({clusters}),
    keyed AS (
      SELECT d.{key_col}, COALESCE(c.cluster_id, d.{key_col}) AS group_id
      FROM {table} d LEFT JOIN clusters c ON c.doc_id = d.{key_col}
    )
    SELECT {key_col}, group_id,
           CASE WHEN {b} < {train_pct} THEN 'train'
                WHEN {b} < {train_pct + val_pct} THEN 'val'
                ELSE 'test' END AS split
    FROM keyed
    """


# ---------------------------------------------------------------------------
# Temperature-scaled mixture sampling (p08)
# ---------------------------------------------------------------------------

TEMP_SEED = 31
TEMP_BUDGET_PCT = 50  # target sample size as % of the corpus
TEMP_PPM = 1_000_000  # keep-rate resolution (parts per million)


def temperature_sample(
    df: DataFrame,
    key_col: str = "doc_id",
    source_col: str = "source",
    seed: int = TEMP_SEED,
) -> DataFrame:
    """Temperature-scaled source mixture (τ = 0.5): target share of source s
    ∝ n_s^τ — the standard flattening between proportional sampling (τ=1)
    and uniform-over-sources (τ=0) used to up-weight low-resource slices of
    a pretraining mix.  Unlike :func:`mixture_sample` the rates are NOT a
    hand recipe: they are derived from the corpus's own per-source counts,
    so the operator is a two-pass pipeline — a source-cardinality aggregate
    (tiny: one row per source) broadcast back onto a pure projection+filter
    over the corpus.  The big table never shuffles.

    Determinism across engines: n_s^0.5 is IEEE ``sqrt`` (correctly rounded,
    bit-identical in JVM and DuckDB); each sqrt is rounded to 6 places and
    summed as DECIMAL so the across-sources total is order-independent; the
    final keep fraction is evaluated in one fixed double-expression order on
    both sides and quantized to parts-per-million before the hash-bucket
    compare — the same portable-hash decision as p01–p04, so raising the
    budget strictly grows the kept set.
    """
    from spj_query_engine_spark.functions.hashing import portable_round

    counts = df.groupBy(F.col(source_col).alias("src")).agg(
        F.count(F.lit(1)).alias("n_src")
    )
    counts = counts.withColumn(
        "sq", portable_round(F.sqrt(F.col("n_src")), 6).cast("decimal(18,6)")
    )
    tot = counts.agg(
        F.sum("sq").alias("sq_tot"), F.sum("n_src").alias("n_tot")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "src",
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(TEMP_BUDGET_PCT / 100.0)
                * F.col("n_tot").cast("double")
                * (F.col("sq").cast("double") / F.col("sq_tot").cast("double"))
                / F.col("n_src").cast("double"),
            )
            * F.lit(float(TEMP_PPM))
        )
        .cast("bigint")
        .alias("keep_ppm"),
    )
    b = F.pmod(_bucket_raw(F.col(key_col), seed), F.lit(TEMP_PPM))
    return (
        df.select(F.col(key_col), F.col(source_col).alias("src"), b.alias("bucket"))
        .join(F.broadcast(rates), "src")
        .filter(F.col("bucket") < F.col("keep_ppm"))
        .select(
            F.col(key_col),
            F.col("src").alias(source_col),
            F.col("bucket").cast("bigint").alias("bucket"),
            F.col("keep_ppm"),
        )
    )


def temperature_sample_sql(
    table: str = "documents",
    key_col: str = "doc_id",
    source_col: str = "source",
    seed: int = TEMP_SEED,
) -> str:
    from spj_query_engine_spark.functions.hashing import portable_round_sql

    sq = portable_round_sql("sqrt(n_src)", 6)
    b = f"{_bucket_raw_sql(key_col, seed)} % {TEMP_PPM}"
    return f"""
    WITH counts AS (
      SELECT {source_col} AS src, count(*) AS n_src
      FROM {table} GROUP BY {source_col}
    ),
    sqs AS (
      SELECT src, n_src, CAST({sq} AS DECIMAL(18,6)) AS sq FROM counts
    ),
    tot AS (
      SELECT SUM(sq) AS sq_tot, SUM(n_src) AS n_tot FROM sqs
    ),
    rates AS (
      SELECT src,
             CAST(floor(
               least(1.0,
                     {TEMP_BUDGET_PCT / 100.0}
                     * CAST(n_tot AS DOUBLE)
                     * (CAST(sq AS DOUBLE) / CAST(sq_tot AS DOUBLE))
                     / CAST(n_src AS DOUBLE))
               * {float(TEMP_PPM)}) AS BIGINT) AS keep_ppm
      FROM sqs CROSS JOIN tot
    )
    SELECT d.{key_col}, d.{source_col},
           CAST({b} AS BIGINT) AS bucket, r.keep_ppm
    FROM {table} d JOIN rates r ON r.src = d.{source_col}
    WHERE {b} < r.keep_ppm
    """


# ---------------------------------------------------------------------------
# Curriculum ordering (p09) — deterministic difficulty-banded sort keys
# ---------------------------------------------------------------------------

CURR_BANDS = 4
CURR_SEED = 47


def curriculum_order(
    docs: DataFrame, key_col: str = "doc_id", seed: int = CURR_SEED
) -> DataFrame:
    """Curriculum data ordering: assign every document a difficulty band
    from its quality score (band 3 = highest quality, presented first in an
    easy-first curriculum) plus a salted-hash shuffle key WITHIN the band —
    the deterministic recipe for "sort by curriculum phase, random inside
    each phase" that training-data exports need.

    Deliberately emits SORT KEYS, not a materialized global order: a global
    row_number would serialize the corpus through one window partition at
    100 TB, while (band, sort_key) feeds Spark's write-time range
    partitioner (``df.sort(...)``/``write_zordered``) which total-orders
    via distributed range exchange.  Bands cut the 4-place-rounded quality
    score (exact in both engines), so band boundaries can never drift; the
    in-band order is the portable p01 hash — reproducible on any layout."""
    from spj_query_engine_spark.operators.textops import quality_score

    q = quality_score(docs).select(key_col, "quality")
    band = F.least(
        F.lit(CURR_BANDS - 1), F.floor(F.col("quality") * CURR_BANDS)
    ).cast("int")
    return q.select(
        F.col(key_col),
        band.alias("band"),
        F.pmod(_bucket_raw(F.col(key_col), seed), F.lit(TEMP_PPM))
        .cast("bigint")
        .alias("sort_key"),
    )


def curriculum_order_sql(table: str = "documents", seed: int = CURR_SEED) -> str:
    from spj_query_engine_spark.operators.textops import quality_score_sql

    b = f"{_bucket_raw_sql('doc_id', seed)} % {TEMP_PPM}"
    return f"""
    WITH q AS (SELECT doc_id, quality FROM ({quality_score_sql(table)}))
    SELECT doc_id,
           CAST(least({CURR_BANDS - 1}, floor(quality * {CURR_BANDS})) AS INT) AS band,
           CAST({b} AS BIGINT) AS sort_key
    FROM q
    """


# ---------------------------------------------------------------------------
# Snapshot diff (p10) — dataset-version audit
# ---------------------------------------------------------------------------


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table: every key is
    ``added`` (new only), ``removed`` (old only) or ``changed`` (digest of
    the compared columns differs) — the audit a training-data pipeline runs
    before publishing snapshot N+1, and the input to an incremental
    recompute (only ``added``/``changed`` keys need reprocessing).

    Scale shape: each side collapses to (key, md5-of-compared-columns)
    BEFORE the comparison, so the full-outer join shuffles 16-byte digests,
    never rows; unchanged keys (the overwhelming majority of a real
    snapshot pair) are filtered immediately after the join.  Digest inputs
    are stringified via DECIMAL for floats, so the text form — hence the
    digest — is identical in both engines."""

    def digested(df: DataFrame, alias: str) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("decimal(18,2)").cast("string"), F.lit("\x00"))
            if isinstance(df.schema[c].dataType, (T.DoubleType, T.FloatType))
            else F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in cols
        ]
        return df.select(
            F.col(key_col), F.md5(F.concat_ws("\x01", *parts)).alias(alias)
        )

    o = digested(old, "old_dig")
    n = digested(new, "new_dig")
    joined = o.join(n, key_col, "full_outer")
    change = (
        F.when(F.col("old_dig").isNull(), F.lit("added"))
        .when(F.col("new_dig").isNull(), F.lit("removed"))
        .when(F.col("old_dig") != F.col("new_dig"), F.lit("changed"))
    )
    return (
        joined.select(F.col(key_col), change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def _snapshot_v2_of_orders(orders: DataFrame) -> DataFrame:
    """Deterministic synthetic snapshot N+1 of orders: keys %97==0 removed,
    %13==0 get a price bump (changed), %101==0 re-appear shifted into a new
    key range (added)."""
    kept = orders.filter(F.col("o_orderkey") % 97 != 0)
    bumped = kept.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    added = orders.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(1_000_000_000)
    )
    return bumped.unionByName(added)


SNAPSHOT_COLS = ["o_orderstatus", "o_totalprice", "o_orderpriority"]


def orders_snapshot_diff(orders: DataFrame) -> DataFrame:
    """The registered p10 entry: diff orders against its deterministic
    synthetic next snapshot (see :func:`_snapshot_v2_of_orders`)."""
    return snapshot_diff(
        orders, _snapshot_v2_of_orders(orders), "o_orderkey", SNAPSHOT_COLS
    )


def orders_snapshot_diff_sql(table: str = "orders") -> str:
    def dig(prefix: str) -> str:
        return (
            "md5(concat_ws(chr(1), "
            f"COALESCE(CAST({prefix}o_orderstatus AS VARCHAR), chr(0)), "
            f"COALESCE(CAST(CAST({prefix}o_totalprice AS DECIMAL(18,2)) AS VARCHAR), chr(0)), "
            f"COALESCE(CAST({prefix}o_orderpriority AS VARCHAR), chr(0))))"
        )

    return f"""
    WITH v2 AS (
      SELECT o_orderkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM {table} WHERE o_orderkey % 97 != 0
      UNION ALL
      SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice, o_orderpriority
      FROM {table} WHERE o_orderkey % 101 = 0
    ),
    o AS (SELECT o_orderkey, {dig('')} AS old_dig FROM {table}),
    n AS (SELECT o_orderkey, {dig('')} AS new_dig FROM v2)
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.old_dig IS NULL THEN 'added'
                WHEN n.new_dig IS NULL THEN 'removed'
                WHEN o.old_dig != n.new_dig THEN 'changed' END AS change
    FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
    WHERE (CASE WHEN o.old_dig IS NULL THEN 'added'
                WHEN n.new_dig IS NULL THEN 'removed'
                WHEN o.old_dig != n.new_dig THEN 'changed' END) IS NOT NULL
    """


# ---------------------------------------------------------------------------
# Export manifest (p11) — the artifact a data release publishes
# ---------------------------------------------------------------------------


def export_manifest(docs: DataFrame) -> DataFrame:
    """Per-stream export manifest over the p05 packing: document count,
    token total, chunk count, and an order-sensitive digest of the member
    doc_ids — the receipt a training-data release ships so a consumer can
    verify shard completeness without re-reading text.  One
    vocabulary-of-buckets-sized rollup on top of the packing projection;
    the digest folds an explicitly sorted id list, so it is reproducible
    on any layout (and any engine — the oracle replays it)."""
    packed = pack_sequences(docs)
    return packed.groupBy("pack_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.max("chunk_last") + 1).alias("n_chunks"),
        F.md5(
            F.concat_ws(
                ",",
                F.expr(
                    "transform(array_sort(collect_list(doc_id)), x -> cast(x AS string))"
                ),
            )
        ).alias("doc_digest"),
    )


def export_manifest_sql(table: str = "documents") -> str:
    return f"""
    WITH packed AS ({pack_sequences_sql(table)})
    SELECT pack_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(MAX(chunk_last) + 1 AS BIGINT) AS n_chunks,
           md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS doc_digest
    FROM packed GROUP BY pack_bucket
    """


# ---------------------------------------------------------------------------
# Dataset data card (p12) — the release-time statistics sheet
# ---------------------------------------------------------------------------


def data_card(docs: DataFrame) -> DataFrame:
    """Per-source DATA CARD: the one-row-per-source statistics sheet a
    dataset release ships (Datasheets for Datasets, Gebru et al. 2021) —
    doc count, total token count, language inventory, dominant language and
    its share, mean/median document length.

    Shape: one groupBy(source, lang) rollup over the corpus (map-side
    partial aggregates), then windows and rollups over the SOURCES × LANGS
    result — bounded by the catalog, not the corpus.  The exact median is
    the one sort-based piece (percentile must see every doc length); at
    100 TB swap in approx_percentile exactly as documented on e09/e21.
    Token definition = t01's BPE-ish regex, so the card's token totals are
    consistent with every other token-counting entry.

    All outputs integer or portable-rounded; shares divide exact BIGINTs.
    """
    from pyspark.sql import Window

    from spj_query_engine_spark.functions.hashing import portable_round
    from spj_query_engine_spark.operators.textops import BPE_TOKEN_RE

    base = docs.select(
        "source",
        "lang",
        F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).alias("n_tokens"),
        "n_chars",
    )
    per_lang = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_docs").desc(), F.col("lang").asc()
    )
    ranked = per_lang.withColumn("rk", F.row_number().over(w))
    card = ranked.groupBy("source").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_langs"),
        F.max(F.when(F.col("rk") == 1, F.col("lang"))).alias("top_lang"),
        F.max(F.when(F.col("rk") == 1, F.col("n_docs"))).alias("top_lang_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    med = docs.groupBy("source").agg(
        portable_round(F.expr("percentile(n_chars, 0.5)"), 2).alias("median_chars")
    )
    share = F.col("top_lang_docs").cast("double") / F.col("n_docs").cast("double")
    mean_chars = F.col("sum_chars").cast("double") / F.col("n_docs").cast("double")
    return card.join(med, "source").select(
        "source",
        "n_docs",
        "total_tokens",
        "n_langs",
        "top_lang",
        portable_round(share, 6).alias("top_lang_share"),
        portable_round(mean_chars, 2).alias("mean_chars"),
        "median_chars",
    )


def data_card_sql(table: str = "documents") -> str:
    from spj_query_engine_spark.functions.hashing import portable_round_sql
    from spj_query_engine_spark.operators.textops import BPE_TOKEN_RE

    share = "top_lang_docs::DOUBLE / n_docs::DOUBLE"
    mean_chars = "sum_chars::DOUBLE / n_docs::DOUBLE"
    return f"""
    WITH base AS (
      SELECT source, lang,
             len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_tokens,
             n_chars
      FROM {table}
    ),
    per_lang AS (
      SELECT source, lang, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM base GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY n_docs DESC, lang ASC) AS rk
      FROM per_lang
    ),
    card AS (
      SELECT source,
             CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(count(*) AS BIGINT) AS n_langs,
             max(CASE WHEN rk = 1 THEN lang END) AS top_lang,
             CAST(max(CASE WHEN rk = 1 THEN n_docs END) AS BIGINT) AS top_lang_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM ranked GROUP BY source
    ),
    med AS (
      SELECT source, {portable_round_sql("quantile_cont(n_chars, 0.5)", 2)} AS median_chars
      FROM {table} GROUP BY source
    )
    SELECT card.source, n_docs, total_tokens, n_langs, top_lang,
           {portable_round_sql(share, 6)} AS top_lang_share,
           {portable_round_sql(mean_chars, 2)} AS mean_chars,
           median_chars
    FROM card JOIN med ON card.source = med.source
    """


# ---------------------------------------------------------------------------
# Exact-k balanced sample (p13) — equal representation per stratum
# ---------------------------------------------------------------------------

BALANCED_K = 50  # rows kept per stratum
BALANCED_SEED = 77


def balanced_sample(docs: DataFrame, stratum_col: str = "lang", k: int = BALANCED_K) -> DataFrame:
    """EXACTLY ``k`` rows per stratum (language), chosen by portable-hash
    rank — the balanced eval-set construction (equal representation per
    class regardless of class skew) that fraction-based stratified
    sampling (p02) cannot give: p02's keep-rate yields a BINOMIAL count
    per stratum, this yields a deterministic exact count, reproducible on
    any partitioning/engine because the rank key is the salted md5 of the
    row key, not a sampler state.

    Shape: one row_number window per stratum partition (same anatomy as
    t07's per-language top-k) — strata counts are bounded by the label
    vocabulary; AQE's skew handling covers a giant stratum.  Strata with
    fewer than k rows keep everything (the honest behavior; padding would
    fabricate data)."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        _bucket_raw(F.col("doc_id"), BALANCED_SEED), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", F.col(stratum_col).alias("stratum"), F.col("rk").cast("long").alias("rk"))
    )


def balanced_sample_sql(table: str = "documents", stratum_col: str = "lang", k: int = BALANCED_K) -> str:
    key = _bucket_raw_sql("doc_id", BALANCED_SEED)
    return f"""
    SELECT doc_id, {stratum_col} AS stratum, CAST(rk AS BIGINT) AS rk FROM (
      SELECT doc_id, {stratum_col},
             row_number() OVER (PARTITION BY {stratum_col}
                                ORDER BY {key}, doc_id) AS rk
      FROM {table}
    ) WHERE rk <= {k}
    """


# ---------------------------------------------------------------------------
# End-to-end pipeline (p14) — the whole curation chain as ONE plan
# ---------------------------------------------------------------------------


def e2e_pipeline(docs: DataFrame) -> DataFrame:
    """The full training-data curation chain as ONE declarative plan —
    quality filter → exact dedup (min-id survivor) → reproducible
    train/val/test split → per-split manifest (docs, tokens) — the
    composition every preceding entry is a piece of, run end-to-end so
    Catalyst sees the WHOLE pipeline and can pipeline the projections,
    prune columns across stages, and share the one real shuffle (the
    dedup groupBy).  This is the shape a 100 TB curation run ships:
    each stage is a projection or a single keyed aggregate; nothing
    materializes between stages unless the operator (not the
    orchestration) demands it.

    Stages (each individually oracle-proven elsewhere):
    * quality ≥ corpus median (t02's score, t11's relative-cut idea,
      collapsed to a global median scalar broadcast);
    * exact dedup keeps the min doc_id per md5(text) (d01's rule);
    * split by salted portable hash (p01);
    * manifest: docs + BPE-regex tokens per split (p11's counts)."""
    from pyspark.sql import Window

    from spj_query_engine_spark.operators.textops import BPE_TOKEN_RE, quality_score

    q = quality_score(docs).select("doc_id", "quality")
    med = q.agg(F.expr("percentile(quality, 0.5)").alias("med"))
    scored = docs.join(q, "doc_id").crossJoin(F.broadcast(med))
    kept = scored.filter(F.col("quality") >= F.col("med"))
    survivors = (
        kept.select(
            "doc_id",
            F.md5("text").alias("digest"),
            F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).alias("n_tokens"),
        )
        .withColumn("keeper", F.min("doc_id").over(Window.partitionBy("digest")))
        .filter(F.col("doc_id") == F.col("keeper"))
    )
    split = train_split(survivors, "doc_id").select("doc_id", "split")
    return (
        survivors.join(split, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def e2e_pipeline_sql(table: str = "documents") -> str:
    from spj_query_engine_spark.operators.textops import BPE_TOKEN_RE, quality_score_sql

    bucket = _bucket_sql("doc_id", 42)
    return f"""
    WITH q AS MATERIALIZED (
      SELECT doc_id, quality FROM ({quality_score_sql(table)})
    ),
    med AS (SELECT quantile_cont(quality, 0.5) AS med FROM q),
    kept AS (
      SELECT d.doc_id, d.text FROM {table} d
      JOIN q ON q.doc_id = d.doc_id, med
      WHERE q.quality >= med.med
    ),
    hashed AS (
      SELECT doc_id, md5(text) AS digest,
             len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_tokens,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      FROM kept
    ),
    survivors AS (SELECT * FROM hashed WHERE doc_id = keeper),
    labeled AS (
      SELECT *, CASE WHEN {bucket} < 80 THEN 'train'
                     WHEN {bucket} < 90 THEN 'val'
                     ELSE 'test' END AS split
      FROM survivors
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM labeled GROUP BY split
    """


# ---------------------------------------------------------------------------
# DSIR-style importance selection (p15)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 512
DSIR_SCALE = 10_000
DSIR_QUANTILE = 0.8


def dsir_selection(
    docs: DataFrame,
    target_lang: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    with hashed-unigram features, integer-exact: score every raw-corpus
    document by how target-like its token distribution is, select the top
    20 %, and report the per-language census.  The planted self-check: the
    target language's own documents must post the highest mean weight.

    Exactness design (the t12/t21 discipline): the per-bucket importance
    weight is the smoothed probability ratio kept INTEGER —
    ``(t_cnt+1)(r_total+B)·10⁴ div (r_cnt+1)(t_total+B)`` — and the
    per-document score is the integer mean of its tokens' weights, so
    every compared value is an exact BIGINT and the hash cannot drift;
    the only doubles are the final interpolated cutoff and the reported
    per-group mean of identical integers.

    Scale shape: one token explode feeding ONE bucket groupBy (the
    feature census — B=512 rows total, broadcast everywhere after), one
    per-doc aggregate (the only data-sized shuffle), and a single-row
    quantile broadcast.  The weight table is O(B) regardless of corpus
    size — at 100 TB only the two passes over tokens grow; drop
    DSIR_SCALE or pre-divide the totals if bucket counts approach
    2⁶³/(r_total·10⁴)."""
    B, SCALE = DSIR_BUCKETS, DSIR_SCALE
    tok = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    from spj_query_engine_spark.operators.core import barrier

    # r09 (§2.4): `bucketed` fed the raw census, target census, totals AND
    # the per-doc rollup — four tokenize+explode passes over the corpus.
    # One materialized token-bucket frame + ONE census rollup (conditional
    # count replaces the raw/tgt pair and their left join; totals are the
    # census's own column sums) + a materialized per-doc frame (it feeds
    # both the percentile cutoff and the final rollup) → one corpus pass.
    bucketed = barrier(
        tok.select(
            id_col, group_col, F.pmod(h32(F.col("tok")), F.lit(B)).alias("b")
        )
    )
    census = barrier(
        bucketed.groupBy("b").agg(
            F.count(F.lit(1)).alias("r_cnt"),
            F.count(F.when(F.col(group_col) == target_lang, 1)).alias("t_cnt"),
        )
    )
    totals = census.agg(
        F.sum("r_cnt").alias("r_total"), F.sum("t_cnt").alias("t_total")
    )
    weights = (
        census.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.expr(
                f"((t_cnt + 1) * (r_total + {B}) * {SCALE})"
                f" div ((r_cnt + 1) * (t_total + {B}))"
            ).alias("w"),
        )
    )
    per_doc = barrier(
        bucketed.join(F.broadcast(weights), "b")
        .groupBy(id_col, group_col)
        .agg(F.expr("sum(w) div count(*)").alias("avg_w"))
    )
    cut = per_doc.agg(F.expr(f"percentile(avg_w, {DSIR_QUANTILE})").alias("cutoff"))
    from spj_query_engine_spark.functions.hashing import portable_round

    return (
        per_doc.crossJoin(F.broadcast(cut))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("avg_w") >= F.col("cutoff")).cast("long")).alias(
                "n_selected"
            ),
            portable_round(
                F.sum("avg_w").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_weight"),
        )
    )


def dsir_selection_sql(table: str = "documents", target_lang: str = "en") -> str:
    from spj_query_engine_spark.functions.hashing import portable_round_sql

    B, SCALE = DSIR_BUCKETS, DSIR_SCALE
    return f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(lower(text), '\\s+')) AS tok
      FROM {table}
    ),
    bucketed AS (
      SELECT doc_id, lang, {h32_sql('tok')} % {B} AS b
      FROM tok WHERE tok <> ''
    ),
    raw AS (SELECT b, count(*)::BIGINT AS r_cnt FROM bucketed GROUP BY b),
    tgt AS (
      SELECT b, count(*)::BIGINT AS t_cnt FROM bucketed
      WHERE lang = '{target_lang}' GROUP BY b
    ),
    tot AS (
      SELECT count(*)::BIGINT AS r_total,
             (count(*) FILTER (lang = '{target_lang}'))::BIGINT AS t_total
      FROM bucketed
    ),
    w AS (
      SELECT raw.b,
             ((COALESCE(t_cnt, 0) + 1) * (r_total + {B}) * {SCALE})
               // ((r_cnt + 1) * (t_total + {B})) AS w
      FROM raw LEFT JOIN tgt USING (b), tot
    ),
    per_doc AS (
      SELECT doc_id, lang,
             CAST(SUM(w) AS BIGINT) // count(*) AS avg_w
      FROM bucketed JOIN w USING (b) GROUP BY doc_id, lang
    ),
    cut AS (SELECT quantile_cont(avg_w, {DSIR_QUANTILE}) AS cutoff FROM per_doc)
    SELECT lang,
           count(*)::BIGINT AS n_docs,
           CAST(sum(CASE WHEN avg_w >= cutoff THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected,
           {portable_round_sql('CAST(SUM(avg_w) AS DOUBLE) / count(*)', 4)}
             AS mean_weight
    FROM per_doc, cut GROUP BY lang
    """


# ---------------------------------------------------------------------------
# Source-interleaved training order (p16) — the data-ORDER half of mixing
# ---------------------------------------------------------------------------

INTERLEAVE_SHARDS = 8  # output shards the ordered stream is striped across


def interleave_sources(
    docs: DataFrame, source_col: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic SOURCE-INTERLEAVED training order: round-robin across
    sources so no contiguous run of one source dominates a training batch
    — p03/p15 decide WHAT to keep; this decides the ORDER it is consumed
    in (homogeneous runs correlate gradients; interleaving is the standard
    fix, and determinism makes the run replayable).

    Order key: rank of the doc within its source (by id — deterministic,
    no sampler state), then source name; position is the dense global
    index over that pair, so sources alternate A,B,C,A,B,C… until a
    source exhausts, exactly like a round-robin data loader.  The shard
    stripe (position mod shards) gives each training worker an identical
    source mix.

    Shape: one window per source partition (rank) + one global ordering
    window for position.  The global window is the honest cost of a TOTAL
    order — same as p09's curriculum; at 100 TB emit (rank, source) as
    the SORT KEY and let the writer's rangepartition produce the order
    without a single-partition window, or keep positions per-shard
    (partitionBy shard) — both documented forms of the same plan."""
    from pyspark.sql import Window

    per_src = Window.partitionBy(source_col).orderBy(id_col)
    glob = Window.orderBy("rr_rank", source_col)
    return (
        docs.select(id_col, source_col)
        .withColumn("rr_rank", F.row_number().over(per_src))
        .withColumn("position", F.row_number().over(glob).cast("long"))
        .select(
            id_col,
            source_col,
            F.col("rr_rank").cast("long").alias("rr_rank"),
            "position",
            F.pmod(F.col("position") - 1, F.lit(INTERLEAVE_SHARDS))
            .cast("long")
            .alias("shard"),
        )
    )


def interleave_sources_sql(table: str = "documents") -> str:
    return f"""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rr_rank
      FROM {table}
    )
    SELECT doc_id, source,
           CAST(rr_rank AS BIGINT) AS rr_rank,
           CAST(row_number() OVER (ORDER BY rr_rank, source) AS BIGINT) AS position,
           CAST((row_number() OVER (ORDER BY rr_rank, source) - 1)
                % {INTERLEAVE_SHARDS} AS BIGINT) AS shard
    FROM ranked
    """


# ---------------------------------------------------------------------------
# Token-budget pack (p17) — budgeted greedy selection by quality rank
# ---------------------------------------------------------------------------

BUDGET_PCT = 30  # token budget as a percent of the corpus total


def token_budget_pack(docs: DataFrame, budget_pct: int = BUDGET_PCT) -> DataFrame:
    """TOKEN-BUDGET selection: walk the corpus in quality order (t02's
    score, doc_id tie-break) and keep documents until the cumulative token
    count fills ``budget_pct`` percent of the corpus — "give me the best N
    tokens", the budgeted form of quality filtering every training run
    with a fixed compute budget performs (p14 cuts at a quality threshold;
    this cuts at a TOKEN total, which is what the budget actually is).

    A doc is kept iff the cumulative tokens THROUGH it stay ≤ budget, plus
    the first doc that crosses the line (so the budget is always reached —
    the standard greedy-fill convention: its cum_tokens - doc_tokens <
    budget test is integer-exact).  Budget = (total·pct) div 100, exact
    BIGINT.  Shape: one corpus projection for token counts, a broadcast
    1-row total, ONE ordered cumulative window — the honest global-order
    pass (at 100 TB: range-partition on the sort key, same plan the p16
    docstring documents).  Output: every kept doc with its rank and
    running total."""
    from pyspark.sql import Window

    from spj_query_engine_spark.operators.textops import quality_score

    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
            )
        )
        .cast("long")
        .alias("doc_tokens"),
    )
    scored = toks.join(
        quality_score(docs).select("doc_id", "quality"), "doc_id"
    )
    total = toks.agg(F.sum("doc_tokens").alias("total_tokens"))
    w = Window.orderBy(F.desc("quality"), F.asc("doc_id"))
    ranked = (
        scored.crossJoin(F.broadcast(total))
        .withColumn("sel_rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_tokens",
            F.sum("doc_tokens")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .withColumn(
            "budget", F.expr(f"(total_tokens * {budget_pct}) div 100").cast("long")
        )
    )
    return ranked.filter(
        F.col("cum_tokens") - F.col("doc_tokens") < F.col("budget")
    ).select("doc_id", "quality", "doc_tokens", "sel_rank", "cum_tokens")


def token_budget_pack_sql(
    table: str = "documents", budget_pct: int = BUDGET_PCT
) -> str:
    from spj_query_engine_spark.operators.textops import quality_score_sql

    return f"""
    WITH q AS ({quality_score_sql(table)}),
    toks AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> ''))::BIGINT AS doc_tokens
      FROM {table}
    ),
    scored AS (
      SELECT toks.doc_id, q.quality, toks.doc_tokens
      FROM toks JOIN q USING (doc_id)
    ),
    total AS (SELECT CAST(sum(doc_tokens) AS BIGINT) AS total_tokens FROM toks),
    ranked AS (
      SELECT doc_id, quality, doc_tokens,
             CAST(row_number() OVER (ORDER BY quality DESC, doc_id ASC)
                  AS BIGINT) AS sel_rank,
             CAST(sum(doc_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens,
             (total_tokens * {budget_pct}) // 100 AS budget
      FROM scored, total
    )
    SELECT doc_id, quality, doc_tokens, sel_rank, cum_tokens
    FROM ranked WHERE cum_tokens - doc_tokens < budget
    """


# ---------------------------------------------------------------------------
# Epoch reshuffle audit (p18) — per-epoch orders, decorrelation measured
# ---------------------------------------------------------------------------

EPOCH_SEED = 31


def epoch_orders(
    docs: DataFrame, id_col: str = "doc_id", epochs: tuple = (0, 1)
) -> DataFrame:
    """PER-EPOCH training order: each epoch orders the corpus by a portable
    hash salted with the epoch number, so every epoch is a fresh
    deterministic shuffle (same data, decorrelated order — what a training
    loop needs between epochs) reproducible on any cluster layout.  The
    output carries each doc's position in BOTH epochs plus the absolute
    rank displacement, so the decorrelation is MEASURED, not assumed:
    well-mixed epochs displace an average of ~n/3 positions (uniform
    permutation expectation); a broken salt shows displacement 0.

    Shape: one rank window per epoch over the salted hash (the honest
    total order, range-partitioned at 100 TB exactly as p16 documents) —
    corpus projected once, never joined to itself (positions meet via
    conditional aggregation, not a self-join)."""
    from pyspark.sql import Window

    e0, e1 = epochs
    stacked = docs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(e).alias("epoch"),
                        _bucket_raw(F.col(id_col), EPOCH_SEED + e).alias("h"),
                    )
                    for e in epochs
                ]
            )
        ).alias("eh"),
    ).select(id_col, "eh.epoch", "eh.h")
    w = Window.partitionBy("epoch").orderBy("h", id_col)
    ranked = stacked.withColumn("pos", F.row_number().over(w))
    per_doc = ranked.groupBy(id_col).agg(
        F.min(F.when(F.col("epoch") == e0, F.col("pos"))).alias("pos_e0"),
        F.min(F.when(F.col("epoch") == e1, F.col("pos"))).alias("pos_e1"),
    )
    return per_doc.select(
        id_col,
        F.col("pos_e0").cast("long").alias("pos_e0"),
        F.col("pos_e1").cast("long").alias("pos_e1"),
        F.abs(F.col("pos_e0") - F.col("pos_e1")).cast("long").alias("displacement"),
    )


def epoch_orders_sql(
    table: str = "documents", id_col: str = "doc_id", epochs: tuple = (0, 1)
) -> str:
    e0, e1 = epochs
    sel = " UNION ALL ".join(
        f"SELECT {id_col}, {e} AS epoch, "
        f"{_bucket_raw_sql(id_col, EPOCH_SEED + e)} AS h FROM {table}"
        for e in epochs
    )
    return f"""
    WITH stacked AS ({sel}),
    ranked AS (
      SELECT {id_col}, epoch,
             row_number() OVER (PARTITION BY epoch ORDER BY h, {id_col}) AS pos
      FROM stacked
    ),
    per_doc AS (
      SELECT {id_col},
             min(CASE WHEN epoch = {e0} THEN pos END) AS pos_e0,
             min(CASE WHEN epoch = {e1} THEN pos END) AS pos_e1
      FROM ranked GROUP BY {id_col}
    )
    SELECT {id_col},
           CAST(pos_e0 AS BIGINT) AS pos_e0,
           CAST(pos_e1 AS BIGINT) AS pos_e1,
           CAST(abs(pos_e0 - pos_e1) AS BIGINT) AS displacement
    FROM per_doc
    """


N_SHARDS = 8  # p19: target shard count


def balanced_shards(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """Work-balanced shard assignment: documents ranked by token count
    (descending, doc_id tie-break) are dealt to ``n_shards`` shards in
    SNAKE order (0..S-1, S-1..0, ...), the classic greedy bound for
    near-equal shard mass without an iterative bin-packer - round-robin
    by size rank guarantees every shard's token total is within one
    max-document of the others.  Emits the audit per shard: doc count,
    token mass, and its ppm share of the corpus - the pre-flight check
    before launching per-shard tokenization/training jobs that should
    finish together (the straggler budget IS the imbalance).

    The size rank is one global window (range-partitioned sort at scale,
    p16's documented form, over per-DOC rows - never token rows); the
    snake fold and the rollup are pure integer projections."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    from pyspark.sql import Window

    sized = docs.select("doc_id", F.size(toks).alias("n_toks"))
    w = Window.orderBy(F.desc("n_toks"), F.asc("doc_id"))
    period = 2 * n_shards
    assigned = sized.withColumn("rk", F.row_number().over(w) - 1).select(
        "doc_id",
        "n_toks",
        F.expr(
            f"CASE WHEN rk % {period} < {n_shards} THEN rk % {period} "
            f"ELSE {period - 1} - rk % {period} END"
        ).alias("shard"),
    )
    per_shard = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("shard_tokens"),
    )
    total = assigned.agg(F.sum("n_toks").alias("total_tokens")).filter(
        F.coalesce(F.col("total_tokens"), F.lit(0)) > 0
    )
    return per_shard.crossJoin(F.broadcast(total)).select(
        F.col("shard").cast("long").alias("shard"),
        "n_docs",
        F.col("shard_tokens").cast("long").alias("shard_tokens"),
        F.expr("(shard_tokens * 1000000) div total_tokens").alias("share_ppm"),
    )


def balanced_shards_sql(table: str = "documents", n_shards: int = N_SHARDS) -> str:
    period = 2 * n_shards
    return f"""
    WITH sized AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '')) AS n_toks
      FROM {table}
    ),
    assigned AS (
      SELECT doc_id, n_toks,
             CASE WHEN (rk % {period}) < {n_shards} THEN rk % {period}
                  ELSE {period - 1} - (rk % {period}) END AS shard
      FROM (SELECT *, row_number() OVER (ORDER BY n_toks DESC, doc_id) - 1 AS rk
            FROM sized)
    ),
    per_shard AS (
      SELECT shard, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS shard_tokens
      FROM assigned GROUP BY shard
    ),
    total AS (
      SELECT CAST(sum(n_toks) AS BIGINT) AS total_tokens FROM assigned
      HAVING sum(n_toks) > 0
    )
    SELECT shard::BIGINT AS shard, n_docs, shard_tokens,
           (shard_tokens * 1000000) // total_tokens AS share_ppm
    FROM per_shard, total
    """


QUALITY_BANDS = (0.25, 0.5, 0.75)  # p20 band edges over the t02 score


def source_quality_mix(docs: DataFrame) -> DataFrame:
    """Source x quality-band mix: docs and token mass per (source, t02
    quality band), with each band's ppm share WITHIN its source - the
    matrix that turns t02's per-doc score into a mixture decision (p03
    weights whole sources; this shows which sources earn their weight
    with high-quality mass and which pad it with junk; the per-source
    profile IS the input to reweighting or per-source thresholds).

    Band edges compare against the 4dp floor-rounded score, which both
    engines compute bit-identically (portable_round), so no boundary doc
    can band-flip between engines.  One codegen'd scoring projection +
    one rollup on (source, band) + a window over the tiny band frame."""
    from pyspark.sql import Window

    from spj_query_engine_spark.operators.textops import quality_score

    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    base = docs.select("doc_id", "source", F.size(toks).alias("n_toks"))
    scored = quality_score(docs).select("doc_id", "quality")
    lo, mid, hi = QUALITY_BANDS
    banded = base.join(scored, "doc_id").select(
        "source",
        "n_toks",
        F.when(F.col("quality") < lo, "q0_low")
        .when(F.col("quality") < mid, "q1_mid_low")
        .when(F.col("quality") < hi, "q2_mid_high")
        .otherwise("q3_high")
        .alias("band"),
    )
    grid = banded.groupBy("source", "band").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("tokens"),
    )
    per_src = Window.partitionBy("source")
    return grid.select(
        "source",
        "band",
        "n_docs",
        F.col("tokens").cast("long").alias("tokens"),
        F.expr("n_docs * 1000000").alias("_scaled"),
        F.sum("n_docs").over(per_src).alias("_src_total"),
    ).select(
        "source",
        "band",
        "n_docs",
        "tokens",
        F.expr("_scaled div _src_total").alias("share_ppm"),
    )


def source_quality_mix_sql(table: str = "documents") -> str:
    from spj_query_engine_spark.operators.textops import quality_score_sql

    lo, mid, hi = QUALITY_BANDS
    return f"""
    WITH scored AS ({quality_score_sql(table)}),
    base AS (
      SELECT d.source,
             len(list_filter(string_split_regex(lower(d.text), '\\s+'),
                             x -> x <> '')) AS n_toks,
             CASE WHEN s.quality < {lo} THEN 'q0_low'
                  WHEN s.quality < {mid} THEN 'q1_mid_low'
                  WHEN s.quality < {hi} THEN 'q2_mid_high'
                  ELSE 'q3_high' END AS band
      FROM {table} d JOIN scored s USING (doc_id)
    ),
    grid AS (
      SELECT source, band, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS tokens
      FROM base GROUP BY 1, 2
    )
    SELECT source, band, n_docs, tokens,
           CAST((n_docs * 1000000) //
                (sum(n_docs) OVER (PARTITION BY source)) AS BIGINT) AS share_ppm
    FROM grid
    """


RDV_SHARDS = 8  # p21: shard count BEFORE the reshard (the after-world adds one)


def rendezvous_shards(
    docs: DataFrame, id_col: str = "doc_id", n_shards: int = RDV_SHARDS
) -> DataFrame:
    """RENDEZVOUS (highest-random-weight) shard assignment and its reshard
    audit (Thaler & Ravishankar 1998): every doc scores each shard with a
    portable integer hash of (doc_id, shard) and lands on the argmax.
    Unlike mod-N hashing — where adding one shard reassigns ~all docs —
    HRW moves ONLY the docs whose new argmax IS the added shard
    (~1/(n+1) of the corpus), the property that makes resharding a 100 TB
    corpus an incremental copy instead of a full rewrite.  p19 balances
    token MASS with a global sort; this is the stateless membership
    function used when assignment must be computable from the key alone
    (routing, cache placement, incremental reshard).

    Output per BEFORE-shard: doc count, docs that move when shard
    ``n_shards`` is added, and the moved share in ppm — the reshard cost
    estimate read before the migration.  Every moved doc's destination is
    the new shard by construction (asserted in tests).

    Scale shape: explode n+1 integer scores per doc (pure projection, no
    text or payload), one map-side-combinable max_by per world, one
    rollup.  Nothing corpus-sized shuffles except the per-doc argmax rows
    (narrow longs); the hash is md5-derived so the DuckDB oracle replays
    every assignment bit-for-bit."""
    scored = docs.select(F.col(id_col).alias("doc_id")).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_shards))).alias("shard"),
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
    # max over (wt, -shard) == (wt DESC, shard ASC) — deterministic on ties
    before = (
        scored.filter(F.col("shard") < n_shards)
        .groupBy("doc_id")
        .agg(
            F.max_by("shard", F.struct(F.col("wt"), -F.col("shard"))).alias(
                "shard_before"
            )
        )
    )
    after = scored.groupBy("doc_id").agg(
        F.max_by("shard", F.struct(F.col("wt"), -F.col("shard"))).alias(
            "shard_after"
        )
    )
    moved = (F.col("shard_before") != F.col("shard_after")).cast("long")
    return (
        before.join(after, "doc_id")
        .groupBy(F.col("shard_before").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(moved).alias("n_moved"),
        )
        .select(
            "shard",
            "n_docs",
            "n_moved",
            F.expr("(n_moved * 1000000) div n_docs").alias("moved_ppm"),
        )
    )


def rendezvous_shards_sql(
    table: str = "documents", n_shards: int = RDV_SHARDS
) -> str:
    wt = h32_sql("(doc_id::VARCHAR || '@' || shard::VARCHAR)")
    return f"""
    WITH scored AS MATERIALIZED (
      SELECT doc_id, shard, {wt} AS wt
      FROM {table}, unnest(range({n_shards + 1})) AS u(shard)
    ),
    before AS (
      SELECT doc_id, shard AS shard_before FROM (
        SELECT doc_id, shard,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY wt DESC, shard ASC) AS rk
        FROM scored WHERE shard < {n_shards}
      ) WHERE rk = 1
    ),
    after AS (
      SELECT doc_id, shard AS shard_after FROM (
        SELECT doc_id, shard,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY wt DESC, shard ASC) AS rk
        FROM scored
      ) WHERE rk = 1
    )
    SELECT CAST(shard_before AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN shard_before != shard_after THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved,
           CAST((sum(CASE WHEN shard_before != shard_after THEN 1 ELSE 0 END)
            * 1000000) // count(*) AS BIGINT) AS moved_ppm
    FROM before JOIN after USING (doc_id)
    GROUP BY shard_before
    """


# ---------------------------------------------------------------------------
# Per-source quality cap (p22)
# ---------------------------------------------------------------------------

SOURCE_CAP_K = 15  # keep at most this many docs per source, best-quality first
SOURCE_CAP_SALT = 16  # level-1 fan-out for the salted top-K


def source_cap(docs: DataFrame, k: int = SOURCE_CAP_K) -> DataFrame:
    """Per-source quality-ranked CAP — the domain-capping step of
    CommonCrawl-style curation (C4 / RefinedWeb cap how much any one host
    may contribute): keep the ``k`` best-quality docs per source, drop the
    rest, deterministic tie-break on doc_id.

    Scale anatomy — deliberately NOT one ``row_number`` window per source
    (a hot source would serialize into a single task, and windows get no
    AQE skew splitting).  Instead a salted two-level top-K with bounded
    state everywhere: level 1 ranks within (source, doc_id mod SALT) —
    SALT× the parallelism on any skewed source — and keeps ≤ k rows per
    salt; level 2 sorts the ≤ SALT·k survivors per source (a tiny
    collect_list, bounded by construction) and extracts the k-th best
    (quality DESC, doc_id ASC) key as the source's admission CUTOFF.  The
    cutoffs broadcast back onto the corpus and the keep decision is one
    lexicographic struct compare per row.  Sources with fewer than k docs
    admit everything (the cutoff degrades to their worst key)."""
    from pyspark.sql import Window as W

    from spj_query_engine_spark.operators.textops import quality_score

    q = quality_score(docs).select("doc_id", "quality")
    scored = docs.select("doc_id", "source").join(q, "doc_id")
    key = F.struct(
        (-F.col("quality")).alias("nq"), F.col("doc_id").alias("d")
    )
    salted = scored.withColumn("salt", F.col("doc_id") % SOURCE_CAP_SALT)
    w1 = W.partitionBy("source", "salt").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    lvl1 = (
        salted.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .select("source", key.alias("key"))
    )
    cut = lvl1.groupBy("source").agg(
        F.element_at(
            F.slice(F.array_sort(F.collect_list("key")), 1, k), -1
        ).alias("cut")
    )
    return (
        scored.join(F.broadcast(cut), "source")
        .select(
            "doc_id",
            "source",
            "quality",
            (key <= F.col("cut")).alias("kept"),
        )
    )


def source_cap_sql(table: str = "documents", k: int = SOURCE_CAP_K) -> str:
    from spj_query_engine_spark.operators.textops import quality_score_sql

    return f"""
    WITH q AS (SELECT doc_id, quality FROM ({quality_score_sql(table)})),
    scored AS (
      SELECT d.doc_id, d.source, q.quality
      FROM {table} d JOIN q USING (doc_id)
    ),
    ranked AS (
      SELECT doc_id, source, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rn
      FROM scored
    )
    SELECT doc_id, source, quality, rn <= {k} AS kept FROM ranked
    """

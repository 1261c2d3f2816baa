"""Approximate-nearest-neighbor search over an embedding column.

Beyond-reference capability (BASELINE.json north star): similarity search
over ``array<float>`` embeddings, Spark-first.

Two paths:

* ``brute_force_topk`` — the exactness baseline: broadcast the (small) query
  set against the corpus, cosine per pair, per-query top-k window.  At 100 TB
  the corpus side stays partition-parallel and nothing shuffles except the
  final per-query k rows (window partitioned by query id after a corpus-side
  partial top-k would be the next optimization; the broadcast join itself is
  already the right shape).
* ``lsh_topk`` — the scale path: random-hyperplane LSH (Charikar 2002).
  Each vector gets a SIGN_BITS-bit bucket from deterministic md5-derived
  hyperplanes; candidates = corpus vectors whose bucket matches the query's
  bucket on ≥1 of the band projections; top-k within candidates.  Bucketing
  is a per-row projection; the candidate join is an equi-join on
  (band, bucket-chunk) — the corpus is never cross-joined.

The hyperplanes are PSEUDO-RANDOM BUT PORTABLE: component (j, i) =
h32(f"{j}_{i}") / 2^31 − 1 ∈ [−1, 1), computable as the same expression in
Spark and DuckDB, so even the approximate path is oracle-verified exactly.

Cosines fold left-to-right in double on both engines (see
operators.dedup.cosine_sim) and round to 6dp; top-k windows order by
(cosine DESC, vec_id) so ties break deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spj_query_engine_spark.functions.hashing import portable_round, portable_round_sql
from spj_query_engine_spark.operators.dedup import cosine_sim, cosine_sim_sql

TOP_K = 5
N_QUERIES = 5  # first N vec_ids serve as the query set
SIGN_BITS = 12  # hyperplane count
SIGN_BANDS = 3  # 3 bands × 4 bits for the candidate join
_BAND_WIDTH = SIGN_BITS // SIGN_BANDS


def _plane_component(j: int, i: Column) -> Column:
    """Deterministic hyperplane component in [-1, 1): md5-derived, identical
    in the oracle (no RNG, no driver-side state to broadcast)."""
    key = F.concat_ws("_", F.lit(j), i.cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return h.cast("double") / F.lit(2147483648.0) - F.lit(1.0)


def _plane_component_sql(j: int, i_expr: str) -> str:
    h = f"(('0x' || substr(md5({j} || '_' || ({i_expr})::VARCHAR), 1, 8))::BIGINT)"
    return f"({h}::DOUBLE / 2147483648.0 - 1.0)"


def sign_bucket(vec: Column) -> Column:
    """SIGN_BITS-bit LSH bucket: bit j = sign of ⟨plane_j, v⟩ (left-to-right
    double fold, same order as the oracle)."""
    def proj(j: int):
        # closure factory (a default-arg capture would change the lambda
        # arity pyspark infers for the HOF)
        return lambda v, i: v.cast("double") * _plane_component(j, i)

    out = F.lit(0).cast("long")
    for j in range(SIGN_BITS):
        dot = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), proj(j)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def sign_bucket_sql(vec: str) -> str:
    terms = []
    for j in range(SIGN_BITS):
        comp = _plane_component_sql(j, "i")
        dot = (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(len({vec})), i -> {vec}[i+1]::DOUBLE * {comp})), "
            f"(acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j}::BIGINT ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def brute_force_topk(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.
    The query side is tiny → broadcast; the corpus never shuffles until the
    per-query k-row window."""
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    sim = portable_round(cosine_sim(F.col("q_vec"), F.col("c_vec")), 6)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def brute_force_topk_sql(
    table: str = "embeddings", k: int = TOP_K, n_queries: int = N_QUERIES
) -> str:
    sim = portable_round_sql(cosine_sim_sql("q.embedding", "c.embedding"), 6)
    return f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {sim} AS cosine
      FROM {table} q JOIN {table} c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {n_queries}
    ),
    ranked AS (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, cand_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, cand_id, cosine, rank::BIGINT AS rank FROM ranked WHERE rank <= {k}
    """


def lsh_topk(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 of SIGN_BANDS bucket-chunks
    with the query (banded random-hyperplane LSH), then exact cosine + window
    within candidates only.  This is the 100 TB path: bucket assignment is a
    projection, candidate generation an equi-join on a few-bit key."""
    with_bucket = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col)).alias("bucket"),
    )
    mask = (1 << _BAND_WIDTH) - 1
    chunks = with_bucket.select(
        "vid",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("bucket"), b * _BAND_WIDTH)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(SIGN_BANDS)
                ]
            )
        ).alias("bc"),
    ).select("vid", "vec", "bc.band", "bc.chunk")
    q = chunks.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("q_vec"),
        F.col("band"),
        F.col("chunk"),
    )
    c = chunks.select(
        F.col("vid").alias("cand_id"), F.col("vec").alias("c_vec"), "band", "chunk"
    )
    cand = (
        c.join(F.broadcast(q), ["band", "chunk"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "q_vec", "cand_id", "c_vec")
        .distinct()
    )
    sim = portable_round(cosine_sim(F.col("q_vec"), F.col("c_vec")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        cand.select("query_id", "cand_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk_sql(table: str = "embeddings", k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    bucket = sign_bucket_sql("embedding")
    mask = (1 << _BAND_WIDTH) - 1
    band_selects = " UNION ALL ".join(
        f"SELECT vid, vec, {b} AS band, (bucket >> {b * _BAND_WIDTH}) & {mask} AS chunk "
        "FROM bucketed"
        for b in range(SIGN_BANDS)
    )
    sim = portable_round_sql(cosine_sim_sql("q_vec", "c_vec"), 6)
    return f"""
    WITH bucketed AS (
      SELECT vec_id AS vid, embedding AS vec, {bucket} AS bucket FROM {table}
    ),
    chunks AS ({band_selects}),
    cand AS (
      SELECT DISTINCT q.vid AS query_id, q.vec AS q_vec, c.vid AS cand_id, c.vec AS c_vec
      FROM chunks c JOIN chunks q ON c.band = q.band AND c.chunk = q.chunk
      WHERE q.vid < {n_queries} AND c.vid != q.vid
    ),
    ranked AS (
      SELECT query_id, cand_id, {sim} AS cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY {sim} DESC, cand_id ASC) AS rank
      FROM cand
    )
    SELECT query_id, cand_id, cosine, rank::BIGINT AS rank FROM ranked WHERE rank <= {k}
    """

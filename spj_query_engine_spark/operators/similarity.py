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

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spj_query_engine_spark.functions.hashing import (
    h32,
    h32_sql,
    portable_round,
    portable_round_sql,
)
from spj_query_engine_spark.operators.dedup import (
    cosine_sim,
    cosine_sim_sql,
    dot_product,
    neg_desc_key,
)

TOP_K = 5
N_QUERIES = 5  # first N vec_ids serve as the query set
SIGN_BITS = 12  # hyperplane count
SIGN_BANDS = 3  # 3 bands × 4 bits for the candidate join
_BAND_WIDTH = SIGN_BITS // SIGN_BANDS
EMB_DIM = 64  # testdata embedding dimensionality (drives unrolled codegen)
MAX_PLANE_DIM = 256  # LSH plane-matrix cap when the true dim is undeclared


def dim_of(df: DataFrame, vec_col: str) -> int | None:
    """Static embedding dimensionality WITHOUT running a job at plan-build
    time (the previous version issued a ``.first()`` — one extra Spark job
    per plan construction).  Parquet list columns carry no static length in
    the schema, so the only cheap source is the session conf
    ``spj.embedding.dim`` (set it at deployment); otherwise ``None`` selects
    the ``F.aggregate`` fold path, which handles any dimensionality AND
    measured ~3× faster than the unrolled element_at chain inside pair
    loops at sf0.1 (the unrolled form also risks janino's 64 KB method
    limit at higher dims)."""
    try:
        conf = df.sparkSession.conf.get("spj.embedding.dim", None)
        if conf is not None:
            return int(conf)
    except Exception:
        pass
    return None


def _plane_component(j: int, i: int) -> float:
    """Deterministic hyperplane component in [-1, 1): md5-derived from the
    (plane, dimension) index — a CONSTANT, computed once and inlined as a
    literal into both engines.  (Computing the md5 per row would cost
    dim × SIGN_BITS hashes per vector; as literals the whole bucket
    expression is straight-line codegen.)"""
    import hashlib

    h = int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:8], 16)
    return h / 2147483648.0 - 1.0


def _planes(dim: int) -> list[list[float]]:
    return [[_plane_component(j, i) for i in range(dim)] for j in range(SIGN_BITS)]


def _plane_dot(vec: Column, plane: list[float]) -> Column:
    """⟨plane, v⟩ as an unrolled left-to-right sum over literal components."""
    out = F.lit(0.0)
    for i, comp in enumerate(plane):
        out = out + F.element_at(vec, i + 1).cast("double") * F.lit(comp)
    return out


def sign_bucket(vec: Column, dim: int = EMB_DIM) -> Column:
    """SIGN_BITS-bit LSH bucket: bit j = sign of ⟨plane_j, v⟩.  Unrolled
    left-to-right sums over literal plane components — pure whole-stage
    codegen, same accumulation order as the oracle sequential fold."""
    out = F.lit(0).cast("long")
    for j, plane in enumerate(_planes(dim)):
        dot = F.lit(0.0)
        for i, comp in enumerate(plane):
            dot = dot + F.element_at(vec, i + 1).cast("double") * F.lit(comp)
        out = out + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def sign_bucket_sql(vec: str, dim: int = EMB_DIM) -> str:
    terms = []
    for j, plane in enumerate(_planes(dim)):
        parts = ["0.0::DOUBLE"] + [
            f"{vec}[{i + 1}]::DOUBLE * {comp!r}" for i, comp in enumerate(plane)
        ]
        dot = "(" + " + ".join(parts) + ")"
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
    from spj_query_engine_spark.operators.core import spread

    dim = dim_of(embeddings, vec_col)
    norm = F.sqrt(dot_product(F.col(vec_col), F.col(vec_col), dim))
    embeddings = spread(embeddings, id_col)
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        norm.alias("q_norm"),
    )
    c = embeddings.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"),
        norm.alias("c_norm"),
    )
    sim = portable_round(
        dot_product(F.col("q_vec"), F.col("c_vec"), dim) / (F.col("q_norm") * F.col("c_norm")),
        6,
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", sim.alias("cosine"))
    )
    # Two-phase top-k: a window over only query_id concentrates the WHOLE
    # scored corpus into n_queries tasks — a straggler at 100× corpus.  Phase
    # 1 takes top-k within (query_id, salt) — n_queries × n_salt parallel
    # partitions; phase 2's global window then ranks ≤ n_salt × k survivors
    # per query.  Exact: every global top-k row is top-k within its own salt
    # bucket, and both phases share the total order (cosine DESC, cand_id).
    n_salt = int(
        embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    w1 = Window.partitionBy("query_id", "salt").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    partial = (
        scored.withColumn("salt", F.pmod(F.col("cand_id"), F.lit(n_salt)))
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
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


def _sign_buckets(
    embeddings: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(vid, vec, norm, bucket) for every vector — the random-hyperplane
    bucket assignment shared by s02 and s18.  Matrix product in aggregate
    form: explode the vector to (vid, pos, val) rows, broadcast-join the
    dim × SIGN_BITS plane matrix on pos, then 13 codegen'd SUM aggregates
    per vid (12 plane dots + the squared norm).  Row count = n_vectors ×
    dim — linear, map-side partial sums, one shuffle on vid.  The per-row
    unrolled alternative (12 × dim literal-product chains) exceeds
    janino's 64 KB method limit and falls back to interpreted eval with
    multi-MiB task binaries.  Sign of a plane dot is order-insensitive in
    practice (|dot| >> 1e-15 accumulation noise), so buckets match the
    oracle's sequential-fold twin."""
    from spj_query_engine_spark.operators.core import spread

    dim = dim_of(embeddings, vec_col) or MAX_PLANE_DIM
    spark = embeddings.sparkSession
    planes = _planes(dim)
    pl = spark.createDataFrame(
        [(i, *[planes[j][i] for j in range(SIGN_BITS)]) for i in range(dim)],
        ["pos"] + [f"p{j}" for j in range(SIGN_BITS)],
    )
    el = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).withColumn("val", F.col("val").cast("double"))
    sums = (
        el.join(F.broadcast(pl), "pos")
        .groupBy("vid")
        .agg(
            F.first("vec").alias("vec"),
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm"),
            *[F.sum(F.col("val") * F.col(f"p{j}")).alias(f"pd{j}") for j in range(SIGN_BITS)],
        )
    )
    bucket = F.lit(0).cast("long")
    for j in range(SIGN_BITS):
        bucket = bucket + F.when(
            F.col(f"pd{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("vid", "vec", "norm", bucket.alias("bucket"))


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
    from spj_query_engine_spark.operators.core import spread

    # Plane-matrix size: the declared dim when known, else a generous cap.
    # Oversizing is FREE and exact — the explode emits only positions that
    # exist in the data, so plane rows beyond the true dimensionality never
    # join and contribute nothing; a corpus wider than the cap (no conf set)
    # would silently ignore the tail, hence the cap is deliberately large.
    from spj_query_engine_spark.operators.core import barrier

    # r09 (§2.4): the bucket frame feeds FOUR consumers (query ids, corpus
    # band chunks, query vectors, candidate vectors) — as a lazy subtree the
    # explode + 13-aggregate bucket derivation planned and ran once per
    # consumer (column pruning narrowed two of them, but each still paid the
    # n x dim explode shuffle).  One linear materialization serves all four.
    with_bucket = barrier(_sign_buckets(embeddings, vec_col, id_col))
    mask = (1 << _BAND_WIDTH) - 1

    # Band-chunk keys as IDS ONLY: the multi-probe dedup below needs just
    # (query_id, cand_id), and carrying the two 64-double vectors through
    # that distinct made the pair shuffle ~16x wider than the ids (the one
    # corpus-volume exchange in the old plan — also its phase-jitter
    # exposure at bench scale).  Column pruning then strips `vec` (and the
    # unused plane sums) out of the id-side _sign_buckets derivations.
    def band_chunks(src: DataFrame) -> DataFrame:
        return src.select(
            "vid",
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
        ).select("vid", "bc.band", "bc.chunk")

    q_side = with_bucket.filter(F.col("vid") < n_queries)
    q_ids = band_chunks(q_side).select(
        F.col("vid").alias("query_id"), "band", "chunk"
    )
    cand_ids = (
        band_chunks(with_bucket)
        .join(F.broadcast(q_ids), ["band", "chunk"])
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("cand_id"))
        .distinct()
    )
    # Vectors attach AFTER the dedup.  Only q_vecs — bounded by n_queries —
    # carries an explicit broadcast hint; the pairs↔corpus attach is left
    # UN-hinted because pair volume grows with band-collision structure
    # (the bucket cap is deliberately large), not with the bounded query
    # count: AQE broadcasts the pair side while its runtime size is small
    # (the sf0.1 plan is unchanged) and degrades to a shuffle join on
    # cand_id past the broadcast threshold, where a pinned pair-volume
    # broadcast would instead exceed driver/broadcast limits.
    q_vecs = q_side.select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("q_vec"),
        F.col("norm").alias("q_norm"),
    )
    cand = (
        with_bucket.select(
            F.col("vid").alias("cand_id"),
            F.col("vec").alias("c_vec"),
            F.col("norm").alias("c_norm"),
        )
        .join(cand_ids, "cand_id")
        .join(F.broadcast(q_vecs), "query_id")
    )
    sim = portable_round(
        dot_product(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")),
        6,
    )
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse quantizer + probed cells
# ---------------------------------------------------------------------------

N_CELLS = 16  # coarse-quantizer cell count
N_PROBE = 2  # cells probed per query


def ivf_topk(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest of ``n_cells``
    centroid cells (coarse quantizer), probe the ``n_probe`` nearest cells
    per query, exact-rerank only within probed cells.

    Default centroids are the first ``n_cells`` vectors (deterministic seed
    selection — k-means|| initialization truncated at iteration 0 — so the
    DuckDB oracle can replay cell assignment exactly); pass ``centroids``
    (cid, c_vec) to drop in trained ones (:func:`ivf_topk_trained`) without
    changing any join shape.  Scale anatomy: assignment is a broadcast
    nested-loop over n×C pairs (map-only, no shuffle of the corpus), the
    candidate join is an equi-join on cell id, and the rerank touches
    ``n_probe/n_cells`` of the corpus per query instead of all of it — the
    IVF trade the reference engine has no analog for.
    """
    from spj_query_engine_spark.operators.core import spread

    emb = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    cent = centroids if centroids is not None else emb.filter(
        F.col("vid") < n_cells
    ).select(F.col("vid").alias("cid"), F.col("vec").alias("c_vec"))
    pair_sim = cosine_sim(F.col("vec"), F.col("c_vec"))
    aw = Window.partitionBy("vid").orderBy(F.desc("sim"), F.asc("cid"))
    ranked = (
        emb.crossJoin(F.broadcast(cent))
        .select("vid", "vec", "cid", pair_sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(aw))
    )
    cells = ranked.filter(F.col("rnk") == 1).select("vid", F.col("cid").alias("cell"))
    probes = ranked.filter((F.col("vid") < n_queries) & (F.col("rnk") <= n_probe)).select(
        F.col("vid").alias("query_id"), F.col("cid").alias("cell")
    )
    cand = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("cand_id"))
        .distinct()
    )
    q = emb.select(F.col("vid").alias("query_id"), F.col("vec").alias("q_vec"))
    c = emb.select(F.col("vid").alias("cand_id"), F.col("vec").alias("c_vec"))
    sim = portable_round(cosine_sim(F.col("q_vec"), F.col("c_vec")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "cand_id")
        .select("query_id", "cand_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def ivf_topk_sql(
    table: str = "embeddings",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
) -> str:
    assign_sim = cosine_sim_sql("b.embedding", "c.c_vec")
    sim = portable_round_sql(cosine_sim_sql("q.embedding", "cv.embedding"), 6)
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS c_vec FROM {table} WHERE vec_id < {n_cells}
    ),
    ranked AS (
      SELECT b.vec_id AS vid, c.cid,
             row_number() OVER (PARTITION BY b.vec_id
                                ORDER BY {assign_sim} DESC, c.cid ASC) AS rnk
      FROM {table} b CROSS JOIN cent c
    ),
    cells AS (SELECT vid, cid AS cell FROM ranked WHERE rnk = 1),
    probes AS (
      SELECT vid AS query_id, cid AS cell FROM ranked
      WHERE vid < {n_queries} AND rnk <= {n_probe}
    ),
    cand AS (
      SELECT DISTINCT p.query_id, a.vid AS cand_id
      FROM cells a JOIN probes p ON a.cell = p.cell
      WHERE a.vid != p.query_id
    ),
    scored AS (
      SELECT cand.query_id, cand.cand_id, {sim} AS cosine
      FROM cand
      JOIN {table} q ON q.vec_id = cand.query_id
      JOIN {table} cv ON cv.vec_id = cand.cand_id
    )
    SELECT query_id, cand_id, cosine, rank::BIGINT AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


def ivf_topk_trained(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    max_iter: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF with a TRAINED coarse quantizer: seeded Spark MLlib k-means fits
    the cell centroids, then the same probe/rerank pipeline as
    :func:`ivf_topk` runs against them.

    Trained cells track the data distribution (on THIS synthetic corpus the
    seed cells of s03 look better only because the benchmark's query set IS
    the seed set — see the probe-count note in :func:`ivf_trained_recall`);
    the cost is one k-means fit (distributed Lloyd iterations — each a
    broadcast-assign + groupBy-mean, the exact join shapes the rest of this
    module uses).  No DuckDB oracle: k-means
    is iterative floating-point optimization whose tie-breaks are not
    replayable in SQL — the driver records a rows-only check for this
    entry (the oracle-checked s03 covers the pipeline's correctness).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from spj_query_engine_spark.operators.core import spread

    emb = spread(embeddings, id_col)
    feats = emb.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, maxIter=max_iter, initSteps=1, seed=seed).fit(feats)
    spark = embeddings.sparkSession
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cid int, c_vec array<double>",
    )
    return ivf_topk(
        embeddings,
        vec_col=vec_col,
        id_col=id_col,
        k=k,
        n_queries=n_queries,
        n_cells=n_cells,
        n_probe=n_probe,
        centroids=cent,
    )


KMEANS_ROUNDS = 2  # Lloyd rounds of the REPLAYABLE trained quantizer (s04)


def kmeans_centroids_replayable(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = N_CELLS,
    rounds: int = KMEANS_ROUNDS,
) -> DataFrame:
    """Deterministic, ORACLE-REPLAYABLE spherical k-means for the coarse
    quantizer: seed centroids are the first ``n_cells`` vectors, then
    ``rounds`` Lloyd iterations of (assign to max-cosine cell, recompute the
    cell centroid).

    Why this is hash-replayable when MLlib's fit is not: the one
    non-replayable float op in Lloyd's update is the MEAN (division plus
    order-dependent double summation).  Cosine assignment is SCALE-
    INVARIANT, so the division never needs to happen — the "centroid" kept
    here is the per-cell elementwise SUM, accumulated in DECIMAL(38,18)
    (order-independent, bit-identical in DuckDB) and cast back to double.
    cos(v, Σx) == cos(v, Σx/n) exactly, so assignments — and therefore the
    final cells — match the textbook spherical k-means while every
    intermediate is integer/decimal-exact.  Empty cells keep their previous
    centroid (both engines COALESCE).

    Scale anatomy per round: one broadcast n×C assignment (map-side
    ``max_by`` argmax, no vector-bearing shuffle) + one posexplode to
    (cell, dim) partial sums — map-side-combinable, shuffle volume C×dim
    rows.  The fit costs ``rounds`` corpus scans, which is what k-means
    training IS; C and rounds are knobs, never the corpus squared."""
    from spj_query_engine_spark.operators.core import spread

    emb = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    cent = emb.filter(F.col("vid") < n_cells).select(
        F.col("vid").cast("int").alias("cid"),
        F.col("vec").cast("array<double>").alias("c_vec"),
    )
    for _ in range(rounds):
        assigned = (
            emb.crossJoin(F.broadcast(cent))
            .select(
                "vid", "vec", "cid",
                cosine_sim(F.col("vec"), F.col("c_vec")).alias("sim"),
            )
            .groupBy("vid")
            .agg(
                F.max_by("cid", F.struct(F.col("sim"), -F.col("cid"))).alias("cid"),
                F.first("vec").alias("vec"),
            )
        )
        sums = (
            assigned.select(
                "cid",
                F.posexplode(F.col("vec").cast("array<double>")),
            )
            .select("cid", F.col("pos").alias("d"), F.col("col").alias("x"))
            .groupBy("cid", "d")
            .agg(F.sum(F.col("x").cast("decimal(38,18)")).alias("s"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("d", "s"))).alias("ds"))
            .select(
                "cid",
                F.transform(F.col("ds"), lambda t: t["s"].cast("double")).alias(
                    "new_vec"
                ),
            )
        )
        cent = (
            cent.join(sums, "cid", "left")
            .select("cid", F.coalesce("new_vec", "c_vec").alias("c_vec"))
        )
    return cent


def ivf_topk_kmeans(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    rounds: int = KMEANS_ROUNDS,
) -> DataFrame:
    """s04: IVF ANN whose coarse quantizer is TRAINED by the replayable
    spherical k-means above — the same probe/rerank pipeline as s03 against
    learned cells, with a full DuckDB oracle (the k-means rounds unroll into
    CTEs).  The MLlib-trained variant (:func:`ivf_topk_trained`) remains the
    production path where exact replay is not required; its quality is gated
    by s05's recall check."""
    cent = kmeans_centroids_replayable(
        embeddings, vec_col=vec_col, id_col=id_col, n_cells=n_cells, rounds=rounds
    )
    return ivf_topk(
        embeddings,
        vec_col=vec_col,
        id_col=id_col,
        k=k,
        n_queries=n_queries,
        n_cells=n_cells,
        n_probe=n_probe,
        centroids=cent,
    )


def ivf_topk_kmeans_sql(
    table: str = "embeddings",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    rounds: int = KMEANS_ROUNDS,
    dim: int = EMB_DIM,
) -> str:
    """DuckDB twin of :func:`ivf_topk_kmeans`: the Lloyd rounds unroll into
    MATERIALIZED CTE chains (a0→s1→c1→a1→s2→c2…), then s03's probe/rerank
    SQL runs against the final centroid CTE."""
    assign = cosine_sim_sql("e.vec", "c.c_vec")
    parts = [
        f"WITH emb AS MATERIALIZED (SELECT vec_id AS vid, embedding AS vec FROM {table}),",
        f"c0 AS MATERIALIZED (SELECT CAST(vec_id AS INT) AS cid, "
        f"list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c_vec "
        f"FROM {table} WHERE vec_id < {n_cells}),",
    ]
    prev = "c0"
    for r in range(1, rounds + 1):
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT vid, cid, vec FROM ("
            f"SELECT e.vid, c.cid, e.vec, row_number() OVER (PARTITION BY e.vid "
            f"ORDER BY {assign} DESC, c.cid ASC) AS rn "
            f"FROM emb e CROSS JOIN {prev} c) WHERE rn = 1),"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT cid, i AS d, "
            f"SUM(CAST(vec[i+1] AS DECIMAL(38,18))) AS s "
            f"FROM a{r} CROSS JOIN (SELECT unnest(range({dim})) AS i) "
            f"GROUP BY cid, i),"
        )
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT p.cid, COALESCE(n.v, p.c_vec) AS c_vec "
            f"FROM {prev} p LEFT JOIN (SELECT cid, list(CAST(s AS DOUBLE) ORDER BY d) "
            f"AS v FROM s{r} GROUP BY cid) n ON n.cid = p.cid),"
        )
        prev = f"c{r}"
    assign_sim = cosine_sim_sql("b.embedding", "c.c_vec")
    sim = portable_round_sql(cosine_sim_sql("q.embedding", "cv.embedding"), 6)
    parts.append(
        f"""
    ranked AS (
      SELECT b.vec_id AS vid, c.cid,
             row_number() OVER (PARTITION BY b.vec_id
                                ORDER BY {assign_sim} DESC, c.cid ASC) AS rnk
      FROM {table} b CROSS JOIN {prev} c
    ),
    cells AS (SELECT vid, cid AS cell FROM ranked WHERE rnk = 1),
    probes AS (
      SELECT vid AS query_id, cid AS cell FROM ranked
      WHERE vid < {n_queries} AND rnk <= {n_probe}
    ),
    cand AS (
      SELECT DISTINCT p.query_id, a.vid AS cand_id
      FROM cells a JOIN probes p ON a.cell = p.cell
      WHERE a.vid != p.query_id
    ),
    scored AS (
      SELECT cand.query_id, cand.cand_id, {sim} AS cosine
      FROM cand
      JOIN {table} q ON q.vec_id = cand.query_id
      JOIN {table} cv ON cv.vec_id = cand.cand_id
    )
    SELECT query_id, cand_id, cosine, rank::BIGINT AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """
    )
    return "\n".join(parts)


RECALL_MIN = 0.8  # trained IVF must recover ≥ this fraction of the exact top-k
RECALL_PROBE = 10  # probes for the recall gate (see note in ivf_trained_recall)


def ivf_trained_recall(
    embeddings: DataFrame,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    min_recall: float = RECALL_MIN,
    n_probe: int = RECALL_PROBE,
) -> DataFrame:
    """In-engine recall gate for the trained-IVF path: recall@k of
    :func:`ivf_topk_trained` against :func:`brute_force_topk`'s exact top-k,
    asserted ≥ ``min_recall``.

    The k-means fit itself is not SQL-replayable (iterative floating-point
    optimization), so s04's listing can only get a rows-only driver check —
    this query closes that gap: the OUTCOME (does the trained quantizer
    recover the exact neighbors?) is verified against a constant oracle,
    turning 'trained ANN works' into a driver-proven row.  One row out:
    (k, n_queries, recall_ok).

    Probe-count note (measured at sf0.01/sf0.001): the UNTRAINED seed
    quantizer hits 0.92 recall at n_probe=2 because the first-n vectors
    double as both the query set and the seed centroids — each query sits
    exactly on a centroid, a benchmark-selection artifact, not a property of
    seed cells.  The trained quantizer has no such advantage; n_probe=10 of
    16 cells gives 0.88 (sf0.01) / 0.96 (sf0.001) / 0.96 (sf0.1) — the
    honest setting this gate asserts at across every shipped scale."""
    exact = brute_force_topk(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "cand_id"
    )
    approx = ivf_topk_trained(
        embeddings, k=k, n_queries=n_queries, n_probe=n_probe
    ).select("query_id", "cand_id", F.lit(1).alias("hit"))
    return (
        exact.join(approx, ["query_id", "cand_id"], "left")
        .agg(
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count(F.lit(1))
            ).alias("recall")
        )
        .select(
            F.lit(k).cast("long").alias("k"),
            F.lit(n_queries).cast("long").alias("n_queries"),
            (F.col("recall") >= min_recall).cast("long").alias("recall_ok"),
        )
    )


def ivf_trained_recall_sql(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    """Constant oracle: the assertion the Spark side must reproduce."""
    return (
        f"SELECT {k}::BIGINT AS k, {n_queries}::BIGINT AS n_queries, "
        f"1::BIGINT AS recall_ok"
    )


# ---------------------------------------------------------------------------
# k-NN self-join (s06) — every vector's top-k neighbors via shared IVF cells
# ---------------------------------------------------------------------------

KNN_K = 3  # neighbors kept per vector
KNN_CELLS = 16  # default cell count (conf `spj.knn.cells` scales it)


def _ivf_rerank(
    emb: DataFrame, probes: DataFrame, homes: DataFrame,
    id_col: str, k: int, cell: str,
) -> DataFrame:
    """CELL-keyed exact rerank shared by s06/s09: attach vectors to the
    probe and home rows (corpus-sized, one vector each) and equi-join on
    the cell id, so scored pairs stream from the join straight into the
    cosine projection — the pair-sized intermediate is never shuffled
    with vectors attached.  The naive cand→q→m form ships q_vec through
    EVERY candidate row (n·probe·cell_size rows × vec ≈ 22 GB at 100×);
    here the shuffled volume is the two vector-bearing inputs (≈ 0.25 GB)
    plus the narrow (qid, nbr, cosine) window input.  (qid, mid) pairs
    are unique by construction — each mid has exactly ONE home cell and
    probes carry one row per (vid, cell) — so no distinct is needed.

    Norms are precomputed ONCE per vector (s01's pattern) so the pair loop
    runs a single dot-product fold instead of three — sqrt(x·x) is the
    identical IEEE op either side of the join, so the rounded cosine is
    bit-identical to the inline form (and to the oracle twin)."""
    emb_n = emb.withColumn(
        "nrm", F.sqrt(dot_product(F.col("vec"), F.col("vec")))
    )
    qv = probes.join(
        emb_n.select(
            F.col("vid").alias("qid"),
            F.col("vec").alias("q_vec"),
            F.col("nrm").alias("q_nrm"),
        ),
        "qid",
    )
    mv = homes.join(
        emb_n.select(
            F.col("vid").alias("mid"),
            F.col("vec").alias("m_vec"),
            F.col("nrm").alias("m_nrm"),
        ),
        "mid",
    )
    sim = portable_round(
        dot_product(F.col("q_vec"), F.col("m_vec"))
        / (F.col("q_nrm") * F.col("m_nrm")),
        6,
    )
    return (
        qv.join(mv, cell)
        .filter(F.col("qid") != F.col("mid"))
        .select(
            F.col("qid").alias(id_col),
            F.col("mid").alias("nbr_id"),
            sim.alias("cosine"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.desc("cosine"), F.asc("nbr_id")
                )
            ),
        )
        .filter(F.col("rank") <= k)
    )


def knn_join(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = KNN_K,
    n_cells: int | None = None,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """k-NN SELF-join: every vector's top-``k`` cosine neighbors across the
    whole corpus — the batch-ANN workhorse behind kNN-graph construction
    (HNSW/NN-Descent seeding, graph-based semantic dedup, label
    propagation).  s01–s04 answer a handful of queries; this answers n.

    All-pairs is n² and never acceptable; the IVF decomposition bounds the
    work: each vector joins only members of its ``n_probe`` nearest cells,
    giving Σ_cells |probers| × |members| scored pairs (≈ n²·probe/cells,
    tunable via conf ``spj.knn.cells`` ≈ corpus/target_cell_size — same
    lever as d12; centroids stay seed-deterministic so the oracle replays
    assignment exactly).  Candidate generation is one equi-join on cell id;
    scoring joins ship only (id, vec) pairs; per-vector top-k is a window
    over candidate sets bounded by cell size, never the corpus."""
    from spj_query_engine_spark.operators.core import spread
    from spj_query_engine_spark.operators.dedup import (
        FLAT_ASSIGN_MAX,
        prefix_rows,
        resolve_quantizer_cells,
    )

    if n_cells is None:
        n_cells = resolve_quantizer_cells(
            embeddings, conf_key="spj.knn.cells", default_cells=KNN_CELLS
        )
    if n_cells > FLAT_ASSIGN_MAX:
        # flat assignment is n x n_cells = O(n²/cell_size) once cells scale
        # with the corpus; past the threshold the quantizer goes two-level
        # (d06's switch replayed on the k-NN join).  Gate-scale corpora
        # never cross it, so the flat oracle replays exactly where it runs.
        return knn_join_2level(
            embeddings,
            vec_col=vec_col,
            id_col=id_col,
            k=k,
            n_cells=n_cells,
            branch=max(KNN_BRANCH, math.ceil(math.sqrt(n_cells))),
            n_probe=n_probe,
        )
    emb = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    # one norm per vector/centroid instead of two extra folds per scored
    # row — sqrt(x·x) is the same IEEE op, so ranks are bit-identical
    emb_n = emb.withColumn(
        "nrm", F.sqrt(dot_product(F.col("vec"), F.col("vec")))
    )
    cent = prefix_rows(emb_n, "vid", n_cells).select(
        F.col("vid").alias("cid"),
        F.col("vec").alias("c_vec"),
        F.col("nrm").alias("c_nrm"),
    )
    aw = Window.partitionBy("vid").orderBy(F.desc("sim"), F.asc("cid"))
    from spj_query_engine_spark.operators.core import barrier

    # r09 (§2.4): homes (rnk=1) and probes (rnk<=n_probe) both hang off the
    # assignment window — as two filters over an UNMATERIALIZED frame the
    # whole crossJoin+window chain planned (and ran) twice, with no exchange
    # reuse because the filters differ.  Materialize the pruned assignment
    # ONCE (n x n_probe narrow rows — linear in the corpus, no vectors) and
    # slice homes out of probes, which strictly contain them.
    assign = barrier(
        emb_n.crossJoin(F.broadcast(cent))
        .select(
            "vid",
            "cid",
            (
                dot_product(F.col("vec"), F.col("c_vec"))
                / (F.col("nrm") * F.col("c_nrm"))
            ).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(aw))
        .filter(F.col("rnk") <= n_probe)
        .select("vid", "cid", "rnk")
    )
    homes = assign.filter(F.col("rnk") == 1).select(
        F.col("vid").alias("mid"), "cid"
    )
    probes = assign.select(F.col("vid").alias("qid"), "cid")
    return _ivf_rerank(emb, probes, homes, id_col, k, "cid")


def knn_join_sql(
    table: str = "embeddings",
    k: int = KNN_K,
    n_cells: int | str | None = None,
    n_probe: int = N_PROBE,
) -> str:
    from spj_query_engine_spark.operators.dedup import (
        auto_cells_sql,
        branched_assign_sql,
    )

    if n_cells is None:
        # corpus-derived cell count, INCLUDING the engine's flat/two-level
        # switch past FLAT_ASSIGN_MAX (d06's guarded-union move)
        cells = auto_cells_sql(table, KNN_CELLS)
        return branched_assign_sql(
            knn_join_sql(table, k, cells, n_probe),
            knn_join_2level_sql(table, k, n_probe=n_probe),
            cells,
        )
    assign_sim = cosine_sim_sql("b.embedding", "c.c_vec")
    sim = portable_round_sql(cosine_sim_sql("q.embedding", "m.embedding"), 6)
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS c_vec FROM {table} ORDER BY vec_id LIMIT {n_cells}
    ),
    ranked AS (
      SELECT b.vec_id AS vid, c.cid,
             row_number() OVER (PARTITION BY b.vec_id
                                ORDER BY {assign_sim} DESC, c.cid ASC) AS rnk
      FROM {table} b CROSS JOIN cent c
    ),
    homes AS (SELECT vid AS mid, cid FROM ranked WHERE rnk = 1),
    probes AS (SELECT vid AS qid, cid FROM ranked WHERE rnk <= {n_probe}),
    cand AS (
      SELECT DISTINCT p.qid, h.mid
      FROM probes p JOIN homes h ON p.cid = h.cid
      WHERE p.qid != h.mid
    ),
    scored AS (
      SELECT cand.qid AS vec_id, cand.mid AS nbr_id, {sim} AS cosine
      FROM cand
      JOIN {table} q ON q.vec_id = cand.qid
      JOIN {table} m ON m.vec_id = cand.mid
    )
    SELECT vec_id, nbr_id, cosine, rank::BIGINT AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cosine DESC, nbr_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Product quantization (s07) — compress vectors to M sub-space codes
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (64-dim → 8 × 8-dim)
PQ_K = 16  # centroids per subspace


def _l2sq(x: Column, y: Column, n: int) -> Column:
    """Unrolled squared-L2 with LEFT-TO-RIGHT accumulation (bit-identical
    to the oracle's list_reduce fold, same discipline as dot_product)."""
    out = F.lit(0.0)
    for i in range(1, n + 1):
        d = F.element_at(x, i).cast("double") - F.element_at(y, i).cast("double")
        out = out + d * d
    return out


def pq_encode(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = PQ_M,
    k_cent: int = PQ_K,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Product quantization (Jégou et al., TPAMI'11): split each vector
    into ``m`` sub-spaces, assign every sub-vector to its nearest of
    ``k_cent`` per-sub-space centroids, emit the code word — 64 float32s
    become ``m`` small ints (512 → 8 bytes/vector at these settings), the
    compression that makes billion-vector ANN indexes fit in RAM.
    Codebooks are seed-deterministic (sub-vectors of the first ``k_cent``
    vectors — k-means iteration 0, same convention as the IVF quantizer)
    so the DuckDB oracle replays assignment bit-for-bit; ties break on
    code asc via struct-min.

    Output: (vec_id, codes array<int>, err2) where err2 is the total
    squared reconstruction error, folded in sub-space order so both
    engines accumulate identically.  Scale shape: the corpus explodes to
    n×m sub-vector rows, joins the BROADCAST m×k codebook (128 rows),
    and partial-aggregates the per-(vec, sub-space) min map-side — one
    shuffle of n×m narrow rows, no all-pairs anywhere."""
    from spj_query_engine_spark.operators.core import spread

    sub = dim // m
    emb = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    subvecs = F.expr(
        f"transform(sequence(0, {m - 1}), i -> slice(vec, i * {sub} + 1, {sub}))"
    )
    parts = emb.select("vid", F.posexplode(subvecs).alias("sub_m", "subvec"))
    cent = emb.filter(F.col("vid") < k_cent).select(
        F.col("vid").cast("int").alias("code"),
        F.posexplode(subvecs).alias("sub_m", "csub"),
    )
    scored = parts.join(F.broadcast(cent), "sub_m").select(
        "vid",
        "sub_m",
        "code",
        _l2sq(F.col("subvec"), F.col("csub"), sub).alias("d"),
    )
    best = scored.groupBy("vid", "sub_m").agg(
        F.min(F.struct(F.col("d"), F.col("code"))).alias("best")
    )
    per_vec = best.groupBy("vid").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(sub_m, best.code AS code))), "
            "s -> s.code)"
        ).alias("codes"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(sub_m, best.d AS d))), "
            "s -> s.d), 0.0D, (acc, v) -> acc + v)"
        ).alias("err2_raw"),
    )
    return per_vec.select(
        F.col("vid").alias(id_col),
        "codes",
        portable_round(F.col("err2_raw"), 4).alias("err2"),
    )


def pq_encode_sql(
    table: str = "embeddings", m: int = PQ_M, k_cent: int = PQ_K
) -> str:
    def l2sq(x: str, y: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(len({x})), i -> "
            f"({x}[i+1]::DOUBLE - {y}[i+1]::DOUBLE) * ({x}[i+1]::DOUBLE - {y}[i+1]::DOUBLE))), "
            f"(acc, v) -> acc + v)"
        )

    err2 = portable_round_sql(
        "list_reduce(list_prepend(0.0::DOUBLE, list(d ORDER BY sub_m)), (acc, v) -> acc + v)",
        4,
    )
    return f"""
    WITH parts AS (
      SELECT vec_id AS vid, sub_m,
             list_slice(embedding, sub_m * (len(embedding) // {m}) + 1,
                        (sub_m + 1) * (len(embedding) // {m})) AS subvec
      FROM {table}, unnest(range(0, {m})) AS u(sub_m)
    ),
    cent AS (
      SELECT CAST(vid AS INTEGER) AS code, sub_m, subvec AS csub
      FROM parts WHERE vid < {k_cent}
    ),
    scored AS (
      SELECT p.vid, p.sub_m, c.code, {l2sq('p.subvec', 'c.csub')} AS d
      FROM parts p JOIN cent c USING (sub_m)
    ),
    best AS (
      SELECT vid, sub_m, code, d FROM (
        SELECT *, row_number() OVER (PARTITION BY vid, sub_m
                                     ORDER BY d ASC, code ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT vid AS vec_id,
           list(code ORDER BY sub_m) AS codes,
           {err2} AS err2
    FROM best GROUP BY vid
    """


def pq_encode_words(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = PQ_M,
    k_cent: int = PQ_K,
    dim: int = EMB_DIM,
) -> DataFrame:
    """s07's gate shape: the ``m`` code words packed big-endian into ONE
    BIGINT (fold ``acc * k_cent + code`` in sub-space order) — literally the
    "8 bytes per vector" the PQ paper promises (16^8 = 2^32 fits easily),
    and an atomic column for the driver's hash gate, whose pandas
    canonicalizer cannot sort array cells (CORRECTNESS_r02 m01/u01 errors).
    The array-valued ``pq_encode`` stays as the internal building block
    (s08/s12 join on the exploded codes)."""
    enc = pq_encode(embeddings, vec_col, id_col, m, k_cent, dim)
    return enc.select(
        id_col,
        F.expr(f"aggregate(codes, 0L, (acc, c) -> acc * {k_cent} + c)").alias(
            "code_word"
        ),
        "err2",
    )


def pq_encode_words_sql(
    table: str = "embeddings", m: int = PQ_M, k_cent: int = PQ_K
) -> str:
    return f"""
    WITH base AS ({pq_encode_sql(table, m, k_cent)})
    SELECT vec_id,
           list_reduce(list_prepend(0::BIGINT, codes),
                       (acc, c) -> acc * {k_cent} + c) AS code_word,
           err2
    FROM base
    """


def pq_adc_topk(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    m: int = PQ_M,
    k_cent: int = PQ_K,
    dim: int = EMB_DIM,
) -> DataFrame:
    """ANN over PQ codes by Asymmetric Distance Computation (s08): each
    query builds a tiny (m × k_cent) lookup table of exact sub-space
    distances to every codeword, and every database vector's approximate
    distance is the m-term LUT sum addressed by its codes — the classic
    PQ search (Jégou et al. §IV): the corpus is scanned as CODES (8 bytes
    a vector), never as floats.

    Scale shape: the LUT (n_queries × m × k_cent rows) broadcasts; the
    exploded code column equi-joins it on (sub_m, code); the per-(query,
    vector) sum folds in sub-space order so both engines accumulate
    identically — making this approximate index fully VALUE-replayable in
    SQL (codes and codebooks are seed-deterministic), a stronger check
    than a recall gate.  Top-k ranks on the rounded distance with id
    tie-break, s01's convention."""
    from spj_query_engine_spark.operators.core import spread

    sub = dim // m
    emb = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    subvecs = F.expr(
        f"transform(sequence(0, {m - 1}), i -> slice(vec, i * {sub} + 1, {sub}))"
    )
    dbx = pq_encode(embeddings, vec_col, id_col, m, k_cent, dim).select(
        F.col(id_col).alias("cand_id"),
        F.posexplode("codes").alias("sub_m", "code"),
    )
    qparts = emb.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("qid"), F.posexplode(subvecs).alias("sub_m", "qsub")
    )
    cent = emb.filter(F.col("vid") < k_cent).select(
        F.col("vid").cast("int").alias("code"),
        F.posexplode(subvecs).alias("sub_m", "csub"),
    )
    lut = qparts.join(F.broadcast(cent), "sub_m").select(
        "qid", "sub_m", "code", _l2sq(F.col("qsub"), F.col("csub"), sub).alias("d")
    )
    contrib = dbx.join(F.broadcast(lut), ["sub_m", "code"]).filter(
        F.col("cand_id") != F.col("qid")
    )
    scored = contrib.groupBy("qid", "cand_id").agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(sub_m, d))), "
            "s -> s.d), 0.0D, (acc, v) -> acc + v)"
        ).alias("adc_raw")
    )
    return (
        scored.select(
            F.col("qid").alias("query_id"),
            "cand_id",
            portable_round(F.col("adc_raw"), 6).alias("adc"),
        )
        .withColumn("rank", F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("cand_id"))
        ))
        .filter(F.col("rank") <= k)
    )


def pq_adc_topk_sql(
    table: str = "embeddings",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    m: int = PQ_M,
    k_cent: int = PQ_K,
) -> str:
    def l2sq(x: str, y: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(len({x})), i -> "
            f"({x}[i+1]::DOUBLE - {y}[i+1]::DOUBLE) * ({x}[i+1]::DOUBLE - {y}[i+1]::DOUBLE))), "
            f"(acc, v) -> acc + v)"
        )

    adc = portable_round_sql(
        "list_reduce(list_prepend(0.0::DOUBLE, list(d ORDER BY sub_m)), (acc, v) -> acc + v)",
        6,
    )
    return f"""
    WITH enc AS ({pq_encode_sql(table, m, k_cent)}),
    dbx AS (
      SELECT vec_id AS cand_id, sub_m, codes[sub_m + 1] AS code
      FROM enc, unnest(range(0, {m})) AS u(sub_m)
    ),
    qparts AS (
      SELECT vec_id AS qid, sub_m,
             list_slice(embedding, sub_m * (len(embedding) // {m}) + 1,
                        (sub_m + 1) * (len(embedding) // {m})) AS qsub
      FROM {table}, unnest(range(0, {m})) AS u(sub_m)
      WHERE vec_id < {n_queries}
    ),
    centp AS (
      SELECT CAST(vec_id AS INTEGER) AS code, sub_m,
             list_slice(embedding, sub_m * (len(embedding) // {m}) + 1,
                        (sub_m + 1) * (len(embedding) // {m})) AS csub
      FROM {table}, unnest(range(0, {m})) AS u(sub_m)
      WHERE vec_id < {k_cent}
    ),
    lut AS (
      SELECT q.qid, q.sub_m, c.code, {l2sq('q.qsub', 'c.csub')} AS d
      FROM qparts q JOIN centp c USING (sub_m)
    ),
    contrib AS (
      SELECT x.cand_id, l.qid, x.sub_m, l.d
      FROM dbx x JOIN lut l ON l.sub_m = x.sub_m AND l.code = x.code
      WHERE x.cand_id != l.qid
    ),
    scored AS (
      SELECT qid AS query_id, cand_id, {adc} AS adc
      FROM contrib GROUP BY qid, cand_id
    )
    SELECT query_id, cand_id, adc, rank::BIGINT AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc ASC, cand_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


KNN_BRANCH = 4  # level-1 fan-out for the two-level k-NN assignment


def knn_join_2level(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = KNN_K,
    n_cells: int | None = None,
    branch: int | None = None,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """k-NN self-join with a TWO-LEVEL quantizer assignment (s09) — s06's
    100×-scale form.  s06 assigns by crossJoin against ALL cells; with the
    required guidance n_cells ∝ n, that assignment is O(n²/cell_size) —
    the d06-vs-d12 lesson replayed on the k-NN join.  Here a vector finds
    its nearest of ``branch`` level-1 centroids (n × branch), then its
    ``n_probe`` nearest LEAF cells within that level-1 cell
    (n × n_cells/branch); candidate generation and exact rerank are
    unchanged equi-joins on the leaf id.  Total assignment cost
    n × (branch + n_cells/branch), minimized at branch ≈ √n_cells; the
    tree is deterministic prefix vectors, fully oracle-replayable.

    Boundary note: as in d12, neighbors straddling a level-1 boundary are
    reachable only through a shared probed leaf — the standard
    hierarchical trade, bounded by the leaf-level multi-probe.

    Measured anatomy at 100× (200k vectors, 1600 leaves, probe 2): level-1
    + leaf assignment ≈ 12 s, cell-keyed candidate join ≈ 14 s, and the
    remaining ~80 s is scoring + per-vector top-k over the ~126M candidate
    pairs the pinned (probe, cell-size) config implies — i.e. the exact
    rerank is PAIR-BOUND, not shuffle-bound; cutting wall further means
    cutting candidates (coarser probes / smaller cells), not plan work."""
    from spj_query_engine_spark.operators.core import spread
    from spj_query_engine_spark.operators.dedup import (
        cosine_sim,
        prefix_rows,
        resolve_quantizer_cells,
    )

    if n_cells is None:
        n_cells = resolve_quantizer_cells(
            embeddings, conf_key="spj.knn.cells", default_cells=KNN_CELLS
        )
    if branch is None:
        branch = max(KNN_BRANCH, math.ceil(math.sqrt(n_cells)))
    base = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    # one norm per vector/centroid instead of two extra folds per scored
    # row — sqrt(x·x) is the same IEEE op, so ranks are bit-identical
    base_n = base.withColumn(
        "nrm", F.sqrt(dot_product(F.col("vec"), F.col("vec")))
    )
    from spj_query_engine_spark.operators.core import barrier

    # one TakeOrdered pass serves both centroid sets: c1 is the first
    # `branch` rows of the leaf prefix (both ascending-id prefixes), so
    # materialize the bounded n_cells-row frame once and slice — the
    # broadcast builds stop re-scanning the corpus per centroid set
    leaf_all = barrier(prefix_rows(base_n, "vid", n_cells))
    c1 = prefix_rows(leaf_all, "vid", branch).select(
        F.col("vid").alias("c1"),
        F.col("vec").alias("c1_vec"),
        F.col("nrm").alias("c1_nrm"),
    )
    leaf = leaf_all.select(
        F.col("vid").alias("leaf"),
        F.col("vec").alias("leaf_vec"),
        F.col("nrm").alias("leaf_nrm"),
    )
    # argmax assignments are MAP-SIDE-COMBINABLE max_by aggregates, not
    # row_number windows: the crossJoin leaves each vid's `branch` rows in
    # one partition, so partial aggregation collapses n×branch rows to n
    # BEFORE the shuffle — a window would sort-shuffle the full n×branch
    # set (with vectors attached) per level.  Tie order matches the old
    # window exactly: max over (sim, -id) == (DESC sim, ASC id).
    leaf_parent = (
        leaf.crossJoin(F.broadcast(c1))
        .select(
            "leaf", "leaf_vec", "leaf_nrm", "c1",
            (
                dot_product(F.col("leaf_vec"), F.col("c1_vec"))
                / (F.col("leaf_nrm") * F.col("c1_nrm"))
            ).alias("lsim"),
        )
        .groupBy("leaf")
        .agg(
            F.max_by("c1", F.struct(F.col("lsim"), -F.col("c1"))).alias("c1"),
            F.first("leaf_vec").alias("leaf_vec"),
            F.first("leaf_nrm").alias("leaf_nrm"),
        )
        .select("leaf", "leaf_vec", "leaf_nrm", "c1")
    )
    v_l1 = (
        base_n.crossJoin(F.broadcast(c1))
        .select(
            "vid", "vec", "nrm", "c1",
            (
                dot_product(F.col("vec"), F.col("c1_vec"))
                / (F.col("nrm") * F.col("c1_nrm"))
            ).alias("vsim"),
        )
        .groupBy("vid")
        .agg(
            F.max_by("c1", F.struct(F.col("vsim"), -F.col("c1"))).alias("c1"),
            F.first("vec").alias("vec"),
            F.first("nrm").alias("nrm"),
        )
    )
    # leaf-level top-n_probe: collect the ≤ n_cells/branch candidate leaves
    # per vid (narrow structs, no vectors), sort, slice — ascending sort on
    # (-asim, leaf) == (DESC asim, ASC leaf), rnk = position + 1
    topp = (
        v_l1.join(F.broadcast(leaf_parent), "c1")
        .select(
            "vid", "leaf",
            (
                dot_product(F.col("vec"), F.col("leaf_vec"))
                / (F.col("nrm") * F.col("leaf_nrm"))
            ).alias("asim"),
        )
        .groupBy("vid")
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
                n_probe,
            ).alias("tops")
        )
        .select("vid", F.posexplode("tops"))
        .select(
            "vid",
            F.col("col.leaf").alias("leaf"),
            (F.col("pos") + 1).alias("rnk"),
        )
    )
    # r09 (§2.4): homes and probes are two filters over topp — without a
    # barrier the whole two-level assignment chain (v_l1 + leaf_parent +
    # topp aggregates) planned and ran twice.  topp is n x n_probe narrow
    # rows (no vectors) — materialize once, slice homes out of probes.
    topp = barrier(topp)
    homes = topp.filter(F.col("rnk") == 1).select(
        F.col("vid").alias("mid"), "leaf"
    )
    probes = topp.select(F.col("vid").alias("qid"), "leaf")
    return _ivf_rerank(base, probes, homes, id_col, k, "leaf")


def knn_join_2level_sql(
    table: str = "embeddings",
    k: int = KNN_K,
    n_cells: int | str | None = None,
    branch: int | str | None = None,
    n_probe: int = N_PROBE,
) -> str:
    from spj_query_engine_spark.operators.dedup import (
        auto_branch_sql,
        auto_cells_sql,
    )

    if n_cells is None:
        n_cells = auto_cells_sql(table, KNN_CELLS)
    if branch is None:
        branch = auto_branch_sql(table, KNN_BRANCH, KNN_CELLS)
    lsim = cosine_sim_sql("l.embedding", "c.embedding")
    vsim = cosine_sim_sql("b.embedding", "c.embedding")
    asim = cosine_sim_sql("v.v", "lp.leaf_vec")
    sim = portable_round_sql(cosine_sim_sql("q.embedding", "m.embedding"), 6)
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
    ranked AS (
      SELECT lp.leaf, v.id,
             row_number() OVER (PARTITION BY v.id
                                ORDER BY {asim} DESC, lp.leaf ASC) AS rnk
      FROM v_l1 v JOIN leaf_parent lp ON v.c1 = lp.c1
    ),
    homes AS (SELECT id AS mid, leaf FROM ranked WHERE rnk = 1),
    probes AS (SELECT id AS qid, leaf FROM ranked WHERE rnk <= {n_probe}),
    cand AS (
      SELECT DISTINCT p.qid, h.mid
      FROM probes p JOIN homes h ON p.leaf = h.leaf
      WHERE p.qid != h.mid
    ),
    scored AS (
      SELECT cand.qid AS vec_id, cand.mid AS nbr_id, {sim} AS cosine
      FROM cand
      JOIN {table} q ON q.vec_id = cand.qid
      JOIN {table} m ON m.vec_id = cand.mid
    )
    SELECT vec_id, nbr_id, cosine, rank::BIGINT AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cosine DESC, nbr_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Radius (range) search (s10) — every neighbor above a similarity floor
# ---------------------------------------------------------------------------

RANGE_T = 0.35  # cosine floor for range search


def range_search(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    threshold: float = RANGE_T,
) -> DataFrame:
    """Radius search: ALL corpus vectors with cosine ≥ ``threshold`` of each
    query, restricted to the query's ``n_probe`` IVF cells — the
    retrieval-filter dual of top-k ANN (s03): k-NN bounds the RESULT size,
    range search bounds the QUALITY, which is what dedup sweeps and
    contamination scans actually want.

    Scale shape: identical probe/candidate equi-joins to :func:`ivf_topk`,
    but the final stage is a pure FILTER on the scored candidates — no
    per-query window, no rank, nothing serializes on query id, so (unlike
    any top-k formulation) the last stage parallelizes over candidate rows
    regardless of how many land on one query.  Same seed-deterministic
    quantizer as s03/d06, so the DuckDB oracle replays cell assignment
    exactly.
    """
    from spj_query_engine_spark.operators.core import spread

    emb = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    cent = emb.filter(F.col("vid") < n_cells).select(
        F.col("vid").alias("cid"), F.col("vec").alias("c_vec")
    )
    aw = Window.partitionBy("vid").orderBy(F.desc("sim"), F.asc("cid"))
    ranked = (
        emb.crossJoin(F.broadcast(cent))
        .select("vid", "cid", cosine_sim(F.col("vec"), F.col("c_vec")).alias("sim"))
        .withColumn("rnk", F.row_number().over(aw))
    )
    cells = ranked.filter(F.col("rnk") == 1).select("vid", F.col("cid").alias("cell"))
    probes = ranked.filter(
        (F.col("vid") < n_queries) & (F.col("rnk") <= n_probe)
    ).select(F.col("vid").alias("query_id"), F.col("cid").alias("cell"))
    cand = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("cand_id"))
        .distinct()
    )
    q = emb.select(F.col("vid").alias("query_id"), F.col("vec").alias("q_vec"))
    c = emb.select(F.col("vid").alias("cand_id"), F.col("vec").alias("c_vec"))
    sim = portable_round(cosine_sim(F.col("q_vec"), F.col("c_vec")), 6)
    return (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "cand_id")
        .select("query_id", "cand_id", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def range_search_sql(
    table: str = "embeddings",
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    threshold: float = RANGE_T,
) -> str:
    assign_sim = cosine_sim_sql("b.embedding", "c.c_vec")
    sim = portable_round_sql(cosine_sim_sql("q.embedding", "cv.embedding"), 6)
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS c_vec FROM {table} WHERE vec_id < {n_cells}
    ),
    ranked AS (
      SELECT b.vec_id AS vid, c.cid,
             row_number() OVER (PARTITION BY b.vec_id
                                ORDER BY {assign_sim} DESC, c.cid ASC) AS rnk
      FROM {table} b CROSS JOIN cent c
    ),
    cells AS (SELECT vid, cid AS cell FROM ranked WHERE rnk = 1),
    probes AS (
      SELECT vid AS query_id, cid AS cell FROM ranked
      WHERE vid < {n_queries} AND rnk <= {n_probe}
    ),
    cand AS (
      SELECT DISTINCT p.query_id, a.vid AS cand_id
      FROM cells a JOIN probes p ON a.cell = p.cell
      WHERE a.vid != p.query_id
    )
    SELECT cand.query_id, cand.cand_id, {sim} AS cosine
    FROM cand
    JOIN {table} q ON q.vec_id = cand.query_id
    JOIN {table} cv ON cv.vec_id = cand.cand_id
    WHERE {sim} >= {threshold}
    """


# ---------------------------------------------------------------------------
# LSH recall evaluation (s11) — approximate index quality as a query
# ---------------------------------------------------------------------------


def lsh_recall(embeddings: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES) -> DataFrame:
    """Per-query recall@k of the LSH index (s02) against the exact top-k
    (s01) — the index-quality evaluation a pipeline runs before trusting an
    approximate index, as an ENGINE QUERY rather than an offline notebook:
    both sides are the already-registered deterministic operators, the
    comparison is one semi-join + rollup, and the result (unlike s05's
    single recall gate for the trained quantizer) is the full per-query
    table, so a recall regression localizes to the query that caused it.

    Scale: the two top-k result sets are n_queries × k rows — tiny by
    construction — so every join here is broadcast-size regardless of
    corpus scale; the cost is the two underlying index scans, which share
    nothing and parallelize independently."""
    from concurrent.futures import ThreadPoolExecutor

    from spj_query_engine_spark.operators.core import barrier

    # r09 (§2.4): `exact` feeds both the semi-join and the per-query frame —
    # as a lazy plan the whole brute-force corpus scan ran twice for an
    # n_queries x k result.  Materialize the tiny result once.
    # r10 (§2.6): that barrier and lsh_topk's internal bucket barrier are
    # independent jobs that used to run back-to-back at construction time;
    # submit them from two driver threads so the wall is max, not sum.
    def exact_leg() -> DataFrame:
        return barrier(
            brute_force_topk(embeddings, k=k, n_queries=n_queries).select(
                "query_id", "cand_id"
            )
        )

    def approx_leg() -> DataFrame:
        return lsh_topk(embeddings, k=k, n_queries=n_queries).select(
            "query_id", "cand_id"
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_exact = pool.submit(exact_leg)
        f_approx = pool.submit(approx_leg)
        exact, approx = f_exact.result(), f_approx.result()
    hits = exact.join(approx, ["query_id", "cand_id"], "left_semi")
    per_q = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        exact.select("query_id")
        .distinct()
        .join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("recall"),
        )
    )


def lsh_recall_sql(
    table: str = "embeddings", k: int = TOP_K, n_queries: int = N_QUERIES
) -> str:
    return f"""
    WITH exact AS (
      SELECT query_id, cand_id FROM ({brute_force_topk_sql(table, k, n_queries)})
    ),
    approx AS (
      SELECT query_id, cand_id FROM ({lsh_topk_sql(table, k, n_queries)})
    ),
    hits AS (
      SELECT e.query_id, count(*) AS n_hits
      FROM exact e
      WHERE EXISTS (SELECT 1 FROM approx a
                    WHERE a.query_id = e.query_id AND a.cand_id = e.cand_id)
      GROUP BY e.query_id
    )
    SELECT q.query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {float(k)} AS recall
    FROM (SELECT DISTINCT query_id FROM exact) q
    LEFT JOIN hits h ON h.query_id = q.query_id
    """


# ---------------------------------------------------------------------------
# IVF + PQ combined index (s12) — coarse cells + compressed-domain rerank
# ---------------------------------------------------------------------------


def ivf_pq_topk(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    m: int = PQ_M,
    k_cent: int = PQ_K,
    dim: int = EMB_DIM,
) -> DataFrame:
    """The IVFPQ index (Jégou et al. §V — the composition behind
    billion-vector ANN deployments): the coarse IVF quantizer restricts
    each query to its ``n_probe`` cells (s03's candidate join), then
    candidates are scored by PQ asymmetric distance over 8-byte codes
    (s08's LUT join) instead of exact float rerank — the memory-bound scan
    touches ``n_probe/n_cells`` of the corpus AND reads codes, not
    vectors.

    Scale anatomy: both index structures broadcast (centroids, per-query
    LUTs); the corpus appears twice — once through the cell assignment,
    once as exploded codes — and every join is an equi-join on (cell) or
    (sub-space, code).  Like s08, distances fold in sub-space order, so
    even this doubly-approximate index is VALUE-replayable in SQL: codes,
    cells and LUTs are all seed-deterministic."""
    from spj_query_engine_spark.operators.core import spread

    sub = dim // m
    emb = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    # --- coarse IVF: cell per vector, probed cells per query (s03) ---
    ccent = emb.filter(F.col("vid") < n_cells).select(
        F.col("vid").alias("cid"), F.col("vec").alias("c_vec")
    )
    aw = Window.partitionBy("vid").orderBy(F.desc("sim"), F.asc("cid"))
    ranked = (
        emb.crossJoin(F.broadcast(ccent))
        .select("vid", "cid", cosine_sim(F.col("vec"), F.col("c_vec")).alias("sim"))
        .withColumn("rnk", F.row_number().over(aw))
    )
    cells = ranked.filter(F.col("rnk") == 1).select("vid", F.col("cid").alias("cell"))
    probes = ranked.filter(
        (F.col("vid") < n_queries) & (F.col("rnk") <= n_probe)
    ).select(F.col("vid").alias("query_id"), F.col("cid").alias("cell"))
    cand = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("cand_id"))
        .distinct()
    )
    # --- PQ: corpus codes + per-query sub-space LUT (s08) ---
    subvecs = F.expr(
        f"transform(sequence(0, {m - 1}), i -> slice(vec, i * {sub} + 1, {sub}))"
    )
    dbx = pq_encode(embeddings, vec_col, id_col, m, k_cent, dim).select(
        F.col(id_col).alias("cand_id"),
        F.posexplode("codes").alias("sub_m", "code"),
    )
    qparts = emb.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("qid"), F.posexplode(subvecs).alias("sub_m", "qsub")
    )
    pcent = emb.filter(F.col("vid") < k_cent).select(
        F.col("vid").cast("int").alias("code"),
        F.posexplode(subvecs).alias("sub_m", "csub"),
    )
    lut = qparts.join(F.broadcast(pcent), "sub_m").select(
        "qid",
        F.col("sub_m").alias("l_sub"),
        F.col("code").alias("l_code"),
        _l2sq(F.col("qsub"), F.col("csub"), sub).alias("d"),
    )
    contrib = cand.join(dbx, "cand_id").join(
        F.broadcast(lut),
        (F.col("sub_m") == F.col("l_sub"))
        & (F.col("code") == F.col("l_code"))
        & (F.col("qid") == F.col("query_id")),
    )
    scored = contrib.groupBy("query_id", "cand_id").agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(sub_m, d))), "
            "s -> s.d), 0.0D, (acc, v) -> acc + v)"
        ).alias("adc_raw")
    )
    return (
        scored.select(
            "query_id",
            "cand_id",
            portable_round(F.col("adc_raw"), 6).alias("adc"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("cand_id"))
            ),
        )
        .filter(F.col("rank") <= k)
    )


def ivf_pq_topk_sql(
    table: str = "embeddings",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    m: int = PQ_M,
    k_cent: int = PQ_K,
) -> str:
    assign_sim = cosine_sim_sql("b.embedding", "c.c_vec")

    def l2sq(x: str, y: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(range(len({x})), i -> "
            f"({x}[i+1]::DOUBLE - {y}[i+1]::DOUBLE) * ({x}[i+1]::DOUBLE - {y}[i+1]::DOUBLE))), "
            f"(acc, v) -> acc + v)"
        )

    adc = portable_round_sql(
        "list_reduce(list_prepend(0.0::DOUBLE, list(d ORDER BY sub_m)), (acc, v) -> acc + v)",
        6,
    )
    return f"""
    WITH ccent AS (
      SELECT vec_id AS cid, embedding AS c_vec FROM {table} WHERE vec_id < {n_cells}
    ),
    ranked AS (
      SELECT b.vec_id AS vid, c.cid,
             row_number() OVER (PARTITION BY b.vec_id
                                ORDER BY {assign_sim} DESC, c.cid ASC) AS rnk
      FROM {table} b CROSS JOIN ccent c
    ),
    cells AS (SELECT vid, cid AS cell FROM ranked WHERE rnk = 1),
    probes AS (
      SELECT vid AS query_id, cid AS cell FROM ranked
      WHERE vid < {n_queries} AND rnk <= {n_probe}
    ),
    cand AS (
      SELECT DISTINCT p.query_id, a.vid AS cand_id
      FROM cells a JOIN probes p ON a.cell = p.cell
      WHERE a.vid != p.query_id
    ),
    parts AS (
      SELECT vec_id AS vid, sub_m,
             list_slice(embedding, sub_m * (len(embedding) // {m}) + 1,
                        (sub_m + 1) * (len(embedding) // {m})) AS subvec
      FROM {table}, unnest(range(0, {m})) AS u(sub_m)
    ),
    pcent AS (
      SELECT CAST(vid AS INTEGER) AS code, sub_m, subvec AS csub
      FROM parts WHERE vid < {k_cent}
    ),
    code_scored AS (
      SELECT p.vid, p.sub_m, c.code, {l2sq('p.subvec', 'c.csub')} AS d
      FROM parts p JOIN pcent c USING (sub_m)
    ),
    best AS (
      SELECT vid, sub_m, code FROM (
        SELECT *, row_number() OVER (PARTITION BY vid, sub_m
                                     ORDER BY d ASC, code ASC) AS rn
        FROM code_scored
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT q.vid AS qid, q.sub_m, c.code, {l2sq('q.subvec', 'c.csub')} AS d
      FROM parts q JOIN pcent c USING (sub_m)
      WHERE q.vid < {n_queries}
    ),
    contrib AS (
      SELECT cd.query_id, cd.cand_id, b.sub_m, l.d
      FROM cand cd
      JOIN best b ON b.vid = cd.cand_id
      JOIN lut l ON l.qid = cd.query_id AND l.sub_m = b.sub_m AND l.code = b.code
    ),
    scored AS (
      SELECT query_id, cand_id, {adc} AS adc
      FROM contrib GROUP BY query_id, cand_id
    )
    SELECT query_id, cand_id, adc, rank::BIGINT AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc ASC, cand_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Scalar quantization ANN (s13) — int8 codes + asymmetric rerank
# ---------------------------------------------------------------------------

SQ_LEVELS = 255  # 8-bit quantization levels


def sq_topk(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Scalar-quantized ANN (the SQ8 index): every dimension maps to an
    8-bit level via per-dimension corpus min/max, the corpus is scanned as
    int8 codes (dim bytes/vector — 4× smaller than float32, the RAM-bound
    regime between raw vectors and s07's 8-byte PQ), and queries score
    candidates against DEQUANTIZED codes — asymmetric: the query stays
    full-precision, only the database side is approximated.

    Exactness across engines: quantization is ``round((x - min) / (max -
    min) * 255)`` on IEEE doubles with one fixed expression order (min/max
    are exact column extrema, portable_round makes the half-way rule
    explicit), and the score fold runs in dimension order — so even the
    quantized distances value-replay in SQL.  Scale shape: the per-dim
    min/max table is one tiny aggregate broadcast back (p08's two-pass
    shape); scoring is the s01 broadcast-query join over codes."""
    from spj_query_engine_spark.operators.core import spread

    emb = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    parts = emb.select(
        "vid", F.posexplode(F.col("vec")).alias("d", "x")
    )
    stats = parts.groupBy("d").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    # quantize: level in [0, 255]; degenerate dims (hi == lo) pin to 0
    lvl = F.when(
        F.col("hi") > F.col("lo"),
        portable_round(
            (F.col("x") - F.col("lo"))
            / (F.col("hi") - F.col("lo"))
            * F.lit(float(SQ_LEVELS)),
            0,
        ),
    ).otherwise(F.lit(0.0))
    coded = parts.join(F.broadcast(stats), "d").select(
        "vid",
        "d",
        lvl.cast("int").alias("code"),
        # dequantized value — what the asymmetric distance actually uses
        (
            F.col("lo")
            + lvl * (F.col("hi") - F.col("lo")) / F.lit(float(SQ_LEVELS))
        ).alias("deq"),
    )
    q = parts.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"), F.col("d").alias("qd"), F.col("x").alias("qx")
    )
    contrib = coded.join(
        F.broadcast(q),
        (F.col("d") == F.col("qd")) & (F.col("vid") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vid").alias("cand_id"),
        "d",
        ((F.col("qx") - F.col("deq")) * (F.col("qx") - F.col("deq"))).alias("sq"),
    )
    scored = contrib.groupBy("query_id", "cand_id").agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(d, sq))), "
            "s -> s.sq), 0.0D, (acc, v) -> acc + v)"
        ).alias("dist_raw")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("cand_id"))
    return (
        scored.select(
            "query_id", "cand_id", portable_round(F.col("dist_raw"), 6).alias("dist")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sq_topk_sql(
    table: str = "embeddings",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
) -> str:
    lvl = portable_round_sql(
        f"(x - lo) / (hi - lo) * {float(SQ_LEVELS)}", 0
    )
    dist = portable_round_sql(
        "list_reduce(list_prepend(0.0::DOUBLE, list(sq ORDER BY d)), (acc, v) -> acc + v)",
        6,
    )
    return f"""
    WITH parts AS MATERIALIZED (
      SELECT vec_id AS vid, d, embedding[d + 1]::DOUBLE AS x
      FROM {table}, unnest(range(0, len(embedding))) AS u(d)
    ),
    stats AS MATERIALIZED (
      SELECT d, MIN(x) AS lo, MAX(x) AS hi FROM parts GROUP BY d
    ),
    coded AS MATERIALIZED (
      SELECT vid, parts.d,
             CASE WHEN hi > lo
                  THEN lo + {lvl} * (hi - lo) / {float(SQ_LEVELS)}
                  ELSE lo END AS deq
      FROM parts JOIN stats ON stats.d = parts.d
    ),
    q AS MATERIALIZED (
      SELECT vid AS query_id, d AS qd, x AS qx FROM parts WHERE vid < {n_queries}
    ),
    contrib AS (
      SELECT q.query_id, c.vid AS cand_id, c.d,
             (q.qx - c.deq) * (q.qx - c.deq) AS sq
      FROM coded c JOIN q ON q.qd = c.d AND c.vid != q.query_id
    ),
    scored AS (
      SELECT query_id, cand_id, {dist} AS dist
      FROM contrib GROUP BY query_id, cand_id
    )
    SELECT query_id, cand_id, dist, rank::BIGINT AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist ASC, cand_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# MMR diversified top-k (s14) — retrieval that refuses near-duplicates
# ---------------------------------------------------------------------------

MMR_POOL = 8  # relevance candidates per query entering the greedy stage
MMR_SELECT = 3  # diversified results returned per query
MMR_LAMBDA = 0.7  # relevance weight; (1 − λ) penalizes similarity to selected


def mmr_topk(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    pool: int = MMR_POOL,
    select: int = MMR_SELECT,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998) diversified
    top-k: after the exact relevance pool (s01's two-phase top-k), pick
    ``select`` results greedily, each maximizing
    ``λ·rel − (1−λ)·max_sim_to_already_selected`` — retrieval that refuses
    to return three copies of the same near-duplicate, the selection rule
    dedup-aware training-data curation uses for few-shot/RAG examples.

    Scale anatomy: the corpus is touched ONLY by the relevance pool (s01's
    partial-top-k shape); everything after is bounded by
    n_queries × pool² — the candidate-pair cosine matrix and ``select``
    unrolled greedy rounds are driver-free window/join passes over a tiny
    frame.  Greedy MMR is inherently sequential in k, so k is a constant
    (unrolled), never data-dependent — the same contract as d07's fixed
    propagation rounds.  All comparisons run on 6-dp portable-rounded
    cosines combined with one multiply-subtract, so both engines order
    candidates identically; ties break on cand_id."""
    dim = dim_of(embeddings, vec_col)
    cands = brute_force_topk(
        embeddings, vec_col, id_col, k=pool, n_queries=n_queries
    ).select("query_id", "cand_id", F.col("cosine").alias("rel"))
    vecs = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    cv = (
        cands.join(vecs, cands.cand_id == vecs.vid)
        .select("query_id", "cand_id", "rel", "v")
        .localCheckpoint(eager=True)
    )
    a, b = cv.alias("a"), cv.alias("b")
    pair_sim = portable_round(
        dot_product(F.col("a.v"), F.col("b.v"), dim)
        / (
            F.sqrt(dot_product(F.col("a.v"), F.col("a.v"), dim))
            * F.sqrt(dot_product(F.col("b.v"), F.col("b.v"), dim))
        ),
        6,
    )
    pairs = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.cand_id") != F.col("b.cand_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.cand_id").alias("ca"),
            F.col("b.cand_id").alias("cb"),
            pair_sim.alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    lam = float(MMR_LAMBDA)
    picked = []  # list of DataFrames (query_id, cand_id, score, rank)
    w = Window.partitionBy("query_id")
    # round 1: pure relevance
    r1 = (
        cv.withColumn(
            "rn", F.row_number().over(w.orderBy(F.desc("rel"), F.asc("cand_id")))
        )
        .filter(F.col("rn") == 1)
        .select(
            "query_id", "cand_id", F.col("rel").alias("score"), F.lit(1).alias("rank")
        )
    )
    picked.append(r1)
    for r in range(2, select + 1):
        sel = picked[0]
        for p in picked[1:]:
            sel = sel.unionByName(p)
        sel_ids = sel.select("query_id", F.col("cand_id").alias("sid"))
        remaining = cv.join(
            sel_ids.withColumnRenamed("sid", "cand_id"),
            ["query_id", "cand_id"],
            "left_anti",
        )
        maxsim = (
            pairs.join(
                sel_ids,
                (pairs.query_id == sel_ids.query_id) & (pairs.cb == sel_ids.sid),
            )
            .groupBy(pairs.query_id.alias("query_id"), F.col("ca").alias("cand_id"))
            .agg(F.max("sim").alias("max_sim"))
        )
        scored = remaining.join(maxsim, ["query_id", "cand_id"]).select(
            "query_id",
            "cand_id",
            (F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("max_sim")).alias(
                "score"
            ),
        )
        pick = (
            scored.withColumn(
                "rn",
                F.row_number().over(w.orderBy(F.desc("score"), F.asc("cand_id"))),
            )
            .filter(F.col("rn") == 1)
            .select("query_id", "cand_id", "score", F.lit(r).alias("rank"))
        )
        picked.append(pick.localCheckpoint(eager=True))
    out = picked[0]
    for p in picked[1:]:
        out = out.unionByName(p)
    return out.select(
        "query_id",
        "cand_id",
        portable_round(F.col("score"), 6).alias("mmr_score"),
        F.col("rank").cast("long").alias("rank"),
    )


def mmr_topk_sql(
    table: str = "embeddings",
    pool: int = MMR_POOL,
    select: int = MMR_SELECT,
    n_queries: int = N_QUERIES,
) -> str:
    lam = float(MMR_LAMBDA)
    sim = portable_round_sql(cosine_sim_sql("a.v", "b.v"), 6)
    ctes = [
        f"""pool AS MATERIALIZED (
      SELECT query_id, cand_id, cosine AS rel
      FROM ({brute_force_topk_sql(table, k=pool, n_queries=n_queries)})
    )""",
        f"""cv AS MATERIALIZED (
      SELECT p.query_id, p.cand_id, p.rel, e.embedding AS v
      FROM pool p JOIN {table} e ON e.vec_id = p.cand_id
    )""",
        f"""pairs AS MATERIALIZED (
      SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb, {sim} AS sim
      FROM cv a JOIN cv b ON a.query_id = b.query_id AND a.cand_id != b.cand_id
    )""",
        """sel1 AS MATERIALIZED (
      SELECT query_id, cand_id, rel AS score, 1 AS rank FROM (
        SELECT query_id, cand_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, cand_id ASC) AS rn
        FROM cv) WHERE rn = 1
    )""",
    ]
    prev_sel = "sel1"
    union = ["SELECT * FROM sel1"]
    for r in range(2, select + 1):
        sel_union = " UNION ALL ".join(f"SELECT * FROM sel{i}" for i in range(1, r))
        ctes.append(
            f"""sel{r} AS MATERIALIZED (
      SELECT query_id, cand_id, score, {r} AS rank FROM (
        SELECT s.query_id, s.cand_id, s.score,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY s.score DESC, s.cand_id ASC) AS rn
        FROM (
          SELECT c.query_id, c.cand_id,
                 {lam!r} * c.rel - {1.0 - lam!r} * max(p.sim) AS score
          FROM cv c
          JOIN ({sel_union}) sel ON sel.query_id = c.query_id
          JOIN pairs p ON p.query_id = c.query_id AND p.ca = c.cand_id
                       AND p.cb = sel.cand_id
          WHERE c.cand_id NOT IN (SELECT cand_id FROM ({sel_union}) s2
                                  WHERE s2.query_id = c.query_id)
          GROUP BY c.query_id, c.cand_id, c.rel
        ) s) WHERE rn = 1
    )"""
        )
        union.append(f"SELECT * FROM sel{r}")
        prev_sel = f"sel{r}"
    body = " UNION ALL ".join(union)
    score = portable_round_sql("score", 6)
    return f"""
    WITH {", ".join(ctes)}
    SELECT query_id, cand_id, {score} AS mmr_score, rank::BIGINT AS rank
    FROM ({body})
    """


# ---------------------------------------------------------------------------
# Filtered ANN (s15) — metadata predicates inside the vector index
# ---------------------------------------------------------------------------

FILTER_PROBE = 4  # filtered search probes deeper: the filter thins each cell


def filtered_ivf_topk(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = FILTER_PROBE,
) -> DataFrame:
    """FILTERED vector search: top-``k`` neighbors sharing the query's
    ``label`` — the hybrid metadata-plus-vector query every production
    vector store serves ("similar items WHERE category = X").  The filter
    applies to the CANDIDATE set between cell probe and rerank
    (pre-filtering): post-filtering an unfiltered top-k would silently
    return fewer than k (or zero) matches whenever the neighborhood is
    label-diverse — the classic filtered-ANN recall trap.  Because the
    filter thins every cell, filtered search probes deeper
    (``FILTER_PROBE`` > s03's ``N_PROBE``) for the same recall.

    Plan anatomy = s03 (broadcast centroid assignment, cell equi-join,
    bounded rerank) with one extra broadcast join carrying the label onto
    the candidate side and an equi-condition on it — the filter reaches
    the candidate generation, not the result."""
    from spj_query_engine_spark.operators.core import spread

    emb = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
        F.col(label_col).alias("lbl"),
    )
    cent = emb.filter(F.col("vid") < n_cells).select(
        F.col("vid").alias("cid"), F.col("vec").alias("c_vec")
    )
    pair_sim = cosine_sim(F.col("vec"), F.col("c_vec"))
    aw = Window.partitionBy("vid").orderBy(F.desc("sim"), F.asc("cid"))
    ranked = (
        emb.crossJoin(F.broadcast(cent))
        .select("vid", "lbl", "cid", pair_sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(aw))
    )
    cells = ranked.filter(F.col("rnk") == 1).select(
        "vid", F.col("lbl").alias("c_lbl"), F.col("cid").alias("cell")
    )
    probes = ranked.filter(
        (F.col("vid") < n_queries) & (F.col("rnk") <= n_probe)
    ).select(
        F.col("vid").alias("query_id"), F.col("lbl").alias("q_lbl"),
        F.col("cid").alias("cell"),
    )
    cand = (
        cells.join(F.broadcast(probes), "cell")
        .filter(
            (F.col("vid") != F.col("query_id"))
            & (F.col("c_lbl") == F.col("q_lbl"))  # the metadata pre-filter
        )
        .select("query_id", F.col("vid").alias("cand_id"))
        .distinct()
    )
    q = emb.select(F.col("vid").alias("query_id"), F.col("vec").alias("q_vec"))
    c = emb.select(F.col("vid").alias("cand_id"), F.col("vec").alias("c_vec2"))
    sim = portable_round(cosine_sim(F.col("q_vec"), F.col("c_vec2")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "cand_id")
        .select("query_id", "cand_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def filtered_ivf_topk_sql(
    table: str = "embeddings",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_cells: int = N_CELLS,
    n_probe: int = FILTER_PROBE,
) -> str:
    assign_sim = cosine_sim_sql("b.embedding", "c.c_vec")
    sim = portable_round_sql(cosine_sim_sql("q.embedding", "cv.embedding"), 6)
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS c_vec FROM {table} WHERE vec_id < {n_cells}
    ),
    ranked AS (
      SELECT b.vec_id AS vid, b.label AS lbl, c.cid,
             row_number() OVER (PARTITION BY b.vec_id
                                ORDER BY {assign_sim} DESC, c.cid ASC) AS rnk
      FROM {table} b CROSS JOIN cent c
    ),
    cells AS (SELECT vid, lbl AS c_lbl, cid AS cell FROM ranked WHERE rnk = 1),
    probes AS (
      SELECT vid AS query_id, lbl AS q_lbl, cid AS cell FROM ranked
      WHERE vid < {n_queries} AND rnk <= {n_probe}
    ),
    cand AS (
      SELECT DISTINCT p.query_id, a.vid AS cand_id
      FROM cells a JOIN probes p ON a.cell = p.cell
      WHERE a.vid != p.query_id AND a.c_lbl = p.q_lbl
    ),
    scored AS (
      SELECT cand.query_id, cand.cand_id, {sim} AS cosine
      FROM cand
      JOIN {table} q ON q.vec_id = cand.query_id
      JOIN {table} cv ON cv.vec_id = cand.cand_id
    )
    SELECT query_id, cand_id, cosine, rank::BIGINT AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (s16) — ensemble retrieval over two indexes
# ---------------------------------------------------------------------------

RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)
RRF_POOL = 10  # depth taken from each source ranking
RRF_TOP = 5  # fused results per query
RRF_SCALE = 1_000_000_000  # integer scale: score = Σ SCALE div (K + rank)


def rrf_fusion(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """Reciprocal-Rank Fusion (Cormack, Clarke & Buettcher 2009) of two
    retrieval rankings — the exact top-``RRF_POOL`` (s01) and the LSH
    index's top-``RRF_POOL`` (s02) — into one list per query:
    ``score(d) = Σ_sources SCALE div (K + rank_source(d))`` summed over
    the sources that returned ``d``.  RRF is THE hybrid-search combiner
    (vector + keyword, or several indexes) because it needs only ranks,
    never incomparable scores; here it ensembles two indexes of the same
    corpus, which also quantifies how much the sketch index disagrees
    with ground truth (s11 measures that disagreement; this REPAIRS it).

    Every term is an exact BIGINT (integer div), so the fused ranking
    value-replays in SQL.  Cost: both source rankings are already bounded
    pipelines; fusion is a full-outer join of two (queries × pool)-row
    frames + one window.

    Execution shape (r10, guide §2.6): ``lsh_topk`` materializes its
    bucket frame EAGERLY (barrier) during plan construction, which used to
    serialize the whole corpus×queries brute-force leg strictly after the
    bucket job.  The two legs are independent — materialize the exact
    ranking (queries × pool rows, bounded at any scale) on a driver thread
    concurrently with the bucket barrier, so the wall is max(leg) + fusion
    instead of the sum."""
    from concurrent.futures import ThreadPoolExecutor

    from spj_query_engine_spark.operators.core import barrier

    def exact_leg() -> DataFrame:
        return barrier(
            brute_force_topk(
                embeddings, vec_col, id_col, k=RRF_POOL, n_queries=n_queries
            ).select("query_id", "cand_id", F.col("rank").alias("r1"))
        )

    def approx_leg() -> DataFrame:
        return lsh_topk(
            embeddings, vec_col, id_col, k=RRF_POOL, n_queries=n_queries
        ).select("query_id", "cand_id", F.col("rank").alias("r2"))

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_exact = pool.submit(exact_leg)
        f_approx = pool.submit(approx_leg)
        exact, approx = f_exact.result(), f_approx.result()
    fused = exact.join(approx, ["query_id", "cand_id"], "full_outer")
    contrib1 = F.when(
        F.col("r1").isNotNull(), F.expr(f"{RRF_SCALE} div ({RRF_K} + r1)")
    ).otherwise(F.lit(0))
    contrib2 = F.when(
        F.col("r2").isNotNull(), F.expr(f"{RRF_SCALE} div ({RRF_K} + r2)")
    ).otherwise(F.lit(0))
    scored = fused.select(
        "query_id", "cand_id", (contrib1 + contrib2).cast("long").alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RRF_TOP)
        .select("query_id", "cand_id", "rrf_score", F.col("rank").cast("long").alias("rank"))
    )


def rrf_fusion_sql(table: str = "embeddings", n_queries: int = N_QUERIES) -> str:
    return f"""
    WITH exact_r AS MATERIALIZED (
      SELECT query_id, cand_id, rank AS r1
      FROM ({brute_force_topk_sql(table, k=RRF_POOL, n_queries=n_queries)})
    ),
    approx_r AS MATERIALIZED (
      SELECT query_id, cand_id, rank AS r2
      FROM ({lsh_topk_sql(table, k=RRF_POOL, n_queries=n_queries)})
    ),
    fused AS (
      SELECT coalesce(e.query_id, a.query_id) AS query_id,
             coalesce(e.cand_id, a.cand_id) AS cand_id,
             CAST(coalesce({RRF_SCALE} // ({RRF_K} + e.r1), 0)
                  + coalesce({RRF_SCALE} // ({RRF_K} + a.r2), 0) AS BIGINT)
               AS rrf_score
      FROM exact_r e FULL OUTER JOIN approx_r a
        ON a.query_id = e.query_id AND a.cand_id = e.cand_id
    )
    SELECT query_id, cand_id, rrf_score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, cand_id ASC) AS rank
      FROM fused
    ) WHERE rank <= {RRF_TOP}
    """


# ---------------------------------------------------------------------------
# NN-descent refinement (s17) — one neighbor-of-neighbor round over s06
# ---------------------------------------------------------------------------


def nn_descent_round(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = KNN_K,
    n_cells: int | None = None,
    seed_graph: DataFrame | None = None,
) -> DataFrame:
    """One NN-DESCENT round (Dong et al., WWW'11) over the s06 kNN graph:
    candidates are the current graph's neighbors-of-neighbors — taken over
    the UNDIRECTED graph (neighbors ∪ reverse neighbors), the paper's key
    move — exact-reranked against the existing edges to produce a strictly
    better top-k.  This is how production kNN graphs are built when the
    IVF seed graph is too coarse: each round costs O(n·(2k)²) scored pairs
    regardless of corpus size, and recall climbs toward exact without any
    all-pairs stage.  Monotone by construction: the old edges are in the
    candidate set, so the new kth cosine can never be worse.

    Scale shape: the graph is 2·n·k narrow rows; the expansion is ONE
    self-equi-join on the middle vertex (bounded by degree, never the
    corpus), rerank joins ship (id, vec) pairs exactly like s06, and the
    per-vertex top-k window sees ≤ (2k)² + k candidates.  Further rounds
    iterate the same plan with a localCheckpoint barrier per round.
    The seed graph inherits s06's deployment knob: ``n_cells`` (or conf
    ``spj.knn.cells``) must grow with the corpus so cell size stays
    constant — the descent itself is O(n·(2k)²) either way, but a
    fixed-cell seed graph pays quadratic within-cell rerank.  Past ~10×,
    even corpus-scaled FLAT assignment is O(n²/cell_size) (n × n_cells
    broadcast cosines — measured 266× wall at 100× input): pass
    ``seed_graph=knn_join_2level(...)`` there, whose tree assignment is
    O(n·(branch + leaves/branch)) — measured 25× wall at 100× input,
    linear in pairs."""
    base = (
        seed_graph
        if seed_graph is not None
        else knn_join(embeddings, vec_col, id_col, k=k, n_cells=n_cells)
    )
    fwd = base.select(F.col(id_col).alias("a"), F.col("nbr_id").alias("b"))
    fwd = fwd.localCheckpoint(eager=True)  # base feeds two branches below
    und = fwd.unionByName(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # r09 (§2.4): one exchange serves both the dedup and the final top-k
    # window — repartition by qid, then dropDuplicates((qid, mid)): hash
    # partitioning on qid satisfies the aggregate's (qid, mid) clustering
    # AND the window's qid clustering, so .distinct()'s (qid, mid) exchange
    # and the window's qid exchange collapse into this single one (the
    # vector-attach joins broadcast at gate scale and keep partitioning).
    cand = (
        und.alias("x")
        .join(und.alias("y"), F.col("x.b") == F.col("y.a"))
        .select(F.col("x.a").alias("qid"), F.col("y.b").alias("mid"))
        .filter(F.col("qid") != F.col("mid"))
        .unionByName(fwd.select(F.col("a").alias("qid"), F.col("b").alias("mid")))
        .repartition("qid")
        .dropDuplicates(["qid", "mid"])
    )
    from spj_query_engine_spark.operators.core import spread

    emb = spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    # norms once per vector, not twice per candidate pair (bit-identical)
    emb_n = emb.withColumn(
        "nrm", F.sqrt(dot_product(F.col("vec"), F.col("vec")))
    )
    q = emb_n.select(
        F.col("vid").alias("qid"),
        F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    m = emb_n.select(
        F.col("vid").alias("mid"),
        F.col("vec").alias("m_vec"),
        F.col("nrm").alias("m_nrm"),
    )
    sim = portable_round(
        dot_product(F.col("q_vec"), F.col("m_vec"))
        / (F.col("q_nrm") * F.col("m_nrm")),
        6,
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        cand.join(q, "qid")
        .join(m, "mid")
        .select(
            F.col("qid").alias(id_col),
            F.col("mid").alias("nbr_id"),
            sim.alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def nn_descent_round_sql(table: str = "embeddings", k: int = KNN_K) -> str:
    sim = portable_round_sql(cosine_sim_sql("q.embedding", "m.embedding"), 6)
    return f"""
    WITH base AS MATERIALIZED ({knn_join_sql(table, k=k)}),
    fwd AS (SELECT vec_id AS a, nbr_id AS b FROM base),
    und AS MATERIALIZED (
      SELECT a, b FROM fwd UNION ALL SELECT b AS a, a AS b FROM fwd
    ),
    cand AS (
      SELECT x.a AS qid, y.b AS mid
      FROM und x JOIN und y ON y.a = x.b
      WHERE x.a != y.b
      UNION
      SELECT a AS qid, b AS mid FROM fwd
    ),
    scored AS (
      SELECT cand.qid AS vec_id, cand.mid AS nbr_id, {sim} AS cosine
      FROM cand
      JOIN {table} q ON q.vec_id = cand.qid
      JOIN {table} m ON m.vec_id = cand.mid
    )
    SELECT vec_id, nbr_id, cosine, rank::BIGINT AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cosine DESC, nbr_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Multiprobe LSH (s18) — flip-one-bit probes buy recall without more tables
# ---------------------------------------------------------------------------


def multiprobe_lsh_topk(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """MULTIPROBE LSH (Lv et al., VLDB'07): each query probes its exact
    band chunk PLUS every one-bit flip of it — the buckets a borderline
    plane dot would have landed in — so recall rises like adding hash
    tables without storing any (the corpus stays indexed ONCE, in s02's
    exact chunks; only the tiny query side fans out ×(1+band_width)).
    The candidate set strictly contains s02's (probe 0 is the exact
    chunk), so recall can only improve; same exact-cosine rerank.

    Scale shape: identical to s02 — the corpus is a projection + equi-join
    on a few-bit key; the probe fan-out multiplies only n_queries rows.
    At 100 TB multiprobe is THE lever when memory caps the table count."""
    from spj_query_engine_spark.operators.core import barrier

    # r09 (§2.4): the bucket frame feeds the corpus chunks and the probe
    # chunks — materialize the explode+13-aggregate derivation once instead
    # of once per consumer.  (An ids-only candidate dedup with the vectors
    # attached after the distinct — s02's treatment — was ALSO tried and
    # measured 1.16x SLOWER in an interleaved same-session A/B at sf0.1
    # (med 1.94 vs 1.67 s): s18's candidate volume is bounded by the fixed
    # query count times probed-bucket size, so the narrow distinct saves
    # little here while the two extra attach joins add stages.  The wide
    # distinct therefore stays.)
    with_bucket = barrier(_sign_buckets(embeddings, vec_col, id_col))
    mask = (1 << _BAND_WIDTH) - 1
    chunk_of = lambda b: (  # noqa: E731
        F.shiftright(F.col("bucket"), b * _BAND_WIDTH).bitwiseAND(F.lit(mask))
    )
    corpus = with_bucket.select(
        F.col("vid").alias("cand_id"),
        F.col("vec").alias("c_vec"),
        F.col("norm").alias("c_norm"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), chunk_of(b).alias("chunk"))
                    for b in range(SIGN_BANDS)
                ]
            )
        ).alias("bc"),
    ).select("cand_id", "c_vec", "c_norm", "bc.band", "bc.chunk")
    probes = with_bucket.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("q_vec"),
        F.col("norm").alias("q_norm"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            chunk_of(b)
                            if i < 0
                            else chunk_of(b).bitwiseXOR(F.lit(1 << i))
                        ).alias("chunk"),
                    )
                    for b in range(SIGN_BANDS)
                    for i in range(-1, _BAND_WIDTH)
                ]
            )
        ).alias("bc"),
    ).select("query_id", "q_vec", "q_norm", "bc.band", "bc.chunk")
    cand = (
        corpus.join(F.broadcast(probes), ["band", "chunk"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "q_vec", "q_norm", "cand_id", "c_vec", "c_norm")
        .distinct()
    )
    sim = portable_round(
        dot_product(F.col("q_vec"), F.col("c_vec"))
        / (F.col("q_norm") * F.col("c_norm")),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        cand.select("query_id", "cand_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def multiprobe_lsh_topk_sql(
    table: str = "embeddings", k: int = TOP_K, n_queries: int = N_QUERIES
) -> str:
    bucket = sign_bucket_sql("embedding")
    mask = (1 << _BAND_WIDTH) - 1
    corpus_selects = " UNION ALL ".join(
        f"SELECT vid, vec, {b} AS band, (bucket >> {b * _BAND_WIDTH}) & {mask}"
        " AS chunk FROM bucketed"
        for b in range(SIGN_BANDS)
    )
    probe_selects = " UNION ALL ".join(
        f"SELECT vid, vec, {b} AS band, "
        + (
            f"(bucket >> {b * _BAND_WIDTH}) & {mask}"
            if i < 0
            else f"xor((bucket >> {b * _BAND_WIDTH}) & {mask}, {1 << i})"
        )
        + f" AS chunk FROM bucketed WHERE vid < {n_queries}"
        for b in range(SIGN_BANDS)
        for i in range(-1, _BAND_WIDTH)
    )
    sim = portable_round_sql(cosine_sim_sql("q_vec", "c_vec"), 6)
    return f"""
    WITH bucketed AS (
      SELECT vec_id AS vid, embedding AS vec, {bucket} AS bucket FROM {table}
    ),
    chunks AS ({corpus_selects}),
    probes AS ({probe_selects}),
    cand AS (
      SELECT DISTINCT q.vid AS query_id, q.vec AS q_vec, c.vid AS cand_id,
             c.vec AS c_vec
      FROM chunks c JOIN probes q ON c.band = q.band AND c.chunk = q.chunk
      WHERE c.vid != q.vid
    ),
    ranked AS (
      SELECT query_id, cand_id, {sim} AS cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY {sim} DESC, cand_id ASC) AS rank
      FROM cand
    )
    SELECT query_id, cand_id, cosine, rank::BIGINT AS rank
    FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Pairwise-similarity histogram over hash-sampled pairs (s19) and the
# IVF cell-occupancy census (s20)

HIST_BLOCKS = 32  # s19: hash-block count floor; sampled pairs ~ n^2 / blocks
HIST_BLOCK_TARGET = 160  # auto-scale target: vectors per sample block
HIST_BINS_LO = -10  # cosine decile bins [-1.0, 1.0)


def sim_histogram(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int | None = None,
) -> DataFrame:
    """Cosine-similarity DISTRIBUTION estimate from hash-sampled pairs:
    vectors land in ``n_blocks`` pseudo-random blocks (portable h32 of the
    id), all within-block pairs are scored exactly, and the histogram
    buckets cosines into deciles.  This is the threshold-picking
    measurement behind d06/d14's near-dup cut and s10's range radius: the
    curve shows where the dup mode separates from the background mode.

    Sampling is the SCALE lever: within-block pairing scores ~n²/B pairs,
    and B is CORPUS-DERIVED as max(floor, ceil(n/target)) — B ∝ n holds
    the sample at O(n) pairs while staying a pure equi-join on the block
    key (uniform by construction - h32 is key-uniform, so block sizes
    concentrate at n/B and no block quadratically dominates).
    Pair-identical in SQL: the oracle replays h32, the same corpus-derived
    block count, the same fold-order cosine."""
    if n_blocks is None:
        # footer-exact row count attached by catalog.load_table (parquet
        # metadata, same value a count() job returns) — skips one Spark job;
        # any transformation between load and here drops the attribute and
        # the count() fallback runs (same pattern as resolve_quantizer_cells)
        n = getattr(embeddings, "_spj_rowcount", None)
        if n is None:
            n = embeddings.count()
        n_blocks = max(HIST_BLOCKS, math.ceil(n / HIST_BLOCK_TARGET))
    emb = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        (h32(F.col(id_col).cast("string")) % n_blocks).alias("blk"),
    )
    a = emb.select("blk", F.col("vid").alias("id_a"), F.col("vec").alias("vec_a"))
    b = emb.select("blk", F.col("vid").alias("id_b"), F.col("vec").alias("vec_b"))
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    cos = cosine_sim(F.col("vec_a"), F.col("vec_b"))
    binned = pairs.select(
        F.greatest(
            F.lit(HIST_BINS_LO),
            F.least(F.lit(-HIST_BINS_LO - 1), F.floor(cos * 10).cast("int")),
        ).alias("bin")
    )
    counts = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n_pairs"))
    total = counts.agg(F.sum("n_pairs").alias("total_pairs")).filter(
        F.coalesce(F.col("total_pairs"), F.lit(0)) > 0
    )
    return counts.crossJoin(F.broadcast(total)).select(
        F.col("bin").cast("long").alias("bin"),
        "n_pairs",
        F.expr("(n_pairs * 1000000) div total_pairs").alias("share_ppm"),
    )


def sim_histogram_sql(
    table: str = "embeddings", n_blocks: int | str | None = None
) -> str:
    if n_blocks is None:
        n_blocks = (
            f"(SELECT GREATEST({HIST_BLOCKS}, "
            f"CAST(CEIL(count(*) / {HIST_BLOCK_TARGET}.0) AS BIGINT)) "
            f"FROM {table})"
        )
    blk = f"({h32_sql('CAST(vec_id AS VARCHAR)')} % {n_blocks})"
    cos = cosine_sim_sql("vec_a", "vec_b")
    return f"""
    WITH emb AS (
      SELECT vec_id AS vid, embedding, {blk} AS blk FROM {table}
    ),
    pairs AS (
      SELECT a.vid AS id_a, b.vid AS id_b, a.vec_a, b.vec_b
      FROM (SELECT blk, vid, embedding AS vec_a FROM emb) a
      JOIN (SELECT blk, vid, embedding AS vec_b FROM emb) b USING (blk)
      WHERE a.vid < b.vid
    ),
    binned AS (
      SELECT greatest({HIST_BINS_LO},
                      least({-HIST_BINS_LO - 1},
                            CAST(floor({cos} * 10) AS INTEGER))) AS bin
      FROM pairs
    ),
    counts AS (SELECT bin, count(*) AS n_pairs FROM binned GROUP BY bin),
    total AS (
      SELECT CAST(sum(n_pairs) AS BIGINT) AS total_pairs FROM counts
      HAVING sum(n_pairs) > 0
    )
    SELECT bin::BIGINT AS bin, n_pairs,
           (n_pairs * 1000000) // total_pairs AS share_ppm
    FROM counts, total
    """


def ivf_cell_census(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = N_CELLS,
) -> DataFrame:
    """IVF cell-occupancy census: how many vectors each coarse-quantizer
    cell holds, its ppm share, and its rank by size - the OPERATIONAL
    audit behind s03/s04/s12: probe cost and straggler risk are both set
    by the largest cells (a cell holding 30% of the corpus means every
    probe touching it reranks 30% of the data), and a skewed census is
    the signal to retrain or split cells.  Uses s03's deterministic
    seeded centroids so the oracle replays assignment exactly.

    Assignment is the same broadcast map-only pass as s03 (corpus never
    shuffles on anything but the final 16-key rollup); the census output
    is O(n_cells) rows."""
    emb = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    cent = emb.filter(F.col("vid") < n_cells).select(
        F.col("vid").alias("cid"), F.col("vec").alias("c_vec")
    )
    aw = Window.partitionBy("vid").orderBy(F.desc("sim"), F.asc("cid"))
    cells = (
        emb.crossJoin(F.broadcast(cent))
        .select("vid", "cid", cosine_sim(F.col("vec"), F.col("c_vec")).alias("sim"))
        .withColumn("rnk", F.row_number().over(aw))
        .filter(F.col("rnk") == 1)
        .select("vid", F.col("cid").alias("cell"))
    )
    counts = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    total = counts.agg(F.sum("n_vecs").alias("total_vecs")).filter(
        F.coalesce(F.col("total_vecs"), F.lit(0)) > 0
    )
    size_rank = Window.orderBy(F.desc("n_vecs"), F.asc("cell"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("cell").cast("long").alias("cell"),
            "n_vecs",
            F.expr("(n_vecs * 1000000) div total_vecs").alias("share_ppm"),
        )
        .withColumn("size_rank", F.row_number().over(size_rank).cast("long"))
    )


def ivf_cell_census_sql(table: str = "embeddings", n_cells: int = N_CELLS) -> str:
    assign_sim = cosine_sim_sql("b.embedding", "c.c_vec")
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS c_vec FROM {table} WHERE vec_id < {n_cells}
    ),
    ranked AS (
      SELECT b.vec_id AS vid, c.cid,
             row_number() OVER (PARTITION BY b.vec_id
                                ORDER BY {assign_sim} DESC, c.cid ASC) AS rnk
      FROM {table} b CROSS JOIN cent c
    ),
    counts AS (
      SELECT cid AS cell, count(*) AS n_vecs FROM ranked WHERE rnk = 1 GROUP BY cid
    ),
    total AS (
      SELECT CAST(sum(n_vecs) AS BIGINT) AS total_vecs FROM counts
      HAVING sum(n_vecs) > 0
    )
    SELECT cell::BIGINT AS cell, n_vecs,
           (n_vecs * 1000000) // total_vecs AS share_ppm,
           row_number() OVER (ORDER BY n_vecs DESC, cell ASC)::BIGINT AS size_rank
    FROM counts, total
    """


# ---------------------------------------------------------------------------
# IVF probe-count sweep (s21)

PROBE_SWEEP = (1, 2, 4)


def ivf_probe_sweep(
    embeddings: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """Recall@k of the IVF index (s03) for every probe count in
    ``PROBE_SWEEP`` - the latency/recall TUNING CURVE behind the one knob
    an IVF deployment exposes (s11 grades the LSH index at its fixed
    config; this sweeps nprobe so the operator answers "how many cells
    must I probe for 95%?").  Mean recall is an exact rational (total
    hits x 1e6 div (queries x k) - no float averaging).

    Scale: each sweep point re-derives candidates from the SAME
    assignment anatomy (broadcast centroid pass, cell equi-join); the
    exact side runs once.  All result sets are n_queries x k rows, so
    every comparison join is broadcast-size regardless of corpus."""
    exact = brute_force_topk(embeddings, k=k, n_queries=n_queries).select(
        "query_id", "cand_id"
    )
    # r09 (§2.4): the sweep points differ ONLY in how many of the query's
    # ranked probe cells they admit, and the top-p probe lists are prefixes
    # of the top-max(PROBE_SWEEP) list (same window, same tiebreak) — so
    # derive the assignment ONCE at the maximum probe count, score the
    # maximal candidate set ONCE, and slice each sweep point as a filter on
    # the candidate's probe rank.  Was: |PROBE_SWEEP| full ivf_topk
    # pipelines (each internally deriving its assignment window twice).
    # Value-identical: each candidate's home cell is unique and a query
    # probes each cell once, so (query_id, cand_id) pairs are distinct by
    # construction with a single well-defined probe rank, and the per-point
    # top-k window is the same expression over the same admitted set.
    from spj_query_engine_spark.operators.core import barrier, spread

    max_p = max(PROBE_SWEEP)
    emb = spread(embeddings, "vec_id").select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("vec")
    )
    cent = emb.filter(F.col("vid") < N_CELLS).select(
        F.col("vid").alias("cid"), F.col("vec").alias("c_vec")
    )
    aw = Window.partitionBy("vid").orderBy(F.desc("sim"), F.asc("cid"))
    assign = barrier(
        emb.crossJoin(F.broadcast(cent))
        .select("vid", "cid", cosine_sim(F.col("vec"), F.col("c_vec")).alias("sim"))
        .withColumn("rnk", F.row_number().over(aw))
        .filter(
            (F.col("rnk") == 1)
            | ((F.col("vid") < n_queries) & (F.col("rnk") <= max_p))
        )
        .select("vid", "cid", "rnk")
    )
    cells = assign.filter(F.col("rnk") == 1).select(
        "vid", F.col("cid").alias("cell")
    )
    probes = assign.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("query_id"),
        F.col("cid").alias("cell"),
        F.col("rnk").alias("prnk"),
    )
    cand = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select("query_id", F.col("vid").alias("cand_id"), "prnk")
    )
    qv = emb.select(F.col("vid").alias("query_id"), F.col("vec").alias("q_vec"))
    cv = emb.select(F.col("vid").alias("cand_id"), F.col("vec").alias("cv_vec"))
    pair_cos = portable_round(
        cosine_sim(F.col("q_vec"), F.col("cv_vec")), 6
    )
    scored = barrier(
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select("query_id", "cand_id", "prnk", pair_cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    parts = []
    for p in PROBE_SWEEP:
        parts.append(
            scored.filter(F.col("prnk") <= p)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.lit(p).alias("n_probe"), "query_id", "cand_id")
        )
    approx_all = parts[0]
    for part in parts[1:]:
        approx_all = approx_all.unionByName(part)
    hits = exact.join(approx_all, ["query_id", "cand_id"]).groupBy("n_probe").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    denom = exact.agg(F.count(F.lit(1)).alias("n_exact")).filter(
        F.col("n_exact") > 0
    )
    sweep = embeddings.sparkSession.createDataFrame(
        [(p,) for p in PROBE_SWEEP], "n_probe int"
    )
    return (
        sweep.join(hits, "n_probe", "left")
        .crossJoin(F.broadcast(denom))
        .select(
            F.col("n_probe").cast("long").alias("n_probe"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.expr("(coalesce(n_hits, 0) * 1000000) div n_exact").alias("recall_ppm"),
        )
    )


def ivf_probe_sweep_sql(
    table: str = "embeddings", k: int = TOP_K, n_queries: int = N_QUERIES
) -> str:
    approx_parts = " UNION ALL ".join(
        f"SELECT {p} AS n_probe, query_id, cand_id FROM "
        f"({ivf_topk_sql(table, k, n_queries, n_probe=p)})"
        for p in PROBE_SWEEP
    )
    sweep = ", ".join(f"({p})" for p in PROBE_SWEEP)
    return f"""
    WITH exact AS MATERIALIZED (
      SELECT query_id, cand_id FROM ({brute_force_topk_sql(table, k, n_queries)})
    ),
    approx AS ({approx_parts}),
    hits AS (
      SELECT a.n_probe, count(*) AS n_hits
      FROM exact e JOIN approx a USING (query_id, cand_id)
      GROUP BY a.n_probe
    ),
    denom AS (
      SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact
      HAVING count(*) > 0
    )
    SELECT s.p::BIGINT AS n_probe,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           d.n_exact,
           (COALESCE(h.n_hits, 0) * 1000000) // d.n_exact AS recall_ppm
    FROM (VALUES {sweep}) AS s(p)
    LEFT JOIN hits h ON h.n_probe = s.p
    CROSS JOIN denom d
    """


# ---------------------------------------------------------------------------
# Embedding-distribution drift monitor (s22)


def embedding_drift(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = N_CELLS,
) -> DataFrame:
    """Embedding-distribution drift: the corpus split into two cohorts
    (deterministic id parity - in production, the previous snapshot vs
    the new batch), each assigned to the SAME fixed coarse-quantizer
    cells, compared cell-by-cell in occupancy ppm - the drift monitor
    that tells an ANN deployment its index geometry went stale (cell
    shares moved => the quantizer no longer fits; s20 shows one
    snapshot's skew, this shows the MOVEMENT).  The per-cell
    |delta| column sums to twice the total-variation distance.

    Same broadcast map-only assignment as s03 (shared across BOTH
    cohorts in one pass - cohort is just a grouping column), one
    O(cells) rollup; exact integers to the final ppm floors."""
    emb = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        (F.col(id_col) % 2).alias("cohort"),
    )
    cent = emb.filter(F.col("vid") < n_cells).select(
        F.col("vid").alias("cid"), F.col("vec").alias("c_vec")
    )
    aw = Window.partitionBy("vid").orderBy(F.desc("sim"), F.asc("cid"))
    cells = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vid", "cohort", "cid",
            cosine_sim(F.col("vec"), F.col("c_vec")).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(aw))
        .filter(F.col("rnk") == 1)
        .select("vid", "cohort", F.col("cid").alias("cell"))
    )
    grid = cells.groupBy("cell").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).alias("n_b"),
    )
    totals = grid.agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    ).filter((F.col("tot_a") > 0) & (F.col("tot_b") > 0))
    return grid.crossJoin(F.broadcast(totals)).select(
        F.col("cell").cast("long").alias("cell"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.expr("(n_a * 1000000) div tot_a").alias("share_a_ppm"),
        F.expr("(n_b * 1000000) div tot_b").alias("share_b_ppm"),
        F.expr(
            "abs((n_a * 1000000) div tot_a - (n_b * 1000000) div tot_b)"
        ).alias("abs_delta_ppm"),
    )


def embedding_drift_sql(table: str = "embeddings", n_cells: int = N_CELLS) -> str:
    assign_sim = cosine_sim_sql("b.embedding", "c.c_vec")
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS c_vec FROM {table} WHERE vec_id < {n_cells}
    ),
    ranked AS (
      SELECT b.vec_id AS vid, b.vec_id % 2 AS cohort, c.cid,
             row_number() OVER (PARTITION BY b.vec_id
                                ORDER BY {assign_sim} DESC, c.cid ASC) AS rnk
      FROM {table} b CROSS JOIN cent c
    ),
    cells AS (SELECT vid, cohort, cid AS cell FROM ranked WHERE rnk = 1),
    grid AS (
      SELECT cell,
             CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM cells GROUP BY cell
    ),
    totals AS (
      SELECT CAST(sum(n_a) AS BIGINT) AS tot_a, CAST(sum(n_b) AS BIGINT) AS tot_b
      FROM grid
      HAVING sum(n_a) > 0 AND sum(n_b) > 0
    )
    SELECT cell::BIGINT AS cell, n_a, n_b,
           (n_a * 1000000) // tot_a AS share_a_ppm,
           (n_b * 1000000) // tot_b AS share_b_ppm,
           abs((n_a * 1000000) // tot_a - (n_b * 1000000) // tot_b)
             AS abs_delta_ppm
    FROM grid, totals
    """


# ---------------------------------------------------------------------------
# Scalar-quantization error audit (s23)


def sq_error_audit(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-DIMENSION scalar-quantization error audit for the s13 SQ8
    index: each dimension's min/max (the codebook), the mean and max
    absolute reconstruction error after round-trip quantization, and the
    theoretical step size - the measurement that says which dimensions
    the 8-bit codebook serves badly (heavy-tailed dims blow the error
    budget; the fix is per-dim clipping or more bits, and this table
    points at exactly which dims).  Mean error ~ step/4 for uniform data;
    a dim whose mean error is far above its step/4 is non-uniform.

    Same two-pass anatomy as s13 (tiny per-dim stats aggregate broadcast
    back, quantization a pure projection); the error sums ride
    DECIMAL(28,12) so accumulation order cannot drift the mean, and the
    audit output is O(dim) rows."""
    parts = embeddings.select(
        F.col(id_col).alias("vid"), F.posexplode(F.col(vec_col)).alias("d", "x")
    ).select("vid", "d", F.col("x").cast("double").alias("x"))
    stats = parts.groupBy("d").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    lvl = F.when(
        F.col("hi") > F.col("lo"),
        portable_round(
            (F.col("x") - F.col("lo"))
            / (F.col("hi") - F.col("lo"))
            * F.lit(float(SQ_LEVELS)),
            0,
        ),
    ).otherwise(F.lit(0.0))
    deq = F.when(
        F.col("hi") > F.col("lo"),
        F.col("lo") + lvl * (F.col("hi") - F.col("lo")) / F.lit(float(SQ_LEVELS)),
    ).otherwise(F.col("lo"))
    err = F.abs(F.col("x") - deq)
    audit = parts.join(F.broadcast(stats), "d").groupBy("d").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.min("lo").alias("lo"),
        F.min("hi").alias("hi"),
        F.sum(err.cast("decimal(28,12)")).cast("double").alias("_err_sum"),
        F.max(err).alias("max_abs_err"),
    )
    return audit.select(
        F.col("d").cast("long").alias("d"),
        "n_values",
        portable_round(F.col("lo"), 6).alias("lo"),
        portable_round(F.col("hi"), 6).alias("hi"),
        portable_round(
            (F.col("hi") - F.col("lo")) / F.lit(float(SQ_LEVELS)), 6
        ).alias("step"),
        portable_round(
            F.col("_err_sum") / F.col("n_values").cast("double"), 6
        ).alias("mean_abs_err"),
        portable_round(F.col("max_abs_err"), 6).alias("max_abs_err"),
    )


def sq_error_audit_sql(table: str = "embeddings") -> str:
    lvl = portable_round_sql(f"(x - lo) / (hi - lo) * {float(SQ_LEVELS)}", 0)
    deq = f"CASE WHEN hi > lo THEN lo + {lvl} * (hi - lo) / {float(SQ_LEVELS)} ELSE lo END"
    return f"""
    WITH parts AS (
      SELECT vec_id AS vid, u.i AS d, embedding[u.i + 1]::DOUBLE AS x
      FROM {table}, unnest(range(0, len(embedding))) AS u(i)
    ),
    stats AS (SELECT d, min(x) AS lo, max(x) AS hi FROM parts GROUP BY d),
    joined AS (
      SELECT p.vid, p.d, p.x, s.lo, s.hi, abs(p.x - ({deq})) AS err
      FROM parts p JOIN stats s USING (d)
    ),
    audit AS (
      SELECT d, count(*) AS n_values, min(lo) AS lo, min(hi) AS hi,
             CAST(sum(CAST(err AS DECIMAL(28,12))) AS DOUBLE) AS err_sum,
             max(err) AS max_abs_err
      FROM joined GROUP BY d
    )
    SELECT d::BIGINT AS d, n_values,
           {portable_round_sql("lo", 6)} AS lo,
           {portable_round_sql("hi", 6)} AS hi,
           {portable_round_sql(f"(hi - lo) / {float(SQ_LEVELS)}", 6)} AS step,
           {portable_round_sql("err_sum / n_values::DOUBLE", 6)} AS mean_abs_err,
           {portable_round_sql("max_abs_err", 6)} AS max_abs_err
    FROM audit
    """


# ---------------------------------------------------------------------------
# IVF cell label-purity (s24)


def cell_purity(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    n_cells: int = N_CELLS,
) -> DataFrame:
    """Quantizer-quality audit against ground-truth labels: per IVF cell,
    the majority label, its purity (ppm of the cell) and the label
    entropy proxy (distinct labels present) - the external-validity
    check completing the quantizer trilogy (s20 occupancy skew, s22
    drift, this semantic coherence): low purity says the cells cut
    across semantic clusters, so probing by cell retrieves mixed
    neighborhoods no matter the nprobe.

    Same one-pass broadcast assignment as s03; purity is one rollup on
    (cell, label) + a per-cell window over at most |labels| rows."""
    emb = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.col(label_col).alias("lbl"),
    )
    cent = emb.filter(F.col("vid") < n_cells).select(
        F.col("vid").alias("cid"), F.col("vec").alias("c_vec")
    )
    aw = Window.partitionBy("vid").orderBy(F.desc("sim"), F.asc("cid"))
    cells = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vid", "lbl", "cid", cosine_sim(F.col("vec"), F.col("c_vec")).alias("sim")
        )
        .withColumn("rnk", F.row_number().over(aw))
        .filter(F.col("rnk") == 1)
        .select("vid", "lbl", F.col("cid").alias("cell"))
    )
    grid = cells.groupBy("cell", "lbl").agg(F.count(F.lit(1)).alias("n"))
    per_cell = Window.partitionBy("cell")
    maj = Window.partitionBy("cell").orderBy(F.desc("n"), F.asc("lbl"))
    return (
        grid.withColumn("cell_n", F.sum("n").over(per_cell))
        .withColumn("n_labels", F.count(F.lit(1)).over(per_cell))
        .withColumn("rk", F.row_number().over(maj))
        .filter(F.col("rk") == 1)
        .select(
            F.col("cell").cast("long").alias("cell"),
            F.col("cell_n").cast("long").alias("n_vecs"),
            F.col("lbl").cast("long").alias("majority_label"),
            F.expr("(n * 1000000) div cell_n").alias("purity_ppm"),
            F.col("n_labels").cast("long").alias("n_labels"),
        )
    )


def cell_purity_sql(table: str = "embeddings", n_cells: int = N_CELLS) -> str:
    assign_sim = cosine_sim_sql("b.embedding", "c.c_vec")
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS c_vec FROM {table} WHERE vec_id < {n_cells}
    ),
    ranked AS (
      SELECT b.vec_id AS vid, b.label AS lbl, c.cid,
             row_number() OVER (PARTITION BY b.vec_id
                                ORDER BY {assign_sim} DESC, c.cid ASC) AS rnk
      FROM {table} b CROSS JOIN cent c
    ),
    cells AS (SELECT vid, lbl, cid AS cell FROM ranked WHERE rnk = 1),
    grid AS (SELECT cell, lbl, count(*) AS n FROM cells GROUP BY 1, 2),
    annotated AS (
      SELECT cell, lbl, n,
             CAST(sum(n) OVER (PARTITION BY cell) AS BIGINT) AS cell_n,
             count(*) OVER (PARTITION BY cell) AS n_labels,
             row_number() OVER (PARTITION BY cell ORDER BY n DESC, lbl ASC) AS rk
      FROM grid
    )
    SELECT cell::BIGINT AS cell, cell_n AS n_vecs,
           lbl::BIGINT AS majority_label,
           (n * 1000000) // cell_n AS purity_ppm,
           n_labels::BIGINT AS n_labels
    FROM annotated WHERE rk = 1
    """

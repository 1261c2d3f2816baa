"""Vector functions on embedding columns — the Arrow scalar-UDF surface.

Most of the engine deliberately stays JVM-side (pyspark.sql.functions); this
module is the designated example of the OTHER path: a vectorized
``@pandas_udf`` receiving Arrow record batches, for computations that
genuinely need Python (here: numeric code that must reproduce a specific
accumulation order).  One Arrow round-trip per batch of rows — never
row-at-a-time pickling.

The unit-normalization below accumulates the squared norm with an explicit
sequential float64 fold, matching DuckDB's ``list_reduce`` fold exactly, so
even the Python-UDF path is value-hash verified against the oracle (numpy's
pairwise summation would NOT match — accumulation order is part of the
contract here).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from spj_query_engine_spark.functions.hashing import portable_round_sql

NORM_DIGITS = 6


def _unit_normalize_udf():
    """Build the UDF lazily — ``pandas_udf`` resolves its return type
    against the active SparkSession, so decorating at import time would
    require a session before the module can load."""

    @pandas_udf("array<double>")
    def unit_normalize(vecs):  # pd.Series[list[f32]] -> pd.Series[list[f64]]
        import pandas as pd

        def one(arr):
            if arr is None:
                return None
            if len(arr) == 0:
                return []  # the oracle's nrm=0 branch maps [] -> [] , not NULL
            acc = 0.0
            xs = [float(x) for x in arr]  # float32 -> float64, exact
            for x in xs:
                acc += x * x  # sequential fold — same order as the SQL twin
            n = math.sqrt(acc)
            if n == 0.0:
                return xs
            scale = 10.0 ** NORM_DIGITS
            return [math.floor((x / n) * scale + 0.5) / scale for x in xs]

        return pd.Series([one(a) for a in vecs])

    return unit_normalize


def normalize_embeddings(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Unit-normalize every embedding via the Arrow pandas-UDF path; rounded
    to NORM_DIGITS so the value hash is stable."""
    return emb.select(
        F.col(id_col), _unit_normalize_udf()(F.col(vec_col)).alias("unit_vec")
    )


def normalize_embeddings_sql(table: str = "embeddings") -> str:
    norm = (
        "sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
        "list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), "
        "(a, v) -> a + v))"
    )
    elem = portable_round_sql("x::DOUBLE / nrm", NORM_DIGITS)
    return f"""
    WITH n AS (SELECT vec_id, embedding, {norm} AS nrm FROM {table})
    SELECT vec_id,
           CASE WHEN nrm = 0 THEN list_transform(embedding, x -> x::DOUBLE)
                ELSE list_transform(embedding, x -> {elem}) END AS unit_vec
    FROM n
    """


def normalize_embeddings_long(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """u01's gate shape: the unit vector POSEXPLODED to (vec_id, pos, val)
    scalar rows.  The driver's correctness gate sorts every output column
    with pandas, and array cells arrive as numpy.ndarray (unhashable) — the
    CORRECTNESS_r02 u01 error — so the registered entry emits atomic columns
    while still value-checking every component of every vector."""
    return normalize_embeddings(emb, vec_col, id_col).select(
        F.col(id_col), F.posexplode("unit_vec").alias("pos", "val")
    )


def normalize_embeddings_long_sql(table: str = "embeddings") -> str:
    # DuckDB zips equal-length unnests in the SELECT list, giving the
    # (position, element) pairing posexplode produces.
    return f"""
    WITH base AS ({normalize_embeddings_sql(table)})
    SELECT vec_id,
           unnest(generate_series(0, len(unit_vec) - 1)) AS pos,
           unnest(unit_vec) AS val
    FROM base
    """


def source_stats_arrow(docs):
    """Per-source corpus stats through ``applyInArrow`` (u03) — the RAW
    Arrow grouped API: the group arrives as a ``pyarrow.Table`` and is
    aggregated with Arrow compute kernels, no pandas materialization at
    all — the lowest-overhead Python surface (u01 = scalar pandas_udf,
    u02 = grouped-map pandas, u03 = grouped-map Arrow).  The work is
    deliberately a plain rollup so the oracle is trivial; the entry
    proves the API contract (Arrow batch in, Arrow table out,
    value-hash-identical arithmetic)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(table: pa.Table) -> pa.Table:
        n = table.num_rows
        total = pc.sum(table.column("n_chars")).as_py() or 0
        src = table.column("source")[0].as_py()
        mean = __import__("math").floor(total / n * 10_000 + 0.5) / 10_000
        return pa.table(
            {
                "source": [src],
                "n_docs": [n],
                "total_chars": [int(total)],
                "mean_chars": [mean],
            }
        )

    return (
        docs.select("source", "n_chars")
        .groupBy("source")
        .applyInArrow(
            stats,
            "source string, n_docs long, total_chars long, mean_chars double",
        )
    )


def source_stats_arrow_sql(table: str = "documents") -> str:
    return f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           floor(SUM(n_chars) / CAST(count(*) AS DOUBLE) * 10000 + 0.5) / 10000
             AS mean_chars
    FROM {table} GROUP BY source
    """


def doc_digests_arrow(docs: DataFrame) -> DataFrame:
    """Per-document token count + md5 digest through ``mapInArrow`` (u04) —
    the STREAMING raw-Arrow surface completing the Python ladder (u01 =
    scalar ``pandas_udf``, u02 = grouped-map pandas, u03 = grouped-map
    Arrow, u04 = ungrouped batch iterator): record batches stream through
    the worker with no grouping shuffle at all, the shape multimodal
    decode pipelines use (m01–m04 wrap the same API via mapInPandas).

    Value-hash contract: tokenization is ASCII-``\\s+`` split (matching the
    Java/RE2 semantics of the SQL twins — Python's default unicode ``\\s``
    would diverge on exotic whitespace) and the digest is stock md5, so
    even this Python path replays exactly in DuckDB."""
    import hashlib
    import re

    import pyarrow as pa

    ws = re.compile(r"\s+", flags=re.ASCII)

    def batches(it):
        for batch in it:
            ids = batch.column(batch.schema.get_field_index("doc_id"))
            texts = batch.column(batch.schema.get_field_index("text")).to_pylist()
            n_toks, digs = [], []
            for t in texts:
                if t is None:
                    n_toks.append(None)
                    digs.append(None)
                else:
                    n_toks.append(len([w for w in ws.split(t) if w]))
                    digs.append(hashlib.md5(t.encode("utf-8")).hexdigest())
            yield pa.record_batch(
                [ids, pa.array(n_toks, pa.int64()), pa.array(digs, pa.string())],
                names=["doc_id", "n_tokens", "digest"],
            )

    return docs.select("doc_id", "text").mapInArrow(
        batches, "doc_id long, n_tokens long, digest string"
    )


def doc_digests_arrow_sql(table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
                AS BIGINT) AS n_tokens,
           md5(text) AS digest
    FROM {table}
    """


def sentence_stats_udtf(spark, docs: DataFrame) -> DataFrame:
    """Sentence segmentation through Spark 4's Python UDTF (u06) — the
    table-function rung of the Python ladder (u01 scalar pandas_udf, u02/u03
    grouped map, u04 mapInArrow, u05 DataSource): one input row fans out to
    N output rows via LATERAL, the shape chunkers and parsers need when the
    fan-out is genuinely Python (here: sentence splitting, the step before
    p06's fixed-window chunking).

    Value-hash contract: ASCII ``[.!?]+`` splitting and an explicit
    strip-charset (space/TAB/LF/CR) keep Python and the DuckDB twin
    character-identical; the per-doc rollup digests sentences in position
    order, so the UDTF path is fully oracle-verified."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string")
    class SplitSentences:
        def eval(self, text):  # noqa: ANN001
            if text is None:
                return
            import re

            i = 0
            for p in re.split(r"[.!?]+", text, flags=re.ASCII):
                p = p.strip(" \t\n\r")
                if p:
                    yield (i, p)
                    i += 1

    spark.udtf.register("spj_split_sentences", SplitSentences)
    docs.select("doc_id", "text").createOrReplaceTempView("spj_udtf_docs")
    exploded = spark.sql(
        "SELECT d.doc_id, s.pos, s.sentence "
        "FROM spj_udtf_docs d, LATERAL spj_split_sentences(d.text) s"
    )
    per_doc = exploded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sentences"),
        F.md5(
            F.concat_ws(
                " | ",
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, sentence))), s -> s.sentence)"
                ),
            )
        ).alias("digest"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_sentences"), F.lit(0)).cast("long").alias("n_sentences"),
            F.coalesce(F.col("digest"), F.md5(F.lit(""))).alias("digest"),
        )
    )


def sentence_stats_udtf_sql(table: str = "documents") -> str:
    strip = "' ' || chr(9) || chr(10) || chr(13)"
    return f"""
    WITH parts AS (
      SELECT doc_id, i, trim(arr[i + 1], {strip}) AS sentence
      FROM (SELECT doc_id, string_split_regex(text, '[.!?]+') AS arr FROM {table}),
           unnest(range(0, len(arr))) AS u(i)
    ),
    sent AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS pos,
             sentence
      FROM parts
      WHERE sentence <> ''
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS n_sentences,
             md5(string_agg(sentence, ' | ' ORDER BY pos)) AS digest
      FROM sent GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_sentences, 0) AS BIGINT) AS n_sentences,
           COALESCE(p.digest, md5('')) AS digest
    FROM {table} d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """


# ---------------------------------------------------------------------------
# SQL-registered Python UDF (u07) — the spark.sql-callable rung
# ---------------------------------------------------------------------------

VOWELS = "aeiou"


def register_vowel_udf(spark) -> None:
    """Register an Arrow ``pandas_udf`` under a SQL name so ANY SQL text in
    the session (`spark.sql`, views, the CLI front-end) can call it — the
    deployment mode the other ladder rungs (u01 DataFrame scalar, u02/u03
    grouped, u04 batch-iterator, u05 source, u06 UDTF) don't cover: a
    Python function published to SQL users who never touch the DataFrame
    API.  The body is integer counting only (vowels among ASCII letters),
    so the SQL twin replays it exactly — no float path at all."""
    import pandas as pd

    def vowel_count(texts):  # pd.Series[str] -> pd.Series[int64]
        return pd.Series(
            [
                sum(1 for ch in (t or "").lower() if ch in VOWELS)
                for t in texts
            ],
            dtype="int64",
        )

    # functional pandas_udf form: the module-wide `from __future__ import
    # annotations` stringifies type hints, which the decorator cannot resolve
    spark.udf.register("vowel_count", pandas_udf(vowel_count, "long"))


def vowel_profile(spark, docs) -> "object":
    """Per-language vowel-density profile computed ENTIRELY in SQL text
    through the registered Python UDF — `spark.sql` is the only API used
    after registration."""
    register_vowel_udf(spark)
    docs.createOrReplaceTempView("u07_documents")
    return spark.sql(
        """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(vowel_count(text)) AS BIGINT) AS n_vowels,
               CAST(sum(length(text)) AS BIGINT) AS n_chars
        FROM u07_documents
        GROUP BY lang
        """
    )


def vowel_profile_sql(table: str = "documents") -> str:
    # COALESCE: the pandas UDF maps NULL text to 0, so Spark's sum over an
    # all-NULL-text group is 0; SQL's sum skips NULLs and would yield NULL.
    vc = "len(regexp_extract_all(lower(text), '[aeiou]'))"
    return f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(sum({vc}), 0) AS BIGINT) AS n_vowels,
           CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM {table}
    GROUP BY lang
    """

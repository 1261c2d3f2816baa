"""Co-occurrence recommendation over the transactional tables.

Beyond-reference capability: the market-basket / item-item collaborative
filtering shape (Linden et al. 2003, "Amazon.com recommendations: item-to-item
collaborative filtering") expressed as bounded equi-joins over the TPC-H-style
``lineitem`` fact — the same anatomy as the document near-dup inverted index
(dedup.py), with the order basket playing the posting list's role.

Reference anatomy: the reference engine (Scan/Select/Join, SURVEY.md §2.1)
could express the basket self-join but not the ranking; here the whole
pipeline is one declarative plan."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BASKET_CAP = 100  # orders with more distinct parts than this are excluded
CO_MIN = 2  # minimum co-occurrence support
CO_TOP = 3  # recommendations kept per part


def copurchase_topk(lineitem: DataFrame) -> DataFrame:
    """Top-``CO_TOP`` co-purchased parts per part by basket co-occurrence:
    (order, part) postings → within-basket pair join → support filter →
    per-part ranking window.  The scale levers mirror d05's inverted
    index: pair fan-out is Σ basket² so ``BASKET_CAP`` drops degenerate
    mega-baskets (TPC-H baskets hold ≤ 7 parts — the cap is the
    production guard, not a testdata need), support ≥ ``CO_MIN`` prunes
    the long tail before the ranking shuffle, and the window runs over
    the pair-support frame (bounded by co-occurring pairs, never
    lineitems)."""
    # ONE exchange (hash on okey) serves the whole basket side: the
    # explicit repartition's okey partitioning satisfies the distinct's
    # clustering (subset of its keys), the size-cap window's, and both
    # sides of the within-basket self-join — the previous shape
    # (corpus-wide distinct + a separate size aggregate joined back) paid
    # three exchanges of the same posting rows for the same grouping
    # (guide §2.4: operations keyed the same way share one exchange).
    # The size cap itself is a count window over the basket partition —
    # identical filter semantics, no join.
    baskets = (
        lineitem.select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
        )
        .repartition("okey")
        .dropDuplicates()
    )
    b = baskets.withColumn(
        "bs", F.count(F.lit(1)).over(Window.partitionBy("okey"))
    ).filter(F.col("bs") <= BASKET_CAP).select("okey", "part")
    p1, p2 = b.alias("p1"), b.alias("p2")
    co = (
        p1.join(
            p2,
            (F.col("p1.okey") == F.col("p2.okey"))
            & (F.col("p1.part") < F.col("p2.part")),
        )
        .groupBy(F.col("p1.part").alias("pa"), F.col("p2.part").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= CO_MIN)
    )
    # the symmetric union references `co` twice — materialize the support
    # table (bounded: co-occurring pairs with support >= CO_MIN, tiny next
    # to the fact) so the basket self-join executes once, not per branch
    from spj_query_engine_spark.operators.core import barrier

    co = barrier(co)
    sym = co.select(
        F.col("pa").alias("part"), F.col("pb").alias("rec"), "n_co"
    ).unionByName(co.select(F.col("pb").alias("part"), F.col("pa").alias("rec"), "n_co"))
    w = Window.partitionBy("part").orderBy(F.desc("n_co"), F.asc("rec"))
    return (
        sym.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= CO_TOP)
        .select("part", "rec", "n_co", F.col("rk").cast("long").alias("rk"))
    )


def copurchase_topk_sql(table: str = "lineitem") -> str:
    return f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM {table}
    ),
    ok AS (SELECT okey FROM baskets GROUP BY okey HAVING count(*) <= {BASKET_CAP}),
    b AS (SELECT baskets.okey, baskets.part FROM baskets JOIN ok USING (okey)),
    co AS (
      SELECT p1.part AS pa, p2.part AS pb, count(*) AS n_co
      FROM b p1 JOIN b p2 ON p1.okey = p2.okey AND p1.part < p2.part
      GROUP BY 1, 2
      HAVING count(*) >= {CO_MIN}
    ),
    sym AS (
      SELECT pa AS part, pb AS rec, n_co FROM co
      UNION ALL SELECT pb, pa, n_co FROM co
    )
    SELECT part, rec, CAST(n_co AS BIGINT) AS n_co, CAST(rk AS BIGINT) AS rk FROM (
      SELECT part, rec, n_co,
             row_number() OVER (PARTITION BY part ORDER BY n_co DESC, rec ASC) AS rk
      FROM sym
    ) WHERE rk <= {CO_TOP}
    """

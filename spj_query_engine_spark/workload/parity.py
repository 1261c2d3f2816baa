"""Parity workload — the reference's 14 executable test-query shapes plus its
parsed-but-aborting surface (aggregates, ORDERBY), re-targeted at the driver's
TPC-H-ish testdata (TESTDATA.md).

Mapping to the reference corpus (/root/reference/test-queries):

==================  =====================================================
query1.sql          q01_scan_full            (pure scan)
query2.sql          q02_filter_project       (σ + π)
query3.sql          q03_join2_project        (2-table equi-join + π)
query4.sql          q04_join3_star           (3-table chain, SELECT *)
query5.sql          q05_join4_star           (4-table chain, SELECT *)
query6.sql          q06_join4_filters_star   (4-table chain + 2 range σ)
query7.sql          q07_join4_filters_proj   (same + π)
query8.sql          q08_groupby_max          (MAX+GROUPBY; extends-reference)
query9/_distinct    q09_distinct
query10.sql         q10_orderby              (ORDERBY; extends-reference)
query_groupby.sql   q11_groupby_as_distinct  (GROUPBY w/o aggs = distinct keys)
experiment1_*.sql   q12_exp1_single_join     (single equi-join, SELECT *)
experiment2.sql     q13_exp2_two_conditions  (3 tables, 2 join conditions)
(D2 full surface)   q14_pricing_summary      (all five agg funcs; flagship)
(D2 full surface)   q15_join_agg_revenue     (join + group + agg + orderby)
(D2 full surface)   q16_global_agg           (aggregate without GROUPBY)
==================  =====================================================

Queries q01–q13 and q16 run through the DIALECT FRONT-END (parse → plan
builder) — exercising the reference's grammar quirks end-to-end; q14/q15 use
the DataFrame-level engine API directly (design D1's other layer).

Determinism rules for the DuckDB value-hash gate:
* never emit raw timestamps — project ``unix_millis(ts)`` (oracle:
  ``epoch_ms(ts)``), both exact BIGINT;
* never SUM/AVG raw doubles — cast to DECIMAL first (exact, order-independent
  sums), divide/cast to double only at the end;
* alias every computed column identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spj_query_engine_spark.catalog import load_tables
from spj_query_engine_spark.dialect import parse
from spj_query_engine_spark.plans import build_plan
from spj_query_engine_spark.workload.registry import register


def _referenced_tables(q) -> set[str]:
    """Table names a parsed dialect query actually touches (FROM list +
    explicit-join chain, both legs of set ops)."""
    from spj_query_engine_spark.dialect.ast import SetQuery

    if isinstance(q, SetQuery):
        return _referenced_tables(q.left) | _referenced_tables(q.right)
    return set(q.from_list) | {j.table for j in q.joins}


def dialect_query(sql: str):
    """A (spark, sf_dir) callable that runs ``sql`` through the dialect
    front-end over the sf_dir catalog.

    Only the tables the PARSED query references are loaded (r10): loading
    the full 10-table catalog cost ~6 py4j round trips per unused table on
    every invocation — pure per-query driver overhead for the ~60 dialect
    entries, none of which touch more than 4 tables."""
    names = tuple(sorted(_referenced_tables(parse(sql))))

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return build_plan(spark, load_tables(spark, sf_dir, names), parse(sql))

    return fn


def unix_millis_col(col) -> F.Column:
    """Exact epoch-ms for TIMESTAMP and TIMESTAMP_NTZ alike (parquet ms/us
    columns load as NTZ in Spark 4; session TZ is pinned UTC so the NTZ→LTZ
    cast is the identity on wall-clock values)."""
    return F.unix_millis(F.col(col).cast(T.TimestampType()) if isinstance(col, str) else col)


def epochize(df: DataFrame) -> DataFrame:
    """Replace every timestamp column with exact epoch-milliseconds (same
    name) — Spark ``unix_millis`` ≡ DuckDB ``epoch_ms`` on micro-precision
    values, keeping the oracle hash comparison integer-exact."""
    for field in df.schema.fields:
        if isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
            df = df.withColumn(field.name, unix_millis_col(field.name))
    return df


def _epochized(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return epochize(fn(spark, sf_dir))

    return wrapped


# --- q01: pure scan (query1.sql: SELECT * FROM CUSTOMER) ---
register(
    "q01_scan_full",
    "SELECT * FROM customer",
    doc="Full scan, SELECT * (reference Scan.java).",
)(dialect_query("SELECT * FROM customer"))

# --- q02: filter + project (query2.sql) ---
register(
    "q02_filter_project",
    "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'",
    doc="σ equality on string literal + π (reference Select/Project).",
)(
    dialect_query(
        'SELECT customer.c_custkey, customer.c_name, customer.c_acctbal '
        'FROM customer WHERE customer.c_mktsegment = "BUILDING"'
    )
)

# --- q03: 2-table equi-join + project (query3.sql) ---
register(
    "q03_join2_project",
    "SELECT c_custkey, c_name, o_orderkey, o_totalprice FROM customer "
    "JOIN orders ON c_custkey = o_custkey",
    doc="Equi-join + π (reference NestedJoin/BNLJ/HashJoin → Catalyst pick).",
)(
    dialect_query(
        "SELECT customer.c_custkey, customer.c_name, orders.o_orderkey, orders.o_totalprice "
        "FROM customer, orders WHERE customer.c_custkey = orders.o_custkey"
    )
)

# --- q04: 3-table chain, SELECT * (query4.sql) ---
register(
    "q04_join3_star",
    "SELECT customer.*, nation.*, region.* FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey",
    doc="3-way join chain, SELECT * keeps duplicate join keys (Schema.joinWith).",
)(
    dialect_query(
        "SELECT * FROM customer, nation, region "
        "WHERE customer.c_nationkey = nation.n_nationkey, nation.n_regionkey = region.r_regionkey"
    )
)

# --- q05: 4-table chain, SELECT * (query5.sql) ---
register(
    "q05_join4_star",
    "SELECT customer.*, nation.*, region.*, supplier.* FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "JOIN supplier ON s_nationkey = n_nationkey",
    doc="4-way join chain, SELECT *.",
)(
    dialect_query(
        "SELECT * FROM customer, nation, region, supplier "
        "WHERE customer.c_nationkey = nation.n_nationkey, "
        "nation.n_regionkey = region.r_regionkey, "
        "supplier.s_nationkey = nation.n_nationkey"
    )
)

# --- q06: 4-table chain + 2 range filters, SELECT * (query6.sql) ---
register(
    "q06_join4_filters_star",
    "SELECT * REPLACE (epoch_ms(o_orderdate) AS o_orderdate, epoch_ms(l_shipdate) AS l_shipdate) "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "WHERE o_totalprice < 150000 AND o_totalprice > 50000",
    doc="4-way chain + two range predicates on quoted numeric literals "
    "(query6.sql shape; timestamps emitted as epoch-ms for the hash gate).",
)(
    _epochized(
        dialect_query(
            "SELECT * FROM customer, orders, lineitem, supplier "
            "WHERE customer.c_custkey = orders.o_custkey, "
            "orders.o_orderkey = lineitem.l_orderkey, "
            "lineitem.l_suppkey = supplier.s_suppkey, "
            'orders.o_totalprice < "150000", orders.o_totalprice > "50000"'
        )
    )
)

# --- q07: same chain + projection (query7.sql) ---
register(
    "q07_join4_filters_proj",
    "SELECT c_mktsegment, o_totalprice, l_quantity, s_name "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "JOIN supplier ON l_suppkey = s_suppkey "
    "WHERE o_totalprice < 150000 AND o_totalprice > 50000",
    doc="query7.sql shape: 4-way chain + filters + narrow projection.",
)(
    dialect_query(
        "SELECT customer.c_mktsegment, orders.o_totalprice, lineitem.l_quantity, supplier.s_name "
        "FROM customer, orders, lineitem, supplier "
        "WHERE customer.c_custkey = orders.o_custkey, "
        "orders.o_orderkey = lineitem.l_orderkey, "
        "lineitem.l_suppkey = supplier.s_suppkey, "
        'orders.o_totalprice < "150000", orders.o_totalprice > "50000"'
    )
)

# --- q08: MAX + GROUPBY (query8.sql — aborts in the reference; D2) ---
register(
    "q08_groupby_max",
    "SELECT c_mktsegment, MAX(o_totalprice) AS max_o_totalprice "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "WHERE o_totalprice < 100000 GROUP BY c_mktsegment",
    doc="extends-reference: the parsed-but-aborting aggregate surface "
    "(Project.java:72-75) implemented via groupBy().agg().",
)(
    dialect_query(
        "SELECT customer.c_mktsegment, MAX(orders.o_totalprice) "
        "FROM customer, orders WHERE customer.c_custkey = orders.o_custkey, "
        'orders.o_totalprice < "100000" GROUPBY customer.c_mktsegment'
    )
)

# --- q09: DISTINCT (query9.sql / query_distinct.sql) ---
register(
    "q09_distinct",
    "SELECT DISTINCT c_mktsegment FROM customer",
    doc="DISTINCT (reference Distinct.java external sort → hash aggregate).",
)(dialect_query("SELECT DISTINCT customer.c_mktsegment FROM customer"))

# --- q10: ORDERBY (query10.sql — aborts in the reference; D2) ---
register(
    "q10_orderby",
    "SELECT c_custkey, o_totalprice FROM customer JOIN orders ON c_custkey = o_custkey "
    "WHERE o_totalprice < 150000 AND o_totalprice > 50000 ORDER BY o_totalprice",
    doc="extends-reference: ORDERBY (RandomInitialPlan.java:50-53) via a "
    "distributed range-partitioned sort.",
)(
    dialect_query(
        "SELECT customer.c_custkey, orders.o_totalprice FROM customer, orders "
        "WHERE customer.c_custkey = orders.o_custkey, "
        'orders.o_totalprice < "150000", orders.o_totalprice > "50000" '
        "ORDERBY orders.o_totalprice"
    )
)

# --- q11: GROUPBY without aggregates = distinct keys (query_groupby.sql) ---
register(
    "q11_groupby_as_distinct",
    "SELECT DISTINCT l_quantity FROM lineitem",
    doc="Reference GroupBy computes NO aggregates — distinct grouping keys "
    "only, other select columns dropped (GroupBy.java:101-113, §2.2).",
)(
    dialect_query(
        "SELECT lineitem.l_orderkey, lineitem.l_quantity FROM lineitem "
        "GROUPBY lineitem.l_quantity"
    )
)

# --- q12: single equi-join, SELECT * (experiment1_*.sql) ---
register(
    "q12_exp1_single_join",
    "SELECT supplier.*, nation.* FROM supplier JOIN nation ON s_nationkey = n_nationkey",
    doc="experiment1 shape: one equi-join, full output.",
)(
    dialect_query(
        "SELECT * FROM supplier, nation WHERE supplier.s_nationkey = nation.n_nationkey"
    )
)

# --- q13: 3 tables, 2 join conditions sharing a table (experiment2.sql) ---
register(
    "q13_exp2_two_conditions",
    "SELECT s_name, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey "
    "JOIN customer ON c_nationkey = n_nationkey",
    doc="experiment2 shape: join graph where the second condition attaches "
    "to an already-joined table.",
)(
    dialect_query(
        "SELECT supplier.s_name, nation.n_name FROM supplier, nation, customer "
        "WHERE supplier.s_nationkey = nation.n_nationkey, "
        "customer.c_nationkey = nation.n_nationkey"
    )
)


# --- q14: pricing summary — all five aggregate functions (flagship) ---
@register(
    "q14_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_quantity < 50
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-style pricing summary: MAX/MIN/SUM/COUNT/AVG over the "
    "biggest table; decimal-exact sums keep the value hash order-independent "
    "(double addition is not associative across partitions).",
)
def q14_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_quantity") < 50)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.min("l_extendedprice").cast("double").alias("min_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- q15: join + group + agg + orderby (TPC-H-Q3-style revenue) ---
@register(
    "q15_join_agg_revenue",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(epoch_ms(o_orderdate) AS BIGINT) AS o_orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    """,
    doc="TPC-H-Q3-style: selective dimension filter + two joins + grouped "
    "revenue; the customer filter prunes before the join (pushdown).",
)
def q15_join_agg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    joined = (
        t["orders"]
        .join(cust, t["orders"].o_custkey == cust.c_custkey)
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            unix_millis_col("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderdate")
    )


# --- q16: global aggregate without GROUPBY (dialect front-end) ---
register(
    "q16_global_agg",
    "SELECT COUNT(l_orderkey) AS count_l_orderkey, "
    "MAX(l_extendedprice) AS max_l_extendedprice, "
    "MIN(l_extendedprice) AS min_l_extendedprice "
    "FROM lineitem WHERE l_returnflag = 'A'",
    doc="Global aggregate (no GROUPBY) through the dialect front-end; "
    "COUNT/MAX/MIN only — exact regardless of partition order.",
)(
    dialect_query(
        "SELECT COUNT(lineitem.l_orderkey), MAX(lineitem.l_extendedprice), "
        'MIN(lineitem.l_extendedprice) FROM lineitem WHERE lineitem.l_returnflag = "A"'
    )
)


# --- q17: salted skew join (scale lever, plain-join oracle) ---
@register(
    "q17_salted_join_agg",
    """
    SELECT o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Salted skew join (operators.scale.salted_join, 8 salts): fact side "
    "salted, dimension side replicated; identical semantics to the plain "
    "equi-join, proven by the plain-join oracle.",
)
def q17_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.scale import salted_join

    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    # Project the fact side to the two columns the join+aggregate need
    # BEFORE salting (guide §2.3): salted_join's salt hashes every input
    # column, so an unprojected lineitem forces the scan to read all 16
    # columns and shuffle them.  The salt only routes rows to reducers —
    # any deterministic per-row value splits a hot key equally well — so
    # the join result and the oracle are untouched.
    joined = salted_join(
        t["lineitem"].select("l_orderkey", "l_extendedprice"),
        t["orders"].select("o_orderkey", "o_orderpriority"),
        "l_orderkey", "o_orderkey", n_salts=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- q18: top-k (LIMIT) — no LIMIT token in the reference grammar
# (scaner.lex); Spark executes it as TakeOrderedAndProject, which never
# materializes the full sort (per-partition top-k, merge on the driver) ---
@register(
    "q18_topk_orders",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="Top-k: ORDER BY + LIMIT with a total order (tie-break on the key) "
    "so the row set is deterministic; plans as TakeOrderedAndProject — "
    "per-partition top-k, no global sort materialization.",
)
def q18_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --- q19: HAVING — aggregate-predicate filter, absent from the reference
# grammar (parser.cup); in Spark just a filter above the aggregate, which
# Catalyst keeps above the shuffle (it cannot push through) ---
@register(
    "q19_groupby_having",
    """
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 20
    """,
    doc="GROUP BY + HAVING (aggregate predicate) — filter composed above "
    "the aggregate; map-side partial agg unchanged.",
)
def q19_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 20)
    )


# --- q20: ROLLUP grouping sets — another surface the reference lacks
# (§2.3); Spark expands the grouping sets before the aggregate, so the
# shuffle still carries map-side partials per (set, key) ---
@register(
    "q20_rollup",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP grouping sets (priority, status) with subtotals and a grand "
    "total; NULL-marked rollup rows hash-compare exactly across engines.",
)
def q20_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


# --- q21/q22: outer + anti join — beyond the reference's inner-only
# execution (§2.3); both hit the how= surface of operators.core.equi_join ---
@register(
    "q21_left_join_agg",
    """
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    doc="LEFT OUTER join + count: zero-order customers survive with n=0 "
    "(COUNT over the null-extended side).",
)
def q21_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.core import equi_join

    t = load_tables(spark, sf_dir, ("customer", "orders"))
    c = t["customer"].select("c_custkey")
    o = t["orders"].select("o_orderkey", "o_custkey")
    joined = equi_join(c, o, [(c.c_custkey, o.o_custkey)], how="left")
    return joined.groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders"))


@register(
    "q22_anti_join",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    )
    """,
    doc="LEFT ANTI join: customers with no big-ticket order — the id-only "
    "anti-join shape dedup/filter pipelines use everywhere.",
)
def q22_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.core import equi_join

    t = load_tables(spark, sf_dir, ("customer", "orders"))
    c = t["customer"].select("c_custkey")
    o = t["orders"].filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return equi_join(c, o, [(c.c_custkey, o.o_custkey)], how="left_anti")


@register(
    "q23_semi_join",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    doc="LEFT SEMI join: customers with at least one urgent order — EXISTS "
    "without duplication; completes the inner/outer/anti/semi how= surface.",
)
def q23_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.core import equi_join

    t = load_tables(spark, sf_dir, ("customer", "orders"))
    c = t["customer"].select("c_custkey", "c_mktsegment")
    o = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return equi_join(c, o, [(c.c_custkey, o.o_custkey)], how="left_semi")


# --- q24–q26: set operations — the reference ships only an unused schema
# compat check (Schema.checkCompat, SURVEY.md §2.3); these exercise
# operators/core.py's union/intersect/except_ builders.  Both input sets are
# key-only projections, so at scale the set op shuffles longs ---


def _custkey_sets(spark: SparkSession, sf_dir: str):
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a, b

_SET_A = "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
_SET_B = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000"


@register(
    "q24_union",
    f"{_SET_A} UNION {_SET_B}",
    doc="UNION (distinct): customers with an urgent OR a big-ticket order.",
)
def q24_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.core import union

    a, b = _custkey_sets(spark, sf_dir)
    return union(a, b)


@register(
    "q25_intersect",
    f"{_SET_A} INTERSECT {_SET_B}",
    doc="INTERSECT: customers with an urgent AND a big-ticket order.",
)
def q25_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.core import intersect

    a, b = _custkey_sets(spark, sf_dir)
    return intersect(a, b)


@register(
    "q26_except",
    f"{_SET_A} EXCEPT {_SET_B}",
    doc="EXCEPT: customers with an urgent but no big-ticket order.",
)
def q26_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.core import except_

    a, b = _custkey_sets(spark, sf_dir)
    return except_(a, b)


@register(
    "q27_cube",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    doc="CUBE grouping sets: all four grouping combinations of (priority, "
    "status) in one partial-aggregatable pass — like q20's ROLLUP, one Expand "
    "+ one shuffle regardless of data size.",
)
def q27_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


# --- q28/q29: extended-grammar front end (parse→build, extended=True) ---
def extended_dialect_query(sql: str):
    """Like :func:`dialect_query` but through the opt-in superset grammar
    (HAVING / LIMIT / ASC|DESC / set ops — dialect/parser.py module doc).
    The strict mode's rejection of these shapes is pinned by
    tests/test_dialect_extended.py."""

    names = tuple(sorted(_referenced_tables(parse(sql, extended=True))))

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return build_plan(
            spark, load_tables(spark, sf_dir, names), parse(sql, extended=True)
        )

    return fn


register(
    "q28_ext_having_topk",
    """
    SELECT o_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS count_o_orderkey
    FROM orders GROUP BY o_custkey HAVING COUNT(o_orderkey) > 15
    ORDER BY o_custkey DESC LIMIT 20
    """,
    doc="Extended grammar end-to-end: GROUPBY + HAVING on an aggregate + "
    "ORDERBY DESC + LIMIT, parsed and planned through the dialect front-end "
    "(extended=True).  Deterministic top-k: the sort key is the unique group "
    "key.  Catalyst folds sort+limit into TakeOrderedAndProject — no global "
    "sort materializes.",
)(
    extended_dialect_query(
        "SELECT orders.o_custkey, COUNT(orders.o_orderkey) FROM orders "
        'GROUPBY orders.o_custkey HAVING COUNT(orders.o_orderkey)>"15" '
        'ORDERBY orders.o_custkey DESC LIMIT "20"'
    )
)


register(
    "q29_ext_union",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
    doc="Extended grammar set op: UNION (distinct) of two filtered "
    "single-table queries through the front-end; union is by position with "
    "the wired Schema.checkCompat dtype guard (operators/core.py).",
)(
    extended_dialect_query(
        'SELECT customer.c_custkey FROM customer WHERE customer.c_mktsegment="BUILDING" '
        'UNION SELECT orders.o_custkey FROM orders WHERE orders.o_totalprice>"400000"'
    )
)


# --- q30: analytic window functions over a partitioned ordered frame ---
@register(
    "q30_window_analytics",
    """
    SELECT o_orderkey, o_custkey,
           CAST(row_number() OVER w AS BIGINT) AS order_seq,
           lag(o_orderkey) OVER w AS prev_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic window functions: per-customer order sequence number, "
    "previous order key (lag), and running spend (cumulative decimal sum "
    "cast to double) over one shared (partition, order) frame — a single "
    "shuffle on o_custkey serves all three; the deterministic "
    "(o_orderdate, o_orderkey) order makes the running sum value-hashable.",
)
def q30_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        cum.alias("cum_spend"),
    )


# --- q31: bucketed co-located join + aggregation (zero-Exchange plan) ---
@register(
    "q31_bucketed_join_agg",
    """
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    doc="Bucketed co-located join + same-key aggregation: both tables are "
    "bucketBy(custkey) catalog tables, so the join AND the groupBy read "
    "co-located buckets and the plan has ZERO shuffle exchanges (asserted in "
    "tests/test_scale.py) — the amortize-the-shuffle lever for fact tables "
    "joined repeatedly on one key.  Result proven identical to the plain "
    "join by the oracle.",
    bench=False,  # dominated by the one-time bucketed write, not join speed
)
def q31_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators import scale

    t = load_tables(spark, sf_dir, ("customer", "orders"))
    scale.write_bucketed(t["customer"], "q31_customer_b", ["c_custkey"], num_buckets=16)
    scale.write_bucketed(
        t["orders"], "q31_orders_b", ["o_custkey"], num_buckets=16
    )
    c = spark.table("q31_customer_b")
    o = spark.table("q31_orders_b")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


# --- q32: TPC-H Q3 shape — shipping-priority top-k revenue ---
Q32_CUTOFF = "1997-01-01"


@register(
    "q32_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           epoch_ms(o.o_orderdate) AS odate_ms
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{Q32_CUTOFF}'
      AND l.l_shipdate > TIMESTAMP '{Q32_CUTOFF}'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC LIMIT 10
    """,
    doc="TPC-H-Q3-shaped shipping-priority query: selective dimension filter "
    "(c_mktsegment) + two date predicates pushed to the scans, 3-way join, "
    "decimal-exact revenue aggregate, deterministic top-10 "
    "(TakeOrderedAndProject).  The composite shape every BI workload runs; "
    "tie-break on l_orderkey keeps the LIMIT hashable.",
)
def q32_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < F.lit(Q32_CUTOFF).cast("timestamp"))
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit(Q32_CUTOFF).cast("timestamp")
    )
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_millis(F.col("o_orderdate").cast(T.TimestampType())).alias("odate_ms"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


register(
    "q33_ext_orderby_agg",
    """
    SELECT o_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS count_o_orderkey
    FROM orders GROUP BY o_custkey
    ORDER BY count_o_orderkey DESC, o_custkey ASC LIMIT 15
    """,
    doc="Extended grammar: ORDERBY on the AGGREGATE itself (the natural "
    "top-k — most-active customers), parsed and planned end-to-end; "
    "integer count keys + unique-key tie-break keep the LIMIT "
    "deterministic; plans as TakeOrderedAndProject over the aggregate.",
)(
    extended_dialect_query(
        "SELECT orders.o_custkey, COUNT(orders.o_orderkey) FROM orders "
        "GROUPBY orders.o_custkey "
        'ORDERBY COUNT(orders.o_orderkey) DESC, orders.o_custkey ASC LIMIT "15"'
    )
)


# --- q34: TPC-H Q17 shape — small-quantity-order revenue (correlated avg) ---
Q34_BRAND = "Brand#23"


@register(
    "q34_small_qty_revenue",
    f"""
    WITH li AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice,
             SUM(CAST(l.l_quantity AS DECIMAL(18,6))) OVER (PARTITION BY l.l_partkey) AS sum_qty,
             COUNT(*) OVER (PARTITION BY l.l_partkey) AS cnt
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = '{Q34_BRAND}'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
           (floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 * 100.0 + 0.5) / 100.0) AS avg_yearly
    FROM li
    WHERE CAST(l_quantity AS DECIMAL(18,6)) * 5 * cnt < sum_qty
    """,
    doc="TPC-H-Q17-shaped query: per-part average via a window over the "
    "brand-filtered fact (the correlated-subquery shape, decorrelated), "
    "with the 0.2x-avg threshold multiplied out to pure decimal/integer "
    "arithmetic (qty x 5 x cnt < sum_qty) so no double rounding can flip "
    "a boundary row between engines.",
)
def q34_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spj_query_engine_spark.functions.hashing import portable_round

    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    p = t["part"].filter(F.col("p_brand") == Q34_BRAND).select("p_partkey")
    li = t["lineitem"].join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    qualified = (
        li.withColumn("sum_qty", F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(
            F.col("l_quantity").cast("decimal(18,6)") * 5 * F.col("cnt")
            < F.col("sum_qty")
        )
    )
    return qualified.agg(
        F.count(F.lit(1)).alias("n_small"),
        portable_round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0, 2
        ).alias("avg_yearly"),
    )


# --- q35: TPC-H Q4 shape — EXISTS with a cross-table residual predicate ---


@register(
    "q35_priority_waiting",
    """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H-Q4-shaped query: EXISTS subquery with a predicate spanning "
    "both tables (ship after order date) — plans as a LEFT SEMI hash join "
    "on the equi key with the inequality as a join residual, then a "
    "pre-aggregated rollup; the semi join dedups order rows in the join "
    "itself, so no DISTINCT pass exists anywhere.",
)
def q35_priority_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o, li = t["orders"], t["lineitem"]
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"]
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --- q36: TPC-H Q22 shape — above-average balance, never-ordered customers ---
Q36_NATIONS = (1, 3, 5, 7, 9, 11, 13)  # the Q22 country-code IN-set analog


@register(
    "q36_global_sales_opportunity",
    f"""
    WITH pool AS (
      SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer WHERE c_nationkey IN {Q36_NATIONS}
    ),
    thr AS (
      SELECT CAST(SUM(bal) AS DECIMAL(18,2)) AS sum_bal,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pool WHERE bal > 0
    ),
    eligible AS (
      SELECT p.c_custkey, p.c_nationkey, p.bal
      FROM pool p, thr
      WHERE p.bal * thr.n > thr.sum_bal
    )
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(bal) AS DOUBLE) AS totacctbal
    FROM eligible e
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = e.c_custkey AND o.o_orderstatus = 'F')
    GROUP BY c_nationkey
    """,
    doc="TPC-H-Q22-shaped query: customers of selected nations with "
    "above-average positive balance and no COMPLETED (F-status) orders - "
    "scalar-aggregate "
    "threshold broadcast as a single-row cross join, the avg comparison "
    "multiplied out to pure decimal (bal x n > sum) so no double-rounding "
    "boundary flip, anti join against orders, then rollup.",
)
def q36_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    pool = (
        t["customer"]
        .filter(F.col("c_nationkey").isin(*Q36_NATIONS))
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        )
    )
    thr = pool.filter(F.col("bal") > 0).agg(
        F.sum("bal").cast("decimal(18,2)").alias("sum_bal"),
        F.count(F.lit(1)).alias("n"),
    )
    eligible = pool.crossJoin(F.broadcast(thr)).filter(
        F.col("bal") * F.col("n") > F.col("sum_bal")
    )
    finished = t["orders"].filter(F.col("o_orderstatus") == "F")
    never_ordered = eligible.join(
        finished, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return never_ordered.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("bal").cast("double").alias("totacctbal"),
    )


# --- q37: TPC-H Q16 shape — supplier counts per part attribute group ---
Q37_EXCL_BRAND = "Brand#45"
Q37_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


@register(
    "q37_supplier_counts",
    f"""
    SELECT p.p_brand, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> '{Q37_EXCL_BRAND}'
      AND p.p_size IN {Q37_SIZES}
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_size
    """,
    doc="TPC-H-Q16-shaped query: distinct suppliers per (brand, size) "
    "group, excluding one brand and every negative-balance supplier "
    "(the NOT-IN complaints filter) - dimension filters push to the part "
    "scan, the exclusion list broadcasts as an anti join, and the "
    "count-distinct runs as Spark's two-phase expand aggregate.",
)
def q37_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    p = (
        t["part"]
        .filter(
            (F.col("p_brand") != Q37_EXCL_BRAND)
            & F.col("p_size").isin(*Q37_SIZES)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    return li.groupBy("p_brand", "p_size").agg(
        F.count_distinct("l_suppkey").alias("supplier_cnt")
    )


# --- q38: one-pass table profile (the runtime analog of `.stat` catalogs) ---
Q38_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")


@register(
    "q38_table_profile",
    """
    WITH a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
    """
    + ",\n".join(
        f"        CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_{c},\n"
        f"        CAST(count(DISTINCT {c}) AS BIGINT) AS ndv_{c}"
        for c in Q38_COLS
    )
    + """
      FROM orders
    )
    """
    + "\n    UNION ALL\n".join(
        f"    SELECT '{c}' AS col_name, n_rows, null_{c} AS n_nulls, ndv_{c} AS n_distinct FROM a"
        for c in Q38_COLS
    ),
    doc="One-pass per-column table profile (row count, null count, exact "
    "NDV) in long format - the runtime analog of the reference's .stat "
    "catalog files (RandomDB.java stats -> PlanCost), executed as ONE "
    "aggregate with Spark's two-phase expand for the multi-column "
    "count-distinct; at 100 TB swap NDV to approx_count_distinct (t10 "
    "gates that sketch), same single-pass shape.",
)
def q38_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
            for c in Q38_COLS
        ],
        *[F.count_distinct(c).alias(f"ndv_{c}") for c in Q38_COLS],
    )
    stack = (
        f"stack({len(Q38_COLS)}, "
        + ", ".join(f"'{c}', null_{c}, ndv_{c}" for c in Q38_COLS)
        + ") as (col_name, n_nulls, n_distinct)"
    )
    return a.select(F.expr(stack), "n_rows").select(
        "col_name", "n_rows", "n_nulls", "n_distinct"
    )


# --- q39: TPC-H Q21 shape — suppliers who alone shipped slow ---
Q39_SLOW_DAYS = 60
_Q39_MS = Q39_SLOW_DAYS * 86_400_000


@register(
    "q39_waiting_suppliers",
    f"""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN epoch_ms(l_shipdate) > epoch_ms(
                    (SELECT o2.o_orderdate FROM orders o2
                     WHERE o2.o_orderkey = l_orderkey)) + {_Q39_MS}
                  THEN 1 ELSE 0 END AS slow
      FROM lineitem
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM li l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.slow = 1
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.slow = 1)
    GROUP BY s.s_name
    """,
    doc="TPC-H-Q21-shaped query: suppliers whose line item was the ONLY "
    "slow one (ship > order date + %d days) in a completed multi-supplier "
    "order - EXISTS as a LEFT SEMI join (other supplier present) plus "
    "NOT EXISTS as a LEFT ANTI join (no OTHER slow supplier), both on the "
    "order key with the supplier inequality as join residual; the hardest "
    "reference-era planner shape, no DISTINCT pass anywhere."
    % Q39_SLOW_DAYS,
)
def q39_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier"))
    o = t["orders"].select("o_orderkey", "o_orderdate", "o_orderstatus")
    li = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            "o_orderstatus",
            (
                F.unix_millis(F.col("l_shipdate").cast("timestamp"))
                > F.unix_millis(F.col("o_orderdate").cast("timestamp")) + _Q39_MS
            ).alias("slow"),
        )
    )
    # r09 (§2.4): the semi/anti pair re-planned the lineitem⋈orders subtree
    # three times and shuffled it twice more for the joins.  Both
    # existence tests depend only on the set of (distinct) supplier keys
    # within the row's own order, so two collect_set windows over ONE
    # l_orderkey exchange answer them row-for-row:
    #   * semi-join l2 ("another supplier in this order")  ⇔ the order has
    #     ≥ 2 distinct suppliers;
    #   * anti-join l3 ("no OTHER supplier shipped slow")  ⇔ the distinct
    #     slow-supplier set is exactly {own} — the row itself is slow, so
    #     the set is non-empty and ==1 pins it to the own key.
    # Identical qualifying rows, one pass, one exchange; the oracle's
    # semi/anti SQL is untouched.
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey")
    li_w = li.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_slow_supp",
        F.size(
            F.collect_set(F.when(F.col("slow"), F.col("l_suppkey"))).over(w)
        ),
    )
    waited = li_w.filter(
        F.col("slow")
        & (F.col("o_orderstatus") == "F")
        & (F.col("n_supp") >= 2)
        & (F.col("n_slow_supp") == 1)
    )
    s = t["supplier"].select("s_suppkey", "s_name")
    return (
        waited.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- q40: TPC-H Q20 shape — dominant suppliers of selected parts ---
Q40_NAME_SUBSTR = "re"  # part-name filter (Q20's p_name LIKE 'forest%' analog)


@register(
    "q40_dominant_suppliers",
    f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT l_partkey, SUM(qty) AS total FROM ps GROUP BY l_partkey
    ),
    dominant AS (
      SELECT DISTINCT ps.l_suppkey
      FROM ps
      JOIN tot ON tot.l_partkey = ps.l_partkey
      JOIN part p ON p.p_partkey = ps.l_partkey
                 AND p.p_name LIKE '%{Q40_NAME_SUBSTR}%'
      WHERE ps.qty * 5 > tot.total
    )
    SELECT s.s_name, CAST(s.s_nationkey AS BIGINT) AS s_nationkey
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    """,
    doc="TPC-H-Q20-shaped query: suppliers who shipped more than "
    "a FIFTH of some matching part's total quantity - two stacked aggregates on the "
    "same grouping prefix (the second reuses the first's shuffle "
    "partitioning), the name filter pushed to the part scan and broadcast, "
    "the share test in pure decimal (qty x 5 > total), and the final "
    "IN as a LEFT SEMI join on the supplier key.",
)
def q40_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    ps = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty"))
    )
    tot = ps.groupBy("l_partkey").agg(F.sum("qty").alias("total"))
    named = (
        t["part"]
        .filter(F.col("p_name").contains(Q40_NAME_SUBSTR))
        .select("p_partkey")
    )
    dominant = (
        ps.join(tot, "l_partkey")
        .join(F.broadcast(named), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("qty") * 5 > F.col("total"))
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_nationkey").cast("long").alias("s_nationkey"))
    )


# --- q41: TPC-H Q10 shape — returned-item revenue ranking ---
Q41_FROM = "1996-07-01"
Q41_TO = "1997-01-01"


@register(
    "q41_returned_item_ranking",
    f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '{Q41_FROM}'
      AND o.o_orderdate < TIMESTAMP '{Q41_TO}'
    GROUP BY c.c_custkey, c.c_name, c.c_nationkey
    ORDER BY revenue DESC, c.c_custkey ASC LIMIT 20
    """,
    doc="TPC-H-Q10-shaped query: customers ranked by lost revenue from "
    "RETURNED items in one half-year - return-flag and date predicates "
    "pushed to both fact scans, customer dimension broadcast, "
    "decimal-exact revenue, deterministic top-20 TakeOrderedAndProject.",
)
def q41_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit(Q41_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q41_TO).cast("timestamp"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
            "n_items",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- q42: decile report — NTILE + per-decile rollup ---


@register(
    "q42_spend_deciles",
    """
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT o_custkey, total,
             ntile(10) OVER (ORDER BY total DESC, o_custkey ASC) AS decile
      FROM spend
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(total) AS DOUBLE) AS decile_spend,
           CAST(MIN(total) AS DOUBLE) AS min_spend,
           CAST(MAX(total) AS DOUBLE) AS max_spend
    FROM tiled GROUP BY decile
    """,
    doc="Customer-spend decile report: decimal-exact per-customer totals, "
    "NTILE(10) over a deterministic (total DESC, custkey ASC) order, then "
    "a per-decile rollup - the remaining analytic-window surface (q30 "
    "covers row_number/lag/running sums); the tile window runs over the "
    "per-customer aggregate, never raw orders.",
)
def q42_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("total")
    )
    w = Window.orderBy(F.desc("total"), F.asc("o_custkey"))
    tiled = spend.withColumn("decile", F.ntile(10).over(w))
    return tiled.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("total").cast("double").alias("decile_spend"),
        F.min("total").cast("double").alias("min_spend"),
        F.max("total").cast("double").alias("max_spend"),
    )


# --- q43: explicit GROUPING SETS + grouping_id ---


@register(
    "q43_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority))
    """,
    doc="Explicit GROUPING SETS (not the ROLLUP/CUBE shorthands q20/q27 "
    "cover): three chosen aggregation levels in ONE pass over orders via "
    "Spark's Expand operator, with grouping_id disambiguating the NULL "
    "semantics - the same single-scan multi-level shape both engines "
    "plan.",
)
def q43_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
            .cast("long")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total")
    )


# --- q44: referential-integrity audit — the data-quality gate ---


@register(
    "q44_referential_audit",
    """
    SELECT 'orphan_lineitems' AS check_name,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_bad
    UNION ALL
    SELECT 'childless_orders' AS check_name,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                   WHERE l.l_orderkey = o.o_orderkey)) AS BIGINT) AS n_bad
    UNION ALL
    SELECT 'customerless_orders' AS check_name,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS n_bad
    """,
    doc="Referential-integrity audit (the data-quality gate an ingest "
    "pipeline runs before publishing a snapshot): orphaned facts and "
    "childless parents counted via LEFT ANTI joins on each FK edge - "
    "each check is one anti hash join + count, no DISTINCT anywhere, "
    "and a healthy snapshot reports zeros.",
)
def q44_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))

    def anti_count(name: str, child: DataFrame, ck: str, parent: DataFrame, pk: str) -> DataFrame:
        return (
            child.join(parent, F.col(ck) == F.col(pk), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_bad"))
            .select(F.lit(name).alias("check_name"), "n_bad")
        )

    checks = [
        anti_count(
            "orphan_lineitems",
            t["lineitem"].select("l_orderkey"), "l_orderkey",
            t["orders"].select("o_orderkey"), "o_orderkey",
        ),
        anti_count(
            "childless_orders",
            t["orders"].select("o_orderkey", "o_custkey"), "o_orderkey",
            t["lineitem"].select("l_orderkey"), "l_orderkey",
        ),
        anti_count(
            "customerless_orders",
            t["orders"].select("o_custkey"), "o_custkey",
            t["customer"].select("c_custkey"), "c_custkey",
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# --- q45: recursive CTE — bounded transitive closure in pure SQL ---
Q45_HOPS = 4


def _q45_oracle() -> str:
    from spj_query_engine_spark.operators.dedup import minhash_lsh_pairs_sql

    return f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({minhash_lsh_pairs_sql()})
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, r, d) AS (
      SELECT u, v AS r, 1 AS d FROM edges
      UNION ALL
      SELECT e.u, r.r, r.d + 1 FROM edges e JOIN reach r ON e.v = r.u
      WHERE r.d < {Q45_HOPS}
    )
    SELECT u AS doc_id, LEAST(u, MIN(r)) AS cluster_id FROM reach GROUP BY u
    """


@register(
    "q45_recursive_closure",
    _q45_oracle(),
    doc="WITH RECURSIVE (new in Spark 4) driven end-to-end: min-label "
    "transitive closure within %d hops over the MinHash near-dup pair "
    "graph - Spark's recursive CTE only allows UNION ALL, so cycles are "
    "bounded by an explicit depth column (the same fixed-hop contract as "
    "d07's propagation loop; d09 remains the unbounded-diameter path at "
    "scale); the oracle replays the identical bounded recursion." % Q45_HOPS,
)
def q45_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators import dedup
    from spj_query_engine_spark.operators.core import coarse_materialize

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]

    def build(d: DataFrame) -> DataFrame:
        s = d.sparkSession  # the coarse sub-session when the scope is live
        # Materialize the pair list once: the recursive CTE references the
        # view in both UNION branches and in every recursion step, and each
        # reference would otherwise re-derive the full MinHash pipeline.
        # lsh_pairs_ckpt = the shared coarse-materialized derivation every
        # graph-family entry uses (nested scope no-ops under this one).
        pairs = dedup.lsh_pairs_ckpt(d)
        pairs.createOrReplaceTempView("q45_pairs")
        return s.sql(f"""
        WITH RECURSIVE edges AS (
          SELECT doc_a AS u, doc_b AS v FROM q45_pairs
          UNION ALL
          SELECT doc_b AS u, doc_a AS v FROM q45_pairs
        ),
        reach(u, r, d) AS (
          SELECT u, v AS r, 1 AS d FROM edges
          UNION ALL
          SELECT e.u, r.r, r.d + 1 FROM edges e JOIN reach r ON e.v = r.u
          WHERE r.d < {Q45_HOPS}
        )
        SELECT u AS doc_id, LEAST(u, MIN(r)) AS cluster_id
        FROM reach GROUP BY u
        """)

    # the recursion's per-step join/agg stages materialize under the same
    # coarse scope as the rest of the graph family (no-op at scale)
    return coarse_materialize(build, docs)


# --- q46: PIVOT — wide status × priority report ---


@register(
    "q46_pivot_report",
    """
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_total,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS o_total,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS p_total
    FROM orders GROUP BY o_orderpriority
    """,
    doc="PIVOT: long->wide status x priority report via DataFrame.pivot "
    "with the pivot values enumerated explicitly (no extra "
    "distinct-values job, and the output schema is static - the form "
    "that scales; an unenumerated pivot runs a driver-side DISTINCT "
    "first).  Single shuffle on the groupBy key; each cell is a "
    "conditional aggregate, which is exactly how the oracle replays it "
    "(FILTER clauses).  Missing cells: counts coalesce to 0, sums stay "
    "NULL - matching SQL FILTER semantics on both engines.",
)
def q46_pivot_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec("o_totalprice")).alias("total"))
    )
    cols = [F.col("o_orderpriority")]
    for status in ("F", "O", "P"):
        low = status.lower()
        cols.append(F.coalesce(F.col(f"{status}_n"), F.lit(0)).cast("long").alias(f"{low}_n"))
        cols.append(F.col(f"{status}_total").cast("double").alias(f"{low}_total"))
    return wide.select(*cols)


# --- q47: UNPIVOT/melt — wide->long metric normalization ---


@register(
    "q47_unpivot_metrics",
    """
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS val
    FROM part
    """,
    doc="UNPIVOT (melt): wide part metrics -> long (key, metric, value) "
    "triples via DataFrame.unpivot - the Expand-based inverse of q46's "
    "pivot.  Map-side only: one generator pass per input row, no "
    "shuffle, no join; the oracle replays it as a UNION ALL of "
    "per-metric projections (the relational identity Spark's unpivot "
    "compiles to).",
)
def q47_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, ("part",))["part"]
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# --- q48: TPC-H Q2 shape — cheapest offer per part (correlated scalar MIN) ---


@register(
    "q48_cheapest_offer",
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      FROM lineitem
    ),
    best AS (
      SELECT l_partkey, MIN(price) AS best_price
      FROM offers GROUP BY l_partkey
    ),
    win AS (
      SELECT o.l_partkey, b.best_price, MIN(o.l_suppkey) AS win_suppkey
      FROM offers o JOIN best b
        ON o.l_partkey = b.l_partkey AND o.price = b.best_price
      GROUP BY o.l_partkey, b.best_price
    )
    SELECT p.p_partkey, p.p_name,
           CAST(w.best_price AS DOUBLE) AS best_price,
           s.s_suppkey, s.s_name, n.n_name
    FROM part p
    JOIN win w ON w.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = w.win_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size < 15
    """,
    doc="TPC-H-Q2-shaped correlated scalar subquery (cheapest offer per "
    "part), decorrelated into aggregate-then-rejoin: one groupBy finds "
    "each part's MIN price over the offer fact, an equi-join back on "
    "(partkey, price) recovers the offering rows, MIN(suppkey) breaks "
    "price ties deterministically.  Price kept DECIMAL through every "
    "comparison so the equality rejoin cannot miss on float noise; "
    "part/supplier/nation are broadcast dimensions.  Same two-shuffle "
    "cost at any scale: both aggregates and the rejoin share the "
    "l_partkey key.",
)
def q48_cheapest_offer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation"))
    offers = t["lineitem"].select(
        "l_partkey",
        "l_suppkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    best = offers.groupBy("l_partkey").agg(F.min("price").alias("best_price")).select(
        F.col("l_partkey").alias("b_partkey"), "best_price"
    )
    win = (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("price") == F.col("best_price")),
        )
        .groupBy("l_partkey", "best_price")
        .agg(F.min("l_suppkey").alias("win_suppkey"))
    )
    part = t["part"].filter(F.col("p_size") < 15)
    return (
        win.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("win_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            F.col("best_price").cast("double").alias("best_price"),
            "s_suppkey",
            "s_name",
            "n_name",
        )
    )


# --- q49: TPC-H Q13 shape — customer order-count distribution ---


@register(
    "q49_order_count_distribution",
    """
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'P'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY n_orders
    """,
    doc="TPC-H-Q13-shaped two-level aggregation: LEFT OUTER join with a "
    "non-key residual predicate (status <> 'P' belongs in the JOIN "
    "condition, not WHERE - moving it would silently drop the "
    "zero-order customers), count per customer including the "
    "unmatched zeros, then the distribution of those counts.  The "
    "second groupBy runs over one row per customer - negligible next "
    "to the first shuffle; COUNT(col) vs COUNT(*) distinction carries "
    "the NULL-row semantics on both engines.",
)
def q49_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .join(
            t["orders"],
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderstatus") != "P"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


# --- q50: TPC-H Q8 shape — nation market share by year ---


@register(
    "q50_market_share",
    """
    WITH rev AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             n.n_name,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN volume END) AS DOUBLE)
             AS nation_rev,
           CAST(SUM(volume) AS DOUBLE) AS total_rev,
           CAST(COALESCE(SUM(CASE WHEN n_name = 'NATION_3' THEN volume END), 0)
                AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS share
    FROM rev GROUP BY o_year
    """,
    doc="TPC-H-Q8-shaped market share: one conditional aggregate computes "
    "the focal nation's revenue and the total in a single pass (no "
    "second scan, no self-join), grouped by order year.  Supplier and "
    "nation are broadcast; the only shuffle is the join to orders plus "
    "the final 7-group aggregate.  Both sums stay DECIMAL "
    "(order-independent) until the end; the share ratio is computed on "
    "the already-cast doubles with the identical expression on both "
    "engines, so the IEEE division result is bit-identical.",
)
def q50_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier", "nation"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    rev = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.year(F.col("o_orderdate").cast(T.TimestampType())).cast("int").alias("o_year"),
            "n_name",
            (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("volume"),
        )
    )
    focal = F.when(F.col("n_name") == "NATION_3", F.col("volume"))
    agg = rev.groupBy("o_year").agg(
        F.sum(focal).alias("nat_dec"),
        F.sum("volume").alias("tot_dec"),
    )
    return agg.select(
        "o_year",
        F.col("nat_dec").cast("double").alias("nation_rev"),
        F.col("tot_dec").cast("double").alias("total_rev"),
        (
            F.coalesce(F.col("nat_dec"), F.lit(0).cast("decimal(18,2)")).cast("double")
            / F.col("tot_dec").cast("double")
        ).alias("share"),
    )


# --- q51: skyline (Pareto frontier) — two-phase distributed SFS ---
Q51_BUCKETS = 16


def _q51_oracle() -> str:
    return f"""
    WITH bucketed AS (
      SELECT p_partkey, p_retailprice, p_size,
             p_partkey % {Q51_BUCKETS} AS bkt
      FROM part
    ),
    local_best AS (
      SELECT bkt, p_retailprice, MAX(p_size) AS best_size
      FROM bucketed GROUP BY bkt, p_retailprice
    ),
    local_run AS (
      SELECT *, MAX(best_size) OVER (PARTITION BY bkt ORDER BY p_retailprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cheaper_best
      FROM local_best
    ),
    cand AS (
      SELECT b.p_partkey, b.p_retailprice, b.p_size
      FROM bucketed b
      JOIN local_run r ON r.bkt = b.bkt AND r.p_retailprice = b.p_retailprice
      WHERE b.p_size = r.best_size
        AND (r.cheaper_best IS NULL OR r.cheaper_best < b.p_size)
    ),
    glob_best AS (
      SELECT p_retailprice, MAX(p_size) AS best_size
      FROM cand GROUP BY p_retailprice
    ),
    glob_run AS (
      SELECT *, MAX(best_size) OVER (ORDER BY p_retailprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cheaper_best
      FROM glob_best
    )
    SELECT c.p_partkey, c.p_retailprice, c.p_size
    FROM cand c
    JOIN glob_run g ON g.p_retailprice = c.p_retailprice
    WHERE c.p_size = g.best_size
      AND (g.cheaper_best IS NULL OR g.cheaper_best < c.p_size)
    """


@register(
    "q51_skyline",
    _q51_oracle(),
    doc="Skyline / Pareto frontier (parts no other part beats on BOTH "
    "cheaper price AND larger-or-equal size, strict somewhere) via the "
    "two-phase distributed sort-filter skyline: phase 1 computes a LOCAL "
    "skyline inside each of %d deterministic key buckets (per-bucket "
    "running-max window - all buckets in parallel), phase 2 re-runs the "
    "same filter globally over only the local survivors.  Correct because "
    "skyline(S) = skyline of the union of any partitioning's local "
    "skylines; the naive formulation is a NOT-EXISTS theta self-join "
    "(quadratic - never shipped), and the single global sort-window "
    "would serialize at 100 TB, so only the small survivor set ever "
    "passes through a one-partition window.  Tie semantics: equal "
    "(price, size) points co-survive; any strict improvement kills."
    % Q51_BUCKETS,
)
def q51_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = load_tables(spark, sf_dir, ("part",))["part"]

    def skyline_pass(points: DataFrame, by_bucket: bool) -> DataFrame:
        keys = ["bkt", "p_retailprice"] if by_bucket else ["p_retailprice"]
        best = points.groupBy(*keys).agg(F.max("p_size").alias("best_size"))
        w = (
            Window.partitionBy("bkt") if by_bucket else Window.partitionBy()
        ).orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
        run = best.withColumn("cheaper_best", F.max("best_size").over(w))
        return (
            points.join(run, keys)
            .filter(
                (F.col("p_size") == F.col("best_size"))
                & (
                    F.col("cheaper_best").isNull()
                    | (F.col("cheaper_best") < F.col("p_size"))
                )
            )
            .select("bkt", "p_partkey", "p_retailprice", "p_size")
        )

    bucketed = part.select(
        "p_partkey",
        "p_retailprice",
        "p_size",
        (F.col("p_partkey") % Q51_BUCKETS).alias("bkt"),
    )
    cand = skyline_pass(bucketed, by_bucket=True)
    return skyline_pass(cand, by_bucket=False).select(
        "p_partkey", "p_retailprice", "p_size"
    )


# --- q52: TPC-H Q7 shape — bi-directional nation-pair trade volume ---


@register(
    "q52_nation_trade_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(o.o_orderdate) AS INT) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H-Q7-shaped bi-directional trade volume between two nations "
    "by year: the disjunctive nation-pair predicate sits on two broadcast "
    "nation copies, so it prunes BEFORE the fact joins widen anything; "
    "supplier/customer broadcast, the orders join is the only big "
    "shuffle, and the final rollup has 2 x years groups.  Decimal "
    "volume end to end.",
)
def q52_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "supplier", "customer", "nation")
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    shipping = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year(F.col("o_orderdate").cast(T.TimestampType()))
            .cast("int")
            .alias("l_year"),
            (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("volume"),
        )
    )
    return shipping.groupBy("supp_nation", "cust_nation", "l_year").agg(
        F.sum("volume").cast("double").alias("revenue")
    )


# --- q53: TPC-H Q18 shape — large orders via aggregated semi-join ---
Q53_MIN_QTY = 250


@register(
    "q53_large_orders",
    f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {Q53_MIN_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           epoch_ms(o.o_orderdate) AS o_orderdate_ms,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN big ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="TPC-H-Q18-shaped large-order report: the IN-subquery over a "
    "HAVING aggregate becomes a semi join against the per-order quantity "
    "rollup (id-only frame), then the surviving orders re-join lineitem "
    "for the display aggregate - both aggregates and both fact joins "
    "share the l_orderkey shuffle key, so AQE chains them without "
    "re-partitioning; quantities stay DECIMAL through the HAVING "
    "comparison." % (),
)
def q53_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    decq = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(decq).alias("qty"))
        .filter(F.col("qty") > Q53_MIN_QTY)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["orders"]
        .join(big, F.col("big_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(decq).cast("double").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            unix_millis_col("o_orderdate").alias("o_orderdate_ms"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


# --- q54: EXCEPT ALL / INTERSECT ALL — bag-semantics set operations ---


@register(
    "q54_bag_set_ops",
    """
    WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
         b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
         x AS (SELECT 'except_all' AS op, o_custkey FROM (
                 SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)),
         y AS (SELECT 'intersect_all' AS op, o_custkey FROM (
                 SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b))
    SELECT op, o_custkey, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM x UNION ALL SELECT * FROM y)
    GROUP BY op, o_custkey
    """,
    doc="EXCEPT ALL / INTERSECT ALL - the BAG-semantics set operations "
    "(q25/q26 cover the DISTINCT forms): multiplicities subtract / take "
    "the minimum per value instead of collapsing, which Spark plans as a "
    "single count-compare aggregate per side (no join, no distinct "
    "pass); rolled up to (value, multiplicity) so the hash compare is "
    "order-free.",
)
def q54_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    ex = a.exceptAll(b).select(F.lit("except_all").alias("op"), "o_custkey")
    ix = a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "o_custkey")
    return (
        ex.unionByName(ix)
        .groupBy("op", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- q55: TPC-H Q5 shape — local supplier volume per nation ---


@register(
    "q55_local_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE' AND year(o_orderdate) = 1997
    GROUP BY n_name
    """,
    doc="TPC-H-Q5-shaped local-supplier volume: six-way join where the "
    "customer must share the supplier's nation (the c_nationkey = "
    "s_nationkey condition rides the customer join as a second equi-key, "
    "never a post-filter).  region -> nation -> supplier collapse into "
    "one broadcast chain BEFORE touching a fact table, so the region "
    "filter prunes suppliers map-side; the year filter pushes to the "
    "orders scan.  Only two shuffles survive at scale: lineitem x orders "
    "on orderkey and the customer join on custkey.",
)
def q55_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    nat = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    sup = t["supplier"].join(
        F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey")
    )
    ord_f = t["orders"].filter(
        F.year(F.col("o_orderdate").cast(T.TimestampType())) == 1997
    )
    return (
        t["lineitem"]
        .join(ord_f, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            t["customer"],
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


# --- q56: TPC-H Q6 shape — forecast revenue change (pure filter + agg) ---


@register(
    "q56_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
    doc="TPC-H-Q6-shaped forecast-revenue: the canonical "
    "pushdown/pruning showcase - zero joins, every predicate (ship-year "
    "range, discount band, quantity cap) reaches the parquet scan as a "
    "PushedFilter over row-group min/max stats, and only four of the "
    "sixteen lineitem columns are read.  The aggregate is a map-side "
    "partial SUM on exact decimals; one row crosses the exchange per "
    "task.  Double literals compare bit-identically in both engines "
    "(same parquet bits, same literal parse).",
)
def q56_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    ship = F.col("l_shipdate").cast(T.TimestampType())
    return (
        li.filter(
            (ship >= F.lit("1997-01-01").cast(T.TimestampType()))
            & (ship < F.lit("1998-01-01").cast(T.TimestampType()))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- q57: TPC-H Q12 shape — late-shipment priority counts ---


@register(
    "q57_late_ship_priority",
    """
    SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY year(l_shipdate)
    """,
    doc="TPC-H-Q12-shaped late-shipment report: the cross-table residual "
    "(shipped more than 60 days after ordering) cannot push below the "
    "join, so it rides the join as a post-condition on the single "
    "orderkey shuffle; the high/low priority split is a pair of "
    "conditional COUNT aggregates in ONE pass (no second scan, no "
    "pivot job).  Output is bounded by distinct ship years.",
)
def q57_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    ship = F.col("l_shipdate").cast(T.TimestampType())
    odate = F.col("o_orderdate").cast(T.TimestampType())
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(ship > odate + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year(ship).cast("int").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_count"),
        )
    )


# --- q58: TPC-H Q14 shape — promotion revenue share ---


@register(
    "q58_promo_revenue",
    """
    WITH s AS (
      SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
               AS promo_rev,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS total_rev
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
    )
    SELECT promo_rev, total_rev, 100.0 * promo_rev / total_rev AS promo_pct
    FROM s
    """,
    doc="TPC-H-Q14-shaped promotion-effect: promo and total revenue in one "
    "conditional-aggregate pass over the month's lineitem x part join "
    "(q50's single-pass trick); the month filter pushes to the fact "
    "scan so the join only sees ~1/36 of lineitem.  Both sums stay "
    "DECIMAL until the end; the percentage divides the already-cast "
    "doubles with the same literal-first expression order in both "
    "engines, so the IEEE result is bit-identical.",
)
def q58_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    ship = F.col("l_shipdate").cast(T.TimestampType())
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    agg = (
        t["lineitem"]
        .filter(
            (ship >= F.lit("1997-03-01").cast(T.TimestampType()))
            & (ship < F.lit("1997-04-01").cast(T.TimestampType()))
        )
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", vol)).alias("promo_dec"),
            F.sum(vol).alias("total_dec"),
        )
    )
    return agg.select(
        F.col("promo_dec").cast("double").alias("promo_rev"),
        F.col("total_dec").cast("double").alias("total_rev"),
        (
            F.lit(100.0)
            * F.col("promo_dec").cast("double")
            / F.col("total_dec").cast("double")
        ).alias("promo_pct"),
    )


# --- q59: TPC-H Q15 shape — top supplier by quarterly revenue ---


@register(
    "q59_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
    FROM supplier JOIN rev ON l_suppkey = s_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    doc="TPC-H-Q15-shaped top supplier: the correlated MAX-of-aggregate "
    "view decorrelated into aggregate -> single-row MAX -> broadcast "
    "scalar compare (q36's threshold pattern).  The quarter filter "
    "pushes to the scan; revenue stays DECIMAL through the equality "
    "test so ties are exact, never float-fuzzy; the supplier dimension "
    "joins the handful of max rows by broadcast.",
)
def q59_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    ship = F.col("l_shipdate").cast(T.TimestampType())
    rev = (
        t["lineitem"]
        .filter(
            (ship >= F.lit("1997-01-01").cast(T.TimestampType()))
            & (ship < F.lit("1997-04-01").cast(T.TimestampType()))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias(
                "total_rev_dec"
            )
        )
    )
    best = rev.agg(F.max("total_rev_dec").alias("best_rev"))
    return (
        rev.join(F.broadcast(best), F.col("total_rev_dec") == F.col("best_rev"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_rev"),
        )
    )


# --- q60: TPC-H Q19 shape — disjunctive bracketed predicates ---


@register(
    "q60_bracket_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15
           AND l_quantity BETWEEN 1  AND 15)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 45)
    """,
    doc="TPC-H-Q19-shaped disjunctive brackets: three (brand, size-range, "
    "quantity-range) alternatives OR'd together across BOTH join sides.  "
    "Catalyst's extra-predicate extraction derives the part-only "
    "disjunction (brand/size terms) and the lineitem-only quantity "
    "disjunction and pushes each below the join, so both scans prune "
    "before any row pairs up - the optimization this shape exists to "
    "test; the full predicate then re-applies as the join residual.",
)
def q60_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    qty = F.col("l_quantity")
    size = F.col("p_size")
    bracket = (
        ((F.col("p_brand") == "Brand#1") & size.between(1, 15) & qty.between(1, 15))
        | ((F.col("p_brand") == "Brand#12") & size.between(10, 30) & qty.between(10, 30))
        | ((F.col("p_brand") == "Brand#23") & size.between(20, 50) & qty.between(20, 45))
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(bracket)
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- q61: TPC-H Q9 shape — nation profit by year ---


@register(
    "q61_nation_profit",
    """
    SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    - CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_type = 'STANDARD'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="TPC-H-Q9-shaped profit rollup (ps_supplycost has no analog table, "
    "so cost = quantity x part list price - the same per-row "
    "revenue-minus-cost expression shape).  The p_type filter prunes "
    "part BEFORE its join, making it broadcast-size alongside supplier "
    "and nation; orders is the one big shuffle.  Both product terms are "
    "exact decimals, their difference sums order-independently - no "
    "float drift across five joins and a two-key rollup.",
)
def q61_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ("lineitem", "part", "supplier", "orders", "nation")
    )
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    profit_term = dec("l_extendedprice") * (F.lit(1) - dec("l_discount")) - dec(
        "l_quantity"
    ) * dec("p_retailprice")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "STANDARD")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            "n_name",
            F.year(F.col("o_orderdate").cast(T.TimestampType()))
            .cast("int")
            .alias("o_year"),
        )
        .agg(F.sum(profit_term).cast("double").alias("profit"))
    )


# --- q62: TPC-H Q11 shape — groups above a fraction of the global total ---


@register(
    "q62_important_nations",
    """
    WITH vals AS (
      SELECT n_name,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS nat_rev
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      GROUP BY n_name
    ),
    tot AS (SELECT SUM(nat_rev) AS tot_rev FROM vals)
    SELECT n_name, CAST(nat_rev AS DOUBLE) AS nat_rev
    FROM vals CROSS JOIN tot
    WHERE nat_rev * 20 > tot_rev
    """,
    doc="TPC-H-Q11-shaped 'important subset' (no partsupp table exists, so "
    "the measure is supplier-nation revenue): per-group aggregate kept "
    "only when it exceeds a FRACTION of the global total - the "
    "HAVING-against-scalar-subquery shape.  The global total derives "
    "from the per-group rollup (25 rows), not a second fact scan; the "
    "fraction test multiplies out (nat_rev * 20 > tot) so the compare "
    "stays exact DECIMAL - no float threshold can flip a boundary "
    "nation.  One fact shuffle total; nation/supplier broadcast.",
)
def q62_important_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    vals = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias(
                "nat_rev_dec"
            )
        )
    )
    tot = vals.agg(F.sum("nat_rev_dec").alias("tot_rev"))
    return (
        vals.crossJoin(F.broadcast(tot))
        .filter(F.col("nat_rev_dec") * 20 > F.col("tot_rev"))
        .select("n_name", F.col("nat_rev_dec").cast("double").alias("nat_rev"))
    )


# --- q63: dynamic partition pruning over a hive-partitioned fact ---

from spj_query_engine_spark.operators.scale import dpp_priority_rollup_sql


@register(
    "q63_dpp_join",
    dpp_priority_rollup_sql(),
    doc="Dynamic Partition Pruning: fact rewritten hive-partitioned on "
    "the join key, joined to a small filtered dim - the fact filter is "
    "unknown at planning time, so Spark injects a runtime dynamicpruning "
    "subquery into the scan and opens ONLY surviving directories "
    "(asserted in plan hygiene).  m05 is the static variant; this is "
    "the star-join lever at a partitioned 100 TB lake.",
    bench=False,  # dominated by the partitioned rewrite, not scan throughput
)
def q63_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.operators.scale import dpp_priority_rollup

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    return dpp_priority_rollup(spark, orders)


# --- q64: extended-grammar window functions through the dialect front-end ---


register(
    "q64_ext_window",
    """
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate) AS DOUBLE)
             AS sum_o_totalprice
    FROM orders
    """,
    doc="Extended grammar's OVER clause end-to-end: AGG(attr) OVER "
    "(PARTITIONBY ... ORDERBY ...) parsed by the dialect front-end and "
    "planned as an analytic window (running per-customer revenue, the "
    "q30 shape but arriving through SQL text).  The RANGE-frame default "
    "makes date-tied rows peers in BOTH engines, and the running sum "
    "rides DECIMAL inside the frame - order within the peer group can "
    "never change the value.  Strict mode still rejects OVER, pinned by "
    "tests/test_dialect_extended.py.",
)(
    extended_dialect_query(
        "SELECT orders.o_orderkey, orders.o_custkey, "
        "SUM(orders.o_totalprice) OVER (PARTITIONBY orders.o_custkey "
        "ORDERBY orders.o_orderdate) FROM orders"
    )
)


# --- q65: extended-grammar explicit LEFT JOIN through the dialect front-end ---


register(
    "q65_ext_left_join",
    """
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS count_o_orderkey
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    doc="Extended grammar's explicit-join syntax end-to-end: FROM customer "
    "LEFT JOIN orders ON ... parsed into a left-deep join chain and "
    "planned with the outer semantics preserved (q21's shape arriving "
    "through SQL text; zero-order customers keep their row, COUNT(col) "
    "counts non-NULL).  In explicit-join mode WHERE applies AFTER the "
    "joins - standard SQL - while Catalyst still pushes what is safe.  "
    "Strict mode rejects JOIN/ON, pinned in tests.",
)(
    extended_dialect_query(
        "SELECT customer.c_custkey, COUNT(orders.o_orderkey) FROM customer "
        "LEFT JOIN orders ON customer.c_custkey = orders.o_custkey "
        "GROUPBY customer.c_custkey"
    )
)


from spj_query_engine_spark.operators import recommend


@register(
    "g06_copurchase",
    recommend.copurchase_topk_sql(),
    doc="Item-item co-purchase recommendations (Linden et al. 2003): "
    "top-%d co-occurring parts per part from order baskets - the "
    "market-basket shape as bounded equi-joins (basket cap %d, support "
    ">= %d before the ranking window); the inverted-index anatomy of d05 "
    "with baskets as posting lists."
    % (recommend.CO_TOP, recommend.BASKET_CAP, recommend.CO_MIN),
)
def g06_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return recommend.copurchase_topk(li)


# --- q66: correlated scalar subquery (decorrelated to a join by design) ---


@register(
    "q66_correlated_subquery",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE CAST(s.s_acctbal AS DECIMAL(18,2)) *
          (SELECT COUNT(*) FROM supplier s2
           WHERE s2.s_nationkey = s.s_nationkey)
        > (SELECT SUM(CAST(s2.s_acctbal AS DECIMAL(18,2))) FROM supplier s2
           WHERE s2.s_nationkey = s.s_nationkey)
    """,
    doc="Correlated scalar subquery: suppliers above their own nation's "
    "average balance.  The engine runs the DECORRELATED plan every "
    "optimizer rewrites the textbook correlated form to - one per-nation "
    "aggregate (25 rows, broadcast) joined back to the supplier scan - "
    "while the oracle keeps the TEXTBOOK CORRELATED formulation, so the "
    "gate genuinely checks decorrelation equivalence rather than two "
    "copies of one rewrite.  Both sides multiply out the threshold "
    "compare (bal * n > sum) in DECIMAL so no float average can flip a "
    "boundary supplier (avg() would compare in DOUBLE and could disagree "
    "within one ulp); output echoes raw doubles only.  One supplier scan "
    "+ one broadcast join at any scale.",
)
def q66_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("supplier", "nation"))
    dec = F.col("s_acctbal").cast("decimal(18,2)")
    per_nation = (
        t["supplier"]
        .groupBy("s_nationkey")
        .agg(
            F.sum(dec).alias("bal_sum"),
            F.count(F.lit(1)).alias("n_sup"),
        )
        .withColumnRenamed("s_nationkey", "agg_nationkey")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(per_nation),
            F.col("s_nationkey") == F.col("agg_nationkey"),
        )
        .filter(dec * F.col("n_sup") > F.col("bal_sum"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )


# --- q67: null-safe equality join (<=> / IS NOT DISTINCT FROM) ---


@register(
    "q67_null_safe_join",
    """
    WITH keyed AS (
      SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_key FROM orders
    ),
    dim AS (SELECT DISTINCT status_key FROM keyed)
    SELECT COALESCE(d.status_key, '<null>') AS status_label,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM keyed k JOIN dim d ON k.status_key IS NOT DISTINCT FROM d.status_key
    GROUP BY 1
    """,
    doc="NULL-SAFE equality join: order rows keyed by NULLIF(status, 'P') "
    "join a distinct-key dim under <=> semantics (Spark eqNullSafe, SQL "
    "IS NOT DISTINCT FROM), so the NULL group SURVIVES the join - a "
    "plain equi-join silently drops every NULL-key row (pinned by test). "
    "The null-key group is first-class in the rollup; one broadcast join.",
)
def q67_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    keyed = orders.select(
        "o_orderkey",
        F.expr("NULLIF(o_orderstatus, 'P')").alias("status_key"),
    )
    dim = keyed.select("status_key").distinct().withColumnRenamed(
        "status_key", "dim_key"
    )
    return (
        keyed.join(F.broadcast(dim), F.col("status_key").eqNullSafe(F.col("dim_key")))
        .groupBy(F.coalesce(F.col("dim_key"), F.lit("<null>")).alias("status_label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )

"""Scale levers: bucketed co-located joins and salted skew joins.

The reference's only answer to join cost is its buffer-count cost model and
the Grace hash join's recursive re-partitioning overflow path
(``src/qp/optimizer/PlanCost.java:152-166``, ``src/qp/operators/HashJoin.java:
480-506`` in ``/root/reference/``).  At cluster scale the equivalents are:

* **Bucketing** — pre-shuffle a table once at write time (``bucketBy`` on the
  join key); every later join/aggregation on that key reads co-located
  buckets and skips its Exchange entirely.  This is the amortize-the-shuffle
  lever for fact tables joined repeatedly on the same key.
* **Salting** — when one key value is hot enough that AQE's skew splitting
  isn't available (e.g. disabled, or the skew is in an aggregation), spread
  the hot rows over ``n`` sub-keys and replicate the other side ``n``×.

Both preserve exact join semantics; tests assert result equality against the
plain join and inspect the physical plan for the absent/added exchanges.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    num_buckets: int = 32,
    sort_keys: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.  A
    join or groupBy on ``keys`` between two tables bucketed with the same
    bucket count then plans with NO Exchange on either side — the shuffle
    happened once, at write time."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # an orphaned warehouse dir (table written by a previous session, no
    # catalog entry in this one) blocks saveAsTable — clear it
    import shutil

    try:
        loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        shutil.rmtree(
            os.path.join(loc.removeprefix("file:"), name.lower()), ignore_errors=True
        )
    except Exception:
        pass
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    writer = writer.sortBy(*(sort_keys or keys))
    writer.format("parquet").saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_name: str, right_name: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys."""
    return spark.table(left_name).join(spark.table(right_name), on=on)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the left (skewed) side salted across ``n_salts``
    sub-keys and the right side replicated ``n_salts``×.

    The salt is a deterministic hash of the whole left row, so any one hot
    key value fans out over ``n_salts`` reducers instead of one.  Replication
    multiplies the right side's shuffle volume by ``n_salts`` — the standard
    trade: pay n× on the small side to split the hot partition on the big
    side.  Result is exactly the plain ``left.join(right, key)``.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("__salt__", salt.cast("int"))
    r_replicated = right.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = l_salted.join(
        r_replicated,
        (l_salted[left_key] == r_replicated[right_key])
        & (l_salted["__salt__"] == r_replicated["__salt__"]),
    )
    return joined.drop("__salt__")


def exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle exchanges in the (non-adaptive-finalized) physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Persist ``df`` hive-partitioned by ``partition_cols`` — one
    directory per partition value.  A later read whose filter hits a
    partition column never opens the pruned directories at all
    (PartitionFilters in the scan node, zero I/O for pruned values) —
    the coarsest and cheapest data-skipping lever at 100 TB, where a
    day-partitioned event lake turns a one-day query into a 1/365 scan.

    Partition columns should be LOW cardinality (dates, regions, types):
    each distinct value is a directory, and a high-cardinality partition
    key degenerates into millions of tiny files."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def partition_filters_in_plan(df: DataFrame) -> str:
    """The PartitionFilters clause of the scan node ('' if absent) —
    lets tests assert a filter became directory pruning, not row
    filtering."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            i = line.index("PartitionFilters")
            return line[i:].split("]", 1)[0] + "]"
    return ""


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of ``cols`` (each first clamped into
    ``bits`` bits): bit *j* of column *i* lands at position
    ``j * len(cols) + i`` of the result.  Sorting or range-partitioning
    by this single value keeps rows that are close in EVERY dimension
    close in file order, so per-file min/max column statistics become
    tight on ALL interleaved columns at once — multi-dimensional data
    skipping from one sort, where sorting by ``(a, b)`` alone leaves
    ``b``'s per-file ranges as wide as the domain.

    Pure bit arithmetic (shifts + masks over longs), whole-stage codegen,
    no UDF; inputs must be non-negative integers already scaled to the
    ``bits`` range (callers bucket/scale first)."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        clamped = F.greatest(F.lit(0), F.least(c.cast("long"), F.lit((1 << bits) - 1)))
        for j in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(clamped, j).bitwiseAND(F.lit(1)), j * n + i
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered by the
    Z-order value of ``cols``: ``repartitionByRange`` on the interleaved
    key (one range shuffle) then per-file sort.  Readers filtering on ANY
    of ``cols`` skip most files via parquet min/max row-group stats —
    the OPTIMIZE ZORDER BY of lakehouse table formats, expressed with
    stock Spark writes."""
    z = zorder_value([F.col(c) for c in cols], bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


DPP_DIR = "/tmp/spj_dpp_lake"
DPP_PRIORITIES = ("1-URGENT", "2-HIGH")


def dpp_priority_rollup(
    spark,
    orders: DataFrame,
    priorities: tuple[str, ...] = DPP_PRIORITIES,
    path: str = DPP_DIR,
) -> DataFrame:
    """Dynamic Partition Pruning end-to-end (q63): the fact table is
    rewritten hive-partitioned on the join key, then joined to a small
    filtered dimension — at planning time the fact filter is UNKNOWN (it
    comes from the dim rows), so static directory pruning can't apply;
    Spark's DPP instead injects a runtime subquery filter into the fact
    scan (``PartitionFilters: [... dynamicpruning ...]``, asserted in plan
    hygiene), executes the broadcast dim first, and opens ONLY the fact
    directories whose partition value survived the dim filter.

    This is the lever that makes star joins over a day/region/type
    partitioned 100 TB lake scan 1/N of the data without the query author
    writing the partition predicate by hand; m05 shows the STATIC variant
    (literal filter → planning-time pruning), this entry the dynamic one.
    The rewrite happens per call so the entry stays self-contained per
    scale factor."""
    write_partitioned(orders, path, ["o_orderpriority"])
    # explicit read schema (partition column last): a zero-row partitioned
    # write leaves no data files, and inference on it would throw instead
    # of returning the well-defined empty rollup (m05's convention)
    from pyspark.sql import types as T

    lake_schema = T.StructType(
        [f for f in orders.schema.fields if f.name != "o_orderpriority"]
        + [orders.schema["o_orderpriority"]]
    )
    fact = spark.read.schema(lake_schema).parquet(path)
    # the dim side must carry a real Filter node for DPP to judge the
    # pruning subquery worthwhile — a literal LocalRelation has none, so
    # the dim is a filtered (tiny, broadcast) scan of the priority domain
    dim = (
        orders.filter(F.col("o_orderpriority").isin(*priorities))
        .select(F.col("o_orderpriority").alias("pri"))
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), F.col("o_orderpriority") == F.col("pri"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


def dpp_priority_rollup_sql(
    table: str = "orders", priorities: tuple[str, ...] = DPP_PRIORITIES
) -> str:
    in_list = ", ".join(f"'{p}'" for p in priorities)
    return f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM {table}
    WHERE o_orderpriority IN ({in_list})
    GROUP BY o_orderpriority
    """

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

"""Custom Python DataSource (Spark 4's ``pyspark.sql.datasource`` API) —
the extension point that lets this engine ingest formats Spark has no
built-in reader for (proprietary logs, REST pages, message queues) with
proper PARTITION-level parallelism: the driver plans ``InputPartition``
splits, executors call ``read(partition)`` independently, and the rows
enter the plan as a normal scan节点 feeding codegen.

The reference's ``ConvertTxtToTbl`` is a single-process file converter
(SURVEY.md §2); this is its Spark-native generalization: any Python
iterator becomes a distributed table.  The concrete source here is a
deterministic Knuth-multiplicative-hash table (seeded, splittable at any
partition count — same rows on any layout) so the DuckDB oracle can replay
it exactly; a real deployment swaps ``read`` for its format parser and
keeps the partitioning contract.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

KNUTH = 2654435761
MOD = 1000003


class DetRangeDataSource(DataSource):
    """``spark.read.format("detrange").option("n", N).option("parts", P)``."""

    @classmethod
    def name(cls) -> str:
        return "detrange"

    def schema(self) -> str:
        return "id bigint, val bigint"

    def reader(self, schema) -> "DetRangeReader":  # noqa: ANN001
        return DetRangeReader(self.options)


class DetRangeReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):  # noqa: ANN001
        i = partition.value
        for k in range(i, self.n, self.parts):
            yield (k, (k * KNUTH) % MOD)


def register_detrange(spark) -> None:  # noqa: ANN001
    """Idempotent registration (re-registering the same name raises)."""
    try:
        spark.dataSource.register(DetRangeDataSource)
    except Exception:
        pass


def detrange_rollup(spark, n: int = 2000, parts: int = 8):  # noqa: ANN001
    """The registered u05 entry: read the custom source and roll up by
    val % 10 — proving rows flow from Python partitions through a normal
    shuffle/aggregate plan."""
    from pyspark.sql import functions as F

    register_detrange(spark)
    df = (
        spark.read.format("detrange")
        .option("n", n)
        .option("parts", parts)
        .load()
    )
    return df.groupBy((F.col("val") % 10).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("id").alias("sum_id"),
        F.sum("val").alias("sum_val"),
    )


def detrange_rollup_sql(n: int = 2000) -> str:
    return f"""
    WITH t AS (
      SELECT i AS id, (i * {KNUTH}) % {MOD} AS val
      FROM (SELECT unnest(range(0, {n})) AS i)
    )
    SELECT val % 10 AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(val) AS BIGINT) AS sum_val
    FROM t GROUP BY 1
    """

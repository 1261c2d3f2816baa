"""Custom Python DataSource (Spark 4's ``pyspark.sql.datasource`` API) —
the extension point that lets this engine ingest formats Spark has no
built-in reader for (proprietary logs, REST pages, message queues) with
proper PARTITION-level parallelism: the driver plans ``InputPartition``
splits, executors call ``read(partition)`` independently, and the rows
enter the plan as a normal scan node feeding codegen.

The reference's ``ConvertTxtToTbl`` is a single-process file converter
(SURVEY.md §2); this is its Spark-native generalization: any Python
iterator becomes a distributed table.  The concrete source here is a
deterministic Knuth-multiplicative-hash table (seeded, splittable at any
partition count — same rows on any layout) so the DuckDB oracle can replay
it exactly; a real deployment swaps ``read`` for its format parser and
keeps the partitioning contract.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

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
    from spj_query_engine_spark.session import ensure_active_session

    # user-defined source lookup goes through the JVM ACTIVE session's
    # DataSourceManager (see ensure_active_session) — pin it to the session
    # we register on, or the source can be invisible at save()/load() time
    ensure_active_session(spark)
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


# ---------------------------------------------------------------------------
# Python DataSource SINK (u08) — the writer half of the extension surface
# ---------------------------------------------------------------------------


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonlsink").option("path", dir).save()`` — a
    custom Python WRITER (Spark 4 ``DataSourceWriter``): every task writes
    its partition to one JSONL file and returns a picklable commit message;
    the driver sees all commits in ``commit()``.  This is the sink-side
    twin of ``detrange`` (u05): together they prove the full custom-format
    ROUND TRIP — any Python serializer becomes a distributed, task-parallel
    writer with the same contract a real connector (message queue, REST
    batch upload, proprietary format) would implement."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite):  # noqa: ANN001
        return JsonlSinkWriter(self.options, overwrite=overwrite)


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool = False) -> None:  # noqa: ANN001
        import uuid

        self.path = str(options["path"])
        # mode('overwrite') must actually replace: with job-unique part
        # names an overwrite that only adds files would silently behave as
        # append (prior jobs' parts remain, read-back double-counts).  The
        # flag is honored DRIVER-SIDE in commit(): only after every task
        # succeeded are pre-existing final files from other jobs removed —
        # tasks never delete, so a failed job leaves the old data intact.
        self.overwrite = bool(overwrite)
        # Job-unique token baked into every final file name (the writer is
        # constructed once per job on the driver and pickled to tasks).  A
        # second mode('append') save to the same directory therefore ADDS
        # part files instead of silently overwriting the previous job's;
        # within one job, retried/speculated attempts of a partition still
        # converge on the same deterministic name.
        self.job_token = uuid.uuid4().hex[:12]

    def write(self, iterator):  # noqa: ANN001
        import json
        import os
        import uuid

        from pyspark import TaskContext

        # (partition, job)-DETERMINISTIC final name, written via a
        # task-attempt-unique temp file + atomic os.replace: a retried or
        # speculated attempt converges on the same file instead of leaving a
        # duplicate part that would double-count rows in the read-back; a
        # failed attempt leaves only a *.tmp the read-back never sees (and
        # commit()/abort() sweep).
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        final = os.path.join(
            self.path, f"part-{pid:05d}-{self.job_token}.jsonl"
        )
        tmp = f"{final}.{uuid.uuid4().hex}.tmp"
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        if n == 0:
            os.remove(tmp)  # spark.read.json chokes on 0-byte files
        else:
            os.replace(tmp, final)
        return WriterCommitMessage()

    def _sweep_tmp(self) -> None:
        import glob
        import os

        # Scope the sweep to THIS job's temp files (the token is embedded in
        # every final-and-temp name).  Append-into-a-shared-directory is the
        # advertised pattern, so a global '*.tmp' sweep could delete a
        # concurrent job's in-flight temp mid-write.
        pat = os.path.join(self.path, f"part-*-{self.job_token}.jsonl.*.tmp")
        for fn in glob.glob(pat):
            try:
                os.remove(fn)
            except OSError:
                pass

    def commit(self, messages) -> None:  # noqa: ANN001
        """Driver-side success hook: a retried task inside a SUCCESSFUL job
        can still leave its first attempt's *.tmp behind — sweep here too,
        not just on abort, so readers globbing the directory never see
        partial rows.  For mode('overwrite'), this is also where prior
        jobs' final part files are replaced: deletion happens only after
        the whole job succeeded, never in tasks."""
        self._sweep_tmp()
        if self.overwrite:
            import glob
            import os

            suffix = f"-{self.job_token}.jsonl"
            for fn in glob.glob(os.path.join(self.path, "*.jsonl")):
                if not fn.endswith(suffix):
                    try:
                        os.remove(fn)
                    except OSError:
                        pass

    def abort(self, messages) -> None:  # noqa: ANN001
        """Driver-side failure hook: sweep any in-flight temp files so an
        aborted write leaves the target directory clean."""
        self._sweep_tmp()


def register_jsonlsink(spark) -> None:  # noqa: ANN001
    from spj_query_engine_spark.session import ensure_active_session

    # user-defined source lookup goes through the JVM ACTIVE session's
    # DataSourceManager (see ensure_active_session) — pin it to the session
    # we register on, or the source can be invisible at save()/load() time
    ensure_active_session(spark)
    try:
        spark.dataSource.register(JsonlSinkDataSource)
    except Exception:
        pass


def sink_roundtrip_rollup(spark, docs):  # noqa: ANN001
    """u08's query: shard documents' (doc_id, n_chars) by ``doc_id % 8``,
    push them through the Python JSONL sink, read the files back with the
    built-in json reader, and roll up per shard — byte-for-byte roundtrip
    proof whose output is independent of task layout (the rollup ignores
    which task wrote which file).  The oracle computes the same rollup
    straight from the table.

    The roundtrip is MATERIALIZED here (write, read-back, 8-row rollup,
    collect) so the scratch directory can be deleted before returning; a
    lazy read-back would pin the temp dir for the caller's lifetime and
    leak one ``spj_u08_*`` dir per invocation.  The returned frame is the
    8-row local relation; the distributed work already happened."""
    import shutil
    import tempfile

    register_jsonlsink(spark)
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="spj_u08_")
    try:
        (
            docs.select(
                "doc_id", F.pmod(F.col("doc_id"), F.lit(8)).alias("shard"), "n_chars"
            )
            .repartition(8, "shard")
            .write.format("jsonlsink")
            .option("path", out)
            .mode("append")
            .save()
        )
        # explicit schema: zero input rows leave no files behind (the writer
        # deletes empties) and inference would fail on the bare directory.
        # pathGlobFilter pins the read-back to committed part files — a
        # straggling *.tmp (however it survived) can never double-count.
        back = (
            spark.read.schema("doc_id long, shard long, n_chars long")
            .option("pathGlobFilter", "*.jsonl")
            .json(out)
        )
        rollup = (
            back.groupBy("shard")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("total_chars"),
                F.sum("doc_id").cast("long").alias("id_sum"),
            )
            .select(
                F.col("shard").cast("long").alias("shard"),
                "n_docs", "total_chars", "id_sum",
            )
        )
        rows = rollup.collect()  # ≤ 8 rows — the shard count, not the data
        schema = rollup.schema
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def sink_roundtrip_rollup_sql(table: str = "documents") -> str:
    return f"""
    SELECT CAST(doc_id % 8 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM {table}
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Python DataSource STREAM reader (u09) — the streaming third of the
# extension surface (u05 batch read, u08 write, this micro-batch read)


class DetStreamDataSource(DataSource):
    """``spark.readStream.format("detstream").option("n", N)`` — the same
    deterministic Knuth-hash table as u05, delivered as a micro-batch
    STREAM through Spark 4's ``SimpleDataSourceStreamReader``: offsets are
    row positions, each batch serves ``batch`` rows, and offset-range
    replay (``readBetweenOffsets``) makes the source exactly-once
    restartable — the contract a real queue/CDC-feed connector
    implements.  Bounded at ``n`` so harness runs terminate."""

    @classmethod
    def name(cls) -> str:
        return "detstream"

    def schema(self) -> str:
        return "id bigint, val bigint"

    def simpleStreamReader(self, schema):  # noqa: ANN001
        return DetStreamReader(self.options)


class DetStreamReader:
    def __init__(self, options) -> None:  # noqa: ANN001
        self.n = int(options.get("n", 3000))
        self.batch = int(options.get("batch", 700))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, start: int, end: int):
        # a LIST, not a generator: the prefetch cache copy.copy()s the
        # iterator between planPartitions calls, and generators don't pickle
        return [(k, (k * KNUTH) % MOD) for k in range(start, end)]

    def read(self, start):  # noqa: ANN001
        pos = start["pos"]
        end = min(pos + self.batch, self.n)
        return iter(self._rows(pos, end)), {"pos": end}

    def readBetweenOffsets(self, start, end):  # noqa: ANN001
        return self._rows(start["pos"], end["pos"])

    def commit(self, end) -> None:  # noqa: ANN001
        pass


def register_detstream(spark) -> None:  # noqa: ANN001
    from spj_query_engine_spark.session import ensure_active_session

    # user-defined source lookup goes through the JVM ACTIVE session's
    # DataSourceManager (see ensure_active_session) — pin it to the session
    # we register on, or the source can be invisible at save()/load() time
    ensure_active_session(spark)
    try:
        spark.dataSource.register(DetStreamDataSource)
    except Exception:
        pass


def detstream_rollup(spark, n: int = 3000, batch: int = 700):  # noqa: ANN001
    """u09: drive the Python stream source to completion (memory sink,
    complete mode) and roll up by val % 10 — same aggregate anatomy as
    u05, proving rows flow from Python micro-batches through a stateful
    streaming aggregate.  ~ceil(n/batch) micro-batches."""
    import uuid

    from pyspark.sql import functions as F

    register_detstream(spark)
    stream = (
        spark.readStream.format("detstream")
        .option("n", n)
        .option("batch", batch)
        .load()
    )
    agg = stream.groupBy((F.col("val") % 10).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("id").alias("sum_id"),
        F.sum("val").alias("sum_val"),
    )
    name = f"detstream_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def detstream_rollup_sql(n: int = 3000) -> str:
    return detrange_rollup_sql(n)

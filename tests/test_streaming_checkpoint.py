"""Checkpoint recovery: a streaming query stopped mid-input and RESTARTED
from its checkpoint must (a) not reprocess data it already committed
(exactly-once over foreachBatch appends) and (b) end in exactly the state
the uninterrupted batch query computes — the fault-tolerance contract that
makes the streaming surface trustworthy on a real cluster, where executor
loss and redeploys are routine."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import Window

from spj_query_engine_spark.catalog import load_tables

SF_DIR = "/root/testdata/sf0.001"
OUT_SCHEMA = "user_id long, last_event_id long, last_ts_us long, last_value double"


def _latest_per_user(df):
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.unix_micros(F.col("ts")).alias("last_ts_us"),
            F.col("value").cast("double").alias("last_value"),
        )
    )


def _move_parquet_files(spark, df, stage_dir: str, src_dir: str, tag: str) -> None:
    """Write df as parquet then move its data files into the monitored dir
    (the file-stream source picks up FILES appearing in the directory)."""
    df.coalesce(1).write.mode("overwrite").parquet(stage_dir)
    os.makedirs(src_dir, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(os.path.join(stage_dir, "part-*.parquet")))):
        shutil.copy(f, os.path.join(src_dir, f"{tag}_{i}.parquet"))


def _run_until_drained(spark, src_dir, schema, out_dir, ckpt_dir):
    stream = spark.readStream.schema(schema).parquet(src_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )

    def handle(batch_df, _bid):
        _latest_per_user(batch_df).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _merged(spark, out_dir):
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], OUT_SCHEMA)
    frags = spark.read.schema(OUT_SCHEMA).parquet(out_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("last_ts_us"), F.desc("last_event_id")
    )
    return frags.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def test_stream_restart_from_checkpoint(spark, tmp_path):
    events = load_tables(spark, SF_DIR, ("events",))["events"]
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stage = str(tmp_path / "stage")
    _move_parquet_files(spark, half_a, stage, src, "a")
    schema = spark.read.parquet(src).schema

    # phase 1: consume half A, then stop (simulated failure/redeploy)
    _run_until_drained(spark, src, schema, out, ckpt)
    frags_after_1 = len(glob.glob(os.path.join(out, "part-*.parquet")))
    assert frags_after_1 > 0

    # phase 1.5: restart with NO new input — the checkpoint must prevent any
    # reprocessing: zero new fragments appear (exactly-once, not at-least-once)
    _run_until_drained(spark, src, schema, out, ckpt)
    assert len(glob.glob(os.path.join(out, "part-*.parquet"))) == frags_after_1

    # phase 2: half B arrives; a NEW query on the SAME checkpoint resumes
    _move_parquet_files(spark, half_b, stage + "2", src, "b")
    _run_until_drained(spark, src, schema, out, ckpt)

    # the recovered stream's merged state equals the uninterrupted batch query
    got = {
        (r["user_id"], r["last_event_id"], r["last_ts_us"], r["last_value"])
        for r in _merged(spark, out).collect()
    }
    want = {
        (r["user_id"], r["last_event_id"], r["last_ts_us"], r["last_value"])
        for r in _latest_per_user(events).collect()
    }
    assert got == want


def test_fresh_sink_table_drops_only_own_prior(spark):
    """Memory-sink lifecycle contract (streaming/ingest.fresh_sink_table):
    a runner's previous result table is dropped when the SAME runner is
    re-invoked (bounding driver-resident sink rows to one result per
    runner), while OTHER runners' tables survive — the tws-vs-apws
    equivalence tests hold both outputs at once."""
    from spj_query_engine_spark.streaming.ingest import fresh_sink_table

    def registered(name):
        return any(t.name == name for t in spark.catalog.listTables())

    a1 = fresh_sink_table(spark, "contract_a")
    spark.range(3).createOrReplaceTempView(a1)
    b1 = fresh_sink_table(spark, "contract_b")
    spark.range(5).createOrReplaceTempView(b1)
    assert registered(a1) and registered(b1)

    a2 = fresh_sink_table(spark, "contract_a")
    assert a2 != a1
    assert not registered(a1), "prior same-runner table must be dropped"
    assert registered(b1), "other runners' tables must survive"

    # cleanup
    spark.catalog.dropTempView(b1)
    fresh_sink_table(spark, "contract_a")  # drops a2's registration slot
    if registered(a2):
        spark.catalog.dropTempView(a2)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_asof_fb_equals_apws(spark):
    """e10's two execution paths — the stream-static foreachBatch JVM as-of
    (default) and the per-bucket stateful union fold (the two-stream
    design) — must emit identical rows on the same finite replay."""
    from spj_query_engine_spark.streaming import stateful

    spark.conf.set("spj.stream.asof.api", "apws")
    try:
        ref = _rows(stateful.run_stateful_asof(spark, SF_DIR))
    finally:
        spark.conf.set("spj.stream.asof.api", "fb")
    out = _rows(stateful.run_stateful_asof(spark, SF_DIR))
    assert out == ref and len(out) > 0


def test_ttl_tws_equals_apws(spark):
    """e50's TWS twin (transformWithStateInPandas, real event-time timers)
    must emit exactly the applyInPandasWithState rows.  Skips only where
    TWS is not runnable (no protobuf and no shim on the JVM's launch
    PYTHONPATH) — this container always has the shim."""
    import pytest

    from spj_query_engine_spark.streaming import stateful

    if not stateful.tws_runnable(spark):
        pytest.skip("transformWithStateInPandas not runnable on this session")
    spark.conf.set("spj.stream.session.api", "apws")
    try:
        ref = _rows(stateful.run_stateful_sessionize_ttl(spark, SF_DIR))
        assert stateful.TTL_SELECTED_API == "apws"
        spark.conf.set("spj.stream.session.api", "tws")
        out = _rows(stateful.run_stateful_sessionize_ttl(spark, SF_DIR))
        assert stateful.TTL_SELECTED_API == "tws"
    finally:
        spark.conf.unset("spj.stream.session.api")
    assert out == ref and len(out) > 0


def test_pack_tails_roundtrip():
    """The TTL session state travels as one binary blob (6xN little-endian
    int64); pack/unpack must be an exact inverse, including empty tails and
    negative values (micros can be negative)."""
    import numpy as np

    from spj_query_engine_spark.streaming.stateful import (
        _pack_tails,
        _unpack_tails,
    )

    tails = tuple(
        np.array(vals, dtype=np.int64)
        for vals in (
            [1, 2, 3],
            [1, 1, 2],
            [10, 20, 30],
            [15, 25, 35],
            [2, 3, 1],
            [-5, 0, 7_000_000_000_000],
        )
    )
    blob = _pack_tails(tails)
    assert isinstance(blob, tuple) and len(blob) == 1
    back = _unpack_tails(blob[0])
    assert len(back) == 6
    for a, b in zip(tails, back):
        assert np.array_equal(a, b)
    # empty state and the k-parameterized variant
    empty = tuple(np.empty(0, dtype=np.int64) for _ in range(4))
    back4 = _unpack_tails(_pack_tails(empty)[0], 4)
    assert len(back4) == 4 and all(len(a) == 0 for a in back4)

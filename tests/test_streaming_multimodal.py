"""Streaming rollup (stream ≡ batch on finite input) and multimodal plumbing
tests."""

from __future__ import annotations

import pandas as pd
import pytest

from spj_query_engine_spark.operators import multimodal, temporal
from spj_query_engine_spark.catalog import load_table
from spj_query_engine_spark.streaming import ingest

from tests.conftest import SF_DIR
from spj_query_engine_spark.testing import compare_frames


def test_streaming_rollup_equals_batch(spark):
    batch = temporal.tumbling_rollup(load_table(spark, SF_DIR, "events")).toPandas()
    stream = ingest.run_streaming_rollup(spark, SF_DIR).toPandas()
    assert not compare_frames(stream, batch)


@pytest.fixture(scope="module")
def mm(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["abcdefgh", "spark engine"]})
    )
    return multimodal.attach_payload(docs)


def test_attach_payload_meta(mm):
    rows = {r["doc_id"]: r for r in mm.collect()}
    assert bytes(rows[1]["payload"]) == b"abcdefgh"
    assert rows[1]["meta"]["n_bytes"] == 8
    assert rows[2]["meta"]["mime"] == "text/utf-8"


def test_decode_features_shape_and_determinism(mm):
    out = multimodal.decode_features(mm).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[1]["n_bytes"] == 8
    assert len(rows[1]["feat"]) == multimodal.FEAT_DIM
    assert all(0.0 <= v < 1.0 for v in rows[1]["feat"])
    # deterministic across runs
    again = {r["doc_id"]: r for r in multimodal.decode_features(mm).collect()}
    assert rows[1]["feat"] == again[1]["feat"]
    assert rows[1]["checksum"] == sum(b"abcdefgh")


def test_frame_sample_partitions_payload(mm):
    out = [r for r in multimodal.frame_sample(mm).collect() if r["doc_id"] == 1]
    assert len(out) == multimodal.FRAME_COUNT
    assert sum(r["frame_bytes"] for r in out) == 8
    assert len({r["frame_fp"] for r in out}) == multimodal.FRAME_COUNT  # chunks differ

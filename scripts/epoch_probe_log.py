#!/usr/bin/env python
"""Append one timestamped machine-epoch probe sample to BENCH_EPOCH_LOG.jsonl.

The probe (bench.epoch_probe) is a fixed pure-pyspark workload — no repo
code, no input data — so this log is a code-independent record of the
machine's speed over time: the multi-epoch evidence BENCH_VARIANCE.md's
narrative lacked.  Run between tasks; one line per invocation:

    {"ts": "...Z", "med": 1.014, "samples": [...], "note": "..."}
"""

from __future__ import annotations

import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import epoch_probe
from spj_query_engine_spark.session import get_spark

LOG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_EPOCH_LOG.jsonl",
)


def main() -> None:
    note = " ".join(sys.argv[1:])
    spark = get_spark(
        app_name="epoch-probe-log", master="local[32]", shuffle_partitions=32
    )
    row = epoch_probe(spark)
    row["ts"] = (
        datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds")
        .replace("+00:00", "Z")
    )
    if note:
        row["note"] = note
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()

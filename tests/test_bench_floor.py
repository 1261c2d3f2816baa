"""Bench-floor regression gate as a TEST: the committed BENCH_DETAIL.json
must keep every query within 1.5x of its best recording across the committed
BENCH_r*.json driver tails (the acceptance bar the r03 verdict set).  A bench
re-run that regresses a query now fails CI instead of relying on someone
running scripts/compare_bench.py by hand.

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

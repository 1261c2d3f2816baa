"""Temporal operator tests on constructed event/order data, plus the
equivalence of the two AS-OF join implementations (DataFrame composition vs
applyInPandas + merge_asof)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from spj_query_engine_spark.operators import temporal

UTC = dt.timezone.utc


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions separated by > 30 min
        (1, 1, _ts(0), "view", 1.0),
        (2, 1, _ts(5), "purchase", 2.0),
        (3, 1, _ts(50), "view", 3.0),
        # user 2: one session
        (4, 2, _ts(10), "purchase", 4.0),
        (5, 2, _ts(20), "view", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


@pytest.fixture(scope="module")
def orders(spark):
    rows = [
        (100, 1, dt.datetime(2023, 12, 1), 10.0),
        (101, 1, dt.datetime(2023, 12, 25), 20.0),
        (102, 1, dt.datetime(2023, 12, 25), 30.0),  # tie on date with 101
        (103, 2, dt.datetime(2024, 1, 1, 0, 15), 40.0),  # after user 2's first event
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )


def test_sessionize_gap_split(events):
    got = {(r["user_id"], r["session_no"]): r for r in temporal.sessionize(events).collect()}
    assert len(got) == 3  # user 1 → 2 sessions, user 2 → 1
    assert got[(1, 1)]["n_events"] == 2 and got[(1, 2)]["n_events"] == 1
    assert got[(2, 1)]["n_events"] == 2


def test_tumbling_rollup_counts(events):
    got = temporal.tumbling_rollup(events, hours=1).collect()
    assert sum(r["n_events"] for r in got) == 5
    # all five events fall in the same 1h bucket → one row per event_type
    assert {r["event_type"] for r in got} == {"view", "purchase"}


def test_asof_picks_latest_with_tiebreak(events, orders):
    got = {r["event_id"]: r for r in temporal.asof_join(events, orders).collect()}
    # user 1 events: latest order at/before is 2023-12-25; tie → higher key 102
    assert got[1]["o_orderkey"] == 102
    # user 2 event 4 (00:10): order 103 is at 00:15 → NO order before → dropped
    assert 4 not in got
    # user 2 event 5 (00:20): order 103 (00:15) matches
    assert got[5]["o_orderkey"] == 103


def test_asof_pandas_variant_matches(events, orders):
    a = {
        (r["event_id"], r["o_orderkey"], r["odate_ms"], r["o_totalprice"])
        for r in temporal.asof_join(events, orders).collect()
    }
    b = {
        (r["event_id"], r["o_orderkey"], r["odate_ms"], r["o_totalprice"])
        for r in temporal.asof_join_pandas(events, orders).collect()
    }
    assert a == b
    assert set(temporal.asof_join(events, orders).columns) == set(
        temporal.asof_join_pandas(events, orders).columns
    )


def test_range_join_window(events):
    got = {r["p_id"]: r for r in temporal.range_join(events, minutes=10).collect()}
    # purchase 2 (00:05): user-1 events within ±10min → event 1 only
    assert got[2]["n_nearby"] == 1
    # purchase 4 (00:10): user-2 event 5 at 00:20 is inside ±10
    assert got[4]["n_nearby"] == 1


def test_asof_locf_equals_join_formulation(spark):
    from spj_query_engine_spark.catalog import load_tables
    from tests.conftest import SF_DIR

    t = load_tables(spark, SF_DIR, ("events", "orders"))
    a = temporal.asof_join(t["events"], t["orders"])
    b = temporal.asof_join_locf(t["events"], t["orders"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_funnel_ordering_and_window(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    hr = 3_600_000
    rows = [
        # user 1: full ordered funnel within 24h
        (1, "view", 0), (1, "click", 1 * hr), (1, "purchase", 2 * hr),
        # user 2: purchase BEFORE view/click -> only counts view+click
        (2, "purchase", 0), (2, "view", 1 * hr), (2, "click", 2 * hr),
        # user 3: ordered but purchase outside the 24h window
        (3, "view", 0), (3, "click", 1 * hr), (3, "purchase", 30 * hr),
        # user 4: never viewed
        (4, "click", 0), (4, "purchase", 1 * hr),
    ]
    ev = (
        spark.createDataFrame(rows, "user_id long, event_type string, ts_ms long")
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withColumn("value", F.lit(1.0))
        .withColumn("event_id", F.col("ts_ms"))
    )
    got = {r["step"]: r["n_users"] for r in temporal.funnel(ev).collect()}
    assert got == {"view": 3, "click": 3, "purchase": 1}


def test_moving_stats_frame_and_gaps(events):
    got = {r["event_id"]: r for r in temporal.moving_stats(events, window=2).collect()}
    # user 1: values 1, 2, 3 at minutes 0, 5, 50
    assert got[1]["mov_avg"] == 1.0 and got[1]["gap_ms"] is None
    assert got[2]["mov_avg"] == 1.5 and got[2]["gap_ms"] == 5 * 60_000
    assert got[3]["mov_avg"] == 2.5 and got[3]["gap_ms"] == 45 * 60_000
    # user 2: values 4, 5 at minutes 10, 20 — frames never cross users
    assert got[4]["mov_avg"] == 4.0 and got[4]["gap_ms"] is None
    assert got[5]["mov_avg"] == 4.5 and got[5]["gap_ms"] == 10 * 60_000


def test_cohort_retention_offsets(spark):
    wk = temporal.COHORT_WEEK_MS // 1000  # one week in seconds
    base = dt.datetime(2024, 1, 4)  # mid-week, away from bucket edges
    rows = [
        # user 1: weeks 0, 1, 3 relative to first activity (plus a same-week
        # repeat that must NOT double-count)
        (1, 1, base, "view", 1.0),
        (2, 1, base + dt.timedelta(seconds=60), "view", 1.0),
        (3, 1, base + dt.timedelta(seconds=wk), "view", 1.0),
        (4, 1, base + dt.timedelta(seconds=3 * wk), "view", 1.0),
        # user 2: first active one week later, returns the week after
        (5, 2, base + dt.timedelta(seconds=wk), "view", 1.0),
        (6, 2, base + dt.timedelta(seconds=2 * wk), "view", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = {
        (r["cohort_week"] , r["week_offset"]): r["n_users"]
        for r in temporal.cohort_retention(ev).collect()
    }
    c1 = min(k[0] for k in got)  # user 1's cohort week
    assert got[(c1, 0)] == 1 and got[(c1, 1)] == 1 and got[(c1, 3)] == 1
    assert (c1, 2) not in got  # user 1 skipped week 2
    assert got[(c1 + 1, 0)] == 1 and got[(c1 + 1, 1)] == 1  # user 2's cohort


def test_heavy_hitters_rank_and_ties(spark):
    base = dt.datetime(2024, 1, 1, 1, 0)
    rows = (
        [(i, 1, base, "view", 1.0) for i in range(3)]
        + [(10 + i, 1, base, "click", 1.0) for i in range(2)]
        + [(20 + i, 1, base, "purchase", 1.0) for i in range(2)]  # tie with click
        + [(30, 1, base, "refund", 1.0)]  # 4th place, cut by k=3
    )
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = temporal.window_heavy_hitters(ev, hours=1, k=3).collect()
    assert [(r["event_type"], r["rank"]) for r in sorted(got, key=lambda r: r["rank"])] == [
        ("view", 1), ("click", 2), ("purchase", 3)  # tie broken alphabetically
    ]


def test_gap_histogram_buckets_and_overflow(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base, "view", 1.0),
        (2, 1, base + dt.timedelta(seconds=30), "view", 1.0),   # 0-min bucket
        (3, 1, base + dt.timedelta(minutes=5, seconds=30), "view", 1.0),  # 5-min
        (4, 2, base, "view", 1.0),
        (5, 2, base + dt.timedelta(days=1), "view", 1.0),       # overflow bin
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = {r["gap_bucket"]: r["n_gaps"] for r in temporal.gap_histogram(ev).collect()}
    assert got == {0: 1, 5: 1, temporal.GAP_BUCKET_CAP: 1}


def test_trailing_range_window_ties_share_frame(spark):
    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, 1, base, "view", 1.0),
        (2, 1, base + dt.timedelta(minutes=30), "view", 2.0),
        (3, 1, base + dt.timedelta(minutes=30), "view", 4.0),  # co-timestamped
        (4, 1, base + dt.timedelta(minutes=89), "view", 8.0),  # 1st falls out
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    got = {r["event_id"]: r for r in temporal.trailing_range_stats(ev).collect()}
    assert got[1]["n_prev_1h"] == 1
    # RANGE frame: both co-timestamped events see each other → identical stats
    assert got[2]["n_prev_1h"] == 3 and got[3]["n_prev_1h"] == 3
    assert got[2]["sum_value_1h"] == got[3]["sum_value_1h"] == 7.0
    # event 4: events at +30min are inside its trailing hour, event 1 is not
    assert got[4]["n_prev_1h"] == 3 and got[4]["sum_value_1h"] == 14.0


def test_approx_percentile_gate_holds(spark):
    """The GK sketch at accuracy 10k must sit within tolerance of the exact
    interpolated percentile on a skewed constructed distribution."""
    import numpy as np

    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.exponential(10.0, 4000), rng.normal(500, 1, 50)])
    ev = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_type": ["a"] * 2025 + ["b"] * 2025,
                "value": vals,
            }
        )
    )
    row = temporal.approx_percentile_check(ev).collect()[0]
    assert row["n_groups"] == 2
    assert row["within_tol"] == 1


def test_growth_accounting_ledger_invariants(spark):
    """new + retained + resurrected = active every week; churned(w) equals
    prev week's active minus retained; a planted gap resurrects."""
    rows = [
        # user 1: weeks 0,1,2 (retained twice)
        (1, "2024-01-01 00:00:00"), (1, "2024-01-08 00:00:00"), (1, "2024-01-15 00:00:00"),
        # user 2: weeks 0,2 (gap -> resurrected in week 2)
        (2, "2024-01-01 00:00:00"), (2, "2024-01-15 00:00:00"),
        # user 3: week 1 only (new in 1, churned counted at 2)
        (3, "2024-01-08 00:00:00"),
    ]
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(i, u, ts, "view", 1.0) for i, (u, ts) in enumerate(rows)],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["week"]: r for r in temporal.growth_accounting(ev).collect()}
    weeks = sorted(got)
    w0, w1, w2 = weeks
    for wk in weeks:
        r = got[wk]
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == r["n_active"]
    assert got[w0]["n_active"] == 2 and got[w0]["n_new"] == 2
    assert got[w1]["n_active"] == 2 and got[w1]["n_retained"] == 1 and got[w1]["n_new"] == 1
    assert got[w1]["n_churned"] == 1  # user 2 sat out week 1
    assert got[w2]["n_resurrected"] == 1  # user 2 came back
    assert got[w2]["n_churned"] == 1  # user 3 gone


def test_event_transitions_probabilities(spark):
    """Planted journey view->click->view->purchase: transition rows must
    count ordered adjacencies per user and normalize per prev_type."""
    from pyspark.sql import functions as F

    rows = [
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 00:01:00", "click"),
        (3, 1, "2024-01-01 00:02:00", "view"),
        (4, 1, "2024-01-01 00:03:00", "purchase"),
        (5, 2, "2024-01-01 00:00:00", "view"),
        (6, 2, "2024-01-01 00:01:00", "click"),
    ]
    ev = spark.createDataFrame(
        [(i, u, ts, t, 1.0) for (i, u, ts, t) in rows],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r["prev_type"], r["event_type"]): (r["n"], r["p"])
        for r in temporal.event_transitions(ev).collect()
    }
    assert got[("view", "click")] == (2, 0.666667)  # 2 of view's 3 exits
    assert got[("view", "purchase")] == (1, 0.333333)
    assert got[("click", "view")] == (1, 1.0)
    assert ("purchase", "view") not in got  # no wrap across stream end
    assert ("view", "view") not in got  # user boundary respected


def test_json_props_malformed_rows_become_nulls(spark):
    """Schema-on-read contract: malformed JSON and missing keys count as
    n_missing, never raise."""
    from pyspark.sql import functions as F

    rows = [
        (1, 1, "2024-01-01 00:00:00", "view", 1.0, '{"k": 5}'),
        (2, 1, "2024-01-01 00:01:00", "view", 1.0, "not json"),
        (3, 1, "2024-01-01 00:02:00", "view", 1.0, '{"other": 1}'),
        (4, 1, "2024-01-01 00:03:00", "view", 1.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts string, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = temporal.json_props_rollup(ev).collect()[0]
    assert got["n_events"] == 4 and got["n_missing"] == 3
    assert got["sum_k"] == 5 and got["ndv_k"] == 1


def test_out_of_orderness_plants_and_measures_disorder(spark):
    """An event arriving (by event_id sequence) with an EARLIER event time
    than a predecessor must be counted late with its exact lateness; an
    ordered stream must audit to zero — the property that makes the zero
    result on the generator's ordered corpus meaningful."""
    rows = [
        # type 'a': arrival 1,2,3 but event 2 is 10 min behind event 1
        (1, 1, _ts(10), "a", 0.0),
        (2, 1, _ts(0), "a", 0.0),    # late by 600_000 ms
        (3, 1, _ts(20), "a", 0.0),
        # type 'b': perfectly ordered
        (4, 2, _ts(0), "b", 0.0),
        (5, 2, _ts(5), "b", 0.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r["event_type"]: r for r in temporal.out_of_orderness(ev).collect()}
    assert got["a"]["n_late"] == 1
    assert got["a"]["max_late_ms"] == 600_000
    assert got["a"]["frac_beyond_budget"] > 0  # 600s > the 300s budget
    assert got["b"]["n_late"] == 0 and got["b"]["max_late_ms"] == 0


def test_sketch_rollup_weekly_union(spark):
    """The weekly estimate from unioned DAY sketches must gate within the
    error bound against the exact weekly distinct count — including a user
    active on several days of one week (the case where summing day counts
    would overcount and only a true sketch UNION stays correct)."""
    rows = []
    base = dt.datetime(2024, 1, 1)
    # week A: user 1 active on 3 days, users 2-3 once -> 3 distinct
    for i, (day, uid) in enumerate([(0, 1), (1, 1), (2, 1), (0, 2), (1, 3)]):
        rows.append((i, uid, base + dt.timedelta(days=day), "view", 0.0))
    # week B (days 7-13): users 4-5 -> 2 distinct
    rows.append((10, 4, base + dt.timedelta(days=7), "view", 0.0))
    rows.append((11, 5, base + dt.timedelta(days=8), "view", 0.0))
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r["week_no"]: r for r in temporal.sketch_rollup(ev).collect()}
    weeks = sorted(got)
    assert got[weeks[0]]["exact_users"] == 3 and got[weeks[0]]["est_ok"] == 1
    assert got[weeks[1]]["exact_users"] == 2 and got[weeks[1]]["est_ok"] == 1


def test_watermark_sweep_monotone_and_exact(spark):
    """Constructed lateness: with arrival order 1..4 and event times
    [10s, 30s, 5s, 29s], event 3 is 25s late and event 4 is 1s late —
    delay 0 drops both, 10s drops only event 3, 60s drops none.  Drops
    must be monotone non-increasing in the delay."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base + dt.timedelta(seconds=10), "view", 0.0),
        (2, 1, base + dt.timedelta(seconds=30), "view", 0.0),
        (3, 1, base + dt.timedelta(seconds=5), "view", 0.0),   # 25s late
        (4, 1, base + dt.timedelta(seconds=29), "view", 0.0),  # 1s late
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r["delay_ms"]: r for r in temporal.watermark_sweep(ev).collect()}
    assert set(got) == set(temporal.WATERMARK_SWEEP_MS)
    assert got[0]["n_dropped"] == 2
    assert got[10_000]["n_dropped"] == 1
    assert got[60_000]["n_dropped"] == 0
    drops = [got[d]["n_dropped"] for d in sorted(got)]
    assert drops == sorted(drops, reverse=True)
    assert got[0]["drop_ppm"] == 500_000  # 2 of 4


def test_last_touch_attribution_window_and_null_bucket(spark):
    """Purchase 10min after a click attributes to THAT click (the latest
    prior one); a purchase 8 days after the only click falls outside the
    7-day window (NULL bucket, attributed=0); a purchase with no prior
    click is unattributed.  Oracle twin agrees."""
    import datetime as dt

    import duckdb as _duck

    from tests.conftest import assert_same_result

    base = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    day = dt.timedelta(days=1)
    rows = [
        # user 1: click, click, purchase → credits the SECOND click
        (1, 1, base + 0 * m, "click", 0.0),
        (2, 1, base + 5 * m, "click", 0.0),
        (3, 1, base + 15 * m, "purchase", 42.0),
        # user 2: click then purchase 8 days later → outside the window
        (4, 2, base, "click", 0.0),
        (5, 2, base + 8 * day, "purchase", 10.0),
        # user 3: purchase with no click at all
        (6, 3, base, "purchase", 5.0),
        # noise the type filter must drop
        (7, 1, base + 10 * m, "view", 0.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r["purchase_id"]: r for r in temporal.last_touch_attribution(ev).collect()}
    assert got[3]["click_id"] == 2 and got[3]["attributed"] == 1
    assert got[3]["gap_ms"] == 10 * 60_000
    assert got[5]["click_id"] is None and got[5]["attributed"] == 0
    assert got[6]["click_id"] is None and got[6]["attributed"] == 0
    con = _duck.connect()
    con.register("events", ev.toPandas())
    assert_same_result(
        temporal.last_touch_attribution(ev), con, temporal.last_touch_attribution_sql()
    )
    con.close()


def test_funnel_latency_exact_gaps(spark):
    """Two users complete view→click→purchase with known gaps; latency
    percentiles over {10min, 30min} and {5min, 5min} must be exact, and a
    user who never clicks contributes nothing.  Oracle twin agrees."""
    import datetime as dt

    import duckdb as _duck

    from tests.conftest import assert_same_result

    base = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, 1, base, "view", 0.0),
        (2, 1, base + 10 * m, "click", 0.0),
        (3, 1, base + 40 * m, "purchase", 0.0),
        (4, 2, base, "view", 0.0),
        (5, 2, base + 5 * m, "click", 0.0),
        (6, 2, base + 10 * m, "purchase", 0.0),
        (7, 3, base, "view", 0.0),  # never converts past step 0
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r["step_no"]: r for r in temporal.funnel_latency(ev).collect()}
    assert got[1]["n_users"] == 2 and got[2]["n_users"] == 2
    assert got[1]["p50_ms"] == 7.5 * 60_000  # median of 5min and 10min
    assert got[1]["max_ms"] == 10 * 60_000
    assert got[2]["max_ms"] == 30 * 60_000
    con = _duck.connect()
    con.register("events", ev.toPandas())
    assert_same_result(
        temporal.funnel_latency(ev), con, temporal.funnel_latency_sql()
    )
    con.close()


def test_incremental_rollup_merge_law(spark):
    """Events straddling the cutover day: the partial-merge result must
    equal the direct full-history rollup exactly (the maintenance
    invariant), with integer-micro sums."""
    import datetime as dt

    import duckdb as _duck

    from tests.conftest import assert_same_result

    day = dt.timedelta(days=1)
    base = dt.datetime(1970, 1, 1)  # day_no == calendar day offset
    rows = [
        (1, 1, base + 5 * day, "view", 1.25),     # old
        (2, 1, base + 5 * day, "view", 2.50),     # old, same cell
        (3, 2, base + 25 * day, "view", 4.75),    # delta
        (4, 2, base + 25 * day, "click", 0.10),   # delta, other type
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {(r["event_type"], r["day_no"]): r for r in temporal.incremental_rollup(ev).collect()}
    assert got[("view", 5)]["n_events"] == 2
    assert got[("view", 5)]["sum_micros"] == 3_750_000
    assert got[("view", 25)]["sum_micros"] == 4_750_000
    assert got[("click", 25)]["n_events"] == 1
    con = _duck.connect()
    con.register("events", ev.toPandas())
    assert_same_result(
        temporal.incremental_rollup(ev), con, temporal.incremental_rollup_sql()
    )
    con.close()


def test_session_funnel_visit_scoped(spark):
    """A user who views in one session and clicks+purchases only in a
    LATER session converts e08's lifetime funnel but not the session
    funnel; a same-session chain converts both.  Oracle agrees."""
    import datetime as dt

    import duckdb as _duck

    from tests.conftest import assert_same_result

    base = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    hr = dt.timedelta(hours=1)
    rows = [
        # user 1: view/click/purchase inside one session
        (1, 1, base, "view", 0.0),
        (2, 1, base + 2 * m, "click", 0.0),
        (3, 1, base + 4 * m, "purchase", 0.0),
        # user 2: view, then (2h gap → new session) click + purchase
        (4, 2, base, "view", 0.0),
        (5, 2, base + 2 * hr, "click", 0.0),
        (6, 2, base + 2 * hr + 1 * m, "purchase", 0.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r["step_no"]: r for r in temporal.session_funnel(ev).collect()}
    assert got[0]["n_reached"] == 2  # two sessions contain a view
    assert got[1]["n_reached"] == 1  # only user 1's session chains view→click
    assert got[2]["n_reached"] == 1
    assert got[0]["n_sessions"] == 3  # u1×1 + u2×2
    con = _duck.connect()
    con.register("events", ev.toPandas())
    assert_same_result(
        temporal.session_funnel(ev), con, temporal.session_funnel_sql()
    )
    con.close()


def test_ohlc_bars_deterministic_open_close(spark):
    """Open/close come from the (ts, event_id) total order — a tie on ts
    resolves to the lower event_id for open and the higher for close;
    high/low/volume are bar-wide.  Oracle twin agrees."""
    import datetime as dt

    import duckdb as _duck

    from tests.conftest import assert_same_result

    base = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # one bar, with a ts tie at the open and at the close
        (2, 1, base, "buy", 5.0),
        (1, 1, base, "buy", 3.0),  # same ts, lower id → the true open
        (3, 1, base + 10 * m, "buy", 9.0),
        (5, 1, base + 20 * m, "buy", 1.0),
        (4, 1, base + 20 * m, "buy", 7.0),  # same ts, id 5 wins the close
        # a second type so grouping is exercised
        (6, 2, base, "sell", 2.5),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r["event_type"]: r for r in temporal.ohlc_bars(ev).collect()}
    b = got["buy"]
    assert b["open"] == 3.0 and b["close"] == 1.0
    assert b["high"] == 9.0 and b["low"] == 1.0
    assert b["n_events"] == 5 and b["volume"] == 25.0
    assert got["sell"]["open"] == got["sell"]["close"] == 2.5
    con = _duck.connect()
    con.register("events", ev.toPandas())
    assert_same_result(temporal.ohlc_bars(ev), con, temporal.ohlc_bars_sql())
    con.close()


def test_ewma_daily_halving_weights(spark):
    """With daily values 1.0, 2.0, 4.0 the dyadic EWMA at day 2 is
    floor((4·2^7 + 2·2^6 + 1·2^5)·1e6 / (2^7+2^6+2^5)) and the warm-up
    rows normalize by only the observed weights.  Oracle twin agrees."""
    import datetime as dt

    import duckdb as _duck

    from tests.conftest import assert_same_result

    base = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = [
        (1, 1, base, "m", 1.0),
        (2, 1, base + day, "m", 2.0),
        (3, 1, base + 2 * day, "m", 4.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = sorted(temporal.ewma_daily(ev).collect(), key=lambda r: r["day"])
    assert [r["v_micros"] for r in got] == [1_000_000, 2_000_000, 4_000_000]
    assert got[0]["ewma_micros"] == 1_000_000  # single observation
    # day 1: (2·128 + 1·64)·1e6 / 192
    assert got[1]["ewma_micros"] == (2 * 128 + 1 * 64) * 1_000_000 // 192
    # day 2: (4·128 + 2·64 + 1·32)·1e6 / 224
    assert got[2]["ewma_micros"] == (4 * 128 + 2 * 64 + 1 * 32) * 1_000_000 // 224
    con = _duck.connect()
    con.register("events", ev.toPandas())
    assert_same_result(temporal.ewma_daily(ev), con, temporal.ewma_daily_sql())
    con.close()


def test_seasonality_profile_grid_and_peak(spark):
    """Known timestamps: 1970-01-01 is a Thursday (dow=3 with Monday=0);
    the busiest cell gets is_peak=1 with the earlier-slot tie-break, and
    per-type shares sum to ~1e6.  Oracle twin agrees."""
    import datetime as dt

    import duckdb as _duck

    from tests.conftest import assert_same_result

    thu_9 = dt.datetime(1970, 1, 1, 9, 0)  # Thursday 09:00 UTC
    fri_14 = dt.datetime(1970, 1, 2, 14, 0)  # Friday 14:00
    rows = [
        (1, 1, thu_9, "click", 1.0),
        (2, 1, thu_9 + dt.timedelta(minutes=5), "click", 2.0),
        (3, 1, fri_14, "click", 4.0),
        (4, 2, fri_14, "view", 1.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {
        (r["event_type"], r["dow"], r["hour"]): r
        for r in temporal.seasonality_profile(ev).collect()
    }
    thu = got[("click", 3, 9)]
    assert thu["n_events"] == 2 and thu["is_peak"] == 1
    assert thu["share_ppm"] == 2 * 1_000_000 // 3
    fri = got[("click", 4, 14)]
    assert fri["n_events"] == 1 and fri["is_peak"] == 0
    assert got[("view", 4, 14)]["is_peak"] == 1
    con = _duck.connect()
    con.register("events", ev.toPandas())
    assert_same_result(
        temporal.seasonality_profile(ev), con, temporal.seasonality_profile_sql()
    )
    con.close()


def test_cusum_shifts_detects_level_change(spark):
    """Six days at 1.0 then six days at 9.0: the cusum trough at the
    regime boundary exceeds the 10% threshold (flagged), while a flat
    series never flags.  Oracle twin agrees."""
    import datetime as dt

    import duckdb as _duck

    from tests.conftest import assert_same_result

    base = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = []
    eid = 0
    for i in range(12):
        eid += 1
        rows.append((eid, 1, base + i * day, "shifty", 1.0 if i < 6 else 9.0))
    for i in range(12):
        eid += 1
        rows.append((eid, 1, base + i * day, "flat", 5.0))
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = temporal.cusum_shifts(ev).toPandas()
    shifty = got[got["event_type"] == "shifty"].sort_values("day")
    flat = got[got["event_type"] == "flat"]
    # total = 60e6 micros over 12 days; at day 6 (i=6): cum=6e6,
    # scaled dev = 12*6e6 - 6*60e6 = -288e6; threshold = 12*60e6/10 = 72e6
    assert shifty.iloc[5]["cusum_scaled"] == 12 * 6_000_000 - 6 * 60_000_000
    assert shifty.iloc[5]["shift_flag"] == 1
    assert flat["shift_flag"].sum() == 0
    assert (flat["cusum_scaled"] == 0).all()
    con = _duck.connect()
    con.register("events", ev.toPandas())
    assert_same_result(temporal.cusum_shifts(ev), con, temporal.cusum_shifts_sql())
    con.close()

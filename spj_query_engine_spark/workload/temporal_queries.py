"""Workload entries for the temporal operators over events/orders."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spj_query_engine_spark.catalog import load_tables
from spj_query_engine_spark.operators import temporal
from spj_query_engine_spark.workload.registry import register


@register(
    "e01_tumbling_rollup",
    temporal.tumbling_rollup_sql(),
    doc="Tumbling %sh event-time rollup per event_type; map-side partial agg."
    % temporal.ROLLUP_HOURS,
)
def e01_tumbling_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.tumbling_rollup(ev)


@register(
    "e02_sessionize",
    temporal.sessionize_sql(),
    doc="Sessionization (gap %s min): lag+cumsum windows, one shuffle on "
    "user_id, deterministic tie-break on event_id." % temporal.SESSION_GAP_MIN,
)
def e02_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.sessionize(ev)


@register(
    "e03_asof_join",
    temporal.asof_join_sql(),
    doc="AS-OF join events→orders (latest order per customer at event "
    "time) in LOCF form: union + one shuffle on user + running "
    "last(ignorenulls) — no per-pair intermediate; same tie-break as the "
    "join+window oracle.",
)
def e03_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events", "orders"))
    return temporal.asof_join_locf(t["events"], t["orders"])


@register(
    "e04_range_join",
    temporal.range_join_sql(),
    doc="Self range join: per purchase event, same-user events within ±%s "
    "min; equi key + time-band residual." % temporal.RANGE_MINUTES,
)
def e04_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.range_join(ev)


@register(
    "e08_funnel",
    temporal.funnel_sql(),
    doc="Ordered funnel conversion (%s within %sh): chained conditional MINs "
    "over per-user aggregates — O(events), never the O(events^k) k-way "
    "self-join." % (" → ".join(temporal.FUNNEL_STEPS), temporal.FUNNEL_WINDOW_HOURS),
)
def e08_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.funnel(ev)


@register(
    "e09_percentiles",
    temporal.value_percentiles_sql(),
    doc="Exact per-type value percentiles (p50/p95/p99, linear "
    "interpolation); approx_percentile is the documented 100 TB swap-in.",
)
def e09_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.value_percentiles(ev)


@register(
    "e11_moving_stats",
    temporal.moving_stats_sql(),
    doc="Rolling feature engineering: per-user trailing %s-row moving average "
    "of value + LAG inter-event gap; both window specs share one shuffle + "
    "sort (single Window physical node)." % temporal.MOV_WINDOW,
)
def e11_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.moving_stats(ev)


@register(
    "e12_native_session",
    temporal.native_sessionize_sql(),
    doc="Sessionization via Spark's NATIVE session_window aggregation (one "
    "groupBy, Catalyst merges per-user gap intervals in the aggregation — "
    "no window-function sort passes); oracle = the lag+cumsum formulation "
    "with session_window's end-padding.  Session membership proven equal "
    "to e02.",
)
def e12_native_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.native_sessionize(ev)


@register(
    "e14_gap_fill",
    temporal.gap_fill_locf_sql(),
    doc="Time-series regularization: per-user daily grid carrying the last "
    "event value at or before each point (LOCF resample) via the union + "
    "running-last template — O(events + grid points), one shuffle, no "
    "per-grid-point join; oracle = the join-then-top-1 formulation.",
)
def e14_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.gap_fill_locf(ev)


@register(
    "e17_cohort_retention",
    temporal.cohort_retention_sql(),
    doc="Cohort-retention matrix (first-activity week x weeks-since): events "
    "collapse to DISTINCT (user, week) before any windowing, so the "
    "retention counts are plain COUNT(*) over pre-deduped rows — no "
    "COUNT DISTINCT over raw events.",
)
def e17_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.cohort_retention(ev)


@register(
    "e18_heavy_hitters",
    temporal.window_heavy_hitters_sql(),
    doc="Top-%d event types per %dh tumbling window: rank runs over the "
    "pre-aggregated bucket x type frame (bounded by windows x types), "
    "never raw events; deterministic tie-break on event_type."
    % (temporal.HH_TOP_K, temporal.ROLLUP_HOURS),
)
def e18_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.window_heavy_hitters(ev)


@register(
    "e19_gap_histogram",
    temporal.gap_histogram_sql(),
    doc="Inter-event gap histogram (%d-min bins, overflow at %d): LAG pass "
    "on one user shuffle, then a map-side-combining count over a "
    "bucket-bounded key space - the arrival profile that sizes session "
    "gaps and watermarks." % (temporal.GAP_BUCKET_MIN, temporal.GAP_BUCKET_CAP),
)
def e19_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.gap_histogram(ev)


@register(
    "e20_range_window",
    temporal.trailing_range_stats_sql(),
    doc="Trailing 1h TIME-RANGE window features per event (RANGE frame on "
    "event-time millis, not a ROWS frame): co-timestamped events share a "
    "frame so the result is tie-order independent; evaluated as one "
    "ordered pass per user partition, no self-join against the band.",
)
def e20_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.trailing_range_stats(ev)


@register(
    "e21_approx_percentile",
    temporal.approx_percentile_check_sql(),
    doc="Sketch quantiles gated on the sketch's ACTUAL (rank) guarantee: "
    "for every event type and probe point p, the fraction of values at or "
    "below approx_percentile's answer must sit within %.0f%% rank error "
    "(+1/n step) of p - bounded mergeable state per group, the 100 TB "
    "replacement for e09's exact sort-based path; constant oracle, the "
    "t10/s05 gate pattern." % (temporal.APPROX_PCT_RANK_TOL * 100),
)
def e21_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.approx_percentile_check(ev)


@register(
    "e22_growth_accounting",
    temporal.growth_accounting_sql(),
    doc="Weekly growth accounting: every active user classified new / "
    "retained / resurrected (churned = prev active - retained) - distinct "
    "(user, week) first so raw events shuffle once, one LAG window over "
    "the user-week frame, churn ledger joins the one-row-per-week rollup "
    "against itself.",
)
def e22_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.growth_accounting(ev)


@register(
    "e23_user_features",
    temporal.user_features_sql(),
    doc="Feature-store export: one ML feature row per user - pivoted "
    "per-type counts over the fixed event vocabulary (static-schema "
    "pivot), total activity, recency, decimal-exact spend; ONE "
    "groupBy(user) with map-side partials, features widen the row but "
    "never add a shuffle.",
)
def e23_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.user_features(ev)


@register(
    "e25_sliding_rollup",
    temporal.sliding_rollup_sql(),
    doc="SLIDING event-time windows (%dh wide every %dh): each event lands "
    "in width/step overlapping windows - the trailing-aggregate view; "
    "Spark expands window memberships before the rollup so the x2 "
    "replication is the declared cost, still partial-aggregated map-side."
    % (temporal.SLIDE_WIDTH_H, temporal.SLIDE_STEP_H),
)
def e25_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.sliding_rollup(ev)


@register(
    "e26_event_transitions",
    temporal.event_transitions_sql(),
    doc="First-order Markov transition matrix over user event streams: "
    "(prev type -> type) counts + row-normalized probabilities - one LAG "
    "pass per user shuffle, rollup and share window bounded by types^2; "
    "the next-action/funnel-diagnosis model.",
)
def e26_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.event_transitions(ev)


@register(
    "e28_json_props",
    temporal.json_props_rollup_sql(),
    doc="Semi-structured schema-on-read: from_json with an explicit "
    "schema types the JSON props column in ONE codegen'd parse "
    "(JsonToStructs) - malformed rows become NULLs, never errors - then "
    "a per-type profile (count/missing/sum/min/max/ndv) of the extracted "
    "property; the promote-this-field-to-a-column decision query.",
)
def e28_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.json_props_rollup(ev)


@register(
    "e29_status_intervals",
    temporal.status_intervals_sql(),
    doc="SCD-Type-2 interval build: per-user same-status runs "
    "(value-change islands) -> validity intervals with open current rows "
    "- lag-detect, cumsum island ids and the valid_to lead all share ONE "
    "per-user shuffle.",
)
def e29_status_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.status_intervals(ev)


@register(
    "e30_cdc_apply",
    temporal.cdc_apply_sql(),
    doc="Batch CDC apply: changelog ops (signup->I, error->D, else->U), "
    "latest op per key wins, delete-terminal keys vanish - the "
    "MERGE-with-deletes snapshot in one keyed window pass.",
)
def e30_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.cdc_apply(ev)


@register(
    "e33_pattern_match",
    temporal.pattern_match_sql(),
    doc="MATCH_RECOGNIZE-lite CEP: user-day event sequences collapse to "
    "type-initial strings (collect_list -> array_sort -> array_join, all "
    "codegen'd, no window pass), patterns become regexes counted per "
    "GROUP row - 'vc' adjacency and 'v[ce]*p' eventual-purchase; "
    "left-to-right non-overlap counting matches both engines.",
)
def e33_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.pattern_match(ev)


@register(
    "e34_daily_anomalies",
    temporal.daily_anomalies_sql(),
    doc="Per-type daily-volume anomaly flags: |count - mean| > %d sigma "
    "decided ENTIRELY in BIGINT ((D*x-S)^2 > k^2*(D*S2-S^2) clears the "
    "division and sqrt), so boundary days can never flip between engines. "
    "One map-side-partial shuffle to daily counts; the per-type moment "
    "table joins back by broadcast." % temporal.ZSCORE_K,
)
def e34_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.daily_anomalies(events)


@register(
    "e36_variant_props",
    temporal.variant_props_rollup_sql(),
    doc="Spark 4 VARIANT semi-structured path: try_parse_json ingests props "
    "into the binary variant encoding with NO declared schema (e28's "
    "from_json twin with the schema decision deferred to query time), "
    "try_variant_get extracts typed paths per query; malformed input "
    "degrades to NULL, the rollup is bounded by event types.",
)
def e36_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.variant_props_rollup(ev)


@register(
    "e35_active_users",
    temporal.active_users_sql(),
    doc="DAU + trailing-%d-day WAU per activity day: events collapse ONCE "
    "to distinct (user, day); WAU inverts the window - each user-day fans "
    "out to the <=%d report days it supports (bounded x%d projection + "
    "dedup) instead of a per-day range self-join.  Three key-bounded "
    "shuffles, no window pass."
    % (temporal.WAU_DAYS, temporal.WAU_DAYS, temporal.WAU_DAYS),
)
def e35_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.active_users(ev)


@register(
    "e38_stream_active_users",
    temporal.active_users_sql(),
    doc="Streaming DAU/WAU (e35's twin): micro-batches append their "
    "distinct (user, day) pairs - idempotent, associative, zero streaming "
    "state - and the read side dedups across fragments before the shared "
    "rollup; finite replay equals the batch report (the oracle).",
    bench=False,  # dominated by the micro-batch write loop, not throughput
)
def e38_stream_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.streaming.ingest import run_stream_active_users

    return run_stream_active_users(spark, sf_dir)


@register(
    "e37_out_of_orderness",
    temporal.out_of_orderness_sql(),
    doc="Out-of-orderness audit per event type: lateness vs the running "
    "event-time max in arrival order, exact drop rate at the %d ms "
    "watermark budget - the measurement that calibrates every "
    "withWatermark delay in the streaming entries; one window pass per "
    "type partition + a type-bounded rollup." % temporal.LATE_BUDGET_MS,
)
def e37_out_of_orderness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.out_of_orderness(ev)


@register(
    "e39_sketch_rollup",
    temporal.sketch_rollup_sql(),
    doc="Two-level HLL DataSketches rollup (Spark 4): daily "
    "hll_sketch_agg(user) partials unioned into weekly distincts via "
    "hll_union_agg - raw events scanned once ever, later rollups merge "
    "stored KB-sized sketches; per-week estimate gated in-engine within "
    "%s of the exact count (t10's pattern, but with STORED re-mergeable "
    "state t10 cannot expose)." % temporal.SKETCH_MAX_ERR,
)
def e39_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.sketch_rollup(ev)


@register(
    "e40_stream_sketch",
    temporal.sketch_rollup_sql(),
    doc="Streaming twin of the two-level HLL rollup: micro-batches append "
    "per-day PARTIAL sketches (KB binary rows), the read side "
    "hll_union_aggs all fragments into weekly estimates - associative "
    "idempotent merge, zero streaming state, finite replay equals e39 "
    "(the oracle); the raw stream is never replayed for later rollups.",
    bench=False,  # dominated by the micro-batch write loop, not throughput
)
def e40_stream_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.streaming.ingest import run_stream_sketch_rollup

    return run_stream_sketch_rollup(spark, sf_dir)


@register(
    "e41_watermark_sweep",
    temporal.watermark_sweep_sql(),
    doc="Watermark-DELAY sweep: exact would-be-dropped count and ppm rate "
    "per (event type, candidate delay) over %d delays - e37 audits the "
    "one configured budget; this sweeps the knob so the delay is chosen "
    "from the measured lateness curve.  One window pass + one rollup; "
    "the sweep is conditional sums, never an event-row explode."
    % len(temporal.WATERMARK_SWEEP_MS),
)
def e41_watermark_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.watermark_sweep(ev)


@register(
    "e42_attribution",
    temporal.last_touch_attribution_sql(),
    doc="Last-touch revenue attribution: every purchase credits the user's "
    "most recent prior click within a 7-day window (NULL bucket kept for "
    "unattributed) - e03's as-of LOCF with the business filter; one "
    "per-user ordered window, no pair blowup.",
)
def e42_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.last_touch_attribution(ev)


@register(
    "e43_funnel_latency",
    temporal.funnel_latency_sql(),
    doc="Funnel step latency: exact p50/p95/max transition time per funnel "
    "hop for converting users - e08 counts WHO converts, this measures "
    "HOW LONG each hop takes; e08's one-shuffle conditional-min chain + "
    "a steps-bounded unpivot, approx_percentile the documented 100 TB "
    "swap.",
)
def e43_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.funnel_latency(ev)


@register(
    "e44_incremental_rollup",
    temporal.incremental_rollup_sql(),
    doc="Incremental aggregate maintenance: stored per-(day, type) partials "
    "(count + integer-micro sums) merged with the delta's partials by "
    "re-aggregation; the oracle aggregates raw history directly, so hash "
    "equality proves merge(rollup(old), rollup(delta)) == rollup(all) - "
    "the mergeable-monoid pattern that makes a daily 100 TB rollup cost "
    "one delta scan (e39's sketch form, for exact sums).",
)
def e44_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.incremental_rollup(ev)


@register(
    "e45_session_funnel",
    temporal.session_funnel_sql(),
    doc="Session-scoped funnel: sessions (e02's inactivity-gap visits) "
    "containing the ordered step chain - e08 measures lifetime "
    "conversion, this measures conversion per VISIT; one session-id "
    "window then e08's chained conditional-min joins per (user, "
    "session), a row per session, never an event blowup.",
)
def e45_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.session_funnel(ev)


@register(
    "e46_ohlc_bars",
    temporal.ohlc_bars_sql(),
    doc="OHLC downsampling: per (event_type, %sh bar) open/high/low/close "
    "+ volume - the time-series compaction that makes dashboard reads "
    "O(bars) not O(events); open/close picked by a deterministic "
    "row_number over (ts, event_id) (never first()/min_by, whose ties "
    "are engine-luck), both windows share one bar-key shuffle."
    % temporal.BAR_HOURS,
)
def e46_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.ohlc_bars(ev)


@register(
    "e47_ewma_daily",
    temporal.ewma_daily_sql(),
    doc="Dyadic-weight EWMA over the per-(type, day) series: "
    "floor(sum 2^(7-j) v_(t-j) / sum 2^(7-j)) over the last %s observed "
    "days in integer micros - the halving-weight smoother is the "
    "hash-replayable stand-in for float EWMA (alpha=1/2, warm-up "
    "corrected); one rollup shuffle + ONE ordered window with constant "
    "lag depth." % temporal.EWMA_SPAN,
)
def e47_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.ewma_daily(ev)


@register(
    "e48_seasonality_profile",
    temporal.seasonality_profile_sql(),
    doc="Seasonality fingerprint: per event_type the (day-of-week, "
    "hour-of-day) grid - events, decimal value mass, ppm share, peak "
    "cell flag - the profile that schedules off-peak maintenance and "
    "exposes bot traffic; one rollup on (type, dow, hour) then windows "
    "over a <=168-cell frame, dow from pure epoch-day arithmetic "
    "(locale-immune).",
)
def e48_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.seasonality_profile(ev)


@register(
    "e49_cusum_shifts",
    temporal.cusum_shifts_sql(),
    doc="CUSUM mean-shift detection per (event_type, day): cumulative "
    "deviation from the flat-mean expectation, scaled by n_days so the "
    "statistic is PURE BIGINT (n*cum_i - i*total, no division), flagged "
    "past %d%% of total mass - catches regime changes e34's per-day "
    "z-scores miss; one rollup + one per-type ordered window."
    % temporal.CUSUM_THRESHOLD_PCT,
)
def e49_cusum_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.cusum_shifts(ev)


from spj_query_engine_spark.streaming.stateful import tws_running_totals_sql


@register(
    "e32_tws_running_totals",
    tws_running_totals_sql(),
    doc="Per-user running totals on Spark 4's transformWithStateInPandas "
    "(typed ValueState handles - the successor to applyInPandasWithState's "
    "opaque tuple), with RUNTIME API SELECTION: where the TWS state-server "
    "protocol's google.protobuf dependency is absent the identical state "
    "machine runs on applyInPandasWithState instead; both fold integer "
    "cents in event order, emit post-batch snapshots, and reduce finite "
    "replay (max-count snapshot per user) to the batch rollup the oracle "
    "computes.",
    bench=False,  # dominated by the micro-batch replay loop, not throughput
)
def e32_tws_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.streaming import stateful

    out = stateful.run_running_totals_auto(spark, sf_dir)
    # selector assertion (mirrors e32f): whichever branch ran must agree
    # with the capability probes — a TWS selection on a session where the
    # driver-side API is not importable would mean the probe and the
    # execution path diverged, i.e. this proof no longer certifies what
    # its name claims
    if stateful.SELECTED_API == "tws":
        assert stateful.tws_available(), (
            "e32 selected TWS but tws_available() is False post-run"
        )
    else:
        assert stateful.SELECTED_API == "apws", stateful.SELECTED_API
    return out


@register(
    "e32f_tws_forced",
    tws_running_totals_sql(),
    doc="The SAME running-totals state machine as e32, but the TWS branch "
    "is FORCED: the entry raises loudly if transformWithStateInPandas is "
    "not runnable on the driver's session instead of falling back, so the "
    "driver's oracle (not just pytest) certifies the TWS execution path - "
    "a silent apws fallback can no longer masquerade as TWS coverage. "
    "SELF-PROVISIONING: where no real protobuf exists and the session's "
    "JVM was launched without the shim on PYTHONPATH (the driver builds "
    "its SparkSession before importing this package), tws_runnable "
    "installs the vendored wire-format shim as a usersite .pth - appended "
    "to every fresh interpreter's sys.path, so the JVM-spawned state "
    "worker resolves it regardless of launch env - and verifies with a "
    "fresh-interpreter probe before selecting TWS.",
    bench=False,  # same replay-loop-dominated shape as e32
)
def e32f_tws_forced(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.streaming import stateful

    if not stateful.tws_runnable(spark):
        raise RuntimeError(
            "transformWithStateInPandas is not runnable on this session: "
            "google.protobuf resolves neither from site-packages nor from "
            "the vendored shim on the JVM's launch PYTHONPATH"
        )
    stateful.ensure_protobuf(spark)
    out = stateful.run_tws_running_totals(spark, sf_dir)
    # materialize through the TWS query BEFORE asserting, then double-check
    # the selector agrees this session could not have fallen back
    assert stateful.tws_available(), "TWS availability probe regressed"
    return out


@register(
    "e50_session_ttl",
    __import__(
        "spj_query_engine_spark.streaming.stateful", fromlist=["sessionize_ttl_sql"]
    ).sessionize_ttl_sql(),
    doc="Bounded-state streaming sessionize: withWatermark + "
    "GroupStateTimeout.EventTimeTimeout on applyInPandasWithState - "
    "gap-closed sessions emit immediately, each user's open tail waits in "
    "state with a timer at end+gap and is emitted-and-EXPIRED when the "
    "watermark passes it, so every row is final (append semantics) and "
    "state is O(users inside the watermark horizon). Oracle: batch "
    "sessionization minus each user's last session unless the final "
    "watermark strictly passed its close.",
)
def e50_session_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spj_query_engine_spark.streaming.stateful import (
        run_stateful_sessionize_ttl,
    )

    return run_stateful_sessionize_ttl(spark, sf_dir)

"""Temporal operators: as-of join, range join, tumbling rollup, sessionize.

Beyond-reference capability — the reference has no time type at all (INT /
STRING / REAL only, ``src/qp/utils/Attribute.java:11-13``).  These are the
event-time primitives a training-data/feature pipeline needs; batch forms
here, streaming variants in :mod:`spj_query_engine_spark.streaming`.

Spark has no native AS-OF join (Flink's temporal join / DuckDB's ASOF JOIN /
pandas merge_asof are the reference points), so it is built as a composition:
equi-join on the entity key + time-inequality filter + per-left-row top-1
window — all shuffle-on-key operations Catalyst handles.  For very large
builds where one event matches thousands of historical orders, the
``applyInPandas`` + ``pd.merge_asof`` per-key variant (``asof_join_pandas``)
avoids the intermediate blowup; both produce identical results.

100 TB notes: every operator shuffles exactly once on its natural key
(entity id or time bucket).  The tumbling rollup pre-aggregates map-side;
sessionization is one window pass per entity partition; the range join's
candidate set is bounded by the equi key plus the time band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spj_query_engine_spark.functions.hashing import portable_round, portable_round_sql

ROLLUP_HOURS = 6  # tumbling window width for the batch rollup
SESSION_GAP_MIN = 30  # sessionization inactivity gap
RANGE_DAYS = 7  # ± band for the range join


def _ts_seconds(col: str) -> F.Column:
    """Exact epoch seconds for TIMESTAMP / TIMESTAMP_NTZ columns."""
    return (F.unix_millis(F.col(col).cast(T.TimestampType())) / 1000.0)


def tumbling_rollup(events: DataFrame, hours: int = ROLLUP_HOURS) -> DataFrame:
    """Tumbling event-time window aggregate: floor(epoch/width) buckets per
    event_type; decimal-exact value sums.  Map-side partial aggregation means
    the shuffle carries one row per (task, bucket, type) — at 100 TB this is
    the canonical pre-aggregated rollup shape.  (The streaming twin uses
    ``F.window`` + watermark; same semantics.)"""
    width = hours * 3600
    bucket = F.floor(F.unix_millis(F.col("ts").cast(T.TimestampType())) / F.lit(width * 1000))
    return (
        events.groupBy(
            bucket.cast("long").alias("bucket"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .withColumn("window_start_ms", F.col("bucket") * (width * 1000))
    )


def tumbling_rollup_sql(table: str = "events", hours: int = ROLLUP_HOURS) -> str:
    width_ms = hours * 3600 * 1000
    return f"""
    SELECT floor(epoch_ms(ts) / {width_ms})::BIGINT AS bucket,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           floor(epoch_ms(ts) / {width_ms})::BIGINT * {width_ms} AS window_start_ms
    FROM {table}
    GROUP BY 1, 2
    """


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Sessionization: per user, a new session starts after an inactivity gap.
    One shuffle (partition by user), one sort per partition, two window
    passes — the classic lag+cumsum formulation.  Ordering ties break on
    event_id so both engines number sessions identically."""
    gap_ms = gap_minutes * 60 * 1000
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    with_gap = events.select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
        F.col("value"),
    ).withColumn(
        "new_session",
        F.when(
            (F.col("ts_ms") - F.lag("ts_ms").over(w)) > gap_ms, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    with_sid = with_gap.withColumn(
        "session_no",
        F.sum(F.when(F.lag("ts_ms").over(w).isNull(), 1).otherwise(F.col("new_session"))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_sid.groupBy("user_id", "session_no").agg(
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def sessionize_sql(table: str = "events", gap_minutes: int = SESSION_GAP_MIN) -> str:
    gap_ms = gap_minutes * 60 * 1000
    return f"""
    WITH base AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM {table}
    ),
    gapped AS (
      SELECT *,
             CASE WHEN lag(ts_ms) OVER w IS NULL THEN 1
                  WHEN ts_ms - lag(ts_ms) OVER w > {gap_ms} THEN 1
                  ELSE 0 END AS new_session
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
    ),
    sid AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM gapped
    )
    SELECT user_id, session_no::BIGINT AS session_no,
           min(ts_ms) AS session_start_ms, max(ts_ms) AS session_end_ms,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM sid GROUP BY user_id, session_no
    """


def asof_join(events: DataFrame, orders: DataFrame) -> DataFrame:
    """AS-OF join, join+window REFERENCE formulation (oracle replay only).

    For each event, the latest order of the same customer at or before the
    event time (inner flavor: unmatched events drop).  Equi-join on the
    entity key, time filter, then top-1 per event via a window ordered
    (o_orderdate DESC, o_orderkey DESC) — the explicit tie-break DuckDB's
    native ASOF JOIN leaves unspecified, which is why the oracle uses this
    same window formulation.

    SCALE WARNING: this shape materializes events x per-customer order
    history before pruning — O(events_u * k) intermediate rows per customer
    with k orders, the classic as-of blowup on deep histories.  It exists
    so tests can prove the production shape equivalent to the textbook
    definition; the registered e03 entry and any real pipeline use
    :func:`asof_join_locf` (union + one shuffle + running
    ``last(ignorenulls)``, O(events + orders) rows end to end)."""
    e = events.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
    )
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.unix_millis(F.col("o_orderdate").cast(T.TimestampType())).alias("odate_ms"),
        "o_totalprice",
    )
    joined = e.join(o, (e.user_id == o.o_custkey) & (o.odate_ms <= e.ts_ms))
    w = Window.partitionBy("event_id").orderBy(F.desc("odate_ms"), F.desc("o_orderkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts_ms",
            "o_orderkey",
            "odate_ms",
            portable_round(F.col("o_totalprice"), 2).alias("o_totalprice"),
        )
    )


def asof_join_sql(events: str = "events", orders: str = "orders") -> str:
    price = portable_round_sql("o_totalprice", 2)
    return f"""
    WITH j AS (
      SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
             o.o_orderkey, epoch_ms(o.o_orderdate) AS odate_ms, o.o_totalprice,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM {events} e JOIN {orders} o
        ON e.user_id = o.o_custkey AND epoch_ms(o.o_orderdate) <= epoch_ms(e.ts)
    )
    SELECT event_id, user_id, ts_ms, o_orderkey, odate_ms, {price} AS o_totalprice
    FROM j WHERE rn = 1
    """


def asof_join_pandas(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Same AS-OF semantics via ``applyInPandas`` + ``pd.merge_asof`` per
    customer partition — the variant to prefer when each event would match a
    deep order history (avoids the join-then-filter intermediate).  Arrow
    batches; one shuffle on the entity key."""
    import pandas as pd

    e = events.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
    )
    o = orders.select(
        F.col("o_custkey").alias("user_id"),
        "o_orderkey",
        F.unix_millis(F.col("o_orderdate").cast(T.TimestampType())).alias("odate_ms"),
        "o_totalprice",
    )
    both = e.withColumn("side", F.lit("e")).unionByName(
        o.select(
            F.col("o_orderkey").alias("event_id"),
            "user_id",
            F.col("odate_ms").alias("ts_ms"),
            "o_totalprice",
        ).withColumn("side", F.lit("o")),
        allowMissingColumns=True,
    )

    # carry order payloads through the same keyed frame (null on event rows)
    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ev = pdf[pdf.side == "e"][["event_id", "user_id", "ts_ms"]].sort_values(
            ["ts_ms", "event_id"]
        )
        od = pdf[pdf.side == "o"][["event_id", "ts_ms", "o_totalprice"]].rename(
            columns={"event_id": "o_orderkey", "ts_ms": "odate_ms"}
        )
        od = od.sort_values(["odate_ms", "o_orderkey"], ascending=[True, True])
        # merge_asof keeps the LAST row per time among ties → ties break on
        # the highest o_orderkey, matching the window formulation
        out = pd.merge_asof(
            ev,
            od,
            left_on="ts_ms",
            right_on="odate_ms",
            direction="backward",
        )
        return out.dropna(subset=["o_orderkey"])

    schema = (
        "event_id long, user_id long, ts_ms long, o_orderkey double, "
        "odate_ms double, o_totalprice double"
    )
    return (
        both.groupBy("user_id")
        .applyInPandas(lambda key, pdf: merge(key, pdf), schema)
        .select(
            "event_id",
            "user_id",
            "ts_ms",
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("odate_ms").cast("long").alias("odate_ms"),
            portable_round(F.col("o_totalprice"), 2).alias("o_totalprice"),
        )
    )


RANGE_MINUTES = 60  # ± band for the event-to-event range join


def range_join(events: DataFrame, minutes: int = RANGE_MINUTES) -> DataFrame:
    """Range join (self): per 'purchase' event, aggregate the same user's
    OTHER events inside ts ± minutes.  The equi key (user_id) bounds the
    candidates; the time band is a residual filter evaluated inside the hash
    join.  For a pure range join with no equi key, bucketize the time axis to
    band-width buckets and equi-join on bucket∈{b-1,b,b+1} — same template."""
    band_ms = minutes * 60 * 1000
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
        "value",
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"),
        F.col("ts_ms").alias("p_ts"),
    )
    joined = p.join(
        e,
        (p.p_user == e.user_id)
        & (e.ts_ms >= p.p_ts - band_ms)
        & (e.ts_ms <= p.p_ts + band_ms)
        & (e.event_id != p.p_id),
    )
    return joined.groupBy("p_id").agg(
        F.count(F.lit(1)).alias("n_nearby"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def range_join_sql(events: str = "events", minutes: int = RANGE_MINUTES) -> str:
    band_ms = minutes * 60 * 1000
    return f"""
    SELECT p.event_id AS p_id,
           count(*) AS n_nearby,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM {events} p JOIN {events} e
      ON p.user_id = e.user_id
     AND epoch_ms(e.ts) >= epoch_ms(p.ts) - {band_ms}
     AND epoch_ms(e.ts) <= epoch_ms(p.ts) + {band_ms}
     AND e.event_id != p.event_id
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """


def asof_join_locf(events: DataFrame, orders: DataFrame) -> DataFrame:
    """AS-OF via union + last-observation-carried-forward — the 100 TB shape.

    The join-then-top-1 formulation (:func:`asof_join`) materializes every
    (event, earlier-order) pair before pruning: for a customer with k orders
    that is O(events_u * k) intermediate rows per user.  Here both inputs
    union into one stream, ONE shuffle partitions by user, and a running
    ``last(ignorenulls)`` window carries the latest order onto each event —
    O(events + orders) rows end to end, no pair blowup, no Python.

    Ordering (ts_ms, is_event, o_orderkey) reproduces the exact tie-break of
    the window formulation: at equal timestamps orders sort before events
    (as-of is at-or-before) and the LAST same-ts order wins = max
    o_orderkey.  Inner flavor: events before any order drop.
    """
    e = events.select(
        "user_id",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("long").alias("odate_ms"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    o = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.unix_millis(F.col("o_orderdate").cast(T.TimestampType())).alias("ts_ms"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        F.unix_millis(F.col("o_orderdate").cast(T.TimestampType())).alias("odate_ms"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = e.unionByName(o).select(
        "user_id",
        "ts_ms",
        "is_event",
        "event_id",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("o_orderkey"),
        F.last("odate_ms", ignorenulls=True).over(w).alias("odate_ms"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("o_totalprice"),
    )
    return carried.filter(
        (F.col("is_event") == 1) & F.col("o_orderkey").isNotNull()
    ).select(
        "event_id",
        "user_id",
        "ts_ms",
        "o_orderkey",
        "odate_ms",
        portable_round(F.col("o_totalprice"), 2).alias("o_totalprice"),
    )


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_HOURS = 24


def funnel(
    events: DataFrame,
    steps: tuple = FUNNEL_STEPS,
    window_hours: int = FUNNEL_WINDOW_HOURS,
) -> DataFrame:
    """Ordered funnel conversion: per user, did step₁ → step₂ → … happen in
    order, each within ``window_hours`` of the first step?

    Formulation: one conditional aggregation per user computes the earliest
    qualifying timestamp of every step (step k's min ts among events AFTER
    step k-1's earliest) — expressed as chained conditional MINs over ONE
    groupBy, i.e. a single shuffle carrying one row per user.  The naive
    k-way self-join is O(events^k); this is O(events).  Output: one row per
    funnel step with the user count that reached it.
    """
    window_ms = window_hours * 3600 * 1000
    e = events.select(
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
    )
    # earliest ts of step 0 per user
    agg = [
        F.min(F.when(F.col("event_type") == steps[0], F.col("ts_ms"))).alias("t0")
    ]
    per_user = e.groupBy("user_id").agg(*agg)
    # chain: step k's earliest ts strictly after step k-1's, within window.
    # Each pass is a semi-join back to events + conditional min — still one
    # row per user, equi-join on user_id.
    for k in range(1, len(steps)):
        prev = f"t{k - 1}"
        cur = f"t{k}"
        nxt = (
            e.join(per_user.select("user_id", prev), "user_id")
            .filter(
                (F.col("event_type") == steps[k])
                & F.col(prev).isNotNull()
                & (F.col("ts_ms") > F.col(prev))
            )
            .groupBy("user_id")
            .agg(F.min("ts_ms").alias(cur))
        )
        per_user = per_user.join(nxt, "user_id", "left")
    reached = []
    for k, step in enumerate(steps):
        cond = F.col(f"t{k}").isNotNull()
        if k > 0:
            cond = cond & ((F.col(f"t{k}") - F.col("t0")) <= window_ms)
        reached.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{step}")
        )
    wide = per_user.agg(*reached)
    parts = [
        F.struct(F.lit(k).alias("step_no"), F.lit(s).alias("step"), F.col(f"n_{s}").alias("n_users"))
        for k, s in enumerate(steps)
    ]
    return wide.select(F.explode(F.array(*parts)).alias("r")).select(
        F.col("r.step_no").alias("step_no"),
        F.col("r.step").alias("step"),
        F.col("r.n_users").alias("n_users"),
    )


def funnel_sql(
    table: str = "events",
    steps: tuple = FUNNEL_STEPS,
    window_hours: int = FUNNEL_WINDOW_HOURS,
) -> str:
    window_ms = window_hours * 3600 * 1000
    ctes = [
        f"e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM {table})",
        f"u0 AS (SELECT user_id, min(CASE WHEN event_type = '{steps[0]}' THEN ts_ms END) AS t0 "
        "FROM e GROUP BY user_id)",
    ]
    prev_cte, prev_col = "u0", "t0"
    for k in range(1, len(steps)):
        ctes.append(
            f"s{k} AS (SELECT e.user_id, min(e.ts_ms) AS t{k} FROM e "
            f"JOIN {prev_cte} p ON e.user_id = p.user_id "
            f"WHERE e.event_type = '{steps[k]}' AND p.{prev_col} IS NOT NULL "
            f"AND e.ts_ms > p.{prev_col} GROUP BY e.user_id)"
        )
        ctes.append(
            f"u{k} AS (SELECT p.*, s{k}.t{k} FROM {prev_cte} p "
            f"LEFT JOIN s{k} ON p.user_id = s{k}.user_id)"
        )
        prev_cte, prev_col = f"u{k}", f"t{k}"
    conds = []
    for k, s in enumerate(steps):
        c = f"t{k} IS NOT NULL"
        if k > 0:
            c += f" AND (t{k} - t0) <= {window_ms}"
        conds.append(
            f"SELECT {k} AS step_no, '{s}' AS step, "
            f"CAST(SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS n_users FROM {prev_cte}"
        )
    return "WITH " + ",\n    ".join(ctes) + "\n" + " UNION ALL ".join(conds)


PCT_POINTS = (0.5, 0.95, 0.99)


def value_percentiles(events: DataFrame, points: tuple = PCT_POINTS) -> DataFrame:
    """Exact per-group percentiles of the value column (linear
    interpolation — identical to DuckDB's quantile_cont).

    Exact percentile is a sort-based aggregate; at 100 TB swap in
    ``approx_percentile`` (t-digest, single pass, mergeable partials) and
    accept the documented error bound — the query shape (one groupBy
    shuffle) does not change.
    """
    aggs = [
        portable_round(F.expr(f"percentile(value, {p})"), 4).alias(
            f"p{str(p).replace('0.', '')}"
        )
        for p in points
    ]
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), *aggs
    )


def value_percentiles_sql(table: str = "events", points: tuple = PCT_POINTS) -> str:
    cols = ", ".join(
        f"{portable_round_sql(f'quantile_cont(value, {p})', 4)} AS p{str(p).replace('0.', '')}"
        for p in points
    )
    return f"""
    SELECT event_type, count(*) AS n, {cols}
    FROM {table} GROUP BY event_type
    """


MOV_WINDOW = 5  # trailing-rows frame width for the moving average


def moving_stats(events: DataFrame, window: int = MOV_WINDOW) -> DataFrame:
    """Per-entity ordered-window statistics: trailing ``window``-row moving
    average of value plus inter-event gap (LAG) — the feature-engineering
    shape (rolling signals over an event stream per user).

    One shuffle on user_id, then a per-partition sort feeds BOTH window
    specs (same partitioning + ordering ⇒ Spark evaluates them in a single
    Window physical node, one sort).  No global sort, no driver state; at
    100 TB this scales with the per-user event count like sessionize.
    Ordering is total (ts_ms, event_id) so frames are engine-independent.
    """
    order = [F.col("ts_ms"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    frame = w.rowsBetween(-(window - 1), 0)
    base = events.select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
        "value",
    )
    return base.select(
        "user_id",
        "event_id",
        "ts_ms",
        portable_round(F.avg("value").over(frame), 4).alias("mov_avg"),
        (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("gap_ms"),
    )


def moving_stats_sql(table: str = "events", window: int = MOV_WINDOW) -> str:
    over = "PARTITION BY user_id ORDER BY ts_ms, event_id"
    avg = portable_round_sql(
        f"avg(value) OVER ({over} ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)",
        4,
    )
    return f"""
    WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM {table})
    SELECT user_id, event_id, ts_ms, {avg} AS mov_avg,
           ts_ms - lag(ts_ms) OVER ({over}) AS gap_ms
    FROM e
    """


def native_sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Sessionization via Spark's NATIVE ``session_window`` aggregation —
    the built-in the lag+cumsum formulation (:func:`sessionize`) reimplements
    manually.  One groupBy carries the whole computation: Catalyst merges
    overlapping [ts, ts+gap) intervals per user inside the aggregation
    (UpdatingSessionsIterator), so no window-function sort pass and no
    two-phase session numbering; in Structured Streaming the same expression
    is the state-store-backed session operator.

    Semantics note (differs from :func:`sessionize` by design):
    ``session_window`` defines a session's end as last_event + gap, so the
    oracle computes max(ts) + gap_ms; session identity (which events group
    together) is identical.  Output: one row per (user, session)."""
    gap_ms = gap_minutes * 60 * 1000
    # Truncate to MILLISECONDS before windowing: the oracle (and every other
    # temporal entry) sessionizes on epoch_ms values, while session_window
    # compares raw microsecond timestamps — sub-ms residue (the events data
    # is nanosecond-origin) would split/merge sessions differently exactly
    # at the gap boundary.
    e = events.select(
        "user_id",
        F.timestamp_millis(
            F.unix_millis(F.col("ts").cast(T.TimestampType()))
        ).alias("ts"),
        "value",
    )
    agg = e.groupBy(
        "user_id", F.session_window("ts", f"{gap_minutes} minutes").alias("sw")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
    return agg.select(
        "user_id",
        F.unix_millis(F.col("sw.start")).alias("session_start_ms"),
        F.unix_millis(F.col("sw.end")).alias("session_end_ms"),
        "n_events",
        "sum_value",
    )


def native_sessionize_sql(table: str = "events", gap_minutes: int = SESSION_GAP_MIN) -> str:
    """Oracle: the lag+cumsum formulation with session_window's end-padding
    (end = last event + gap)."""
    gap_ms = gap_minutes * 60 * 1000
    return f"""
    WITH base AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM {table}
    ),
    gapped AS (
      SELECT *,
             CASE WHEN lag(ts_ms) OVER w IS NULL THEN 1
                  WHEN ts_ms - lag(ts_ms) OVER w > {gap_ms} THEN 1
                  ELSE 0 END AS new_session
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
    ),
    sid AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM gapped
    )
    SELECT user_id,
           min(ts_ms) AS session_start_ms,
           max(ts_ms) + {gap_ms} AS session_end_ms,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM sid GROUP BY user_id, session_no
    """


GRID_MS = 86_400_000  # gap-fill grid step: 1 day


def gap_fill_locf(events: DataFrame, grid_ms: int = GRID_MS) -> DataFrame:
    """Time-series regularization: per user, a regular ``grid_ms`` grid from
    their first to last event day, each grid point carrying the value of the
    last event at or before it (LOCF) — the resample-and-fill step that
    turns irregular event streams into fixed-step feature rows.

    Shape: per-user min/max (one aggregate) → ``sequence`` + explode builds
    the grid (rows = Σ span/grid_ms, independent of event count) → grid and
    events union into one stream, ONE shuffle on user_id, and a running
    ``last(ignorenulls)`` window fills forward — the same O(n + grid) LOCF
    template as :func:`asof_join_locf`, no per-grid-point join blowup.
    Grid points before a user's first event drop (inner flavor)."""
    e = events.select(
        "user_id",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
        "event_id",
        F.col("value").cast("double").alias("value"),
    )
    span = e.groupBy("user_id").agg(
        F.floor(F.min("ts_ms") / grid_ms).alias("d0"),
        F.floor(F.max("ts_ms") / grid_ms).alias("d1"),
    )
    grid = span.select(
        "user_id", F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d")
    ).select(
        "user_id", (F.col("d") * grid_ms).alias("ts_ms")
    ).select(
        "user_id",
        "ts_ms",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    ev = e.select("user_id", "ts_ms", "event_id", "value", F.lit(0).alias("is_grid"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "is_grid", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = ev.unionByName(grid).select(
        "user_id",
        "ts_ms",
        "is_grid",
        F.last("value", ignorenulls=True).over(w).alias("locf_value"),
    )
    return carried.filter(
        (F.col("is_grid") == 1) & F.col("locf_value").isNotNull()
    ).select("user_id", F.col("ts_ms").alias("grid_ms"), "locf_value")


def gap_fill_locf_sql(table: str = "events", grid_ms: int = GRID_MS) -> str:
    """Oracle: the equivalent join-then-top-1 formulation (standard SQL, no
    IGNORE NULLS dependency) — last event at or before each grid point."""
    return f"""
    WITH e AS (
      SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value::DOUBLE AS value
      FROM {table}
    ),
    span AS (
      SELECT user_id,
             CAST(floor(min(ts_ms) / {grid_ms}) AS BIGINT) AS d0,
             CAST(floor(max(ts_ms) / {grid_ms}) AS BIGINT) AS d1
      FROM e GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(range(d0, d1 + 1)) * {grid_ms} AS grid_ms FROM span
    ),
    j AS (
      SELECT g.user_id, g.grid_ms, e.value,
             row_number() OVER (PARTITION BY g.user_id, g.grid_ms
                                ORDER BY e.ts_ms DESC, e.event_id DESC) AS rn
      FROM grid g JOIN e ON e.user_id = g.user_id AND e.ts_ms <= g.grid_ms
    )
    SELECT user_id, grid_ms, value AS locf_value FROM j WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# Cohort retention (e17) and per-window heavy hitters (e18)
# ---------------------------------------------------------------------------

COHORT_WEEK_MS = 7 * 24 * 3600 * 1000  # cohort bucket width


def cohort_retention(events: DataFrame, week_ms: int = COHORT_WEEK_MS) -> DataFrame:
    """Classic cohort-retention matrix: users grouped by first-activity week,
    counted in each subsequent week they return.

    Scale shape: the corpus collapses to DISTINCT (user, week) FIRST — one
    shuffle over a frame bounded by users × weeks, not events — then a window
    min per user and one aggregate.  ``n_users`` is ``COUNT(*)`` over rows
    already unique per (user, week), so no COUNT DISTINCT shuffle-dedup of
    raw events ever happens.  At 100 TB the distinct is the only pass that
    sees the full event stream, and it partial-aggregates map-side."""
    uw = (
        events.select(
            "user_id",
            F.floor(F.unix_millis(F.col("ts").cast(T.TimestampType())) / F.lit(week_ms))
            .cast("long")
            .alias("week"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id")
    return (
        uw.withColumn("cohort_week", F.min("week").over(w))
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def cohort_retention_sql(table: str = "events", week_ms: int = COHORT_WEEK_MS) -> str:
    return f"""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_ms(ts) / {week_ms}) AS BIGINT) AS week
      FROM {table}
    ),
    c AS (
      SELECT user_id, week, min(week) OVER (PARTITION BY user_id) AS cohort_week
      FROM uw
    )
    SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS n_users
    FROM c GROUP BY 1, 2
    """


HH_TOP_K = 3  # heavy hitters kept per window


def window_heavy_hitters(
    events: DataFrame, hours: int = ROLLUP_HOURS, k: int = HH_TOP_K
) -> DataFrame:
    """Top-k event types per tumbling window by event count.

    Built on the e01 rollup: the ranking window runs over the ALREADY
    AGGREGATED frame (one row per bucket × type — bounded by windows ×
    distinct types, independent of event count), so the per-window sort
    never sees raw events.  Ties break on event_type for a deterministic,
    oracle-stable ranking."""
    width_ms = hours * 3600 * 1000
    counts = (
        events.groupBy(
            F.floor(F.unix_millis(F.col("ts").cast(T.TimestampType())) / F.lit(width_ms))
            .cast("long")
            .alias("bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("n_events"), F.asc("event_type"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("bucket", "event_type", "n_events", "rank")
    )


def window_heavy_hitters_sql(
    table: str = "events", hours: int = ROLLUP_HOURS, k: int = HH_TOP_K
) -> str:
    width_ms = hours * 3600 * 1000
    return f"""
    WITH counts AS (
      SELECT CAST(floor(epoch_ms(ts) / {width_ms}) AS BIGINT) AS bucket,
             event_type, count(*) AS n_events
      FROM {table} GROUP BY 1, 2
    )
    SELECT bucket, event_type, n_events, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY bucket
                                   ORDER BY n_events DESC, event_type ASC) AS rank
      FROM counts
    ) WHERE rank <= {k}
    """


GAP_BUCKET_MIN = 1  # histogram bucket width (minutes)
GAP_BUCKET_CAP = 120  # buckets above this collapse into one overflow bin


def gap_histogram(
    events: DataFrame,
    bucket_min: int = GAP_BUCKET_MIN,
    cap: int = GAP_BUCKET_CAP,
) -> DataFrame:
    """Distribution of inter-event gaps (e19): per-user consecutive-event
    deltas, bucketed into ``bucket_min``-minute bins with one overflow bin
    at ``cap`` — the arrival-process profile that sizes sessionization gaps
    and streaming watermarks.

    Scale shape: one shuffle (partition by user) for the LAG pass, then a
    map-side-combining count over at most ``cap + 1`` integer buckets — the
    aggregate output is bounded by the bucket count, independent of event
    volume."""
    bucket_ms = bucket_min * 60 * 1000
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gaps = (
        events.select(
            "user_id",
            "event_id",
            F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
        )
        .withColumn("gap_ms", F.col("ts_ms") - F.lag("ts_ms").over(w))
        .filter(F.col("gap_ms").isNotNull())
    )
    return (
        gaps.select(
            F.least(F.floor(F.col("gap_ms") / F.lit(bucket_ms)), F.lit(cap))
            .cast("long")
            .alias("gap_bucket")
        )
        .groupBy("gap_bucket")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


def gap_histogram_sql(
    table: str = "events", bucket_min: int = GAP_BUCKET_MIN, cap: int = GAP_BUCKET_CAP
) -> str:
    bucket_ms = bucket_min * 60 * 1000
    return f"""
    WITH g AS (
      SELECT epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS gap_ms
      FROM {table}
    )
    SELECT CAST(least(floor(gap_ms / {bucket_ms}), {cap}) AS BIGINT) AS gap_bucket,
           count(*) AS n_gaps
    FROM g WHERE gap_ms IS NOT NULL GROUP BY 1
    """


RANGE_WINDOW_MS = 3600 * 1000  # time-range window frame width (1h)


def trailing_range_stats(events: DataFrame, window_ms: int = RANGE_WINDOW_MS) -> DataFrame:
    """Trailing TIME-RANGE window features (e20): for each event, the count
    and value-sum of the same user's events in the preceding hour INCLUDING
    the current row — a RANGE frame over event-time millis, not a ROWS
    frame (e11): frame membership depends on timestamps, so co-timestamped
    events all see the same frame and the result is tie-order independent.

    Scale shape: one shuffle (partition by user) + one ordered pass; Spark
    evaluates the range frame with a sliding two-pointer over each sorted
    partition — O(events) per user, no self-join against the hour band."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-window_ms, 0)
    )
    return (
        events.select(
            "event_id",
            "user_id",
            F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
            F.col("value"),
        )
        .select(
            "event_id",
            "user_id",
            "ts_ms",
            F.count(F.lit(1)).over(w).alias("n_prev_1h"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            .alias("sum_value_1h"),
        )
    )


def trailing_range_stats_sql(table: str = "events", window_ms: int = RANGE_WINDOW_MS) -> str:
    return f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value FROM {table}
    )
    SELECT event_id, user_id, ts_ms,
           count(*) OVER w AS n_prev_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_value_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
                 RANGE BETWEEN {window_ms} PRECEDING AND CURRENT ROW)
    """


# ---------------------------------------------------------------------------
# Approximate-percentile sketch gate (e21)
# ---------------------------------------------------------------------------

APPROX_PCT_ACC = 10_000  # GK accuracy knob: rank error <= n / accuracy
APPROX_PCT_RANK_TOL = 0.02  # allowed |rank(sketch value)/n - p| beyond the 1/n step


def approx_percentile_check(
    events: DataFrame,
    points: tuple = PCT_POINTS,
    accuracy: int = APPROX_PCT_ACC,
    rank_tol: float = APPROX_PCT_RANK_TOL,
) -> DataFrame:
    """Sketch-based quantiles — ``approx_percentile`` (Greenwald-Khanna,
    SIGMOD'01) of the value column per event type — verified IN-ENGINE
    against the sketch's ACTUAL guarantee, which is on rank, not value:
    for every group and probe point p, the fraction of the group's values
    at or below the sketch's answer must sit within ``rank_tol`` (+ the
    1/n quantization step) of p.  A value-space tolerance would be wrong
    here: in a heavy tail the gap between adjacent order statistics at
    p99 can be an arbitrary fraction of the range, so even a PERFECT
    rank-exact sketch fails a value gate on small groups.  One row
    (n_groups, within_tol) with a constant oracle — the t10/s05 pattern.

    The sketch is THE quantile tool at 100 TB: bounded mergeable state per
    group versus e09's exact path that must see every value.  The second
    pass over events here is the verification itself (counting ranks of
    the probe answers via a broadcast of groups × points probe rows)."""
    pts = ", ".join(str(p) for p in points)
    sk = events.groupBy("event_type").agg(
        F.expr(f"approx_percentile(value, array({pts}), {accuracy})").alias(
            "approx"
        )
    )
    probes = sk.select(
        "event_type", F.posexplode("approx").alias("i", "v")
    ).withColumn("p", F.element_at(F.expr(f"array({pts})"), F.col("i") + 1))
    scored = (
        events.join(F.broadcast(probes), "event_type")
        .groupBy("event_type", "p", "v")
        .agg(
            F.sum((F.col("value") <= F.col("v")).cast("long")).alias("at_or_below"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    frac = F.col("at_or_below") / F.col("n").cast("double")
    ok = F.abs(frac - F.col("p")) <= F.lit(rank_tol) + 1.0 / F.col("n")
    return scored.agg(
        F.count_distinct("event_type").cast("long").alias("n_groups"),
        F.min(ok.cast("long")).cast("long").alias("within_tol"),
    )


def approx_percentile_check_sql(table: str = "events") -> str:
    """Constant oracle: the group count is exact (DuckDB recomputes it);
    the tolerance bound is the assertion the Spark side must reproduce."""
    return (
        f"SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_groups, "
        f"CAST(CASE WHEN count(*) > 0 THEN 1 ELSE NULL END AS BIGINT) AS within_tol "
        f"FROM {table}"
    )


# ---------------------------------------------------------------------------
# Weekly growth accounting (e22)
# ---------------------------------------------------------------------------


def growth_accounting(events: DataFrame, week_ms: int = COHORT_WEEK_MS) -> DataFrame:
    """Weekly growth accounting — the product-analytics ledger: per week,
    every active user is exactly one of NEW (first-ever week), RETAINED
    (also active the week before) or RESURRECTED (active before, but not
    last week); CHURNED(w) = active(w-1) - retained(w), the users who
    did not come back.  n_new + n_retained + n_resurrected = n_active by
    construction — the invariant the test asserts.

    Scale shape (same discipline as e17): collapse to DISTINCT
    (user, week) first — the only pass over raw events, partial-aggregated
    map-side — then one LAG window per user over the user-week frame
    (bounded by users × weeks) and a weekly rollup.  The churn ledger is
    a self-join of the WEEKLY aggregate against itself at week-1: a frame
    of one row per week, broadcast for free."""
    uw = (
        events.select(
            "user_id",
            F.floor(
                F.unix_millis(F.col("ts").cast(T.TimestampType())) / F.lit(week_ms)
            )
            .cast("long")
            .alias("week"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("week")
    lab = uw.withColumn("prev", F.lag("week").over(w))
    status = (
        F.when(F.col("prev").isNull(), F.lit("new"))
        .when(F.col("week") - F.col("prev") == 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
    )
    weekly = lab.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum((status == "new").cast("long")).alias("n_new"),
        F.sum((status == "retained").cast("long")).alias("n_retained"),
        F.sum((status == "resurrected").cast("long")).alias("n_resurrected"),
    )
    prev = weekly.select(
        (F.col("week") + 1).alias("week"), F.col("n_active").alias("prev_active")
    )
    return weekly.join(prev, "week", "left").select(
        "week",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        (F.coalesce(F.col("prev_active"), F.lit(0)) - F.col("n_retained"))
        .cast("long")
        .alias("n_churned"),
    )


def growth_accounting_sql(table: str = "events", week_ms: int = COHORT_WEEK_MS) -> str:
    return f"""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_ms(ts) / {week_ms}) AS BIGINT) AS week
      FROM {table}
    ),
    lab AS (
      SELECT user_id, week,
             lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev
      FROM uw
    ),
    weekly AS (
      SELECT week, count(*) AS n_active,
             CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             CAST(SUM(CASE WHEN week - prev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             CAST(SUM(CASE WHEN prev IS NOT NULL AND week - prev > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM lab GROUP BY week
    )
    SELECT w.week, w.n_active, w.n_new, w.n_retained, w.n_resurrected,
           CAST(COALESCE(p.n_active, 0) - w.n_retained AS BIGINT) AS n_churned
    FROM weekly w LEFT JOIN weekly p ON p.week = w.week - 1
    """


# ---------------------------------------------------------------------------
# Per-user feature assembly (e23) — the feature-store export
# ---------------------------------------------------------------------------

FEATURE_TYPES = ("click", "error", "purchase", "signup", "view")


def user_features(
    events: DataFrame, types: tuple = FEATURE_TYPES
) -> DataFrame:
    """Assemble one ML feature row per user from the event stream: pivoted
    per-type counts (the fixed vocabulary makes the pivot a static column
    set — Spark's ``groupBy().pivot(col, values)`` compiles to exactly
    these conditional aggregates), total activity, recency (last-event
    time) and decimal-exact spend — the feature-store export that feeds a
    training joiner.

    Scale shape: ONE groupBy(user) pass with map-side partial aggregation;
    every feature is a conditional aggregate, so adding features widens
    the row, never adds a shuffle.  An unbounded-vocabulary pivot would be
    data-dependent schema — the fixed ``types`` tuple is the contract."""
    aggs = [
        F.sum((F.col("event_type") == t).cast("long")).alias(f"n_{t}")
        for t in types
    ]
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        *aggs,
        F.max(F.unix_millis(F.col("ts").cast(T.TimestampType()))).alias(
            "last_ts_ms"
        ),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


def user_features_sql(table: str = "events", types: tuple = FEATURE_TYPES) -> str:
    cols = ",\n           ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
        for t in types
    )
    return f"""
    SELECT user_id, count(*) AS n_events,
           {cols},
           max(epoch_ms(ts)) AS last_ts_ms,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM {table} GROUP BY user_id
    """


# ---------------------------------------------------------------------------
# Sliding-window rollup (e25)
# ---------------------------------------------------------------------------

SLIDE_WIDTH_H = 6  # window width
SLIDE_STEP_H = 3  # slide step (each event lands in width/step windows)


def sliding_rollup(
    events: DataFrame, width_h: int = SLIDE_WIDTH_H, step_h: int = SLIDE_STEP_H
) -> DataFrame:
    """SLIDING event-time window aggregate (``F.window`` with a slide):
    every event contributes to width/step overlapping windows — the
    trailing-aggregate view a monitoring/feature pipeline reads (e01's
    tumbling windows partition; these overlap).  Spark expands each row
    into its window memberships before the rollup, so the shuffle carries
    the window replication explicitly — the declared ×(width/step) cost,
    still map-side partial-aggregated per (window, type)."""
    return (
        events.groupBy(
            F.window("ts", f"{width_h} hours", f"{step_h} hours").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("wstart_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_rollup_sql(
    table: str = "events", width_h: int = SLIDE_WIDTH_H, step_h: int = SLIDE_STEP_H
) -> str:
    width = width_h * 3600 * 1000
    step = step_h * 3600 * 1000
    return f"""
    WITH ev AS (SELECT epoch_ms(ts) AS t, event_type, value FROM {table}),
    expanded AS (
      SELECT k * {step} AS wstart_ms, event_type, value
      FROM ev, unnest(range(
        CAST(floor((t - {width}) / {step}) AS BIGINT) + 1,
        CAST(floor(t / {step}) AS BIGINT) + 1)) AS u(k)
    )
    SELECT wstart_ms, event_type, count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM expanded GROUP BY wstart_ms, event_type
    """


# ---------------------------------------------------------------------------
# Event-transition (Markov) matrix (e26)
# ---------------------------------------------------------------------------


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order user-journey model: counts and row-normalized
    probabilities of every (previous event type → event type) transition
    within a user's time-ordered stream — the Markov matrix behind
    next-action prediction and funnel diagnosis.

    Scale shape: one LAG pass per user partition (ties broken on
    event_id, the e19 discipline), then a rollup + share window both
    bounded by types², never corpus size."""
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    seq = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
    ).withColumn("prev_type", F.lag("event_type").over(w))
    cells = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sw = Window.partitionBy("prev_type")
    return cells.select(
        "prev_type",
        "event_type",
        "n",
        portable_round(F.col("n") / F.sum("n").over(sw).cast("double"), 6).alias(
            "p"
        ),
    )


def event_transitions_sql(table: str = "events") -> str:
    p = portable_round_sql(
        "n / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE)", 6
    )
    return f"""
    WITH seq AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_ms(ts), event_id) AS prev_type
      FROM {table}
    ),
    cells AS (
      SELECT prev_type, event_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, event_type, n, {p} AS p FROM cells
    """


# ---------------------------------------------------------------------------
# Semi-structured property extraction (e28)
# ---------------------------------------------------------------------------


def json_props_rollup(events: DataFrame) -> DataFrame:
    """Schema-on-read over the JSON ``props`` column (e28): ``from_json``
    with an explicit schema turns the string payload into a typed struct
    in one codegen'd expression (JsonToStructs) — the semi-structured
    ingestion path every event pipeline runs; string-plucking via
    get_json_object re-parses per field, the typed struct parses once.

    Rollup per event type over the extracted property: count, null count
    (malformed/missing → NULL, never an error), exact sum/min/max and
    distinct count — the profile that decides whether a JSON field is
    promotable to a first-class column."""
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = events.select(
        "event_type", F.from_json(F.col("props"), schema).alias("p")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("p.k").isNull().cast("long")).alias("n_missing"),
        F.sum("p.k").alias("sum_k"),
        F.min("p.k").alias("min_k"),
        F.max("p.k").alias("max_k"),
        F.count_distinct(F.col("p.k")).alias("ndv_k"),
    )


def json_props_rollup_sql(table: str = "events") -> str:
    return f"""
    WITH parsed AS (
      SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM {table}
    )
    SELECT event_type, count(*) AS n_events,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           min(k) AS min_k, max(k) AS max_k,
           CAST(count(DISTINCT k) AS BIGINT) AS ndv_k
    FROM parsed GROUP BY event_type
    """


# ---------------------------------------------------------------------------
# SCD2 status intervals (e29) — value-change islands → validity ranges
# ---------------------------------------------------------------------------


def status_intervals(events: DataFrame) -> DataFrame:
    """SCD-Type-2 interval build: collapse each user's event stream into
    contiguous same-``event_type`` runs (value-change islands — the
    gaps-and-islands complement of :func:`sessionize`'s time-gap islands)
    and emit one validity interval per run: ``valid_from_ms`` = first event
    of the run, ``valid_to_ms`` = start of the next run (NULL on the open,
    current interval) — exactly the dimension-table shape a warehouse
    MERGE maintains, built here in one declarative pass.

    Scale shape: one shuffle on ``user_id`` serves the change-detect lag,
    the island cumsum AND the interval lead (all three windows share the
    per-user ordering); the groupBy between them keys on (user, island) —
    a prefix of the same partitioning, so AQE keeps it co-located.  Ties
    break on event_id, so both engines number islands identically."""
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    base = events.select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
        F.col("event_type").alias("status"),
    )
    changed = F.when(
        F.lag("status").over(w).isNull() | (F.lag("status").over(w) != F.col("status")),
        F.lit(1),
    ).otherwise(F.lit(0))
    islands = base.withColumn(
        "island",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.min("status").alias("status"),
        F.min("ts_ms").alias("valid_from_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wi = Window.partitionBy("user_id").orderBy("island")
    return runs.select(
        "user_id",
        "island",
        "status",
        "valid_from_ms",
        F.lead("valid_from_ms").over(wi).alias("valid_to_ms"),
        F.lead("valid_from_ms").over(wi).isNull().cast("int").alias("is_current"),
        "n_events",
    )


def status_intervals_sql(table: str = "events") -> str:
    return f"""
    WITH base AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type AS status
      FROM {table}
    ),
    flagged AS (
      SELECT *,
             CASE WHEN lag(status) OVER w IS NULL THEN 1
                  WHEN lag(status) OVER w <> status THEN 1
                  ELSE 0 END AS changed
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
    ),
    islands AS (
      SELECT *, SUM(changed) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS island
      FROM flagged
    ),
    runs AS (
      SELECT user_id, island, min(status) AS status,
             min(ts_ms) AS valid_from_ms, count(*) AS n_events
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, island, status, valid_from_ms,
           lead(valid_from_ms) OVER wi AS valid_to_ms,
           CAST(lead(valid_from_ms) OVER wi IS NULL AS INT) AS is_current,
           n_events
    FROM runs
    WINDOW wi AS (PARTITION BY user_id ORDER BY island)
    """


# ---------------------------------------------------------------------------
# Batch CDC apply (e30) — changelog → current snapshot with deletes
# ---------------------------------------------------------------------------

CDC_OPS = "CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END"


def cdc_apply(events: DataFrame) -> DataFrame:
    """Apply a CDC changelog to produce the CURRENT snapshot: events map to
    insert/update/delete ops (signup→I, error→D, everything else→U), the
    latest op per key wins in (ts, event_id) order, and keys whose final op
    is a DELETE vanish from the snapshot — the MERGE-with-deletes
    semantics e15's streaming upsert deliberately lacks.

    Scale shape: latest-per-key is one row_number window over the key
    partition (or equivalently max_by) — a single shuffle on the key; the
    delete filter is free.  At 100 TB the changelog naturally arrives
    partitioned by key ranges, and AQE coalesces the survivors."""
    op = F.expr(CDC_OPS)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_ms"), F.desc("event_id"))
    latest = (
        events.select(
            "user_id",
            "event_id",
            F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
            F.col("value"),
            op.alias("op"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return latest.filter(F.col("op") != "D").select(
        "user_id",
        F.col("op").alias("last_op"),
        F.col("event_id").alias("last_event_id"),
        F.col("ts_ms").alias("last_ts_ms"),
        F.col("value").alias("last_value"),
    )


def cdc_apply_sql(table: str = "events") -> str:
    return f"""
    WITH ops AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
             {CDC_OPS} AS op
      FROM {table}
    ),
    latest AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts_ms DESC, event_id DESC) AS rn
      FROM ops
    )
    SELECT user_id, op AS last_op, event_id AS last_event_id,
           ts_ms AS last_ts_ms, value AS last_value
    FROM latest WHERE rn = 1 AND op <> 'D'
    """


# ---------------------------------------------------------------------------
# Pattern matching over event sequences (e33) — MATCH_RECOGNIZE-lite CEP
# ---------------------------------------------------------------------------

PATTERN_DAY_MS = 86_400_000


def pattern_match(events: DataFrame) -> DataFrame:
    """Complex-event pattern detection (the MATCH_RECOGNIZE shape neither
    Spark nor the reference exposes as syntax): each user-day's events
    collapse — in (ts, event_id) order — into a STRING of type initials
    (click→c, error→e, purchase→p, signup→s, view→v), and patterns
    become regular expressions over that string: ``vc`` (view immediately
    followed by click) and ``v[ce]*p`` (view leading to purchase through
    any clicks/errors).  Left-to-right non-overlapping regex counting has
    identical semantics in Spark and DuckDB, so the oracle replays it.

    Scale shape: ONE groupBy per (user, day) — the sequence is built with
    ``collect_list(struct) → array_sort → transform → array_join`` (all
    codegen'd; no window pass needed because array_sort orders within the
    aggregated group), and sequence length is bounded by a user-day's
    events.  The regex scan runs per GROUP row, never per event."""
    initial = F.substring("event_type", 1, 1)
    day = (
        F.floor(F.unix_millis(F.col("ts").cast(T.TimestampType())) / PATTERN_DAY_MS)
        .cast("long")
        .alias("day")
    )
    base = events.select(
        "user_id",
        day,
        F.struct(
            F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
            F.col("event_id"),
            initial.alias("i"),
        ).alias("ev"),
    )
    agg = base.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("ev")), lambda s: s["i"]), ""
        ).alias("seq")
    )
    return agg.select(
        "user_id",
        (F.col("day") * PATTERN_DAY_MS).alias("day_ms"),
        "seq",
        F.regexp_count("seq", F.lit("vc")).cast("long").alias("n_view_click"),
        F.regexp_count("seq", F.lit("v[ce]*p")).cast("long").alias("n_funnel"),
    )


def pattern_match_sql(table: str = "events") -> str:
    return f"""
    WITH base AS (
      SELECT user_id,
             epoch_ms(ts) // {PATTERN_DAY_MS} AS day,
             epoch_ms(ts) AS ts_ms,
             event_id,
             substr(event_type, 1, 1) AS i
      FROM {table}
    ),
    agg AS (
      SELECT user_id, day,
             string_agg(i, '' ORDER BY ts_ms, event_id) AS seq
      FROM base GROUP BY user_id, day
    )
    SELECT user_id,
           day * {PATTERN_DAY_MS} AS day_ms,
           seq,
           CAST(len(regexp_extract_all(seq, 'vc')) AS BIGINT) AS n_view_click,
           CAST(len(regexp_extract_all(seq, 'v[ce]*p')) AS BIGINT) AS n_funnel
    FROM agg
    """


# ---------------------------------------------------------------------------
# Integer-exact z-score anomaly flags (e34)
# ---------------------------------------------------------------------------

ZSCORE_K = 2  # flag days beyond k standard deviations


def daily_anomalies(events: DataFrame, k: int = ZSCORE_K) -> DataFrame:
    """Per-event-type daily volume anomaly flags: a day is anomalous when its
    count deviates from the type's mean by more than ``k`` population
    standard deviations — the monitoring pass a pipeline runs before
    trusting a day's ingest.

    The z-score test is algebraically cleared of division and sqrt so it
    runs ENTIRELY in BIGINT:  (x−μ)² > k²·σ²  with  μ = S/D and
    σ² = (D·S2−S²)/D²  is equivalent to  (D·x−S)² > k²·(D·S2−S²)
    — exact integer compare, no float ever enters, so the flags
    hash-replay in DuckDB bit-for-bit (a float mean/stddev would differ in
    the last ulp between engines and flip boundary days).  Two aggregates:
    events → (type, day) counts (map-side partial, one shuffle), then the
    tiny per-type moment rollup (S, S2, D) joins back by broadcast.
    BIGINT headroom: |D·x−S| < 9.2e18 holds for daily counts up to ~1e7
    across a 30-year retention; beyond that swap the squared terms to
    DECIMAL(38,0) unchanged."""
    daily = (
        events.groupBy(
            F.col("event_type"),
            F.datediff(
                F.col("ts").cast(T.TimestampType()).cast(T.DateType()),
                F.lit("1970-01-01").cast(T.DateType()),
            ).alias("day_no"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mom = daily.groupBy(F.col("event_type").alias("et")).agg(
        F.count(F.lit(1)).alias("d_days"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    dev = F.col("d_days") * F.col("n") - F.col("s1")
    bound = F.lit(k * k) * (F.col("d_days") * F.col("s2") - F.col("s1") * F.col("s1"))
    return (
        daily.join(F.broadcast(mom), F.col("event_type") == F.col("et"))
        .select(
            "event_type",
            "day_no",
            "n",
            (dev * dev > bound).alias("is_anomaly"),
        )
    )


def daily_anomalies_sql(table: str = "events", k: int = ZSCORE_K) -> str:
    return f"""
    WITH daily AS (
      SELECT event_type,
             (CAST(ts AS DATE) - DATE '1970-01-01') AS day_no,
             CAST(count(*) AS BIGINT) AS n
      FROM {table} GROUP BY 1, 2
    ),
    mom AS (
      SELECT event_type AS et,
             CAST(count(*) AS BIGINT) AS d_days,
             CAST(SUM(n) AS BIGINT) AS s1,
             CAST(SUM(n * n) AS BIGINT) AS s2
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, CAST(d.day_no AS INT) AS day_no, d.n,
           ((m.d_days * d.n - m.s1) * (m.d_days * d.n - m.s1)
            > {k * k} * (m.d_days * m.s2 - m.s1 * m.s1)) AS is_anomaly
    FROM daily d JOIN mom m ON m.et = d.event_type
    """


# ---------------------------------------------------------------------------
# VARIANT semi-structured extraction (e36) — Spark 4's open-schema path
# ---------------------------------------------------------------------------


def variant_props_rollup(events: DataFrame) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type (e36):
    ``try_parse_json`` ingests the props column ONCE into the binary
    variant encoding — no schema declared at parse time, unlike e28's
    ``from_json`` which needs the struct spelled out — and typed access
    happens at QUERY time via ``try_variant_get`` path extraction.  This is
    the schema-on-read contract an evolving event stream needs: producers
    add fields freely, the parse never fails (malformed → NULL), and each
    query pays only for the paths it extracts.

    At 100 TB the variant column is the storage format decision: one
    binary-encoded column serves every future extraction query, where
    from_json re-parses text per query and per schema.  The rollup is
    bounded by event types; extraction is a pure codegen projection."""
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def variant_props_rollup_sql(table: str = "events") -> str:
    k = (
        "CASE WHEN json_valid(props) "
        "THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END"
    )
    return f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count({k}) AS BIGINT) AS n_with_k,
           CAST(SUM({k}) AS BIGINT) AS sum_k,
           CAST(MIN({k}) AS BIGINT) AS min_k,
           CAST(MAX({k}) AS BIGINT) AS max_k
    FROM {table} GROUP BY event_type
    """


# ---------------------------------------------------------------------------
# Active-users report (e35) — DAU + trailing-7-day WAU per day
# ---------------------------------------------------------------------------

WAU_DAYS = 7


def active_users(events: DataFrame, window_days: int = WAU_DAYS) -> DataFrame:
    """DAU and trailing-``window_days`` WAU per activity day — the
    engagement report every event pipeline publishes.  COUNT DISTINCT over
    raw events never happens: events collapse once to distinct (user, day)
    (e17's move), DAU is a plain count over that, and WAU inverts the
    window — instead of "which users were active in [d-6, d]?" per day
    (a range self-join), each user-day FANS OUT to the ≤ 7 report days it
    supports (a bounded ×7 projection), dedups per (user, report day), and
    counts.  Three key-bounded shuffles, no window pass, no range join.
    Report days are restricted to days with actual activity."""
    day = F.datediff(
        F.col("ts").cast(T.TimestampType()).cast(T.DateType()),
        F.lit("1970-01-01").cast(T.DateType()),
    )
    ud = events.select(F.col("user_id"), day.alias("day_no")).distinct()
    return active_users_from_ud(ud, window_days)


def active_users_from_ud(ud: DataFrame, window_days: int = WAU_DAYS) -> DataFrame:
    """The DAU/WAU rollup over an already-deduplicated (user_id, day_no)
    frame — shared by the batch operator and the streaming twin (which
    accumulates user-days incrementally)."""
    dau = ud.groupBy("day_no").agg(F.count(F.lit(1)).alias("dau"))
    expanded = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day_no"), F.col("day_no") + F.lit(window_days - 1)
                )
            ).alias("report_day"),
        )
        .distinct()
    )
    wau = expanded.groupBy("report_day").agg(F.count(F.lit(1)).alias("wau"))
    return (
        dau.join(wau, F.col("report_day") == F.col("day_no"))
        .select(F.col("day_no").cast("int").alias("day_no"), "dau", "wau")
    )


def active_users_sql(table: str = "events", window_days: int = WAU_DAYS) -> str:
    return f"""
    WITH ud AS MATERIALIZED (
      SELECT DISTINCT user_id,
             (CAST(ts AS DATE) - DATE '1970-01-01') AS day_no
      FROM {table}
    ),
    dau AS (SELECT day_no, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day_no),
    expanded AS (
      SELECT DISTINCT user_id, day_no + i AS report_day
      FROM ud, unnest(range(0, {window_days})) AS u(i)
    ),
    wau AS (SELECT report_day, CAST(count(*) AS BIGINT) AS wau
            FROM expanded GROUP BY report_day)
    SELECT CAST(dau.day_no AS INT) AS day_no, dau.dau, wau.wau
    FROM dau JOIN wau ON wau.report_day = dau.day_no
    """


# ---------------------------------------------------------------------------
# Out-of-orderness audit (e37) — the measurement that calibrates watermarks
# ---------------------------------------------------------------------------

LATE_BUDGET_MS = 300_000  # the candidate watermark delay under audit: 5 min


def _lateness_scan(events: DataFrame, chunk_span: int = 65536) -> DataFrame:
    """(event_type, late_ms) for every event: running max of event time over
    arrival order (event_id) within the type, minus the event's own time —
    as a TWO-LEVEL parallel prefix scan.  A plain per-type window serializes
    each type into ONE task (measured 22x wall at 100x input with a handful
    of types); here level 1 scans within (type, event_id-range chunk) —
    thousands of independent tasks — and level 2 prefix-maxes the tiny
    per-chunk-max table and broadcasts it back:
    lateness_i = max(in-chunk running max, max of all PRIOR chunks) - ts_i."""
    ts_ms = F.unix_millis(F.col("ts").cast(T.TimestampType()))
    e = events.select(
        "event_type",
        "event_id",
        ts_ms.alias("ts_ms"),
        F.expr(f"event_id div {chunk_span}").alias("chunk"),
    )
    wc = (
        Window.partitionBy("event_type", "chunk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inchunk = e.withColumn("run_max", F.max("ts_ms").over(wc))
    wp = (
        Window.partitionBy("event_type")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = (
        e.groupBy("event_type", "chunk")
        .agg(F.max("ts_ms").alias("cmax"))
        .withColumn("pmax", F.max("cmax").over(wp))
        .select("event_type", "chunk", "pmax")
    )
    # greatest() skips the NULL pmax of each type's first chunk
    return inchunk.join(F.broadcast(prior), ["event_type", "chunk"]).select(
        "event_type",
        (F.greatest(F.col("run_max"), F.col("pmax")) - F.col("ts_ms")).alias(
            "late_ms"
        ),
    )


def out_of_orderness(events: DataFrame) -> DataFrame:
    """Per-type OUT-OF-ORDERNESS audit: how late events actually arrive,
    measured against the max event-time already seen in arrival order —
    the number every watermark in this repo (e05/e13/e16/e27/e38's
    ``withWatermark`` delays) should be calibrated FROM, not guessed.

    Arrival order is ``event_id`` (the ingest sequence); an event's
    lateness is ``running_max(ts) − ts`` over that order within its type.
    Any event with lateness above the configured watermark delay is one a
    streaming job would have DROPPED — ``frac_beyond_budget`` is therefore
    the exact data-loss rate the current ``LATE_BUDGET_MS`` buys.

    Shape: the running max is the shared two-level prefix scan
    (``_lateness_scan`` — chunked in-chunk windows + a broadcast prior-chunk
    prefix max, thousands of tasks instead of one per type), then a
    type-bounded rollup.  The exact p95 is percentile over BIGINT lateness
    (e09's documented approx_percentile swap applies at 100 TB); everything
    else is integer max/count, so the hash can never drift."""
    late = _lateness_scan(events)
    frac = F.sum(
        F.when(F.col("late_ms") > LATE_BUDGET_MS, 1).otherwise(0)
    ).cast("double") / F.count(F.lit(1)).cast("double")
    return late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("late_ms") > 0, 1).otherwise(0)).alias("n_late"),
        F.max("late_ms").alias("max_late_ms"),
        portable_round(F.expr("percentile(late_ms, 0.95)"), 2).alias("p95_late_ms"),
        portable_round(frac, 6).alias("frac_beyond_budget"),
    )


def out_of_orderness_sql(table: str = "events") -> str:
    over = (
        "PARTITION BY event_type ORDER BY event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    frac = (
        "sum(CASE WHEN late_ms > %d THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE"
        % LATE_BUDGET_MS
    )
    return f"""
    WITH e AS (SELECT event_type, event_id, epoch_ms(ts) AS ts_ms FROM {table}),
    late AS (
      SELECT event_type, max(ts_ms) OVER ({over}) - ts_ms AS late_ms FROM e
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(max(late_ms) AS BIGINT) AS max_late_ms,
           {portable_round_sql("quantile_cont(late_ms, 0.95)", 2)} AS p95_late_ms,
           {portable_round_sql(frac, 6)} AS frac_beyond_budget
    FROM late GROUP BY event_type
    """


# ---------------------------------------------------------------------------
# Two-level sketch rollup (e39) — distinct counting from stored partials
# ---------------------------------------------------------------------------

SKETCH_LG_K = 12  # HLL lgConfigK → ~0.8% typical error, 2^12 registers
SKETCH_MAX_ERR = 0.05  # per-week relative-error gate vs the exact count


def sketch_rollup(events: DataFrame) -> DataFrame:
    """Two-level mergeable-sketch distinct counting (Spark 4 Apache
    DataSketches surface): DAILY ``hll_sketch_agg(user_id)`` partials,
    then WEEKLY distinct users by ``hll_union_agg`` over the stored day
    sketches — the raw events are touched exactly once, ever.  This is
    THE 100 TB cardinality pattern: persist the ~KB day sketches and any
    later rollup (week, month, arbitrary ranges, cross-product with other
    dimensions) is a union of partials, never a re-scan — the property
    ``approx_count_distinct`` (t10) alone cannot give, because its
    intermediate sketch is not exposed for storage or re-aggregation.

    Like t10/s05, the sketch hash isn't replayable in DuckDB, so the
    OUTCOME is gated in-engine: each week's estimate must land within
    ``SKETCH_MAX_ERR`` of the exact distinct count; the oracle recomputes
    the exact count and asserts the flag."""
    base = events.select(
        (F.unix_millis(F.col("ts").cast(T.TimestampType())) / F.lit(86_400_000))
        .cast("long")
        .alias("day_no"),
        "user_id",
    )
    day_sketch = base.groupBy("day_no").agg(
        F.hll_sketch_agg("user_id", F.lit(SKETCH_LG_K)).alias("sk")
    )
    weekly_est = (
        day_sketch.withColumn("week_no", (F.col("day_no") / 7).cast("long"))
        .groupBy("week_no")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"))
    )
    weekly_exact = base.withColumn(
        "week_no", (F.col("day_no") / 7).cast("long")
    ).groupBy("week_no").agg(F.count_distinct("user_id").alias("exact_users"))
    rel_err = F.abs(F.col("est_users") - F.col("exact_users")) / F.greatest(
        F.col("exact_users"), F.lit(1)
    )
    return weekly_est.join(weekly_exact, "week_no").select(
        "week_no",
        "exact_users",
        (rel_err <= SKETCH_MAX_ERR).cast("long").alias("est_ok"),
    )


def sketch_rollup_sql(table: str = "events") -> str:
    """Oracle: exact weekly distinct users (replayable); the sketch bound
    is the in-engine assertion — every week's flag must be 1."""
    return f"""
    SELECT ((epoch_ms(ts) // 86400000) // 7) AS week_no,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           1::BIGINT AS est_ok
    FROM {table}
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Watermark-delay sweep (e41) — design-of-experiments for the watermark knob
# ---------------------------------------------------------------------------

WATERMARK_SWEEP_MS = (0, 10_000, 60_000, 300_000, 900_000)  # candidate delays


def watermark_sweep(events: DataFrame) -> DataFrame:
    """WATERMARK-DELAY sweep: for every candidate delay, the exact number
    of events a streaming job with that ``withWatermark`` setting would
    DROP as late — the delay → data-loss curve (d21 is to d02 what this
    is to e37: e37 audits ONE configured budget; this sweeps the knob so
    the budget is CHOSEN from data, not guessed).

    An event is dropped iff its lateness — running max of event time over
    arrival order (event_id) within its type, minus its own event time —
    EXCEEDS the delay; that is precisely Structured Streaming's drop rule
    on a per-key watermark.  drop_ppm is integer (n_dropped·10⁶ div n),
    so the hash can never drift.

    Shape: the running max is the shared two-level prefix scan
    (``_lateness_scan`` — chunked in-chunk windows + a broadcast
    prior-chunk prefix max), then the sweep is a conditional-sum ROLLUP —
    the candidate array never multiplies the event rows (no explode), so
    sweeping 5 or 50 delays costs the same shuffle."""
    late = _lateness_scan(events)
    per_type = late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.sum(F.when(F.col("late_ms") > d, 1).otherwise(0)).alias(f"drop_{d}")
            for d in WATERMARK_SWEEP_MS
        ],
    )
    # unpivot the sweep to (event_type, delay_ms, n_dropped, drop_ppm) rows
    stacked = per_type.select(
        "event_type",
        "n_events",
        F.expr(
            "stack(%d, %s) AS (delay_ms, n_dropped)"
            % (
                len(WATERMARK_SWEEP_MS),
                ", ".join(f"{d}L, drop_{d}" for d in WATERMARK_SWEEP_MS),
            )
        ),
    )
    return stacked.select(
        "event_type",
        "delay_ms",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        F.expr("(n_dropped * 1000000) div n_events").cast("long").alias("drop_ppm"),
    )


def watermark_sweep_sql(table: str = "events") -> str:
    over = (
        "PARTITION BY event_type ORDER BY event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    delays = ", ".join(f"({d})" for d in WATERMARK_SWEEP_MS)
    return f"""
    WITH e AS (SELECT event_type, event_id, epoch_ms(ts) AS ts_ms FROM {table}),
    late AS (
      SELECT event_type, max(ts_ms) OVER ({over}) - ts_ms AS late_ms FROM e
    )
    SELECT event_type,
           d.delay_ms::BIGINT AS delay_ms,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_ms > d.delay_ms THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST((sum(CASE WHEN late_ms > d.delay_ms THEN 1 ELSE 0 END) * 1000000)
             // count(*) AS BIGINT) AS drop_ppm
    FROM late, (VALUES {delays}) AS d(delay_ms)
    GROUP BY event_type, d.delay_ms
    """


# ---------------------------------------------------------------------------
# Last-touch attribution (e42) — revenue → most recent prior click
# ---------------------------------------------------------------------------

ATTR_WINDOW_MS = 7 * 86_400_000  # 7-day attribution window


def last_touch_attribution(events: DataFrame) -> DataFrame:
    """LAST-TOUCH revenue attribution: every purchase credits the user's
    most recent prior click, but only within a %d-day window — the
    marketing-analytics join (e03's as-of LOCF with a business filter and
    a NULL bucket: purchases with no qualifying click stay unattributed
    rather than silently dropping).

    Shape: one union of the two event slices, ONE per-user ordered window
    (last non-null click id carried forward — LOCF, no pair blowup), the
    window cap a pure filter expression.  Output per purchase: the
    credited click (or NULL), the click→purchase gap, the credited value.
    At 100 TB this is exactly e03's documented scale path: partition the
    window by (user, day-bucket) with a carry row per bucket boundary."""
    e = events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
    ).filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # carry the latest STRICTLY-PRIOR click forward onto every event
    with_click = e.select(
        "*",
        F.last(
            F.when(F.col("event_type") == "click", F.col("event_id")),
            ignorenulls=True,
        )
        .over(w)
        .alias("click_id_raw"),
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts_ms")),
            ignorenulls=True,
        )
        .over(w)
        .alias("click_ts_raw"),
    )
    in_window = (F.col("ts_ms") - F.col("click_ts_raw")) <= ATTR_WINDOW_MS
    return (
        with_click.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(in_window, F.col("click_id_raw")).alias("click_id"),
            F.when(in_window, F.col("ts_ms") - F.col("click_ts_raw"))
            .cast("long")
            .alias("gap_ms"),
            "value",
            F.when(in_window, F.lit(1)).otherwise(0).cast("long").alias("attributed"),
        )
    )


last_touch_attribution.__doc__ = last_touch_attribution.__doc__ % (
    ATTR_WINDOW_MS // 86_400_000
)


def last_touch_attribution_sql(table: str = "events") -> str:
    over = (
        "PARTITION BY user_id ORDER BY ts_ms, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    )
    return f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS ts_ms
      FROM {table} WHERE event_type IN ('click', 'purchase')
    ),
    carried AS (
      SELECT *,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS) OVER ({over}) AS click_id_raw,
             last_value(CASE WHEN event_type = 'click' THEN ts_ms END
                        IGNORE NULLS) OVER ({over}) AS click_ts_raw
      FROM e
    )
    SELECT event_id AS purchase_id,
           user_id,
           CASE WHEN ts_ms - click_ts_raw <= {ATTR_WINDOW_MS}
                THEN click_id_raw END AS click_id,
           CAST(CASE WHEN ts_ms - click_ts_raw <= {ATTR_WINDOW_MS}
                THEN ts_ms - click_ts_raw END AS BIGINT) AS gap_ms,
           value,
           CAST(CASE WHEN ts_ms - click_ts_raw <= {ATTR_WINDOW_MS}
                THEN 1 ELSE 0 END AS BIGINT) AS attributed
    FROM carried WHERE event_type = 'purchase'
    """


# ---------------------------------------------------------------------------
# Funnel step latency (e43) — how long each conversion step takes
# ---------------------------------------------------------------------------


def funnel_latency(
    events: DataFrame,
    steps: tuple = FUNNEL_STEPS,
    window_hours: int = FUNNEL_WINDOW_HOURS,
) -> DataFrame:
    """FUNNEL STEP LATENCY: for users who advanced from step k to k+1
    (e08's exact chained-conditional-min semantics), the distribution of
    the step's transition time — e08 counts WHO converts, this measures
    HOW LONG each hop takes (the metric that localizes where a funnel
    stalls).  Exact p50/p95 over BIGINT millisecond gaps (e09's documented
    approx_percentile swap applies at 100 TB).

    Shape: e08's one-shuffle per-user conditional-min aggregate, then a
    steps-bounded unpivot and a per-step rollup — nothing after the first
    groupBy touches corpus-sized data."""
    window_ms = window_hours * 3600 * 1000
    e = events.select(
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
    )
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == steps[0], F.col("ts_ms"))).alias("t0")
    )
    for k in range(1, len(steps)):
        prev = f"t{k - 1}"
        nxt = e.filter(F.col("event_type") == steps[k]).select(
            "user_id", F.col("ts_ms").alias(f"ts_{k}")
        )
        per_user = (
            per_user.join(nxt, "user_id", "left")
            .groupBy("user_id", *[f"t{j}" for j in range(k)])
            .agg(
                F.min(
                    F.when(
                        (F.col(f"ts_{k}") > F.col(prev))
                        & (F.col(f"ts_{k}") - F.col("t0") <= window_ms),
                        F.col(f"ts_{k}"),
                    )
                ).alias(f"t{k}")
            )
        )
    gaps = per_user.select(
        F.expr(
            "stack(%d, %s) AS (step_no, gap_ms)"
            % (
                len(steps) - 1,
                ", ".join(
                    f"{k}L, t{k} - t{k - 1}" for k in range(1, len(steps))
                ),
            )
        )
    ).filter(F.col("gap_ms").isNotNull())
    return gaps.groupBy("step_no").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        portable_round(F.expr("percentile(gap_ms, 0.5)"), 2).alias("p50_ms"),
        portable_round(F.expr("percentile(gap_ms, 0.95)"), 2).alias("p95_ms"),
        F.max("gap_ms").cast("long").alias("max_ms"),
    )


def funnel_latency_sql(
    table: str = "events",
    steps: tuple = FUNNEL_STEPS,
    window_hours: int = FUNNEL_WINDOW_HOURS,
) -> str:
    window_ms = window_hours * 3600 * 1000
    ctes = [
        f"e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM {table})",
        f"""u0 AS (
      SELECT user_id,
             min(CASE WHEN event_type = '{steps[0]}' THEN ts_ms END) AS t0
      FROM e GROUP BY user_id
    )""",
    ]
    for k in range(1, len(steps)):
        prev_cols = ", ".join(["user_id"] + [f"t{j}" for j in range(k)])
        ctes.append(
            f"""u{k} AS (
      SELECT {prev_cols},
             min(CASE WHEN x.ts_ms > t{k - 1}
                       AND x.ts_ms - t0 <= {window_ms}
                      THEN x.ts_ms END) AS t{k}
      FROM u{k - 1} LEFT JOIN (SELECT user_id, ts_ms FROM e
                               WHERE event_type = '{steps[k]}') x
        USING (user_id)
      GROUP BY {prev_cols}
    )"""
        )
    pairs = " UNION ALL ".join(
        f"SELECT {k} AS step_no, t{k} - t{k - 1} AS gap_ms FROM u{len(steps) - 1}"
        for k in range(1, len(steps))
    )
    return f"""
    WITH {", ".join(ctes)},
    gaps AS ({pairs})
    SELECT CAST(step_no AS BIGINT) AS step_no,
           CAST(count(*) AS BIGINT) AS n_users,
           {portable_round_sql("quantile_cont(gap_ms, 0.5)", 2)} AS p50_ms,
           {portable_round_sql("quantile_cont(gap_ms, 0.95)", 2)} AS p95_ms,
           CAST(max(gap_ms) AS BIGINT) AS max_ms
    FROM gaps WHERE gap_ms IS NOT NULL GROUP BY step_no
    """


# ---------------------------------------------------------------------------
# Incremental rollup maintenance (e44) — merge stored partials with a delta
# ---------------------------------------------------------------------------

INC_CUTOVER_DAY = 20  # events on/after this day are "today's delta"


def incremental_rollup(events: DataFrame) -> DataFrame:
    """INCREMENTAL aggregate maintenance: the daily per-type rollup is
    NOT recomputed from raw history — the stored partials (count +
    integer-micro value sum per (day, type), computed once over the
    pre-cutover corpus) merge with the same partials of the new delta by
    RE-AGGREGATION: sum of sums, sum of counts.  This is the warehouse
    pattern that makes a 100 TB daily rollup affordable (each day costs
    one delta scan plus a partial-sized merge, never a history scan) and
    it works precisely because sum/count are commutative monoids — the
    same mergeability Spark itself exploits in map-side partial
    aggregation, lifted to the job level (e39 stores mergeable HLL
    sketches; this stores mergeable sums).

    The operator computes old partials and delta partials as two
    branches of one plan and merges them; the oracle aggregates the raw
    table directly — hash equality IS the maintenance-invariant proof
    (merge(rollup(old), rollup(delta)) == rollup(all)).  Value sums ride
    integer micros so merge order can't drift a float."""
    base = events.select(
        "event_type",
        F.expr("unix_millis(CAST(ts AS TIMESTAMP)) div 86400000").alias("day_no"),
        # floor(x + 0.5): portable integer rounding (values are positive
        # cents-scale doubles; F.round's BigDecimal path is not portable)
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("long").alias(
            "v_micros"
        ),
    )
    is_delta = F.col("day_no") >= INC_CUTOVER_DAY

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day_no").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v_micros").alias("sum_micros"),
        )

    stored = partials(base.filter(~is_delta))
    delta = partials(base.filter(is_delta))
    merged = (
        stored.unionByName(delta)
        .groupBy("event_type", "day_no")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_micros").cast("long").alias("sum_micros"),
        )
    )
    return merged.select("event_type", "day_no", "n_events", "sum_micros")


def incremental_rollup_sql(table: str = "events") -> str:
    """Oracle: the full-history rollup — equality proves the merge law."""
    return f"""
    SELECT event_type,
           CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day_no,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_micros
    FROM {table}
    GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# Session-scoped funnel (e45) — conversion within one visit
# ---------------------------------------------------------------------------


def session_funnel(
    events: DataFrame,
    steps: tuple = FUNNEL_STEPS,
    gap_minutes: int = SESSION_GAP_MIN,
) -> DataFrame:
    """SESSION-scoped funnel: how many SESSIONS (e02's inactivity-gap
    visits) contain the ordered step chain — e08 measures lifetime
    conversion per user; this measures conversion per VISIT, the number
    product analytics actually tracks (a user who views today and buys
    next month converts e08's funnel but not this one).  The session
    boundary replaces e08's fixed window cap.

    Shape: ONE per-user ordered window assigns session ids (e02's
    lag+cumsum), then e08's chained conditional-min joins run per
    (user, session) — each pass one equi-join + one aggregate carrying a
    row per session, never an event-row blowup."""
    gap_ms = gap_minutes * 60 * 1000
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    base = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
    ).withColumn(
        "session_no",
        F.sum(
            F.when(F.lag("ts_ms").over(w).isNull(), 1)
            .when((F.col("ts_ms") - F.lag("ts_ms").over(w)) > gap_ms, 1)
            .otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = base.groupBy("user_id", "session_no").agg(
        F.min(F.when(F.col("event_type") == steps[0], F.col("ts_ms"))).alias("t0")
    )
    for k in range(1, len(steps)):
        nxt = base.filter(F.col("event_type") == steps[k]).select(
            "user_id", "session_no", F.col("ts_ms").alias(f"ts_{k}")
        )
        per_sess = (
            per_sess.join(nxt, ["user_id", "session_no"], "left")
            .groupBy("user_id", "session_no", *[f"t{j}" for j in range(k)])
            .agg(
                F.min(
                    F.when(F.col(f"ts_{k}") > F.col(f"t{k - 1}"), F.col(f"ts_{k}"))
                ).alias(f"t{k}")
            )
        )
    counts = per_sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        *[
            F.sum(F.when(F.col(f"t{k}").isNotNull(), 1).otherwise(0)).alias(
                f"r{k}"
            )
            for k in range(len(steps))
        ],
    )
    return counts.select(
        F.expr(
            "stack(%d, %s) AS (step_no, step, n_reached)"
            % (
                len(steps),
                ", ".join(
                    f"{k}L, '{steps[k]}', r{k}" for k in range(len(steps))
                ),
            )
        ),
        F.col("n_sessions").cast("long").alias("n_sessions"),
    ).select(
        "step_no",
        "step",
        "n_sessions",
        F.col("n_reached").cast("long").alias("n_reached"),
    )


def session_funnel_sql(
    table: str = "events",
    steps: tuple = FUNNEL_STEPS,
    gap_minutes: int = SESSION_GAP_MIN,
) -> str:
    gap_ms = gap_minutes * 60 * 1000
    ctes = [
        f"""pre AS (
      SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM {table}
    )""",
        f"""gapped AS (
      SELECT *,
             CASE WHEN lag(ts_ms) OVER w IS NULL THEN 1
                  WHEN ts_ms - lag(ts_ms) OVER w > {gap_ms} THEN 1
                  ELSE 0 END AS new_s
      FROM pre
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
    )""",
        """base AS (
      SELECT *,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM gapped
    )""",
        f"""u0 AS (
      SELECT user_id, session_no,
             min(CASE WHEN event_type = '{steps[0]}' THEN ts_ms END) AS t0
      FROM base GROUP BY user_id, session_no
    )""",
    ]
    for k in range(1, len(steps)):
        prev_cols = ", ".join(
            ["user_id", "session_no"] + [f"t{j}" for j in range(k)]
        )
        ctes.append(
            f"""u{k} AS (
      SELECT {prev_cols},
             min(CASE WHEN x.ts_ms > t{k - 1} THEN x.ts_ms END) AS t{k}
      FROM u{k - 1} LEFT JOIN (SELECT user_id, session_no, ts_ms FROM base
                               WHERE event_type = '{steps[k]}') x
        USING (user_id, session_no)
      GROUP BY {prev_cols}
    )"""
        )
    last = f"u{len(steps) - 1}"
    rows = " UNION ALL ".join(
        f"SELECT {k} AS step_no, '{steps[k]}' AS step, "
        f"count(*) AS n_sessions, "
        f"sum(CASE WHEN t{k} IS NOT NULL THEN 1 ELSE 0 END) AS n_reached "
        f"FROM {last}"
        for k in range(len(steps))
    )
    return f"""
    WITH {", ".join(ctes)}
    SELECT CAST(step_no AS BIGINT) AS step_no, step,
           CAST(n_sessions AS BIGINT) AS n_sessions,
           CAST(n_reached AS BIGINT) AS n_reached
    FROM ({rows})
    """


# ---------------------------------------------------------------------------
# OHLC bars (e46) and dyadic-weight EWMA (e47)

BAR_HOURS = 24  # e46 bar width
EWMA_SPAN = 8  # e47: dyadic window length (weights 2^7 .. 2^0)


def ohlc_bars(events: DataFrame, hours: int = BAR_HOURS) -> DataFrame:
    """OHLC downsampling: per (event_type, tumbling bar) the OPEN (value of
    the earliest event), HIGH, LOW, CLOSE (latest) plus volume — the
    canonical time-series compaction every metrics store ships (no
    reference analog; the reference has no ordered-first/last aggregate at
    all, ``Scan.java`` emits heap order).

    Open/close are selected by ``row_number`` over (ts, event_id) — a
    deterministic total order both engines replay — NOT ``first()``
    (partition-order-dependent in Spark) and not ``min_by`` (ties
    unspecified).  The two window passes share one hash partitioning of
    (event_type, bar); high/low/volume ride the same aggregate.  Raw
    values pass through unaveraged (bit-identical), the volume sum rides
    DECIMAL(18,6).  At 100 TB: one shuffle on the bar key; bar count is
    time-bounded, so the output is trivially small — the classic
    pre-aggregation that makes dashboard queries O(bars) not O(events)."""
    width_ms = hours * 3600 * 1000
    base = events.select(
        "event_type",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
        "event_id",
        "value",
    ).withColumn("bar", F.expr(f"ts_ms div {width_ms}"))
    asc = Window.partitionBy("event_type", "bar").orderBy("ts_ms", "event_id")
    desc = Window.partitionBy("event_type", "bar").orderBy(
        F.desc("ts_ms"), F.desc("event_id")
    )
    ranked = base.withColumn("rn_a", F.row_number().over(asc)).withColumn(
        "rn_d", F.row_number().over(desc)
    )
    return (
        ranked.groupBy("event_type", "bar")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("volume"),
        )
        .select(
            "event_type",
            F.col("bar").cast("long").alias("bar"),
            (F.col("bar") * width_ms).cast("long").alias("bar_start_ms"),
            "n_events",
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


def ohlc_bars_sql(table: str = "events", hours: int = BAR_HOURS) -> str:
    width_ms = hours * 3600 * 1000
    return f"""
    WITH base AS (
      SELECT event_type, epoch_ms(ts) AS ts_ms, event_id, value,
             epoch_ms(ts) // {width_ms} AS bar
      FROM {table}
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bar
                                ORDER BY ts_ms, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bar
                                ORDER BY ts_ms DESC, event_id DESC) AS rn_d
      FROM base
    )
    SELECT event_type, bar::BIGINT AS bar,
           (bar * {width_ms})::BIGINT AS bar_start_ms,
           count(*) AS n_events,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume
    FROM ranked
    GROUP BY event_type, bar
    """


def ewma_daily(events: DataFrame, span: int = EWMA_SPAN) -> DataFrame:
    """Dyadic-weight EWMA over the per-(event_type, day) value series: the
    smoothed value is ``floor(Σ_j 2^(span-1-j)·v_{t-j} / Σ_j 2^(span-1-j))``
    over the last ``span`` OBSERVED days (j = age in rows), in integer
    MICROS end to end — the halving-weight smoother is the integer-exact
    stand-in for float EWMA (α = 1/2), so the iterative-looking smoothing
    is hash-replayable (float EWMA recursion never is).

    Shape: one rollup shuffle on (event_type, day), then ONE ordered window
    per type carrying ``span`` lags — lag depth is a constant, not a data
    quantity, so the window state is O(span) per key.  Weights double
    toward the present; missing lags (series head) drop out of numerator
    AND denominator, matching the standard EWMA warm-up correction.  Micros
    keep daily sums ≤ ~9.2e18/1e6 ≈ 9.2e12 — fine for any real per-day
    per-type mass; a 100 TB deployment with hotter keys moves the
    accumulator to DECIMAL(38,0) unchanged."""
    day_ms = 86_400_000
    daily = (
        events.select(
            "event_type",
            F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
            "value",
        )
        .withColumn("day", F.expr(f"ts_ms div {day_ms}"))
        .groupBy("event_type", "day")
        .agg(
            F.sum(
                F.expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)")
            ).alias("v_micros")
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")

    def lag_j(j: int):
        return F.lag("v_micros", j).over(w) if j else F.col("v_micros")

    num = None
    den = None
    for j in range(span):
        wgt = 1 << (span - 1 - j)
        term = F.coalesce(lag_j(j) * wgt, F.lit(0).cast("long"))
        wterm = F.when(lag_j(j).isNotNull(), F.lit(wgt)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = wterm if den is None else den + wterm
    return (
        daily.withColumn("_num", num)
        .withColumn("_den", den)
        .select(
            "event_type",
            F.col("day").cast("long").alias("day"),
            "v_micros",
            F.expr("_num div _den").cast("long").alias("ewma_micros"),
        )
    )


def ewma_daily_sql(table: str = "events", span: int = EWMA_SPAN) -> str:
    day_ms = 86_400_000
    num = " + ".join(
        f"COALESCE(lag(v_micros, {j}) OVER w * {1 << (span - 1 - j)}, 0)"
        if j
        else f"v_micros * {1 << (span - 1)}"
        for j in range(span)
    )
    den = " + ".join(
        f"(CASE WHEN lag(v_micros, {j}) OVER w IS NOT NULL THEN {1 << (span - 1 - j)} ELSE 0 END)"
        if j
        else f"{1 << (span - 1)}"
        for j in range(span)
    )
    return f"""
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // {day_ms} AS day,
             CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS v_micros
      FROM {table}
      GROUP BY 1, 2
    )
    SELECT event_type, day::BIGINT AS day, v_micros,
           (({num}) // ({den}))::BIGINT AS ewma_micros
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """


def seasonality_profile(events: DataFrame) -> DataFrame:
    """Seasonality fingerprint: per event_type, the (day-of-week,
    hour-of-day) activity grid - events, exact decimal value mass, the
    cell's ppm share of its type, and a flag on each type's single peak
    cell (deterministic tie-break on the earlier slot).  The profile that
    schedules off-peak maintenance, sizes streaming capacity by hour, and
    exposes bot traffic (organic types breathe with the day; a flat or
    single-spike grid screams automation).

    One rollup on (type, dow, hour) - at most 7 x 24 rows per type, so
    the window pass that marks peaks runs on a trivially small frame;
    event rows are touched exactly once.  Day-of-week derives from the
    epoch day (day 0 = Thursday) by pure integer arithmetic, immune to
    engine locale/WEEKDAY-origin disagreements."""
    day_ms = 86_400_000
    hour_ms = 3_600_000
    base = events.select(
        "event_type",
        F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
        "value",
    ).select(
        "event_type",
        # epoch day 0 = 1970-01-01 = Thursday = ISO weekday 4; (+3) % 7
        # relabels so 0 = Monday
        F.expr(f"((ts_ms div {day_ms}) + 3) % 7").alias("dow"),
        F.expr(f"(ts_ms div {hour_ms}) % 24").alias("hour"),
        "value",
    )
    grid = base.groupBy("event_type", "dow", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
    per_type = Window.partitionBy("event_type")
    peak = Window.partitionBy("event_type").orderBy(
        F.desc("n_events"), F.asc("dow"), F.asc("hour")
    )
    return grid.select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        F.col("hour").cast("long").alias("hour"),
        "n_events",
        "sum_value",
        F.expr("n_events * 1000000").alias("_scaled"),
        F.sum("n_events").over(per_type).alias("_type_total"),
        F.row_number().over(peak).alias("_rk"),
    ).select(
        "event_type",
        "dow",
        "hour",
        "n_events",
        "sum_value",
        F.expr("_scaled div _type_total").alias("share_ppm"),
        F.when(F.col("_rk") == 1, 1).otherwise(0).cast("long").alias("is_peak"),
    )


def seasonality_profile_sql(table: str = "events") -> str:
    day_ms = 86_400_000
    hour_ms = 3_600_000
    return f"""
    WITH base AS (
      SELECT event_type,
             ((epoch_ms(ts) // {day_ms}) + 3) % 7 AS dow,
             (epoch_ms(ts) // {hour_ms}) % 24 AS hour,
             value
      FROM {table}
    ),
    grid AS (
      SELECT event_type, dow, hour,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM base GROUP BY 1, 2, 3
    )
    SELECT event_type, dow::BIGINT AS dow, hour::BIGINT AS hour, n_events,
           sum_value,
           CAST((n_events * 1000000) //
                (sum(n_events) OVER (PARTITION BY event_type)) AS BIGINT)
             AS share_ppm,
           CAST(CASE WHEN row_number() OVER (PARTITION BY event_type
                       ORDER BY n_events DESC, dow ASC, hour ASC) = 1
                THEN 1 ELSE 0 END AS BIGINT) AS is_peak
    FROM grid
    """


CUSUM_THRESHOLD_PCT = 10  # e49: flag when |deviation mass| exceeds 10% of total


def cusum_shifts(events: DataFrame) -> DataFrame:
    """CUSUM mean-shift detection on the per-(event_type, day) series: the
    cumulative deviation of daily mass from the type's flat-mean
    expectation, flagged where it exceeds ``CUSUM_THRESHOLD_PCT``%% of the
    type's total - the classic change-point screen (Page 1954) that
    catches level shifts daily-anomaly z-scores miss (e34 flags single
    outlier DAYS; a regime change moves every day a little, and only the
    cumulative sum sees it).

    INTEGER-EXACT trick: with n days and total mass T, the deviation at
    day i is cum_i - i*T/n; scaling by n gives ``n*cum_i - i*T`` - pure
    BIGINT micros, no division ever happens, and the flag compares
    against ``n*T/100*PCT`` in the same scaled units.  One rollup shuffle
    + one per-type ordered window (day count per type is time-bounded).
    Scaled values hold to n_days*T < 2^63: ~10^5 days x 10^14 micros -
    beyond any per-type daily series; hotter than that moves the two
    accumulators to DECIMAL(38,0)."""
    day_ms = 86_400_000
    daily = (
        events.select(
            "event_type",
            F.unix_millis(F.col("ts").cast(T.TimestampType())).alias("ts_ms"),
            "value",
        )
        .withColumn("day", F.expr(f"ts_ms div {day_ms}"))
        .groupBy("event_type", "day")
        .agg(
            F.sum(
                F.expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)")
            ).alias("v_micros")
        )
    )
    per_type = Window.partitionBy("event_type")
    ordered = Window.partitionBy("event_type").orderBy("day")
    cum = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        daily.withColumn("n_days", F.count(F.lit(1)).over(per_type))
        .withColumn("total", F.sum("v_micros").over(per_type))
        .withColumn("i", F.row_number().over(ordered))
        .withColumn("cum", F.sum("v_micros").over(cum))
        .select(
            "event_type",
            F.col("day").cast("long").alias("day"),
            "v_micros",
            F.expr("n_days * cum - i * total").alias("cusum_scaled"),
            F.when(
                F.expr(
                    f"abs(n_days * cum - i * total) > "
                    f"(n_days * total div 100) * {CUSUM_THRESHOLD_PCT}"
                ),
                1,
            )
            .otherwise(0)
            .cast("long")
            .alias("shift_flag"),
        )
    )


def cusum_shifts_sql(table: str = "events") -> str:
    day_ms = 86_400_000
    return f"""
    WITH daily AS (
      SELECT event_type, epoch_ms(ts) // {day_ms} AS day,
             CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS v_micros
      FROM {table}
      GROUP BY 1, 2
    ),
    annotated AS (
      SELECT event_type, day, v_micros,
             count(*) OVER (PARTITION BY event_type) AS n_days,
             CAST(sum(v_micros) OVER (PARTITION BY event_type) AS BIGINT) AS total,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
             CAST(sum(v_micros) OVER (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM daily
    )
    SELECT event_type, day::BIGINT AS day, v_micros,
           CAST(n_days * cum - i * total AS BIGINT) AS cusum_scaled,
           CAST(CASE WHEN abs(n_days * cum - i * total) >
                          (n_days * total // 100) * {CUSUM_THRESHOLD_PCT}
                THEN 1 ELSE 0 END AS BIGINT) AS shift_flag
    FROM annotated
    """

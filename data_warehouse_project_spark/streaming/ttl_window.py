"""Generic TTL'd windowed-aggregate maintainer — bounded-state
incremental aggregation (VERDICT r6 #7 stretch item).

The existing rollup maintainer (plans/incremental.py) keeps state for
EVERY (hour, type) cell ever seen — O(history). Real always-on
pipelines bound state with a TTL: keep only windows within TTL of the
event-time high-watermark, exactly the contract of Spark's
`transformWithState` TTL config and Flink's state TTL. This module
promotes the carry-state pattern to that shape on the shared
idempotent-fold template (streaming/state_fold.py): tumbling
event-time windows per key, mergeable partial aggregates, and
deterministic eviction against a high-watermark carried IN the state.

Eviction correctness (why the TTL'd fold still equals a full
recompute over surviving windows): the high-watermark only grows, so
a window old enough to be evicted mid-stream is old enough to be
evicted at the end — and a window that survives the FINAL watermark
(w > hwm_final - TTL) was within TTL of every earlier watermark too
(hwm_t ≤ hwm_final), so no event destined for a surviving window was
ever dropped. Surviving windows therefore carry COMPLETE aggregates,
and the DuckDB oracle can recompute them exactly from the full events
table: group, then keep windows within TTL of the global max — a
hash-exact differential test of the eviction logic itself. (A window
evicted and later revived by very-late data holds partial counts, but
by monotonicity it is re-evicted before serving — both engines drop
it.)

Scale: state is O(keys × TTL) rows of longs — corpus-independent.
Each fold shuffles only the batch's (window, key) partials plus the
state table; the high-watermark attaches as a broadcast one-row
frame. At 100 TB/day the TTL is what keeps the maintained table from
growing without bound — this, not the un-TTL'd rollup, is the shape
you deploy.

Windows are epoch-hour integers (floor(epoch/3600)) — pure integer
arithmetic, no engine-specific date functions in the plan (the
timeseries module's idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog

#: retain windows with window_hour > hwm_hour - TTL_HOURS (the 72
#: most recent hourly windows relative to the event-time watermark)
TTL_HOURS = 72

#: value sum kept as a 2-decimal scaled integer (mergeable, exact)
_SCALE = 100

def _hour():
    # built lazily: Column construction needs an active SparkContext
    return F.floor(F.unix_timestamp(F.col("ts")) / 3600).cast("long")


def _aggregate(events: DataFrame) -> DataFrame:
    return (
        events.select(_hour().alias("window_hour"), "event_type", "value")
        .groupBy("window_hour", "event_type")
        .agg(F.count("*").cast("long").alias("n_events"),
             F.sum(F.floor(F.col("value") * _SCALE + F.lit(0.5))
                   .cast("long")).alias("sum_value_scaled"))
    )


def _evict(merged: DataFrame) -> DataFrame:
    """Attach the (new) high-watermark to every row and drop windows
    beyond TTL; each state row carries the hwm so a restart recovers
    the watermark from the state table alone.

    The hwm is a GLOBAL-window max over the state frame, not a
    separate aggregate crossJoined back: the agg+crossJoin form
    embeds the merged subtree twice per eviction, which doubled the
    whole upstream lineage at every fold — the registered 3-fold
    query re-scanned events 2^3 times before this was caught
    (plan-pinned in tests/test_plan_quality.py; local wall moved
    0.55 → 0.88 s at sf0.1 because page-cached re-scans were nearly
    free while the window adds a small exchange — the scan count is
    what survives 1000×, the round-6 pin-fix adjudication pattern).
    A per-fold pin() variant was measured too (1.14 s: three eager
    materializations) and rejected. The single-partition window is
    safe here and only here because the state frame is bounded at
    keys × TTL rows by construction — the same bounded-cardinality
    window policy as the spine detectors (bench.py log note)."""
    from pyspark.sql import Window
    w = Window.partitionBy()
    return (merged.withColumn("hwm_hour",
                              F.max("window_hour").over(w))
            .filter(F.col("window_hour") >
                    F.col("hwm_hour") - F.lit(TTL_HOURS)))


def window_state(events: DataFrame) -> DataFrame:
    """Build TTL'd window state from a (first) batch of events."""
    return _evict(_aggregate(events))


def merge_window_state(prev: DataFrame, batch_events: DataFrame) -> DataFrame:
    """Fold a batch into existing state: partial-aggregate the batch,
    add per (window, key), re-evict against the advanced watermark.
    The stored hwm column is recomputed (max of state windows ∪ batch
    windows ≡ running max, since eviction keeps the max row)."""
    delta = _aggregate(batch_events)
    merged = (
        prev.drop("hwm_hour").unionByName(delta)
        .groupBy("window_hour", "event_type")
        .agg(F.sum("n_events").cast("long").alias("n_events"),
             F.sum("sum_value_scaled").cast("long")
             .alias("sum_value_scaled"))
    )
    return _evict(merged)


def state_to_report(state: DataFrame) -> DataFrame:
    """User-facing surviving-window aggregates (+ the windows-behind-
    watermark age, the freshness column a dashboard alerts on)."""
    return state.select(
        "window_hour", "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        fround(F.col("sum_value_scaled").cast("double") / _SCALE, 2)
        .alias("sum_value"),
        (F.col("hwm_hour") - F.col("window_hour")).cast("long")
        .alias("hours_behind_hwm"),
    )


def fold_batch_into_state(batch_df: DataFrame, batch_id: int,
                          state_path: str) -> bool:
    """Idempotent fold bound to the TTL'd window pair (shared
    template: streaming/state_fold.py — batch-id replay guard,
    atomic staged swap)."""
    from .state_fold import fold_batch
    return fold_batch(batch_df, batch_id, state_path,
                      window_state, merge_window_state)


def run_ttl_window_maintainer(events_stream: DataFrame, state_path: str,
                              checkpoint: str):
    """foreachBatch maintainer: restart-safe, replay-safe, bounded
    state (see module docstring)."""
    from .state_fold import run_maintainer
    return run_maintainer(events_stream, state_path, checkpoint,
                          window_state, merge_window_state)


def events_ttl_window_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: three-batch arrival simulation (event_id mod
    3 — deliberately NOT time-ordered, so late data and watermark
    advancement both occur) folded through the TTL'd maintainer; the
    served report must hash-match the oracle's full recompute over
    surviving windows."""
    ev = Catalog(spark, sf_dir).events
    state = window_state(ev.filter(F.col("event_id") % 3 == 0))
    state = merge_window_state(state, ev.filter(F.col("event_id") % 3 == 1))
    state = merge_window_state(state, ev.filter(F.col("event_id") % 3 == 2))
    return state_to_report(state)


EVENTS_TTL_WINDOW_SQL = f"""
WITH ev AS (
    SELECT CAST(FLOOR(date_part('epoch', ts) / 3600) AS BIGINT)
               AS window_hour,
           event_type, value
    FROM events
),
hwm AS (SELECT MAX(window_hour) AS hwm_hour FROM ev),
agg AS (
    SELECT window_hour, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * {_SCALE} + 0.5) AS BIGINT))
                AS BIGINT) AS sum_value_scaled
    FROM ev GROUP BY 1, 2
)
SELECT a.window_hour, a.event_type, a.n_events,
       {sql_fround(f'a.sum_value_scaled / {_SCALE}.0', 2)} AS sum_value,
       CAST(h.hwm_hour - a.window_hour AS BIGINT) AS hours_behind_hwm
FROM agg a CROSS JOIN hwm h
WHERE a.window_hour > h.hwm_hour - {TTL_HOURS}
"""

register("events_ttl_window_state", events_ttl_window_state,
         EVENTS_TTL_WINDOW_SQL)


#: sliding-window width served from the tumbling state (hours)
SLIDE_H = 24


def sliding_from_state(state: DataFrame) -> DataFrame:
    """Serve trailing-``SLIDE_H``-hour sliding aggregates per type
    from the TTL'd tumbling state — the standard decomposition
    (sliding = RANGE window over tumbling partials) that makes a
    24h-sliding metric O(state) instead of a corpus rescan.

    Validity horizon: a sliding value at hour h is complete only if
    its full lookback [h-23, h] survived eviction, i.e.
    h > hwm - (TTL_HOURS - SLIDE_H + 1); hours nearer the retention
    edge are suppressed rather than served wrong — and because the
    lookback is then fully retained, the served values exactly equal
    a full-history recompute (the oracle)."""
    from pyspark.sql import Window
    w = (Window.partitionBy("event_type").orderBy("window_hour")
         .rangeBetween(-(SLIDE_H - 1), 0))
    return (
        state
        .withColumn("sliding_events", F.sum("n_events").over(w)
                    .cast("long"))
        .withColumn("sliding_value_scaled",
                    F.sum("sum_value_scaled").over(w).cast("long"))
        .filter(F.col("window_hour") >
                F.col("hwm_hour") - F.lit(TTL_HOURS - SLIDE_H + 1))
        .select(
            "window_hour", "event_type", "sliding_events",
            fround(F.col("sliding_value_scaled").cast("double") / _SCALE, 2)
            .alias("sliding_value"),
        )
    )


def events_ttl_sliding_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: 24h sliding aggregates served from the same
    three-batch TTL'd state build as events_ttl_window_state; oracle =
    full-history recompute restricted to the validity horizon."""
    ev = Catalog(spark, sf_dir).events
    state = window_state(ev.filter(F.col("event_id") % 3 == 0))
    state = merge_window_state(state, ev.filter(F.col("event_id") % 3 == 1))
    state = merge_window_state(state, ev.filter(F.col("event_id") % 3 == 2))
    return sliding_from_state(state)


EVENTS_TTL_SLIDING_SQL = f"""
WITH ev AS (
    SELECT CAST(FLOOR(date_part('epoch', ts) / 3600) AS BIGINT)
               AS window_hour,
           event_type, value
    FROM events
),
hwm AS (SELECT MAX(window_hour) AS hwm_hour FROM ev),
agg AS (
    SELECT window_hour, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * {_SCALE} + 0.5) AS BIGINT))
                AS BIGINT) AS sum_value_scaled
    FROM ev GROUP BY 1, 2
),
slid AS (
    SELECT window_hour, event_type,
           CAST(SUM(n_events) OVER w AS BIGINT) AS sliding_events,
           CAST(SUM(sum_value_scaled) OVER w AS BIGINT)
               AS sliding_value_scaled
    FROM agg
    WINDOW w AS (PARTITION BY event_type ORDER BY window_hour
                 RANGE BETWEEN {SLIDE_H - 1} PRECEDING AND CURRENT ROW)
)
SELECT s.window_hour, s.event_type, s.sliding_events,
       {sql_fround(f's.sliding_value_scaled / {_SCALE}.0', 2)}
           AS sliding_value
FROM slid s CROSS JOIN hwm h
WHERE s.window_hour > h.hwm_hour - {TTL_HOURS - SLIDE_H + 1}
"""

register("events_ttl_sliding_served", events_ttl_sliding_served,
         EVENTS_TTL_SLIDING_SQL)

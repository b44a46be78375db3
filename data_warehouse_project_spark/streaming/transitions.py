"""Incremental per-user transition mining — the streaming-maintained
form of events_top_transitions (streaming/batch_parity.py:512).

The batch twin orders each user's events by (ts, event_id), forms
(prev_type → next_type) transitions with LAG, and counts per pair.
Recomputing that from scratch on every refresh rescans all history;
this module maintains the same answer incrementally: per micro-batch
it computes only the batch's NEW transitions (including the one that
crosses the batch boundary, via a carried per-user last-event row) and
adds them into a persisted count state.

State design — ONE parquet table, two row kinds, one atomic swap:
- kind='c': (prev_type, next_type, n) additive transition counts;
- kind='l': (user_id, last_ts, last_event_id, last_type) — each
  user's latest event, the carry that stitches the first event of the
  next batch onto the last event of the previous one.
A single table means a single staged-swap overwrite (writes.py:223) —
counts and carries can never disagree after a crash. The batch-id
sentinel rides the same table (same at-least-once replay guard as the
rollup maintainer, plans/incremental.py:77-84).

Ordering contract: batches must arrive ts-ordered PER USER (every
event in batch N+1 is at or after the user's carried last event) —
the watermark-finalized arrival order a production feed provides.
Within a batch, order is free (the LAG window sorts). Out-of-order
cross-batch arrivals are handled by streaming/late_transitions.py
(allowed-lateness buffer + finalize-below-horizon — watermark
discipline, no retractions); this strict form stays the cheaper
O(users) state for feeds that really are ordered.

Scale: per batch, one user_id-keyed window over (batch ∪ carries for
users in the batch — bounded by batch size + active users), a tiny
(type × type) delta agg, and a count-merge shuffle on the (type ×
type) key space. History is never rescanned; state size is
O(users + event_type²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.compat import fround
from ..registry import register
from ..sources.catalog import Catalog
from .batch_parity import TRANSITION_TOP_K, EVENTS_TRANSITIONS_SQL
from .state_fold import fold_batch, run_maintainer

#: unified state schema (kind 'c' = count row, 'l' = last-event row)
_STATE_COLS = ["kind", "prev_type", "next_type", "n",
               "user_id", "last_ts", "last_event_id", "last_type"]


def _events_cols(events: DataFrame) -> DataFrame:
    return events.select("user_id", "event_id", "ts", "event_type")


def transitions_state(events: DataFrame) -> DataFrame:
    """Build the unified state from a (first) batch of events."""
    ev = _events_cols(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    last = (
        ev.groupBy("user_id")
        .agg(F.max_by(
            F.struct(F.col("ts").alias("last_ts"),
                     F.col("event_id").alias("last_event_id"),
                     F.col("event_type").alias("last_type")),
            F.struct("ts", "event_id")).alias("s"))
        .select("user_id", "s.last_ts", "s.last_event_id", "s.last_type")
    )
    return (
        counts.select(
            F.lit("c").alias("kind"), "prev_type", "next_type", "n",
            F.lit(None).cast("long").alias("user_id"),
            F.lit(None).cast(last.schema["last_ts"].dataType)
            .alias("last_ts"),
            F.lit(None).cast("long").alias("last_event_id"),
            F.lit(None).cast("string").alias("last_type"))
        .unionByName(last.select(
            F.lit("l").alias("kind"),
            F.lit(None).cast("string").alias("prev_type"),
            F.lit(None).cast("string").alias("next_type"),
            F.lit(None).cast("long").alias("n"),
            "user_id", "last_ts", "last_event_id", "last_type"))
    )


def merge_transitions_state(prev: DataFrame,
                            batch_events: DataFrame) -> DataFrame:
    """Fold a batch into the state: LAG over (carry ∪ batch) per user
    counts exactly the batch's new transitions — each carried last
    event has a NULL prev in this window, so transitions already
    counted in earlier batches can never recount."""
    ev = _events_cols(batch_events)
    carries = (
        prev.filter(F.col("kind") == "l")
        .select("user_id", F.col("last_event_id").alias("event_id"),
                F.col("last_ts").alias("ts"),
                F.col("last_type").alias("event_type"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = (
        carries.withColumn("from_batch", F.lit(False))
        .unionByName(ev.withColumn("from_batch", F.lit(True)))
        .withColumn("prev_type", F.lag("event_type").over(w))
        # drop both the window-start NULLs and the carry rows
        # themselves (a carry is never the NEXT side of a new
        # transition: everything in the batch sorts after it)
        .filter(F.col("from_batch") & F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    counts = (
        prev.filter(F.col("kind") == "c")
        .select("prev_type", "next_type", "n")
        .unionByName(delta)
        .groupBy("prev_type", "next_type")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    last = (
        carries.unionByName(ev)
        .groupBy("user_id")
        .agg(F.max_by(
            F.struct(F.col("ts").alias("last_ts"),
                     F.col("event_id").alias("last_event_id"),
                     F.col("event_type").alias("last_type")),
            F.struct("ts", "event_id")).alias("s"))
        .select("user_id", "s.last_ts", "s.last_event_id", "s.last_type")
    )
    return (
        counts.select(
            F.lit("c").alias("kind"), "prev_type", "next_type", "n",
            F.lit(None).cast("long").alias("user_id"),
            F.lit(None).cast(last.schema["last_ts"].dataType)
            .alias("last_ts"),
            F.lit(None).cast("long").alias("last_event_id"),
            F.lit(None).cast("string").alias("last_type"))
        .unionByName(last.select(
            F.lit("l").alias("kind"),
            F.lit(None).cast("string").alias("prev_type"),
            F.lit(None).cast("string").alias("next_type"),
            F.lit(None).cast("long").alias("n"),
            "user_id", "last_ts", "last_event_id", "last_type"))
    )


def state_to_report(state: DataFrame) -> DataFrame:
    """Render the count rows as the batch twin's top-K report."""
    trans = (state.filter(F.col("kind") == "c")
             .select("prev_type", "next_type", "n"))
    total = trans.agg(F.sum("n").alias("total"))
    return (
        trans.join(F.broadcast(total))
        .select("prev_type", "next_type", F.col("n").cast("long").alias("n"),
                fround(F.col("n") / F.col("total"), 6).alias("share"))
        .orderBy(F.col("n").desc(), "prev_type", "next_type")
        .limit(TRANSITION_TOP_K)
    )


def fold_batch_into_state(batch_df: DataFrame, batch_id: int,
                          state_path: str) -> bool:
    """Shared idempotent-fold template bound to the transition state
    pair (streaming/state_fold.py)."""
    return fold_batch(batch_df, batch_id, state_path,
                      transitions_state, merge_transitions_state)


def run_transitions_maintainer(events_stream: DataFrame, state_path: str,
                               checkpoint: str):
    """foreachBatch maintainer (shared template; restart-safe,
    replay-safe, atomic staged-swap state)."""
    return run_maintainer(events_stream, state_path, checkpoint,
                          transitions_state, merge_transitions_state)


def events_transitions_incremental(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Registry entry: split events at the midpoint timestamp (a
    ts-ordered two-batch arrival), build state from the first half,
    fold the second in, and render the report. The oracle is the
    batch twin's FULL-RECOMPUTE SQL — incremental maintenance must be
    indistinguishable from recomputing history (the only collect is a
    one-row min/max metadata read to pick the split point)."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    # Empty feed (a source partition can legitimately match nothing):
    # an epoch pivot makes both simulated batches empty, and the
    # build/merge pair already handles None watermarks downstream.
    import datetime as _dt
    mid = (lo + (hi - lo) / 2) if lo is not None else _dt.datetime(1970, 1, 1)
    state = merge_transitions_state(
        transitions_state(ev.filter(F.col("ts") <= F.lit(mid))),
        ev.filter(F.col("ts") > F.lit(mid)))
    return state_to_report(state)


register("events_transitions_incremental", events_transitions_incremental,
         EVENTS_TRANSITIONS_SQL)

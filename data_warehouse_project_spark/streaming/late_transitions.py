"""Allowed-lateness incremental transition mining — the out-of-order
answer to streaming/transitions.py's documented ordering contract
(transitions.py:22-28: "Out-of-order cross-batch arrivals would need
a retraction path; that is the same finalization assumption the
tumbling/sessionize jobs make via watermarks"). This module IS that
path, and it needs no retractions: it applies Structured Streaming's
own watermark discipline to the chained-transition fold.

The strict maintainer finalizes a user's last transition the moment
the next batch arrives, so an event that lands BETWEEN two
already-linked events miscounts — the linked pair (a→c) was counted
and the true pairs (a→b, b→c) never can be without decrementing.
Instead of retracting, this maintainer refuses to finalize early:

- state carries an event-time WATERMARK (max ts seen) and an
  allowed-lateness horizon = watermark − LATENESS;
- a per-user BUFFER holds every event above the horizon (the
  unfinalized tail) plus ONE anchor — the user's latest event at or
  below the horizon, the predecessor of the first unfinalized
  transition;
- each fold admits batch events STRICTLY above the PREVIOUS horizon
  (ties at the horizon and older are dropped and counted — the
  watermark contract; strictness is what makes finalized counts
  permanent, see state_fold.watermark_prologue),
  sorts (buffer ∪ admitted) per user, and finalizes exactly the
  consecutive pairs whose LATER endpoint is at or below the NEW
  horizon: no future event can ever insert below the horizon, so a
  finalized count is permanent — by construction, not by retraction;
- serving unions the finalized counts with the transitions of the
  buffered tail, which makes the served report EXACTLY the batch
  twin's full recompute at any point (the registered oracle), while
  an event more disordered than LATENESS is dropped loudly (metric
  row), never silently miscounted.

State design: ONE parquet table, three row kinds ('c' finalized
counts, 'b' buffer events, 'w' watermark + dropped-count metric),
one atomic staged swap, the shared batch-id replay sentinel
(state_fold.py). State size is O(event_type² + users + events inside
the lateness window) — the lateness window is the price of disorder
tolerance, and it is exactly the state Structured Streaming's own
watermarked operators keep.

Scale: per fold — one bounded scalar read (the 'w' row), one
user-keyed window over (buffer-for-batch-users ∪ admitted batch),
a (type × type) delta aggregate, and a count merge. Users untouched
by the batch pass through the immutable union unchanged (the same
O(batch) discipline as sessions.py's semi-join). History is never
rescanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import register
from ..sources.catalog import Catalog
from .batch_parity import EVENTS_TRANSITIONS_SQL, TRANSITION_TOP_K
from .state_fold import fold_batch, run_maintainer

#: allowed event-time lateness (seconds): events arriving more than
#: this far below the watermark are dropped-and-counted, matching
#: withWatermark semantics
LATENESS_S = 6 * 3600


def _events_cols(events: DataFrame) -> DataFrame:
    return events.select("user_id", "event_id", "ts", "event_type")


def _empty_like(kind_rows: DataFrame) -> DataFrame:
    return kind_rows.filter(F.lit(False))


def _assemble(counts: DataFrame, buffer: DataFrame,
              wm_ts, dropped: int, spark: SparkSession) -> DataFrame:
    """Union the three row kinds into the single state schema."""
    ts_type = buffer.schema["ts"].dataType
    c = counts.select(
        F.lit("c").alias("kind"), "prev_type", "next_type", "n",
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast(ts_type).alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast(ts_type).alias("wm"),
        F.lit(None).cast("long").alias("dropped"))
    b = buffer.select(
        F.lit("b").alias("kind"),
        F.lit(None).cast("string").alias("prev_type"),
        F.lit(None).cast("string").alias("next_type"),
        F.lit(None).cast("long").alias("n"),
        "user_id", "ts", "event_id", "event_type",
        F.lit(None).cast(ts_type).alias("wm"),
        F.lit(None).cast("long").alias("dropped"))
    w = spark.createDataFrame([("w",)], "kind string").select(
        "kind",
        F.lit(None).cast("string").alias("prev_type"),
        F.lit(None).cast("string").alias("next_type"),
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("long").alias("user_id"),
        F.lit(None).cast(ts_type).alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(wm_ts).cast(ts_type).alias("wm"),
        F.lit(dropped).cast("long").alias("dropped"))
    return c.unionByName(b).unionByName(w)


def _tail_split(events: DataFrame, horizon) -> tuple[DataFrame, DataFrame]:
    """(finalized-pair deltas, new buffer) from per-user sorted events:
    finalize consecutive pairs whose later endpoint is ≤ horizon; keep
    everything above the horizon plus one anchor per user (the latest
    event ≤ horizon)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.withColumn("prev_type2", F.lag("event_type").over(w))
    delta = (seq.filter(F.col("prev_type2").isNotNull()
                        & (F.col("ts") <= F.lit(horizon)))
             .groupBy(F.col("prev_type2").alias("prev_type"),
                      F.col("event_type").alias("next_type"))
             .agg(F.count("*").cast("long").alias("n")))
    anchor = (events.filter(F.col("ts") <= F.lit(horizon))
              .groupBy("user_id")
              .agg(F.max_by(
                  F.struct("ts", "event_id", "event_type"),
                  F.struct("ts", "event_id")).alias("s"))
              .select("user_id", "s.ts", "s.event_id", "s.event_type"))
    buffer = (events.filter(F.col("ts") > F.lit(horizon))
              .select("user_id", "ts", "event_id", "event_type")
              .unionByName(anchor))
    return delta, buffer


def late_transitions_state(events: DataFrame) -> DataFrame:
    """Build state from the first batch: watermark = max ts, finalize
    below (watermark − LATENESS), buffer the tail + anchors."""
    spark = events.sparkSession
    ev = _events_cols(events)
    row = ev.agg(F.max("ts").alias("wm")).collect()[0]
    wm = row["wm"]
    if wm is None:
        counts = (ev.groupBy(F.col("event_type").alias("prev_type"),
                             F.col("event_type").alias("next_type"))
                  .agg(F.count("*").cast("long").alias("n"))
                  .filter(F.lit(False)))
        return _assemble(counts, _empty_like(
            ev.select("user_id", "ts", "event_id", "event_type")),
            None, 0, spark)
    import datetime as dt
    horizon = wm - dt.timedelta(seconds=LATENESS_S)
    delta, buffer = _tail_split(ev, horizon)
    return _assemble(delta, buffer, wm, 0, spark)


def merge_late_transitions_state(prev: DataFrame,
                                 batch_events: DataFrame) -> DataFrame:
    """Fold one arbitrarily-ordered batch: admit events strictly
    above the PREVIOUS horizon (drop-and-count the rest), advance the
    watermark, finalize newly-below-horizon pairs, re-buffer."""
    from .state_fold import watermark_prologue
    spark = prev.sparkSession
    ev = _events_cols(batch_events)
    _, dropped, wm_new, horizon_new, admitted, n_late = \
        watermark_prologue(prev, ev, LATENESS_S)
    if wm_new is None:           # still no events anywhere
        return prev

    buffer_prev = (prev.filter(F.col("kind") == "b")
                   .select("user_id", "ts", "event_id", "event_type"))
    batch_users = admitted.select("user_id").distinct()
    touched = buffer_prev.join(batch_users, "user_id", "left_semi")
    untouched = buffer_prev.join(batch_users, "user_id", "left_anti")

    # untouched users still move below the advancing horizon: their
    # buffered pairs may finalize this fold even with no new events
    delta_t, buffer_t = _tail_split(
        touched.unionByName(admitted.select("user_id", "ts", "event_id",
                                            "event_type")),
        horizon_new)
    delta_u, buffer_u = _tail_split(untouched, horizon_new)

    counts = (prev.filter(F.col("kind") == "c")
              .select("prev_type", "next_type", "n")
              .unionByName(delta_t).unionByName(delta_u)
              .groupBy("prev_type", "next_type")
              .agg(F.sum("n").cast("long").alias("n")))
    return _assemble(counts, buffer_t.unionByName(buffer_u),
                     wm_new, dropped + n_late, spark)


def state_to_report(state: DataFrame) -> DataFrame:
    """Serve the batch twin's top-K report: finalized counts ⊎ the
    buffered tail's transitions (anchor → first unfinalized pair
    included — it was deliberately NOT finalized)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tail = (state.filter(F.col("kind") == "b")
            .select("user_id", "ts", "event_id", "event_type")
            .withColumn("prev_type2", F.lag("event_type").over(w))
            .filter(F.col("prev_type2").isNotNull())
            .groupBy(F.col("prev_type2").alias("prev_type"),
                     F.col("event_type").alias("next_type"))
            .agg(F.count("*").cast("long").alias("n")))
    trans = (state.filter(F.col("kind") == "c")
             .select("prev_type", "next_type", "n")
             .unionByName(tail)
             .groupBy("prev_type", "next_type")
             .agg(F.sum("n").cast("long").alias("n")))
    total = trans.agg(F.sum("n").alias("total"))
    from ..functions.compat import fround
    return (
        trans.join(F.broadcast(total))
        .select("prev_type", "next_type", F.col("n").cast("long").alias("n"),
                fround(F.col("n") / F.col("total"), 6).alias("share"))
        .orderBy(F.col("n").desc(), "prev_type", "next_type")
        .limit(TRANSITION_TOP_K)
    )


def dropped_late_count(state: DataFrame) -> int:
    """The watermark row's dropped-event metric (monitoring surface)."""
    return state.filter(F.col("kind") == "w").collect()[0]["dropped"]


def fold_batch_into_state(batch_df: DataFrame, batch_id: int,
                          state_path: str) -> bool:
    """Shared idempotent-fold template bound to the late-tolerant
    state pair (streaming/state_fold.py)."""
    return fold_batch(batch_df, batch_id, state_path,
                      late_transitions_state,
                      merge_late_transitions_state)


def run_late_transitions_maintainer(events_stream: DataFrame,
                                    state_path: str, checkpoint: str):
    """foreachBatch maintainer (shared template; restart-safe,
    replay-safe, atomic staged-swap state)."""
    return run_maintainer(events_stream, state_path, checkpoint,
                          late_transitions_state,
                          merge_late_transitions_state)


def events_transitions_late_tolerant(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Registry entry: a genuinely OUT-OF-ORDER two-batch arrival —
    batch 1 is everything at or below the midpoint EXCEPT a held-back
    3-hour slice just under it; batch 2 delivers the rest of the
    stream PLUS that slice, so its events interleave 3 hours below
    batch 1's maximum (disorder the strict maintainer's contract
    forbids, well inside LATENESS). The oracle is the batch twin's
    FULL-RECOMPUTE SQL: watermark finalization must make disorder
    invisible. (Two bounded metadata collects pick the split; the
    fold's own scalar reads are the 'w' row.)"""
    import datetime as dt

    cat = Catalog(spark, sf_dir)
    ev = cat.events
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    # Empty feed (a source partition can legitimately match nothing):
    # an epoch pivot makes both simulated batches empty, and the
    # build/merge pair already handles None watermarks downstream.
    import datetime as _dt
    mid = (lo + (hi - lo) / 2) if lo is not None else _dt.datetime(1970, 1, 1)
    # held-back slice (mid−6h, mid−3h]: batch 1 spans up to mid but
    # skips the slice; batch 2 delivers the slice together with
    # everything after mid — its slice events arrive 3-6 h below
    # batch 1's maximum, inside LATENESS
    slice_lo = mid - dt.timedelta(seconds=LATENESS_S)
    slice_hi = mid - dt.timedelta(seconds=3 * 3600)
    in_slice = ((F.col("ts") > F.lit(slice_lo))
                & (F.col("ts") <= F.lit(slice_hi)))
    first = ev.filter((F.col("ts") <= F.lit(mid)) & ~in_slice)
    second = ev.filter((F.col("ts") > F.lit(mid)) | in_slice)
    # r12: BOTH states localCheckpoint-ed (supersedes the round-7
    # finding that a PIN of the merged state was a net loss — pin
    # caches data but every reference re-embeds the state's full
    # LOGICAL plan, so Catalyst re-analyzed a multiplied tree per
    # action; the checkpoint truncates the plan itself, and the
    # interleaved A/B reads 3.95/3.74/2.98 → 3.76/3.13/2.91 s across
    # three passes at sf0.1. The real maintainer materializes state
    # to parquet every fold anyway).
    # track_ckpt: registers the checkpoint refs so release_all() on a
    # long-lived host drops them promptly (cache.py scope note).
    from ..cache import track_ckpt
    state = track_ckpt(merge_late_transitions_state(
        track_ckpt(late_transitions_state(first).localCheckpoint()),
        second).localCheckpoint())
    return state_to_report(state)


register("events_transitions_late_tolerant",
         events_transitions_late_tolerant, EVENTS_TRANSITIONS_SQL)

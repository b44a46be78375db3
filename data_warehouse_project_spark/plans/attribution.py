"""Multi-touch revenue attribution — first-touch / last-touch /
linear credit of purchase revenue to preceding marketing touches
(round 7; the analytics family funnels and transition mining don't
cover: "which touch type gets the credit for this purchase?").

Semantics: for every purchase by a known user, the touches (view /
click events of the same user) in the trailing LOOKBACK_S seconds
split the purchase value three ways — all-to-earliest (first-touch),
all-to-latest (last-touch), and proportional-to-touch-count (linear).
Purchases with no in-window touch credit the '(none)' bucket.
NULL-user events are excluded up front in BOTH engines: a NULL user
partition would attribute anonymous purchases to other anonymous
users' touches.

Plan shape (the 100 TB path): ONE user-keyed window exchange
computes, per purchase row, the in-window touch counts and the
first/last touch via RANGE frames over integer seconds; everything
downstream is purchases-sized, and the final models are three
bounded aggregations (≤ touch-types + 1 rows each) stitched by
broadcast full-outer joins. No self-join of events against events —
the range join that naive attribution does is folded into the
window frame.

Determinism notes:
- first/last touch inside the frame is selected by an ENCODED long
  ``(sec − epoch0)·1e10 + event_id·2 + is_click`` — min/max over
  longs is engine-identical, ties inside one second break by
  event_id then type; this avoids struct-ordering semantics in
  window frames, which DuckDB and Spark don't share. Bounds: sec −
  epoch0 < 2^31 for dates through ~2085 and event_id < 5·10^9 keep
  the encoding inside int64 (asserted generously vs driver data; a
  100 TB deployment with wider ids would switch to the struct form
  on the Spark side and keep the oracle on a sampled slice).
- the RANGE frame is (−LOOKBACK_S, −1) on whole seconds: a touch in
  the purchase's own second is NOT in its lookback (sub-second order
  isn't portable across engines).
- money is cents-exact: value → floor(·100+.5) longs; the linear
  split quantizes each per-purchase share with the same floor(+.5)
  on identical integer operands, then sums as longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog

#: trailing attribution window (seconds)
LOOKBACK_S = 72 * 3600

#: encoding bases for the first/last touch argmin/argmax
_EPOCH0 = 1_500_000_000
_KEY_BASE = 10_000_000_000


def attribution_frame(events: DataFrame) -> DataFrame:
    """Core over any events-shaped frame (see module docstring).
    Output: touch_type, n_first, first_revenue, n_last, last_revenue,
    linear_revenue."""
    ev = (events
          .filter(F.col("user_id").isNotNull())
          .select(
              "user_id", "event_id", "event_type", "value",
              F.floor(F.unix_timestamp("ts")).cast("long").alias("sec")))
    is_click = (F.col("event_type") == "click").cast("long")
    is_view = (F.col("event_type") == "view").cast("long")
    touch_key = F.when(
        F.col("event_type").isin("view", "click"),
        (F.col("sec") - F.lit(_EPOCH0)) * F.lit(_KEY_BASE)
        + F.col("event_id") * 2 + is_click)
    w = (Window.partitionBy("user_id").orderBy("sec")
         .rangeBetween(-LOOKBACK_S, -1))
    zl = F.lit(0).cast("long")
    scored = (
        # COALESCE the frame sums: a purchase with an EMPTY lookback
        # frame gets NULL (not 0) from SUM-over-window in both
        # engines, which would silently drop its '(none)' linear
        # credit (n_total = NULL fails both > 0 and = 0)
        ev.withColumn("n_view", F.coalesce(F.sum(is_view).over(w), zl))
        .withColumn("n_click", F.coalesce(F.sum(is_click).over(w), zl))
        .withColumn("first_key", F.min(touch_key).over(w))
        .withColumn("last_key", F.max(touch_key).over(w))
        .filter(F.col("event_type") == "purchase")
        .withColumn("cents",
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .withColumn("n_total", F.col("n_view") + F.col("n_click"))
    )

    def _key_type(key):
        return (F.when(key.isNull(), F.lit("(none)"))
                .when(key % 2 == 1, F.lit("click"))
                .otherwise(F.lit("view")))

    from ..cache import pin
    scored = pin(scored.select(
        "cents", "n_view", "n_click", "n_total",
        _key_type(F.col("first_key")).alias("first_type"),
        _key_type(F.col("last_key")).alias("last_type")))

    first = (scored.groupBy(F.col("first_type").alias("touch_type"))
             .agg(F.count("*").cast("long").alias("n_first"),
                  F.sum("cents").cast("long").alias("first_cents")))
    last = (scored.groupBy(F.col("last_type").alias("touch_type"))
            .agg(F.count("*").cast("long").alias("n_last"),
                 F.sum("cents").cast("long").alias("last_cents")))
    share = lambda n: F.floor(  # noqa: E731
        F.col("cents") * n / F.col("n_total") + F.lit(0.5)).cast("long")
    linear = (
        scored.select(F.explode(F.array(
            F.struct(F.lit("view").alias("touch_type"),
                     F.when(F.col("n_total") > 0, share(F.col("n_view")))
                     .otherwise(F.lit(0)).alias("c")),
            F.struct(F.lit("click").alias("touch_type"),
                     F.when(F.col("n_total") > 0, share(F.col("n_click")))
                     .otherwise(F.lit(0)).alias("c")),
            F.struct(F.lit("(none)").alias("touch_type"),
                     F.when(F.col("n_total") == 0, F.col("cents"))
                     .otherwise(F.lit(0)).alias("c")))).alias("x"))
        .groupBy(F.col("x.touch_type").alias("touch_type"))
        .agg(F.sum("x.c").cast("long").alias("linear_cents")))
    z = F.lit(0).cast("long")
    return (
        first.join(last, "touch_type", "full_outer")
        .join(F.broadcast(linear), "touch_type", "full_outer")
        .filter((F.coalesce(F.col("n_first"), z)
                 + F.coalesce(F.col("n_last"), z)
                 + F.coalesce(F.col("linear_cents"), z)) > 0)
        .select(
            "touch_type",
            F.coalesce(F.col("n_first"), z).alias("n_first"),
            fround(F.coalesce(F.col("first_cents"), z).cast("double")
                   / 100, 2).alias("first_revenue"),
            F.coalesce(F.col("n_last"), z).alias("n_last"),
            fround(F.coalesce(F.col("last_cents"), z).cast("double")
                   / 100, 2).alias("last_revenue"),
            fround(F.coalesce(F.col("linear_cents"), z).cast("double")
                   / 100, 2).alias("linear_revenue"),
        )
    )


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: the attribution report over the corpus
    events table."""
    return attribution_frame(Catalog(spark, sf_dir).events)


EVENTS_ATTRIBUTION_SQL = f"""
WITH ev AS (
    SELECT user_id, event_id, event_type, value,
           CAST(FLOOR(date_part('epoch', ts)) AS BIGINT) AS sec
    FROM events WHERE user_id IS NOT NULL
),
scored AS (
    SELECT event_type, value,
           COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER w, 0) AS n_view,
           COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER w, 0) AS n_click,
           MIN(CASE WHEN event_type IN ('view', 'click') THEN
               (sec - {_EPOCH0}) * {_KEY_BASE} + event_id * 2
               + CASE WHEN event_type = 'click' THEN 1 ELSE 0 END END)
               OVER w AS first_key,
           MAX(CASE WHEN event_type IN ('view', 'click') THEN
               (sec - {_EPOCH0}) * {_KEY_BASE} + event_id * 2
               + CASE WHEN event_type = 'click' THEN 1 ELSE 0 END END)
               OVER w AS last_key
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN {LOOKBACK_S} PRECEDING AND 1 PRECEDING)
),
p AS (
    SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
           n_view, n_click, n_view + n_click AS n_total,
           CASE WHEN first_key IS NULL THEN '(none)'
                WHEN first_key % 2 = 1 THEN 'click' ELSE 'view' END
               AS first_type,
           CASE WHEN last_key IS NULL THEN '(none)'
                WHEN last_key % 2 = 1 THEN 'click' ELSE 'view' END
               AS last_type
    FROM scored WHERE event_type = 'purchase'
),
first_m AS (
    SELECT first_type AS touch_type, CAST(COUNT(*) AS BIGINT) AS n_first,
           CAST(SUM(cents) AS BIGINT) AS first_cents
    FROM p GROUP BY 1
),
last_m AS (
    SELECT last_type AS touch_type, CAST(COUNT(*) AS BIGINT) AS n_last,
           CAST(SUM(cents) AS BIGINT) AS last_cents
    FROM p GROUP BY 1
),
linear_m AS (
    SELECT touch_type, CAST(SUM(c) AS BIGINT) AS linear_cents FROM (
        SELECT 'view' AS touch_type,
               CASE WHEN n_total > 0 THEN
                   CAST(FLOOR(cents * n_view / n_total + 0.5) AS BIGINT)
                   ELSE 0 END AS c
        FROM p
        UNION ALL
        SELECT 'click',
               CASE WHEN n_total > 0 THEN
                   CAST(FLOOR(cents * n_click / n_total + 0.5) AS BIGINT)
                   ELSE 0 END
        FROM p
        UNION ALL
        SELECT '(none)',
               CASE WHEN n_total = 0 THEN cents ELSE 0 END
        FROM p
    ) GROUP BY 1
)
SELECT touch_type,
       CAST(COALESCE(f.n_first, 0) AS BIGINT) AS n_first,
       {sql_fround('COALESCE(f.first_cents, 0) / 100.0', 2)}
           AS first_revenue,
       CAST(COALESCE(l.n_last, 0) AS BIGINT) AS n_last,
       {sql_fround('COALESCE(l.last_cents, 0) / 100.0', 2)}
           AS last_revenue,
       {sql_fround('COALESCE(li.linear_cents, 0) / 100.0', 2)}
           AS linear_revenue
FROM first_m f
FULL OUTER JOIN last_m l USING (touch_type)
FULL OUTER JOIN linear_m li USING (touch_type)
WHERE COALESCE(f.n_first, 0) + COALESCE(l.n_last, 0)
      + COALESCE(li.linear_cents, 0) > 0
"""

register("events_attribution", events_attribution, EVENTS_ATTRIBUTION_SQL)

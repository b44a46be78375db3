"""A/B experimentation analysis — deterministic hash bucketing, per-
arm conversion funnel, and the two-proportion z-test, as one
registered report (the analysis a growth team runs on the reference's
events stream; bucketing-by-hash and the pooled two-proportion z are
the standard experimentation-platform primitives, e.g. Kohavi et al.,
"Trustworthy Online Controlled Experiments").

Arm assignment hashes a salted user key with sha256 (the engine-
side `sha2` / DuckDB `sha256` idiom of filter_computed_hash,
operators/relational.py:89): the LAST hex nibble's parity splits
users 50/50. Salting by experiment name is what makes consecutive
experiments independent — reusing user_id % 2 would put the same
users in 'A' forever.

Conversion semantics: a user is EXPOSED at their first 'click'
event; they CONVERT if any 'purchase' lands inside the 24-hour
attribution window after exposure (an unbounded window is vacuous on
this domain — virtually every active user purchases eventually; the
bounded window is also what real experiments measure). The exposure
time attaches to each of the user's events via a per-user analytic
min, so one pass computes the windowed flag — no self-join.

Cross-engine determinism: counts are exact longs; rates, lift and
the z statistic are a fixed dag of IEEE ops (divide / multiply /
subtract / sqrt — ALL correctly rounded per IEEE-754, including
sqrt; no libm transcendental anywhere), so doubles match bit-for-bit
and fround is belt-and-braces (compat.py policy).

Scale design (100 TB): one events scan -> per-user partial
aggregation (shuffle on user_id, map-side combined); the per-arm
rollup shuffles 2 rows; the final single-row report joins arms by a
pivot-free conditional aggregation. Nothing downstream of the user
collapse scales with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog

#: experiment salt — distinct experiments get independent splits
_SALT = "exp-checkout-v1:"

#: two-sided 95% critical value
_Z_CRIT = 1.96

#: attribution window after first exposure
_WINDOW_HOURS = 24

#: hex nibbles that map to arm A (parity of the last sha256 nibble)
_A_NIBBLES = "02468ace"


def _arm():
    return F.when(
        F.substring(F.sha2(F.concat(F.lit(_SALT),
                                    F.col("user_id").cast("string")), 256),
                    64, 1).isin(*_A_NIBBLES),
        F.lit("A")).otherwise(F.lit("B"))


def events_ab_conversion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row experiment readout: per-arm exposed/converted
    counts and rates, absolute and relative lift (B vs A), the pooled
    two-proportion z statistic, and the |z| > 1.96 significance
    flag."""
    from pyspark.sql import Window

    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id")
    per_user = (
        cat.events
        .where(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "event_type", "ts")
        .withColumn(
            "first_click",
            F.min(F.when(F.col("event_type") == "click", F.col("ts")))
            .over(w))
        .where(F.col("first_click").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max(
                F.when((F.col("event_type") == "purchase")
                       & (F.col("ts") >= F.col("first_click"))
                       & (F.col("ts") <= F.col("first_click")
                          + F.expr(f"INTERVAL {_WINDOW_HOURS} HOURS")), 1)
                .otherwise(0)).cast("long").alias("converted"),
        )
        .select(_arm().alias("arm"), "converted")
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    one = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("conv_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    rb = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pooled = ((F.col("conv_a") + F.col("conv_b")).cast("double")
              / (F.col("n_a") + F.col("n_b")).cast("double"))
    se = F.sqrt(pooled * (F.lit(1.0) - pooled)
                * (F.lit(1.0) / F.col("n_a").cast("double")
                   + F.lit(1.0) / F.col("n_b").cast("double")))
    z = F.when(se > 0, (rb - ra) / se)
    return one.select(
        "n_a", "conv_a", "n_b", "conv_b",
        fround(ra, 9).alias("rate_a"),
        fround(rb, 9).alias("rate_b"),
        fround(rb - ra, 9).alias("abs_lift"),
        fround(F.when(ra > 0, (rb - ra) / ra), 9).alias("rel_lift"),
        fround(z, 9).alias("z_score"),
        (F.abs(F.coalesce(z, F.lit(0.0))) > F.lit(_Z_CRIT))
        .alias("significant"),
    )


EVENTS_AB_SQL = f"""
WITH flagged AS (
    SELECT user_id, event_type, ts,
           MIN(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id) AS first_click
    FROM events
    WHERE event_type IN ('click', 'purchase')
),
per_user AS (
    SELECT user_id,
           CAST(MAX(CASE WHEN event_type = 'purchase'
                          AND ts >= first_click
                          AND ts <= first_click
                              + INTERVAL {_WINDOW_HOURS} HOUR
                         THEN 1 ELSE 0 END) AS BIGINT) AS converted
    FROM flagged
    WHERE first_click IS NOT NULL
    GROUP BY 1
),
assigned AS (
    SELECT CASE WHEN substr(sha256('{_SALT}' || CAST(user_id AS VARCHAR)),
                            64, 1) IN
                ('0','2','4','6','8','a','c','e')
                THEN 'A' ELSE 'B' END AS arm,
           converted
    FROM per_user
),
arms AS (
    SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(converted) AS BIGINT) AS conv
    FROM assigned GROUP BY 1
),
one AS (
    SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
           MAX(CASE WHEN arm = 'A' THEN conv END) AS conv_a,
           MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
           MAX(CASE WHEN arm = 'B' THEN conv END) AS conv_b
    FROM arms
)
SELECT n_a, conv_a, n_b, conv_b,
       {sql_fround('CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)', 9)}
           AS rate_a,
       {sql_fround('CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)', 9)}
           AS rate_b,
       {sql_fround('CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)'
                   ' - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)', 9)}
           AS abs_lift,
       {sql_fround(
           'CASE WHEN conv_a > 0 THEN'
           ' (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)'
           '  - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))'
           ' / (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) END', 9)}
           AS rel_lift,
       {sql_fround(
           'CASE WHEN SQRT((CAST(conv_a + conv_b AS DOUBLE)'
           '   / CAST(n_a + n_b AS DOUBLE))'
           '  * (1.0 - CAST(conv_a + conv_b AS DOUBLE)'
           '     / CAST(n_a + n_b AS DOUBLE))'
           '  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))'
           ' > 0 THEN'
           ' (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)'
           '  - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))'
           ' / SQRT((CAST(conv_a + conv_b AS DOUBLE)'
           '   / CAST(n_a + n_b AS DOUBLE))'
           '  * (1.0 - CAST(conv_a + conv_b AS DOUBLE)'
           '     / CAST(n_a + n_b AS DOUBLE))'
           '  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))'
           ' END', 9)} AS z_score,
       ABS(COALESCE(
           CASE WHEN SQRT((CAST(conv_a + conv_b AS DOUBLE)
               / CAST(n_a + n_b AS DOUBLE))
              * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                 / CAST(n_a + n_b AS DOUBLE))
              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
             > 0 THEN
             (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
              - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
             / SQRT((CAST(conv_a + conv_b AS DOUBLE)
               / CAST(n_a + n_b AS DOUBLE))
              * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                 / CAST(n_a + n_b AS DOUBLE))
              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
           END, 0.0)) > {_Z_CRIT} AS significant
FROM one
"""

register("events_ab_conversion_report", events_ab_conversion_report,
         EVENTS_AB_SQL)

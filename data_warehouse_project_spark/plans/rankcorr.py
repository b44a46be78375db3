"""Rank-based association measures — Spearman correlation and the
Kruskal-Wallis k-sample test, both on exact doubled-midrank algebra.

Completes the nonparametric wing the Mann-Whitney U opened
(plans/experiment.py): MW answers "did ONE binary split shift a
distribution?", Kruskal-Wallis generalizes to k groups, and Spearman
replaces Pearson-style association (the OLS family's R²) with a
monotone-association measure that heavy tails can't distort.

Shared rank discipline (the MW pattern): ranks are NEVER computed per
row. Values are bucketed onto a bounded domain, grouped into a
histogram, and each tie group's DOUBLED average midrank
d = 2*count_below + count + 1 is an exact BIGINT — every rank sum,
product and moment stays an integer until one final fixed dag of
IEEE ops (* / - sqrt, all correctly rounded; no transcendental).

Scale design (100 TB): each statistic is one corpus-sized
map-side-combined aggregation onto a BOUNDED key domain (order-count
x spend-bucket cells for Spearman; dollar values for
Kruskal-Wallis), then all rank algebra runs on the histogram. The
rank-prefix windows order tens-to-thousands of distinct buckets, not
rows. Kruskal-Wallis's per-group fold pivots the FIXED 5-value
priority domain into one row, so the cross-group sum is a fixed
expression tree — deterministic operand order by construction, never
an order-dependent float aggregate.

Integer headroom: with N entities and doubled midranks <= 2N+1, the
Spearman sums are bounded by ~4N^3 (s_xy) — BIGINT-safe through
N ~ 1e6 entities; the Kruskal-Wallis doubled rank-sums by 2N^2
(safe through N ~ 2e9 rows). Beyond, widen the moment columns to
DECIMAL(38,0) (compat.py escape hatch). The r_g^2/n_g and
(N*s_xy - s_x*s_y) combinations intentionally move to DOUBLE — they
exceed 2^53 at warehouse scale, where IEEE correct rounding keeps
them engine-identical even though no longer exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..cache import pin
from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog

#: spend bucket width for the Spearman monetary axis, in cents
#: ($100 buckets): bounds the rank domain AND makes ties — hence the
#: midrank machinery — non-vacuous at every scale factor
_SPEND_BUCKET_CENTS = 10_000

#: chi-square upper critical value at p=0.05 with k-1 = 4 dof
#: (5 order priorities) — pinned constant, same role as _Z_CRIT
_KW_CHI2_CRIT_4DOF = 9.488

#: the fixed TPC-H order-priority domain (reference data dictionary);
#: pivoting over it keeps the cross-group fold a fixed expression tree
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
               "5-LOW"]


def _doubled_midranks(hist: DataFrame, val_col: str) -> DataFrame:
    """Attach the doubled average midrank to a (val_col, cnt, ...)
    histogram: d = 2*(rows strictly below) + cnt + 1 — an exact
    BIGINT because the doubling absorbs the .5 of tied average
    ranks."""
    w = (Window.orderBy(val_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return hist.withColumn(
        "d", (F.lit(2) * (F.sum("cnt").over(w) - F.col("cnt"))
              + F.col("cnt") + F.lit(1)).cast("long"))


def customer_value_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's order COUNT
    (frequency) and total spend ($100 buckets) — "do frequent buyers
    spend more?" asked monotonically, immune to the spend
    distribution's heavy tail that would dominate a Pearson estimate.

    Midranks come from the two MARGINAL histograms of the bounded
    (frequency x spend-bucket) joint histogram; each marginal joins
    back by broadcast, so after the per-customer collapse nothing
    shuffles more than the joint cell count. rho is Pearson on
    doubled midranks (the doubling cancels):
    rho = (N*s_xy - s_x*s_y) / sqrt((N*s_xx - s_x^2)(N*s_yy - s_y^2)),
    where every s_* is an exact BIGINT moment of the cell counts.
    """
    cat = Catalog(spark, sf_dir)
    per_cust = (cat.orders
                .groupBy("o_custkey")
                .agg(F.count("*").cast("long").alias("x"),
                     (F.sum(F.floor(F.col("o_totalprice") * F.lit(100.0)
                                    + F.lit(0.5)).cast("long"))
                      .cast("long")).alias("cents"))
                .select("x", F.expr(f"cents DIV {_SPEND_BUCKET_CENTS}")
                        .cast("long").alias("y")))
    # pinned: the joint histogram feeds both marginals AND the final
    # moment fold — without the pin the per-customer collapse would
    # rescan orders three times
    joint = pin(per_cust.groupBy("x", "y").agg(
        F.count("*").cast("long").alias("cnt")))
    mx = _doubled_midranks(
        joint.groupBy("x").agg(F.sum("cnt").cast("long").alias("cnt")),
        "x").select("x", F.col("d").alias("dx"))
    my = _doubled_midranks(
        joint.groupBy("y").agg(F.sum("cnt").cast("long").alias("cnt")),
        "y").select("y", F.col("d").alias("dy"))
    cells = (joint
             .join(F.broadcast(mx), "x")
             .join(F.broadcast(my), "y"))
    t = cells.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cnt") * F.col("dx")).cast("long").alias("s_x"),
        F.sum(F.col("cnt") * F.col("dy")).cast("long").alias("s_y"),
        F.sum(F.col("cnt") * F.col("dx") * F.col("dy")).cast("long")
        .alias("s_xy"),
        F.sum(F.col("cnt") * F.col("dx") * F.col("dx")).cast("long")
        .alias("s_xx"),
        F.sum(F.col("cnt") * F.col("dy") * F.col("dy")).cast("long")
        .alias("s_yy"))
    nd = F.col("n").cast("double")
    num = nd * F.col("s_xy").cast("double") \
        - F.col("s_x").cast("double") * F.col("s_y").cast("double")
    var_x = nd * F.col("s_xx").cast("double") \
        - F.col("s_x").cast("double") * F.col("s_x").cast("double")
    var_y = nd * F.col("s_yy").cast("double") \
        - F.col("s_y").cast("double") * F.col("s_y").cast("double")
    return t.select(
        "n", "s_x", "s_y", "s_xy", "s_xx", "s_yy",
        fround(F.when((var_x > F.lit(0.0)) & (var_y > F.lit(0.0)),
                      num / F.sqrt(var_x * var_y)), 6).alias("rho"))


CUSTOMER_VALUE_SPEARMAN_SQL = f"""
WITH per_cust AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS x,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) // {_SPEND_BUCKET_CENTS} AS y
    FROM orders GROUP BY o_custkey
),
joint AS (
    SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM per_cust GROUP BY x, y
),
mx AS (
    SELECT x, CAST(2 * (SUM(cnt) OVER (ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - cnt) + cnt + 1 AS BIGINT) AS dx
    FROM (SELECT x, CAST(SUM(cnt) AS BIGINT) AS cnt
          FROM joint GROUP BY x)
),
my AS (
    SELECT y, CAST(2 * (SUM(cnt) OVER (ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - cnt) + cnt + 1 AS BIGINT) AS dy
    FROM (SELECT y, CAST(SUM(cnt) AS BIGINT) AS cnt
          FROM joint GROUP BY y)
),
t AS (
    SELECT CAST(SUM(j.cnt) AS BIGINT) AS n,
           CAST(SUM(j.cnt * mx.dx) AS BIGINT) AS s_x,
           CAST(SUM(j.cnt * my.dy) AS BIGINT) AS s_y,
           CAST(SUM(j.cnt * mx.dx * my.dy) AS BIGINT) AS s_xy,
           CAST(SUM(j.cnt * mx.dx * mx.dx) AS BIGINT) AS s_xx,
           CAST(SUM(j.cnt * my.dy * my.dy) AS BIGINT) AS s_yy
    FROM joint j JOIN mx USING (x) JOIN my USING (y)
)
SELECT n, s_x, s_y, s_xy, s_xx, s_yy,
       {sql_fround(
           'CASE WHEN (CAST(n AS DOUBLE) * CAST(s_xx AS DOUBLE)'
           '           - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE)) > 0'
           ' AND (CAST(n AS DOUBLE) * CAST(s_yy AS DOUBLE)'
           '      - CAST(s_y AS DOUBLE) * CAST(s_y AS DOUBLE)) > 0 THEN'
           ' (CAST(n AS DOUBLE) * CAST(s_xy AS DOUBLE)'
           ' - CAST(s_x AS DOUBLE) * CAST(s_y AS DOUBLE))'
           ' / SQRT((CAST(n AS DOUBLE) * CAST(s_xx AS DOUBLE)'
           '         - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE))'
           '        * (CAST(n AS DOUBLE) * CAST(s_yy AS DOUBLE)'
           '           - CAST(s_y AS DOUBLE) * CAST(s_y AS DOUBLE)))'
           ' END',
           6)} AS rho
FROM t
"""

register("customer_value_spearman", customer_value_spearman,
         CUSTOMER_VALUE_SPEARMAN_SQL)


def kw_fold(vals: DataFrame, groups: list[str]) -> DataFrame:
    """Kruskal-Wallis fold over a (g: string, v: long) frame with a
    FIXED group domain — split out so planted group shifts exercise
    the rank and H algebra directly (tests/test_rankcorr.py).

    H (with doubled rank-sums R_g_d):
      H = 3/(N(N+1)) * sum_g(R_g_d^2 / n_g) - 3(N+1),
    tie-corrected H' = H / (1 - T/(N^3 - N)), T = sum(c^3 - c).
    The per-group squares move to DOUBLE (documented: > 2^53 at
    warehouse scale, correctly rounded and engine-identical); the
    cross-group sum is a FIXED k-term expression after the pivot, so
    no float-aggregation order enters.
    """
    hist = vals.groupBy("v").agg(
        F.count("*").cast("long").alias("cnt"),
        *[F.sum(F.when(F.col("g") == g, 1).otherwise(0)).cast("long")
          .alias(f"cnt_{i}") for i, g in enumerate(groups)])
    ranked = _doubled_midranks(hist, "v")
    t = ranked.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt")
              - F.col("cnt")).cast("long").alias("tie_term"),
        *[F.sum(F.col(f"cnt_{i}")).cast("long").alias(f"n_{i}")
          for i in range(len(groups))],
        *[F.sum(F.col(f"cnt_{i}") * F.col("d")).cast("long")
          .alias(f"r_{i}_d") for i in range(len(groups))])
    nd = F.col("n").cast("double")
    sum_terms = None
    for i in range(len(groups)):
        term = F.when(
            F.col(f"n_{i}") > 0,
            F.col(f"r_{i}_d").cast("double")
            * F.col(f"r_{i}_d").cast("double")
            / F.col(f"n_{i}").cast("double")).otherwise(F.lit(0.0))
        sum_terms = term if sum_terms is None else sum_terms + term
    # Guard the N(N+1) divisor (ADVICE r8). On an empty input SUM
    # yields NULL n (so the WHEN falls through to NULL anyway), and a
    # literal n = 0 is unreachable from kw_fold's own groupBy — but
    # the guard keeps the division conditional in both engines rather
    # than relying on NULL propagation, matching the other degenerate
    # guards in this fold.
    h = F.when(
        F.col("n") > 0,
        F.lit(3.0) / (nd * (nd + F.lit(1.0))) * sum_terms
        - F.lit(3.0) * (nd + F.lit(1.0)))
    # corr's own divisor N^3 - N is 0 at N = 1, and Spark-4 ANSI mode
    # turns that into a runtime DIVIDE_BY_ZERO (a division in a WHEN
    # *condition* executes unconditionally — found by the hypothesis
    # property test), so corr itself must be conditional: NULL at
    # N <= 1, which the outer guard then propagates.
    corr = F.when(
        F.col("n") > 1,
        F.lit(1.0)
        - F.col("tie_term").cast("double") / (nd * nd * nd - nd))
    # corr is exactly 0 when EVERY value ties (one histogram bucket):
    # T = N^3 - N. Guard the divide (ADVICE r7) — H' and the
    # significance verdict are NULL on that degenerate input, matching
    # the zero-variance Spearman convention.
    h_tc = F.when(corr > 0, h / corr)
    return t.select(
        "n", "tie_term",
        *[c for i in range(len(groups))
          for c in (F.col(f"n_{i}"), F.col(f"r_{i}_d"))],
        fround(h, 6).alias("h"),
        fround(h_tc, 6).alias("h_tie_corrected"),
        (h_tc > F.lit(_KW_CHI2_CRIT_4DOF)).alias("significant"))


def orders_priority_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis test: does order VALUE (whole dollars) differ
    across the five order priorities? The k-sample generalization of
    the Mann-Whitney arm test — a significant H says at least one
    priority's price distribution is stochastically shifted, with no
    normality assumption. One scan -> dollar-value histogram with
    per-priority conditional counts; the priority domain is the fixed
    TPC-H dictionary, so the group pivot is compile-time."""
    cat = Catalog(spark, sf_dir)
    vals = cat.orders.select(
        F.col("o_orderpriority").alias("g"),
        F.expr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)"
               " DIV 100").alias("v"))
    return kw_fold(vals, _PRIORITIES)


def _kw_sql() -> str:
    k = len(_PRIORITIES)
    cnt_cols = ",\n           ".join(
        f"CAST(SUM(CASE WHEN g = '{g}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS cnt_{i}" for i, g in enumerate(_PRIORITIES))
    n_cols = ",\n           ".join(
        f"CAST(SUM(cnt_{i}) AS BIGINT) AS n_{i}" for i in range(k))
    r_cols = ",\n           ".join(
        f"CAST(SUM(cnt_{i} * d) AS BIGINT) AS r_{i}_d" for i in range(k))
    out_pairs = ", ".join(f"n_{i}, r_{i}_d" for i in range(k))
    sum_terms = "\n             + ".join(
        f"(CASE WHEN n_{i} > 0 THEN"
        f" CAST(r_{i}_d AS DOUBLE) * CAST(r_{i}_d AS DOUBLE)"
        f" / CAST(n_{i} AS DOUBLE) ELSE 0.0 END)" for i in range(k))
    h = (f"(CASE WHEN n > 0 THEN"
         f" 3.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))"
         f" * ({sum_terms})"
         f" - 3.0 * (CAST(n AS DOUBLE) + 1.0) END)")
    corr = ("(CASE WHEN n > 1 THEN 1.0 - CAST(tie_term AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
            " * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) END)")
    return f"""
WITH vals AS (
    SELECT o_orderpriority AS g,
           CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) // 100 AS v
    FROM orders
),
hist AS (
    SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt,
           {cnt_cols}
    FROM vals GROUP BY v
),
ranked AS (
    SELECT *, CAST(2 * (SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - cnt) + cnt + 1 AS BIGINT) AS d
    FROM hist
),
t AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS n,
           CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_term,
           {n_cols},
           {r_cols}
    FROM ranked
)
SELECT n, tie_term, {out_pairs},
       {sql_fround(h, 6)} AS h,
       {sql_fround(f'CASE WHEN {corr} > 0 THEN {h} / {corr} END', 6)}
           AS h_tie_corrected,
       CASE WHEN {corr} > 0 THEN {h} / {corr} END
           > {_KW_CHI2_CRIT_4DOF} AS significant
FROM t
"""


register("orders_priority_kruskal", orders_priority_kruskal, _kw_sql())

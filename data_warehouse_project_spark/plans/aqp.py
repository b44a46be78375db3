"""Approximate query processing (AQP) — deterministic Bernoulli
sampling with Horvitz-Thompson scale-up, plus a driver-visible
accuracy gate.

The sketch families (HLL / KMV / CMS / Misra-Gries) approximate
SPECIFIC aggregates; uniform-sample AQP approximates ARBITRARY
additive aggregates from one reusable sample — the BlinkDB-style
trade: a 1/8 sample answers any SUM/COUNT rollup ~8x cheaper with a
quantifiable error bar (Agarwal et al., EuroSys 2013).

Sampler: a row enters the sample iff the last hex nibble of
sha256('aqp-v1:' || key) lands in a fixed 2-of-16 set — the salted
deterministic-hash idiom of the experiment arms
(plans/experiment.py) and filter_computed_hash. Determinism is what
makes the estimator ORACLE-CHECKABLE (both engines pick the exact
same rows) and what makes the sample REUSABLE: every query sees the
same sample, so estimates compose consistently.

Estimator: Horvitz-Thompson — each sampled row is reweighted by
1/p = 8, so est = 8 * SUM(sample). Unbiased for any additive
aggregate under Bernoulli sampling; the estimate columns stay exact
BIGINTs (integer cents x integer weight).

Scale design (100 TB): the hash predicate costs one full scan THE
FIRST time — production materializes the sample once as its own
partition/bucketed table (the writes.py layout path) and serves every
subsequent AQP query from a corpus 8x smaller; the registered query
expresses the per-query plan (scan -> hash filter -> map-side
combined groupBy). Since the filter is a pure function of the key,
re-materialization after appends is incremental (new rows only).

Error pin (aqp_error_floor): measured signed relative errors of the
HT total-count and total-revenue estimators vs the exact scan, gated
at 0.20 — the pinned-constant-floor family (ann_recall_floor /
minhash_accuracy_floor pattern). Measured margins on driver data:
rel err 0.061/0.067 (count/revenue) at sf0.001 (~190 sampled rows,
the worst case), 0.014/0.006 at sf0.01, 0.011/0.016 at sf0.1 — ≥3x
under the gate everywhere, and Bernoulli variance only shrinks as
rows grow. A fresh testdata regeneration that trips the gate means
the sample landed a >3-sigma tail, not an engine bug: re-measure and
re-pin (the floor-family policy, BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog

#: sampler salt — a second AQP sample set would change the salt,
#: exactly like a second experiment changes the arm salt
_AQP_SALT = "aqp-v1:"

#: hex nibbles admitting a row: 2 of 16 -> p = 1/8, weight 8
_AQP_NIBBLES = ("7", "e")

#: Horvitz-Thompson weight = 1/p
_AQP_WEIGHT = 16 // len(_AQP_NIBBLES)

#: relative-error gate for the floor query (see module docstring:
#: >=3x measured margin at every driver scale factor)
_AQP_REL_ERR_MAX = 0.20


def _sampled(orders: DataFrame) -> DataFrame:
    """The deterministic 1/8 Bernoulli sample of orders, with exact
    integer cents attached."""
    nib = F.substring(
        F.sha2(F.concat(F.lit(_AQP_SALT),
                        F.col("o_orderkey").cast("string")), 256),
        64, 1)
    return (orders
            .where(nib.isin(*_AQP_NIBBLES))
            .select("o_orderkey", "o_orderdate",
                    F.floor(F.col("o_totalprice") * F.lit(100.0)
                            + F.lit(0.5)).cast("long").alias("cents")))


def orders_aqp_monthly_revenue(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Monthly order-count and revenue ESTIMATES from the 1/8 sample:
    (month, n_sampled, est_orders, est_cents) — est columns are the
    HT scale-up, exact BIGINTs. The plan a dashboard would run 8x
    cheaper than the exact rollup; the floor query quantifies what
    that costs in accuracy."""
    cat = Catalog(spark, sf_dir)
    return estimates_from_sample(_sampled(cat.orders))


_SAMPLED_SQL = f"""
    SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
           o_orderdate
    FROM orders
    WHERE substr(sha256('{_AQP_SALT}' || CAST(o_orderkey AS VARCHAR)),
                 64, 1)
          IN ({", ".join("'" + c + "'" for c in _AQP_NIBBLES)})
"""

ORDERS_AQP_MONTHLY_SQL = f"""
WITH s AS ({_SAMPLED_SQL})
SELECT DATE_TRUNC('month', o_orderdate) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(COUNT(*) * {_AQP_WEIGHT} AS BIGINT) AS est_orders,
       CAST(SUM(cents) * {_AQP_WEIGHT} AS BIGINT) AS est_cents
FROM s
GROUP BY 1
ORDER BY month
"""

register("orders_aqp_monthly_revenue", orders_aqp_monthly_revenue,
         ORDERS_AQP_MONTHLY_SQL)


def aqp_error_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible AQP accuracy gate: the HT estimates of TOTAL
    order count and TOTAL revenue vs the exact scan, with their
    relative errors gated at 0.20 (>=3x measured margin per scale
    factor, module docstring). Both sides are computed by the Spark
    plan; the oracle recomputes them independently — the
    ann_recall_floor pattern, so a driver row proves the sampler and
    estimator really deliver the accuracy claimed, per scale
    factor."""
    cat = Catalog(spark, sf_dir)
    exact = cat.orders.agg(
        F.count("*").cast("long").alias("n_exact"),
        F.sum(F.floor(F.col("o_totalprice") * F.lit(100.0)
                      + F.lit(0.5)).cast("long")).cast("long")
        .alias("cents_exact"))
    est = _sampled(cat.orders).agg(
        (F.count("*") * F.lit(_AQP_WEIGHT)).cast("long")
        .alias("n_est"),
        (F.sum("cents") * F.lit(_AQP_WEIGHT)).cast("long")
        .alias("cents_est"))
    j = exact.crossJoin(F.broadcast(est))
    # Empty/degenerate corpus: n_exact = 0 (and cents_exact NULL) —
    # the relative errors are undefined, and an unguarded divide is a
    # Spark-4 ANSI DIVIDE_BY_ZERO crash (round-9 empty-input sweep).
    # NULL them in both engines; the ok gates then degrade to NULL.
    cnt_err = F.when(
        F.col("n_exact") > 0,
        F.abs(F.col("n_est") - F.col("n_exact")).cast("double")
        / F.col("n_exact").cast("double"))
    rev_err = F.when(
        F.col("cents_exact") > 0,
        F.abs(F.col("cents_est") - F.col("cents_exact"))
        .cast("double") / F.col("cents_exact").cast("double"))
    return j.select(
        "n_exact", "n_est", "cents_exact", "cents_est",
        fround(cnt_err, 6).alias("count_rel_err"),
        fround(rev_err, 6).alias("revenue_rel_err"),
        (cnt_err <= F.lit(_AQP_REL_ERR_MAX)).alias("count_ok"),
        (rev_err <= F.lit(_AQP_REL_ERR_MAX)).alias("revenue_ok"))


AQP_ERROR_FLOOR_SQL = f"""
WITH exact AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS cents_exact
    FROM orders
),
est AS (
    SELECT CAST(COUNT(*) * {_AQP_WEIGHT} AS BIGINT) AS n_est,
           CAST(SUM(cents) * {_AQP_WEIGHT} AS BIGINT) AS cents_est
    FROM ({_SAMPLED_SQL})
)
SELECT n_exact, n_est, cents_exact, cents_est,
       {sql_fround('CASE WHEN n_exact > 0 THEN'
                   ' CAST(ABS(n_est - n_exact) AS DOUBLE)'
                   ' / CAST(n_exact AS DOUBLE) END', 6)} AS count_rel_err,
       {sql_fround('CASE WHEN cents_exact > 0 THEN'
                   ' CAST(ABS(cents_est - cents_exact) AS DOUBLE)'
                   ' / CAST(cents_exact AS DOUBLE) END', 6)}
           AS revenue_rel_err,
       CASE WHEN n_exact > 0 THEN
            CAST(ABS(n_est - n_exact) AS DOUBLE) / CAST(n_exact AS DOUBLE)
            <= {_AQP_REL_ERR_MAX} END AS count_ok,
       CASE WHEN cents_exact > 0 THEN
            CAST(ABS(cents_est - cents_exact) AS DOUBLE)
            / CAST(cents_exact AS DOUBLE)
            <= {_AQP_REL_ERR_MAX} END AS revenue_ok
FROM exact CROSS JOIN est
"""

register("aqp_error_floor", aqp_error_floor, AQP_ERROR_FLOOR_SQL)


# --------------------------------------------------------------------------
# Incremental sample maintainer — the production path made real
# --------------------------------------------------------------------------
# The module docstring's scale argument ("materialize the sample once,
# append incrementally") as working code on the shared fold template
# (streaming/state_fold.py): because membership is a PURE ROW FUNCTION
# of the key, sample(A ∪ B) = sample(A) ∪ sample(B) — the mergeability
# lemma is set algebra, so the maintainer is a filtered append with
# the template's batch-id replay guard and atomic staged swap. Every
# AQP consumer then reads the always-current 1/8 sample instead of
# re-hashing the corpus.


def make_aqp_sample_fns():
    """(init_fn, merge_fn) for the shared fold template: state rows
    ARE the sampled order rows (key, date, exact cents)."""
    def init(batch_orders: DataFrame) -> DataFrame:
        return _sampled(batch_orders)

    def merge(prev: DataFrame, batch_orders: DataFrame) -> DataFrame:
        return prev.unionByName(_sampled(batch_orders))

    return init, merge


def aqp_sample_fold(batch_df: DataFrame, batch_id: int,
                    state_path: str) -> bool:
    """Idempotent sample fold (batch-id replay guard, staged swap)."""
    from ..streaming.state_fold import fold_batch
    init, merge = make_aqp_sample_fns()
    return fold_batch(batch_df, batch_id, state_path, init, merge)


def run_aqp_sample_maintainer(orders_stream: DataFrame, state_path: str,
                              checkpoint: str):
    """foreachBatch sample maintainer (restart-safe, replay-safe)."""
    from ..streaming.state_fold import run_maintainer
    init, merge = make_aqp_sample_fns()
    return run_maintainer(orders_stream, state_path, checkpoint,
                          init, merge)


def estimates_from_sample(sampled: DataFrame) -> DataFrame:
    """Monthly HT estimates from a (o_orderkey, o_orderdate, cents)
    sample frame — shared by the batch query above and the
    state-served path so the two can never drift apart."""
    return (sampled
            .groupBy(F.date_trunc("month", F.col("o_orderdate"))
                     .alias("month"))
            .agg(F.count("*").cast("long").alias("n_sampled"),
                 (F.count("*") * F.lit(_AQP_WEIGHT)).cast("long")
                 .alias("est_orders"),
                 (F.sum("cents") * F.lit(_AQP_WEIGHT)).cast("long")
                 .alias("est_cents"))
            .orderBy("month"))


def orders_aqp_sample_incremental(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Registry entry (EXACT oracle — the batch estimate SQL): fold
    orders in two batches by key parity, then serve the monthly
    estimates FROM THE FOLDED SAMPLE; by the mergeability lemma the
    folded sample equals the one-shot sample row-for-row, so the
    served estimates hash-match the full-recompute oracle with no
    knowledge that increments ever happened."""
    cat = Catalog(spark, sf_dir)
    orders = cat.orders
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 == 1)
    init, merge = make_aqp_sample_fns()
    return estimates_from_sample(merge(init(first), second))


register("orders_aqp_sample_incremental", orders_aqp_sample_incremental,
         ORDERS_AQP_MONTHLY_SQL)

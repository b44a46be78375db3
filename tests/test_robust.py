"""Semantic unit tests for the robust-statistics family
(plans/robust.py): hand-computable winsorized/trimmed means, the
outlier-resistance property itself (one huge outlier moves the mean
but not the robust pair), numpy/scipy-free reference agreement, and
small-n edge behavior (lo = 0 -> all three means coincide).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from data_warehouse_project_spark.plans.robust import winsorized_stats

from tests.helpers import fround_half_up as _fr


def _vals(spark, cents, group="g"):
    return spark.createDataFrame(
        [Row(g=group, cents=int(c)) for c in cents],
        "g string, cents long")


def test_winsorized_hand_computed_n20(spark):
    # n=20, lo=1: bounds are the 2nd smallest / 2nd largest values
    cents = [100 * v for v in range(1, 21)]  # 1.00 .. 20.00 currency
    r = winsorized_stats(_vals(spark, cents), "g").collect()[0]
    assert r["n_rows"] == 20
    assert r["p_lo"] == 2.0 and r["p_hi"] == 19.0
    assert r["mean"] == 10.5
    # winsorize: 1->2 and 20->19 => sum 2100-100-100=1900... recompute:
    # plain sum = 210.00; clamp replaces 1.00 with 2.00 (+1) and 20.00
    # with 19.00 (-1) => 210 -> 210, mean unchanged by symmetry
    assert r["winsorized_mean"] == 10.5
    # trimmed: drop 1.00 and 20.00 -> mean of 2..19 = 10.5 (symmetric)
    assert r["trimmed_mean"] == 10.5


def test_winsorized_outlier_resistance(spark):
    # same as above but the top value is a 100x outlier: the mean
    # moves, the robust estimates clamp/drop it entirely
    cents = [100 * v for v in range(1, 20)] + [2_000_00]
    r = winsorized_stats(_vals(spark, cents), "g").collect()[0]
    assert r["mean"] == 109.5  # dragged up by the outlier
    # winsor bound p_hi = 19.00 -> outlier clamped to 19.00; clamped
    # sum = 190 + 1 (1->2) + 19 (2000->19) = 210 -> mean 10.5
    assert r["p_hi"] == 19.0
    assert r["winsorized_mean"] == 10.5
    # trimmed drops 1.00 and 2000.00 -> mean of 2.00..19.00 = 10.5
    assert r["trimmed_mean"] == 10.5


def test_winsorized_small_group_no_trim(spark):
    # n=10 -> lo = floor(0.5) = 0: nothing trimmed, bounds = min/max,
    # all three means equal the plain mean
    cents = [100, 200, 300, 400, 500, 600, 700, 800, 900, 1000]
    r = winsorized_stats(_vals(spark, cents), "g").collect()[0]
    assert r["p_lo"] == 1.0 and r["p_hi"] == 10.0
    assert r["mean"] == r["winsorized_mean"] == r["trimmed_mean"] == 5.5


def test_winsorized_ties_at_bound_are_stable(spark):
    # duplicate values straddling the cut: equal values sum equally
    # regardless of row_number tie order
    cents = [100] * 5 + [500] * 30 + [900] * 5
    r = winsorized_stats(_vals(spark, cents), "g").collect()[0]
    # n=40, lo=2: bounds land inside the tied runs
    assert r["p_lo"] == 1.0 and r["p_hi"] == 9.0
    assert r["winsorized_mean"] == r["mean"]  # clamping ties is a no-op
    exp_trim = (100 * 3 + 500 * 30 + 900 * 3) / 36 / 100
    assert r["trimmed_mean"] == round(exp_trim, 6)


def test_winsorized_groups_independent(spark):
    df = _vals(spark, [100 * v for v in range(1, 21)], "a").union(
        _vals(spark, [1000] * 20, "b"))
    rows = {r["g"]: r for r in winsorized_stats(df, "g").collect()}
    assert rows["a"]["trimmed_mean"] == 10.5
    assert rows["b"]["mean"] == rows["b"]["winsorized_mean"] == 10.0


# --- two-pass exact median ---

def test_median_twopass_odd_even_and_singleton(spark):
    from data_warehouse_project_spark.plans.robust import median_twopass

    df = _vals(spark, [100, 300, 200], "odd").union(
        _vals(spark, [100, 200, 300, 400], "even")).union(
        _vals(spark, [777], "one")).union(
        _vals(spark, [500, 600], "two"))
    rows = {r["g"]: r for r in median_twopass(df, "g").collect()}
    assert rows["odd"]["median"] == 2.0
    assert rows["even"]["median"] == 2.5   # (200+300)/2 cents -> 2.50
    assert rows["one"]["median"] == 7.77 and rows["one"]["n_rows"] == 1
    assert rows["two"]["median"] == 5.5


def test_median_twopass_matches_numpy_on_wide_range(spark):
    import numpy as np
    from data_warehouse_project_spark.plans.robust import median_twopass

    # values spread far beyond _MBINS so many bins are occupied and
    # the candidate-bin refinement actually has to narrow
    cents = [(v * 7919) % 1_000_003 for v in range(501)]
    r = median_twopass(_vals(spark, cents), "g").collect()[0]
    assert r["median"] == round(float(np.median(cents)) / 100.0, 6)


def test_median_twopass_heavy_ties_across_cut(spark):
    from data_warehouse_project_spark.plans.robust import median_twopass

    # the median rank falls inside a run of identical values
    cents = [100] * 10 + [200] * 10 + [300] * 5
    r = median_twopass(_vals(spark, cents), "g").collect()[0]
    # n=25, k1=k2=13 -> value 200
    assert r["median"] == 2.0 and r["n_rows"] == 25


def _cells(spark, pts):
    from pyspark.sql import Row
    return spark.createDataFrame(
        [Row(g="g", t=int(t), y=int(y)) for t, y in pts],
        "g string, t long, y long")


def test_theilsen_exact_line_recovery(spark):
    from data_warehouse_project_spark.plans.robust import theilsen_fold

    rows = theilsen_fold(
        _cells(spark, [(t, 100 + 250 * t) for t in range(20)]),
        "g").collect()
    assert len(rows) == 1
    assert rows[0]["n_pairs"] == 20 * 19 // 2
    assert rows[0]["sen_slope"] == 250.0


def test_theilsen_shrugs_off_outliers_where_ols_cannot(spark):
    # 20 on-line months + 2 wild spikes: the pairwise-slope median
    # stays within 2% of the true slope while OLS is dragged >20% off
    from data_warehouse_project_spark.plans.regression import ols_fit
    from data_warehouse_project_spark.plans.robust import theilsen_fold

    pts = [(t, 10_000 + 500 * t) for t in range(20)]
    pts[3] = (3, 900_000)   # corrupted months
    pts[16] = (16, 1)
    sen = theilsen_fold(_cells(spark, pts), "g").collect()[0]["sen_slope"]
    ols = ols_fit(_cells(spark, pts), ["g"]).collect()[0]["slope"]
    assert abs(sen - 500.0) <= 10.0, sen
    assert abs(ols - 500.0) > 100.0, ols


def test_theilsen_negative_slope_floor_semantics(spark):
    # a falling exact line with a slope that is not milli-exact:
    # floor (not truncate-toward-zero) semantics must hold for
    # negative quantized slopes in both engines (the DIV-vs-// trap)
    from data_warehouse_project_spark.plans.robust import theilsen_fold

    # y = 1000 - t*1/3 scaled: use y = 1000 - (t // 3) pattern ->
    # pairwise slopes cluster around -1/3; all quantized via floor
    pts = [(t, 1000 - t // 3) for t in range(12)]
    r = theilsen_fold(_cells(spark, pts), "g").collect()[0]
    # floor(-1/3 * 1000) = -334 when a pair spans a step boundary
    # fractionally; the median must land in [-0.334, -0.25]
    assert -0.334 <= r["sen_slope"] <= -0.25, r


def test_median_ci_hand_ranks(spark):
    from data_warehouse_project_spark.plans.robust import median_ci_fold

    # n = 25 known values (1-indexed sorted = 10,20,...,250):
    # rank_lo = floor((25 - 1.96*5)/2) = floor(7.6) = 7
    # rank_med = 13, rank_hi = 25 - 7 + 1 = 19
    vals = list(range(10, 251, 10))
    df = spark.createDataFrame([Row(v=v) for v in reversed(vals)],
                               "v long")
    r = median_ci_fold(df).collect()[0]
    assert (r["n"], r["rank_lo"], r["rank_med"], r["rank_hi"]) == (
        25, 7, 13, 19)
    assert (r["ci_lo"], r["median_lo"], r["ci_hi"]) == (70, 130, 190)


def test_median_ci_tiny_n_clamps_to_extremes(spark):
    from data_warehouse_project_spark.plans.robust import median_ci_fold

    # n = 3: floor((3 - 1.96*sqrt(3))/2) = floor(-0.197) = -1 -> clamp
    # to rank 1; CI collapses to [min, max]
    df = spark.createDataFrame([Row(v=v) for v in (5, 11, 2)], "v long")
    r = median_ci_fold(df).collect()[0]
    assert (r["rank_lo"], r["rank_med"], r["rank_hi"]) == (1, 2, 3)
    assert (r["ci_lo"], r["median_lo"], r["ci_hi"]) == (2, 5, 11)


def test_median_ci_ties_resolve_by_cumulative_mass(spark):
    from data_warehouse_project_spark.plans.robust import median_ci_fold

    # heavy tie block straddling every rank: all three lookups must
    # land inside the tied value by cumulative mass, not row identity
    df = spark.createDataFrame(
        [Row(v=v) for v in [1] * 5 + [7] * 20 + [9] * 5], "v long")
    r = median_ci_fold(df).collect()[0]
    assert r["n"] == 30
    assert (r["ci_lo"], r["median_lo"], r["ci_hi"]) == (7, 7, 7)


# ---------------------------------------------------------------------------
# Winsorized / trimmed fold vs a sorted sequential model
# ---------------------------------------------------------------------------

def _winsor_reference(cents):
    """Sequential replay of the module contract: lo = floor(0.05·n),
    winsor bounds at ranks lo+1 / n−lo of the sorted values, exact
    integer clamped/trimmed sums, final IEEE divides only."""
    s = sorted(cents)
    n = len(s)
    lo = math.floor(n * 0.05)
    c_lo, c_hi = s[lo], s[n - lo - 1]
    sum_all = sum(s)
    sum_wins = sum(min(max(c, c_lo), c_hi) for c in s)
    sum_trim = sum(s[lo:n - lo])
    kept = n - 2 * lo
    return (n, _fr(c_lo / 100.0, 2), _fr(c_hi / 100.0, 2),
            _fr(sum_all / n / 100.0, 6),
            _fr(sum_wins / n / 100.0, 6),
            _fr(sum_trim / kept / 100.0, 6))


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cents=st.lists(st.integers(-10 ** 4, 10 ** 6),
                      min_size=1, max_size=60))
def test_winsorized_matches_python_reference(spark, cents):
    """Random value lists (ties, negatives, sizes straddling the
    lo = 0 → 1 → 2 trim steps): the windowed rank fold
    (plans/robust.py winsorized_stats) must reproduce the sorted
    sequential model — bounds, exact clamped and trimmed sums, and
    the quantized currency divisions."""
    r = winsorized_stats(_vals(spark, cents), "g").collect()[0]
    got = (r["n_rows"], r["p_lo"], r["p_hi"], r["mean"],
           r["winsorized_mean"], r["trimmed_mean"])
    assert got == _winsor_reference(cents), cents


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cents=st.lists(st.integers(-10 ** 6, 10 ** 6),
                      min_size=1, max_size=50))
def test_median_twopass_matches_python_reference(spark, cents):
    """Random value lists (negatives, ties straddling the two middle
    ranks, single rows, ranges both narrower and wider than the 1024
    bins): the binned two-pass exact median must equal the sorted
    sequential definition — the quantized average of order statistics
    (n+1) DIV 2 and (n+2) DIV 2."""
    from data_warehouse_project_spark.plans.robust import median_twopass
    s = sorted(cents)
    n = len(s)
    v1, v2 = s[(n + 1) // 2 - 1], s[(n + 2) // 2 - 1]
    expected = (n, _fr((v1 + v2) / 2.0 / 100.0, 6))
    r = median_twopass(_vals(spark, cents), "g").collect()[0]
    assert (r["n_rows"], r["median"]) == expected, cents

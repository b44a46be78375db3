"""Semantic unit tests for the serial-correlation family
(plans/acf.py) — planted-signal invariants the parity suite can't
express: a pure period-3 square wave must put its ACF ridge exactly at
lags 3/6/9/12, a shifted-copy pair must put the cross-correlation peak
at the planted lead with coefficient ~1, and the exact-integer
num/den columns must reproduce numpy's estimator on the same centered
series.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from data_warehouse_project_spark.plans.acf import acf_fold, xcorr_fold

_D0 = datetime.datetime(2024, 1, 1)


def _daily(spark, vals):
    rows = [Row(day=_D0 + datetime.timedelta(days=i), v=int(v))
            for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "day timestamp, v long")


def _daily2(spark, xs, ys):
    rows = [Row(day=_D0 + datetime.timedelta(days=i), x=int(a), y=int(b))
            for i, (a, b) in enumerate(zip(xs, ys))]
    return spark.createDataFrame(rows, "day timestamp, x long, y long")


def test_acf_period3_ridge(spark):
    # period-3 pattern, 30 full cycles; mean = 200 exactly so the
    # floored-mean residuals are the true residuals (-100, -100, +200)
    vals = [100, 100, 400] * 30
    out = {r["lag"]: r for r in acf_fold(_daily(spark, vals)).collect()}
    assert set(out) == set(range(1, 15))
    # multiples of the period correlate positively, others negatively
    # at multiples of the period the unnormalized-edge estimator gives
    # exactly (n - lag) / n (87/90, 84/90, 81/90, 78/90)
    for lag in (3, 6, 9, 12):
        assert abs(out[lag]["acf"] - (90 - lag) / 90) < 1e-6
    for lag in (1, 2, 4, 5):
        assert out[lag]["acf"] < 0
    # exact-integer bookkeeping: den = sum(r^2) over all 90 days
    assert out[1]["den"] == 30 * (100**2 + 100**2 + 200**2)
    assert out[1]["n_pairs"] == 89


def test_acf_matches_numpy_estimator(spark):
    import numpy as np
    rng = [3, 17, 5, 40, 22, 8, 31, 15, 27, 11, 45, 2, 19, 38, 7,
           26, 33, 12, 48, 21, 9, 36, 14, 29, 42]
    out = {r["lag"]: r for r in acf_fold(_daily(spark, rng)).collect()}
    x = np.array(rng, dtype=np.int64)
    m = np.sum(x) // len(x)          # the documented floored mean
    r = x - m
    den = int(np.sum(r * r))
    for lag in range(1, 15):
        num = int(np.sum(r[lag:] * r[:-lag]))
        assert out[lag]["num"] == num
        assert out[lag]["den"] == den
        assert abs(out[lag]["acf"] - num / den) < 1e-6


def test_xcorr_shifted_copy_peaks_at_planted_lead(spark):
    # y is x delayed by 2 days -> x LEADS by 2 -> peak at lag -2
    # (docstring sign convention), coefficient ~1 on the overlap
    base = [10, 80, 30, 95, 5, 60, 25, 90, 15, 70, 40, 85, 20, 75,
            35, 55, 45, 65, 50, 100]
    xs = base
    ys = [0, 0] + base[:-2]
    out = {r["lag"]: r
           for r in xcorr_fold(_daily2(spark, xs, ys)).collect()}
    assert set(out) == set(range(-7, 8))
    peak = max(out.values(), key=lambda r: r["xcorr"])
    assert peak["lag"] == -2
    assert peak["xcorr"] > 0.75  # diluted by the 2 zero-pad edge days
    # symmetric-range bookkeeping: lag L loses |L| pairs
    assert out[0]["n_pairs"] == len(base)
    assert out[5]["n_pairs"] == len(base) - 5
    assert out[-5]["n_pairs"] == len(base) - 5


def test_xcorr_self_correlation_is_one_at_zero(spark):
    vals = [7, 21, 3, 45, 18, 33, 9, 27, 39, 12, 24, 6, 48, 15, 30]
    out = {r["lag"]: r
           for r in xcorr_fold(_daily2(spark, vals, vals)).collect()}
    assert out[0]["xcorr"] == 1.0
    assert out[0]["den_x"] == out[0]["den_y"] == out[0]["num"]


def test_acf_constant_series_yields_null(spark):
    # a constant series has zero residual variance: den = 0 and the
    # coefficient is NULL, not 0/0 (ADVICE r7 degenerate-input guard)
    out = acf_fold(_daily(spark, [7] * 40)).collect()
    assert out and all(r["den"] == 0 for r in out)
    assert all(r["acf"] is None for r in out)


def test_xcorr_constant_series_yields_null(spark):
    # either series constant -> its den is 0 -> NULL xcorr everywhere
    xs = [10, 80, 30, 95, 5, 60, 25, 90, 15, 70, 40, 85, 20, 75, 35]
    ys = [5] * 15
    out = xcorr_fold(_daily2(spark, xs, ys)).collect()
    assert out and all(r["den_y"] == 0 for r in out)
    assert all(r["xcorr"] is None for r in out)


# ---------------------------------------------------------------------------
# ACF fold vs a sequential Python model over random series
# ---------------------------------------------------------------------------

import math

from hypothesis import HealthCheck, given, settings, strategies as st


def _acf_reference(vs, max_lag):
    """Sequential replay of the fold contract: integer residuals
    around the truncating s DIV n mean, exact num/den, quantized
    IEEE divide, NULL acf on constant series, absent rows for lags
    with no pairs."""
    n, s = len(vs), sum(vs)
    m = abs(s) // n if s >= 0 else -(abs(s) // n)  # trunc like DIV
    r = [v - m for v in vs]
    den = sum(x * x for x in r)
    out = {}
    for lag in range(1, max_lag + 1):
        if n <= lag:
            continue
        num = sum(r[t] * r[t - lag] for t in range(lag, n))
        acf = (math.floor(num / den * 1e6 + 0.5) / 1e6
               if den > 0 else None)
        out[lag] = (n - lag, num, den, acf)
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vs=st.lists(st.integers(-100, 100), min_size=1, max_size=25),
       max_lag=st.integers(1, 5))
def test_acf_matches_python_reference(spark, vs, max_lag):
    """Random integer daily series (constant runs, negatives, series
    shorter than the lag window): the stacked-lag fold
    (plans/acf.py acf_fold) must reproduce the sequential estimator —
    exact integer numerators/denominator, pair counts, the truncating
    integer mean, and NULL coefficients on zero variance."""
    daily = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(vs)], "day long, v long")
    got = {r["lag"]: (r["n_pairs"], r["num"], r["den"], r["acf"])
           for r in acf_fold(daily, max_lag=max_lag).collect()}
    assert got == _acf_reference(vs, max_lag), (vs, max_lag)

"""Semantic unit tests for the sufficient-statistics OLS family
(plans/regression.py): exact-line recovery, agreement with numpy's
least squares on a noisy planted series, and the degenerate-series
NULL guards.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from data_warehouse_project_spark.plans.regression import ols_fit

from tests.helpers import fround_half_up as _fr


def _cells(spark, pts, group="g"):
    return spark.createDataFrame(
        [Row(g=group, t=int(t), y=int(y)) for t, y in pts],
        "g string, t long, y long")


def test_ols_exact_line(spark):
    # y = 7t + 3 exactly -> slope 7, intercept 3, r2 = 1
    pts = [(t, 7 * t + 3) for t in range(10)]
    r = ols_fit(_cells(spark, pts), ["g"]).collect()[0]
    assert r["n_points"] == 10
    assert r["slope"] == 7.0
    assert r["intercept"] == 3.0
    assert r["r2"] == 1.0


def test_ols_matches_numpy_on_noisy_series(spark):
    # deterministic pseudo-noise (no RNG: fixed arithmetic sequence)
    pts = [(t, 50 * t + 1000 + ((t * 37) % 11 - 5) * 13)
           for t in range(24)]
    r = ols_fit(_cells(spark, pts), ["g"]).collect()[0]
    ts = np.array([p[0] for p in pts], dtype=float)
    ys = np.array([p[1] for p in pts], dtype=float)
    slope, intercept = np.polyfit(ts, ys, 1)
    corr = np.corrcoef(ts, ys)[0, 1]
    assert abs(r["slope"] - slope) < 1e-6
    assert abs(r["intercept"] - intercept) < 1e-6
    assert abs(r["r2"] - corr * corr) < 1e-9


def test_ols_degenerate_guards(spark):
    # single point and constant-t series: no fit, NULLs not NaN/Inf
    df = spark.createDataFrame(
        [Row(g="single", t=5, y=100),
         Row(g="vert", t=2, y=10), Row(g="vert", t=2, y=20),
         Row(g="flat", t=0, y=42), Row(g="flat", t=1, y=42)],
        "g string, t long, y long")
    rows = {r["g"]: r for r in ols_fit(df, ["g"]).collect()}
    assert rows["single"]["slope"] is None
    assert rows["single"]["r2"] is None
    assert rows["vert"]["slope"] is None
    # constant y: slope 0 is a valid fit, but r2 is undefined
    assert rows["flat"]["slope"] == 0.0
    assert rows["flat"]["intercept"] == 42.0
    assert rows["flat"]["r2"] is None


def test_ols_groups_are_independent(spark):
    a = [(t, 2 * t) for t in range(5)]
    b = [(t, -3 * t + 10) for t in range(5)]
    df = _cells(spark, a, "a").union(_cells(spark, b, "b"))
    rows = {r["g"]: r for r in ols_fit(df, ["g"]).collect()}
    assert rows["a"]["slope"] == 2.0 and rows["a"]["intercept"] == 0.0
    assert rows["b"]["slope"] == -3.0 and rows["b"]["intercept"] == 10.0


def _series(spark, pts):
    return spark.createDataFrame(
        [Row(t=int(t), y=int(y)) for t, y in pts], "t long, y long")


def test_backtest_exact_line_recovery(spark):
    # an exactly linear series: every scored month's prediction must
    # recover the actual exactly (err = ape = 0) once n_train >= 12
    from data_warehouse_project_spark.plans.regression import (
        _BT_MIN_TRAIN, backtest_fold)

    pts = [(t, 5000 + 250 * t) for t in range(30)]
    rows = backtest_fold(_series(spark, pts)).collect()
    assert len(rows) == 30 - _BT_MIN_TRAIN
    for r in rows:
        assert r["n_train"] >= _BT_MIN_TRAIN
        assert r["err_cents"] == 0.0, r
        assert r["ape"] == 0.0, r
        assert r["pred_cents"] == float(r["actual_cents"]), r


def test_backtest_never_leaks_future_months(spark):
    # rolling-origin discipline: scores up to month t0 must be
    # byte-identical whether or not the series' FUTURE months change
    from data_warehouse_project_spark.plans.regression import backtest_fold

    base = [(t, 10000 + 137 * t + (t * t * 7) % 501) for t in range(40)]
    mutated = [(t, y if t <= 25 else y * 3 + 17) for t, y in base]
    a = {r["t"]: r for r in backtest_fold(_series(spark, base)).collect()}
    b = {r["t"]: r
         for r in backtest_fold(_series(spark, mutated)).collect()}
    for t in range(26):  # predictions AT t use months < t only
        if t in a:
            assert a[t] == b[t], t
    assert any(t > 25 and a[t] != b[t] for t in b)  # future did change


def _bt_frame(spark, errs, deploy_err):
    """Hand-built backtest frame: calibration months with the given
    signed errors, then one deployment month."""
    rows = []
    for i, e in enumerate(errs):
        rows.append((i, 12 + i, 1000 + i, 1000.0 + i - e, float(e), 0.0))
    rows.append((len(errs), 12 + len(errs), 5000,
                 5000.0 - deploy_err, float(deploy_err), 0.0))
    return spark.createDataFrame(
        rows, "t long, n_train long, actual_cents long, "
              "pred_cents double, err_cents double, ape double")


def test_conformal_rank_quantile_and_coverage(spark):
    from data_warehouse_project_spark.plans.regression import conformal_fold

    # 11 calibration errors 10..110 -> k = ceil(12*0.9) = 11 -> q is
    # the LARGEST |err| = 110; every cal month is covered; the
    # deployment month's |err| = 50 <= 110 -> covered
    errs = [10 * i for i in range(1, 12)]
    r = conformal_fold(_bt_frame(spark, errs, 50)).collect()[0]
    assert (r["n_cal"], r["k"]) == (11, 11)
    assert r["q_scaled"] == 110 * 10_000
    assert r["q_cents"] == 110.0
    assert r["n_covered_cal"] == 11
    assert r["last_covered"]
    assert r["lo_cents"] == r["last_pred_cents"] - 110.0
    assert r["hi_cents"] == r["last_pred_cents"] + 110.0


def test_conformal_k_is_exact_integer_ceiling(spark):
    from data_warehouse_project_spark.plans.regression import conformal_fold

    # the float trap: (89+1)*0.9 = 81.0 exactly in rationals but
    # 81.000000000000014 in doubles — the integer form must give 81
    errs = list(range(1, 90))           # n_cal = 89
    r = conformal_fold(_bt_frame(spark, errs, 40)).collect()[0]
    assert (r["n_cal"], r["k"]) == (89, 81)
    assert r["q_scaled"] == 81 * 10_000   # 81st smallest of 1..89
    assert r["n_covered_cal"] == 81
    assert r["last_covered"]              # 40 <= 81


def test_conformal_tiny_calibration_clamps_k(spark):
    from data_warehouse_project_spark.plans.regression import conformal_fold

    # n_cal = 3: ceil(4*0.9) = 4 > n_cal -> clamped to 3 (q = max)
    r = conformal_fold(_bt_frame(spark, [5, -7, 3], 100)).collect()[0]
    assert (r["n_cal"], r["k"]) == (3, 3)
    assert r["q_scaled"] == 7 * 10_000    # max |err|
    assert not r["last_covered"]          # 100 > 7


def test_backtest_zero_actual_yields_null_ape(spark):
    # a zero-revenue month (possible only in planted frames) must
    # yield NULL APE, not 0/0 — err_cents/pred stay defined
    from data_warehouse_project_spark.plans.regression import (
        _BT_MIN_TRAIN, backtest_fold)
    pts = [(t, 100 + 7 * t) for t in range(_BT_MIN_TRAIN)] + [
        (_BT_MIN_TRAIN, 0)]
    rows = {r["t"]: r for r in backtest_fold(_series(spark, pts)).collect()}
    r = rows[_BT_MIN_TRAIN]
    assert r["actual_cents"] == 0
    assert r["pred_cents"] is not None
    assert r["ape"] is None


# ---------------------------------------------------------------------------
# OLS fold vs the exact-integer-sums closed form in plain Python
# ---------------------------------------------------------------------------

def _ols_reference(pts):
    """Exact integer sufficient sums (Python ints = DECIMAL(38,0)),
    then the module's fixed IEEE dag: var/cov in doubles, NULL fits
    on zero t-variance, NULL R² when either variance is zero."""
    n = float(len(pts))
    st_ = float(sum(t for t, _ in pts))
    sy = float(sum(y for _, y in pts))
    stt = float(sum(t * t for t, _ in pts))
    sty = float(sum(t * y for t, y in pts))
    syy = float(sum(y * y for _, y in pts))
    var_t = n * stt - st_ * st_
    var_y = n * syy - sy * sy
    cov = n * sty - st_ * sy
    slope = cov / var_t if var_t > 0 else None
    intercept = (sy - (cov / var_t) * st_) / n if var_t > 0 else None
    r2 = (cov * cov / (var_t * var_y)
          if var_t > 0 and var_y > 0 else None)
    return (int(n), _fr(slope, 6), _fr(intercept, 6), _fr(r2, 9))


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pts=st.lists(st.tuples(st.integers(0, 12), st.integers(-50, 50)),
                    min_size=1, max_size=30))
def test_ols_matches_python_reference(spark, pts):
    """Random integer series (duplicate t, constant series, single
    points): the distributed sufficient-statistics fold (ols_fit)
    must reproduce the sequential closed form bit-for-bit, including
    the degenerate-variance NULL guards."""
    r = ols_fit(_cells(spark, pts), ["g"]).collect()[0]
    got = (r["n_points"], r["slope"], r["intercept"], r["r2"])
    assert got == _ols_reference(pts), pts


def _backtest_reference(pts):
    """Sequential rolling-origin replay: expanding exact-integer
    sums over strictly-prior months, the module's IEEE prediction
    dag, and the quantized error/APE columns (NULL APE at y = 0)."""
    from data_warehouse_project_spark.plans.regression import (
        _BT_MIN_TRAIN)
    s = sorted(pts)
    out = {}
    for i, (t, y) in enumerate(s):
        prior = s[:i]
        n = len(prior)
        if n < _BT_MIN_TRAIN:
            continue
        nf = float(n)
        st_ = float(sum(a for a, _ in prior))
        sy = float(sum(b for _, b in prior))
        stt = float(sum(a * a for a, _ in prior))
        sty = float(sum(a * b for a, b in prior))
        var_t = nf * stt - st_ * st_
        cov = nf * sty - st_ * sy
        if var_t > 0:
            slope = cov / var_t
            pred = (sy - slope * st_) / nf + slope * float(t)
            err = float(y) - pred
            ape = (_fr(abs(err) / float(y), 9) if y != 0 else None)
            out[t] = (n, y, _fr(pred, 4), _fr(err, 4), ape)
        else:
            out[t] = (n, y, None, None, None)
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pts=st.lists(st.tuples(st.integers(0, 30),
                              st.integers(0, 10 ** 6)),
                    max_size=20, unique_by=lambda p: p[0]))
def test_backtest_matches_python_reference(spark, pts):
    """Random monthly series (shorter than the 12-month warm-up,
    zero-revenue months, arbitrary gaps in t): the five-window-sum
    rolling-origin backtest must reproduce the sequential
    leakage-free replay month for month."""
    from data_warehouse_project_spark.plans.regression import (
        backtest_fold)
    monthly = spark.createDataFrame(
        [Row(t=int(t), y=int(y)) for t, y in pts] or
        [Row(t=0, y=0)], "t long, y long")
    if not pts:
        monthly = monthly.filter("t < 0")
    got = {r["t"]: (r["n_train"], r["actual_cents"], r["pred_cents"],
                    r["err_cents"], r["ape"])
           for r in backtest_fold(monthly).collect()}
    assert got == _backtest_reference(pts), pts


def _conformal_reference(rows):
    """Sequential split-conformal replay over a backtest frame:
    calibrate on all-but-last non-NULL residuals, exact integer rank
    k = min(ceil((n+1)·9/10), n), empirical coverage, and the
    deployed month's quantized interval."""
    if not rows:
        return {}
    last = max(rows, key=lambda r: r[0])
    cal = sorted(math.floor(abs(e) * 1e4 + 0.5)
                 for t, e, _, _ in rows if t < last[0] and e is not None)
    n_cal = len(cal)
    if n_cal == 0:
        q = cov = k = None
    else:
        k = min(((n_cal + 1) * 9 + 9) // 10, n_cal)
        q = cal[k - 1]
        cov = sum(1 for a in cal if a <= q)
    lt, le, la, lp = last
    qd = q / 1e4 if q is not None else None
    return {
        "n_cal": n_cal if n_cal else None,
        "k": k, "q_scaled": q, "n_covered_cal": cov,
        "last_t": lt, "last_actual_cents": la, "last_pred_cents": lp,
        "q_cents": _fr(qd, 4) if q is not None else None,
        "lo_cents": _fr(lp - qd, 4) if q is not None else None,
        "hi_cents": _fr(lp + qd, 4) if q is not None else None,
        "last_covered": (math.floor(abs(le) * 1e4 + 0.5) <= q
                         if q is not None and le is not None else None),
    }


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(0, 15),
              st.one_of(st.none(),
                        st.integers(-10 ** 5, 10 ** 5).map(
                            lambda a: a / 1e4)),
              st.integers(0, 10 ** 6),
              st.integers(0, 10 ** 7).map(lambda p: p / 1e4)),
    min_size=1, max_size=12, unique_by=lambda r: r[0]))
def test_conformal_matches_python_reference(spark, rows):
    """Random backtest frames (NULL-residual months, single-row
    frames with empty calibration sets, tie-heavy residuals): the
    windowed split-conformal fold must reproduce the sequential rank
    pick, empirical coverage, and deployed interval exactly."""
    from data_warehouse_project_spark.plans.regression import (
        conformal_fold)
    bt = spark.createDataFrame(
        [Row(t=int(t), n_train=12, actual_cents=int(a),
             pred_cents=float(p), err_cents=e,
             ape=None)
         for t, e, a, p in rows],
        "t long, n_train long, actual_cents long, pred_cents double, "
        "err_cents double, ape double")
    out = conformal_fold(bt).collect()
    expected = _conformal_reference(rows)
    assert len(out) == 1
    got = {c: out[0][c] for c in expected}
    assert got == expected, rows

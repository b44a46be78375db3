"""Semantic unit tests for the Kaplan-Meier survival operator
(plans/survival.py): hand-computed cohort risk sets / hazards /
quantized log-survival, the dead-risk-set sentinel, and the
censoring-vs-event distinction a naive average lifetime misses."""

from __future__ import annotations

import math

from pyspark.sql import Row

from data_warehouse_project_spark.plans.survival import km_fold


def _lifet(spark, rows):
    return spark.createDataFrame(
        [Row(churned=bool(ch), t_days=int(t)) for ch, t in rows],
        "churned boolean, t_days long")


def _q(x: float) -> int:
    return math.floor(x * 1e6 + 0.5)


def test_km_hand_computed_cohort(spark):
    # 5 subjects: events at t=2 (x2), censor at t=2, event at t=5,
    # censor at t=7 — risk sets 5 / 2 / 1, hazards 0.4 / 0.5 / 0
    out = {r["t_days"]: r for r in km_fold(_lifet(spark, [
        (True, 2), (True, 2), (False, 2), (True, 5), (False, 7),
    ])).collect()}
    assert [(r["n_risk"], r["d_churned"], r["c_censored"])
            for r in (out[2], out[5], out[7])] == [
        (5, 2, 1), (2, 1, 0), (1, 0, 1)]
    assert out[2]["hazard"] == 0.4
    assert out[5]["hazard"] == 0.5
    assert out[7]["hazard"] == 0.0
    s2 = _q(math.log(1 - 2 / 5))
    s5 = s2 + _q(math.log(1 - 1 / 2))
    assert out[2]["log_surv_micro"] == s2
    assert out[5]["log_surv_micro"] == s5
    assert out[7]["log_surv_micro"] == s5  # censoring leaves S flat
    assert not any(r["surv_zero"] for r in out.values())


def test_km_dead_risk_set_sentinel(spark):
    # when every remaining subject churns at the last time, S hits
    # exactly 0: the row carries surv_zero and no finite log term
    out = {r["t_days"]: r for r in km_fold(_lifet(spark, [
        (True, 1), (False, 1), (True, 3), (True, 3),
    ])).collect()}
    assert out[1]["surv_zero"] is False
    assert out[3]["n_risk"] == 2 and out[3]["d_churned"] == 2
    assert out[3]["surv_zero"] is True
    assert out[3]["log_surv_micro"] == out[1]["log_surv_micro"]


def test_km_censoring_is_not_an_event(spark):
    # all-censored cohort: hazard 0 everywhere, survival stays 1
    out = km_fold(_lifet(spark, [(False, t) for t in (1, 2, 3)])).collect()
    for r in out:
        assert r["hazard"] == 0.0
        assert r["log_surv_micro"] == 0
        assert not r["surv_zero"]


from hypothesis import HealthCheck, given, settings, strategies as st


def _km_reference(subjects):
    """Plain-Python Kaplan-Meier with the operator's exact
    quantization contract: hazard = floor(d/n·1e9 + .5)/1e9, log-
    survival = running sum of floor(ln(1−d/n)·1e6 + .5) over rows
    with d < n (NULL until the first finite term, mirroring Spark's
    null-skipping cumulative SUM)."""
    per_t = {}
    for ch, t in subjects:
        d, c = per_t.get(t, (0, 0))
        per_t[t] = (d + 1, c) if ch else (d, c + 1)
    remaining = len(subjects)
    run = None
    expected = {}
    for t in sorted(per_t):
        d, c = per_t[t]
        n = remaining
        hazard = math.floor(d / n * 1e9 + 0.5) / 1e9
        if d < n:
            run = (run or 0) + _q(math.log(1 - d / n))
        expected[t] = (n, d, c, hazard, run, d == n)
        remaining -= d + c
    return expected


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(subjects=st.lists(st.tuples(st.booleans(), st.integers(0, 8)),
                         min_size=1, max_size=25))
def test_km_fold_matches_python_reference(spark, subjects):
    """Random cohorts (ties, all-censored times, dying risk sets):
    the windowed KM fold (plans/survival.py:71) must reproduce the
    sequential estimator row for row — risk sets, integer event /
    censor counts, quantized hazard and log-survival, and the
    surv_zero sentinel exactly where d = n."""
    got = {r["t_days"]: (r["n_risk"], r["d_churned"], r["c_censored"],
                         r["hazard"], r["log_surv_micro"],
                         r["surv_zero"])
           for r in km_fold(_lifet(spark, subjects)).collect()}
    assert got == _km_reference(subjects), subjects

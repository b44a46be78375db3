"""Semantic unit tests for the A/B experimentation report
(plans/experiment.py): bucketing determinism and salt independence,
attribution-window edge cases, and the two-proportion z formula
against a hand computation.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from hypothesis import HealthCheck, given, settings, strategies as st

from data_warehouse_project_spark.plans.experiment import (
    _A_NIBBLES, _SALT, _WINDOW_HOURS, events_ab_conversion_report)

from tests.helpers import fround_half_up as _fr

_EV_SCHEMA = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def _arm_of(user_id: int) -> str:
    h = hashlib.sha256(f"{_SALT}{user_id}".encode()).hexdigest()
    return "A" if h[-1] in _A_NIBBLES else "B"


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, (u, et, ts) in enumerate(rows)],
        _EV_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_ab_window_edges_and_counts(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 5, 12, 0)
    inside = t0 + dt.timedelta(hours=_WINDOW_HOURS)          # converts
    outside = t0 + dt.timedelta(hours=_WINDOW_HOURS, seconds=1)
    # pick users per arm from the real hash so expectations are exact
    a_users = [u for u in range(1, 50) if _arm_of(u) == "A"][:3]
    b_users = [u for u in range(1, 50) if _arm_of(u) == "B"][:3]
    rows = []
    # A: u0 converts at the window edge; u1 purchase too late; u2
    # purchase BEFORE the click (never attributable)
    rows += [(a_users[0], "click", t0), (a_users[0], "purchase", inside)]
    rows += [(a_users[1], "click", t0), (a_users[1], "purchase", outside)]
    rows += [(a_users[2], "purchase", t0 - dt.timedelta(hours=1)),
             (a_users[2], "click", t0)]
    # B: two convert promptly, one never clicked (not exposed at all)
    rows += [(b_users[0], "click", t0),
             (b_users[0], "purchase", t0 + dt.timedelta(minutes=5))]
    rows += [(b_users[1], "click", t0),
             (b_users[1], "purchase", t0 + dt.timedelta(hours=1))]
    rows += [(b_users[2], "purchase", t0)]
    sf = _write_events(spark, tmp_path, rows)
    r = events_ab_conversion_report(spark, sf).collect()[0]
    assert (r["n_a"], r["conv_a"]) == (3, 1)
    assert (r["n_b"], r["conv_b"]) == (2, 2)
    assert r["rate_a"] == round(1 / 3, 9) and r["rate_b"] == 1.0


def test_ab_z_score_matches_hand_formula(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 5, 12, 0)
    buy = t0 + dt.timedelta(hours=1)
    a_users = [u for u in range(1, 400) if _arm_of(u) == "A"][:20]
    b_users = [u for u in range(1, 400) if _arm_of(u) == "B"][:20]
    rows = []
    for i, u in enumerate(a_users):            # 5 of 20 convert
        rows.append((u, "click", t0))
        if i < 5:
            rows.append((u, "purchase", buy))
    for i, u in enumerate(b_users):            # 14 of 20 convert
        rows.append((u, "click", t0))
        if i < 14:
            rows.append((u, "purchase", buy))
    sf = _write_events(spark, tmp_path, rows)
    r = events_ab_conversion_report(spark, sf).collect()[0]
    p = (5 + 14) / 40
    se = math.sqrt(p * (1 - p) * (1 / 20 + 1 / 20))
    z = (14 / 20 - 5 / 20) / se
    assert r["z_score"] == round(z, 9)
    assert r["significant"] is True            # |z| ~ 2.88 > 1.96
    assert r["rel_lift"] == round((0.7 - 0.25) / 0.25, 9)


def test_ab_bucketing_is_salted_and_balanced(spark):
    # determinism: the python-side hash IS the engine's assignment
    # (sha256 of the salted decimal string); balance: both arms
    # populated over a modest id range; salt dependence: a different
    # salt flips at least one user
    arms = [_arm_of(u) for u in range(1, 200)]
    assert 60 < arms.count("A") < 140
    other = [
        "A" if hashlib.sha256(f"other:{u}".encode()).hexdigest()[-1]
        in _A_NIBBLES else "B"
        for u in range(1, 200)]
    assert any(x != y for x, y in zip(arms, other))


# --- CUPED variance-reduced readout ---

def test_cuped_matches_hand_formula_and_reduces_variance(spark, tmp_path):
    """Planted per-user (x, y) with strong linear dependence: theta
    and the adjusted means must match the closed-form computation,
    rho2 must be high, and the SRM gate must pass on a near-even
    split."""
    import numpy as np
    from data_warehouse_project_spark.plans.experiment import (
        _PERIOD_SPLIT, events_ab_cuped_report)

    pre_t = dt.datetime(2024, 1, 10, 12, 0)
    post_t = dt.datetime(2024, 1, 20, 12, 0)
    users = list(range(1, 81))
    rows, xs, ys, arms = [], {}, {}, {}
    for u in users:
        arm = _arm_of(u)
        x = 10.0 + (u % 7) * 3.0          # pre-period covariate
        y = 2.0 * x + (1.5 if arm == "B" else 0.0)  # treatment effect
        rows.append((u, "view", pre_t, x))
        rows.append((u, "purchase", post_t, y))
        xs[u], ys[u], arms[u] = x, y, arm
    df = spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, (u, et, ts, v) in enumerate(rows)],
        _EV_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet")
    r = events_ab_cuped_report(spark, str(tmp_path)).collect()[0]

    xq = np.array([round(xs[u] * 100) for u in users], dtype=float)
    yq = np.array([round(ys[u] * 100) for u in users], dtype=float)
    n = len(users)
    var_x = n * (xq * xq).sum() - xq.sum() ** 2
    var_y = n * (yq * yq).sum() - yq.sum() ** 2
    cov = n * (xq * yq).sum() - xq.sum() * yq.sum()
    theta = cov / var_x
    assert r["theta"] == round(theta, 9)
    assert r["rho2"] == round(cov * cov / (var_x * var_y), 9)
    assert r["rho2"] > 0.9               # covariate explains most variance
    mean_x = xq.mean()
    for arm, (nk, mk, ak) in {
        "A": (r["n_a"], r["mean_y_a"], r["mean_y_a_adj"]),
        "B": (r["n_b"], r["mean_y_b"], r["mean_y_b_adj"]),
    }.items():
        sel = [u for u in users if arms[u] == arm]
        assert nk == len(sel)
        my = yq[[users.index(u) for u in sel]].mean()
        mx = xq[[users.index(u) for u in sel]].mean()
        assert mk == round(my / 100.0, 6)
        assert ak == round((my - theta * (mx - mean_x)) / 100.0, 6)
    # the adjusted lift isolates the planted +1.5 treatment effect
    # better than the raw lift contaminated by covariate imbalance
    assert abs(r["abs_lift_adj"] - 1.5) <= abs(r["abs_lift_raw"] - 1.5) + 1e-9
    assert r["srm_ok"] is True
    assert dt.datetime.fromisoformat(_PERIOD_SPLIT) > pre_t


def test_cuped_degenerate_constant_covariate(spark, tmp_path):
    """Constant x: var_x = 0 -> theta NULL, adjustment falls back to
    the raw means (th coalesced to 0)."""
    from data_warehouse_project_spark.plans.experiment import (
        events_ab_cuped_report)

    pre_t = dt.datetime(2024, 1, 10, 12, 0)
    post_t = dt.datetime(2024, 1, 20, 12, 0)
    rows = []
    for u in range(1, 41):
        rows.append((u, "view", pre_t, 5.0))
        rows.append((u, "purchase", post_t, float(u % 9)))
    df = spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, (u, et, ts, v) in enumerate(rows)],
        _EV_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet")
    r = events_ab_cuped_report(spark, str(tmp_path)).collect()[0]
    assert r["theta"] is None
    assert r["mean_y_a_adj"] == r["mean_y_a"]
    assert r["mean_y_b_adj"] == r["mean_y_b"]


def _write_valued_events(spark, tmp_path, rows):
    """rows: (user_id, event_type, ts, value)"""
    df = spark.createDataFrame(
        [(i, ts, u, et, float(v), "{}")
         for i, (u, et, ts, v) in enumerate(rows)],
        _EV_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _mw_brute(a_vals, b_vals):
    """Doubled U_B by pair counting: 2*U_B = 2*#(b>a) + #(b==a)."""
    u2 = 0
    for b in b_vals:
        for a in a_vals:
            u2 += 2 if b > a else (1 if b == a else 0)
    return u2


def test_mannwhitney_matches_pair_counting(spark, tmp_path):
    from data_warehouse_project_spark.plans.experiment import (
        events_ab_mannwhitney)
    t0 = dt.datetime(2024, 1, 5, 12, 0)
    a_users = [u for u in range(1, 200) if _arm_of(u) == "A"][:8]
    b_users = [u for u in range(1, 200) if _arm_of(u) == "B"][:8]
    # whole-dollar spends with deliberate cross-arm and in-arm ties
    a_vals = [10, 12, 12, 15, 20, 20, 33, 40]
    b_vals = [12, 18, 20, 25, 25, 25, 41, 55]
    rows = ([(u, "purchase", t0, v) for u, v in zip(a_users, a_vals)]
            + [(u, "purchase", t0, v) for u, v in zip(b_users, b_vals)]
            # non-purchase noise must be ignored
            + [(a_users[0], "click", t0, 999.0)])
    sf = _write_valued_events(spark, tmp_path, rows)
    r = events_ab_mannwhitney(spark, sf).collect()[0]
    assert (r["n_a"], r["n_b"]) == (8, 8)
    assert r["u_b_doubled"] == _mw_brute(a_vals, b_vals)
    # tie groups: 12x3, 20x3, 25x3 -> T = 3*(27-3) = 72
    assert r["tie_term"] == 72
    # doubled rank-sum identity: 2R_B = 2U_B + n_b*(n_b+1)
    assert r["r_b_doubled"] == r["u_b_doubled"] + 8 * 9


def test_mannwhitney_symmetric_samples_z_zero(spark, tmp_path):
    from data_warehouse_project_spark.plans.experiment import (
        events_ab_mannwhitney)
    t0 = dt.datetime(2024, 1, 5, 12, 0)
    a_users = [u for u in range(1, 200) if _arm_of(u) == "A"][:6]
    b_users = [u for u in range(1, 200) if _arm_of(u) == "B"][:6]
    vals = [5, 9, 14, 22, 30, 47]   # identical samples -> U = mu
    rows = ([(u, "purchase", t0, v) for u, v in zip(a_users, vals)]
            + [(u, "purchase", t0, v) for u, v in zip(b_users, vals)])
    sf = _write_valued_events(spark, tmp_path, rows)
    r = events_ab_mannwhitney(spark, sf).collect()[0]
    assert r["u_b_doubled"] == 6 * 6   # 2*U_B = n_a*n_b exactly
    assert r["z"] == 0.0
    assert not r["significant"]


def test_mannwhitney_planted_shift_is_significant(spark, tmp_path):
    from data_warehouse_project_spark.plans.experiment import (
        events_ab_mannwhitney)
    t0 = dt.datetime(2024, 1, 5, 12, 0)
    a_users = [u for u in range(1, 600) if _arm_of(u) == "A"][:20]
    b_users = [u for u in range(1, 600) if _arm_of(u) == "B"][:20]
    # B strictly dominates A -> 2U_B = 2*n_a*n_b, z > 1.96
    rows = ([(u, "purchase", t0, 10 + i)
             for i, u in enumerate(a_users)]
            + [(u, "purchase", t0, 1000 + i)
               for i, u in enumerate(b_users)])
    sf = _write_valued_events(spark, tmp_path, rows)
    r = events_ab_mannwhitney(spark, sf).collect()[0]
    assert r["u_b_doubled"] == 2 * 20 * 20
    assert r["z"] > 1.96 and r["significant"]


def test_mannwhitney_excludes_null_users(spark, tmp_path):
    # NULL-user purchases carry no arm assignment; they must be
    # excluded from the test population (ADVICE r7 — they previously
    # fell through the CASE ELSE into arm B), matching the rest of
    # the experiment family's user_id IS NOT NULL convention.
    from data_warehouse_project_spark.plans.experiment import (
        events_ab_mannwhitney)
    t0 = dt.datetime(2024, 1, 5, 12, 0)
    a_users = [u for u in range(1, 200) if _arm_of(u) == "A"][:6]
    b_users = [u for u in range(1, 200) if _arm_of(u) == "B"][:6]
    vals = [5, 9, 14, 22, 30, 47]
    rows = ([(u, "purchase", t0, v) for u, v in zip(a_users, vals)]
            + [(u, "purchase", t0, v) for u, v in zip(b_users, vals)]
            # NULL-user purchases at extreme values: excluded, so the
            # identical-samples symmetry must survive them
            + [(None, "purchase", t0, 10_000.0),
               (None, "purchase", t0, 0.0)])
    sf = _write_valued_events(spark, tmp_path, rows)
    r = events_ab_mannwhitney(spark, sf).collect()[0]
    assert (r["n_a"], r["n_b"]) == (6, 6)
    assert r["u_b_doubled"] == 6 * 6
    assert r["z"] == 0.0


def test_mannwhitney_all_tied_yields_null(spark, tmp_path):
    # every purchase the same whole-dollar value: sigma2 is exactly 0
    # and z/significant must be NULL, not NaN (the kw_fold ADVICE-r7
    # guard applied to the two-sample sibling)
    from data_warehouse_project_spark.plans.experiment import (
        events_ab_mannwhitney)
    t0 = dt.datetime(2024, 1, 5, 12, 0)
    a_users = [u for u in range(1, 200) if _arm_of(u) == "A"][:5]
    b_users = [u for u in range(1, 200) if _arm_of(u) == "B"][:5]
    rows = ([(u, "purchase", t0, 25) for u in a_users]
            + [(u, "purchase", t0, 25) for u in b_users])
    sf = _write_valued_events(spark, tmp_path, rows)
    r = events_ab_mannwhitney(spark, sf).collect()[0]
    n = r["n_a"] + r["n_b"]
    assert r["tie_term"] == n ** 3 - n
    assert r["z"] is None
    assert r["significant"] is None


def test_cuped_empty_arm_yields_null_not_crash(spark, tmp_path):
    # all users hash to arm B: n_a is a conditional COUNT (0, not
    # NULL), so the per-arm mean divides would crash under Spark-4
    # ANSI divide-by-zero semantics without the empty-population
    # guards — the report must come back with NULL A-side stats
    from data_warehouse_project_spark.plans.experiment import (
        events_ab_cuped_report)
    t0 = dt.datetime(2024, 6, 5, 12, 0)
    b_users = [u for u in range(1, 300) if _arm_of(u) == "B"][:6]
    rows = [(u, "purchase", t0, 10 + u) for u in b_users]
    sf = _write_valued_events(spark, tmp_path, rows)
    r = events_ab_cuped_report(spark, sf).collect()[0]
    assert r["n_a"] == 0 and r["n_b"] == 6
    assert r["mean_y_a"] is None
    assert r["mean_y_a_adj"] is None
    assert r["abs_lift_raw"] is None
    assert r["mean_y_b"] is not None
    assert r["srm_chi2"] == 6.0           # (0-6)^2 / 6, well-defined


# ---------------------------------------------------------------------------
# Mann-Whitney vs a full sequential model over random arm/value draws
# ---------------------------------------------------------------------------


def _mw_reference(pairs):
    """Complete sequential MW model: pair-counted doubled U, pooled
    tie cubes, Lehmann tie-corrected sigma^2 and the quantized z —
    NULL z/verdict when sigma^2 = 0, all-NULL row on empty input."""
    a = [v for u, v in pairs if _arm_of(u) == "A"]
    b = [v for u, v in pairs if _arm_of(u) == "B"]
    if not pairs:
        return (None,) * 7
    n_a, n_b = len(a), len(b)
    u2 = _mw_brute(a, b)
    r2 = u2 + n_b * (n_b + 1)
    pooled = a + b
    tie = sum(c ** 3 - c
              for c in (pooled.count(v) for v in set(pooled)))
    nn = float(n_a) + float(n_b)
    tie_frac = tie / (nn * (nn - 1.0)) if nn > 1.0 else 0.0
    sigma2 = float(n_a) * float(n_b) / 12.0 * ((nn + 1.0) - tie_frac)
    if sigma2 > 0:
        z = (float(u2) - float(n_a) * float(n_b)) \
            / (2.0 * math.sqrt(sigma2))
        # significance from the RAW z, as the engine computes it
        # (plans/experiment.py tests the unquantized z against 1.96);
        # quantize only the reported column afterwards (ADVICE r9: a
        # raw |z| inside (1.96, 1.96+5e-7) must not flip the verdict)
        sig = abs(z) > 1.96
        z = math.floor(z * 1e6 + 0.5) / 1e6
    else:
        z, sig = None, None
    return (n_a, n_b, r2, u2, tie, z, sig)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(st.tuples(st.integers(1, 120), st.integers(0, 6)),
                      max_size=25))
def test_mannwhitney_matches_python_reference(spark, tmp_path_factory,
                                              pairs):
    """Random (user, whole-dollar spend) draws — arbitrary tie
    structure, empty arms, all-tied corpora, empty input: the
    histogram-rank MW report must reproduce the sequential model in
    every column, including the sigma^2 = 0 NULL verdicts."""
    from data_warehouse_project_spark.plans.experiment import (
        events_ab_mannwhitney)
    t0 = dt.datetime(2024, 1, 5, 12, 0)
    tmp = tmp_path_factory.mktemp("mw")
    sf = _write_valued_events(
        spark, tmp, [(u, "purchase", t0, v) for u, v in pairs])
    r = events_ab_mannwhitney(spark, sf).collect()[0]
    got = (r["n_a"], r["n_b"], r["r_b_doubled"], r["u_b_doubled"],
           r["tie_term"], r["z"], r["significant"])
    assert got == _mw_reference(pairs), pairs


# ---------------------------------------------------------------------------
# CUPED vs a full sequential model over random pre/post draws
# ---------------------------------------------------------------------------


def _cuped_reference(rows):
    """Sequential CUPED replay: per-user exact pre/post cent sums,
    pooled moments, the module's IEEE dag for theta/rho2/adjusted
    means/lifts, and the SRM chi-square gate — NULL guards on zero
    covariate variance and empty arms."""
    per = {}
    for u, pre, typ, c in rows:
        x, y = per.get(u, (0, 0))
        if pre:
            x += c
        elif typ == "purchase":
            y += c
        per[u] = (x, y)
    arms = {u: _arm_of(u) for u in per}
    n = float(len(per))
    sx = float(sum(x for x, _ in per.values()))
    sy = float(sum(y for _, y in per.values()))
    sxx = float(sum(x * x for x, _ in per.values()))
    sxy = float(sum(x * y for x, y in per.values()))
    syy = float(sum(y * y for _, y in per.values()))
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    cov = n * sxy - sx * sy
    theta = cov / var_x if var_x > 0 else None
    rho2 = (cov * cov / (var_x * var_y)
            if var_x > 0 and var_y > 0 else None)
    th = theta if theta is not None else 0.0
    n_a = sum(1 for u in per if arms[u] == "A")
    n_b = len(per) - n_a
    sx_a = float(sum(x for u, (x, _) in per.items() if arms[u] == "A"))
    sy_a = float(sum(y for u, (_, y) in per.items() if arms[u] == "A"))
    sx_b = sx - sx_a
    sy_b = sy - sy_a
    mean_x = sx / n if n > 0 else None
    my_a = sy_a / n_a if n_a > 0 else None
    my_b = sy_b / n_b if n_b > 0 else None
    adj_a = (my_a - th * (sx_a / n_a - mean_x)
             if n_a > 0 and mean_x is not None else None)
    adj_b = (my_b - th * (sx_b / n_b - mean_x)
             if n_b > 0 and mean_x is not None else None)
    nd = float(n_a) - float(n_b)
    srm = (nd * nd / (n_a + n_b)) if n_a + n_b > 0 else None
    return (n_a, n_b,
            _fr(my_a / 100.0 if my_a is not None else None, 6),
            _fr(my_b / 100.0 if my_b is not None else None, 6),
            _fr(theta, 9), _fr(rho2, 9),
            _fr(adj_a / 100.0 if adj_a is not None else None, 6),
            _fr(adj_b / 100.0 if adj_b is not None else None, 6),
            _fr((my_b - my_a) / 100.0
                if None not in (my_a, my_b) else None, 6),
            _fr((adj_b - adj_a) / 100.0
                if None not in (adj_a, adj_b) else None, 6),
            _fr(srm, 9),
            (srm <= 10.83) if srm is not None else None)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.integers(1, 60),
              st.booleans(),
              st.sampled_from(["purchase", "view"]),
              st.integers(0, 10_000)),
    min_size=1, max_size=20))
def test_cuped_matches_python_reference(spark, tmp_path_factory, rows):
    """Random per-user pre/post event draws (constant covariates,
    single-arm corpora, purchase-free users): the single-aggregation
    CUPED report must reproduce the sequential replay in every
    column, NULL guards included."""
    from data_warehouse_project_spark.plans.experiment import (
        events_ab_cuped_report)
    pre_ts = dt.datetime(2024, 1, 10)
    post_ts = dt.datetime(2024, 1, 20)
    tmp = tmp_path_factory.mktemp("cuped")
    sf = _write_valued_events(
        spark, tmp,
        [(u, typ, pre_ts if pre else post_ts, c / 100.0)
         for u, pre, typ, c in rows])
    r = events_ab_cuped_report(spark, sf).collect()[0]
    got = (r["n_a"], r["n_b"], r["mean_y_a"], r["mean_y_b"],
           r["theta"], r["rho2"], r["mean_y_a_adj"], r["mean_y_b_adj"],
           r["abs_lift_raw"], r["abs_lift_adj"], r["srm_chi2"],
           r["srm_ok"])
    assert got == _cuped_reference(rows), rows


def _ab_reference(events):
    """Sequential two-proportion replay: exposure = has a click,
    conversion = any purchase inside the first-click window; pooled
    z with NULL guards (missing arm rows surface as NULL counts and
    a False significance via the z-coalesce)."""
    clicks, purch = {}, {}
    for u, t, m in events:
        (clicks if t == "click" else purch).setdefault(u, []).append(m)
    per_arm = {"A": [0, 0], "B": [0, 0]}
    for u, cs in clicks.items():
        fc = min(cs)
        conv = any(fc <= p <= fc + _WINDOW_HOURS * 60
                   for p in purch.get(u, []))
        st_ = per_arm[_arm_of(u)]
        st_[0] += 1
        st_[1] += 1 if conv else 0
    n_a, conv_a = per_arm["A"]
    n_b, conv_b = per_arm["B"]
    if n_a == 0:
        n_a = conv_a = None
    if n_b == 0:
        n_b = conv_b = None
    ra = conv_a / n_a if n_a else None
    rb = conv_b / n_b if n_b else None
    if n_a and n_b:
        pooled = (conv_a + conv_b) / (n_a + n_b)
        se = math.sqrt(pooled * (1.0 - pooled)
                       * (1.0 / n_a + 1.0 / n_b))
        z = (rb - ra) / se if se > 0 else None
    else:
        z = None
    return (n_a, conv_a, n_b, conv_b, _fr(ra, 9), _fr(rb, 9),
            _fr(rb - ra, 9) if None not in (ra, rb) else None,
            _fr((rb - ra) / ra, 9)
            if None not in (ra, rb) and ra > 0 else None,
            _fr(z, 9),
            abs(z if z is not None else 0.0) > 1.96)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(
    st.tuples(st.integers(1, 60),
              st.sampled_from(["click", "purchase"]),
              st.integers(0, 3000)),
    min_size=1, max_size=20))
def test_ab_conversion_matches_python_reference(
        spark, tmp_path_factory, events):
    """Random click/purchase streams (single-arm corpora, all-or-none
    conversion, purchases outside the attribution window): the
    windowed two-proportion report must match the sequential replay
    in every column, including NULL missing-arm counts and the
    z-coalesce significance."""
    t0 = dt.datetime(2024, 1, 5)
    tmp = tmp_path_factory.mktemp("ab")
    sf = _write_events(
        spark, tmp,
        [(u, t, t0 + dt.timedelta(minutes=m)) for u, t, m in events])
    r = events_ab_conversion_report(spark, sf).collect()[0]
    got = (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"], r["rate_a"],
           r["rate_b"], r["abs_lift"], r["rel_lift"], r["z_score"],
           r["significant"])
    assert got == _ab_reference(events), events

"""Semantic unit tests for the rank-association family
(plans/rankcorr.py) — invariants the parity suite can't express:
Spearman rho = ±1 on planted monotone/anti-monotone customer
profiles, a brute-force midrank identity on a tie-heavy case, and
Kruskal-Wallis H against a hand midrank computation, with the
identical-groups null and a planted stochastic shift.
"""

from __future__ import annotations

import datetime as dt

from data_warehouse_project_spark.plans.rankcorr import (
    _KW_CHI2_CRIT_4DOF, _PRIORITIES, _SPEND_BUCKET_CENTS,
    customer_value_spearman, kw_fold)

_O_SCHEMA = ("o_orderkey long, o_custkey long, o_orderstatus string, "
             "o_totalprice double, o_orderdate timestamp_ntz, "
             "o_orderpriority string")
_T0 = dt.datetime(1995, 3, 1)


def _write_orders(spark, tmp_path, per_cust):
    """per_cust: list of (n_orders, order_price_dollars)."""
    rows, k = [], 0
    for cust, (n, price) in enumerate(per_cust, start=1):
        for _ in range(n):
            rows.append((k, cust, "O", float(price), _T0, "3-MEDIUM"))
            k += 1
    spark.createDataFrame(rows, _O_SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(f"{tmp_path}/orders.parquet")
    return str(tmp_path)


def _midranks_doubled(vals):
    """{v: doubled average midrank} for a list of values."""
    out = {}
    for v in set(vals):
        below = sum(1 for u in vals if u < v)
        c = vals.count(v)
        out[v] = 2 * below + c + 1
    return out


def test_spearman_monotone_profiles(spark, tmp_path):
    # counts 1..5, spend strictly increasing by >1 bucket per step
    # and no two customers in the same bucket -> rho = 1 exactly
    bucket = _SPEND_BUCKET_CENTS / 100  # dollars per bucket
    up = [(n, n * 2 * bucket + 5) for n in range(1, 6)]
    sf = _write_orders(spark, tmp_path, up)
    r = customer_value_spearman(spark, sf).collect()[0]
    assert r["n"] == 5
    assert r["rho"] == 1.0
    # anti-monotone TOTALS (total spend = n_orders x price, so the
    # per-order price must fall faster than the count rises):
    # totals 5000/4000/3000/2000/1000 dollars for counts 1..5
    down = [(1, 5000), (2, 2000), (3, 1000), (4, 500), (5, 200)]
    sf = _write_orders(spark, tmp_path, down)
    r = customer_value_spearman(spark, sf).collect()[0]
    assert r["rho"] == -1.0


def test_spearman_matches_brute_midranks(spark, tmp_path):
    # tie-heavy: duplicate counts AND shared spend buckets
    bucket = _SPEND_BUCKET_CENTS / 100
    profiles = [(1, 10), (1, 10), (2, bucket + 10), (2, 3 * bucket + 10),
                (3, 3 * bucket + 10), (4, bucket + 10), (4, 9 * bucket),
                (5, 9 * bucket)]
    sf = _write_orders(spark, tmp_path, profiles)
    r = customer_value_spearman(spark, sf).collect()[0]
    xs = [n for n, _ in profiles]
    # y = bucket index of TOTAL spend (n orders x price dollars -> cents)
    ys = [(n * int(p) * 100) // _SPEND_BUCKET_CENTS for n, p in profiles]
    dx, dy = _midranks_doubled(xs), _midranks_doubled(ys)
    n = len(profiles)
    sx = sum(dx[v] for v in xs)
    sy = sum(dy[v] for v in ys)
    sxy = sum(dx[a] * dy[b] for a, b in zip(xs, ys))
    sxx = sum(dx[v] ** 2 for v in xs)
    syy = sum(dy[v] ** 2 for v in ys)
    assert (r["s_x"], r["s_y"], r["s_xy"], r["s_xx"], r["s_yy"]) == (
        sx, sy, sxy, sxx, syy)
    rho = ((n * sxy - sx * sy)
           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5)
    assert abs(r["rho"] - rho) < 1e-6


def _vals_frame(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def test_kruskal_identical_groups_near_zero(spark):
    vals = [5, 9, 14, 22, 30, 47, 60, 75]
    rows = [(g, v) for g in _PRIORITIES for v in vals]
    r = kw_fold(_vals_frame(spark, rows), _PRIORITIES).collect()[0]
    # every group has the same rank profile -> H is exactly the
    # minimum the tie structure allows (0 up to rounding)
    assert abs(r["h_tie_corrected"]) < 1e-6
    assert not r["significant"]
    assert r["n"] == 40 and all(r[f"n_{i}"] == 8 for i in range(5))


def test_kruskal_matches_hand_computation(spark):
    groups = {
        "1-URGENT": [1, 2, 3],
        "2-HIGH": [2, 4, 6],
        "3-MEDIUM": [5, 6, 7],
        "4-NOT SPECIFIED": [8, 9, 10],
        "5-LOW": [10, 11, 12],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    r = kw_fold(_vals_frame(spark, rows), _PRIORITIES).collect()[0]
    allv = [v for vs in groups.values() for v in vs]
    d = _midranks_doubled(allv)
    n = len(allv)
    rg = {g: sum(d[v] for v in vs) for g, vs in groups.items()}
    for i, g in enumerate(_PRIORITIES):
        assert r[f"r_{i}_d"] == rg[g]
    h = (3.0 / (n * (n + 1))
         * sum(rg[g] ** 2 / len(vs) for g, vs in groups.items())
         - 3.0 * (n + 1))
    ties = {}
    for v in allv:
        ties[v] = ties.get(v, 0) + 1
    t = sum(c ** 3 - c for c in ties.values())
    assert r["tie_term"] == t
    h_tc = h / (1 - t / (n ** 3 - n))
    assert abs(r["h"] - h) < 1e-5
    assert abs(r["h_tie_corrected"] - h_tc) < 1e-5


def test_kruskal_planted_shift_is_significant(spark):
    # four groups share a low block; one group sits strictly above
    base = list(range(1, 13))
    rows = ([(g, v) for g in _PRIORITIES[:4] for v in base]
            + [("5-LOW", 100 + v) for v in base])
    r = kw_fold(_vals_frame(spark, rows), _PRIORITIES).collect()[0]
    assert r["h_tie_corrected"] > _KW_CHI2_CRIT_4DOF
    assert r["significant"]


def test_spearman_degenerate_variance_yields_null(spark, tmp_path):
    # every customer identical (one order, same price): both marginal
    # variances are zero -> rho must be NULL, never NaN/Inf
    profiles = [(1, 50)] * 4
    sf = _write_orders(spark, tmp_path, profiles)
    r = customer_value_spearman(spark, sf).collect()[0]
    assert r["n"] == 4
    assert r["rho"] is None


def test_kruskal_absent_group_contributes_nothing(spark):
    # only two of the five priorities present: the absent groups'
    # terms must drop out (never NaN-poison H), and H reduces to the
    # two-sample statistic on the present groups
    rows = ([("1-URGENT", v) for v in (1, 2, 3)]
            + [("5-LOW", v) for v in (10, 11, 12)])
    r = kw_fold(_vals_frame(spark, rows), _PRIORITIES).collect()[0]
    assert r["n"] == 6
    assert r["n_1"] == r["n_2"] == r["n_3"] == 0
    import math
    assert not math.isnan(r["h"])
    # doubled rank sums: R0_d = 2+4+6 = 12, R4_d = 8+10+12 = 30;
    # H = 3/(6*7) * (12^2/3 + 30^2/3) - 3*7
    expect = 3.0 / 42 * (144 / 3 + 900 / 3) - 21.0
    assert abs(r["h"] - expect) < 1e-6


def test_kruskal_all_tied_yields_null(spark):
    # every observation identical: T = N^3 - N, the tie correction is
    # exactly 0, and H'/significant are NULL rather than NaN/Inf
    # (ADVICE r7 degenerate-input guard)
    rows = [(g, 42) for g in _PRIORITIES for _ in range(4)]
    r = kw_fold(_vals_frame(spark, rows), _PRIORITIES).collect()[0]
    n = r["n"]
    assert r["tie_term"] == n ** 3 - n
    assert r["h_tie_corrected"] is None
    assert r["significant"] is None


# ---------------------------------------------------------------------------
# Spearman over random tie-heavy profiles (randomized midrank replay)
# ---------------------------------------------------------------------------

import math

from hypothesis import HealthCheck, given, settings, strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(per_cust=st.lists(
    st.tuples(st.integers(1, 4), st.integers(1, 300)),
    min_size=1, max_size=10))
def test_spearman_matches_python_reference(spark, tmp_path_factory,
                                           per_cust):
    """Random customer profiles (duplicate counts, shared spend
    buckets, single-customer corpora): the histogram-midrank Spearman
    must reproduce the plain-Python doubled-midrank Pearson replay —
    exact integer moments and the variance-guarded quantized rho."""
    tmp = tmp_path_factory.mktemp("sp")
    sf = _write_orders(spark, tmp, [(n, float(p)) for n, p in per_cust])
    r = customer_value_spearman(spark, sf).collect()[0]
    xs = [n for n, _ in per_cust]
    ys = [(n * p * 100) // _SPEND_BUCKET_CENTS for n, p in per_cust]
    dx, dy = _midranks_doubled(xs), _midranks_doubled(ys)
    n = len(per_cust)
    sx = sum(dx[v] for v in xs)
    sy = sum(dy[v] for v in ys)
    sxy = sum(dx[a] * dy[b] for a, b in zip(xs, ys))
    sxx = sum(dx[v] ** 2 for v in xs)
    syy = sum(dy[v] ** 2 for v in ys)
    assert (r["n"], r["s_x"], r["s_y"], r["s_xy"], r["s_xx"],
            r["s_yy"]) == (n, sx, sy, sxy, sxx, syy), per_cust
    num = float(n) * float(sxy) - float(sx) * float(sy)
    var_x = float(n) * float(sxx) - float(sx) * float(sx)
    var_y = float(n) * float(syy) - float(sy) * float(sy)
    rho = (math.floor(num / math.sqrt(var_x * var_y) * 1e6 + 0.5) / 1e6
           if var_x > 0 and var_y > 0 else None)
    assert r["rho"] == rho, per_cust

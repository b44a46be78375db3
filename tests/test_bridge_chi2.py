"""Semantic unit tests for the round-7 continuation BI/stat pair:
the month-over-month revenue bridge's additive identity and
zero-delta guard (plans/warehouse.nation_revenue_bridge) and the
r x c chi-square's grid completion, hand computation, and planted
dependence (plans/experiment.events_type_arm_chi2).
"""

from __future__ import annotations

import datetime as dt
import hashlib

_O_SCHEMA = ("o_orderkey long, o_custkey long, o_orderstatus string, "
             "o_totalprice double, o_orderdate timestamp_ntz, "
             "o_orderpriority string")
_C_SCHEMA = ("c_custkey long, c_name string, c_nationkey int, "
             "c_acctbal double, c_mktsegment string")
_N_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"
_EV_SCHEMA = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def _write_star(spark, tmp_path, orders, cust_nations):
    """orders: (key, custkey, price_dollars, yyyy_mm);
    cust_nations: {custkey: nationkey}."""
    spark.createDataFrame(
        [(k, c, "O", float(p), dt.datetime(y, m, 5), "3-MEDIUM")
         for k, c, p, (y, m) in orders], _O_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(c, f"c{c}", n, 0.0, "BUILDING")
         for c, n in cust_nations.items()], _C_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/customer.parquet")
    nk = sorted(set(cust_nations.values()))
    spark.createDataFrame(
        [(n, f"N{n}", 0) for n in nk], _N_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/nation.parquet")
    return str(tmp_path)


def test_bridge_additive_identity_and_partial_month_exclusion(spark,
                                                              tmp_path):
    from data_warehouse_project_spark.plans.warehouse import (
        nation_revenue_bridge)

    # months: 1995-01 (prev), 1995-02 (cur), 1995-03 (trailing,
    # must be EXCLUDED as the partial month)
    orders = [
        (1, 1, 100, (1995, 1)), (2, 1, 300, (1995, 2)),   # N1: +200
        (3, 2, 500, (1995, 1)), (4, 2, 400, (1995, 2)),   # N2: -100
        (5, 3, 250, (1995, 2)),                           # N3: +250
        (6, 1, 9999, (1995, 3)),                          # ignored
    ]
    sf = _write_star(spark, tmp_path, orders, {1: 1, 2: 2, 3: 3})
    rows = {r["nation"]: r
            for r in nation_revenue_bridge(spark, sf).collect()}
    assert set(rows) == {"N1", "N2", "N3"}
    assert rows["N1"]["delta_cents"] == 20000
    assert rows["N2"]["delta_cents"] == -10000
    assert rows["N3"]["delta_cents"] == 25000
    total = rows["N1"]["total_delta"]
    assert total == 35000                      # additive identity
    assert abs(sum(r["share_of_change"] for r in rows.values())
               - 1.0) < 1e-6
    # ordering: biggest positive mover first
    ordered = [r["nation"] for r in
               nation_revenue_bridge(spark, sf).collect()]
    assert ordered == ["N3", "N1", "N2"]


def test_bridge_zero_total_delta_guard(spark, tmp_path):
    from data_warehouse_project_spark.plans.warehouse import (
        nation_revenue_bridge)

    orders = [
        (1, 1, 100, (1995, 1)), (2, 1, 200, (1995, 2)),   # +100
        (3, 2, 200, (1995, 1)), (4, 2, 100, (1995, 2)),   # -100
        (5, 1, 1, (1995, 3)),                             # partial
    ]
    sf = _write_star(spark, tmp_path, orders, {1: 1, 2: 2})
    rows = nation_revenue_bridge(spark, sf).collect()
    assert all(r["total_delta"] == 0 for r in rows)
    assert all(r["share_of_change"] is None for r in rows)


def _arm_of(user_id: int) -> str:
    from data_warehouse_project_spark.plans.experiment import (
        _A_NIBBLES, _SALT)
    h = hashlib.sha256(f"{_SALT}{user_id}".encode()).hexdigest()
    return "A" if h[-1] in _A_NIBBLES else "B"


def _write_events(spark, tmp_path, rows):
    """rows: (user_id, event_type)."""
    t0 = dt.datetime(2024, 1, 5)
    spark.createDataFrame(
        [(i, t0, u, et, 1.0, "{}") for i, (u, et) in enumerate(rows)],
        _EV_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_chi2_hand_computation_with_zero_cell(spark, tmp_path):
    from data_warehouse_project_spark.plans.experiment import (
        events_type_arm_chi2)

    a = [u for u in range(1, 400) if _arm_of(u) == "A"]
    b = [u for u in range(1, 400) if _arm_of(u) == "B"]
    # clicks: 6 from A, 2 from B; views: 0 from A (ZERO CELL), 4
    # from B — the completed grid must carry the (view, A) cell
    rows = ([(u, "click") for u in a[:6]] + [(u, "click") for u in b[:2]]
            + [(u, "view") for u in b[2:6]])
    sf = _write_events(spark, tmp_path, rows)
    r = events_type_arm_chi2(spark, sf).collect()[0]
    assert r["n"] == 12
    assert r["n_cells"] == 4          # 2 types x 2 arms, zero included
    # dof from OBSERVED marginals (ADVICE r7): (2-1)*(2-1) = 1, and
    # significance tests against the 1-dof critical value 3.841 —
    # the hand chi2 below is 6.0, significant at 1 dof (it was being
    # wrongly tested against the 4-dof 9.488 before)
    assert r["dof"] == 1
    assert r["significant"] is True
    # hand chi-square: O = [[6,2],[0,4]], rt = [8,4], ct = [6,6]
    import math
    chi2 = 0.0
    for o, rt, ct in [(6, 8, 6), (2, 8, 6), (0, 4, 6), (4, 4, 6)]:
        e = rt * ct / 12.0
        chi2 += math.floor((o - e) ** 2 / e * 1e9 + 0.5) / 1e9
    assert abs(r["chi2"] - chi2) < 1e-6


def test_chi2_planted_dependence_is_significant(spark, tmp_path):
    from data_warehouse_project_spark.plans.experiment import (
        events_type_arm_chi2)

    a = [u for u in range(1, 2000) if _arm_of(u) == "A"][:60]
    b = [u for u in range(1, 2000) if _arm_of(u) == "B"][:60]
    # perfect dependence: A users only click, B users only purchase
    rows = ([(u, "click") for u in a] + [(u, "purchase") for u in b])
    sf = _write_events(spark, tmp_path, rows)
    r = events_type_arm_chi2(spark, sf).collect()[0]
    assert r["chi2"] > 100            # ~N for perfect dependence
    assert r["significant"]


from hypothesis import HealthCheck, given, settings, strategies as st

_chi2_rows = st.lists(
    st.tuples(st.integers(0, 19),             # index into a user pool
              st.integers(0, 3)),             # event-type index
    min_size=1, max_size=40)

_chi2_counter = [0]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_chi2_rows)
def test_chi2_matches_python_model_on_random_grids(spark, tmp_path, rows):
    # property version of the hand test: dof from OBSERVED marginals
    # (new in round 8), completed grid including zero cells, nano-unit
    # term quantization, and the per-dof significance gate — all vs a
    # plain-Python model over arbitrary small contingency shapes
    import math

    from data_warehouse_project_spark.plans.experiment import (
        _CHI2_CRIT, events_type_arm_chi2)

    pool = list(range(1, 400))[:20]
    types = ["view", "click", "purchase", "signup"]
    data = [(pool[u], types[t]) for u, t in rows]
    _chi2_counter[0] += 1
    sf = _write_events(spark, tmp_path / f"ex{_chi2_counter[0]}", data)
    r = events_type_arm_chi2(spark, sf).collect()[0]

    cells: dict = {}
    for u, t in data:
        cells[(t, _arm_of(u))] = cells.get((t, _arm_of(u)), 0) + 1
    tset = sorted({t for t, _ in cells})
    aset = sorted({a for _, a in cells})
    n = len(data)
    rt = {t: sum(c for (tt, _), c in cells.items() if tt == t)
          for t in tset}
    ct = {a: sum(c for (_, aa), c in cells.items() if aa == a)
          for a in aset}
    chi2q = 0
    for t in tset:
        for a in aset:
            o = cells.get((t, a), 0)
            e = rt[t] * ct[a] / n
            chi2q += math.floor((o - e) ** 2 / e * 1e9 + 0.5)
    dof = (len(tset) - 1) * (len(aset) - 1)
    assert r["n"] == n
    assert r["n_cells"] == len(tset) * len(aset)
    assert r["dof"] == dof
    assert r["chi2_scaled"] == chi2q
    if dof in _CHI2_CRIT:
        assert r["significant"] == (chi2q / 1e9 > _CHI2_CRIT[dof])
    else:                                      # dof == 0: one row/col
        assert r["significant"] is None

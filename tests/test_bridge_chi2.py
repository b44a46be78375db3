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

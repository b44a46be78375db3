"""Semantic unit tests for the deterministic-seed Laplace release
(plans/audits.py orders_priority_dp_release): the noise must equal an
independent Python computation of the same inverse-CDF draw, be
corpus-independent, and shift the true counts by exactly itself.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from tests.helpers import fround_half_up

from data_warehouse_project_spark.plans.audits import (
    _DP_EPSILON, _DP_HEX, _DP_SALT, _DP_SCALE, orders_priority_dp_release)

_O_SCHEMA = ("o_orderkey long, o_custkey long, o_orderstatus string, "
             "o_totalprice double, o_orderdate timestamp_ntz, "
             "o_orderpriority string")


def _py_noise(g: str) -> float:
    h = hashlib.sha256(f"{_DP_SALT}{g}".encode()).hexdigest()
    u = (int(h[:_DP_HEX], 16) + 0.5) / 2.0 ** (4 * _DP_HEX)
    return (-_DP_SCALE * math.copysign(1.0, u - 0.5)
            * math.log(1.0 - 2.0 * abs(u - 0.5)))


def _fr6(x: float) -> float:
    return fround_half_up(x, 6)


def test_dp_noise_matches_python_reference(spark, tmp_path):
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"]
    counts = {g: 3 + i * 2 for i, g in enumerate(prios)}
    rows, k = [], 0
    for g, n in counts.items():
        for _ in range(n):
            rows.append((k, 1, "O", 10.0, dt.datetime(1995, 1, 1), g))
            k += 1
    spark.createDataFrame(rows, _O_SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = {r["priority"]: r
           for r in orders_priority_dp_release(
               spark, str(tmp_path)).collect()}
    assert set(out) == set(prios)
    for g in prios:
        r = out[g]
        assert r["epsilon"] == _DP_EPSILON
        assert r["scale"] == _DP_SCALE
        assert r["noise"] == _fr6(_py_noise(g))
        assert r["noisy_count"] == _fr6(counts[g] + _py_noise(g))
        # the release never echoes the raw count
        assert "n_true" not in r.asDict()

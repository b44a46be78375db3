"""CDC / join-diagnostics semantics: the changelog extractor vs a
pure-Python snapshot-diff reference model, and invariant checks on
the skew report and the new-vs-returning split (their DuckDB parity
runs in test_registry_parity; these pin the SEMANTICS independently
of the oracle SQL sharing a formula bug)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from data_warehouse_project_spark.plans.cdc import (
    _CDC_DEL_MOD, _CDC_INS_MOD, _CDC_UPD_MOD,
    cdc_changelog, customer_new_vs_returning, join_skew_report)
from data_warehouse_project_spark.sources.catalog import Catalog


def _python_changelog(rows):
    """Reference model: dict-based snapshot diff over (key, status,
    price_cents) order tuples."""
    old = {k: (s, c) for k, s, c in rows}
    new = {}
    for k, s, c in rows:
        if k % _CDC_DEL_MOD == 0:
            continue
        if k % _CDC_UPD_MOD == 0:
            new[k] = ("F", c + 1000)
        else:
            new[k] = (s, c)
    max_key = max(k for k, _, _ in rows)
    for k, s, c in rows:
        if k % _CDC_INS_MOD == 0:
            new[k + max_key] = ("O", c)
    log = {}
    for k in old.keys() | new.keys():
        if k not in new:
            log[k] = ("D", old[k], (None, None))
        elif k not in old:
            log[k] = ("I", (None, None), new[k])
        elif old[k] != new[k]:
            log[k] = ("U", old[k], new[k])
    return log


def test_cdc_changelog_matches_python_model(spark, sf_dir):
    rows = [
        (r.o_orderkey, r.o_orderstatus,
         int(r.o_totalprice * 100 + 0.5))
        for r in Catalog(spark, sf_dir).orders
        .select("o_orderkey", "o_orderstatus", "o_totalprice").collect()
    ]
    expected = _python_changelog(rows)
    got = {
        r.o_orderkey: (r.op, (r.old_status, r.old_price_cents),
                       (r.new_status, r.new_price_cents))
        for r in cdc_changelog(spark, sf_dir).collect()
    }
    assert got == expected
    # the simulation exercises all three ops on the test scale
    ops = Counter(op for op, _, _ in expected.values())
    assert set(ops) == {"I", "U", "D"}


def test_cdc_changelog_drops_unchanged_rows(spark, sf_dir):
    out = cdc_changelog(spark, sf_dir)
    k = F.col("o_orderkey")
    # every U row genuinely differs
    assert out.filter(
        (F.col("op") == "U")
        & (F.col("old_status") == F.col("new_status"))
        & (F.col("old_price_cents") == F.col("new_price_cents"))
    ).count() == 0
    # D keys are exactly the delete mod class (minus re-inserts,
    # which have offset keys, so no overlap)
    assert out.filter((F.col("op") == "D")
                      & (k % _CDC_DEL_MOD != 0)).count() == 0
    # I keys all sit past the original key space (max-key shift)
    max_key = Catalog(spark, sf_dir).orders.agg(
        F.max("o_orderkey")).collect()[0][0]
    assert out.filter((F.col("op") == "I")
                      & (k <= max_key)).count() == 0


def test_join_skew_report_invariants(spark, sf_dir):
    out = {r.edge: r for r in join_skew_report(spark, sf_dir).collect()}
    assert len(out) == 5
    cat = Catalog(spark, sf_dir)
    # one edge recomputed from scratch: orders.o_custkey
    freqs = Counter(
        r.o_custkey for r in cat.orders.select("o_custkey").collect()
        if r.o_custkey is not None)
    row = out["orders.o_custkey"]
    assert row.n_rows == sum(freqs.values())
    assert row.n_keys == len(freqs)
    assert row.max_freq == max(freqs.values())
    assert row.top_key == min(
        k for k, v in freqs.items() if v == row.max_freq)
    for r in out.values():
        # mean frequency and skew ratio are consistent with counts
        assert r.skew_ratio >= 1.0
        assert abs(r.avg_freq - r.n_rows / r.n_keys) < 1e-5
        assert r.max_freq <= r.n_rows


def test_new_vs_returning_accounts_every_customer_once(spark, sf_dir):
    out = customer_new_vs_returning(spark, sf_dir).collect()
    cat = Catalog(spark, sf_dir)
    n_cust = cat.orders.select("o_custkey").distinct().count()
    n_orders = cat.orders.count()
    # each customer is "new" in exactly one month — their first — so
    # new-order totals sum to orders placed in first months, and the
    # number of months flagged new per customer is 1
    assert sum(r.n_orders for r in out) == n_orders
    assert sum(r.n_new for r in out) >= n_cust  # ≥: multi-order 1st months
    assert all(r.n_returning == r.n_orders - r.n_new for r in out)
    # the globally first month has no returning customers
    first = min(out, key=lambda r: r.month)
    assert first.n_returning == 0
    # spot-check one multi-month customer: only the first month is new
    cm = (cat.orders.groupBy("o_custkey")
          .agg(F.countDistinct(F.date_trunc("month", "o_orderdate"))
               .alias("m"))
          .filter(F.col("m") >= 2).limit(1).collect())
    assert cm, "test data should contain a multi-month customer"


# ---------------------------------------------------------------------------
# New-vs-returning vs a sequential first-month replay
# ---------------------------------------------------------------------------

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings, strategies as st

_O_SCHEMA = ("o_orderkey long, o_custkey long, o_orderstatus string, "
             "o_totalprice double, o_orderdate timestamp_ntz, "
             "o_orderpriority string")


def _nvr_reference(orders):
    """Sequential replay: per customer the first active month; per
    month the order count, first-month order count, returning rest,
    and the quantized new-order share."""
    first = {}
    for u, m in orders:
        first[u] = min(first.get(u, m), m)
    out = {}
    for u, m in orders:
        n, new = out.get(m, (0, 0))
        out[m] = (n + 1, new + (1 if m == first[u] else 0))
    return {m: (n, new, n - new, math.floor(new / n * 1e6 + 0.5) / 1e6)
            for m, (n, new) in out.items()}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(orders=st.lists(st.tuples(st.integers(1, 4), st.integers(1, 4)),
                       min_size=1, max_size=25))
def test_new_vs_returning_matches_python_reference(
        spark, tmp_path_factory, orders):
    """Random (customer, month) order streams — customers acquired in
    every month, single-month customers, all-new and all-returning
    months: the windowed first-month split must match the sequential
    replay in every column."""
    tmp = tmp_path_factory.mktemp("nvr")
    spark.createDataFrame(
        [(i, u, "O", 100.0, dt.datetime(2024, m, 5), "3-MEDIUM")
         for i, (u, m) in enumerate(orders)], _O_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/orders.parquet")
    got = {r["month"].month: (r["n_orders"], r["n_new"],
                              r["n_returning"], r["new_share"])
           for r in customer_new_vs_returning(spark, str(tmp)).collect()}
    assert got == _nvr_reference(orders), orders


def _cohort_reference(orders):
    """Sequential cohort-LTV replay: per customer the first-order
    month, per (cohort_month, months_since) cell distinct actives,
    order count, and the dsum-quantized revenue (guard = 4 ppm-like
    scaling, half-up to 2dp)."""
    first = {}
    for u, m, _ in orders:
        first[u] = min(first.get(u, m), m)
    cells = {}
    for u, m, cents in orders:
        key = (first[u], m - first[u])
        users, n, tot = cells.get(key, (set(), 0, 0))
        users = users | {u}
        # dsum guard scaling: price dollars -> floor(x*1e4 + .5)
        tot += math.floor(cents / 100.0 * 1e4 + 0.5)
        cells[key] = (users, n + 1, tot)
    return {k: (len(us), n, math.floor((t + 50) / 100.0) / 100.0)
            for k, (us, n, t) in cells.items()}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(orders=st.lists(st.tuples(st.integers(1, 4), st.integers(1, 5),
                                 st.integers(0, 10 ** 6)),
                       min_size=1, max_size=25))
def test_cohort_revenue_matches_python_reference(
        spark, tmp_path_factory, orders):
    """Random (customer, month, price-cents) orders: the cohort-LTV
    matrix must match the sequential replay — first-month cohorting,
    distinct active counts, and the order-independent dsum revenue."""
    from data_warehouse_project_spark.plans.warehouse import (
        customer_cohort_revenue)
    tmp = tmp_path_factory.mktemp("coh")
    spark.createDataFrame(
        [(i, u, "O", c / 100.0, dt.datetime(2024, m, 5), "3-MEDIUM")
         for i, (u, m, c) in enumerate(orders)], _O_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/orders.parquet")
    got = {(r["cohort_month"].month, r["months_since"]):
           (r["n_active_customers"], r["n_orders"], r["revenue"])
           for r in customer_cohort_revenue(spark, str(tmp)).collect()}
    assert got == _cohort_reference(orders), orders

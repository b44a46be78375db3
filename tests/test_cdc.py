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

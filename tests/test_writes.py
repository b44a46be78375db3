"""Write-path tests: surrogate keys (lastrowid semantics), append
sinks, soft delete / status flip conditional updates, the
record_payment insert+update pair, and swap-based overwrite."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_warehouse_project_spark import schemas, writes


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def regs(spark):
    return spark.createDataFrame([
        (1, 1, 10, "Pending"),
        (2, 1, 11, "Pending"),
    ], schema=schemas.REGISTRATIONS)


def test_surrogate_keys_continue_from_max(spark, regs):
    new = spark.createDataFrame(
        [(1, 12, "Pending"), (2, 12, "Pending")],
        "user_id long, event_id long, payment_status string")
    keyed = writes.with_surrogate_keys(
        new, "registration_id", existing=regs,
        order_by=["user_id", "event_id"])
    ids = sorted(r["registration_id"] for r in keyed.collect())
    assert ids == [3, 4]          # gap-free continuation of max=2


def test_surrogate_keys_deterministic_order(spark):
    new = spark.createDataFrame(
        [("b",), ("a",), ("c",)], "name string")
    keyed = {r["name"]: r["id"] for r in writes.with_surrogate_keys(
        new, "id", order_by=["name"]).collect()}
    assert keyed == {"a": 1, "b": 2, "c": 3}


def test_soft_delete_and_flip(spark, regs):
    ev = spark.createDataFrame(
        [(10, 1), (11, 1)], "event_id long, is_active int")
    out = {r["event_id"]: r["is_active"]
           for r in writes.soft_delete(ev, "event_id", 10).collect()}
    assert out == {10: 0, 11: 1}

    flipped = {r["registration_id"]: r["payment_status"]
               for r in writes.flip_status(regs, 2).collect()}
    assert flipped == {1: "Pending", 2: "Success"}


def test_record_payment_pair(spark, regs):
    payments = spark.createDataFrame(
        [(1, 1, 1, None, 5.0, "OneTime", "Success",
          ts("2026-08-01T00:00:00"))], schema=schemas.PAYMENTS)
    new_payment = spark.createDataFrame(
        [(1, 2, None, 25.0, "OneTime", "Success",
          ts("2026-08-02T00:00:00"))],
        "user_id long, registration_id long, card_id long, amount double,"
        "payment_type string, payment_status string, payment_date timestamp_ntz")
    new_pay, new_regs = writes.record_payment(payments, regs, new_payment)
    pay_ids = sorted(r["payment_id"] for r in new_pay.collect())
    assert pay_ids == [1, 2]                        # lastrowid continuation
    regs_out = {r["registration_id"]: r["payment_status"]
                for r in new_regs.collect()}
    assert regs_out == {1: "Pending", 2: "Success"}  # only reg 2 flipped


def test_derive_registration_status(spark, regs):
    payments = spark.createDataFrame([
        (1, 1, 1, None, 5.0, "OneTime", "Failed", ts("2026-08-01T00:00:00")),
        (2, 1, 1, None, 5.0, "OneTime", "Success", ts("2026-08-02T00:00:00")),
    ], schema=schemas.PAYMENTS)
    derived = {r["registration_id"]: r["payment_status"]
               for r in writes.derive_registration_status(regs, payments)
               .collect()}
    assert derived == {1: "Success", 2: "Pending"}   # latest payment / default


def test_append_and_overwrite_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    writes.append_rows(df1, path)
    writes.append_rows(spark.createDataFrame([(2, "b")], "id long, v string"),
                       path)
    assert spark.read.parquet(path).count() == 2

    updated = writes.conditional_update(
        spark.read.parquet(path), F.col("id") == 2, {"v": F.lit("B")})
    writes.overwrite_table(spark, updated, path)
    out = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert out == {1: "a", 2: "B"}

"""Write-path semantics — the reference's INSERT / UPDATE / lastrowid
behaviors (S7-S15, SURVEY.md §2.1) on immutable parquet storage.

Reference behaviors reproduced:
- append sinks (INSERT INTO users/events/registrations/saved_cards/
  payments — ref db.py:207-211, 255-261, 340-343, 441-444, 454-457)
  → `append_rows`;
- AUTO_INCREMENT + cursor.lastrowid (ref db.py:213,345,466)
  → `with_surrogate_keys`: max(existing)+row_number, deterministic
  and gap-free per batch (monotonically_increasing_id is neither);
- UPDATE ... SET is_active=0 soft delete (ref db.py:327)
  → `soft_delete` conditional overwrite;
- UPDATE registrations SET payment_status='Success' (ref db.py:459-463)
  → `flip_status`;
- record_payment's insert+update pair (ref db.py:450-468)
  → `record_payment`: batch-level semantics; the two writes are not
  atomic on plain parquet (the reference's MySQL txn isn't either —
  it commits once at db.py:467); a Delta/Iceberg deployment would
  wrap them in one transaction.

Storage layout: staging-directory overwrite (write new data next to
the old, then swap) so a reader never sees a half-written table.
At cluster scale the same functions target partitioned table roots
and the conditional overwrite rewrites only affected partitions
(dynamic partition overwrite).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F


def append_rows(df: DataFrame, path: str) -> None:
    """INSERT-sink: append a batch to a parquet table (S7-S11)."""
    df.write.mode("append").parquet(path)


def with_surrogate_keys(
    new_rows: DataFrame,
    key_col: str,
    existing: DataFrame | None = None,
    order_by: list[str] | None = None,
) -> DataFrame:
    """AUTO_INCREMENT semantics (S15): assign max(existing)+1..n ids.

    ``order_by`` fixes the assignment order (deterministic across
    runs/partitionings); defaults to all columns of the batch.
    Single-window global numbering is fine for OLTP-sized batches;
    a bulk-load path would zipWithIndex per partition instead.
    """
    if existing is not None and key_col in existing.columns:
        base_row = existing.agg(F.max(key_col).alias("m")).collect()[0]
        base = base_row["m"] if base_row["m"] is not None else 0
    else:
        base = 0
    order_cols = order_by or [c for c in new_rows.columns]
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return new_rows.withColumn(
        key_col, (F.lit(base) + F.row_number().over(w)).cast("long"))


def conditional_update(
    df: DataFrame, condition: Column, assignments: dict[str, Column]
) -> DataFrame:
    """UPDATE ... SET col=expr WHERE cond, as an immutable transform."""
    out = df
    for col_name, value in assignments.items():
        out = out.withColumn(
            col_name,
            F.when(condition, value).otherwise(F.col(col_name)),
        )
    return out


def soft_delete(df: DataFrame, key_col: str, key) -> DataFrame:
    """S12 (ref db.py:327): is_active=0 for the matching key."""
    return conditional_update(
        df, F.col(key_col) == F.lit(key), {"is_active": F.lit(0)})


def flip_status(df: DataFrame, registration_id) -> DataFrame:
    """S13 (ref db.py:459-463): payment_status → 'Success'."""
    return conditional_update(
        df, F.col("registration_id") == F.lit(registration_id),
        {"payment_status": F.lit("Success")})


def record_payment(
    payments: DataFrame,
    registrations: DataFrame,
    payment_row: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """S14 (ref db.py:450-468): insert payment + flip its
    registration to Success, returning both new table states.

    The payment gets its surrogate key here (lastrowid analog)."""
    keyed = with_surrogate_keys(
        payment_row, "payment_id", existing=payments,
        order_by=["registration_id", "payment_date"])
    new_payments = payments.unionByName(keyed)
    reg_ids = [r["registration_id"] for r in
               keyed.select("registration_id").collect()]
    new_regs = conditional_update(
        registrations,
        F.col("registration_id").isin(reg_ids),
        {"payment_status": F.lit("Success")},
    )
    return new_payments, new_regs


def derive_registration_status(
    registrations: DataFrame, payments: DataFrame
) -> DataFrame:
    """Batch recompute alternative to S13 (SURVEY.md §2.1 S13 note):
    derive payment_status from the latest successful payment instead
    of mutating rows — the warehouse-native formulation."""
    latest = (
        payments.groupBy("registration_id")
        .agg(F.expr("max_by(payment_status, payment_id)").alias("derived_status"))
    )
    return (
        registrations.drop("payment_status")
        .join(latest, "registration_id", "left")
        .withColumn("payment_status",
                    F.coalesce(F.col("derived_status"), F.lit("Pending")))
        .drop("derived_status")
    )


def overwrite_table(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Swap-based overwrite: write to a staging dir, then atomically
    replace the table dir (readers never observe a partial table —
    needed because Spark cannot overwrite a path it is reading)."""
    staging = f"{path}.staging-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    backup = f"{path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, backup)
    os.rename(staging, path)
    if os.path.exists(backup):
        shutil.rmtree(backup)


# --------------------------------------------------------------------------
# Physical layout for scale: date-partitioned facts + bucketed joins
# (SURVEY.md §4 "physical layout for 100 TB orientation")
# --------------------------------------------------------------------------

def write_date_partitioned(df: DataFrame, path: str, ts_col: str,
                           granularity: str = "month") -> None:
    """Write a fact date-partitioned (the 100 TB fact layout): readers
    filtering on the partition column scan only matching directories
    (dynamic partition pruning composes with join filters)."""
    part_col = f"{ts_col}_{granularity}"
    (
        df.withColumn(part_col,
                      F.date_format(F.date_trunc(granularity, F.col(ts_col)),
                                    "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(path)
    )


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 16, sort_col: str | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) on its join
    key. Two tables bucketed identically join WITHOUT any exchange —
    the co-located join that turns the biggest fact-fact shuffle at
    100 TB into a map-side merge."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)

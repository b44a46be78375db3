"""Write-path post-state queries — driver-visible evidence for the
mutation semantics S12-S15 (SURVEY.md §2.1), following the
crypto_roundtrip pattern: each registered query APPLIES a write-path
primitive inside the query (round-tripping through real parquet
storage where the primitive is a storage op) and returns a
value-checked post-state the DuckDB oracle reproduces from the same
inputs. Until round 3 these primitives had only local unit-test
evidence (VERDICT r2 "What's missing" #3).

Reference behaviors exercised:
- soft delete (UPDATE ... SET is_active=0, ref db.py:327)
  → `soft_delete_post_state`: conditional overwrite + staged-swap
    storage round-trip, post-state aggregated per segment;
- record_payment insert + status flip (ref db.py:450-468)
  → `record_payment_post_state`: the single-write atomic form
    (payments append is the ONLY write; registration status derives
    from stored payments), surrogate keys included;
- AUTO_INCREMENT bulk assignment (ref db.py:213,345,466 lastrowid)
  → `surrogate_keys_bulk_post_state`: the no-global-window bulk path,
    checked value-exactly against ROW_NUMBER over the total order.

Temp storage: queries that round-trip through parquet write under a
fresh tempfile dir per call (a few KB at test scale); the returned
DataFrame keeps reading from it lazily, so the dir is left for the
OS tmp reaper rather than deleted eagerly.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..sources.catalog import Catalog
from ..writes import (derive_registration_status, overwrite_table,
                      record_payment_atomic, soft_delete,
                      with_surrogate_keys_bulk)

#: keys soft-deleted by the post-state query (exist at every sf:
#: custkeys start at 0 and sf0.001 already has 150)
SOFT_DELETE_KEYS = (7, 42, 101)


def soft_delete_post_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 driver query: treat customers as the soft-deletable table
    (is_active flag), apply `soft_delete` for SOFT_DELETE_KEYS, write
    the mutated table through the staged-swap overwrite, read it back,
    and report per-segment visibility — the post-state a portal's
    "my saved cards" listing would observe (ref db.py:327,334-339)."""
    cat = Catalog(spark, sf_dir)
    cards = (cat.customer.select("c_custkey", "c_mktsegment")
             .withColumn("is_active", F.lit(1)))
    for k in SOFT_DELETE_KEYS:
        cards = soft_delete(cards, "c_custkey", k)
    path = tempfile.mkdtemp(prefix="dwps-poststate-") + "/cards"
    overwrite_table(spark, cards, path)
    after = spark.read.parquet(path)
    return (
        after.groupBy("c_mktsegment")
        .agg(F.count("*").cast("long").alias("n_customers"),
             F.sum("is_active").cast("long").alias("n_active"),
             F.min(F.when(F.col("is_active") == 0, F.col("c_custkey")))
             .cast("long").alias("first_deleted_key"))
    )


SOFT_DELETE_POST_STATE_SQL = f"""
WITH cards AS (
    SELECT c_custkey, c_mktsegment,
           CASE WHEN c_custkey IN {SOFT_DELETE_KEYS} THEN 0 ELSE 1 END
               AS is_active
    FROM customer
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(is_active) AS BIGINT) AS n_active,
       CAST(MIN(CASE WHEN is_active = 0 THEN c_custkey END) AS BIGINT)
           AS first_deleted_key
FROM cards GROUP BY c_mktsegment
"""


def record_payment_post_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13-S15 driver query: map orders onto the reference's
    registrations/payments pair ('F' orders are already paid), build a
    deterministic batch of new payments for unpaid orders, run
    `record_payment_atomic` (surrogate keys + single append), persist
    the payments table through the staged-swap overwrite, and report
    each NEW payment with the registration status DERIVED from stored
    payments — 'Success' flips included (ref db.py:450-468)."""
    cat = Catalog(spark, sf_dir)
    orders = cat.orders
    regs = orders.select(
        F.col("o_orderkey").alias("registration_id"),
        F.col("o_custkey").alias("user_id"),
        F.when(F.col("o_orderstatus") == "F", F.lit("Success"))
        .otherwise(F.lit("Pending")).alias("payment_status"))
    pays = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("payment_id"),
                F.col("o_orderkey").alias("registration_id"),
                F.col("o_totalprice").alias("amount"),
                F.col("o_orderdate").alias("payment_date"),
                F.lit("Success").alias("payment_status")))
    batch = (
        orders.filter((F.col("o_orderstatus") != "F")
                      & (F.col("o_orderkey") % 50 == 1))
        .select(F.col("o_orderkey").alias("registration_id"),
                F.col("o_totalprice").alias("amount"),
                F.col("o_orderdate").alias("payment_date"),
                F.lit("Success").alias("payment_status")))

    new_pays, _ = record_payment_atomic(pays, regs, batch)
    path = tempfile.mkdtemp(prefix="dwps-poststate-") + "/payments"
    overwrite_table(spark, new_pays, path)
    stored = spark.read.parquet(path)

    regs_after = derive_registration_status(regs, stored).select(
        "registration_id", F.col("payment_status").alias("reg_status_after"))
    base = pays.agg(F.max("payment_id").alias("__base"))
    return (
        stored.join(F.broadcast(base))
        .filter(F.col("payment_id") > F.col("__base"))
        .join(regs_after, "registration_id")
        .select("payment_id", "registration_id", "amount",
                "reg_status_after")
    )


RECORD_PAYMENT_POST_STATE_SQL = """
WITH pays AS (
    SELECT o_orderkey AS payment_id, o_orderkey AS registration_id,
           o_totalprice AS amount, o_orderdate AS payment_date,
           'Success' AS payment_status
    FROM orders WHERE o_orderstatus = 'F'
),
batch AS (
    SELECT o_orderkey AS registration_id, o_totalprice AS amount,
           o_orderdate AS payment_date, 'Success' AS payment_status
    FROM orders WHERE o_orderstatus <> 'F' AND o_orderkey % 50 = 1
),
keyed AS (
    SELECT registration_id, amount, payment_date, payment_status,
           (SELECT MAX(payment_id) FROM pays)
           + ROW_NUMBER() OVER (ORDER BY registration_id, payment_date)
               AS payment_id
    FROM batch
),
all_pays AS (
    SELECT payment_id, registration_id, payment_status FROM pays
    UNION ALL
    SELECT payment_id, registration_id, payment_status FROM keyed
),
derived AS (
    SELECT registration_id,
           arg_max(payment_status, payment_id) AS reg_status_after
    FROM all_pays GROUP BY registration_id
)
SELECT CAST(k.payment_id AS BIGINT) AS payment_id, k.registration_id,
       k.amount, d.reg_status_after
FROM keyed k JOIN derived d ON d.registration_id = k.registration_id
"""


def surrogate_keys_bulk_post_state(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """S15 driver query: assign gap-free bulk surrogate keys to the
    part table ordered by (p_name, p_partkey) with the
    no-global-window path (range repartition + per-partition offsets,
    localCheckpoint-pinned layout). The oracle is the global
    ROW_NUMBER over the same total order — a value-exact check that
    the distributed assignment equals the sequential one regardless
    of input layout."""
    cat = Catalog(spark, sf_dir)
    rows = cat.part.select("p_partkey", "p_name")
    keyed = with_surrogate_keys_bulk(rows, "load_id",
                                     order_by=["p_name", "p_partkey"])
    return keyed.select("p_partkey", "load_id")


SURROGATE_KEYS_BULK_SQL = """
SELECT p_partkey,
       CAST(ROW_NUMBER() OVER (ORDER BY p_name, p_partkey) AS BIGINT)
           AS load_id
FROM part
"""


register("soft_delete_post_state", soft_delete_post_state,
         SOFT_DELETE_POST_STATE_SQL)
register("record_payment_post_state", record_payment_post_state,
         RECORD_PAYMENT_POST_STATE_SQL)
register("surrogate_keys_bulk_post_state", surrogate_keys_bulk_post_state,
         SURROGATE_KEYS_BULK_SQL)

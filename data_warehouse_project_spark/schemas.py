"""Explicit StructType schemas for every table the engine reads.

Two schema families:

1. Driver star-schema tables (TPC-H-ish) + stream/LLM tables, matching
   the parquet files under /root/testdata/sf*/ (FIXTURES.md §A). Schemas
   are declared explicitly — production paths never rely on inference.

2. The reference app's *effective* domain schema (FIXTURES.md §B),
   reconstructed from its DML (reference db.py:208-210, 257, 341-342,
   455-457, 428 — the DDL at db.py:109-156 is stale; SURVEY.md §1.2).
   Used by the warehouse layer's unit tests for reference-specific
   semantics (soft delete, latest-payment-status, card encryption).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# --------------------------------------------------------------------------
# Driver star schema (parquet-verified; FIXTURES.md §A)
# --------------------------------------------------------------------------

REGION = StructType([
    StructField("r_regionkey", IntegerType()),
    StructField("r_name", StringType()),
])

NATION = StructType([
    StructField("n_nationkey", IntegerType()),
    StructField("n_name", StringType()),
    StructField("n_regionkey", IntegerType()),
])

CUSTOMER = StructType([
    StructField("c_custkey", LongType()),
    StructField("c_name", StringType()),
    StructField("c_nationkey", IntegerType()),
    StructField("c_acctbal", DoubleType()),
    StructField("c_mktsegment", StringType()),
])

SUPPLIER = StructType([
    StructField("s_suppkey", LongType()),
    StructField("s_name", StringType()),
    StructField("s_nationkey", IntegerType()),
    StructField("s_acctbal", DoubleType()),
])

PART = StructType([
    StructField("p_partkey", LongType()),
    StructField("p_name", StringType()),
    StructField("p_brand", StringType()),
    StructField("p_type", StringType()),
    StructField("p_size", IntegerType()),
    StructField("p_retailprice", DoubleType()),
])

ORDERS = StructType([
    StructField("o_orderkey", LongType()),
    StructField("o_custkey", LongType()),
    StructField("o_orderstatus", StringType()),
    StructField("o_totalprice", DoubleType()),
    StructField("o_orderdate", TimestampNTZType()),
    StructField("o_orderpriority", StringType()),
])

LINEITEM = StructType([
    StructField("l_orderkey", LongType()),
    StructField("l_partkey", LongType()),
    StructField("l_suppkey", LongType()),
    StructField("l_linenumber", IntegerType()),
    StructField("l_quantity", DoubleType()),
    StructField("l_extendedprice", DoubleType()),
    StructField("l_discount", DoubleType()),
    StructField("l_tax", DoubleType()),
    StructField("l_returnflag", StringType()),
    StructField("l_linestatus", StringType()),
    StructField("l_shipdate", TimestampNTZType()),
])

#: events.ts physical encoding has varied across driver testdata
#: regenerations (TIMESTAMP(NANOS) through round 4, TIMESTAMP(MICROS)
#: since); the catalog sniffs the on-disk type and normalizes to
#: TimestampNTZType — this is the post-load logical schema the rest
#: of the engine sees regardless of encoding.
EVENTS = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampNTZType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

DOCUMENTS = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])

EMBEDDINGS = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
    StructField("label", IntegerType()),
])

#: All driver tables, by name — the catalog iterates this.
STAR_TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# Reference effective domain schema (FIXTURES.md §B; SURVEY.md §1.2)
# --------------------------------------------------------------------------

USERS = StructType([
    StructField("user_id", LongType()),            # ref db.py:224
    StructField("first_name", StringType()),       # ref db.py:208
    StructField("last_name", StringType()),
    StructField("phone", StringType()),
    StructField("email", StringType()),
    StructField("password_hash", StringType()),    # sha2-256 hex, ref db.py:62-63
    StructField("user_role", StringType()),        # 'user' | 'admin', ref db.py:225
])

APP_EVENTS = StructType([                          # the portal's events dim
    StructField("event_id", LongType()),           # ref db.py:272
    StructField("event_name", StringType()),
    StructField("event_description", StringType()),
    StructField("event_date", TimestampNTZType()),
    StructField("event_time", IntegerType()),      # secs-since-midnight; MySQL
                                                   # TIME → timedelta, ref app.py:224-228
    StructField("location", StringType()),
    StructField("event_type", StringType()),
    StructField("organizer_id", LongType()),
    StructField("price", DoubleType()),            # DECIMAL(8,2) in ref DDL db.py:129
    StructField("is_active", IntegerType()),       # soft-delete flag, ref db.py:327
])

REGISTRATIONS = StructType([
    StructField("registration_id", LongType()),    # ref db.py:341-342
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("payment_status", StringType()),   # 'Pending' → 'Success', ref db.py:342,463
])

PAYMENTS = StructType([
    StructField("payment_id", LongType()),
    StructField("user_id", LongType()),            # ref db.py:455-457
    StructField("registration_id", LongType()),
    StructField("card_id", LongType()),            # nullable
    StructField("amount", DoubleType()),
    StructField("payment_type", StringType()),     # 'Free' | 'Saved' | 'OneTime'
    StructField("payment_status", StringType()),
    StructField("payment_date", TimestampNTZType()),
])

SAVED_CARDS = StructType([
    StructField("card_id", LongType()),            # ref db.py:428, 442-444 (no DDL)
    StructField("user_id", LongType()),
    StructField("card_holder_name", StringType()),
    StructField("card_number_encrypted", StringType()),
    StructField("cvv_encrypted", StringType()),
    StructField("expiry_date", StringType()),      # 'MM/YY'
])

DOMAIN_TABLES: dict[str, StructType] = {
    "users": USERS,
    "app_events": APP_EVENTS,
    "registrations": REGISTRATIONS,
    "payments": PAYMENTS,
    "saved_cards": SAVED_CARDS,
}

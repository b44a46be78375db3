"""Portal domain layer — the reference application's query semantics
on its own (effective) schema, as pure DataFrame transforms.

This is the direct functional port surface: given users/app_events/
registrations/payments/saved_cards frames (schemas.DOMAIN_TABLES),
each function reproduces one reference endpoint's semantics. The
driver star-schema queries (plans.flagship, plans.dashboard) are the
scale transplants of these; this module is where the reference's
domain edge cases (FIXTURES.md §B) are pinned by unit tests:
zero-payment events → revenue 0, multi-registration keep-latest,
latest-payment-status ties, soft-delete visibility, free events,
card masking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import scalars
from ..operators.windows import latest_per_group


def authenticate(users: DataFrame, email: str, password: str) -> DataFrame:
    """E1 (ref db.py:219-246): credential check via sha256 compare —
    returns the session projection (0 or 1 rows)."""
    return (
        users.filter(F.col("email") == F.lit(email))
        .filter(F.col("password_hash") == scalars.password_hash(F.lit(password)))
        .select("user_id", "first_name", "last_name", "email", "user_role")
    )


def list_active_events(app_events: DataFrame) -> DataFrame:
    """S3/P2/O1 (ref db.py:267-290): active events by date with the
    UI rename layer (event_id→id, event_name→title, ...)."""
    return (
        app_events.filter(F.col("is_active") == 1)
        .select(
            F.col("event_id").alias("id"),
            F.col("event_name").alias("title"),
            F.col("event_description").alias("description"),
            F.col("event_date").alias("date"),
            F.col("event_time").alias("time"),
            F.col("location"),
            F.col("event_type").alias("category"),
            F.col("price").cast("double").alias("price"),
        )
        .orderBy("date", "id")
    )


def event_stats(app_events: DataFrame, registrations: DataFrame,
                payments: DataFrame) -> DataFrame:
    """E2 de-N+1'd (ref app.py:154-168 + db.py:352-372): registration
    count + successful revenue per event in ONE job (the reference
    issues 1+2N queries). COALESCE defaults per ref db.py:362,367."""
    reg_counts = registrations.groupBy("event_id").agg(
        F.count("*").alias("registrations"))
    revenue = (
        payments.filter(F.col("payment_status") == "Success")
        .join(registrations.select("registration_id", "event_id"),
              "registration_id")
        .groupBy("event_id")
        .agg(F.sum("amount").alias("revenue"))
    )
    return (
        app_events.filter(F.col("is_active") == 1)
        .join(reg_counts, "event_id", "left")
        .join(revenue, "event_id", "left")
        .select(
            "event_id", "event_name",
            F.coalesce(F.col("registrations"), F.lit(0)).alias("registrations"),
            F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
        )
        .orderBy("event_id")
    )


def my_registrations(registrations: DataFrame, app_events: DataFrame,
                     payments: DataFrame, user_id: int) -> DataFrame:
    """E3 (ref db.py:376-402): the flagship correlated query —
    (a) keep only the newest registration per (user, event)
        (ref db.py:394-399, greatest-per-group)
    (b) latest payment status by payment_date, tiebreak payment_id
        (ref db.py:386-390; deterministic tightening §7.4.5)
    joined to events, ordered by event date."""
    mine = registrations.filter(F.col("user_id") == F.lit(user_id))
    newest = latest_per_group(mine, ["user_id", "event_id"],
                              ["registration_id"])
    latest_pay = latest_per_group(
        payments, ["registration_id"], ["payment_date", "payment_id"]
    ).select("registration_id",
             F.col("payment_status").alias("latest_payment_status"))
    return (
        newest.select("registration_id", "event_id")
        .join(app_events, "event_id")
        .join(latest_pay, "registration_id", "left")
        .select(
            F.col("registration_id"),
            F.col("event_name").alias("title"),
            F.col("event_date"),
            F.col("location"),
            F.col("price").cast("double").alias("price"),
            F.coalesce(F.col("latest_payment_status"), F.lit("Pending"))
            .alias("payment_status"),
        )
        .orderBy("event_date", "registration_id")
    )


def saved_cards_masked(saved_cards: DataFrame, user_id: int,
                       decrypt) -> DataFrame:
    """Saved-cards listing with decrypt + last-4 masking (ref
    db.py:426-433 + app.py:303): decrypt only the rows that survive
    the filter (UDF stays at the plan edge, SURVEY.md §4)."""
    return (
        saved_cards.filter(F.col("user_id") == F.lit(user_id))
        .withColumn("card_number", decrypt(F.col("card_number_encrypted")))
        .select(
            "card_id", "card_holder_name", "expiry_date",
            scalars.mask_last4(F.col("card_number")).alias("card_masked"),
        )
        .orderBy(F.col("card_id").desc())
    )


def latest_card(saved_cards: DataFrame, user_id: int) -> DataFrame:
    """O4 (ref app.py:290,328): 'most recent card' = max card_id —
    the reference's list-order assumption made explicit."""
    return (
        saved_cards.filter(F.col("user_id") == F.lit(user_id))
        .orderBy(F.col("card_id").desc())
        .limit(1)
    )


def free_event_payment(price: Column) -> Column:
    """P6 free-event predicate (ref app.py:242: float(price)==0.0 →
    auto-Success 'Free' payment path)."""
    return price.cast("double") == 0.0

"""Scalar function layer — the reference's F1-F14 functions (SURVEY.md
§2.8) as reusable Column builders, all JVM-side built-ins.

The reference computes every one of these row-by-row in Python
(reference app.py:160-168, 224-230, 303; db.py:62-63); here each is a
Catalyst expression usable inside any plan, at any scale, inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def password_hash(pw: Column) -> Column:
    """F1: sha256 hex digest (ref db.py:62-63 `_hash_password`)."""
    return F.sha2(pw, 256)


def fmt_date(ts: Column) -> Column:
    """F5: '05 Mar 2024' (ref app.py:160 strftime('%d %b %Y'))."""
    return F.date_format(ts, "dd MMM yyyy")


def fmt_time_12h(ts: Column) -> Column:
    """F6: '02:07 PM' (ref app.py:229 strftime('%I:%M %p'))."""
    return F.date_format(ts, "hh:mm a")


def seconds_to_clock(secs: Column) -> Column:
    """F7: seconds-since-midnight → 'HH:MM' with the reference's
    mod-24 hour wraparound (ref app.py:224-228: hrs=(s//3600)%24,
    mins=(s%3600)//60).

    MySQL TIME values can exceed 24h (up to 838:59:59); the reference
    wraps them into clock range — preserved here deliberately.
    """
    hrs = (secs.cast("long") / 3600).cast("long") % 24
    mins = (secs.cast("long") % 3600 / 60).cast("long")
    return F.concat(
        F.lpad(hrs.cast("string"), 2, "0"), F.lit(":"),
        F.lpad(mins.cast("string"), 2, "0"),
    )


def combine_date_time(date_ts: Column, secs: Column) -> Column:
    """F8: date + seconds-since-midnight → timestamp (ref app.py:203
    datetime.combine)."""
    return F.timestamp_add("SECOND", secs.cast("int"), F.date_trunc("DAY", date_ts))


def fmt_money(amount: Column) -> Column:
    """F9: 2-decimal money string (ref app.py:163 f'{x:.2f}')."""
    return F.format_string("%.2f", amount)


def mask_last4(s: Column) -> Column:
    """F10: '****' + last 4 chars (ref app.py:133,303 card masking)."""
    return F.concat(F.lit("****"), F.substring(s, -4, 4))


def valid_email(email: Column) -> Column:
    """F11/P6: contains '@' and '.' (ref app.py:83)."""
    return email.contains("@") & email.contains(".")


def valid_phone(phone: Column) -> Column:
    """F12/P6: exactly 10 digits (ref app.py:88 isdigit + len==10)."""
    return phone.rlike("^[0-9]{10}$")


def valid_password(pw: Column) -> Column:
    """F13/P6: length ≥ 6 (ref app.py:93)."""
    return F.length(pw) >= 6


def txn_id(*parts: Column) -> Column:
    """F14: deterministic transaction id (ref README.md:52 claims a
    generated TXN id; db.py:450-468 never implements it — doc/code
    drift). md5 over the business key is reproducible, unlike uuid()."""
    return F.md5(F.concat_ws("|", *parts))

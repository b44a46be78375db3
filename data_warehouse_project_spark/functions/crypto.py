"""Fernet column encryption — the reference's saved-card encryption
(U2/F2/F3) as Arrow-vectorized pandas UDFs.

The reference encrypts card numbers/CVVs with `cryptography.fernet`
and decrypts them in a per-row Python loop (reference db.py:412-423,
430-431). Spark has no symmetric-encryption built-in (`aes_encrypt`
exists but Fernet is the reference's wire format), so this is one of
the engine's two genuinely-custom UDF surfaces — kept Arrow-batched
(pandas_udf), never row-at-a-time, and applied at plan edges after
filters so it doesn't block pushdown (SURVEY.md §4).

Key handling mirrors the reference's env-var pattern
(db.py:412-417): ``DWPS_FERNET_KEY`` or a generated throwaway.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

try:
    from cryptography.fernet import Fernet
    HAVE_FERNET = True
except ImportError:  # pragma: no cover - env-dependent
    Fernet = None
    HAVE_FERNET = False


def get_key() -> bytes:
    """Resolve the Fernet key (env var, else generate — matching the
    reference's generate-if-missing behavior at db.py:414-417)."""
    key = os.environ.get("DWPS_FERNET_KEY")
    if key:
        return key.encode()
    if not HAVE_FERNET:
        raise RuntimeError("cryptography not installed and no key set")
    key = Fernet.generate_key().decode()
    os.environ["DWPS_FERNET_KEY"] = key
    return key.encode()


def encrypt_col(col: Column, key: bytes | None = None) -> Column:
    """Vectorized Fernet encrypt (ref db.py:419-420)."""
    key = key or get_key()

    @F.pandas_udf(StringType())
    def _enc(s: pd.Series) -> pd.Series:
        f = Fernet(key)  # one cipher per Arrow batch, not per row
        return s.map(lambda v: None if v is None else
                     f.encrypt(v.encode()).decode())

    return _enc(col)


def decrypt_col(col: Column, key: bytes | None = None) -> Column:
    """Vectorized Fernet decrypt (ref db.py:422-423; the reference
    applies this in a Python loop at db.py:430-431 — here it's one
    Arrow-batched projection)."""
    key = key or get_key()

    @F.pandas_udf(StringType())
    def _dec(s: pd.Series) -> pd.Series:
        f = Fernet(key)
        return s.map(lambda v: None if v is None else
                     f.decrypt(v.encode()).decode())

    return _dec(col)


def crypto_roundtrip(spark, sf_dir: str):
    """Driver-visible F2/F3 surface (ref db.py:419-423): build a
    saved-card-shaped frame from `customer`, Fernet-encrypt the card
    number, decrypt it back, and report round-trip integrity as one
    deterministic summary row.

    Fernet ciphertext embeds a random IV + timestamp, so the
    ciphertext column itself is nondeterministic — but the integrity
    COUNTS are exact, and the oracle pins them: a correct
    encrypt→decrypt pair means n_roundtrip_ok == n_cards ==
    n_ciphertext_differs == COUNT(customer), which DuckDB states
    directly. A single corrupted row fails the hash compare. Both
    UDFs are Arrow-batched projections at the plan edge (after the
    scan projection), so column pruning and the parquet scan are
    unaffected.
    """
    from ..sources.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    key = get_key()
    cards = cat.customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("card_number"),
    )
    enc = cards.withColumn(
        "card_number_encrypted", encrypt_col(F.col("card_number"), key))
    dec = enc.withColumn(
        "card_number_decrypted",
        decrypt_col(F.col("card_number_encrypted"), key))
    # COALESCE: SUM over zero rows is NULL while the oracle's COUNT(*)
    # is 0 — align the empty-input row (round-9 empty-input sweep)
    return dec.agg(
        F.count("*").alias("n_cards"),
        F.coalesce(
            F.sum(F.when(F.col("card_number_decrypted")
                         == F.col("card_number"), 1).otherwise(0)),
            F.lit(0)).cast("long").alias("n_roundtrip_ok"),
        F.coalesce(
            F.sum(F.when(F.col("card_number_encrypted")
                         != F.col("card_number"), 1).otherwise(0)),
            F.lit(0)).cast("long").alias("n_ciphertext_differs"),
    )


CRYPTO_ROUNDTRIP_SQL = """
SELECT COUNT(*) AS n_cards,
       COUNT(*) AS n_roundtrip_ok,
       COUNT(*) AS n_ciphertext_differs
FROM customer
"""

if HAVE_FERNET:
    from ..registry import register
    register("crypto_roundtrip", crypto_roundtrip, CRYPTO_ROUNDTRIP_SQL)

"""Skew-mitigation utilities — salted aggregation and salted join.

AQE's skew-join splitting handles sort-merge skew automatically, but
two shapes still need explicit salting at 100 TB:

- a grouped aggregation where one key dominates (a hot fingerprint, a
  bot user_id in the events stream): two-phase salted aggregation
  spreads the hot key over N partial groups, then merges;
- a fact⋈dim join where the fact is skewed on the join key and the
  dim is too big to broadcast: replicate each dim row N times with a
  salt, salt the fact randomly... (classic replicate-and-salt). For
  deterministic engines we salt the fact by a stable hash of a
  secondary column rather than rand().
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    agg_exprs: dict[str, str],
    salt_col: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``agg_exprs`` maps output column → 'sum' | 'count' | 'min' | 'max'
    of an input column (mergeable aggregates only — that's what makes
    the two-phase split algebraically exact). ``salt_col`` is any
    column with spread (e.g. a line number or id); its hash mod
    n_salts fans the hot key out, phase 2 merges the partials.
    """
    salt = (F.xxhash64(salt_col if isinstance(salt_col, Column)
                       else F.col(salt_col)) % n_salts).alias("__salt")
    phase1_aggs, phase2_aggs = [], []
    for out, spec in agg_exprs.items():
        fn, col = spec.split(":", 1)
        partial = f"__p_{out}"
        if fn == "count":
            phase1_aggs.append(F.count(col).alias(partial))
            phase2_aggs.append(F.sum(partial).alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(partial))
            phase2_aggs.append(F.sum(partial).alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(partial))
            phase2_aggs.append(F.min(partial).alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(partial))
            phase2_aggs.append(F.max(partial).alias(out))
        else:
            raise ValueError(f"non-mergeable aggregate {fn!r}")
    partials = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *phase1_aggs)
    return partials.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_source: str,
    n_salts: int = 8,
) -> DataFrame:
    """Replicate-and-salt equi-join for a skewed fact key.

    The dim side is exploded n_salts× (acceptable when the dim is
    mid-sized: too big to broadcast, small enough to replicate); the
    fact side gets a deterministic salt from ``salt_source``. The
    shuffle key becomes (key, salt) so a hot key spreads over
    n_salts partitions.
    """
    dim_salted = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    fact_salted = fact.withColumn(
        "__salt",
        (F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))).cast("int"))
    out = fact_salted.join(dim_salted, [key, "__salt"])
    return out.drop("__salt")


# --------------------------------------------------------------------------
# Driver-visible salted-aggregation query (round 4): the two-phase
# split is algebraically exact for mergeable aggregates, so the plain
# GROUP BY is its value-exact oracle — the driver check IS the proof
# that salting never changes results, only the shuffle layout.
# --------------------------------------------------------------------------

def salted_agg_status(spark, sf_dir: str) -> DataFrame:
    """Orders aggregated per o_orderstatus — a 3-distinct-value key,
    exactly the hot-key shape salting exists for — via `salted_agg`:
    phase 1 groups on (status, xxhash64(o_orderkey) % 16) so each hot
    key spreads over 16 partial cells, phase 2 merges. Money sums use
    the guard-scaled exact-long policy (compat.dsum) so the two-phase
    re-association is bit-exact: longs are associative, doubles are
    not."""
    from ..functions.compat import GUARD
    from ..sources.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    g = float(10 ** GUARD)
    scaled = cat.orders.withColumn(
        "__price_s",
        F.floor(F.col("o_totalprice") * F.lit(g) + F.lit(0.5)).cast("long"))
    out = salted_agg(
        scaled, ["o_orderstatus"],
        {"n_orders": "count:o_orderkey", "__total_s": "sum:__price_s"},
        salt_col="o_orderkey", n_salts=16)
    down = 10 ** (GUARD - 2)
    return out.select(
        "o_orderstatus",
        F.col("n_orders").cast("long").alias("n_orders"),
        (F.floor((F.col("__total_s") + F.lit(down // 2)) / F.lit(float(down)))
         .cast("double") / F.lit(100.0)).alias("total_price"))


def _salted_agg_status_sql() -> str:
    from ..functions.compat import sql_dsum
    return f"""
SELECT o_orderstatus,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price
FROM orders GROUP BY o_orderstatus
"""


def _register() -> None:
    from ..registry import register
    register("salted_agg_status", salted_agg_status,
             _salted_agg_status_sql())


_register()

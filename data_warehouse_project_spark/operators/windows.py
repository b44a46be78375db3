"""Window-based greatest-per-group operators.

The reference's two correlated subqueries are both "latest per group"
queries in disguise (SURVEY.md §2.5):

- latest payment status per registration: correlated scalar subquery
  `ORDER BY p.payment_date DESC LIMIT 1` (reference db.py:386-390);
- newest registration per (user,event): `registration_id = (SELECT
  MAX(...) ...)` greatest-per-group filter (reference db.py:394-399).

Both decorrelate to `row_number() OVER (PARTITION BY ... ORDER BY ...
DESC) = 1`. These helpers generalize that to the engine's reusable
top-k-per-group operator.

Determinism: MySQL's `LIMIT 1` on ties is nondeterministic; callers
must pass tiebreaker columns so results are reproducible (SURVEY.md
§7.4.5 — an intentional semantic tightening).

Scale notes: row_number over a window is a single shuffle on the
partition keys with no driver materialization; Spark's window exec
sorts within partitions and streams. For heavily skewed groups the
rank-filter pattern still beats a self-join-on-max because it is one
shuffle instead of two. AQE handles partition-count right-sizing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_RANK_COL = "__rank"


def _ordering(order_by: Sequence[Column | str], descending: bool) -> list[Column]:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return [c.desc() for c in cols] if descending else cols


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    k: int = 1,
    descending: bool = True,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top-k rows of each group under the given ordering.

    ``order_by`` should include a unique tiebreaker as its last column
    for deterministic results.
    """
    w = Window.partitionBy(*partition_by).orderBy(*_ordering(order_by, descending))
    ranked = df.withColumn(_RANK_COL, F.row_number().over(w))
    out = ranked.filter(F.col(_RANK_COL) <= k)
    if rank_col:
        return out.withColumnRenamed(_RANK_COL, rank_col)
    return out.drop(_RANK_COL)


def latest_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly the latest row per group (top-1 descending)."""
    return top_k_per_group(df, partition_by, order_by, k=1, descending=True)

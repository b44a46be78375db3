"""As-of join — attach, to each left row, the most recent right row
with the same key and right.ts <= left.ts.

Spark has no native ASOF JOIN (DuckDB/kdb/Timescale do); the naive
formulation is a correlated top-1 subquery per left row. The scalable
Spark expression is the union-and-window pattern:

1. tag left and right rows, union them on (key, ts) with a side
   marker ordered so right rows sort BEFORE left rows on ts ties
   (inclusive <= semantics),
2. one window per key ordered by (ts, side): `last_value(right_vals,
   ignoreNulls)` carries the latest right payload forward,
3. keep the left rows.

Cost: ONE shuffle of left+right on the key — same as a single
sort-merge join, no per-row subqueries, no range explosion. Skewed
keys behave like any window partition (salt if a single key dominates
at 100 TB). This beats the broadcast-UDF approaches whenever both
sides are large.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "__side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    right_ts_alias: str = "asof_ts",
) -> DataFrame:
    """For each left row: latest right (value_cols) with right.ts <=
    left.ts, matching on `on` keys. Left rows with no match keep
    nulls. Right side should be unique per (on, ts) — pre-deduplicate
    if not; on ties the carried value is the right row that sorts
    last by ts (deterministic given unique (on, ts)).
    """
    on = list(on)
    value_cols = list(value_cols)

    lhs = left.select(
        *on, F.col(ts_col),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__r_ts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    rhs = right.select(
        *on, F.col(ts_col),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(ts_col).alias("__r_ts"),
        F.lit(None).cast(lhs.schema["__l"].dataType).alias("__l"),
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        _SIDE, "__l",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__v_{c}")
          for c in value_cols],
        F.last("__r_ts", ignorenulls=True).over(w).alias(right_ts_alias),
    )
    return carried.filter(F.col(_SIDE) == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__v_{c}").alias(c) for c in value_cols],
        right_ts_alias,
    )

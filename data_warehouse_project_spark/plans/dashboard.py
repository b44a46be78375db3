"""Admin-dashboard stats — the reference's E2 flow de-N+1'd.

The reference renders N event cards by issuing 1 + 2N queries: a
listing query, then per event one COUNT and one JOIN+SUM
(reference app.py:151-168 → db.py:271-276, 352-372). That pattern is
the canonical OLTP anti-pattern this engine exists to remove: here the
same numbers come out of ONE grouped job.

Star transplant: customer card = order count + finished-order revenue
+ latest order date, zero-order customers included with 0/0 via left
join + COALESCE (ref db.py:362's COALESCE(SUM(..),0)).

Physical shape: the two fact aggregations reduce before joining (the
shuffle carries one row per customer), the dim join broadcasts, and
at 100 TB nothing about this plan changes — AQE just resizes the
post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.compat import dsum, sql_dsum
from ..registry import register
from ..sources.catalog import Catalog


def dashboard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    per_cust = (
        cat.orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("order_count"),
            dsum(F.when(F.col("o_orderstatus") == "F",
                        F.col("o_totalprice")).otherwise(F.lit(0.0)))
            .alias("finished_revenue"),
            F.max("o_orderdate").alias("last_order_date"),
        )
    )
    return (
        cat.customer.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey", "c_name", "c_mktsegment",
            F.coalesce(F.col("order_count"), F.lit(0)).alias("order_count"),
            F.coalesce(F.col("finished_revenue"), F.lit(0.0))
            .alias("finished_revenue"),
            "last_order_date",
        )
        .orderBy("c_custkey")
    )


DASHBOARD_STATS_SQL = f"""
SELECT c_custkey, c_name, c_mktsegment,
       CAST(COALESCE(s.order_count, 0) AS BIGINT) AS order_count,
       COALESCE(s.finished_revenue, 0.0) AS finished_revenue,
       s.last_order_date
FROM customer
LEFT JOIN (
    SELECT o_custkey,
           COUNT(*) AS order_count,
           {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")}
               AS finished_revenue,
           MAX(o_orderdate) AS last_order_date
    FROM orders GROUP BY o_custkey
) s ON c_custkey = s.o_custkey
ORDER BY c_custkey
"""

register("dashboard_stats", dashboard_stats, DASHBOARD_STATS_SQL)

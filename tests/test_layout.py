"""Physical-layout tests: partition pruning and exchange-free bucketed
joins — explain()-verified, because the *plan* is the deliverable."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from data_warehouse_project_spark import writes
from data_warehouse_project_spark.sources.catalog import Catalog


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_date_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = Catalog(spark, sf_dir).orders
    path = str(tmp_path / "orders_part")
    writes.write_date_partitioned(orders, path, "o_orderdate", "month")

    pruned = spark.read.parquet(path).filter(
        F.col("o_orderdate_month") == "1996-03")
    plan = _plan(pruned)
    # the partition predicate must reach the scan as a PartitionFilter
    assert "PartitionFilters" in plan and "o_orderdate_month" in plan
    # equivalence: pruned read == direct read of the one partition dir
    # (inputFiles() lists pre-pruning, so it can't verify pruning)
    direct = spark.read.parquet(path + "/o_orderdate_month=1996-03")
    assert pruned.count() == direct.count() > 0


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    writes.write_bucketed(cat.orders, "b_orders", "o_orderkey", 8,
                          sort_col="o_orderkey")
    writes.write_bucketed(
        cat.lineitem.limit(2000), "b_lineitem", "l_orderkey", 8,
        sort_col="l_orderkey")
    try:
        joined = (
            spark.table("b_orders").hint("merge")
            .join(spark.table("b_lineitem"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan          # co-located: no shuffle
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")

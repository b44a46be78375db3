#!/usr/bin/env python
"""Oracle-check a few named queries (fast loop for the optimization
round: after touching an operator, re-prove its result against the
DuckDB twin at one or more scale dirs before moving on).

Usage: python scripts/oracle_check.py SF_DIR QUERY [QUERY...]
Rows-only queries (no oracle) are executed and row-counted.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    from data_warehouse_project_spark import registry
    from data_warehouse_project_spark.cache import release_all
    from tests.oracle_utils import compare, duckdb_con

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb_con(sf_dir)
    bad = []
    for name in names:
        fn, sql = registry.REGISTRY[name]
        t0 = time.time()
        try:
            if sql is None:
                n = fn(spark, sf_dir).count()
                print(f"  ran  {name} rows={n} ({time.time()-t0:.2f}s)")
            else:
                compare(fn(spark, sf_dir), con, sql)
                print(f"  ok   {name} ({time.time()-t0:.2f}s)")
        except Exception as e:
            bad.append(name)
            print(f"  FAIL {name}: {e}")
        release_all()
    print(f"CHECK {len(names) - len(bad)} ok, {len(bad)} failed @ {sf_dir}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

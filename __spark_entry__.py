"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over data_warehouse_project_spark.registry — every operator
from SURVEY.md §2 (plus the LLM-pipeline extensions) registers there
with its DuckDB oracle twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_warehouse_project_spark import registry as _registry
from data_warehouse_project_spark.plans.flagship import flagship as _flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return _registry.oracle_sql()

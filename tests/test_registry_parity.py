"""Differential test: every oracle-checkable registry query must match
its DuckDB twin at sf0.001 — the local mirror of the driver's t2 gate.
"""

from __future__ import annotations

import pytest

from data_warehouse_project_spark import registry
from tests.oracle_utils import compare, duckdb_con


def _names():
    # queries() (not raw REGISTRY) — it retries registration to a
    # FULL pass, so collection can't silently parametrize over a
    # partial registry if a conftest import aborted the load-time
    # attempt mid-import (registry.py _REGISTERED note)
    return sorted(registry.queries())


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_con(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, con, name):
    fn, sql = registry.REGISTRY[name]
    df = fn(spark, sf_dir)
    if sql is None:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    compare(df, con, sql, name)

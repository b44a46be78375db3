from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_project_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("dwps-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def kmv_hash_universe(spark):
    """120 engine-computed xxhash64 values (the KMV key hash), pulled
    once for the pure-Python bottom-k merge-lemma property test."""
    from pyspark.sql import functions as F

    df = spark.range(120).select(
        F.xxhash64(F.col("id").cast("string")).alias("h"))
    return [r["h"] for r in df.collect()]

"""Parquet source catalog.

Replaces the reference's MySQL connection layer (reference db.py:17-59:
TCP probe + retry + fresh connection per call) with a single-session
parquet catalog: one `Catalog` per scale-factor directory, lazily
loading each table exactly once and registering it as a temp view so
the same frames serve both DataFrame and spark.sql paths.

Scale notes: scans stay fully declarative (spark.read.parquet with an
explicit expected schema), so Catalyst pushes filters and prunes
columns down to the parquet reader; at cluster scale the same catalog
would point at a partitioned table root (e.g. orders/o_orderdate=...)
and partition pruning composes for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..session import tune

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Table whose on-disk ts is TIMESTAMP(NANOS): read nanos as long, then
#: convert (data is µs-granular, so `div 1000` is lossless — verified
#: against the DuckDB read of the same files).
_NANOS_TS_TABLES = {"events": "ts"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table as a DataFrame with its canonical schema."""
    tune(spark)  # idempotent: nanosAsLong + UTC session tz
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    ns_col = _NANOS_TS_TABLES.get(name)
    if ns_col is not None and df.schema[ns_col].dataType.typeName() == "long":
        df = df.withColumn(
            ns_col,
            F.expr(f"cast(timestamp_micros({ns_col} div 1000) as timestamp_ntz)"),
        )
        # keep the on-disk column order
        df = df.select(*[f.name for f in schemas.STAR_TABLES[name].fields])
    return df


class Catalog:
    """Lazy per-scale-factor table catalog with temp-view registration."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = tune(spark)
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            if name not in schemas.STAR_TABLES:
                raise KeyError(f"unknown table {name!r}")
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in schemas.STAR_TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, names: list[str] | None = None) -> None:
        """Register tables as temp views for spark.sql access."""
        for name in names or list(schemas.STAR_TABLES):
            self.table(name).createOrReplaceTempView(name)

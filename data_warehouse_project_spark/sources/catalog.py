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

#: Env-gated live-database source (the reference's MySQL connection,
#: ref db.py:42-48, as a Spark JDBC reader). Set e.g.
#:   DWPS_JDBC_URL=jdbc:mysql://host:3306/dbname
#:   DWPS_JDBC_USER / DWPS_JDBC_PASSWORD
#: and every Catalog table loads via format("jdbc") instead of
#: parquet. Untestable live in this sandbox (no MySQL server); the
#: option construction and schema check are unit-tested.
JDBC_URL_ENV = "DWPS_JDBC_URL"


def _default_partition_column(name: str) -> str | None:
    """First integer-typed column of the table's canonical schema —
    the surrogate/join key by convention — used to split a JDBC read
    into parallel range-bounded queries."""
    for f in schemas.STAR_TABLES[name].fields:
        if f.dataType.typeName() in ("long", "integer"):
            return f.name
    return None


def jdbc_options(
    table: str,
    url: str | None = None,
    *,
    user: str | None = None,
    password: str | None = None,
    num_partitions: int | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Build the option map for a scale-conscious JDBC table read.

    Defaults: predicate/aggregate/limit pushdown on (filters run in
    the database, not after transfer), a real fetchsize (the
    mysql-connector default streams row-by-row), and — when
    ``num_partitions`` is given — a range-partitioned parallel read on
    the table's key column so one executor isn't a single-stream
    bottleneck.
    """
    url = url or os.environ.get(JDBC_URL_ENV)
    if not url:
        raise ValueError(f"no JDBC url (arg or ${JDBC_URL_ENV})")
    if table not in schemas.STAR_TABLES:
        raise KeyError(f"unknown table {table!r}")
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetchsize),
        "pushDownPredicate": "true",
        "pushDownAggregate": "true",
        "pushDownLimit": "true",
    }
    user = user or os.environ.get("DWPS_JDBC_USER")
    password = password or os.environ.get("DWPS_JDBC_PASSWORD")
    if user:
        opts["user"] = user
    if password:
        opts["password"] = password
    if num_partitions and num_partitions > 1:
        pcol = partition_column or _default_partition_column(table)
        if pcol is None:
            raise ValueError(f"{table!r} has no integer key column; "
                             "pass partition_column explicitly")
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/"
                             "upper_bound (e.g. min/max of the key)")
        opts.update({
            "numPartitions": str(num_partitions),
            "partitionColumn": pcol,
            "lowerBound": str(lower_bound),
            "upperBound": str(upper_bound),
        })
    return opts


def load_table_jdbc(spark: SparkSession, name: str, **kw) -> DataFrame:
    """Load one table over JDBC, schema-checked against STAR_TABLES."""
    tune(spark)
    df = spark.read.format("jdbc").options(**jdbc_options(name, **kw)).load()
    expected = [f.name for f in schemas.STAR_TABLES[name].fields]
    missing = set(expected) - set(df.columns)
    if missing:
        raise ValueError(
            f"JDBC table {name!r} missing expected columns {sorted(missing)}")
    return df.select(*expected)

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table as a DataFrame with its canonical schema.

    Every DECLARED timestamp column (schemas.STAR_TABLES) is
    type-sniffed against the on-disk read type and normalized — the
    driver has regenerated the testdata with a different physical
    encoding mid-project once already (events.ts TIMESTAMP(NANOS) →
    TIMESTAMP(MICROS) after round 4), so the dispatch is generic, not
    a per-table special case:
    - on-disk long (TIMESTAMP(NANOS) under the nanosAsLong conf) →
      `timestamp_micros(x div 1000)` (lossless: data is µs-granular);
    - on-disk timestamp vs declared ntz (or vice versa) → cast, which
      is value-preserving under the UTC-pinned session tz;
    - matching type → passthrough.

    If $DWPS_JDBC_URL is set the table loads over JDBC instead (the
    reference's live-MySQL source, ref db.py:42-48)."""
    tune(spark)  # idempotent: nanosAsLong + UTC session tz
    if os.environ.get(JDBC_URL_ENV):
        return load_table_jdbc(spark, name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    changed = False
    for field in schemas.STAR_TABLES[name].fields:
        want = field.dataType.typeName()
        if want not in ("timestamp", "timestamp_ntz"):
            continue
        if field.name not in df.columns:
            raise ValueError(
                f"parquet table {name!r} at {path} missing expected "
                f"column {field.name!r} (have {df.columns})")
        got = df.schema[field.name].dataType.typeName()
        if got == "long":
            df = df.withColumn(field.name, F.expr(
                f"cast(timestamp_micros({field.name} div 1000) as {want})"))
            changed = True
        elif got != want and got in ("timestamp", "timestamp_ntz"):
            df = df.withColumn(field.name, F.col(field.name).cast(want))
            changed = True
    if changed:
        # keep the declared column order
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

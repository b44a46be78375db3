"""Query registry — the single source of truth for the driver contract.

Every implemented operator/query registers here as
  name -> (spark_fn, oracle_sql | None)
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is
the ANSI-SQL twin DuckDB runs on the same parquet tables. A ``None``
oracle marks a genuinely non-SQL-expressible op (driver falls back to
a rows-only check).

Naming contract: aliases of computed columns MUST match between the
Spark plan and the oracle SQL — the driver sorts columns by name
before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import flagship as _flagship

SparkQuery = Callable[[SparkSession, str], DataFrame]

#: name -> (callable, oracle sql or None)
REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, fn: SparkQuery, oracle: str | None) -> None:
    if name in REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    REGISTRY[name] = (fn, oracle)


register("flagship_my_registrations", _flagship.flagship, _flagship.FLAGSHIP_ORACLE)


def _register_modules() -> None:
    """Import every module that self-registers queries."""
    from .operators import extended, relational  # noqa: F401
    from .plans import dashboard, tpch, tpch_deep, warehouse  # noqa: F401
    from .streaming import batch_parity  # noqa: F401
    from .llm import (clusters, dedup, multimodal, pipeline,  # noqa: F401
                      sampling, similarity, textstats)


try:
    _register_modules()
except ImportError:
    # During early bring-up some modules may not exist yet; the
    # registry stays partial rather than failing the whole contract.
    pass


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}

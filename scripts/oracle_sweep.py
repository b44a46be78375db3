"""Run EVERY oracle-checkable registry query against its DuckDB twin
at an arbitrary scale factor — the scale-evidence sweep behind the
README claim (default sf0.1 = 10× the driver's correctness scale, the
same files bench.py reads).

Usage: python scripts/oracle_sweep.py [sf_dir]
Prints one line per query and a final ``SWEEP {n_ok} matched,
{n_fail} failed @ {sf_dir}`` summary; exit code 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    from data_warehouse_project_spark import registry
    from data_warehouse_project_spark.cache import release_all
    from tests.oracle_utils import compare, duckdb_con

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb_con(sf_dir)
    names = sorted(n for n, (_, sql) in registry.REGISTRY.items()
                   if sql is not None)
    ok, fail = 0, []
    for name in names:
        fn, sql = registry.REGISTRY[name]
        t0 = time.time()
        try:
            compare(fn(spark, sf_dir), con, sql, name)
            ok += 1
            print(f"  ok   {name} ({time.time() - t0:.2f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — report-and-continue sweep
            fail.append(name)
            print(f"  FAIL {name}: {exc}", flush=True)
        finally:
            release_all()
    print(f"SWEEP {ok} matched, {len(fail)} failed @ {sf_dir}"
          + (f" failures: {fail}" if fail else ""))
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

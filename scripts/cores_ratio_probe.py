#!/usr/bin/env python
"""Parallelism proof at a data-dominated scale (VERDICT r12 #8).

At sf0.1 nothing parallelizes (BENCH_r12_c8: the full bench is
slightly FASTER at 8 cores than 32 — per-job fixed cost dominates).
That is a local-SF artifact, not a property of the plans; this probe
records the evidence: run the top shuffle-carrying queries against
the derived sf1.0 corpus (10x sf0.1, built by sf1_regression.py) at
local[8] and local[32] in SEPARATE processes (a SparkSession's master
is fixed per JVM) and report the wall ratio. A plan that genuinely
parallelizes reads ratio >> 1 once data dominates.

Usage:
  python scripts/cores_ratio_probe.py            # orchestrate 8 vs 32
  python scripts/cores_ratio_probe.py --child QUERY [QUERY...]
      # internal: one process, cores from $SPARK_GRAFT_CPUS,
      # sf dir from $SPARK_GRAFT_SF_DIR; prints one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: the top-3 shuffle carriers (BENCH_LOCAL per-query exchange volume)
#: plus the inverse-scaling poster child from the r12 scaling block
QUERIES = [
    "part_triangle_participation",
    "part_affinity_topk",
    "part_copurchase_pagerank",
    "part_label_propagation",
]

SF1_DIR = os.path.join(REPO, ".localdata", "sf1.0")
REPS = 2


def child(names: list[str]) -> None:
    from data_warehouse_project_spark import registry
    from data_warehouse_project_spark.cache import release_all
    from data_warehouse_project_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF1_DIR)
    spark = get_spark("dwps-cores-ratio")
    qs = registry.queries()
    out = {}
    for name in names:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            release_all()
        out[name] = round(best, 3)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2:])
        return
    if not os.path.exists(os.path.join(SF1_DIR, "lineitem.parquet")):
        print("derived sf1.0 corpus missing — run sf1_regression.py first",
              file=sys.stderr)
        sys.exit(2)
    results: dict[str, dict[str, float]] = {}
    for cores in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cores,
                   SPARK_GRAFT_SF_DIR=SF1_DIR)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"] + QUERIES,
            env=env, capture_output=True, text=True, cwd=REPO)
        if p.returncode != 0:
            print(p.stderr[-2000:], file=sys.stderr)
            sys.exit(1)
        results[cores] = json.loads(p.stdout.strip().splitlines()[-1])
    ratios = {q: round(results["8"][q] / results["32"][q], 2)
              for q in QUERIES}
    print(json.dumps({"sf_dir": SF1_DIR, "c8": results["8"],
                      "c32": results["32"],
                      "c8_over_c32_ratio": ratios}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-job wall-time breakdown for one registry query (guide §1):
runs the query via the noop sink and prints every Spark job it
launched — duration, stage count, task count, shuffle bytes — from
the AppStatusStore. Fixed per-job overhead vs real compute is the
first split every optimization decision here needs (most heavy
queries shuffle almost nothing; their cost is job-count × overhead
plus JVM compute, and this makes that visible without the UI).

Usage: python scripts/profile_query.py QUERY [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_project_spark import registry
from data_warehouse_project_spark.cache import release_all
from data_warehouse_project_spark.session import get_spark


def job_rows(spark, since_job: int):
    store = spark.sparkContext._jsc.sc().statusStore()
    gw = spark.sparkContext._gateway
    jobs = store.jobsList(gw.jvm.java.util.ArrayList())
    out = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        if j.jobId() <= since_job:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        t0 = sub.get().getTime() if sub.isDefined() else None
        t1 = comp.get().getTime() if comp.isDefined() else None
        out.append({
            "job": j.jobId(),
            "sec": (t1 - t0) / 1000.0 if t0 and t1 else None,
            "stages": j.stageIds().size(),
            "tasks": j.numCompletedTasks(),
            "desc": (j.description().get()[:90]
                     if j.description().isDefined() else ""),
            "name": j.name()[:90],
        })
    return sorted(out, key=lambda r: r["job"])


def max_job_id(spark) -> int:
    rows = job_rows(spark, -1)
    return rows[-1]["job"] if rows else -1


def main() -> None:
    qname = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dwps-profile")

    from data_warehouse_project_spark.schemas import STAR_TABLES
    from data_warehouse_project_spark.sources.catalog import Catalog
    cat = Catalog(spark, sf_dir)
    for t in STAR_TABLES:
        cat.table(t).write.format("noop").mode("overwrite").save()

    fn = registry.queries()[qname]
    for rep in range(reps):
        floor = max_job_id(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        release_all()
        time.sleep(0.5)
        rows = job_rows(spark, floor)
        if rep != reps - 1:
            print(f"# rep {rep}: {wall:.3f}s ({len(rows)} jobs)")
            continue
        print(f"\n== {qname} rep {rep}: wall {wall:.3f}s, "
              f"{len(rows)} jobs ==")
        jsum = 0.0
        for r in rows:
            jsum += r["sec"] or 0.0
            print(f"  job {r['job']:4d} {r['sec'] if r['sec'] is not None else -1:7.3f}s "
                  f"stages={r['stages']:2d} tasks={r['tasks']:4d}  "
                  f"{r['desc'] or r['name']}")
        print(f"  sum(job sec) {jsum:.3f}  (wall - sum = driver/plan gap "
              f"{wall - jsum:.3f}s)")
    spark.stop()


if __name__ == "__main__":
    main()

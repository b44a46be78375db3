"""Targeted quiet-host re-measure (BASELINE.md adjudication policy).

Runs the flagged queries min-of-3 with CODE-UNCHANGED control queries
interleaved, so a reading can be control-normalized: if the controls
read 1.2-1.6x their standing minima, the host is warm and a flagged
query inside the same band is drift, not regression.

Usage: python scripts/quiet_remeasure.py flagged1 flagged2 ...
(controls are fixed; standing minima are read from the table below —
update alongside BASELINE.md.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_project_spark import registry  # noqa: E402
from data_warehouse_project_spark.cache import release_all  # noqa: E402
from data_warehouse_project_spark.session import get_spark  # noqa: E402

#: standing quiet minima (BASELINE.md round-12 re-baseline) for
#: control normalization
STANDING = {
    "q1_pricing_summary": 0.598,
    "flagship_my_registrations": 1.983,
    "dedup_exact": 0.237,
    "dedup_minhash_lsh": 1.401,
    "part_copurchase_pagerank": 4.733,
    "orders_backlog_timeseries": 0.669,
    "token_bigram_pmi": 1.103,
}

CONTROLS = ["q1_pricing_summary", "flagship_my_registrations",
            "dedup_exact", "dedup_minhash_lsh",
            "part_copurchase_pagerank"]


def min_of_3(spark, fn, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        release_all()
    return round(best, 3)


def main() -> int:
    flagged = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load1 = round(os.getloadavg()[0], 2)
    spark = get_spark("quiet-remeasure")
    qs = registry.queries()
    # warm-up: touch inputs once
    from data_warehouse_project_spark.schemas import STAR_TABLES
    from data_warehouse_project_spark.sources.catalog import Catalog
    cat = Catalog(spark, sf_dir)
    for t in STAR_TABLES:
        cat.table(t).write.format("noop").mode("overwrite").save()

    # interleave: control, flagged, control, flagged, ...
    order: list[str] = []
    pool = list(CONTROLS)
    for q in flagged:
        if pool:
            order.append(pool.pop(0))
        order.append(q)
    order.extend(pool)

    out = {}
    for name in order:
        sec = min_of_3(spark, qs[name], sf_dir)
        std = STANDING.get(name)
        out[name] = {"sec": sec, "standing": std,
                     "ratio": round(sec / std, 2) if std else None,
                     "role": "flagged" if name in flagged else "control"}
        print(f"# {name}: {sec:.3f}s "
              f"({out[name]['ratio']}x standing, {out[name]['role']})",
              file=sys.stderr)
    print(json.dumps({"load1_start": load1, "sf_dir": sf_dir,
                      "results": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""One-off derived-sf1.0 probe for the events/streaming-state family.

Companion to graph_sf1_probe.py / docs_sf1_probe.py (SCALING.md
#13/#14/#15). The events table derives faithfully by USER
replication: ten disjoint copies with remapped user_id/event_id and
the ORIGINAL timestamps — per-user event sequences (what sessionize /
transition / TTL state size depends on) are preserved exactly, and
per-(hour, type) densities grow 10x, which is precisely how a 10x
user base behaves over the same window. The late-tolerant fold
simulations' state bounds (lateness-window buffers, open sessions,
types^2 matrices) are the quantities under test.

Usage:
  python scripts/events_sf1_probe.py            # build (if absent) + measure
  python scripts/events_sf1_probe.py --build    # build only
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_project_spark import registry  # noqa: E402
from data_warehouse_project_spark.cache import release_all  # noqa: E402
from data_warehouse_project_spark.metrics import (  # noqa: E402
    measure_query_shuffle)
from data_warehouse_project_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".localdata", "sf1.0")
COPIES = 10

EVENT_QUERIES = [
    "events_sessions_late_tolerant",
    "events_transitions_late_tolerant",
    "events_sessions_incremental",
    "events_transitions_incremental",
    "events_ttl_window_state",
    "events_click_purchase_incremental",
    "events_attribution",
    "events_top_paths",
    "events_sessionize",
    "events_distinct_users_incremental",
]


def build(spark) -> None:
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    max_uid = ev.agg(F.max("user_id")).first()[0] + 1
    max_eid = ev.agg(F.max("event_id")).first()[0] + 1
    copies = spark.range(COPIES).select(F.col("id").alias("copy_i"))
    tgt = f"{DST}/events.parquet"
    if os.path.islink(tgt):
        os.unlink(tgt)
    (ev.crossJoin(F.broadcast(copies))
       .withColumn("user_id",
                   F.col("user_id") + F.col("copy_i") * max_uid)
       .withColumn("event_id",
                   F.col("event_id") + F.col("copy_i") * max_eid)
       .drop("copy_i")
       .write.mode("overwrite").parquet(tgt))


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    spark = get_spark("events-sf1-probe")
    if not os.path.exists(f"{DST}/events.parquet/_SUCCESS"):
        t0 = time.perf_counter()
        build(spark)
        print(f"# built {DST}/events.parquet in "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
    if "--build" in sys.argv:
        spark.stop()
        return 0

    qs = registry.queries()
    out = {}
    for name in EVENT_QUERIES:
        fn = qs[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, DST).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            release_all()
        m = measure_query_shuffle(spark, fn, DST)
        out[name] = {"sec": round(best, 3), **m}
        print(f"# {name}: {best:.2f}s "
              f"write={m['shuffle_write_bytes']:,}B "
              f"spill={m['spilled_bytes']:,}B", file=sys.stderr)
    print(json.dumps({"sf": 1.0, "derived_from":
                      "10x user-remapped copies of sf0.1 events",
                      "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

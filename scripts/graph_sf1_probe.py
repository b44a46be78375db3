"""One-off sf1.0 probe for the graph family (VERDICT r10 #6).

The driver's testdata stops at sf0.1, but the graph queries are the
repo's biggest shuffle movers (40-102 MB at sf0.1), so the O(m^1.5)
wedge bound and the k^2 basket guard deserve one measurement at 10x.

A faithful sf1.0 for the graph family can be DERIVED from sf0.1: in
the driver's TPC-H-ish generator, part and order cardinalities scale
linearly with sf while per-order basket size stays constant
(sf0.01 -> sf0.1 measured: 2,000 -> 20,000 parts, 14,743 -> 147,236
orders, 60k -> 600k lineitem). Ten disjoint copies of sf0.1 with
remapped l_orderkey / l_partkey therefore preserve the per-part
frequency and basket-size distributions exactly — the two quantities
the graph plans' shuffle volume depends on. Output goes under
.localdata/sf1.0 (gitignored; ~10x sf0.1 on disk).

Usage:
  python scripts/graph_sf1_probe.py            # build (if absent) + measure
  python scripts/graph_sf1_probe.py --build    # build only

Prints one JSON line per graph query: wall seconds (min of 2) +
shuffle/spill bytes, for SCALING.md #13.
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

GRAPH_QUERIES = [
    "part_triangle_participation",
    "part_copurchase_pagerank",
    "part_affinity_topk",
    "part_label_propagation",
    "part_market_basket",
    "part_reach_hops",
]


def build(spark) -> None:
    """10 disjoint key-remapped copies of sf0.1's graph inputs.
    Key remap: new_key = old_key + copy_i * (max_key + 1) — keeps
    keys integral and collision-free without hashing."""
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    part = spark.read.parquet(f"{SRC}/part.parquet")
    max_order = li.agg(F.max("l_orderkey")).first()[0] + 1
    max_part = part.agg(F.max("p_partkey")).first()[0] + 1
    copies = spark.range(COPIES).select(F.col("id").alias("copy_i"))
    (li.crossJoin(F.broadcast(copies))
       .withColumn("l_orderkey",
                   F.col("l_orderkey") + F.col("copy_i") * max_order)
       .withColumn("l_partkey",
                   F.col("l_partkey") + F.col("copy_i") * max_part)
       .drop("copy_i")
       .write.mode("overwrite").parquet(f"{DST}/lineitem.parquet"))
    (part.crossJoin(F.broadcast(copies))
       .withColumn("p_partkey",
                   F.col("p_partkey") + F.col("copy_i") * max_part)
       .withColumn("p_name",
                   F.concat_ws("#", F.col("p_name"),
                               F.col("copy_i").cast("string")))
       .drop("copy_i")
       .write.mode("overwrite").parquet(f"{DST}/part.parquet"))
    # the graph queries only read lineitem + part; symlink the rest
    # so Catalog can resolve any table it eagerly lists
    for t in ["region", "nation", "customer", "supplier", "orders",
              "events", "documents", "embeddings"]:
        dst = f"{DST}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    spark = get_spark("graph-sf1-probe")
    if not os.path.exists(f"{DST}/lineitem.parquet/_SUCCESS"):
        t0 = time.perf_counter()
        build(spark)
        print(f"# built {DST} in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    if "--build" in sys.argv:
        spark.stop()
        return 0

    qs = registry.queries()
    out = {}
    for name in GRAPH_QUERIES:
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
    print(json.dumps({"sf": 1.0, "derived_from": "10x-remap of sf0.1",
                      "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

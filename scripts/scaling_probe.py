#!/usr/bin/env python
"""Empirical scaling probe: run a cross-family sample of headline
queries at sf0.001 / sf0.01 / sf0.1 (100× data spread) and report
per-query wall times plus the 0.01→0.1 scaling ratio — the measured
evidence behind the repo's "linear in corpus, bounded tails" scale
claims (a query whose plan is corpus-linear should grow ≲10× per 10×
data once fixed job overhead is netted out; sub-linear growth means
fixed overhead still dominates at these sizes).

Usage: python scripts/scaling_probe.py [--out SCALING.md]
Writes a markdown table and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_project_spark import registry
from data_warehouse_project_spark.cache import release_all
from data_warehouse_project_spark.session import get_spark

#: one representative per workload family, mid-weight and heavier
#: shapes preferred (sub-100ms queries are pure scheduling overhead
#: at every sf and measure nothing)
PROBE = [
    "flagship_my_registrations",    # windows + joins + sort
    "q1_pricing_summary",           # scan-bound aggregate
    "q9_product_profit",            # star join
    "dedup_ngram_jaccard",          # capped blocking dedup
    "dedup_minhash_lsh",            # banded LSH
    "doc_lm_cross_entropy",         # heaviest text op
    "dup_ngram_spans",              # exact-substring spans
    "knn_brute_cosine",             # vector scoring
    "events_sessionize",            # gaps-and-islands window
    "part_copurchase_pagerank",     # iterative graph
    "part_affinity_topk",           # capped wedge join
    "chunk_dedup_report",           # chunk hash window
    "user_rfm_segments",            # histogram quartiles
    "cdc_changelog",                # full-outer snapshot diff
    "dedup_bridge_survivors",       # multi-signal CC bridge (r7)
    "events_ttl_window_state",      # TTL'd bounded-state fold (r7)
    "cms_accuracy_floor",           # count-min sketch build+probe (r7)
    "events_value_drift_daily",     # rolling histogram drift (late r7)
    "nation_revenue_trend_ols",     # sufficient-stats OLS + join (late r7)
    "orders_price_median_twopass",  # histogram-refinement median (late r7)
    "events_ab_cuped_report",       # per-user funnel + CUPED solve (late r7)
    "orders_revenue_cusum",         # daily groupBy + calendar CUSUM (late r7)
    "revenue_forecast_backtest",    # expanding-window OLS eval (late r7)
    "customer_churn_survival",      # per-customer KM fold (late r7)
    "orders_cusum_served",          # two-batch state fold + serve (late r7)
]

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="markdown file to (over)write with the table")
    ap.add_argument("--root", default="/root/testdata")
    args = ap.parse_args()

    spark = get_spark("dwps-scaling")
    queries = registry.queries()
    times: dict[str, dict[str, float]] = {q: {} for q in PROBE}
    for sf in SFS:
        sf_dir = os.path.join(args.root, sf)
        for name in PROBE:
            fn = queries[name]
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                release_all()
            times[name][sf] = round(best, 3)
            print(f"# {sf} {name}: {best:.3f}s", file=sys.stderr)

    lines = [
        "| query | sf0.001 | sf0.01 | sf0.1 | 0.01→0.1 ratio |",
        "|---|---|---|---|---|",
    ]
    ratios = {}
    for name in PROBE:
        t = times[name]
        r = round(t["sf0.1"] / t["sf0.01"], 2) if t["sf0.01"] else None
        ratios[name] = r
        lines.append(f"| {name} | {t['sf0.001']:.3f} | {t['sf0.01']:.3f} "
                     f"| {t['sf0.1']:.3f} | {r}× |")
    table = "\n".join(lines)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(table + "\n")
    print(table, file=sys.stderr)
    print(json.dumps({"metric": "scaling_probe", "times": times,
                      "ratio_001_to_01": ratios}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""CLI entry point — run any registered query from the shell.

    python -m data_warehouse_project_spark list
    python -m data_warehouse_project_spark run flagship_my_registrations \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m data_warehouse_project_spark explain q5_local_supplier_volume
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="data_warehouse_project_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run_p = sub.add_parser("run", help="run a query and print rows")
    run_p.add_argument("query")
    run_p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    run_p.add_argument("--limit", type=int, default=20)

    exp_p = sub.add_parser("explain", help="print a query's physical plan")
    exp_p.add_argument("query")
    exp_p.add_argument("--sf-dir", default="/root/testdata/sf0.1")

    hc_p = sub.add_parser(
        "healthcheck",
        help="run the warehouse audit family (FK integrity, order "
             "reconciliation); exit 1 on orphans/NULL FKs")
    hc_p.add_argument("--sf-dir", default="/root/testdata/sf0.1")

    args = parser.parse_args(argv)

    from . import registry
    if args.cmd == "list":
        for name, (_, sql) in sorted(registry.REGISTRY.items()):
            kind = "oracle" if sql else "rows-only"
            print(f"{name:35s} [{kind}]")
        return 0

    if args.cmd == "healthcheck":
        from .plans.audits import (order_consistency_audit,
                                   referential_integrity_report)
        from .session import get_spark
        spark = get_spark("dwps-healthcheck")
        bad = 0
        print("== referential integrity ==")
        for r in referential_integrity_report(spark, args.sf_dir).collect():
            flag = "" if (r["n_orphans"] == 0 and r["n_null_fk"] == 0) \
                else "  <-- VIOLATION"
            bad += r["n_orphans"] + r["n_null_fk"]
            print(f"{r['edge']:40s} child={r['n_child']:>10d} "
                  f"null_fk={r['n_null_fk']} orphans={r['n_orphans']}{flag}")
        print("== primary-key uniqueness ==")
        from .plans.audits import pk_uniqueness_report
        # Known dataset property (recorded finding, every sf): the
        # synthetic generator assigns lineitem linenumbers randomly,
        # so (l_orderkey, l_linenumber) is NOT unique in driver data
        # — reported, never failed on. All other tables gate.
        known_nonunique = {"lineitem"}
        for r in pk_uniqueness_report(spark, args.sf_dir).collect():
            if r["n_dup_keys"] == 0:
                flag = ""
            elif r["tbl"] in known_nonunique:
                flag = "  (known synthetic-data property)"
            else:
                flag = "  <-- VIOLATION"
                bad += r["n_dup_keys"]
            print(f"{r['tbl']:12s} rows={r['n_rows']:>10d} "
                  f"dup_keys={r['n_dup_keys']} "
                  f"excess={r['n_excess_rows']}{flag}")
        print("== order reconciliation ==")
        for r in order_consistency_audit(spark, args.sf_dir).collect():
            print(f"status={r['o_orderstatus']} orders={r['n_orders']} "
                  f"no_lines={r['n_no_lines']} "
                  f"mismatch_gt1pct={r['n_mismatch']} "
                  f"max_drift_cents={r['max_abs_diff_cents']}")
        print("== sketch/index quality gates ==")
        from .llm.dedup import minhash_accuracy_floor
        from .llm.similarity import ann_recall_floor
        from .llm.distributions import pca_projection_floor
        from .llm.sketches import (cms_accuracy_floor, kmv_accuracy_floor,
                                   sketch_fold_identity_floor)
        from .operators.bloom import bloom_filter_floor
        from .plans.warehouse import (approx_quantile_accuracy_floor,
                                      hll_distinct_accuracy_floor)
        for gate_name, gate_fn in [
            ("ann_recall_floor", ann_recall_floor),
            ("minhash_accuracy_floor", minhash_accuracy_floor),
            ("approx_quantile_accuracy_floor",
             approx_quantile_accuracy_floor),
            ("hll_distinct_accuracy_floor", hll_distinct_accuracy_floor),
            ("cms_accuracy_floor", cms_accuracy_floor),
            ("kmv_accuracy_floor", kmv_accuracy_floor),
            ("bloom_filter_floor", bloom_filter_floor),
            ("pca_projection_floor", pca_projection_floor),
            ("sketch_fold_identity_floor", sketch_fold_identity_floor),
        ]:
            row = gate_fn(spark, args.sf_dir).collect()[0].asDict()
            fails = [k for k, v in row.items() if v is False]
            bad += len(fails)
            state = "OK" if not fails else f"VIOLATION {fails}"
            print(f"{gate_name:35s} {state}")
        # per-key incremental HLL gate (one boolean per (type, day))
        from .streaming.distinct_users import (
            events_distinct_users_incremental)
        misses = [r for r in events_distinct_users_incremental(
            spark, args.sf_dir).collect() if not r["within_gate"]]
        bad += len(misses)
        print(f"{'events_distinct_users_incremental':35s} "
              + ("OK" if not misses else
                 f"VIOLATION {[(r['event_type'], str(r['day'])) for r in misses[:5]]}"))
        print("== dimension entity duplicates (informational) ==")
        from .plans.audits import entity_dedup_parts
        dup_rows = entity_dedup_parts(spark, args.sf_dir).collect()
        n_extra = sum(r["n_parts"] - 1 for r in dup_rows)
        print(f"duplicate part-name groups: {len(dup_rows)} "
              f"(redundant keys: {n_extra}); largest: "
              + ", ".join(f"{r['name_signature']}×{r['n_parts']}"
                          for r in dup_rows[:3]))
        spark.stop()
        print("HEALTHCHECK", "FAIL" if bad else "OK")
        return 1 if bad else 0

    if args.query not in registry.REGISTRY:
        print(f"unknown query {args.query!r}; try 'list'", file=sys.stderr)
        return 2

    from .session import get_spark
    spark = get_spark("dwps-cli")
    fn, _ = registry.REGISTRY[args.query]
    df = fn(spark, args.sf_dir)
    if args.cmd == "run":
        df.show(args.limit, truncate=False)
    else:
        df.explain("formatted")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

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

    args = parser.parse_args(argv)

    from . import registry
    if args.cmd == "list":
        for name, (_, sql) in sorted(registry.REGISTRY.items()):
            kind = "oracle" if sql else "rows-only"
            print(f"{name:35s} [{kind}]")
        return 0

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

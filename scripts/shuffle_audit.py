"""Shuffle-volume regression gate — the scale-killer tripwire.

Wall-clock at local test sizes is dominated by fixed per-job cost and
the page cache, so an accidental broadcast→shuffle flip, a dropped
guard on a pair fan-out, or an unpushed filter can hide inside
wall-clock noise for rounds. Shuffle BYTES can't: they are
deterministic given the data and the plan (AQE varies partition
counts, never totals), and they move if and only if the plan's
exchange structure moves.

This sweep runs every headline query at a small sf (default sf0.001),
samples its per-run shuffle-write and spill bytes from the
AppStatusStore (data_warehouse_project_spark/metrics.py), and gates
them against the recorded bounds in tests/shuffle_bounds.json:

- shuffle_write_bytes must stay <= recorded * HEADROOM (2.5x — wide
  enough for partition-count framing differences across local[N]
  sizes and Spark point releases, narrow enough that any structural
  plan change trips it: the round-10 audit measured 10x data moving
  bytes by 8-12x, so a single lost guard or broadcast blows through
  2.5x immediately);
- spilled_bytes must be exactly 0 (nothing in the suite spills at
  measured scales; a spill at sf0.001 means a partitioning bug).

Usage:
  python scripts/shuffle_audit.py [sf_dir]            # gate
  python scripts/shuffle_audit.py [sf_dir] --record   # (re)write bounds

Exit code 1 on any violation. Re-record ONLY alongside a reviewed
plan change — the diff of tests/shuffle_bounds.json is then the
reviewable artifact of the exchange-structure change.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from data_warehouse_project_spark import registry  # noqa: E402
from data_warehouse_project_spark.metrics import (  # noqa: E402
    measure_query_shuffle)
from data_warehouse_project_spark.session import get_spark  # noqa: E402

HEADROOM = 2.5
BOUNDS_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "shuffle_bounds.json")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    record = "--record" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    spark = get_spark("shuffle-audit")
    qs = registry.queries()
    measured: dict[str, dict[str, int]] = {}
    for name in HEADLINE:
        measured[name] = measure_query_shuffle(spark, qs[name], sf_dir)
        print(f"# {name}: write={measured[name]['shuffle_write_bytes']:,}B "
              f"spill={measured[name]['spilled_bytes']:,}B", file=sys.stderr)
    spark.stop()

    if record:
        with open(BOUNDS_PATH, "w") as f:
            json.dump({"sf_dir_basename": os.path.basename(sf_dir.rstrip("/")),
                       "headroom": HEADROOM,
                       "bounds": {n: m["shuffle_write_bytes"]
                                  for n, m in measured.items()}},
                      f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"recorded {len(measured)} bounds -> {BOUNDS_PATH}")
        return 0

    with open(BOUNDS_PATH) as f:
        rec = json.load(f)
    bounds = rec["bounds"]
    violations = []
    for name, m in measured.items():
        if m["spilled_bytes"] > 0:
            violations.append((name, "SPILL", m["spilled_bytes"], 0))
        bound = bounds.get(name)
        if bound is None:
            violations.append((name, "UNRECORDED", m["shuffle_write_bytes"],
                               None))
        # absolute floor of 64 KiB: below it, per-partition framing
        # noise dwarfs the signal and no scale-killer hides in it
        elif m["shuffle_write_bytes"] > max(bound * HEADROOM, 65536):
            violations.append((name, "SHUFFLE", m["shuffle_write_bytes"],
                               bound))
    print(json.dumps({"checked": len(measured),
                      "violations": [
                          {"query": q, "kind": k, "got": g, "bound": b}
                          for q, k, g, b in violations]}))
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())

"""In-suite slice of the shuffle-volume regression gate
(scripts/shuffle_audit.py runs the full headline sweep; this keeps
the highest-risk plans gated on every pytest run).

Shuffle bytes are deterministic given data + plan, so unlike wall
time they are assertable on a loaded host. The queries here are the
ones whose scale story RESTS on an exchange-bounding device — a
dropped guard or a broadcast→shuffle flip moves their bytes far past
the 2.5x headroom (the round-10 audit measured 10x data moving bytes
8-12x, so a structural change cannot hide under 2.5x):

- part_affinity_topk / part_market_basket: basket-size guards bound
  the pair fan-out;
- dedup_ngram_jaccard: the hot-shingle df-cap bounds the blocking
  join;
- part_triangle_participation: degree orientation bounds the wedge
  count at sum(outdeg^2) ~ O(m^1.5);
- part_copurchase_pagerank: rank vectors broadcast, only (dst,
  partial) aggregates shuffle;
- flagship_my_registrations: dims broadcast, one fact exchange.

Spill must be exactly zero — nothing in the suite spills at test
scales; any spill at sf0.001 is a partitioning bug, not a tuning
matter.
"""

from __future__ import annotations

import json
import os

import pytest

from data_warehouse_project_spark import registry
from data_warehouse_project_spark.metrics import measure_query_shuffle

BOUNDS_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "shuffle_bounds.json")

GATED = [
    "part_affinity_topk",
    "part_market_basket",
    "dedup_ngram_jaccard",
    "part_triangle_participation",
    "part_copurchase_pagerank",
    "flagship_my_registrations",
]


@pytest.fixture(scope="module")
def bounds():
    with open(BOUNDS_PATH) as f:
        rec = json.load(f)
    assert rec["sf_dir_basename"] == "sf0.001"
    return rec["bounds"], rec["headroom"]


@pytest.mark.parametrize("name", GATED)
def test_shuffle_volume_within_bounds(spark, sf_dir, name, bounds):
    bound_map, headroom = bounds
    m = measure_query_shuffle(spark, registry.queries()[name], sf_dir)
    assert m["spilled_bytes"] == 0, m
    # 64 KiB absolute floor: below it per-partition framing noise
    # dwarfs the signal (same rule as the full sweep)
    limit = max(bound_map[name] * headroom, 65536)
    assert m["shuffle_write_bytes"] <= limit, (
        name, m["shuffle_write_bytes"], bound_map[name])


def test_bounds_cover_every_headline_query():
    # the recorded bounds file must stay in lockstep with bench.py's
    # headline list — an unrecorded new query would silently escape
    # the full sweep's gate
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import HEADLINE
    with open(BOUNDS_PATH) as f:
        rec = json.load(f)
    missing = [q for q in HEADLINE if q not in rec["bounds"]]
    assert not missing, missing

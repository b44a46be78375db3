"""Semantic unit tests for the graph + exact-time-series operators
(plans/graph.py, plans/timeseries.py) — invariants the parity suite
can't express: PageRank on a hand-computable graph, the basket guard,
zero-fill on spine gaps, and the trailing dyadic-WMA closed form."""

from __future__ import annotations

import math

from pyspark.sql import Row, functions as F

from data_warehouse_project_spark.plans.graph import (
    MAX_BASKET, PR_SCALE, copurchase_edges, pagerank_topk)
from data_warehouse_project_spark.plans.timeseries import (
    WMA_DENOM, WMA_LAGS, hourly_dense_counts, wma_hourly)


def _lineitem(spark, orders):
    """orders: list of (orderkey, [partkeys])."""
    rows = [Row(l_orderkey=ok, l_partkey=pk)
            for ok, parts in orders for pk in parts]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def _part(spark, keys):
    return spark.createDataFrame(
        [Row(p_partkey=k, p_name=f"part {k}") for k in keys],
        "p_partkey long, p_name string")


def test_copurchase_edges_distinct_and_guarded(spark):
    li = _lineitem(spark, [
        (1, [10, 11, 10]),          # dup line collapses
        (2, [10, 11]),              # repeat pair collapses
        (3, list(range(100, 100 + MAX_BASKET + 5))),  # over guard: dropped
        (4, [12]),                  # singleton: no pairs
    ])
    edges = {(r.src, r.dst) for r in copurchase_edges(li).collect()}
    assert edges == {(10, 11), (11, 10)}


def test_pagerank_star_graph_hand_computed(spark):
    """Star: hub 1 co-ordered with 2, 3, 4 pairwise-only (three
    2-item orders) — hub has deg 3, leaves deg 1. One iteration from
    uniform SCALE, mirroring the engine's exact op order:
    floor(rank/deg) then floor(s * 0.85)."""
    li = _lineitem(spark, [(1, [1, 2]), (2, [1, 3]), (3, [1, 4])])
    out = {r.p_partkey: r.pagerank_scaled
           for r in pagerank_topk(li, _part(spark, [1, 2, 3, 4]),
                                  iters=1, k=10).collect()}
    base = int(0.15 * PR_SCALE)
    hub_s = 3 * math.floor(PR_SCALE / 1)
    hub = base + math.floor(hub_s * 0.85)
    leaf_s = math.floor(PR_SCALE / 3)
    leaf = base + math.floor(leaf_s * 0.85)
    assert out[1] == hub
    assert out[2] == out[3] == out[4] == leaf
    assert out[1] > out[2]          # hub outranks leaves


def test_pagerank_symmetric_triangle_ties_break_by_key(spark):
    """Symmetric triangle: all nodes tie at (approx) SCALE every
    iteration; output ordering falls back to partkey."""
    li = _lineitem(spark, [(1, [7, 8, 9])])
    rows = pagerank_topk(li, _part(spark, [7, 8, 9]), iters=3,
                         k=10).collect()
    assert [r.p_partkey for r in rows] == [7, 8, 9]
    assert len({r.pagerank_scaled for r in rows}) == 1
    assert abs(rows[0].pagerank_scaled - PR_SCALE) <= 2


def test_label_propagation_disjoint_cliques_converge_to_min_id(spark):
    from data_warehouse_project_spark.plans.graph import (
        label_propagation_communities)

    # two disjoint triangles: a clique converges to its min id within
    # 3 synchronous rounds (r1: min other; r2/r3: plurality of min)
    # every basket twice: LP_MIN_WEIGHT = 2 keeps only repeat
    # co-purchases, so single-occurrence pairs must NOT form edges —
    # basket 400 appears once and its parts must be absent entirely
    li = _lineitem(spark, [(100, [1, 2, 3]), (101, [1, 2, 3]),
                           (200, [10, 11, 12]), (201, [10, 11, 12]),
                           (400, [90, 91])])
    rows = {(r["community"], r["n_members"], r["min_member"])
            for r in label_propagation_communities(li).collect()}
    assert rows == {(1, 3, 1), (10, 3, 10)}


def test_label_propagation_star_oscillation_is_pinned(spark):
    from data_warehouse_project_spark.plans.graph import (
        label_propagation_communities)

    # star 5-(6,7): synchronous LPA oscillates; after exactly 3
    # pinned rounds the labels are {5: 6, 6: 5, 7: 5} — the point of
    # pinned-round semantics is that this is DETERMINISTIC, and the
    # oracle unrolls the same 3 rounds
    li = _lineitem(spark, [(300, [5, 6]), (301, [5, 6]),
                           (302, [5, 7]), (303, [5, 7])])
    rows = {(r["community"], r["n_members"], r["min_member"])
            for r in label_propagation_communities(li).collect()}
    assert rows == {(5, 2, 6), (6, 1, 5)}


def _events(spark, rows):
    df = spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=1, event_type=t,
             value=1.0, props="{}")
         for i, (t, ts) in enumerate(rows)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    return df


def test_hourly_dense_counts_zero_fills_gaps(spark):
    rows = [("click", "2024-01-01 00:10:00"),
            ("click", "2024-01-01 00:20:00"),
            # hour 01 missing entirely
            ("click", "2024-01-01 02:05:00"),
            ("view", "2024-01-01 02:30:00")]
    dense = hourly_dense_counts(_events(spark, rows))
    got = {(r.event_type, r.h.hour): r.x for r in dense.collect()}
    # 3-hour spine x 2 types = 6 cells
    assert len(got) == 6
    assert got[("click", 0)] == 2
    assert got[("click", 1)] == 0
    assert got[("click", 2)] == 1
    assert got[("view", 0)] == 0
    assert got[("view", 2)] == 1


def test_wma_closed_form_on_constant_and_spike(spark):
    """13 hours of a constant rate c=3 -> trailing WMA == 3 exactly
    at hour 12; a 36-event hour 13 is > 2x its trailing baseline."""
    rows = []
    for h in range(13):
        for i in range(3):
            rows.append(("click", f"2024-01-01 {h:02d}:0{i}:00"))
    for i in range(36):
        rows.append(("click", f"2024-01-01 13:{i:02d}:00"))
    out = wma_hourly(_events(spark, rows)).collect()
    # spine hours 0..13; rows emitted from hour 12 (13th spine hour)
    by_hour = {r.h.hour: r for r in out}
    assert sorted(by_hour) == [12, 13]
    assert by_hour[12].wma == 3.0 and not by_hour[12].is_spike
    spike = by_hour[13]
    assert spike.n_events == 36
    # trailing lags at hour 13 are hours 12..1, all 3 -> wma == 3
    assert spike.wma == 3.0
    assert spike.is_spike           # 36 > 2 * 3


def test_wma_lag_distance_is_wall_clock(spark):
    """A type absent for 12 straight hours has a ZERO trailing
    baseline (spine semantics), not its last observed values."""
    rows = [("view", "2024-01-01 00:00:00")]
    # keep the spine alive with another type every hour
    for h in range(1, 14):
        rows.append(("click", f"2024-01-01 {h:02d}:00:00"))
    out = {r.event_type: r for r in
           wma_hourly(_events(spark, rows)).collect()
           if r.h.hour == 13}
    # view's single hour-0 event is lag 13 at hour 13: out of window.
    assert out["view"].wma == 0.0
    assert out["view"].n_events == 0
    assert not out["view"].is_spike     # 0 > 0 is false
    # click: hours 12..1 all have exactly 1 -> wma exactly 1.
    assert out["click"].wma == 1.0
    assert not out["click"].is_spike    # 1 > 2 is false


def test_wma_requires_full_trailing_window(spark):
    """No rows before the 13th spine hour of a type."""
    rows = [("click", f"2024-01-01 {h:02d}:00:00") for h in range(12)]
    assert wma_hourly(_events(spark, rows)).count() == 0
    rows.append(("click", "2024-01-01 12:00:00"))
    out = wma_hourly(_events(spark, rows)).collect()
    assert len(out) == 1 and out[0].wma == 1.0 and out[0].h.hour == 12


def test_wma_constants(spark):
    assert WMA_LAGS == 12 and WMA_DENOM == 4095


def test_seasonal_baseline_median_and_spike(spark):
    """Three weeks; one hour-of-week slot has counts [2, 2, 8]:
    discrete median 2, the 8-event week flags (8 > 2*2); slots with
    [2, 2, 2] never flag; hours 168h apart share one baseline."""
    from data_warehouse_project_spark.plans.timeseries import (
        seasonal_baseline)
    rows = []
    for week in range(3):
        day = 1 + 7 * week
        n = 8 if week == 2 else 2
        for i in range(n):                      # target slot: 00:xx
            rows.append(("click", f"2024-01-{day:02d} 00:{i:02d}:00"))
        for i in range(2):                      # control slot: 01:xx
            rows.append(("click", f"2024-01-{day:02d} 01:{i:02d}:00"))
    out = seasonal_baseline(_events(spark, rows)).collect()
    by = {(r.h.day, r.h.hour): r for r in out}
    # target slot: median of [2, 2, 8] = 2 for all three weeks
    for day in (1, 8, 15):
        assert by[(day, 0)].seasonal_med == 2
    assert not by[(1, 0)].is_spike and not by[(8, 0)].is_spike
    assert by[(15, 0)].is_spike                 # 8 > 2*max(2,1)
    # control slot: [2, 2, 2] -> median 2, no flags
    for day in (1, 8, 15):
        assert by[(day, 1)].seasonal_med == 2
        assert not by[(day, 1)].is_spike
    # zero-filled hours participate: hour 02 of week 1 has x=0 and a
    # zero baseline (its weekly samples are all zero-filled)
    assert by[(1, 2)].n_events == 0
    assert by[(1, 2)].seasonal_med == 0
    assert not by[(1, 2)].is_spike              # 0 > 2*max(0,1) false


def test_seasonal_baseline_zero_week_drags_median(spark):
    """A one-week outage (zero-filled) enters the sample: counts
    [4, 0, 4] -> discrete median (rank ceil(3/2)=2 of sorted
    [0, 4, 4]) = 4; spike rule compares against 4, not the mean."""
    from data_warehouse_project_spark.plans.timeseries import (
        seasonal_baseline)
    rows = []
    for week in (0, 2):
        day = 1 + 7 * week
        for i in range(4):
            rows.append(("click", f"2024-01-{day:02d} 00:{i:02d}:00"))
    # keep the spine alive over the silent middle week
    rows.append(("view", "2024-01-08 00:00:00"))
    out = seasonal_baseline(_events(spark, rows)).collect()
    by = {(r.event_type, r.h.day, r.h.hour): r for r in out}
    assert by[("click", 1, 0)].seasonal_med == 4
    assert by[("click", 8, 0)].n_events == 0
    assert by[("click", 8, 0)].seasonal_med == 4


def test_part_affinity_hand_computed(spark):
    """Two 3-item orders {1,2,3} and {1,4,5}: all neighbor lists are
    under the cap, so heads = full neighbor sets and the capped
    cosine is the plain shared-neighbor cosine — hand-checkable."""
    from data_warehouse_project_spark.plans.graph import affinity_topk
    li = _lineitem(spark, [(1, [1, 2, 3]), (2, [1, 4, 5])])
    rows = affinity_topk(li, k=100).collect()
    got = {(r.part_a, r.part_b): (r.n_common, r.affinity) for r in rows}
    # N(2)={1,3}, N(3)={1,2}: common={1}... plus is (2,3) an edge?
    # Edges don't matter — candidates come only from shared contexts.
    # (2,3) share context 1 -> common 1, cos = 1/sqrt(2*2) = 0.5
    assert got[(2, 3)] == (1, 0.5)
    assert got[(4, 5)] == (1, 0.5)
    # (2,4) share only context 1 -> cos = 0.5 as well
    assert got[(2, 4)] == (1, 0.5)
    # (1,2): contexts are 3 (N(3)={1,2}) -> common 1,
    # |head(1)|=4, |head(2)|=2 -> cos = 1/sqrt(8)
    assert got[(1, 2)][0] == 1
    assert abs(got[(1, 2)][1] - 1 / (8 ** 0.5)) < 1e-6
    # every candidate pair shares at least one context node
    assert all(v[0] >= 1 for v in got.values())


def test_revenue_trend_recovers_planted_line(spark, tmp_path):
    """Exact linear daily revenue (100 + 7*d dollars) -> OLS recovers
    slope 700 cents/day and intercept 10000 cents exactly; the 7-day
    projection matches the closed form."""
    from pyspark.sql import Row

    from data_warehouse_project_spark.plans.timeseries import (
        orders_revenue_trend)
    rows = []
    for d in range(30):
        rows.append(Row(
            o_orderkey=d, o_custkey=1, o_orderstatus="F",
            o_totalprice=float(100 + 7 * d),
            o_orderdate=f"2024-01-{d + 1:02d} 00:00:00",
            o_orderpriority="1-URGENT"))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate string, "
              "o_orderpriority string")
    df = df.withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    df.write.parquet(str(tmp_path / "orders.parquet"))
    out = orders_revenue_trend(spark, str(tmp_path)).collect()[0]
    assert out.n_days == 30
    assert out.slope_cents_per_day == 700.0
    assert out.intercept_cents == 10000.0
    # next 7 days are d=30..36: sum(10000 + 700 d) = 7*10000 + 700*231
    assert out.next_7d_cents == 7 * 10000 + 700 * 231


def test_revenue_trend_projection_respects_gap_days(spark, tmp_path):
    """Sparse series: orders only on day indices 0 and 10 -> the
    forecast window starts at index 11 (after the LAST observed
    day), not at index 2 (the populated-day count)."""
    from pyspark.sql import Row

    from data_warehouse_project_spark.plans.timeseries import (
        orders_revenue_trend)
    rows = [Row(o_orderkey=1, o_custkey=1, o_orderstatus="F",
                o_totalprice=100.0,
                o_orderdate="2024-01-01 00:00:00",
                o_orderpriority="1-URGENT"),
            Row(o_orderkey=2, o_custkey=1, o_orderstatus="F",
                o_totalprice=200.0,
                o_orderdate="2024-01-11 00:00:00",
                o_orderpriority="1-URGENT")]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate string, "
              "o_orderpriority string")
    df = df.withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    df.write.parquet(str(tmp_path / "orders.parquet"))
    out = orders_revenue_trend(spark, str(tmp_path)).collect()[0]
    # exact line through (0, 10000), (10, 20000): slope 1000, a 10000
    assert out.n_days == 2
    assert out.slope_cents_per_day == 1000.0
    assert out.intercept_cents == 10000.0
    # days 11..17: sum(10000 + 1000 d) = 7*10000 + 1000*98
    assert out.next_7d_cents == 7 * 10000 + 1000 * 98


# --------------------------------------------------------------------------
# Property tests: Spark plans vs pure-Python reference models
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st

#: random small basket lists: up to 8 orders of up to 5 parts from a
#: 10-part universe (dense enough for real graphs, small enough that
#: the reference model is obviously correct)
_orders_strategy = st.lists(
    st.lists(st.integers(1, 10), min_size=1, max_size=5),
    min_size=1, max_size=8)


def _pagerank_reference(orders, iters):
    """The exact integer recurrence, in plain Python."""
    import math
    from data_warehouse_project_spark.plans.graph import PR_SCALE
    edges = set()
    for parts in orders:
        ps = set(parts)
        if len(ps) > 30:
            continue
        for a in ps:
            for b in ps:
                if a != b:
                    edges.add((a, b))
    if not edges:
        return {}
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    rank = {n: PR_SCALE for n in deg}
    base = int(0.15 * PR_SCALE)
    for _ in range(iters):
        contrib = {n: math.floor(rank[n] / deg[n]) for n in deg}
        s = {n: 0 for n in deg}
        for a, b in edges:
            s[b] += contrib[a]
        rank = {n: base + math.floor(s[n] * 0.85) for n in deg}
    return rank


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(orders=_orders_strategy, iters=st.integers(1, 3))
def test_pagerank_matches_python_reference(spark, orders, iters):
    from data_warehouse_project_spark.plans.graph import pagerank_topk
    li = _lineitem(spark, list(enumerate(orders)))
    expected = _pagerank_reference(orders, iters)
    got = {r.p_partkey: r.pagerank_scaled
           for r in pagerank_topk(li, _part(spark, list(range(1, 11))),
                                  iters=iters, k=100).collect()}
    assert got == expected, (orders, iters)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(counts=st.lists(st.integers(0, 20), min_size=13, max_size=20))
def test_wma_matches_python_reference(spark, counts):
    """Random hourly series (hour i has counts[i] events) vs the
    closed-form trailing dyadic WMA in plain Python."""
    from data_warehouse_project_spark.plans.timeseries import (
        WMA_DENOM, WMA_LAGS, wma_hourly)
    rows = []
    # hour 0 and the last hour must be non-empty to pin the spine
    counts = [max(counts[0], 1)] + counts[1:-1] + [max(counts[-1], 1)]
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append(("click", f"2024-01-01 {h:02d}:{i:02d}:00"))
    out = {r.h.hour: r for r in wma_hourly(_events(spark, rows)).collect()}
    for t in range(WMA_LAGS, len(counts)):
        num = sum(counts[t - j] << (WMA_LAGS - j)
                  for j in range(1, WMA_LAGS + 1))
        assert out[t].n_events == counts[t]
        assert out[t].wma == round(num / WMA_DENOM, 6) or \
            abs(out[t].wma - num / WMA_DENOM) < 1e-6
        assert out[t].is_spike == (counts[t] * WMA_DENOM > 2 * num)
    assert set(out) == set(range(WMA_LAGS, len(counts)))


def test_disorder_report_planted_late_arrivals(spark, tmp_path):
    """Planted disorder: on shard 0, an event with a HIGHER event_id
    carries an EARLIER event-time -> its lateness is the gap to the
    shard high-watermark; in-order events report 0."""
    from pyspark.sql import Row

    from data_warehouse_project_spark.plans.timeseries import (
        DISORDER_SHARDS, events_disorder_report)
    S = DISORDER_SHARDS
    rows = [
        # shard 0 arrivals: t=100, t=400, then a LATE one at t=160
        Row(event_id=0 * S, ts="2024-01-01 00:01:40", event_type="click"),
        Row(event_id=1 * S, ts="2024-01-01 00:06:40", event_type="click"),
        Row(event_id=2 * S, ts="2024-01-01 00:02:40", event_type="click"),
        # shard 1: perfectly ordered views
        Row(event_id=0 * S + 1, ts="2024-01-01 00:00:10", event_type="view"),
        Row(event_id=1 * S + 1, ts="2024-01-01 00:00:20", event_type="view"),
    ]
    df = spark.createDataFrame(
        [(r.event_id, r.ts, 1, r.event_type, 1.0, "{}") for r in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {r.event_type: r for r in
           events_disorder_report(spark, str(tmp_path)).collect()}
    click = out["click"]
    # one late click: hwm 400 - its own 160 = 240 s
    assert click.n_events == 3 and click.n_late == 1
    assert click.max_late_s == 240
    assert click.p50_late_s == 0          # majority in-order
    assert click.p95_late_s == 240        # rank ceil(.95*3)=3 -> 240
    view = out["view"]
    assert view.n_late == 0 and view.max_late_s == 0


def test_pagerank_empty_and_singleton_graphs(spark):
    """No co-purchases at all (every order is a singleton) -> empty
    result, no crash; guard-excluded mega-order contributes nothing."""
    from data_warehouse_project_spark.plans.graph import (
        MAX_BASKET, pagerank_topk)
    li = _lineitem(spark, [(1, [1]), (2, [2]),
                           (3, list(range(50, 50 + MAX_BASKET + 2)))])
    assert pagerank_topk(li, _part(spark, [1, 2]), iters=2,
                         k=10).count() == 0


def test_affinity_requires_shared_context(spark):
    """Candidates come only from a shared THIRD neighbor: a 2-item
    order's pair has no common context -> no candidate at all (the
    semantic difference vs part_market_basket, which counts direct
    co-occurrence); a 3-item order yields all three within-order
    pairs, each through the remaining item."""
    from data_warehouse_project_spark.plans.graph import affinity_topk
    li = _lineitem(spark, [(1, [1, 2]), (2, [3, 4])])
    assert affinity_topk(li, k=50).count() == 0
    li3 = _lineitem(spark, [(1, [5, 6, 7])])
    got = {(r.part_a, r.part_b) for r in
           affinity_topk(li3, k=50).collect()}
    assert got == {(5, 6), (5, 7), (6, 7)}


def test_reach_hops_path_graph(spark):
    """Path graph 1-2-3-4 (three 2-item orders): BFS from seed 1
    first-reaches exactly one node per hop."""
    from data_warehouse_project_spark.plans.graph import reach_hops
    li = _lineitem(spark, [(1, [1, 2]), (2, [2, 3]), (3, [3, 4])])
    got = [(r.hop, r.n_first_reached)
           for r in reach_hops(li, hops=3).collect()]
    assert got == [(0, 1), (1, 1), (2, 1), (3, 1)]
    # depth-limited: hops=1 sees only the seed's neighbors
    got1 = [(r.hop, r.n_first_reached)
            for r in reach_hops(li, hops=1).collect()]
    assert got1 == [(0, 1), (1, 1)]


def test_reach_hops_edgeless_graph_is_empty(spark):
    """No co-purchases at all -> zero rows, not a phantom NULL seed
    counted at hop 0."""
    from data_warehouse_project_spark.plans.graph import reach_hops
    li = _lineitem(spark, [(1, [1]), (2, [2])])
    assert reach_hops(li, hops=2).count() == 0


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(counts=st.lists(st.integers(0, 9), min_size=2, max_size=40))
def test_seasonal_baseline_matches_python_reference(spark, counts):
    """Random hourly series vs a plain-Python hour-of-week median
    model (rank ceil(n/2) of the sorted per-slot samples, zero-fill
    included)."""
    import math

    from data_warehouse_project_spark.plans.timeseries import (
        seasonal_baseline)
    counts = [max(counts[0], 1)] + counts[1:-1] + [max(counts[-1], 1)]
    rows = []
    for h, c in enumerate(counts):
        day, hr = 1 + h // 24, h % 24
        for i in range(c):
            rows.append(("click", f"2024-01-{day:02d} {hr:02d}:{i:02d}:00"))
    out = {(r.h.day - 1) * 24 + r.h.hour: r
           for r in seasonal_baseline(_events(spark, rows)).collect()}
    # python model: slot = epoch-hour mod 168; the series starts at
    # 2024-01-01 00:00 UTC whose epoch-hour mod 168 is a constant
    # offset — compute it from the first emitted row instead of
    # hardcoding calendar math
    import calendar
    import datetime as dt
    base = calendar.timegm(dt.datetime(2024, 1, 1).timetuple()) // 3600
    slots = {}
    for h, c in enumerate(counts):
        slots.setdefault((base + h) % 168, []).append((h, c))
    for slot, members in slots.items():
        xs = sorted(c for _, c in members)
        med = xs[math.ceil(len(xs) / 2) - 1]
        for h, c in members:
            assert out[h].seasonal_med == med, (h, counts)
            assert out[h].n_events == c
            assert out[h].is_spike == (c > 2 * max(med, 1))
    assert len(out) == len(counts)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(users=st.lists(st.integers(1, 8), min_size=1, max_size=30),
       split=st.integers(0, 29))
def test_hll_state_split_invariance(spark, users, split):
    """Incremental HLL distinct-users state is split-invariant: ANY
    two-batch split of the event list merges to the same estimates
    as a single-pass sketch (and small counts are exact)."""
    import datetime as dt

    from pyspark.sql import Row

    from data_warehouse_project_spark.streaming import distinct_users

    rows = [Row(user_id=u, event_id=i,
                ts=dt.datetime(2024, 1, 1 + (i % 2), 9),
                event_type="click")
            for i, u in enumerate(users)]
    schema = "user_id long, event_id long, ts timestamp, event_type string"
    split = min(split, len(rows))
    first = spark.createDataFrame(rows[:split] or rows[:1], schema)
    if not rows[:split]:
        first = first.filter("false")
    second = spark.createDataFrame(rows[split:] or rows[:1], schema)
    if not rows[split:]:
        second = second.filter("false")
    merged = distinct_users.merge_distinct_state(
        distinct_users.distinct_state(first), second)
    got = {(r.day.day, ): r.approx_users for r in
           distinct_users.state_to_estimates(merged).collect()}
    single = {(r.day.day, ): r.approx_users for r in
              distinct_users.state_to_estimates(
                  distinct_users.distinct_state(
                      spark.createDataFrame(rows, schema))).collect()}
    assert got == single
    # exact at these cardinalities: compare against the true distincts
    exact = {}
    for i, u in enumerate(users):
        exact.setdefault(1 + (i % 2), set()).add(u)
    assert got == {(d, ): len(s) for d, s in exact.items()}


def test_type_mix_monthly_two_month_shift(spark, tmp_path):
    """Planted mix shift: Jan is 75% view / 25% click, Feb flips to
    25% / 75% — deltas are ±0.5 in Feb and 0 in the first month
    (self-coalesced). Driver data spans one month, so this fixture
    keeps the LAG path non-vacuous."""
    from pyspark.sql import Row

    from data_warehouse_project_spark.plans.timeseries import (
        events_type_mix_monthly)
    rows, i = [], 0
    for month, views, clicks in ((1, 3, 1), (2, 1, 3)):
        for t, n in (("view", views), ("click", clicks)):
            for _ in range(n):
                rows.append(Row(event_id=i, ts=f"2024-{month:02d}-05 "
                                f"0{i % 10}:00:00", user_id=1,
                                event_type=t, value=1.0, props="{}"))
                i += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
              "event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {(r.month.month, r.event_type): r for r in
           events_type_mix_monthly(spark, str(tmp_path)).collect()}
    assert out[(1, "view")].share == 0.75
    assert out[(1, "view")].share_delta == 0.0
    assert out[(2, "view")].share == 0.25
    assert out[(2, "view")].share_delta == -0.5
    assert out[(2, "click")].share_delta == 0.5


def test_triangle_participation_hand_computed(spark):
    """Planted 4-node fixture: baskets {1,2,3}, {2,3,4}, {1,4} give
    exactly four triangles ({123},{234},{124},{134} — the last two
    close through the 1-4 edge), so every node participates in 3.
    A 31-part mega-order must be dropped by the basket guard and
    contribute nothing."""
    from data_warehouse_project_spark.plans.graph import (
        MAX_BASKET, triangle_participation)

    rows = ([(1, p) for p in (1, 2, 3)]
            + [(2, p) for p in (2, 3, 4)]
            + [(3, p) for p in (1, 4)]
            + [(9, 100 + i) for i in range(MAX_BASKET + 1)])
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    part = spark.createDataFrame(
        [(p, f"part {p}") for p in range(1, 5)]
        + [(100 + i, f"mega {i}") for i in range(MAX_BASKET + 1)],
        "p_partkey long, p_name string")
    got = {(r["p_partkey"], r["n_triangles"])
           for r in triangle_participation(li, part).collect()}
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}


def _triangle_reference(orders):
    """Brute-force per-node triangle participation in plain Python:
    kept = distinct (order, part) with the basket guard, undirected
    edges from co-purchase pairs, each triangle found once via its
    lexicographically-lowest edge + a higher common neighbor."""
    edges = set()
    for parts in orders:
        ps = sorted(set(parts))
        if len(ps) > MAX_BASKET:
            continue
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:
                for n in (a, b, c):
                    count[n] = count.get(n, 0) + 1
    return count


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(orders=st.lists(st.lists(st.integers(1, 8), max_size=6),
                       max_size=10))
def test_triangle_participation_matches_python_reference(spark, orders):
    """Random small co-purchase graphs: the Cohen degree-oriented
    wedge enumeration (plans/graph.py:431) must count per-node
    triangle participation exactly like the O(m·n) brute force —
    the orientation/tie-break/closing-join machinery cannot change
    the answer, only the cost."""
    from data_warehouse_project_spark.plans.graph import (
        triangle_participation)
    li = _lineitem(spark, list(enumerate(orders)))
    expected = _triangle_reference(orders)
    got = {r["p_partkey"]: r["n_triangles"]
           for r in triangle_participation(
               li, _part(spark, list(range(1, 9))), k=100).collect()}
    assert got == expected, orders


def _reach_reference(orders, hops):
    """Plain-Python BFS from min co-purchase node: per-hop count of
    first-reached parts, hop 0 = the seed."""
    edges = set()
    for parts in orders:
        ps = set(parts)
        if len(ps) > MAX_BASKET:
            continue
        for a in ps:
            for b in ps:
                if a != b:
                    edges.add((a, b))
    if not edges:
        return {}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    seed = min(a for a, _ in edges)
    visited, frontier = {seed}, {seed}
    counts = {0: 1}
    for h in range(1, hops + 1):
        nxt = set()
        for n in frontier:
            nxt |= adj.get(n, set())
        nxt -= visited
        if nxt:
            counts[h] = len(nxt)
        visited |= nxt
        frontier = nxt
    return counts


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(orders=st.lists(st.lists(st.integers(1, 9), max_size=5),
                       max_size=8),
       hops=st.integers(1, 4))
def test_reach_hops_matches_python_reference(spark, orders, hops):
    """Random co-purchase graphs (edgeless, disconnected, chains
    longer and shorter than the hop budget): the unrolled frontier
    BFS must report exactly the sequential BFS's per-hop
    first-reached counts from the min-key seed."""
    from data_warehouse_project_spark.plans.graph import reach_hops
    li = _lineitem(spark, list(enumerate(orders)))
    got = {r["hop"]: r["n_first_reached"]
           for r in reach_hops(li, hops=hops).collect()}
    assert got == _reach_reference(orders, hops), (orders, hops)


def _affinity_reference(orders, cap):
    """Sequential item-CF replay: weighted co-purchase edges, per-node
    top-cap neighbor heads by (w DESC, partkey), in-membership set
    cosine, 6dp half-up quantization."""
    from collections import Counter
    w = Counter()
    for parts in orders:
        ps = sorted(set(parts))
        if len(ps) > MAX_BASKET:
            continue
        for a in ps:
            for b in ps:
                if a != b:
                    w[(a, b)] += 1
    heads = {}
    for (a, b), n in w.items():
        heads.setdefault(a, []).append((-n, b))
    member = {}
    for c, lst in heads.items():
        for _, b in sorted(lst)[:cap]:
            member.setdefault(b, set()).add(c)
    out = {}
    nodes = sorted(member)
    for i, pa in enumerate(nodes):
        for pb in nodes[i + 1:]:
            common = len(member[pa] & member[pb])
            if common:
                aff = common / math.sqrt(
                    float(len(member[pa]) * len(member[pb])))
                out[(pa, pb)] = (common,
                                 math.floor(aff * 1e6 + 0.5) / 1e6)
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(orders=st.lists(st.lists(st.integers(1, 7), max_size=5),
                       max_size=8))
def test_affinity_matches_python_reference(spark, orders):
    """Random weighted co-purchase graphs with the neighbor cap
    forced to 2 (so head truncation — the operator's scale semantics
    — is actually exercised): the wedge-join item-CF must reproduce
    the sequential capped-head set-cosine model."""
    from unittest import mock

    import data_warehouse_project_spark.plans.graph as G
    li = _lineitem(spark, list(enumerate(orders)))
    with mock.patch.object(G, "AFFINITY_CAP", 2):
        rows = G.affinity_topk(li, k=10_000).collect()
    got = {(r["part_a"], r["part_b"]): (r["n_common"], r["affinity"])
           for r in rows}
    assert got == _affinity_reference(orders, cap=2), orders


def _type_mix_reference(events):
    """Sequential replay: per-(month, type) counts, quantized month
    shares, LAG over this type's OBSERVED months (gap months skip to
    the previous observation), self-coalesced first delta."""
    per = {}
    for m, t in events:
        per[(m, t)] = per.get((m, t), 0) + 1
    tot = {}
    for (m, _), n in per.items():
        tot[m] = tot.get(m, 0) + n
    share = {k: math.floor(n / tot[k[0]] * 1e6 + 0.5) / 1e6
             for k, n in per.items()}
    out = {}
    for t in {t for _, t in events}:
        months = sorted(m for m, tt in per if tt == t)
        prev = None
        for m in months:
            s = share[(m, t)]
            base = prev if prev is not None else s
            out[(m, t)] = (per[(m, t)], s,
                           math.floor((s - base) * 1e6 + 0.5) / 1e6)
            prev = s
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(st.tuples(st.integers(1, 5),
                                 st.sampled_from(["view", "click"])),
                       min_size=1, max_size=25))
def test_type_mix_monthly_matches_python_reference(
        spark, tmp_path_factory, events):
    """Random (month, type) streams — types absent for whole months
    (the LAG must skip gaps, not zero-fill), single-month corpora:
    the mix monitor must match the sequential replay, quantized
    deltas included."""
    from pyspark.sql import Row

    from data_warehouse_project_spark.plans.timeseries import (
        events_type_mix_monthly)
    tmp = tmp_path_factory.mktemp("mix")
    df = spark.createDataFrame(
        [Row(event_id=i, ts=f"2024-{m:02d}-05 03:00:00", user_id=1,
             event_type=t, value=1.0, props="{}")
         for i, (m, t) in enumerate(events)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string").withColumn(
            "ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/events.parquet")
    got = {(r["month"].month, r["event_type"]):
           (r["n_events"], r["share"], r["share_delta"])
           for r in events_type_mix_monthly(spark, str(tmp)).collect()}
    assert got == _type_mix_reference(events), events


def _lpa_reference(orders, iters):
    """Sequential synchronous LPA replay: weighted co-purchase edges
    over the min-weight floor, plurality adoption with (count desc,
    label asc) tie-break, pinned rounds, community rollup."""
    from collections import Counter

    from data_warehouse_project_spark.plans.graph import LP_MIN_WEIGHT
    w = Counter()
    for parts in orders:
        ps = set(parts)
        if len(ps) > MAX_BASKET:
            continue
        for a in ps:
            for b in ps:
                if a != b:
                    w[(a, b)] += 1
    edges = [e for e, n in w.items() if n >= LP_MIN_WEIGHT]
    nodes = sorted({a for a, _ in edges})
    label = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for d in nodes:
            cnt = Counter(label[a] for a, b in edges if b == d)
            new[d] = min((-c, l) for l, c in cnt.items())[1]
        label = new
    comm = {}
    for n, l in label.items():
        size, mn = comm.get(l, (0, n))
        comm[l] = (size + 1, min(mn, n))
    top = sorted(comm, key=lambda l: (-comm[l][0], l))[:25]
    return {l: comm[l] for l in top}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(orders=st.lists(st.lists(st.integers(1, 4), max_size=4),
                       max_size=10),
       iters=st.integers(1, 3))
def test_label_propagation_matches_python_reference(spark, orders,
                                                    iters):
    """Random small co-purchase graphs (min-weight-filtered edge
    sets, oscillation-prone symmetric pairs the pinned rounds make
    deterministic): the broadcast LPA must match the sequential
    synchronous replay community for community."""
    from data_warehouse_project_spark.plans.graph import (
        label_propagation_communities)
    li = _lineitem(spark, list(enumerate(orders)))
    got = {r["community"]: (r["n_members"], r["min_member"])
           for r in label_propagation_communities(
               li, iters=iters, k=25).collect()}
    assert got == _lpa_reference(orders, iters), (orders, iters)

"""Semantic unit tests for Markov removal-effect attribution
(plans/attribution.py, round 7): a fully hand-computed chain, the
journey-truncation and edge-journey semantics of the distributed
transition miner, NULL-user exclusion, and the zero-conversion
degenerate case.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Row

from data_warehouse_project_spark.plans.attribution import (
    _MK_SCALE, journey_transitions, markov_solve)

_T0 = datetime(2024, 1, 1)


def _events(spark, rows):
    """rows: (user_id, event_type, minute_offset, event_id)."""
    return spark.createDataFrame(
        [Row(user_id=u, event_type=t, ts=_T0 + timedelta(minutes=m),
             event_id=i, value=1.0, props=None)
         for (u, t, m, i) in rows],
        "user_id long, event_type string, ts timestamp, event_id long,"
        " value double, props string")


def _cnt(df):
    return {(r["src"], r["dst"]): r["n"] for r in df.collect()}


def test_transitions_hand_built(spark):
    # A: view -> click -> purchase; B: view (never converts)
    ev = _events(spark, [
        (1, "view", 0, 10), (1, "click", 1, 11), (1, "purchase", 2, 12),
        (2, "view", 0, 20),
    ])
    assert _cnt(journey_transitions(ev)) == {
        ("START", "view"): 2, ("view", "click"): 1,
        ("click", "CONV"): 1, ("view", "NULL"): 1,
    }


def test_transitions_truncate_at_first_purchase(spark):
    # events AFTER the first purchase never enter the journey
    ev = _events(spark, [
        (1, "view", 0, 1), (1, "purchase", 1, 2),
        (1, "click", 2, 3), (1, "purchase", 3, 4),
    ])
    assert _cnt(journey_transitions(ev)) == {
        ("START", "view"): 1, ("view", "CONV"): 1,
    }


def test_transitions_purchase_first_and_null_user(spark):
    # purchase as the very first event -> START -> CONV directly;
    # NULL-user rows are excluded entirely
    ev = _events(spark, [
        (1, "purchase", 0, 1),
        (None, "view", 0, 2), (None, "purchase", 1, 3),
    ])
    assert _cnt(journey_transitions(ev)) == {("START", "CONV"): 1}


def test_markov_solve_hand_computed():
    # the worked chain: p(START,view)=1, p(view,click)=.5,
    # p(click,CONV)=1 -> base = .5; removing click or view kills all
    # conversion (effect 1.0 each); error/signup carry nothing
    trans = [("START", "view", 2), ("view", "click", 1),
             ("click", "CONV", 1), ("view", "NULL", 1)]
    out = {r["channel"]: r for r in markov_solve(trans)}
    assert out["click"]["base_conv_q"] == _MK_SCALE // 2
    assert out["click"]["removal_conv_q"] == 0
    assert out["click"]["removal_effect_q"] == _MK_SCALE
    assert out["view"]["removal_effect_q"] == _MK_SCALE
    assert out["error"]["removal_effect_q"] == 0
    assert out["signup"]["removal_effect_q"] == 0
    assert out["click"]["attribution_share"] == 0.5
    assert out["view"]["attribution_share"] == 0.5
    assert out["error"]["attribution_share"] == 0.0


def test_markov_solve_no_conversions():
    # no CONV anywhere -> base 0, all effects 0, shares NULL
    trans = [("START", "view", 3), ("view", "NULL", 3)]
    for r in markov_solve(trans):
        assert r["base_conv_q"] == 0
        assert r["removal_effect_q"] == 0
        assert r["attribution_share"] is None


def test_markov_removal_monotone():
    # removal can only LOSE probability mass: every removal_conv_q
    # <= base (guards the floor-arithmetic claim in the module note)
    trans = [("START", "view", 5), ("START", "click", 5),
             ("view", "click", 3), ("view", "CONV", 1),
             ("view", "NULL", 1), ("click", "CONV", 4),
             ("click", "view", 2), ("click", "NULL", 2),
             ("START", "signup", 2), ("signup", "view", 1),
             ("signup", "NULL", 1)]
    out = markov_solve(trans)
    base = out[0]["base_conv_q"]
    assert base > 0
    for r in out:
        assert 0 <= r["removal_conv_q"] <= base


def test_attribution_pre_epoch0_click_decodes_as_click(spark):
    # events BEFORE the encoding epoch (2017-07-14) produce NEGATIVE
    # touch keys; odd negative dividends give key % 2 == -1 in both
    # engines, so the decode must test % 2 <> 0, not = 1 (ADVICE r7).
    # One user, one pre-epoch click then a purchase inside the
    # 72h lookback: first AND last touch must decode as 'click'.
    from data_warehouse_project_spark.plans.attribution import (
        attribution_frame)

    t0 = datetime(2016, 6, 1)  # unix ~1.464e9 < epoch0 1.5e9
    ev = spark.createDataFrame(
        [Row(user_id=1, event_type="click", ts=t0, event_id=10,
             value=0.0, props=None),
         Row(user_id=1, event_type="purchase",
             ts=t0 + timedelta(hours=1), event_id=11, value=50.0,
             props=None)],
        "user_id long, event_type string, ts timestamp, event_id long,"
        " value double, props string")
    rows = {r["touch_type"]: r for r in attribution_frame(ev).collect()}
    assert "view" not in rows
    assert rows["click"]["n_first"] == 1
    assert rows["click"]["n_last"] == 1
    assert rows["click"]["first_revenue"] == 50.0
    assert rows["click"]["linear_revenue"] == 50.0


from hypothesis import HealthCheck, given, settings, strategies as st

_attr_events = st.lists(
    st.tuples(st.integers(1, 3),                       # user
              st.sampled_from(["view", "click", "purchase"]),
              st.integers(0, 100 * 3600),              # second offset
              st.integers(0, 500)),                    # value dollars
    min_size=1, max_size=25)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_attr_events)
def test_attribution_frame_matches_python_model(spark, rows):
    # brute-force the full window-attribution semantics (72h strict
    # (-LOOKBACK, -1] second frame, encoded-key first/last tie-break,
    # cents-exact linear split) against the distributed plan — the
    # r8-window query's pre-driver differential
    import math

    from data_warehouse_project_spark.plans.attribution import (
        _EPOCH0, _KEY_BASE, LOOKBACK_S, attribution_frame)

    base = 1_700_000_000                     # 2023-11, inside headroom
    ev = [(u, t, base + s, i, float(v))
          for i, (u, t, s, v) in enumerate(rows)]
    df = spark.createDataFrame(
        [Row(user_id=u, event_type=t,
             ts=datetime.utcfromtimestamp(sec), event_id=i, value=v,
             props=None)
         for (u, t, sec, i, v) in ev],
        "user_id long, event_type string, ts timestamp, event_id long,"
        " value double, props string")
    got = {r["touch_type"]:
           (r["n_first"], round(r["first_revenue"], 2),
            r["n_last"], round(r["last_revenue"], 2),
            round(r["linear_revenue"], 2))
           for r in attribution_frame(df).collect()}

    agg = {}                                  # type -> [nf, fc, nl, lc, lin]
    def acc(t):
        return agg.setdefault(t, [0, 0, 0, 0, 0])
    for (u, t, sec, i, v) in ev:
        if t != "purchase":
            continue
        cents = math.floor(v * 100 + 0.5)
        win = [(uu, tt, ss, ii) for (uu, tt, ss, ii, _) in ev
               if uu == u and tt in ("view", "click")
               and sec - LOOKBACK_S <= ss <= sec - 1]
        keys = [(ss - _EPOCH0) * _KEY_BASE + ii * 2 + (tt == "click")
                for (_, tt, ss, ii) in win]
        n_view = sum(1 for (_, tt, _, _) in win if tt == "view")
        n_click = len(win) - n_view
        if not win:
            a = acc("(none)")
            a[0] += 1; a[1] += cents; a[2] += 1; a[3] += cents
            a[4] += cents
            continue
        first_t = "click" if min(keys) % 2 else "view"
        last_t = "click" if max(keys) % 2 else "view"
        fa, la = acc(first_t), acc(last_t)
        fa[0] += 1; fa[1] += cents
        la[2] += 1; la[3] += cents
        tot = n_view + n_click
        acc("view")[4] += math.floor(cents * n_view / tot + 0.5)
        acc("click")[4] += math.floor(cents * n_click / tot + 0.5)
    want = {t: (a[0], round(a[1] / 100, 2), a[2], round(a[3] / 100, 2),
                round(a[4] / 100, 2))
            for t, a in agg.items()
            if a[0] or a[2] or a[4]}
    assert got == want

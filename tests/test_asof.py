"""As-of join operator edge cases: tie inclusivity, no-match nulls,
multiple keys, value carry-forward."""

from __future__ import annotations

import pytest

from data_warehouse_project_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 25, "p2"), (1, 9, "p0"), (2, 5, "p3")],
        "uid long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 50, 500.0)],
        "uid long, ts long, val double")
    return left, right


def test_asof_semantics(frames):
    left, right = frames
    out = {r["tag"]: (r["val"], r["asof_ts"]) for r in asof_join(
        left, right, on=["uid"], ts_col="ts", value_cols=["val"]
    ).collect()}
    assert out["p1"] == (100.0, 10)    # tie: right.ts == left.ts included
    assert out["p2"] == (200.0, 20)    # latest prior, not first
    assert out["p0"] == (None, None)   # before any right row → null
    assert out["p3"] == (None, None)   # key with only-later right rows


def test_asof_preserves_left_rowcount(frames):
    left, right = frames
    assert asof_join(left, right, on=["uid"], ts_col="ts",
                     value_cols=["val"]).count() == left.count()


# ---------------------------------------------------------------------------
# union-and-window fold vs a brute-force correlated-subquery replay
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st


def _asof_brute(left_rows, right_rows):
    """The naive per-row correlated top-1 the operator replaces: for
    each left row, the right row with the greatest ts <= left.ts on
    the same key (right is unique per (uid, ts) by construction)."""
    out = {}
    for uid, ts, tag in left_rows:
        best = None
        for ruid, rts, val in right_rows:
            if ruid == uid and rts <= ts and (best is None or rts > best[0]):
                best = (rts, val)
        out[tag] = (best[1], best[0]) if best else (None, None)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_asof_matches_brute_force(spark, data):
    """Random key/ts draws — duplicate left timestamps, exact ties on
    right.ts (inclusive <=), keys with only-later right rows, keys
    absent from the right entirely: the single-shuffle union-and-
    window fold must agree with the correlated-subquery model on
    every left row."""
    left_rows = data.draw(st.lists(
        st.tuples(st.integers(1, 4), st.integers(0, 30)),
        min_size=1, max_size=20))
    left_rows = [(u, t, f"tag{i}") for i, (u, t) in enumerate(left_rows)]
    right_pairs = data.draw(st.lists(
        st.tuples(st.integers(1, 4), st.integers(0, 30)),
        max_size=20, unique=True))               # unique (uid, ts)
    right_rows = [(u, t, float(u * 1000 + t)) for u, t in right_pairs]

    left = spark.createDataFrame(left_rows, "uid long, ts long, tag string")
    right = (spark.createDataFrame(right_rows or [(99, 0, 0.0)],
                                   "uid long, ts long, val double")
             .filter("uid < 99"))
    got = {r["tag"]: (r["val"], r["asof_ts"]) for r in asof_join(
        left, right, on=["uid"], ts_col="ts", value_cols=["val"]
    ).collect()}
    assert got == _asof_brute(left_rows, right_rows)

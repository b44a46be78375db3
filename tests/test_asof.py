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

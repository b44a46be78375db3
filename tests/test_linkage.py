"""Semantic unit tests for the fuzzy record-linkage family
(plans/linkage.py): hand-computable edit distances, the blocking
semantics (cross-block near-names are NOT candidates — that is the
recall trade blocking buys scale with), the threshold boundary, and
support-count plumbing.
"""

from __future__ import annotations

from pyspark.sql import Row

from data_warehouse_project_spark.plans.linkage import fuzzy_name_linkage


def _rows(spark, names):
    return spark.createDataFrame(
        [Row(p_name=n) for n in names], "p_name string")


def test_linkage_hand_computed_distances(spark):
    # 'cold ring' vs 'old ring' -> lev 1; 'cold ring' vs 'red ring'
    # -> lev 3 (c->r, o->e, ld->d); 'blue ring' vs 'old ring' -> 3
    out = fuzzy_name_linkage(
        _rows(spark, ["cold ring", "old ring", "red ring"]),
        "p_name").collect()
    got = {(r["name_a"], r["name_b"]): r["lev_dist"] for r in out}
    assert got[("cold ring", "old ring")] == 1
    assert got[("cold ring", "red ring")] == 3
    assert got[("old ring", "red ring")] == 2
    assert all(r["block"] == "ring" for r in out)


def test_linkage_blocking_excludes_cross_block(spark):
    # 'red bolt' vs 'red boat': lev 2 (within threshold) but the
    # trailing-token blocks differ -> never a candidate pair
    out = fuzzy_name_linkage(
        _rows(spark, ["red bolt", "red boat"]), "p_name").collect()
    assert out == []


def test_linkage_threshold_boundary(spark):
    # lev('small gear','hot gear') = 4 -> excluded at LEV_MAX=3;
    # lev('red gear','hot gear') = 3 -> included exactly at the edge
    out = fuzzy_name_linkage(
        _rows(spark, ["small gear", "hot gear", "red gear"]),
        "p_name").collect()
    pairs = {(r["name_a"], r["name_b"]) for r in out}
    assert ("hot gear", "red gear") in pairs
    assert ("hot gear", "small gear") not in pairs
    assert ("red gear", "small gear") not in pairs


def test_linkage_support_counts(spark):
    # duplicate corpus rows fold into dictionary support counts
    out = fuzzy_name_linkage(
        _rows(spark, ["old rod", "old rod", "old rod", "cold rod"]),
        "p_name").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["name_a"], r["name_b"]) == ("cold rod", "old rod")
    assert r["lev_dist"] == 1
    assert r["rows_a"] == 1 and r["rows_b"] == 3


# ---------------------------------------------------------------------------
# Blocked fuzzy linkage vs a Python DP Levenshtein replay
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _linkage_reference(names):
    """Sequential replay: distinct-name dictionary with support
    counts, trailing-token blocking, the |len diff| prefilter, and
    DP Levenshtein at the threshold."""
    support = {}
    for n in names:
        support[n] = support.get(n, 0) + 1
    out = {}
    dic = sorted(support)
    for i, a in enumerate(dic):
        for b in dic[i + 1:]:
            if a.rsplit(" ", 1)[-1] != b.rsplit(" ", 1)[-1]:
                continue
            if abs(len(a) - len(b)) > 3:
                continue
            d = _lev(a, b)
            if d <= 3:
                out[(a, b)] = (a.rsplit(" ", 1)[-1], d,
                               support[a], support[b])
    return out


_words = st.sampled_from(["red", "ring", "bolt", "rng", "reed",
                          "bol", "ringo"])


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(names=st.lists(
    st.tuples(_words, _words).map(lambda p: f"{p[0]} {p[1]}"),
    min_size=1, max_size=12))
def test_linkage_matches_python_reference(spark, names):
    """Random near-collision name dictionaries (duplicate corpus rows
    folding into support counts, distances straddling the LEV_MAX=3
    edge, cross-block lookalikes the blocking must exclude): the
    blocked fuzzy self-linkage must match the DP Levenshtein replay
    pair for pair."""
    got = {(r["name_a"], r["name_b"]):
           (r["block"], r["lev_dist"], r["rows_a"], r["rows_b"])
           for r in fuzzy_name_linkage(_rows(spark, names),
                                       "p_name").collect()}
    assert got == _linkage_reference(names), names

"""Semantic unit tests for the pinned Lloyd's k-means
(llm/kmeans.py): planted-blob recovery, assignment tie-break,
empty-cluster centroid carry, and Lloyd's WCSS monotonicity across
update rounds.
"""

from __future__ import annotations

from pyspark.sql import Row

from data_warehouse_project_spark.llm.kmeans import kmeans_pinned_report


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v], label=0)
         for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int")


def test_two_blobs_recovered(spark):
    # init = two smallest vec_ids, one in each blob -> perfect split
    blob_a = [[0.0, 0.0], [0.01, 0.0], [0.0, 0.01], [0.01, 0.01]]
    blob_b = [[1.0, 1.0], [0.99, 1.0], [1.0, 0.99], [0.99, 0.99]]
    vecs = [blob_a[0], blob_b[0]] + blob_a[1:] + blob_b[1:]
    out = {r["cluster"]: r
           for r in kmeans_pinned_report(_emb(spark, vecs), k=2,
                                         iters=2).collect()}
    assert out[0]["n_members"] == 4 and out[1]["n_members"] == 4


def test_tie_breaks_to_smallest_index(spark):
    # a point exactly between two centroids joins the lower index
    vecs = [[0.0, 0.0], [1.0, 0.0], [0.5, 0.0]]
    out = {r["cluster"]: r["n_members"]
           for r in kmeans_pinned_report(_emb(spark, vecs), k=2,
                                         iters=0).collect()}
    assert out[0] == 2 and out[1] == 1


def test_empty_cluster_carry_enables_reclaim(spark):
    # duplicate init vectors: round 1 assigns EVERYTHING to cluster 0
    # (tie to smallest index), leaving cluster 1 empty — the carry
    # keeps its [0,0] centroid, so round 2 reclaims the origin points
    # after centroid 0 moves to the global mean. Without the carry the
    # final split below is impossible.
    vecs = [[0.0, 0.0], [0.0, 0.0], [1.0, 1.0], [1.0, 1.0]]
    out = {r["cluster"]: r["n_members"]
           for r in kmeans_pinned_report(_emb(spark, vecs), k=2,
                                         iters=2).collect()}
    assert out == {0: 2, 1: 2}


def test_empty_cluster_emits_no_row(spark):
    # iters=0 with duplicate init centroids: every point ties to
    # index 0, cluster 1 ends empty and emits no report row
    vecs = [[0.0, 0.0], [0.0, 0.0], [0.2, 0.1], [0.1, 0.2]]
    rows = kmeans_pinned_report(_emb(spark, vecs), k=2, iters=0).collect()
    assert [r["cluster"] for r in rows] == [0]
    assert rows[0]["n_members"] == 4


def test_wcss_monotone_under_updates(spark):
    # Lloyd's property: update rounds never increase total WCSS
    vecs = [[float(i % 5), float(i % 7) / 3.0, float(i % 3) * 2.0]
            for i in range(40)]
    def wcss(iters):
        return sum(r["wcss_q"] for r in
                   kmeans_pinned_report(_emb(spark, vecs), k=3,
                                        iters=iters).collect())
    w0, w2 = wcss(0), wcss(2)
    assert w2 <= w0


import math

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st


def _kmeans_reference(vecs, k, iters):
    """Plain-Python replay of the pinned Lloyd contract
    (llm/kmeans.py module docstring): float32 ingest → ppm-long
    quantization, init = k smallest vec_ids, int64 squared distance,
    tie to smallest index, floor-of-IEEE-divide centroid update with
    empty-cluster carry, fixed rounds, final per-cluster report."""
    q = [[math.floor(float(np.float32(x)) * 1e6 + 0.5) for x in v]
         for v in vecs]
    cents = [list(v) for v in q[:min(k, len(q))]]
    dim = len(cents[0])

    def assign():
        return [min((sum((a - b) * (a - b) for a, b in zip(v, c)), j)
                    for j, c in enumerate(cents))
                for v in q]

    for _ in range(iters):
        sums, counts = {}, {}
        for (_, j), v in zip(assign(), q):
            counts[j] = counts.get(j, 0) + 1
            s = sums.setdefault(j, [0] * dim)
            for i, x in enumerate(v):
                s[i] += x
        cents = [[math.floor(sums[j][i] / counts[j]) for i in range(dim)]
                 if j in counts else cents[j]
                 for j in range(len(cents))]
    rep = {}
    for (dist, j), v in zip(assign(), q):
        n, w = rep.get(j, (0, 0))
        rep[j] = (n + 1, w + dist)
    return {j: (n, w, sum(c * c for c in cents[j]))
            for j, (n, w) in rep.items()}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=st.lists(
           st.lists(st.floats(-1, 1, allow_nan=False, width=32),
                    min_size=3, max_size=3),
           min_size=1, max_size=12),
       k=st.integers(1, 4), iters=st.integers(0, 2))
def test_kmeans_matches_python_reference(spark, vecs, k, iters):
    """Random corpora × k × rounds: the distributed recurrence
    (broadcast-centroid HOF assignment + (cluster,pos) aggregate)
    must replay the sequential pinned-Lloyd reference exactly —
    members, integer WCSS and centroid norms, including k > n
    (short init prefix) and empty-cluster carries."""
    got = {r["cluster"]: (r["n_members"], r["wcss_q"],
                          r["centroid_sq_norm"])
           for r in kmeans_pinned_report(_emb(spark, vecs), k=k,
                                         iters=iters).collect()}
    assert got == _kmeans_reference(vecs, k, iters), (vecs, k, iters)

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

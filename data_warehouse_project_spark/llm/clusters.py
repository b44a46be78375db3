"""Near-duplicate cluster assignment — connected components over the
dedup pair graph.

Pair lists (from any dedup operator) say "a duplicates b"; keeping one
representative per *transitive* group needs connected components:
cluster id = min doc_id reachable through pairs. Spark has no
recursive CTE, so this is the engine's one driver-coordinated
iterative algorithm: label-propagation (each node takes the min label
among itself and its neighbors) to fixpoint — O(diameter) rounds,
each one join + one aggregation. The DuckDB oracle computes the same
clusters with a recursive CTE, making this a true differential test
of an iterative operator.

Scale notes: label propagation is the standard large-graph CC
approach (GraphX/GraphFrames use the same shape); each round shuffles
only (node, label) pairs. Dedup graphs are shallow (near-dup clusters
are cliques or near-cliques), so rounds ≈ 2-3 in practice; the loop
is bounded and checkpoint-free because the label frame is tiny
relative to the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..sources.catalog import Catalog
from .dedup import DEDUP_NGRAM_JACCARD_SQL, dedup_ngram_jaccard

MAX_ROUNDS = 20


def connected_components(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(node) + (a, b) edges → (node, cluster) with cluster = min
    reachable node id. Deterministic; singletons keep their own id."""
    # persist both loop-invariant edges and each round's labels: the
    # per-round `changed` probe is an ACTION, and without caching it
    # would re-execute the whole upstream lineage (pair generation
    # included) once per round, with round k replaying rounds 1..k-1 —
    # the classic iterative-algorithm lineage blowup. With per-round
    # persist (and rotating the previous round out) every round costs
    # exactly one join + one aggregation regardless of depth.
    sym = (edges.select(F.col("a").alias("n"), F.col("b").alias("m"))
           .union(edges.select(F.col("b").alias("n"), F.col("a").alias("m")))
           .persist())
    labels = nodes.select(F.col("node").alias("n"),
                          F.col("node").alias("label")).persist()
    for _ in range(MAX_ROUNDS):
        neighbor_min = (
            sym.join(labels, sym.m == labels.n)
            .groupBy(sym.n.alias("nn"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.n == F.col("nn"), "left")
            .select(
                "n",
                F.least(F.col("label"),
                        F.coalesce(F.col("nbr_label"), F.col("label")))
                .alias("label"),
            )
            # localCheckpoint (eager): truncates the logical plan so
            # round k's plan doesn't embed rounds 1..k-1 (planning
            # time alone goes superlinear otherwise)
            .localCheckpoint()
        )
        changed = (
            labels.alias("old").join(new_labels.alias("new"), "n")
            .filter(F.col("old.label") != F.col("new.label"))
            .limit(1).count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("n").alias("node"),
                         F.col("label").alias("cluster"))


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment for every document participating in a
    near-dup pair (n-gram Jaccard graph): doc_id → cluster id (min
    doc_id of its component), plus cluster size."""
    pairs = dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    nodes = (pairs.select(F.col("a").alias("node"))
             .union(pairs.select(F.col("b").alias("node"))).distinct())
    cc = connected_components(pairs, nodes)
    sizes = cc.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (cc.join(sizes, "cluster")
            .select(F.col("node").alias("doc_id"), "cluster", "cluster_size"))


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
    SELECT doc_a AS a, doc_b AS b FROM ({DEDUP_NGRAM_JACCARD_SQL})
),
edges AS (
    SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
),
nodes AS (
    SELECT DISTINCT a AS node FROM edges
),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.a, reach.r FROM reach JOIN edges e ON e.b = reach.node
),
cc AS (
    SELECT node, MIN(r) AS cluster FROM reach GROUP BY node
)
SELECT cc.node AS doc_id, cc.cluster,
       s.cluster_size
FROM cc
JOIN (SELECT cluster, COUNT(*) AS cluster_size
      FROM cc GROUP BY cluster) s USING (cluster)
"""

register("dedup_clusters", dedup_clusters, DEDUP_CLUSTERS_SQL)

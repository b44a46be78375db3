"""Multi-signal dedup bridge — exact-hash ∪ n-gram-Jaccard edge
union → one connected-components pass → unified survivor selection
(VERDICT r6 #7 stretch item).

Running each dedup signal in isolation under-merges: an exact-copy
pair {A, B} and a near-dup pair {B, C} are three documents that
should yield ONE survivor, but per-signal survivor passes keep one
from each signal's own clusters (up to 2 of the 3). The bridge
unions the edge sets of every pairwise signal BEFORE the transitive
closure, so clusters chain across signals, then applies the standard
quality-based survivor rule once per unified cluster. Per-cluster
edge provenance (how many edges each signal contributed) makes the
merge auditable — a cluster with 0 exact edges was stitched purely
by near-dup similarity.

Scale design (100 TB): both edge generators are the existing
scale-vetted shapes — exact edges come from an md5-digest groupBy
(32-byte shuffle keys regardless of document width, star-shaped
root→member edges so a g-sized group emits g-1 edges, not g²);
n-gram edges come from the DF-capped shingle-blocking join
(llm/dedup.py SHINGLE_DF_CAP bounds fan-out). The edge union is
pair-graph-sized (≪ corpus), connected components shuffles only
(node, label) longs per round (see llm/clusters.py), and the
survivor/provenance joins run on cluster-sized frames broadcast back.
Nothing downstream of the two edge generators touches the corpus.

Oracle: fully SQL-expressible — the DuckDB twin recomputes both edge
sets and the transitive closure with a recursive CTE, making this an
end-to-end differential test of a multi-signal iterative pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..sources.catalog import Catalog
from .clusters import connected_components
from .dedup import DEDUP_NGRAM_JACCARD_SQL, ngram_jaccard_pairs


def bridge_edges(docs: DataFrame) -> DataFrame:
    """(a, b, method) pairwise dedup edges from both SQL-expressible
    signals: 'exact' (normalized-text md5 groups, star-shaped) and
    'ngram' (5-gram Jaccard pairs). a < b holds for every edge: the
    exact root is the group MIN and ngram pairs are generated
    triangular."""
    fp = docs.select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")),
                                       r"\s+", " "))).alias("fingerprint"))
    groups = (fp.groupBy("fingerprint")
              .agg(F.min("doc_id").alias("root"),
                   F.count("*").alias("n"))
              .filter(F.col("n") > 1))
    exact_edges = (
        fp.join(groups, "fingerprint")
        .filter(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("a"), F.col("doc_id").alias("b"),
                F.lit("exact").alias("method")))
    ngram_edges = ngram_jaccard_pairs(docs).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b"),
        F.lit("ngram").alias("method"))
    return exact_edges.unionByName(ngram_edges)


def bridge_survivors_frame(docs: DataFrame) -> DataFrame:
    """Core of the bridge over any (doc_id, text, n_chars) frame:
    unified keep/drop decision over the union of exact-hash and
    n-gram-Jaccard duplicate graphs. One row per document in any
    cluster: cluster id (min reachable doc_id), cluster size,
    per-signal edge counts, and the is_kept flag (longest n_chars
    survives, ties to smallest doc_id — the same rule as
    llm/clusters.dedup_survivors so the two passes are comparable)."""
    from ..cache import pin
    # tracked pin: the edge union feeds CC's edges, the node set, AND
    # the provenance counts — unpinned, each branch re-runs the
    # shingle-blocking pipeline
    edges = pin(bridge_edges(docs))
    nodes = (edges.select(F.col("a").alias("node"))
             .union(edges.select(F.col("b").alias("node"))).distinct())
    cc = connected_components(edges.select("a", "b").distinct(), nodes)
    sizes = cc.groupBy("cluster").agg(
        F.count("*").cast("long").alias("cluster_size"))
    prov = (
        edges.join(cc.select(F.col("node").alias("a"), "cluster"), "a")
        .groupBy("cluster")
        .agg(F.sum((F.col("method") == "exact").cast("long"))
             .alias("n_exact_edges"),
             F.sum((F.col("method") == "ngram").cast("long"))
             .alias("n_ngram_edges")))
    with_q = (cc.select(F.col("node").alias("doc_id"), "cluster")
              .join(docs.select("doc_id", "n_chars"), "doc_id"))
    winners = with_q.groupBy("cluster").agg(
        F.max_by(F.col("doc_id"),
                 F.col("n_chars") * F.lit(1_000_000_000_000)
                 - F.col("doc_id")).alias("keep_id"))
    return (
        with_q.join(F.broadcast(sizes), "cluster")
        .join(F.broadcast(prov), "cluster")
        .join(F.broadcast(winners), "cluster")
        .select(
            "doc_id", "cluster", "cluster_size",
            "n_exact_edges", "n_ngram_edges",
            F.when(F.col("doc_id") == F.col("keep_id"), F.lit(1))
            .otherwise(F.lit(0)).cast("long").alias("is_kept"),
        )
    )


def dedup_bridge_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: the bridge over the corpus documents table
    (see bridge_survivors_frame)."""
    return bridge_survivors_frame(Catalog(spark, sf_dir).documents)


DEDUP_BRIDGE_SQL = f"""
WITH RECURSIVE fp AS (
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
               AS fingerprint
    FROM documents
),
fgroups AS (
    SELECT fingerprint, MIN(doc_id) AS root
    FROM fp GROUP BY 1 HAVING COUNT(*) > 1
),
all_edges AS (
    SELECT g.root AS a, f.doc_id AS b, 'exact' AS method
    FROM fp f JOIN fgroups g USING (fingerprint)
    WHERE f.doc_id <> g.root
    UNION ALL
    SELECT doc_a AS a, doc_b AS b, 'ngram' AS method
    FROM ({DEDUP_NGRAM_JACCARD_SQL})
),
uedges AS (SELECT DISTINCT a, b FROM all_edges),
edges AS (SELECT a, b FROM uedges UNION SELECT b, a FROM uedges),
nodes AS (SELECT DISTINCT a AS node FROM edges),
reach(node, r) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.a, reach.r FROM reach JOIN edges e ON e.b = reach.node
),
cc AS (SELECT node, MIN(r) AS cluster FROM reach GROUP BY node),
sizes AS (SELECT cluster, COUNT(*) AS cluster_size FROM cc GROUP BY 1),
prov AS (
    SELECT cc.cluster,
           SUM(CASE WHEN e.method = 'exact' THEN 1 ELSE 0 END)
               AS n_exact_edges,
           SUM(CASE WHEN e.method = 'ngram' THEN 1 ELSE 0 END)
               AS n_ngram_edges
    FROM all_edges e JOIN cc ON cc.node = e.a
    GROUP BY 1
),
winners AS (
    SELECT cluster,
           arg_max(cc.node, d.n_chars * 1000000000000 - cc.node) AS keep_id
    FROM cc JOIN documents d ON d.doc_id = cc.node
    GROUP BY 1
)
SELECT cc.node AS doc_id, cc.cluster,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(p.n_exact_edges AS BIGINT) AS n_exact_edges,
       CAST(p.n_ngram_edges AS BIGINT) AS n_ngram_edges,
       CAST(CASE WHEN cc.node = w.keep_id THEN 1 ELSE 0 END AS BIGINT)
           AS is_kept
FROM cc
JOIN sizes s USING (cluster)
JOIN prov p USING (cluster)
JOIN winners w USING (cluster)
"""

register("dedup_bridge_survivors", dedup_bridge_survivors, DEDUP_BRIDGE_SQL)

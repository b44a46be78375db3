"""Graph analytics over the order fact — integer-arithmetic PageRank
on the part co-purchase graph ("parts ordered together"), the
merchandising centrality query behind related-item ranking.

The reference has no graph surface; this extends the §2.11 analytics
family with the one workload class the engine did not yet cover: an
ITERATIVE fixed-point algorithm expressed as unrolled DataFrame joins
(the Spark-idiomatic shape — each iteration is one shuffle on the
destination key, exactly how GraphX/Pregel lowers to joins).

Determinism design: ranks are scaled BIGINTs, never accumulated
doubles. Each iteration does
    contrib(u) = floor(rank(u) / deg(u))        -- one IEEE division
    s(v)       = SUM(contrib(u)) over in-edges  -- integer sum,
                                                   order-independent
    rank'(v)   = floor(0.15 * SCALE) + floor(0.85 * s(v))
with every floor fed by a single correctly-rounded IEEE division or
multiplication of integers < 2^53 — both engines produce the same
bits, so the final ranks hash-match exactly (same policy as
llm/textstats.doc_lm_cross_entropy's quantized sums; no
transcendentals anywhere).

Scale design (100 TB of lineitem): the only corpus-sized shuffles are
(a) the per-order distinct-part aggregate and (b) the order-keyed
self-join that emits edges — both on the natural o_orderkey
partitioning, with a MAX_BASKET guard so a pathological mega-order
cannot emit O(n^2) pairs. After edge dedup the iteration space is the
EDGE set (parts x avg co-purchase degree, tiny vs the fact): each of
the 3 unrolled iterations is one (src-join, dst-groupBy) pair of
narrow shuffles; the rank vector (one long per part) is
dimension-sized, not fact-sized. Unrolling 3 iterations keeps lineage
shallow enough to skip checkpointing; a production loop at higher
iteration counts would localCheckpoint() every ~5 rounds (the pattern
llm/clusters.py already uses for connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..sources.catalog import Catalog

#: rank fixed-point scale: rank 1.0 == SCALE.
PR_SCALE = 1_000_000

#: unrolled power iterations.
PR_ITERS = 3

#: skip orders with more distinct parts (pair blow-up guard; TPC-H
#: orders carry <= 7 lines, the synthetic generator <= ~15).
MAX_BASKET = 30

#: report size.
PR_TOP_K = 20


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Distinct directed edges (src, dst) between parts that appear in
    the same order, both directions, self-pairs excluded."""
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    small = (items.groupBy("l_orderkey")
             .agg(F.count("*").alias("n_items"))
             .filter(F.col("n_items") <= MAX_BASKET)
             .select("l_orderkey"))
    kept = items.join(small, "l_orderkey")
    a = kept.select(F.col("l_orderkey").alias("k"),
                    F.col("l_partkey").alias("src"))
    b = kept.select(F.col("l_orderkey").alias("k"),
                    F.col("l_partkey").alias("dst"))
    return (a.join(b, "k")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .distinct())


def pagerank_topk(lineitem: DataFrame, part: DataFrame,
                  iters: int = PR_ITERS, k: int = PR_TOP_K) -> DataFrame:
    """Top-k parts by integer PageRank over the co-purchase graph."""
    edges = copurchase_edges(lineitem)
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    # nodes = every part with at least one co-purchase (deg >= 1 by
    # construction, so there are no dangling nodes to redistribute).
    ranks = deg.select("src", F.lit(PR_SCALE).cast("long").alias("rank"))
    base = int(0.15 * PR_SCALE)
    for _ in range(iters):
        contrib = (ranks.join(deg, "src")
                   .select("src",
                           F.floor(F.col("rank") / F.col("deg"))
                           .cast("long").alias("contrib")))
        s = (edges.join(contrib, "src")
             .groupBy("dst")
             .agg(F.sum("contrib").cast("long").alias("s")))
        ranks = (deg.select("src")
                 .join(s.withColumnRenamed("dst", "src"), "src", "left")
                 .select("src",
                         (F.lit(base)
                          + F.floor(F.coalesce(F.col("s"), F.lit(0))
                                    * F.lit(0.85)).cast("long"))
                         .alias("rank")))
    return (ranks
            .join(part.select(F.col("p_partkey").alias("src"), "p_name"),
                  "src")
            .select(F.col("src").alias("p_partkey"), "p_name",
                    F.col("rank").alias("pagerank_scaled"))
            .orderBy(F.desc("pagerank_scaled"), "p_partkey")
            .limit(k))


def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by 3-iteration PageRank on the co-purchase graph."""
    cat = Catalog(spark, sf_dir)
    return pagerank_topk(cat.lineitem, cat.part)


def _iter_sql(prev: str, i: int, base: int) -> str:
    return f"""
contrib{i} AS (
    SELECT r.src, CAST(FLOOR(r.rank / CAST(d.deg AS DOUBLE)) AS BIGINT)
               AS contrib
    FROM {prev} r JOIN deg d ON r.src = d.src
),
s{i} AS (
    SELECT e.dst AS src, CAST(SUM(c.contrib) AS BIGINT) AS s
    FROM edges e JOIN contrib{i} c ON e.src = c.src
    GROUP BY e.dst
),
r{i} AS (
    SELECT d.src,
           CAST({base} + FLOOR(COALESCE(s.s, 0) * 0.85) AS BIGINT) AS rank
    FROM deg d LEFT JOIN s{i} s ON d.src = s.src
)"""


def _pagerank_sql() -> str:
    base = int(0.15 * PR_SCALE)
    iters = ",".join(_iter_sql("r0" if i == 1 else f"r{i - 1}", i, base)
                     for i in range(1, PR_ITERS + 1))
    return f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
small AS (
    SELECT l_orderkey FROM items GROUP BY l_orderkey
    HAVING COUNT(*) <= {MAX_BASKET}
),
kept AS (
    SELECT i.l_orderkey, i.l_partkey FROM items i
    JOIN small s ON i.l_orderkey = s.l_orderkey
),
edges AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM kept a JOIN kept b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey <> b.l_partkey
),
deg AS (
    SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
),
r0 AS (
    SELECT src, CAST({PR_SCALE} AS BIGINT) AS rank FROM deg
),
{iters}
SELECT r.src AS p_partkey, p.p_name,
       CAST(r.rank AS BIGINT) AS pagerank_scaled
FROM r{PR_ITERS} r JOIN part p ON r.src = p.p_partkey
ORDER BY pagerank_scaled DESC, p_partkey
LIMIT {PR_TOP_K}
"""


register("part_copurchase_pagerank", part_copurchase_pagerank,
         _pagerank_sql())

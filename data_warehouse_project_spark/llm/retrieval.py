"""BM25 ranked retrieval over `documents` — the query-side companion
to the inverted index (llm/index.py): score a fixed keyword query
with Okapi BM25 (Robertson et al., public formula) and return the
top documents. tf-idf ranks terms per doc (llm/quality.py); BM25 is
the standard document-versus-query ranking a retrieval service
actually serves.

Scale design: the term explode filters to the query's terms BEFORE
aggregating, so the candidate frame is bounded by documents
containing ≥1 query term — everything downstream (df counts, the
doc-length join, scoring, top-k) is candidate-sized except the
doc-length side of the join, which stays a doc-keyed hash join a
real deployment would prune with the index's postings. Corpus
scalars (N, avgdl) attach as a broadcast one-row frame; top-k is a
TakeOrdered, never a global sort.

Determinism: each (doc, term) BM25 contribution is quantized to a
6-decimal integer before the per-doc SUM (order-independent,
compat.py hazard #1); ranking orders by the integer sum, then
doc_id, so cross-engine float noise cannot reorder. ln carries the
documented residual transcendental ulp risk (compat.py policy
note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog

#: the registered query's keyword query (moderate-df corpus terms)
BM25_QUERY_TERMS = ["hash", "merge", "vector"]

#: Okapi BM25 shape parameters (the public defaults)
BM25_K1 = 1.2
BM25_B = 0.75

#: report size
BM25_TOP_K = 15


def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K documents for the fixed keyword query under Okapi BM25:
    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1),
    tf_norm = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))."""
    cat = Catalog(spark, sf_dir)
    toks = cat.documents.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tokens"))
    from ..cache import pin
    # pin the (doc_id, dl) frame: the scoring join and the scalars
    # broadcast both consume it — unpinned, each branch re-tokenized
    # the corpus (review finding: 4 parquet scans in the executed
    # plan). cand keeps its own single tokenize-explode pass.
    doclen = pin(toks.select(
        "doc_id", F.size("tokens").cast("long").alias("dl")))
    cand = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfs = cand.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scalars = doclen.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"))
    nd = F.col("n_docs").cast("double")
    idf = F.log((nd - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    tf_d = F.col("tf").cast("double")
    tf_norm = (tf_d * F.lit(BM25_K1 + 1.0)
               / (tf_d + F.lit(BM25_K1)
                  * (F.lit(1.0 - BM25_B)
                     + F.lit(BM25_B) * F.col("dl").cast("double")
                     / F.col("avgdl"))))
    scored = (
        cand.join(doclen, "doc_id")
        .join(F.broadcast(dfs), "term")
        .join(F.broadcast(scalars))
        .withColumn("qterm",
                    F.floor(idf * tf_norm * F.lit(1e6) + F.lit(0.5))
                    .cast("long"))
        .groupBy("doc_id")
        .agg(F.sum("qterm").alias("qsum"),
             F.count("*").cast("long").alias("n_terms_matched"))
    )
    return (
        scored
        .orderBy(F.col("qsum").desc(), "doc_id")
        .limit(BM25_TOP_K)
        .select("doc_id", "n_terms_matched",
                fround(F.col("qsum") / F.lit(1e6), 6).alias("bm25_score"))
    )


_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

BM25_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
    FROM documents
),
doclen AS (
    SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM toks
),
cand AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, UNNEST(tokens) AS term FROM toks)
    WHERE term IN ({_TERMS_SQL})
    GROUP BY 1, 2
),
dfs AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM cand GROUP BY 1
),
scalars AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM doclen
),
scored AS (
    SELECT c.doc_id,
           CAST(SUM(CAST(FLOOR(
               LN((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (CAST(tf AS DOUBLE) * {BM25_K1 + 1.0}
                  / (CAST(tf AS DOUBLE) + {BM25_K1}
                     * ({1.0 - BM25_B} + {BM25_B} * CAST(dl AS DOUBLE)
                        / avgdl)))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS qsum,
           CAST(COUNT(*) AS BIGINT) AS n_terms_matched
    FROM cand c
    JOIN doclen USING (doc_id)
    JOIN dfs USING (term)
    CROSS JOIN scalars
    GROUP BY 1
)
SELECT doc_id, n_terms_matched,
       {sql_fround('qsum / 1000000.0', 6)} AS bm25_score
FROM scored
ORDER BY qsum DESC, doc_id
LIMIT {BM25_TOP_K}
"""

register("bm25_top_docs", bm25_top_docs, BM25_SQL)

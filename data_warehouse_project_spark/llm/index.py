"""Inverted-index construction over `documents` — the term
dictionary (document frequency, collection frequency) plus a capped,
doc_id-ordered postings head per term: the structure a search/
retrieval layer serves and the BM25/tf-idf scorers in llm/quality.py
would consult instead of re-scanning the corpus.

Scale design: one corpus explode collapses map-side to the
(term, doc_id, tf) frame — the index's natural unit — and is pinned;
dictionary statistics are a term-keyed aggregate of that frame, and
the postings HEAD is rank-filtered (row_number ≤ cap per term)
BEFORE any list materializes, so a stopword with corpus-sized df
still only ever collects ``cap`` doc ids. A production build would
range-partition by term and write full postings as parquet pages;
the capped head here is the driver-hashable audit view of the same
plan.

Determinism: postings are sorted before joining into the output
string (collect_list order is partition-dependent); all other
columns are exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..cache import pin
from ..registry import register
from ..sources.catalog import Catalog

#: postings-head cap per term
INDEX_POSTINGS_CAP = 20


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per term: document frequency, collection frequency,
    and the first ``INDEX_POSTINGS_CAP`` doc_ids (ascending,
    comma-joined — a string so the driver compare stays scalar)."""
    cat = Catalog(spark, sf_dir)
    td = pin(
        cat.documents
        .select("doc_id",
                F.explode(F.split(F.trim(F.col("text")), r"\s+"))
                .alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    stats = td.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"))
    w = Window.partitionBy("term").orderBy("doc_id")
    top = (
        td.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= INDEX_POSTINGS_CAP)
        .groupBy("term")
        .agg(F.array_join(
            F.transform(F.sort_array(F.collect_list("doc_id")),
                        lambda x: x.cast("string")), ",")
            .alias("postings_head"))
    )
    return stats.join(top, "term").orderBy("term")


INVERTED_INDEX_SQL = f"""
WITH td AS (
    SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (
        SELECT doc_id,
               UNNEST(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
    )
    GROUP BY 1, 2
),
stats AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS cf
    FROM td GROUP BY 1
),
ranked AS (
    SELECT term, doc_id,
           ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
    FROM td
),
top AS (
    SELECT term,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings_head
    FROM ranked WHERE rn <= {INDEX_POSTINGS_CAP}
    GROUP BY 1
)
SELECT s.term, s.df, s.cf, t.postings_head
FROM stats s JOIN top t ON s.term = t.term
ORDER BY s.term
"""

register("inverted_index_postings", inverted_index_postings,
         INVERTED_INDEX_SQL)

"""Corpus-assembly operators: sequence packing and train/eval
decontamination — the last-mile steps between a cleaned document set
and a training run (BASELINE.json north star). The reference app has
no analog (SURVEY.md §0); these are engine extensions like the rest of
the llm package.

Both ops are exact, integer-deterministic, and oracle-checked; both
reuse the tokenization/shingle conventions of llm.dedup so the whole
package agrees on what a "token" is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog
from .dedup import SHINGLE_K, _with_shingles
from .sampling import _bucket, _sql_bucket

#: training context length for packing (tokens)
CONTEXT = 512


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: assign documents (in doc_id order,
    per source) to fixed CONTEXT-token packs by cumulative offset —
    pack_id = floor(tokens_before / CONTEXT). A doc straddling a pack
    boundary belongs to the pack where it starts (the standard
    concat-then-chunk loader semantics). Output is the pack audit
    table: docs and tokens per pack.

    Scale: one window (partitioned by source — the stream/shard key,
    so state never concentrates) + one aggregation; all arithmetic is
    exact int64, so the plan is deterministic under any parallelism.
    A 100 TB run would partition the window by (source, day-shard) to
    bound any single partition's sort."""
    cat = Catalog(spark, sf_dir)
    tok = cat.documents.select(
        "source", "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    packed = tok.withColumn(
        "pack_id",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
                / F.lit(float(CONTEXT))).cast("long"))
    return (
        packed.groupBy("source", "pack_id")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").cast("long").alias("pack_tokens"))
        .orderBy("source", "pack_id")
    )


PACK_SEQUENCES_SQL = f"""
WITH tok AS (
    SELECT source, doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens
    FROM documents
),
packed AS (
    SELECT source, n_tokens,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / {float(CONTEXT)}) AS BIGINT) AS pack_id
    FROM tok
)
SELECT source, pack_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM packed
GROUP BY 1, 2
ORDER BY 1, 2
"""


def decontaminate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination report: for each eval-split document
    (llm.sampling bucket ≥ 90), how many of its {SHINGLE_K}-word
    shingles also occur anywhere in the train split. A production
    pipeline drops or rewrites flagged docs; here we emit the audit.

    Plan shape: explode shingles on both sides, inner-join on the
    shingle — identical blocking economics to dedup_ngram_jaccard
    (zero-overlap pairs never materialize). The train side is
    DISTINCT-reduced before the join so each shingle carries one row
    regardless of train-set frequency; at 100 TB the same join runs
    shuffle-partitioned on the shingle hash with hot-shingle capping."""
    cat = Catalog(spark, sf_dir)
    sh = _with_shingles(cat.documents).select(
        "doc_id", _bucket("doc_id").alias("bucket"),
        F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("shingle"))
    train_sh = (sh.filter(F.col("bucket") < 90)
                .select("shingle").distinct())
    eval_sh = sh.filter(F.col("bucket") >= 90)
    return (
        eval_sh.join(train_sh, "shingle")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_contaminated"))
        .select(
            "doc_id", "n_contaminated", "n_shingles",
            fround(F.col("n_contaminated").cast("double")
                   / F.col("n_shingles").cast("double"), 6)
            .alias("contamination_rate"))
        .orderBy("doc_id")
    )


DECONTAMINATE_SQL = f"""
WITH tok AS (
    SELECT doc_id, {_sql_bucket('doc_id')} AS bucket,
           string_split_regex(trim(text), '\\s+') AS tokens
    FROM documents
),
sh AS (
    SELECT doc_id, bucket, len(shingles) AS n_shingles,
           unnest(shingles) AS shingle
    FROM (
        SELECT doc_id, bucket,
               list_distinct(list_transform(
                   range(1, len(tokens) - {SHINGLE_K} + 2),
                   i -> array_to_string(tokens[i : i + {SHINGLE_K} - 1], ' ')
               )) AS shingles
        FROM tok WHERE len(tokens) >= {SHINGLE_K})
),
train AS (SELECT DISTINCT shingle FROM sh WHERE bucket < 90)
SELECT e.doc_id, COUNT(*) AS n_contaminated, e.n_shingles,
       {sql_fround('CAST(COUNT(*) AS DOUBLE) / CAST(e.n_shingles AS DOUBLE)', 6)}
           AS contamination_rate
FROM sh e JOIN train t ON e.shingle = t.shingle
WHERE e.bucket >= 90
GROUP BY e.doc_id, e.n_shingles
ORDER BY e.doc_id
"""


register("pack_sequences", pack_sequences, PACK_SEQUENCES_SQL)
register("decontaminate_report", decontaminate_report, DECONTAMINATE_SQL)

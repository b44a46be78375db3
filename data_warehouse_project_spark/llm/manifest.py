"""Corpus-build manifest — the whole training-data pipeline composed
into ONE declarative plan: near-dup survivor selection (llm/clusters),
quality-classifier keep (llm/quality), and the deterministic
train/eval split (llm/sampling), joined into a per-document manifest
(`final_keep` = survives dedup AND passes quality) that a corpus
materialization would filter on.

This is the composition story, not a new primitive: every stage is an
already-oracle-checked registered query, and Catalyst fuses them —
the survivor table is pair-graph-sized and broadcasts, the quality
pass is expression work on the same documents scan, and the split is
a pure function of doc_id. The DuckDB oracle composes the SAME stage
SQL verbatim, so the driver checks the composed semantics end-to-end.

At 100 TB the manifest is the right shape: one corpus-wide pass plus
a broadcast of the (tiny) dedup-survivor table; the manifest writes
date/bucket-partitioned and downstream jobs anti-join or semi-join it
rather than re-running any pipeline stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..sources.catalog import Catalog
from .clusters import DEDUP_SURVIVORS_SQL, dedup_survivors
from .quality import QUALITY_SCORE_SQL, quality_score_linear
from .sampling import _bucket, _sql_bucket


def corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    surv = dedup_survivors(spark, sf_dir).select(
        "doc_id", (F.col("is_kept") == 1).alias("surv_kept"))
    q = quality_score_linear(spark, sf_dir).select(
        "doc_id", "score", F.col("keep").alias("quality_keep"))
    b = _bucket("doc_id")
    return (
        cat.documents.select("doc_id")
        # unclustered documents have no near-dup, so they survive dedup
        .join(F.broadcast(surv), "doc_id", "left")
        .join(q, "doc_id")
        .select(
            "doc_id",
            F.coalesce(F.col("surv_kept"), F.lit(True)).alias("dedup_keep"),
            "quality_keep",
            "score",
            F.when(b < 90, F.lit("train")).otherwise(F.lit("eval"))
            .alias("split"),
            (F.coalesce(F.col("surv_kept"), F.lit(True))
             & F.col("quality_keep")).alias("final_keep"),
        )
    )


CORPUS_MANIFEST_SQL = f"""
SELECT d.doc_id,
       COALESCE(s.is_kept = 1, TRUE) AS dedup_keep,
       q.keep AS quality_keep,
       q.score,
       CASE WHEN {_sql_bucket('d.doc_id')} < 90 THEN 'train' ELSE 'eval' END
           AS split,
       (COALESCE(s.is_kept = 1, TRUE) AND q.keep) AS final_keep
FROM documents d
LEFT JOIN ({DEDUP_SURVIVORS_SQL}) s ON s.doc_id = d.doc_id
JOIN ({QUALITY_SCORE_SQL}) q ON q.doc_id = d.doc_id
"""

register("corpus_manifest", corpus_manifest, CORPUS_MANIFEST_SQL)

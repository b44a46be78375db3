"""Deterministic sampling & train/eval splitting over `documents` —
core corpus-pipeline operations the reference lacks (BASELINE.json
north star: training-data pipeline at 100 TB).

Why not df.sample(): Bernoulli sampling is seed- AND partitioning-
dependent, so the selected set changes whenever the file layout or
parallelism changes — unacceptable for a training corpus, where the
split must be a pure function of the record identity (reproducible
across reruns, clusters, and engines, and stable under re-partition).

Policy here: key-hash bucketing. A record's bucket is a deterministic
function of its key (`pmod(hash, 100)`); splits and samples are bucket
-range predicates. This is how public corpus pipelines implement
held-out splits (e.g. URL-hash splits in C4/RefinedWeb-style setups).
At scale the op is a pure narrow filter — no shuffle, full codegen,
reads prune to the id/metadata columns only.

Cross-engine note: Spark's hash() (Murmur3) and DuckDB's hash() don't
agree, so the oracle-checked bucketing uses arithmetic both engines
compute identically on int64 (a Knuth-style multiplicative mix modulo
a prime). A production Spark-only deployment would use
pmod(xxhash64(key), 100) — same plan shape, stronger mixing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog

#: multiplicative-mix constants: a large odd multiplier and a Mersenne
#: prime modulus keep int64 arithmetic exact (and identical) in both
#: engines; buckets 0..99
_MULT = 2654435761          # Knuth's 2^32 / phi
_PRIME = 2147483647         # 2^31 - 1


def _bucket(key_col) -> F.Column:
    return F.pmod((F.col(key_col) * F.lit(_MULT)) % F.lit(_PRIME),
                  F.lit(100)).cast("int")


def _sql_bucket(key_sql: str) -> str:
    return f"CAST(((({key_sql}) * {_MULT}) % {_PRIME}) % 100 AS INTEGER)"


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/held-out split of the corpus: bucket
    = mix(doc_id) mod 100; buckets 0-89 train, 90-99 eval. Returns the
    per-split document and character counts (the audit view a corpus
    build logs); the split predicate itself is the same bucket
    expression used as a filter on the full table."""
    cat = Catalog(spark, sf_dir)
    b = _bucket("doc_id")
    return (
        cat.documents
        .select(F.when(b < 90, F.lit("train")).otherwise(F.lit("eval"))
                .alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("total_chars"))
        .orderBy("split")
    )


TRAIN_TEST_SPLIT_SQL = f"""
SELECT CASE WHEN {_sql_bucket('doc_id')} < 90 THEN 'train' ELSE 'eval' END
           AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
ORDER BY 1
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling — the data-mixing
    primitive of corpus curation (e.g. keep 50% of 'en', 20% of
    everything else). The rate lookup is a CASE expression (broadcast
    map in a real config-driven build); selection is bucket < rate, a
    pure narrow filter at any scale. Output: per-language kept/total
    counts + realized rate, the mixing audit table."""
    cat = Catalog(spark, sf_dir)
    b = _bucket("doc_id")
    rate = F.when(F.col("lang") == "en", F.lit(50)).otherwise(F.lit(20))
    kept = (b < rate).cast("int")
    return (
        cat.documents
        .groupBy("lang")
        .agg(F.count("*").alias("n_total"),
             F.sum(kept).cast("long").alias("n_kept"))
        .select(
            "lang", "n_total", "n_kept",
            fround(F.col("n_kept").cast("double")
                   / F.col("n_total").cast("double"), 6).alias("kept_rate"))
        .orderBy("lang")
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {_sql_bucket('doc_id')} <
                         (CASE WHEN lang = 'en' THEN 50 ELSE 20 END)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       {sql_fround(
           "CAST(SUM(CASE WHEN " + _sql_bucket('doc_id') +
           " < (CASE WHEN lang = 'en' THEN 50 ELSE 20 END) "
           "THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)", 6)}
           AS kept_rate
FROM documents
GROUP BY lang
ORDER BY lang
"""


#: weighted reservoir sample size
RESERVOIR_K = 50


def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass weighted reservoir sample (Efraimidis & Spirakis's
    A-ES, the public algorithm): each record gets key u^(1/w) for
    u ~ U(0,1) and weight w; the sample is the top-k by key, which
    selects records with probability proportional to weight — here
    w = n_chars, the standard character-weighted corpus subsample
    (long documents proportionally likelier, as token-budget-aware
    pipelines want).

    Determinism (the df.sample() objection above, applied to weighted
    sampling): u derives from the same Knuth multiplicative mix of
    doc_id both engines compute exactly in int64, so the sample is a
    pure function of record identity — stable across reruns, layout,
    parallelism, and engines. Keys are compared as ln(u)/w (monotone
    in u^(1/w)), quantized to a 1e9 integer before ordering; ln
    carries the documented transcendental-ulp residual
    (functions/compat.py policy note), with a 1e9 grid making a
    boundary flip correspondingly unlikely.

    Scale design: a narrow scan computing one arithmetic key per row
    feeding TakeOrderedAndProject(k) — no shuffle, no global sort, no
    weight normalization pass (A-ES needs none), k rows to the
    driver. The single cheapest shape a 100 TB weighted subsample can
    have.
    """
    cat = Catalog(spark, sf_dir)
    h = (F.col("doc_id") * F.lit(_MULT)) % F.lit(_PRIME)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_PRIME))
    key = F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    return (
        cat.documents
        .select("doc_id", "source", "n_chars",
                F.floor(key * F.lit(1e9) + F.lit(0.5)).cast("long")
                .alias("qkey"))
        .orderBy(F.col("qkey").desc(), F.col("doc_id"))
        .limit(RESERVOIR_K)
        .select("doc_id", "source", "n_chars",
                fround(F.col("qkey").cast("double") / F.lit(1e9), 6)
                .alias("sample_key"))
    )


WEIGHTED_RESERVOIR_SQL = f"""
WITH keyed AS (
    SELECT doc_id, source, n_chars,
           CAST(FLOOR(
               LN((CAST((doc_id * {_MULT}) % {_PRIME} AS DOUBLE) + 0.5)
                  / {_PRIME})
               / CAST(GREATEST(n_chars, 1) AS DOUBLE)
               * 1000000000.0 + 0.5) AS BIGINT) AS qkey
    FROM documents
)
SELECT doc_id, source, n_chars,
       {sql_fround('CAST(qkey AS DOUBLE) / 1000000000.0', 6)} AS sample_key
FROM keyed
ORDER BY qkey DESC, doc_id
LIMIT {RESERVOIR_K}
"""


register("train_test_split", train_test_split, TRAIN_TEST_SPLIT_SQL)
register("stratified_sample", stratified_sample, STRATIFIED_SAMPLE_SQL)
register("weighted_reservoir_sample", weighted_reservoir_sample,
         WEIGHTED_RESERVOIR_SQL)

"""Embedding compression — per-dimension int8 (0..255) min/max
quantization with a reconstruction-error report and a driver-visible
error-bound gate (the standard memory lever for billion-vector ANN
serving: 4× smaller than float32, and the IVF/LSH indexes in
llm/similarity.py would score over the dequantized codes).

Cross-engine determinism: every float coordinate is first recovered
as an exact 6-decimal integer (the embedding_dim_stats idiom), so
min/max/range are exact longs; the code assignment and dequantized
error are then single IEEE ops (divide, multiply, floor, abs) on
identical operands — bit-identical both engines, zero libm risk.
Error sums quantize each term to an integer before SUM
(order-independent, compat.py hazard #1).

Scale design: two linear corpus passes over the posexplode fan-out —
one collapsing map-side to per-dim min/max (shuffle = dims rows),
one computing per-element errors that collapse map-side to per-dim
error sums (shuffle = dims rows again); the dims-sized quantization
table attaches to the second pass by broadcast. Nothing shuffles at
corpus scale, and a production run would fold pass two into the
writer that emits the int8 codes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog

#: float→exact-integer recovery scale (6 decimals, embedding idiom)
_Q = 1e6

#: int8 code range: 0..255
_LEVELS = 255.0

#: error-term quantization: thousandths of a q6 unit
_EQ = 1e3


def embedding_int8_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per embedding dimension: value range, quantization
    step, mean/max absolute reconstruction error of round-to-nearest
    int8 coding, and the theoretical-bound gate (max error ≤ step/2,
    plus the error-quantization slack). A False anywhere means the
    codec math is broken — the same pinned-gate pattern as
    ann_recall_floor / hll_distinct_accuracy_floor."""
    cat = Catalog(spark, sf_dir)
    ex = (
        cat.embeddings
        .select(F.posexplode("embedding").alias("dim", "x"))
        .select(F.col("dim").cast("long").alias("dim"),
                F.floor(F.col("x").cast("double") * F.lit(_Q)
                        + F.lit(0.5)).cast("long").alias("q"))
    )
    from ..cache import pin
    # pin the dims-sized bounds frame: the coded broadcast AND the
    # final join both consume it — unpinned, each recomputation was a
    # full posexplode corpus pass (review finding: 3 scans where the
    # docstring promises two)
    bounds = pin(
        ex.groupBy("dim")
        .agg(F.count("*").cast("long").alias("n_vecs"),
             F.min("q").alias("qmin"), F.max("q").alias("qmax"))
        .withColumn("qrange", (F.col("qmax") - F.col("qmin")).cast("long"))
    )
    # pass 2: code + dequantize + error per element, collapsed map-side
    coded = (
        ex.join(F.broadcast(bounds.select("dim", "qmin", "qrange")), "dim")
        .withColumn(
            "code",
            F.when(F.col("qrange") == 0, F.lit(0.0)).otherwise(
                F.floor((F.col("q") - F.col("qmin")).cast("double")
                        * F.lit(_LEVELS) / F.col("qrange").cast("double")
                        + F.lit(0.5))))
        .withColumn(
            "err",
            F.abs(F.col("q").cast("double")
                  - (F.col("qmin").cast("double")
                     + F.col("code") * F.col("qrange").cast("double")
                     / F.lit(_LEVELS))))
        .groupBy("dim")
        .agg(F.sum(F.floor(F.col("err") * F.lit(_EQ) + F.lit(0.5))
                   .cast("long")).alias("esum"),
             F.max(F.floor(F.col("err") * F.lit(_EQ) + F.lit(0.5))
                   .cast("long")).alias("emax"))
    )
    step_q6 = F.col("qrange").cast("double") / F.lit(_LEVELS)
    max_err = F.col("emax").cast("double") / F.lit(_EQ * _Q)
    return (
        bounds.join(coded, "dim")
        .select(
            "dim", "n_vecs",
            fround(F.col("qmin").cast("double") / F.lit(_Q), 6)
            .alias("vmin"),
            fround(F.col("qmax").cast("double") / F.lit(_Q), 6)
            .alias("vmax"),
            fround(step_q6 / F.lit(_Q), 9).alias("step"),
            fround(F.col("esum").cast("double")
                   / (F.col("n_vecs").cast("double") * F.lit(_EQ * _Q)), 9)
            .alias("mean_abs_err"),
            fround(max_err, 9).alias("max_abs_err"),
            (F.col("emax").cast("double")
             <= step_q6 * F.lit(_EQ) / F.lit(2.0) + F.lit(1.0))
            .alias("within_bound"))
        .orderBy("dim")
    )


EMB_INT8_SQL = f"""
WITH ex AS (
    SELECT CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
           CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1000000.0 + 0.5)
                AS BIGINT) AS q
    FROM embeddings
),
bounds AS (
    SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           MIN(q) AS qmin, MAX(q) AS qmax,
           CAST(MAX(q) - MIN(q) AS BIGINT) AS qrange
    FROM ex GROUP BY 1
),
coded AS (
    SELECT ex.dim,
           CAST(SUM(CAST(FLOOR(err * 1000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS esum,
           CAST(MAX(CAST(FLOOR(err * 1000.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS emax
    FROM (
        SELECT ex.dim, ex.q, b.qmin, b.qrange,
               ABS(CAST(ex.q AS DOUBLE)
                   - (CAST(b.qmin AS DOUBLE)
                      + (CASE WHEN b.qrange = 0 THEN 0.0
                              ELSE FLOOR(CAST(ex.q - b.qmin AS DOUBLE)
                                         * 255.0
                                         / CAST(b.qrange AS DOUBLE) + 0.5)
                         END) * CAST(b.qrange AS DOUBLE) / 255.0)) AS err
        FROM ex JOIN bounds b ON ex.dim = b.dim
    ) ex
    GROUP BY 1
)
SELECT b.dim, b.n_vecs,
       {sql_fround('CAST(b.qmin AS DOUBLE) / 1000000.0', 6)} AS vmin,
       {sql_fround('CAST(b.qmax AS DOUBLE) / 1000000.0', 6)} AS vmax,
       {sql_fround('CAST(b.qrange AS DOUBLE) / 255.0 / 1000000.0', 9)}
           AS step,
       {sql_fround('CAST(c.esum AS DOUBLE)'
                   ' / (CAST(b.n_vecs AS DOUBLE) * 1000000000.0)', 9)}
           AS mean_abs_err,
       {sql_fround('CAST(c.emax AS DOUBLE) / 1000000000.0', 9)}
           AS max_abs_err,
       CAST(c.emax AS DOUBLE)
           <= CAST(b.qrange AS DOUBLE) / 255.0 * 1000.0 / 2.0 + 1.0
           AS within_bound
FROM bounds b JOIN coded c ON b.dim = c.dim
ORDER BY b.dim
"""

register("embedding_int8_report", embedding_int8_report, EMB_INT8_SQL)

"""Similarity search over the `embeddings` table (array<float>, dim
64) — brute-force cosine top-k as the exact baseline, and a
random-hyperplane LSH bucketed variant as the scale path
(BASELINE.json training-data-pipeline mandate).

Scale design: brute-force is one broadcast (the query vector) + a
scan-local score + TakeOrdered — fine for one query over any corpus
size, linear cost. For many-query / all-pairs workloads the LSH
variant buckets vectors by hyperplane sign bits so only in-bucket
candidates are scored: the all-pairs O(n²) never materializes.
Dot products run through higher-order array functions (zip_with +
aggregate) entirely JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog

DIM = 64
QUERY_VEC_ID = 0
TOP_K = 10

#: cosine(a, b) with double accumulation, expressed with HOFs.
_COS_EXPR = """
    aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),
              0D, (acc, v) -> acc + v)
    / (sqrt(aggregate(a, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))
       * sqrt(aggregate(b, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))
"""


def knn_brute_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors of vec_id=0 (self excluded).

    The 1-row query side is a broadcast nested-loop join (the right
    plan: no shuffle of the corpus); scoring is scan-local; the top-k
    is a TakeOrdered, not a global sort.
    """
    cat = Catalog(spark, sf_dir)
    query = (cat.embeddings.filter(F.col("vec_id") == QUERY_VEC_ID)
             .select(F.col("embedding").alias("b")))
    return (
        cat.embeddings.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumnRenamed("embedding", "a")
        .join(F.broadcast(query))
        .select(
            "vec_id", "label",
            fround(F.expr(_COS_EXPR), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


_DUCK_COS = f"""
    list_sum(list_transform(range(1, {DIM} + 1),
        i -> (e.embedding::DOUBLE[])[i] * q.b[i]))
    / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x)))
       * sqrt(list_sum(list_transform(q.b, x -> x * x))))"""

KNN_BRUTE_SQL = f"""
WITH q AS (
    SELECT embedding::DOUBLE[] AS b FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
scored AS (
    SELECT e.vec_id, e.label,
           {sql_fround(_DUCK_COS, 6)} AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, label, cos_sim FROM scored
ORDER BY cos_sim DESC, vec_id LIMIT {TOP_K}
"""


def centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm + member count — the vector-aggregate
    shape (mean pooling) used for IVF coarse quantization. Element-
    wise mean via posexplode + group, fully built-in."""
    cat = Catalog(spark, sf_dir)
    # scaled-integer sums: FP addition is order-dependent and Spark's
    # partial-agg order is nondeterministic (functions.compat policy)
    comps = (
        cat.embeddings
        .select("label", F.posexplode("embedding").alias("pos", "comp"))
        .groupBy("label", "pos")
        .agg(
            (F.sum(F.floor(F.col("comp").cast("double") * F.lit(1e9)
                           + F.lit(0.5)).cast("long")).cast("double")
             / (F.lit(1e9) * F.count("comp"))).alias("mean_comp"),
        )
    )
    return (
        comps.groupBy("label")
        .agg(
            fround(
                F.sqrt(
                    F.sum(F.floor(F.col("mean_comp") * F.col("mean_comp")
                                  * F.lit(1e12) + F.lit(0.5)).cast("long"))
                    .cast("double") / F.lit(1e12)
                ), 6,
            ).alias("centroid_norm"),
        )
        .join(
            cat.embeddings.groupBy("label").agg(F.count("*").alias("n_vectors")),
            "label",
        )
        .select("label", "centroid_norm", "n_vectors")
    )


CENTROID_SQL = f"""
WITH comps AS (
    SELECT label, u.pos,
           CAST(SUM(CAST(FLOOR(u.comp * 1000000000.0 + 0.5) AS BIGINT))
                AS DOUBLE) / (1000000000.0 * COUNT(u.comp)) AS mean_comp
    FROM embeddings,
         LATERAL (SELECT UNNEST(embedding::DOUBLE[]) AS comp,
                         generate_subscripts(embedding, 1) AS pos) u
    GROUP BY label, u.pos
),
norms AS (
    SELECT label,
           {sql_fround("sqrt(CAST(SUM(CAST(FLOOR(mean_comp * mean_comp * 1000000000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000000.0)", 6)}
               AS centroid_norm
    FROM comps GROUP BY label
)
SELECT n.label, n.centroid_norm, c.n_vectors
FROM norms n
JOIN (SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY label) c
  ON n.label = c.label
"""


def _hyperplane_lit(n_planes: int, dim: int, seed: int = 42):
    """Deterministic pseudo-random ±1 hyperplanes as a literal array —
    derived from a fixed LCG so the operator needs no external state.
    """
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(1.0 if (state >> 63) else -1.0)
        planes.append(row)
    return F.array(*[
        F.array(*[F.lit(v) for v in row]) for row in planes
    ])


#: ANN multi-table LSH: L tables of b sign-bits, OR-amplified.
#: With moderate-similarity neighbors (cos ≈ 0.5 in the driver data,
#: p_bit = 1 - θ/π ≈ 0.67) a true top-10 member shares some bucket
#: with probability 1 - (1 - 0.67⁵)¹² ≈ 0.82, while a random vector
#: (cos ≈ 0, p_bit = 0.5) is scored with probability ≈ 0.3 — i.e.
#: ~0.8 recall for ~⅓ of brute-force cost on this deliberately
#: cluster-free corpus. On real embedding corpora (neighbors at
#: cos ≥ 0.9) the same L·b gives ≳0.99 recall at a few % cost; the
#: two knobs tune to the similarity profile.
ANN_TABLES = 12
ANN_BITS = 5


def ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors of vec_id=0 via multi-table
    random-hyperplane LSH: a vector is a candidate if it shares ANY
    table's bucket with the query; only candidates are exact-scored.

    One vectorized projection assigns all L bucket ids per vector;
    the query's L buckets broadcast; the candidate set resolves as a
    semi-join. No SQL oracle (bucketing is engine-defined); unit
    tests assert recall against knn_brute_cosine.
    """
    cat = Catalog(spark, sf_dir)
    buckets_udf = _band_buckets_udf(ANN_TABLES, ANN_BITS, seed=99)
    bucketed = cat.embeddings.select(
        "vec_id",
        F.posexplode(buckets_udf(F.col("embedding"))).alias("band", "bucket"),
    )
    qbuckets = (bucketed.filter(F.col("vec_id") == QUERY_VEC_ID)
                .select("band", F.col("bucket").alias("qbucket")))
    candidates = (
        bucketed.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qbuckets),
              (bucketed.band == qbuckets.band)
              & (F.col("bucket") == F.col("qbucket")))
        .select("vec_id")
        .distinct()
    )
    query = (cat.embeddings.filter(F.col("vec_id") == QUERY_VEC_ID)
             .select(F.col("embedding").alias("b")))
    return (
        cat.embeddings.join(candidates, "vec_id", "left_semi")
        .withColumnRenamed("embedding", "a")
        .join(F.broadcast(query))
        .select("vec_id", "label",
                fround(F.expr(_COS_EXPR), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


def embedding_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate vectors: group by the full embedding array
    (array equality) — the embedding-level exact dedup pass."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.embeddings
        .groupBy("embedding")
        .agg(F.min("vec_id").alias("keeper_vec_id"),
             F.count("*").alias("n_copies"))
        .select("keeper_vec_id", "n_copies")
    )


EMBEDDING_DUP_SQL = """
SELECT MIN(vec_id) AS keeper_vec_id, COUNT(*) AS n_copies
FROM embeddings GROUP BY embedding
"""


register("knn_brute_cosine", knn_brute_cosine, KNN_BRUTE_SQL)
register("centroid_per_label", centroid_per_label, CENTROID_SQL)
register("ann_lsh_cosine", ann_lsh_cosine, None)
register("embedding_dup_exact", embedding_dup_exact, EMBEDDING_DUP_SQL)


#: LSH blocking for the near-dup pair query: OR-amplified sign-LSH.
#: At the 0.99 cosine threshold a hyperplane agrees with probability
#: 1 - acos(0.99)/pi ~= 0.955, so an 8-bit band matches with
#: p = 0.955^8 ~= 0.69 and 12 independent bands miss a true pair with
#: probability (1-p)^12 < 1e-6. Verified exhaustively against the
#: all-pairs form in unit tests (planted near-dups) and at sf0.01.
DEDUP_COS_THRESHOLD = 0.99
DEDUP_COS_BANDS = 12
DEDUP_COS_BITS = 8
#: hot-bucket guard, mirroring dedup.MAX_BUCKET: bounds the O(k²)
#: in-bucket pair generation. Set far above any non-pathological
#: bucket population — a bucket beyond it implies a near-dup cluster
#: whose pairwise OUTPUT is itself quadratic in the cluster size; the
#: scale remedy for such corpora is cluster-level dedup
#: (llm/clusters.py), not a bigger pair list.
MAX_VEC_BUCKET = 4096


def _band_buckets_udf(n_bands: int, bits: int, dim: int = DIM,
                      seed: int = 42):
    """pandas_udf: embedding -> array of per-band bucket ids.

    Hyperplanes are the same deterministic LCG family as
    _hyperplane_lit, materialized as a numpy matrix; the whole batch
    is one (batch × dim) @ (dim × n_bands·bits) matmul + bit-packing —
    the justified-pandas_udf category (a 96-plane interpreted
    higher-order-function dot per row would be ~100× slower).
    """
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    n_planes = n_bands * bits
    state = seed
    rows = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(1.0 if (state >> 63) else -1.0)
        rows.append(row)
    planes = np.array(rows, dtype=np.float64)        # (n_planes, dim)
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(emb: pd.Series) -> pd.Series:
        if emb.empty:
            return pd.Series([], dtype=object)
        m = np.array(emb.tolist(), dtype=np.float64)  # (n, dim)
        signs = (m @ planes.T) > 0                    # (n, n_planes)
        out = [
            signs[:, b * bits:(b + 1) * bits].astype(np.int64) @ weights
            for b in range(n_bands)
        ]
        packed = np.stack(out, axis=1)                # (n, n_bands)
        return pd.Series(list(packed))

    return _buckets


def dedup_embedding_cosine_allpairs(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Exact all-pairs ground truth for the near-dup pair semantics —
    O(n²) nested-loop by construction. NOT registered as a driver
    query: it exists as the unit-test oracle the blocked form is
    checked against (tests/test_llm_ops.py)."""
    cat = Catalog(spark, sf_dir)
    vecs = cat.embeddings.select("vec_id", "embedding")
    a = vecs.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("a"))
    b = vecs.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("b"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", fround(F.expr(_COS_EXPR), 6))
        .filter(F.coalesce(F.col("cos_sim") >= DEDUP_COS_THRESHOLD,
                           F.lit(False)))
        .select("vec_a", "vec_b", "cos_sim")
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with
    cosine ≥ 0.99, LSH-blocked.

    Plan shape (the 100 TB path — no all-pairs nested loop anywhere):
    1. one numpy-vectorized projection assigns every vector 12
       8-bit sign-LSH bucket ids (OR-amplification: < 1e-6 chance a
       ≥ 0.99 pair shares no bucket — see DEDUP_COS_BANDS note);
    2. groupBy (band, bucket) collects in-bucket vec_id lists and
       emits in-bucket pairs (bounded by MAX_VEC_BUCKET), distinct;
    3. the (tiny) candidate set broadcasts back against `embeddings`
       twice and only candidates get exact-cosine verified.
    Cost is Σ bucket², not n²; the corpus shuffles bucket ids (longs),
    never vector pairs. Oracle: the same all-pairs SQL as the ground
    truth (blocking is recall-lossless at the threshold); equality
    with dedup_embedding_cosine_allpairs is unit-tested on planted
    near-dup corpora.
    """
    cat = Catalog(spark, sf_dir)
    vecs = cat.embeddings.select("vec_id", "embedding")
    buckets_udf = _band_buckets_udf(DEDUP_COS_BANDS, DEDUP_COS_BITS)
    bands = vecs.select(
        "vec_id",
        F.posexplode(buckets_udf(F.col("embedding"))).alias("band", "bucket"),
    )
    candidates = (
        bands.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("vs"))
        .filter((F.size("vs") > 1) & (F.size("vs") <= MAX_VEC_BUCKET))
        .select(F.explode(F.expr(
            "flatten(transform(vs, (x, i) -> "
            "transform(slice(vs, i + 2, size(vs) - i - 1), "
            "y -> struct(x AS vec_a, y AS vec_b))))"
        )).alias("p"))
        .select("p.vec_a", "p.vec_b")
        .distinct()
    )
    emb_a = vecs.select(F.col("vec_id").alias("vec_a"),
                        F.col("embedding").alias("a"))
    emb_b = vecs.select(F.col("vec_id").alias("vec_b"),
                        F.col("embedding").alias("b"))
    cand_a = emb_a.join(F.broadcast(candidates), "vec_a")
    return (
        emb_b.join(F.broadcast(cand_a), "vec_b")
        .withColumn("cos_sim", fround(F.expr(_COS_EXPR), 6))
        .filter(F.coalesce(F.col("cos_sim") >= DEDUP_COS_THRESHOLD,
                           F.lit(False)))
        .select("vec_a", "vec_b", "cos_sim")
    )


_DUCK_COS_AB = f"""
    list_sum(list_transform(range(1, {DIM} + 1),
        i -> (a.embedding::DOUBLE[])[i] * (b.embedding::DOUBLE[])[i]))
    / (sqrt(list_sum(list_transform(a.embedding::DOUBLE[], x -> x * x)))
       * sqrt(list_sum(list_transform(b.embedding::DOUBLE[], x -> x * x))))"""

DEDUP_EMBEDDING_COSINE_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {sql_fround(_DUCK_COS_AB, 6)} AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {sql_fround(_DUCK_COS_AB, 6)} >= 0.99
"""

register("dedup_embedding_cosine", dedup_embedding_cosine,
         DEDUP_EMBEDDING_COSINE_SQL)


def ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors: KMeans
    coarse quantizer (k=16, fixed seed) partitions the corpus into
    cells; the query probes its nprobe=8 nearest cells and exact-
    scores only those vectors.

    The Spark-ML KMeans fit is the one iterative/ML component in the
    engine — at 100 TB it trains on a sample and the cell assignment
    is a broadcast-centroid map stage; search cost drops by
    ~k/nprobe. Rows-only check (centroids are model-dependent);
    recall vs knn_brute_cosine asserted in unit tests.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    nprobe = 8
    cat = Catalog(spark, sf_dir)
    vecs = cat.embeddings.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>")))
    model = KMeans(k=16, seed=42, featuresCol="features").fit(vecs)
    assigned = model.transform(vecs).withColumnRenamed("prediction", "cell")

    # query vector + its nprobe nearest centroids
    centroids = [(i, [float(x) for x in c])
                 for i, c in enumerate(model.clusterCenters())]
    cent_df = spark.createDataFrame(centroids, "cell int, centroid array<double>")
    query = (assigned.filter(F.col("vec_id") == QUERY_VEC_ID)
             .select(F.col("embedding").alias("qe")))
    probe_cells = (
        cent_df.join(F.broadcast(query))
        .withColumn("dist", F.expr(
            "aggregate(zip_with(centroid, qe, (c, q) -> "
            "(c - cast(q as double)) * (c - cast(q as double))), "
            "0D, (acc, v) -> acc + v)"))
        .orderBy("dist").limit(nprobe).select("cell")
    )

    candidates = assigned.join(F.broadcast(probe_cells), "cell").filter(
        F.col("vec_id") != QUERY_VEC_ID)
    return (
        candidates
        .withColumnRenamed("embedding", "a")
        .join(F.broadcast(query.select(F.col("qe").alias("b"))))
        .select("vec_id", "label", fround(F.expr(_COS_EXPR), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


register("ann_ivf_cosine", ann_ivf_cosine, None)


N_BATCH_QUERIES = 5


def knn_batch_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact KNN: top-5 neighbors for EACH of the first
    N_BATCH_QUERIES vectors in one job — the batch-serving shape
    (one broadcast of the query set, one corpus scan, a per-query
    top-k window instead of N separate jobs)."""
    cat = Catalog(spark, sf_dir)
    queries = (cat.embeddings.filter(F.col("vec_id") < N_BATCH_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("b")))
    scored = (
        cat.embeddings
        .withColumnRenamed("embedding", "a")
        .join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                fround(F.expr(_COS_EXPR), 6).alias("cos_sim"))
    )
    from ..operators.windows import top_k_per_group
    return top_k_per_group(
        scored, ["query_id"], [F.col("cos_sim"), -F.col("vec_id")],
        k=5, descending=True, rank_col="rank",
    ).select("query_id", "rank", "vec_id", "cos_sim")


KNN_BATCH_SQL = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS b
    FROM embeddings WHERE vec_id < {N_BATCH_QUERIES}
),
scored AS (
    SELECT q.query_id, e.vec_id,
           {sql_fround(_DUCK_COS, 6)} AS cos_sim
    FROM embeddings e JOIN q ON e.vec_id <> q.query_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, rank, vec_id, cos_sim FROM ranked WHERE rank <= 5
"""

register("knn_batch_cosine", knn_batch_cosine, KNN_BATCH_SQL)

"""Deduplication operators over `documents` — exact, MinHash+LSH,
SimHash, and n-gram Jaccard (BASELINE.json training-data-pipeline
mandate).

Scale design:
- Exact dedup groups on a fingerprint digest, not the body: the
  shuffle carries 16-byte keys at any corpus size.
- MinHash+LSH is the canonical near-dup pipeline: shingle → K minhash
  values (xxhash64 with K seeds, all JVM-side) → band → bucket-join.
  The candidate join is on (band_id, band_hash) buckets, so the
  all-pairs O(n²) never materializes; only in-bucket pairs are
  verified with exact Jaccard.
- SimHash packs a document into one 64-bit signature; banding the
  signature into 16-bit keys finds hamming-close pairs with joins.
- All of it is DataFrame ops — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog

#: minhash configuration: NUM_HASHES = BANDS * ROWS_PER_BAND
NUM_HASHES = 32
BANDS = 8
ROWS_PER_BAND = 4
SHINGLE_K = 5          # word-shingle width
JACCARD_THRESHOLD = 0.4


def _with_shingles(df: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """tokens → distinct k-word shingles (positional word n-grams).

    Repartition first: the corpus often arrives as few large files,
    and shingling is per-row CPU work (higher-order functions are
    interpreted, not codegen'd) — spread it across all cores before
    paying it. The partition count is explicit: rows are few but
    CPU-heavy, and AQE would coalesce a byte-sized implicit shuffle
    back to one partition.
    """
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(n_parts, "doc_id")
        .withColumn("tokens", F.split(F.trim(F.col("text")), r"\s+"))
        # filter on the CHEAP token count, not on size(shingles):
        # Catalyst pushes filters below the repartition, and a filter
        # containing the shingle expression would re-run the whole
        # (interpreted, expensive) shingling single-threaded at the scan
        .filter(F.size(F.col("tokens")) >= k)
        .withColumn(
            "shingles",
            F.expr(
                f"array_distinct(transform(sequence(0, size(tokens) - {k}),"
                f" i -> concat_ws(' ', slice(tokens, i + 1, {k}))))"
            ),
        )
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one keeper (min doc_id) per distinct normalized
    text; n_copies counts the duplicate cluster size."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.documents
        .withColumn(
            "fingerprint",
            F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))),
        )
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"),
             F.count("*").alias("n_copies"))
    )


DEDUP_EXACT_SQL = """
SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
       MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All candidate document pairs sharing ≥1 word 5-gram, with their
    exact Jaccard similarity over distinct shingles, thresholded.

    The shared-shingle join IS the blocking step: pairs with zero
    shingle overlap are never generated, so cost is bounded by
    shingle-frequency skew, not n². (At 100 TB you'd additionally cap
    per-shingle document lists — hot-shingle salting.)
    """
    cat = Catalog(spark, sf_dir)
    sh = _with_shingles(cat.documents).select(
        "doc_id", F.size("shingles").alias("n_shingles"),
        F.explode("shingles").alias("shingle"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_shingles").alias("n_a"),
            F.col("b.n_shingles").alias("n_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    return (
        pairs
        .withColumn(
            "jaccard",
            fround(F.col("shared")
                   / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6),
        )
        .filter(F.coalesce(F.col("jaccard") >= JACCARD_THRESHOLD,
                           F.lit(False)))
        .select("doc_a", "doc_b", F.col("shared").alias("n_shared_shingles"),
                "jaccard")
    )


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
    FROM documents
),
sh AS (
    SELECT doc_id, list_distinct(list_transform(
               range(1, len(tokens) - {SHINGLE_K} + 2),
               i -> array_to_string(tokens[i : i + {SHINGLE_K} - 1], ' ')
           )) AS shingles
    FROM toks
    WHERE len(tokens) >= {SHINGLE_K}
),
exploded AS (
    SELECT doc_id, len(shingles) AS n_shingles, UNNEST(shingles) AS shingle
    FROM sh
),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.n_shingles AS n_a, b.n_shingles AS n_b,
           COUNT(*) AS shared
    FROM exploded a JOIN exploded b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS n_shared_shingles,
       {sql_fround('shared / CAST(n_a + n_b - shared AS DOUBLE)', 6)} AS jaccard
FROM pairs
WHERE {sql_fround('shared / CAST(n_a + n_b - shared AS DOUBLE)', 6)}
      >= {JACCARD_THRESHOLD}
"""


def minhash_signatures(df: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """doc_id → array of NUM_HASHES minhash values (from raw docs)."""
    sh = _with_shingles(df).withColumn("n_shingles", F.size("shingles"))
    return minhash_signatures_from(sh, num_hashes)


def minhash_signatures_from(sh: DataFrame,
                            num_hashes: int = NUM_HASHES) -> DataFrame:
    """Signatures from a prepared (doc_id, shingles, n_shingles) frame.

    minhash_j(doc) = min over shingles of xxhash64(shingle, j) — the
    salt argument varies the hash family. One nested higher-order
    expression produces the whole signature array: per-row JVM work,
    no shuffle, no UDF, and a plan tree of constant size.

    The `transform(array(shingles), sh -> ...)[0]` wrapper is load-
    bearing: Catalyst's projection collapse inlines the (expensive)
    shingle-construction expression into this projection, and without
    the wrapper the inner lambda would RE-EVALUATE it once per hash
    seed — 32x the shingling cost (measured: ~20ms/doc vs ~0.6ms).
    Binding it to a lambda variable forces single evaluation.
    """
    return sh.select(
        "doc_id", "n_shingles",
        F.expr(
            "transform(array(shingles), sh_once -> "
            f"transform(sequence(0, {num_hashes - 1}), "
            "j -> array_min(transform(sh_once, s -> xxhash64(s, j)))))[0]"
        ).alias("signature"),
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates, verified with exact Jaccard.

    Pipeline: signature (32 hashes) → 8 bands × 4 rows → bucket id =
    hash(band values) → groupBy (band, bucket) collecting in-bucket
    doc lists → generate in-bucket pairs → distinct → exact Jaccard
    verify ≥ threshold.

    groupBy-and-pair-generate instead of a bands self-join: the
    self-join evaluated the shingle→signature subtree once per join
    branch (needing an eager persist to avoid), while a groupBy
    consumes it exactly once and shuffles only (band, bucket, doc_id)
    longs. Bucket population is bounded by band collisions; a 100 TB
    deployment caps per-bucket list size (hot-bucket guard) the same
    way hot shingles are capped in dedup_ngram_jaccard.

    No SQL oracle: xxhash64 is Spark-specific; correctness is pinned
    by unit tests (known near-dup pairs + agreement with the exact
    dedup_ngram_jaccard query, which shares the threshold).
    """
    cat = Catalog(spark, sf_dir)
    # the shingle frame feeds signature generation AND pair
    # verification; recomputing it per branch beats persist() here —
    # shingling is ~0.5s of CPU while caching the string arrays costs
    # ~10x that in block-store serialization (measured at sf0.1)
    sh_all = _with_shingles(cat.documents).select(
        "doc_id", "shingles", F.size("shingles").alias("n_shingles")
    )
    sigs = minhash_signatures_from(sh_all)

    # same bind-once wrapper as in minhash_signatures_from: the
    # signature expression (which embeds the shingle construction)
    # would otherwise be re-evaluated once per band by projection
    # collapse
    _r = ROWS_PER_BAND
    bands = sigs.select(
        "doc_id",
        F.explode(F.expr(
            "transform(array(signature), sig -> "
            f"transform(sequence(0, {BANDS - 1}), b -> named_struct("
            f"'band', cast(b as int), "
            f"'bucket', xxhash64(sig[b * {_r}], sig[b * {_r} + 1], "
            f"sig[b * {_r} + 2], sig[b * {_r} + 3]))))[0]"
        )).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    candidates = (
        bands.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
        .select(F.explode(F.expr(
            "flatten(transform(ds, (x, i) -> "
            "transform(slice(ds, i + 2, size(ds) - i - 1), "
            "y -> struct(x AS doc_a, y AS doc_b))))"
        )).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )

    # exact-Jaccard verification of candidates only. Broadcast the
    # (tiny) candidate pair set: the shingle arrays then stream
    # map-side through two broadcast-hash joins instead of being
    # serialized into a sort-merge shuffle.
    sh = sh_all
    cand_a = (
        sh.select(F.col("doc_id").alias("doc_a"),
                  F.col("shingles").alias("sh_a"),
                  F.col("n_shingles").alias("n_a"))
        .join(F.broadcast(candidates), "doc_a")
    )
    verified = (
        sh.select(F.col("doc_id").alias("doc_b"),
                  F.col("shingles").alias("sh_b"),
                  F.col("n_shingles").alias("n_b"))
        .join(F.broadcast(cand_a), "doc_b")
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            fround(F.col("shared")
                   / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6),
        )
        # null-TOLERANT threshold: a null-strict filter lets Catalyst
        # infer isnotnull(n_a/n_b) constraints and push them into the
        # scans — inlining the entire shingle expression into a
        # single-task scan filter (measured: 4.4s CPU per branch)
        .filter(F.coalesce(F.col("jaccard") >= JACCARD_THRESHOLD,
                           F.lit(False)))
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures + banded near-pair candidates.

    signature bit i = sign of sum over tokens of (bit i of
    xxhash64(token) ? +1 : -1). Bits computed as 64 conditional sums
    in one aggregation; candidate pairs share one of four 16-bit
    bands (hamming-distance blocking). No SQL oracle (xxhash64);
    pinned by unit tests.
    """
    cat = Catalog(spark, sf_dir)
    toks = (
        cat.documents
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("tokens", F.split(F.trim(F.col("text")), r"\s+"))
        .select("doc_id", F.explode("tokens").alias("token"))
        .withColumn("h", F.xxhash64("token"))
    )
    bit_sums = toks.groupBy("doc_id").agg(*[
        F.sum(
            F.when(F.expr(f"(h >> {i}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"bit_{i}")
        for i in range(64)
    ])
    # assemble signature as 4 × 16-bit band keys (avoids 64-bit sign
    # issues and is exactly the banding the join needs)
    band_exprs = []
    for band in range(4):
        bits = [
            f"(CASE WHEN bit_{band * 16 + j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(16)
        ]
        band_exprs.append(F.expr(" + ".join(bits)).alias(f"band_{band}"))
    sigs = bit_sums.select("doc_id", *band_exprs)

    a, b = sigs.alias("a"), sigs.alias("b")
    # banded candidate join via union of per-band equi-joins (each is
    # a hash join; an OR-of-bands condition would force a nested-loop
    # cross join)
    pair_frames = []
    for band in range(4):
        pair_frames.append(
            a.join(b, (F.col(f"a.band_{band}") == F.col(f"b.band_{band}"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
        )
    candidates = pair_frames[0]
    for pf in pair_frames[1:]:
        candidates = candidates.union(pf)
    return candidates.distinct()


register("dedup_exact", dedup_exact, DEDUP_EXACT_SQL)
register("dedup_ngram_jaccard", dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL)
register("dedup_minhash_lsh", dedup_minhash_lsh, None)
register("dedup_simhash", dedup_simhash, None)

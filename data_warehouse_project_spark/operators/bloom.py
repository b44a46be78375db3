"""Bloom-filter semi-join reduction — the shuffle-avoidance primitive
for selective fact⋈dim joins at scale (round 7; Bloom 1970, and the
technique behind Spark's own runtime `bloom_filter_agg` row-level
filtering, which Spark does not expose as a SQL/DataFrame function —
this is the same idea built from first principles in DataFrame ops).

The problem it solves at 100 TB: a fact⋈dim join where the dim
SUBSET is selective but the dim itself is too large to broadcast
would shuffle the entire fact table just to discard ~96% of it on
the other side. The Bloom reduction ships a FIXED-SIZE summary
instead: the dim subset's set-bit positions — at most k·BLOOM_M rows
of integers no matter how many keys the dim holds (one m-bit array
PER SEED, the partitioned-Bloom layout) — broadcast to the fact
scan, where k hash probes drop non-joining rows BEFORE the join
exchange. False positives survive the probe (and are removed by the
exact join that follows); false negatives are impossible: every set
bit of a present key was inserted by construction.

Plan shape: the bit table is a distinct over dim_keys × k seeds
(≤ k·min(n, BLOOM_M) rows — bounded by the filter geometry, not the
data); the probe is k broadcast LEFT SEMI joins on pmod(xxhash64(key,
seed), m) — JVM-side hashing, no Python, no explode, and the fact
table never shuffles a dropped row. The exact join that follows sees
the ~4%-selectivity survivor stream. Geometry here: m = 65 536 bits
per seed, k = 3 → the partitioned-layout theory FPR is
(1 − e^(−n/m))^k ≈ 1.6e-6 at the sf0.1 dim subset (n ≈ 800), and
≈ 0.16% even at a 10× larger subset (a shade below the classic
shared-array (1 − e^(−kn/m))^k at these fill factors); a production
deployment sizes m off the dim-subset count the same way.

Oracle: the headline query's answer is EXACT — the Bloom stage is a
pure pre-filter, so the oracle is the plain join+aggregate SQL with
no sketch anywhere (the strongest correctness statement available:
the optimization is invisible in the result). The floor gates the
filter's quality on a pinned-constant oracle: zero false negatives
(structural), measured false-positive rate ≤ gate, and genuine
pruning (survivor count ≤ gate × true-match count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..sources.catalog import Catalog

#: filter geometry: m bits, k hash probes
BLOOM_M = 65536
BLOOM_K = 3

#: dim-subset predicate: small parts (p_size ≤ 2 → ~4% of parts)
_PART_SIZE_MAX = 2

#: false-positive gate: measured FPR·10^6 ≤ 20 000 (2%) — vs the
#: partitioned-layout theory (1−e^(−n/m))^k ≈ 1.6e-6 at the sf0.1
#: subset size (n = 767 keys per 65 536-bit seed array) and ZERO
#: measured false positives at all three sfs (the fact's key domain
#: holds ~10³ distinct non-matching keys, so the expected FP count
#: is ≪ 1); the wide margin keeps the gate valid if driver data
#: regenerates with up to ~30× more qualifying keys
BLOOM_FPR_GATE_PPM = 20000

#: pruning gate: bloom survivors ≤ 1.05 × true-matching fact rows —
#: the filter must actually reduce the stream, not wave rows through
BLOOM_PASS_GATE_PCT = 105


def _positions(keycol, seed: int):
    return F.pmod(F.xxhash64(keycol.cast("string"), F.lit(seed)),
                  F.lit(BLOOM_M)).cast("long")


def bloom_bits(dim_keys: DataFrame, key: str) -> DataFrame:
    """The filter itself: distinct (seed, position) set bits — one
    m-bit array per seed, ≤ k·min(n, BLOOM_M) rows regardless of dim
    size. Callers that probe with it should pin() the result: the
    probe reads it once per seed."""
    per_seed = [dim_keys.select(_positions(F.col(key), s).alias("pos"),
                                F.lit(s).alias("seed"))
                for s in range(BLOOM_K)]
    u = per_seed[0]
    for p in per_seed[1:]:
        u = u.unionByName(p)
    return u.distinct()


def bloom_probe(fact: DataFrame, key: str, bits: DataFrame) -> DataFrame:
    """Keep fact rows whose k positions are ALL set: k broadcast
    left-semi joins — a dropped row never reaches the join exchange.
    The semi-join side carries a collision-safe column name so a fact
    frame with its own `pos`/`seed` columns probes unambiguously."""
    out = fact
    for s in range(BLOOM_K):
        side = (bits.filter(F.col("seed") == s)
                .select(F.col("pos").alias("__bloom_pos")))
        out = out.join(F.broadcast(side),
                       _positions(F.col(key), s) == F.col("__bloom_pos"),
                       "left_semi")
    return out


def _small_parts(cat: Catalog) -> DataFrame:
    return cat.part.filter(F.col("p_size") <= _PART_SIZE_MAX)


def bloom_semijoin_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query (EXACT — full SQL oracle, no sketch in the
    answer): revenue of lineitems whose part is small (p_size ≤ 2),
    by brand. The lineitem stream is Bloom-pruned before the exact
    part join; false positives the filter admits are removed by that
    join, so the result is identical to the unfiltered plan — the
    whole point of the technique."""
    from ..cache import pin
    cat = Catalog(spark, sf_dir)
    dim = pin(_small_parts(cat).select("p_partkey", "p_brand"))
    bits = pin(bloom_bits(dim, "p_partkey"))
    fact = cat.lineitem.select("l_partkey", "l_extendedprice",
                               "l_discount")
    survivors = bloom_probe(fact, "l_partkey", bits)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (survivors
            .join(dim, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand")
            .agg(F.round(F.sum(rev), 2).alias("revenue"),
                 F.count("*").cast("long").alias("n_items"))
            .orderBy("p_brand"))


BLOOM_REVENUE_SQL = f"""
SELECT p_brand,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= {_PART_SIZE_MAX}
GROUP BY p_brand
ORDER BY p_brand
"""


def bloom_filter_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible Bloom quality gate, pinned-constant oracle:
    (a) ZERO false negatives — every truly-joining fact row passes
    the probe (structural: a present key's bits were all inserted;
    a False means broken hash/position math, not changed data);
    (b) measured false-positive rate ≤ BLOOM_FPR_GATE_PPM (integer
    ppm compare); (c) survivors ≤ BLOOM_PASS_GATE_PCT% of true
    matches — the filter genuinely prunes. All counts are exact
    integers; nothing transcendental enters the compare."""
    from ..cache import pin
    cat = Catalog(spark, sf_dir)
    dim = pin(_small_parts(cat).select("p_partkey"))
    bits = pin(bloom_bits(dim, "p_partkey"))
    fact = pin(cat.lineitem.select("l_partkey"))
    passed = pin(bloom_probe(fact, "l_partkey", bits))
    true_match = fact.join(F.broadcast(dim),
                           F.col("l_partkey") == F.col("p_partkey"),
                           "left_semi")
    # a passed row is a false positive iff it does NOT truly match
    fp = passed.join(F.broadcast(dim),
                     F.col("l_partkey") == F.col("p_partkey"),
                     "left_anti")
    # a false negative is a truly-matching row that did NOT pass:
    # true_match minus (passed ∩ true_match) == n_true - (n_pass - n_fp)
    counts = (fact.agg(F.count("*").alias("n_fact"))
              .crossJoin(F.broadcast(
                  true_match.agg(F.count("*").alias("n_true"))))
              .crossJoin(F.broadcast(
                  passed.agg(F.count("*").alias("n_pass"))))
              .crossJoin(F.broadcast(
                  fp.agg(F.count("*").alias("n_fp")))))
    return counts.select(
        F.lit(BLOOM_M).cast("long").alias("m_bits"),
        F.lit(BLOOM_K).cast("long").alias("k_hashes"),
        ((F.col("n_pass") - F.col("n_fp")) == F.col("n_true"))
        .alias("no_false_negatives"),
        (F.col("n_fp") * 1000000
         <= (F.col("n_fact") - F.col("n_true")) * BLOOM_FPR_GATE_PPM)
        .alias("fpr_le_gate"),
        (F.col("n_pass") * 100
         <= F.col("n_true") * BLOOM_PASS_GATE_PCT).alias("prunes_to_gate"),
    )


BLOOM_FLOOR_SQL = f"""
SELECT CAST({BLOOM_M} AS BIGINT) AS m_bits,
       CAST({BLOOM_K} AS BIGINT) AS k_hashes,
       TRUE AS no_false_negatives,
       TRUE AS fpr_le_gate,
       TRUE AS prunes_to_gate
"""

register("bloom_semijoin_revenue", bloom_semijoin_revenue,
         BLOOM_REVENUE_SQL)
register("bloom_filter_floor", bloom_filter_floor, BLOOM_FLOOR_SQL)


def _bloom_init(batch_parts: DataFrame) -> DataFrame:
    return bloom_bits(
        batch_parts.filter(F.col("p_size") <= _PART_SIZE_MAX)
        .select("p_partkey"), "p_partkey")


def _bloom_merge(prev: DataFrame, batch_parts: DataFrame) -> DataFrame:
    """Set-bit union — the Bloom merge is EXACT (a bit is set in the
    union iff some batch set it), so the folded filter is
    BIT-IDENTICAL to a single-pass build over all history
    (unit-pinned): the same guarantee class as the CMS cell-addition,
    HLL register-maxima, and KMV union-retruncate merges. Inserts
    only — a Bloom filter cannot delete; key removal means rebuild,
    which the floor's exactness contract makes safe to defer (false
    positives never corrupt results, they only cost probe passes)."""
    return (prev.unionByName(_bloom_init(batch_parts))
            .distinct())


def bloom_fold_batch_into_state(batch_df: DataFrame, batch_id: int,
                                state_path: str) -> bool:
    """Idempotent Bloom fold on the shared template
    (streaming/state_fold.py): batch-id replay guard, atomic staged
    swap. State ≤ k·min(n, BLOOM_M) rows forever — the always-current
    join pre-filter a long-running pipeline probes without ever
    rescanning the dimension's history."""
    from ..streaming.state_fold import fold_batch
    return fold_batch(batch_df, batch_id, state_path,
                      _bloom_init, _bloom_merge)


def run_bloom_maintainer(parts_stream: DataFrame, state_path: str,
                         checkpoint: str):
    """foreachBatch Bloom maintainer over a streaming parts source:
    keeps the qualifying-key filter current as dim rows arrive, so
    fact-side consumers always probe against the full key history."""
    from ..streaming.state_fold import run_maintainer
    return run_maintainer(parts_stream, state_path, checkpoint,
                          _bloom_init, _bloom_merge)

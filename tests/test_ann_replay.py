"""Exact plain-Python replays of the two LSH ANN pipelines.

The rows-only `ann_lsh_cosine` / `ann_lsh_multiprobe` queries were
previously evidenced by recall floors and brute-force differentials
(necessary but not sufficient — a bucketing bug that still clears the
recall floor would pass). These replays re-derive the FULL result
rows — hyperplanes, band buckets, probe expansion, candidate set,
exact cosine, half-up quantization, (cos DESC, vec_id) top-10 — in
plain Python/numpy with ZERO engine-pulled ingredients (the
hyperplane LCG is pure arithmetic, the embeddings come straight from
parquet), and assert row-for-row equality with the engine result at
sf0.001. The hash-sketch replay discipline of round 10
(tests/helpers.py minhash_replay et al.), applied to the ANN family.

Faithfulness notes:
- the engine's pandas_udf upcasts the float32 embeddings to float64
  before the plane matmul; duckdb's fetch does the same exact upcast;
- the engine's cosine is a SEQUENTIAL left fold (Spark SQL
  `aggregate` over `zip_with` products, double accumulator) — the
  replay folds left in Python rather than calling np.dot, so the
  accumulation order (and hence the bits) match before quantization;
- fround(x, 6) is half-up — tests.helpers.fround_half_up.
"""

from __future__ import annotations

import duckdb
import numpy as np

from data_warehouse_project_spark.llm import similarity as S
from tests.helpers import fround_half_up


def _lcg_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    state = seed
    rows = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005
                     + 1442695040888963407) % (1 << 64)
            row.append(1.0 if (state >> 63) else -1.0)
        rows.append(row)
    return np.array(rows, dtype=np.float64)


def _load(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = [r[0] for r in rows]
    labels = {r[0]: r[1] for r in rows}
    vecs = {r[0]: np.array(r[2], dtype=np.float64) for r in rows}
    return ids, labels, vecs


def _seq_cosine(a: np.ndarray, b: np.ndarray) -> float:
    """Left-fold cosine matching the Spark SQL aggregate semantics."""
    num = 0.0
    for x, y in zip(a, b):
        num += float(x) * float(y)
    na = 0.0
    for x in a:
        na += float(x) * float(x)
    nb = 0.0
    for y in b:
        nb += float(y) * float(y)
    return num / (np.sqrt(na) * np.sqrt(nb))


def _topk(ids, labels, vecs, candidates, k=10):
    scored = [(vid, labels[vid],
               fround_half_up(_seq_cosine(vecs[vid], vecs[S.QUERY_VEC_ID]),
                              6))
              for vid in sorted(candidates)]
    scored.sort(key=lambda t: (-t[2], t[0]))
    return scored[:k]


def _band_buckets(signs_row: np.ndarray, n_bands: int,
                  bits: int) -> list[int]:
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))
    return [int(signs_row[b * bits:(b + 1) * bits].astype(np.int64)
                @ weights) for b in range(n_bands)]


def test_ann_lsh_cosine_exact_replay(spark, sf_dir):
    ids, labels, vecs = _load(sf_dir)
    planes = _lcg_planes(S.ANN_TABLES * S.ANN_BITS, S.DIM, seed=99)
    m = np.array([vecs[v] for v in ids])
    signs = (m @ planes.T) > 0
    buckets = {v: _band_buckets(signs[i], S.ANN_TABLES, S.ANN_BITS)
               for i, v in enumerate(ids)}
    q = buckets[S.QUERY_VEC_ID]
    candidates = {v for v in ids if v != S.QUERY_VEC_ID
                  and any(buckets[v][b] == q[b]
                          for b in range(S.ANN_TABLES))}
    expect = _topk(ids, labels, vecs, candidates)
    got = [(r["vec_id"], r["label"], r["cos_sim"])
           for r in S.ann_lsh_cosine(spark, sf_dir).collect()]
    assert got == expect


def test_ann_lsh_multiprobe_exact_replay(spark, sf_dir):
    ids, labels, vecs = _load(sf_dir)
    n_bands, bits, probes = (S.ANN_MULTIPROBE_TABLES, S.ANN_BITS,
                             S.ANN_PROBES)
    planes = _lcg_planes(n_bands * bits, S.DIM, seed=99)
    m = np.array([vecs[v] for v in ids])
    dots = m @ planes.T
    signs = dots > 0
    buckets = {v: _band_buckets(signs[i], n_bands, bits)
               for i, v in enumerate(ids)}
    # query probe set per band: own bucket + (probes-1) lowest-|margin|
    # single-bit flips (stable argsort, matching _probe_buckets_udf)
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))
    qi = ids.index(S.QUERY_VEC_ID)
    probe_sets = []
    for b in range(n_bands):
        base = buckets[S.QUERY_VEC_ID][b]
        margins = np.abs(dots[qi, b * bits:(b + 1) * bits])
        flips = np.argsort(margins, kind="stable")[:probes - 1]
        probe_sets.append({base} | {base ^ int(weights[j])
                                    for j in flips})
    candidates = {v for v in ids if v != S.QUERY_VEC_ID
                  and any(buckets[v][b] in probe_sets[b]
                          for b in range(n_bands))}
    expect = _topk(ids, labels, vecs, candidates)
    got = [(r["vec_id"], r["label"], r["cos_sim"])
           for r in S.ann_lsh_multiprobe(spark, sf_dir).collect()]
    assert got == expect

"""One-off derived-sf1.0 probe for the embeddings/vector family.

Fourth derived corpus (SCALING.md #13-#16). Plain replication is
unfaithful for vectors — identical copies would plant n_copies-sized
exact-duplicate clusters that the dedup/ANN semantics would see.
Instead each copy is rotated by its own deterministic ORTHOGONAL
matrix (QR of an LCG-seeded Gaussian; copy 0 = identity): rotation
preserves every in-copy pairwise cosine and every vector norm
EXACTLY (the geometry all the vector operators consume), while
cross-copy similarities land wherever the rotations put them — the
behavior of a genuinely 10x corpus with the same per-label geometry.

Usage:
  python scripts/embeddings_sf1_probe.py            # build + measure
  python scripts/embeddings_sf1_probe.py --build    # build only
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from data_warehouse_project_spark import registry  # noqa: E402
from data_warehouse_project_spark.cache import release_all  # noqa: E402
from data_warehouse_project_spark.metrics import (  # noqa: E402
    measure_query_shuffle)
from data_warehouse_project_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".localdata", "sf1.0")
COPIES = 10

VEC_QUERIES = [
    "knn_brute_cosine",
    "knn_batch_cosine",
    "ann_lsh_cosine",
    "embedding_kmeans_pinned",
    "embedding_dim_stats",
    "embedding_covariance_matrix",
    "embedding_int8_report",
    "dedup_embedding_cosine",
    "centroid_per_label",
]


def _rotation(dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    # sign-normalize so the decomposition is unique/deterministic
    return q * np.sign(np.diag(r))


def build(spark) -> None:
    import duckdb
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    labels = [r[2] for r in rows]
    dim = X.shape[1]
    max_id = int(ids.max()) + 1
    out_rows = []
    for i in range(COPIES):
        Xi = X if i == 0 else X @ _rotation(dim, seed=1000 + i)
        Xi32 = Xi.astype(np.float32)
        for j in range(len(ids)):
            out_rows.append((int(ids[j] + i * max_id),
                             [float(v) for v in Xi32[j]],
                             labels[j]))
    df = spark.createDataFrame(out_rows,
                               "vec_id long, embedding array<float>, "
                               "label int")
    tgt = f"{DST}/embeddings.parquet"
    if os.path.islink(tgt):
        os.unlink(tgt)
    df.repartition(8).write.mode("overwrite").parquet(tgt)


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    spark = get_spark("embeddings-sf1-probe")
    if not os.path.exists(f"{DST}/embeddings.parquet/_SUCCESS"):
        t0 = time.perf_counter()
        build(spark)
        print(f"# built {DST}/embeddings.parquet in "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
    if "--build" in sys.argv:
        spark.stop()
        return 0

    qs = registry.queries()
    out = {}
    for name in VEC_QUERIES:
        fn = qs[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, DST).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            release_all()
        m = measure_query_shuffle(spark, fn, DST)
        out[name] = {"sec": round(best, 3), **m}
        print(f"# {name}: {best:.2f}s "
              f"write={m['shuffle_write_bytes']:,}B "
              f"spill={m['spilled_bytes']:,}B", file=sys.stderr)
    print(json.dumps({"sf": 1.0, "derived_from":
                      "10x orthogonally-rotated copies of sf0.1 embeddings",
                      "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""One-off derived-sf1.0 probe for the document/dedup family.

Companion to graph_sf1_probe.py (SCALING.md #13/#14). Plain row
replication is NOT faithful for documents — copied text multiplies
every shingle's document frequency by the copy count, which would
distort the df-cap guards the dedup plans rely on. Instead each copy
gets a per-copy Caesar rotation of the letters (rot-0 = original):

- WITHIN a copy, the shingle/ngram frequency distribution is exactly
  sf0.1's (a bijection on the alphabet preserves all counts), so the
  natural near-dup cluster structure replicates per copy;
- ACROSS copies, shingle spaces are disjoint (rot-i and rot-j share
  only letterless shingles), so df stays per-copy-sized — exactly how
  a 10x corpus of genuinely new text behaves.

Output augments the graph probe's .localdata/sf1.0 dir (the
documents symlink is replaced by the derived table).

Usage:
  python scripts/docs_sf1_probe.py            # build (if absent) + measure
  python scripts/docs_sf1_probe.py --build    # build only
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_project_spark import registry  # noqa: E402
from data_warehouse_project_spark.cache import release_all  # noqa: E402
from data_warehouse_project_spark.metrics import (  # noqa: E402
    measure_query_shuffle)
from data_warehouse_project_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".localdata", "sf1.0")
COPIES = 10

DOC_QUERIES = [
    "bpe_encode_stats",              # r12: tokenizer apply, vocab-keyed
    "docs_dedup_ingest_incremental",  # r12: ingest-dedup fold, digest-keyed
    "docs_neardup_ingest_incremental",  # r12: LSH ingest dedup, band-keyed
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dup_ngram_spans",
    "dup_ngram_char_fracs",
    "doc_repetition_stats",
    "doc_lm_cross_entropy",
    "corpus_refinery_report",
    "dedup_bridge_survivors",
]


def _rot(s: str, i: int) -> str:
    return s[i:] + s[:i]


def build(spark) -> None:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1
    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    parts = []
    for i in range(COPIES):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * max_id)).alias("doc_id"),
                F.translate("text", lower + upper,
                            _rot(lower, i) + _rot(upper, i)).alias("text"),
                "lang", "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    tgt = f"{DST}/documents.parquet"
    if os.path.islink(tgt):
        os.unlink(tgt)
    out.write.mode("overwrite").parquet(tgt)


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    spark = get_spark("docs-sf1-probe")
    if not os.path.exists(f"{DST}/documents.parquet/_SUCCESS"):
        t0 = time.perf_counter()
        build(spark)
        print(f"# built {DST}/documents.parquet in "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
    if "--build" in sys.argv:
        spark.stop()
        return 0

    qs = registry.queries()
    out = {}
    for name in DOC_QUERIES:
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
                      "10x caesar-disjoint copies of sf0.1 documents",
                      "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

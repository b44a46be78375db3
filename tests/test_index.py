"""Inverted-index semantics vs a pure-Python index builder (DuckDB
parity runs in test_registry_parity)."""

from __future__ import annotations

from collections import Counter, defaultdict

from data_warehouse_project_spark.llm.index import (
    INDEX_POSTINGS_CAP, inverted_index_postings)
from data_warehouse_project_spark.sources.catalog import Catalog


def test_inverted_index_matches_python_model(spark, sf_dir):
    docs = [(r.doc_id, r.text) for r in Catalog(spark, sf_dir).documents
            .select("doc_id", "text").collect()]
    post, cf = defaultdict(set), Counter()
    for doc_id, text in docs:
        ws = text.strip().split()
        cf.update(ws)
        for w in ws:
            post[w].add(doc_id)
    got = inverted_index_postings(spark, sf_dir).collect()
    assert {r.term for r in got} == set(post)
    for r in got:
        ids = sorted(post[r.term])
        assert r.df == len(ids)
        assert r.cf == cf[r.term]
        expected_head = ",".join(str(i) for i in ids[:INDEX_POSTINGS_CAP])
        assert r.postings_head == expected_head, r.term


def test_inverted_index_postings_capped_and_sorted(spark, sf_dir):
    for r in inverted_index_postings(spark, sf_dir).collect():
        ids = [int(x) for x in r.postings_head.split(",")]
        assert len(ids) <= INDEX_POSTINGS_CAP
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, INDEX_POSTINGS_CAP)
        assert r.cf >= r.df


def test_bm25_matches_python_model(spark, sf_dir):
    import math
    from data_warehouse_project_spark.llm.retrieval import (
        BM25_B, BM25_K1, BM25_QUERY_TERMS, BM25_TOP_K, bm25_top_docs)
    docs = {r.doc_id: r.text.strip().split()
            for r in Catalog(spark, sf_dir).documents
            .select("doc_id", "text").collect()}
    n = len(docs)
    avgdl = sum(len(ws) for ws in docs.values()) / n
    df = {t: sum(1 for ws in docs.values() if t in ws)
          for t in BM25_QUERY_TERMS}
    expected = {}
    for doc_id, ws in docs.items():
        qsum, matched = 0, 0
        for t in BM25_QUERY_TERMS:
            tf = ws.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            tfn = tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(ws) / avgdl))
            qsum += math.floor(idf * tfn * 1e6 + 0.5)
        if matched:
            expected[doc_id] = (qsum, matched)
    top = sorted(expected.items(), key=lambda kv: (-kv[1][0], kv[0]))
    top = top[:BM25_TOP_K]
    got = bm25_top_docs(spark, sf_dir).collect()
    assert [r.doc_id for r in got] == [d for d, _ in top]
    for r, (d, (qsum, matched)) in zip(got, top):
        assert r.n_terms_matched == matched
        assert abs(r.bm25_score - qsum / 1e6) <= 1e-6

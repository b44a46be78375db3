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

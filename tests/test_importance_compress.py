"""DSIR importance weighting vs a pure-Python reference model and a
planted-vocabulary fixture; int8 embedding quantization vs a numpy
reimplementation and its own error bound (DuckDB parity for both runs
in test_registry_parity)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from data_warehouse_project_spark.llm.compress import embedding_int8_report
from data_warehouse_project_spark.llm.importance import (
    DSIR_SMOOTH_K, DSIR_TARGET_LANG, dsir_importance_weights, dsir_scores)
from data_warehouse_project_spark.sources.catalog import Catalog


def _python_dsir(docs):
    """Reference model: (doc_id, text, is_target) → doc_id → bits."""
    from collections import Counter
    c_raw, c_tgt = Counter(), Counter()
    for _, text, is_t in docs:
        for w in text.strip().split():
            c_raw[w] += 1
            if is_t:
                c_tgt[w] += 1
    n_raw, n_tgt, v = sum(c_raw.values()), sum(c_tgt.values()), len(c_raw)
    k = DSIR_SMOOTH_K
    lam = {
        w: math.floor(
            (math.log2((c_tgt[w] + k) / (n_tgt + k * v))
             - math.log2((c_raw[w] + k) / (n_raw + k * v))) * 1e6 + 0.5)
        for w in c_raw
    }
    out = {}
    for doc_id, text, _ in docs:
        ws = text.strip().split()
        tsum = sum(lam[w] for w in ws)
        out[doc_id] = (len(ws),
                       math.floor(tsum / (len(ws) * 1e6) * 1e6 + 0.5) / 1e6)
    return out


def test_dsir_matches_python_model(spark, sf_dir):
    docs = [
        (r.doc_id, r.text, r.lang == DSIR_TARGET_LANG)
        for r in Catalog(spark, sf_dir).documents
        .select("doc_id", "text", "lang").collect()
    ]
    expected = _python_dsir(docs)
    got = {r.doc_id: (r.n_tokens, r.dsir_bits, r.selected)
           for r in dsir_importance_weights(spark, sf_dir).collect()}
    assert set(got) == set(expected)
    for doc_id, (n_tok, bits) in expected.items():
        gn, gb, gsel = got[doc_id]
        assert gn == n_tok, doc_id
        # quantized integer sums are exact; only the final fround
        # divide can differ by 1 ulp of the 6th decimal
        assert abs(gb - bits) <= 1e-6, doc_id
        assert gsel == (gb > 0.0), doc_id


def test_dsir_separates_planted_vocabularies(spark):
    # target docs draw from a disjoint vocabulary — every target doc
    # must score positive, every raw-only doc negative
    rows = (
        [(i, "alpha beta gamma delta alpha beta", "tgt") for i in range(5)]
        + [(10 + i, "one two three four five six", "oth") for i in range(15)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {r.doc_id: r.dsir_bits
           for r in dsir_scores(docs, F.col("lang") == "tgt").collect()}
    assert all(got[i] > 0 for i in range(5))
    assert all(got[10 + i] < 0 for i in range(15))


def test_int8_report_matches_numpy(spark, sf_dir):
    vecs = np.array(
        [r.embedding for r in
         Catalog(spark, sf_dir).embeddings.select("embedding").collect()],
        dtype=np.float64)
    q = np.floor(vecs * 1e6 + 0.5)  # exact 6-decimal integer recovery
    qmin, qmax = q.min(axis=0), q.max(axis=0)
    qrange = qmax - qmin
    code = np.floor((q - qmin) * 255.0 / np.where(qrange == 0, 1, qrange)
                    + 0.5)
    err = np.abs(q - (qmin + code * qrange / 255.0))
    qerr = np.floor(err * 1e3 + 0.5)
    got = embedding_int8_report(spark, sf_dir).collect()
    assert len(got) == vecs.shape[1]
    for r in got:
        d = r.dim
        assert r.n_vecs == vecs.shape[0]
        assert abs(r.vmin - qmin[d] / 1e6) <= 1e-6
        assert abs(r.vmax - qmax[d] / 1e6) <= 1e-6
        assert abs(r.mean_abs_err
                   - qerr[:, d].sum() / (vecs.shape[0] * 1e9)) <= 1e-9
        assert abs(r.max_abs_err - qerr[:, d].max() / 1e9) <= 1e-9


def test_int8_error_within_theoretical_bound(spark, sf_dir):
    rows = embedding_int8_report(spark, sf_dir).collect()
    for r in rows:
        # round-to-nearest coding error can never exceed half a step
        # (plus the error-term quantization slack)
        assert r.within_bound, r
        assert r.max_abs_err <= r.step / 2 + 1e-8, r
        assert 0 <= r.mean_abs_err <= r.max_abs_err, r

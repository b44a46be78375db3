"""Boundary-margin scan for quantized transcendental terms.

VERDICT r6 #3: ``floor(x * Q + 0.5)`` on a transcendental-fed ``x``
(log/log2/ln) carries a latent cross-libm flake — log functions are
correctly-rounded in NEITHER Spark's nor DuckDB's libm contract, so
the two engines may disagree by ~1-2 ulp on ``x``. The quantized
integer flips only when ``x*Q + 0.5`` sits within that ulp-scaled
error of an integer boundary. This test converts "never observed"
into evidence: it recomputes every such term on the ACTUAL fixture
data (the same integer counts both engines consume) and asserts each
lands at least ``MARGIN_ULPS`` ulps away from a flip boundary — far
wider than any plausible cross-libm divergence.

Covered sites (the five quantized-log producers in the registry):
  - llm/textstats.py doc_lm_cross_entropy   -log2(p)        Q=1e6
  - llm/importance.py dsir_importance_weights log2 ratio    Q=1e6
  - llm/distributions.py doc_zipf_fit       ln(rank/count)  Q=1e6
  - llm/langmix.py source_length_kl         p*ln(p/q)       Q=1e9
  - plans/survival.py customer_churn_survival ln(1-d/n)     Q=1e6

Policy context: functions/compat.py "Residual risk — transcendentals".
If this test EVER fails after a testdata regeneration, the prescribed
fix is to widen that query's quantization guard (drop Q) or move its
oracle to a tolerance compare — not to weaken the margin here.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]

#: required distance from a floor-flip boundary, in ulps of |x*Q|.
#: Cross-libm log divergence is ~1-2 ulp of x -> ~2-4 ulp of x*Q
#: after the multiply; 64 is a 16-32x safety factor.
MARGIN_ULPS = 64

LM_SMOOTH_K = 1.0      # llm/textstats.py
DSIR_SMOOTH_K = 0.5    # llm/importance.py
ZIPF_TOP_K = 200       # llm/distributions.py
KL_BAND = 10           # llm/langmix.py LENGTH_KL_BAND
Q6 = 1e6
Q9 = 1e9               # llm/langmix.py _KL_Q


def _boundary_margin(x: float, q: float) -> float:
    """Distance of x*q + 0.5 from its nearest integer, in ulps of
    the scaled value (floor flips exactly at integers)."""
    v = x * q + 0.5
    frac = v - math.floor(v)
    dist = min(frac, 1.0 - frac)
    return dist / math.ulp(max(abs(v), 1.0))


def _assert_all_safe(terms, q, site):
    assert terms, f"{site}: no terms extracted — query shape changed?"
    worst = min(_boundary_margin(x, q) for x in terms)
    assert worst > MARGIN_ULPS, (
        f"{site}: a quantized term sits {worst:.1f} ulps from a "
        f"floor-flip boundary (< {MARGIN_ULPS}) — cross-libm flake "
        f"risk is now real; widen this query's guard per compat.py")
    return worst


@pytest.fixture(scope="module", params=SF_DIRS, ids=lambda d: d.split("/")[-1])
def con(request):
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{request.param}/documents.parquet')")
    yield c
    c.close()


def test_lm_cross_entropy_terms_clear_boundaries(con):
    # distinct (c_bigram, c_left) pairs + corpus vocab v reproduce
    # every -log2(p) term doc_lm_cross_entropy quantizes at 1e6
    rows = con.execute("""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
            FROM documents
        ),
        bi AS (
            SELECT tokens[i] AS w1, tokens[i + 1] AS w2
            FROM toks, UNNEST(range(1, len(tokens))) AS t(i)
            WHERE len(tokens) >= 2
        ),
        lm AS (SELECT w1, w2, COUNT(*) AS c_bigram FROM bi GROUP BY 1, 2),
        lt AS (SELECT w1, SUM(c_bigram) AS c_left FROM lm GROUP BY 1)
        SELECT DISTINCT lm.c_bigram, lt.c_left
        FROM lm JOIN lt USING (w1)
    """).fetchall()
    v = con.execute("""
        SELECT COUNT(DISTINCT w) FROM (
            SELECT UNNEST(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents)
    """).fetchone()[0]
    terms = [-math.log2((cb + LM_SMOOTH_K) / (cl + LM_SMOOTH_K * v))
             for cb, cl in rows]
    _assert_all_safe(terms, Q6, "doc_lm_cross_entropy")


def test_dsir_log_ratio_terms_clear_boundaries(con):
    rows = con.execute("""
        WITH words AS (
            SELECT lang = 'en' AS is_target,
                   UNNEST(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents
        ),
        raw AS (
            SELECT w, COUNT(*) AS c_raw,
                   SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_tgt
            FROM words GROUP BY 1
        )
        SELECT DISTINCT c_tgt, c_raw FROM raw
    """).fetchall()
    n_raw, n_tgt, v = con.execute("""
        WITH words AS (
            SELECT lang = 'en' AS is_target,
                   UNNEST(string_split_regex(trim(text), '\\s+')) AS w
            FROM documents
        ),
        raw AS (
            SELECT w, COUNT(*) AS c_raw,
                   SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_tgt
            FROM words GROUP BY 1
        )
        SELECT SUM(c_raw), SUM(c_tgt), COUNT(*) FROM raw
    """).fetchone()
    k = DSIR_SMOOTH_K
    terms = [
        math.log2((ct + k) / (n_tgt + k * v))
        - math.log2((cr + k) / (n_raw + k * v))
        for ct, cr in rows
    ]
    _assert_all_safe(terms, Q6, "dsir_importance_weights")


def test_zipf_log_terms_clear_boundaries(con):
    counts = [r[0] for r in con.execute(f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT UNNEST(string_split_regex(trim(text), '\\s+')) AS term
              FROM documents)
        GROUP BY term
        ORDER BY n DESC, term
        LIMIT {ZIPF_TOP_K}
    """).fetchall()]
    # ln(1) = 0 is exact in every libm (C99 F.9.3.7); margin is 0.5
    terms = ([math.log(float(r)) for r in range(1, len(counts) + 1)]
             + [math.log(float(n)) for n in counts])
    _assert_all_safe(terms, Q6, "doc_zipf_fit")


def test_length_kl_terms_clear_boundaries(con):
    rows = con.execute(f"""
        WITH banded AS (
            SELECT source,
                   CAST(FLOOR(len(string_split_regex(trim(text), '\\s+'))
                              / {KL_BAND}) AS BIGINT) AS band,
                   COUNT(*) AS n_sb
            FROM documents GROUP BY 1, 2
        ),
        ps AS (SELECT source, SUM(n_sb) AS n_s FROM banded GROUP BY 1),
        pb AS (SELECT band, SUM(n_sb) AS n_b FROM banded GROUP BY 1),
        tot AS (SELECT SUM(n_sb) AS n_total FROM banded)
        SELECT b.n_sb, ps.n_s, pb.n_b, tot.n_total
        FROM banded b
        JOIN ps USING (source) JOIN pb USING (band) CROSS JOIN tot
    """).fetchall()
    terms = []
    for n_sb, n_s, n_b, n_total in rows:
        p = float(n_sb) / float(n_s)
        q = float(n_b) / float(n_total)
        terms.append(p * math.log(p / q))
    _assert_all_safe(terms, Q9, "source_length_kl")


@pytest.mark.parametrize("sf_dir", SF_DIRS,
                         ids=lambda d: d.split("/")[-1])
def test_km_log_survival_terms_clear_boundaries(sf_dir):
    # every distinct (d_churned, n_risk) pair with d < n reproduces
    # the ln(1 - d/n) terms customer_churn_survival quantizes at 1e6
    from data_warehouse_project_spark.plans.survival import _CHURN_GAP_DAYS
    c = duckdb.connect()
    c.execute("CREATE VIEW orders AS SELECT * FROM "
              f"read_parquet('{sf_dir}/orders.parquet')")
    rows = c.execute(f"""
        WITH per_cust AS (
            SELECT o_custkey, MIN(o_orderdate) AS first_dt,
                   MAX(o_orderdate) AS last_dt
            FROM orders GROUP BY 1
        ),
        horizon AS (SELECT MAX(last_dt) AS h FROM per_cust),
        lifet AS (
            SELECT DATEDIFF('day', p.last_dt, x.h) > {_CHURN_GAP_DAYS}
                       AS churned,
                   CAST(CASE WHEN DATEDIFF('day', p.last_dt, x.h)
                                  > {_CHURN_GAP_DAYS}
                        THEN DATEDIFF('day', p.first_dt, p.last_dt)
                        ELSE DATEDIFF('day', p.first_dt, x.h) END
                        AS BIGINT) AS t_days
            FROM per_cust p CROSS JOIN horizon x
        ),
        times AS (
            SELECT t_days,
                   SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS d,
                   COUNT(*) AS dc
            FROM lifet GROUP BY 1
        ),
        risk AS (
            SELECT d, SUM(dc) OVER ()
                      - COALESCE(SUM(dc) OVER (ORDER BY t_days
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS n
            FROM times
        )
        SELECT DISTINCT d, n FROM risk WHERE d < n AND d > 0
    """).fetchall()
    c.close()
    terms = [math.log(1.0 - float(d) / float(n)) for d, n in rows]
    _assert_all_safe(terms, Q6, "customer_churn_survival")


def test_dp_noise_terms_clear_boundaries():
    # orders_priority_dp_release quantizes ln-fed Laplace noise at
    # 1e6 (fround). The five u draws depend ONLY on the five fixed
    # priority strings — corpus-independent — so this pin holds at
    # every scale factor and survives any testdata regeneration. The
    # integer true count shifts noisy_count by whole units, leaving
    # the fractional part (and hence the rounding decision) equal to
    # the noise term's.
    import hashlib

    from data_warehouse_project_spark.plans.audits import (
        _DP_HEX, _DP_SALT, _DP_SCALE)
    from data_warehouse_project_spark.plans.rankcorr import _PRIORITIES

    terms = []
    for g in _PRIORITIES:
        h = hashlib.sha256(f"{_DP_SALT}{g}".encode()).hexdigest()
        u = (int(h[:_DP_HEX], 16) + 0.5) / 2.0 ** (4 * _DP_HEX)
        terms.append(-_DP_SCALE * math.copysign(1.0, u - 0.5)
                     * math.log(1.0 - 2.0 * abs(u - 0.5)))
    _assert_all_safe(terms, Q6, "orders_priority_dp_release")

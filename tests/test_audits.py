"""Semantic unit tests for the round-6 audit / analytics operators —
invariants the DuckDB parity suite can't express (parity proves both
engines agree; these prove the answer means what it claims)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_project_spark.plans.audits import (
    order_consistency_audit, referential_integrity_report,
    user_rfm_segments)
from data_warehouse_project_spark.plans.warehouse import (
    customer_cohort_revenue, ship_latency_quantiles)
from data_warehouse_project_spark.sources.catalog import Catalog


def test_referential_integrity_clean_star(spark, sf_dir):
    # the driver star is referentially clean: six edges, zero orphans,
    # zero NULL FKs, child counts equal to the raw table counts
    rows = {r["edge"]: r for r in
            referential_integrity_report(spark, sf_dir).collect()}
    assert len(rows) == 6
    cat = Catalog(spark, sf_dir)
    n_line = cat.lineitem.count()
    for edge, r in rows.items():
        assert r["n_orphans"] == 0, edge
        assert r["n_null_fk"] == 0, edge
    assert rows["lineitem.l_orderkey->orders"]["n_child"] == n_line


def test_referential_integrity_detects_planted_orphan(spark, sf_dir,
                                                      tmp_path):
    # plant an orphan + a NULL FK in a copied star and make sure the
    # audit actually reports them (the report is not a constant)
    import shutil

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        src = f"{sf_dir}/{t}.parquet"
        shutil.copytree(src, tmp_path / f"{t}.parquet") \
            if __import__("os").path.isdir(src) else shutil.copy(
                src, tmp_path / f"{t}.parquet")
    cat = Catalog(spark, sf_dir)
    bad = cat.customer.limit(2).select(
        F.col("c_custkey") + 10_000_000,  # orphan nationkey below
        F.col("c_name"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit(None).cast("long"))
        .otherwise(F.lit(99_999_999)).alias("c_nationkey"),
        F.col("c_acctbal"), F.col("c_mktsegment"))
    (cat.customer.select("c_custkey", "c_name", "c_nationkey",
                         "c_acctbal", "c_mktsegment")
     .unionByName(bad.toDF("c_custkey", "c_name", "c_nationkey",
                           "c_acctbal", "c_mktsegment"))
     .write.mode("overwrite").parquet(str(tmp_path / "customer.parquet")))
    rows = {r["edge"]: r for r in
            referential_integrity_report(spark, str(tmp_path)).collect()}
    r = rows["customer.c_nationkey->nation"]
    assert r["n_orphans"] == 1 and r["n_null_fk"] == 1


def test_order_audit_accounts_every_order(spark, sf_dir):
    rows = order_consistency_audit(spark, sf_dir).collect()
    cat = Catalog(spark, sf_dir)
    assert sum(r["n_orders"] for r in rows) == cat.orders.count()
    for r in rows:
        assert 0 <= r["n_mismatch"] <= r["n_orders"] - r["n_no_lines"]
        if r["max_abs_diff_cents"] is not None:
            assert r["max_abs_diff_cents"] >= 0


def test_rfm_scores_partition_users(spark, sf_dir):
    rows = user_rfm_segments(spark, sf_dir).collect()
    cat = Catalog(spark, sf_dir)
    n_users = (cat.events.filter(F.col("user_id").isNotNull())
               .select("user_id").distinct().count())
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert 1 <= r["r_score"] <= 4
        assert 1 <= r["f_score"] <= 4
        assert 1 <= r["m_score"] <= 4
        assert r["segment"] == (f"R{r['r_score']}F{r['f_score']}"
                                f"M{r['m_score']}")
    # quartile scoring must actually split: more than one segment
    assert len(rows) > 1


def test_ship_latency_quantiles_ordered(spark, sf_dir):
    rows = ship_latency_quantiles(spark, sf_dir).collect()
    assert len(rows) >= 1
    cat = Catalog(spark, sf_dir)
    assert sum(r["n_lines"] for r in rows) == cat.lineitem.count()
    for r in rows:
        assert r["p50_days"] <= r["p90_days"] <= r["p99_days"]


def test_cohort_matrix_invariants(spark, sf_dir):
    rows = customer_cohort_revenue(spark, sf_dir).collect()
    cat = Catalog(spark, sf_dir)
    # every order lands in exactly one cell
    assert sum(r["n_orders"] for r in rows) == cat.orders.count()
    # month-0 cells cover every customer exactly once across cohorts
    m0 = [r for r in rows if r["months_since"] == 0]
    n_cust = cat.orders.select("o_custkey").distinct().count()
    assert sum(r["n_active_customers"] for r in m0) == n_cust
    for r in rows:
        assert r["months_since"] >= 0
        assert r["n_active_customers"] <= r["n_orders"]


def test_minhash_accuracy_floor_constant_row(spark, sf_dir):
    from data_warehouse_project_spark.llm.dedup import (
        minhash_accuracy_floor)

    rows = minhash_accuracy_floor(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_hashes"], r["has_pairs"], r["mae_le_gate"],
            r["max_ae_le_gate"]) == (32, True, True, True)


def test_quality_calibration_deciles_cover_all_docs(spark, sf_dir):
    from data_warehouse_project_spark.llm.quality import (
        quality_calibration_report)

    rows = quality_calibration_report(spark, sf_dir).collect()
    cat = Catalog(spark, sf_dir)
    assert sum(r["n_docs"] for r in rows) == cat.documents.count()
    assert all(1 <= r["decile"] <= 10 for r in rows)
    # deciles ordered by score: lo/hi ranges must not interleave
    ordered = sorted(rows, key=lambda r: r["decile"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["score_hi"] <= b["score_lo"] + 1e-3  # bucket granularity
        assert a["score_lo"] <= a["score_hi"]
    # the scorer carries signal: top-decile keep rate beats bottom
    by_d = {r["decile"]: r for r in rows}
    lo, hi = min(by_d), max(by_d)
    assert by_d[hi]["gopher_keep_frac"] >= by_d[lo]["gopher_keep_frac"]


def test_session_stats_one_row_consistent(spark, sf_dir):
    from data_warehouse_project_spark.streaming.batch_parity import (
        events_sessionize, session_stats)

    rows = session_stats(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_sessions"] == events_sessionize(spark, sf_dir).count()
    assert 0.0 <= r["single_event_frac"] <= 1.0
    assert r["p50_dur_min"] <= r["p90_dur_min"]
    assert 1 <= r["p50_events"] <= r["p90_events"]


def test_cross_source_leakage_non_vacuous(spark, sf_dir):
    from data_warehouse_project_spark.llm.dedup import (
        cross_source_leakage, dedup_ngram_jaccard)

    rows = cross_source_leakage(spark, sf_dir).collect()
    # pair accounting: leakage cells sum to the verified pair count
    assert sum(r["n_pairs"] for r in rows) == \
        dedup_ngram_jaccard(spark, sf_dir).count()
    # the driver corpus plants near-dups ACROSS sources — the matrix
    # must show off-diagonal mass, and similarity stays a valid mean
    assert any(r["cross_source"] for r in rows)
    for r in rows:
        assert r["source_a"] <= r["source_b"]
        assert 0.0 < r["mean_jaccard"] <= 1.0


def test_lang_id_confusion_accounts_all_docs(spark, sf_dir):
    from data_warehouse_project_spark.llm.textstats import (
        lang_id_confusion)

    rows = lang_id_confusion(spark, sf_dir).collect()
    cat = Catalog(spark, sf_dir)
    assert sum(r["n_docs"] for r in rows) == cat.documents.count()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    # the driver corpus is English-like word soup under synthetic
    # lang labels, so the matrix must reveal exactly that: off-
    # diagonal mass concentrated in predicted_lang ∈ {en, unknown}
    # (the honest evaluation — not a constant, not all-correct)
    assert any(not r["correct"] for r in rows)
    assert all(r["predicted_lang"] in ("en", "unknown")
               for r in rows), rows
    diag = sum(r["n_docs"] for r in rows if r["correct"])
    assert diag > 0  # labeled-en docs are recovered


def test_events_gap_report_accounting(spark, sf_dir):
    from data_warehouse_project_spark.plans.audits import events_gap_report

    rows = events_gap_report(spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        # expected = observed + missing, exactly, per type
        assert r["n_expected"] == r["n_observed"] + r["n_missing"]
        if r["n_missing"] > 0:
            assert r["first_gap"] is not None
            assert r["first_gap"] <= r["last_gap"]
        else:
            assert r["first_gap"] is None and r["last_gap"] is None
    # all types share one spine
    assert len({r["n_expected"] for r in rows}) == 1


def test_supplier_scorecard_top25_sane(spark, sf_dir):
    from data_warehouse_project_spark.plans.warehouse import (
        SCORECARD_TOP_N, supplier_scorecard)

    rows = supplier_scorecard(spark, sf_dir).collect()
    assert 1 <= len(rows) <= SCORECARD_TOP_N
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    for r in rows:
        assert 0.0 <= r["return_frac"] <= 1.0
        assert r["p50_latency_days"] is not None
        assert r["s_name"]


def test_order_aging_bands_account_all_orders(spark, sf_dir):
    from data_warehouse_project_spark.plans.warehouse import (
        order_aging_report)

    rows = order_aging_report(spark, sf_dir).collect()
    cat = Catalog(spark, sf_dir)
    assert sum(r["n_orders"] for r in rows) == cat.orders.count()
    bands = {r["age_band"] for r in rows}
    assert bands <= {"000-030", "031-060", "061-090", "091-180",
                     "181-365", "366+"}


def test_l_diversity_planted_homogeneous_group(spark, tmp_path):
    """A quasi-identifier group whose sensitive bands are uniform must
    land at diversity 1 with its whole row mass in n_below_l, while a
    fully diverse group lands at 5 with zero below-l mass."""
    from data_warehouse_project_spark.plans import audits

    rows = (
        # group (SEG_A, 1): 4 customers, ALL in band 1 -> diversity 1
        [(i, "SEG_A", 1, 100.0) for i in range(4)]
        # group (SEG_B, 2): 5 customers spanning all 5 bands
        + [(10, "SEG_B", 2, -50.0), (11, "SEG_B", 2, 100.0),
           (12, "SEG_B", 2, 2600.0), (13, "SEG_B", 2, 5100.0),
           (14, "SEG_B", 2, 9000.0)]
        # group (SEG_C, 3): 2 customers in 2 bands -> diversity 2,
        # still below l=3
        + [(20, "SEG_C", 3, 100.0), (21, "SEG_C", 3, 2600.0)])
    df = spark.createDataFrame(
        rows, "c_custkey long, c_mktsegment string, c_nationkey long, "
              "c_acctbal double")
    d = str(tmp_path / "cust")
    df.write.parquet(d + "/customer.parquet")
    # Catalog loads lazily; only the customer table is read here
    got = {r["diversity"]: r for r in
           audits.l_diversity_report(spark, d).collect()}
    assert got[1]["n_groups"] == 1 and got[1]["n_customers"] == 4
    assert got[1]["n_below_l"] == 4
    assert got[2]["n_groups"] == 1 and got[2]["n_below_l"] == 2
    assert got[5]["n_groups"] == 1 and got[5]["n_below_l"] == 0
    assert set(got) == {1, 2, 5}


def test_t_closeness_matches_brute_force_emd(spark, sf_dir):
    # independent model: per-group ordered-domain EMD computed in
    # Python floats over the same banding, binned to deciles and
    # gated at t = 0.2 — the report's integer-exact math must agree
    from data_warehouse_project_spark.plans.audits import (
        _ACCTBAL_BANDS, _N_BANDS, t_closeness_report)

    pdf = (Catalog(spark, sf_dir).customer
           .select("c_mktsegment", "c_nationkey", "c_acctbal")
           .toPandas())

    def band(v: float) -> int:
        for i, edge in enumerate(_ACCTBAL_BANDS):
            if v < edge:
                return i
        return len(_ACCTBAL_BANDS)

    pdf["sens"] = pdf["c_acctbal"].map(band)
    n_total = len(pdf)
    glob = [int((pdf["sens"] == b).sum()) for b in range(_N_BANDS)]
    from collections import Counter
    from fractions import Fraction
    deciles: Counter[int] = Counter()
    mass: Counter[int] = Counter()
    above = 0
    for _, g in pdf.groupby(["c_mktsegment", "c_nationkey"]):
        s = len(g)
        cnt = [int((g["sens"] == b).sum()) for b in range(_N_BANDS)]
        # exact rational EMD so decile edges and the t-gate can never
        # flake on float accumulation, independent of the report's
        # scaled-integer identity
        cum_p = cum_q = Fraction(0)
        emd = Fraction(0)
        for b in range(_N_BANDS):
            cum_p += Fraction(cnt[b], s)
            cum_q += Fraction(glob[b], n_total)
            emd += abs(cum_p - cum_q)
        emd /= _N_BANDS - 1
        d = int(emd * 10)  # exact floor of a rational
        deciles[d] += 1
        mass[d] += s
        if emd > Fraction(1, 5):
            above += s
    report = {r["emd_decile"]: r
              for r in t_closeness_report(spark, sf_dir).collect()}
    assert {d: c for d, c in deciles.items()} == {
        d: r["n_groups"] for d, r in report.items()}
    assert {d: m for d, m in mass.items()} == {
        d: r["n_customers"] for d, r in report.items()}
    assert above == sum(r["n_above_t"] for r in report.values())
    # non-vacuity: the gate actually splits the groups on driver data
    assert len(report) >= 2


def test_benford_conforming_and_mechanical_cohorts(spark):
    # a log-uniform cohort (exactly the multi-magnitude shape
    # Benford's law describes) must pass the chi-square gate, and a
    # fixed-first-digit mechanical cohort must fail it loudly
    from pyspark.sql import Row

    from data_warehouse_project_spark.plans.audits import (
        _BENFORD, benford_fold)

    def frame(vals):
        return spark.createDataFrame(
            [Row(cents=int(v)) for v in vals], "cents long")

    n = 5000
    log_uniform = [int(10 ** (2 + 4 * i / n)) for i in range(n)]
    ok = benford_fold(frame(log_uniform)).collect()
    assert all(r["conforms"] for r in ok)
    assert {r["digit"] for r in ok} == set(range(1, 10))
    # observed shares track the pinned expectations
    for r in ok:
        assert abs(r["frac"] - _BENFORD[r["digit"] - 1]) < 0.02, r

    mechanical = [50_000 + i for i in range(2000)]  # all start with 5
    bad = {r["digit"]: r for r in benford_fold(frame(mechanical))
           .collect()}
    assert not any(r["conforms"] for r in bad.values())
    # the digit domain is completed: absent digits carry n = 0 and
    # STILL contribute their (0-e)^2/e chi-square mass
    assert set(bad) == set(range(1, 10))
    assert bad[5]["n"] == 2000
    assert all(bad[d]["n"] == 0 for d in bad if d != 5)
    assert all(bad[d]["chi2_term"] > 0 for d in bad)
    # non-positive amounts carry no first digit and must be excluded
    with_zero = benford_fold(frame([0, -150] + mechanical)).collect()
    assert sum(r["n"] for r in with_zero) == 2000


# ---------------------------------------------------------------------------
# Benford fold vs a plain-Python chi-square model over random amounts
# ---------------------------------------------------------------------------

import math

from hypothesis import HealthCheck, given, settings, strategies as st


def _benford_reference(cents):
    """Sequential replay of the quantized Benford audit contract:
    per digit 1..9 (domain completed), n, frac = floor(n/N·1e9+.5)/1e9,
    term_q = floor((p−e)²/e·1e9+.5), stat = N·Σterm_q/1e9,
    conforms = stat ≤ 15.507; empty input leaves the shares NULL."""
    from data_warehouse_project_spark.plans.audits import (
        _BENFORD, _BENFORD_CHI2_CRIT)
    pos = [c for c in cents if c > 0]
    n_by_digit = {d: 0 for d in range(1, 10)}
    for c in pos:
        n_by_digit[int(str(c)[0])] += 1
    total = len(pos)
    out = {}
    if total == 0:
        return {d: (0, None, None, None, None) for d in range(1, 10)}
    terms = {}
    for d in range(1, 10):
        p = n_by_digit[d] / total
        e = _BENFORD[d - 1]
        terms[d] = math.floor((p - e) * (p - e) / e * 1e9 + 0.5)
    chi2_q = sum(terms.values())
    stat = total * chi2_q / 1e9
    for d in range(1, 10):
        p = n_by_digit[d] / total
        out[d] = (n_by_digit[d],
                  math.floor(p * 1e9 + 0.5) / 1e9,
                  terms[d] / 1e9,
                  math.floor(stat * 1e6 + 0.5) / 1e6,
                  stat <= _BENFORD_CHI2_CRIT)
    return out


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cents=st.lists(st.integers(-100, 10 ** 6), max_size=40))
def test_benford_fold_matches_python_reference(spark, cents):
    """Random amount lists (non-positives included — they carry no
    first digit and must drop out): the windowed Benford fold
    (plans/audits.py benford_fold) must reproduce the sequential
    quantized chi-square model digit for digit, including the
    completed 1..9 domain and the all-NULL empty-input row set."""
    from pyspark.sql import Row

    from data_warehouse_project_spark.plans.audits import benford_fold
    df = (spark.createDataFrame([Row(cents=int(c)) for c in cents],
                                "cents long")
          if cents else spark.createDataFrame([], "cents long"))
    got = {r["digit"]: (r["n"], r["frac"], r["chi2_term"],
                        r["benford_chi2"], r["conforms"])
           for r in benford_fold(df).collect()}
    assert got == _benford_reference(cents), cents


# ---------------------------------------------------------------------------
# RFM segmentation vs a sequential quartile-scoring model
# ---------------------------------------------------------------------------


def _rfm_reference(events):
    """Sequential RFM replay: per-user recency/frequency/monetary,
    integer-rank discrete quartiles per dimension, inverted R score,
    segment rollup with 2dp mean spend."""
    per = {}
    for u, cents, d in events:
        last, freq, mon = per.get(u, (-1, 0, 0))
        per[u] = (max(last, d), freq + 1, mon + cents)
    anchor = max(d for _, _, d in events)

    def quartiles(vals):
        s, n = sorted(vals), len(vals)
        out = []
        for k in (1, 2, 3):
            cum = 0
            for v in sorted(set(s)):
                cum += s.count(v)
                if cum * 4 >= n * k:
                    out.append(v)
                    break
        return out

    rows = [(anchor - last, freq, math.floor(mon / 100.0), mon)
            for last, freq, mon in per.values()]
    rq = quartiles([r for r, _, _, _ in rows])
    fq = quartiles([f for _, f, _, _ in rows])
    mq = quartiles([m for _, _, m, _ in rows])
    segs = {}
    for r, f, m, mon in rows:
        rs = 4 - sum(r > q for q in rq)
        fs = 1 + sum(f > q for q in fq)
        ms = 1 + sum(m > q for q in mq)
        n, c = segs.get((rs, fs, ms), (0, 0))
        segs[(rs, fs, ms)] = (n + 1, c + mon)
    return {f"R{rs}F{fs}M{ms}":
            (rs, fs, ms, n,
             math.floor(c / (n * 100.0) * 100 + 0.5) / 100)
            for (rs, fs, ms), (n, c) in segs.items()}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(st.tuples(st.integers(1, 5),
                                 st.integers(0, 50_000),
                                 st.integers(0, 25)),
                       min_size=1, max_size=25))
def test_rfm_matches_python_reference(spark, tmp_path_factory, events):
    """Random (user, spend-cents, day) streams — tie-heavy quartile
    histograms, single-user corpora, zero-value events: the stacked-
    histogram RFM segmentation must reproduce the sequential
    quartile-scoring replay segment for segment."""
    from pyspark.sql import Row

    from data_warehouse_project_spark.plans.audits import (
        user_rfm_segments)
    tmp = tmp_path_factory.mktemp("rfm")
    df = spark.createDataFrame(
        [Row(event_id=i, ts=f"2024-01-{1 + d:02d} 12:00:00",
             user_id=u, event_type="view", value=c / 100.0, props="{}")
         for i, (u, c, d) in enumerate(events)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string")
    (df.withColumn("ts", F.to_timestamp("ts")).coalesce(1)
     .write.mode("overwrite").parquet(f"{tmp}/events.parquet"))
    got = {r["segment"]: (r["r_score"], r["f_score"], r["m_score"],
                          r["n_users"], r["mean_spend"])
           for r in user_rfm_segments(spark, str(tmp)).collect()}
    assert got == _rfm_reference(events), events


# ---------------------------------------------------------------------------
# Pareto concentration and supplier HHI vs sequential replays
# ---------------------------------------------------------------------------

_LI_SCHEMA = ("l_orderkey long, l_partkey long, l_suppkey long, "
              "l_extendedprice double, l_discount double, "
              "l_shipdate timestamp_ntz")


_T0 = __import__("datetime").datetime(2024, 1, 5)


def _write_li_star(spark, tmp, lines, supp_nations=None):
    """lines: (partkey, suppkey, price_cents, discount_pct)."""
    spark.createDataFrame(
        [(i, p, s, c / 100.0, d / 100.0, _T0)
         for i, (p, s, c, d) in enumerate(lines)], _LI_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/lineitem.parquet")
    if supp_nations is not None:
        spark.createDataFrame(
            [(s, f"s{s}", n) for s, n in supp_nations.items()],
            "s_suppkey long, s_name string, s_nationkey long"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp}/supplier.parquet")
        spark.createDataFrame(
            [(n, f"NATION_{n}", 0) for n in set(supp_nations.values())],
            "n_nationkey long, n_name string, n_regionkey long"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp}/nation.parquet")
    return str(tmp)


def _pareto_reference(lines):
    """Sequential replay: per-part dsum revenue, lossless 2dp total,
    desc-(revenue, partkey) ranking with the window-order cumulative
    IEEE share sum."""
    per = {}
    for p, _, c, d in lines:
        t = (c / 100.0) * (1 - d / 100.0)
        per[p] = per.get(p, 0) + math.floor(t * 1e4 + 0.5)
    rev = {p: math.floor((t + 50) / 100.0) / 100.0
           for p, t in per.items()}
    total = sum(math.floor(r * 100 + 0.5) for r in rev.values()) / 100.0
    order = sorted(rev, key=lambda p: (-rev[p], p))[:25]
    out, cum = {}, 0.0
    for p in order:
        cum += rev[p]
        out[p] = (rev[p],
                  math.floor(rev[p] / total * 1e6 + 0.5) / 1e6,
                  math.floor(cum / total * 1e6 + 0.5) / 1e6)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lines=st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 3),
              st.integers(1, 10 ** 6), st.integers(0, 50)),
    min_size=1, max_size=20))
def test_pareto_matches_python_reference(spark, tmp_path_factory,
                                         lines):
    """Random priced lineitems (revenue ties broken by partkey,
    multi-line parts the dsum must fold order-independently): the
    top-N Pareto report must match the sequential replay — shares,
    and the window-ordered cumulative share."""
    from data_warehouse_project_spark.plans.warehouse import (
        part_pareto_concentration)
    tmp = tmp_path_factory.mktemp("pareto")
    _write_li_star(spark, tmp, lines)
    got = {r["l_partkey"]: (r["revenue"], r["share"], r["cum_share"])
           for r in part_pareto_concentration(spark, str(tmp)).collect()}
    assert got == _pareto_reference(lines), lines


def _hhi_reference(lines, supp_nations):
    """Sequential replay: per-supplier exact cents, per-nation totals,
    micro-point-quantized share-squared sum, top-supplier share."""
    per = {}
    for _, s, c, d in lines:
        t = (c / 100.0) * (1 - d / 100.0)
        per[s] = per.get(s, 0) + math.floor(t * 100 + 0.5)
    nations = {}
    for s, cents in per.items():
        nations.setdefault(f"NATION_{supp_nations[s]}", []).append(cents)
    out = {}
    for nat, cs in nations.items():
        tot = sum(cs)
        qh = sum(math.floor((c / tot) * (c / tot) * 1e10 + 0.5)
                 for c in cs)
        out[nat] = (len(cs),
                    math.floor(qh / 1e6 * 100 + 0.5) / 100,
                    math.floor(max(cs) / tot * 100 * 1e4 + 0.5) / 1e4)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lines=st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 4),
              st.integers(1, 10 ** 6), st.integers(0, 50)),
    min_size=1, max_size=20),
    nations=st.tuples(st.integers(0, 1), st.integers(0, 1),
                      st.integers(0, 1), st.integers(0, 1)))
def test_hhi_matches_python_reference(spark, tmp_path_factory, lines,
                                      nations):
    """Random supplier revenue splits across random nation
    assignments (monopoly nations, even splits, multi-line
    suppliers): the HHI audit must match the sequential quantized
    share-squared replay per nation."""
    from data_warehouse_project_spark.plans.warehouse import (
        supplier_hhi_by_nation)
    supp_nations = {s: nations[s - 1] for s in range(1, 5)}
    tmp = tmp_path_factory.mktemp("hhi")
    _write_li_star(spark, tmp, lines, supp_nations)
    got = {r["nation"]: (r["n_suppliers"], r["hhi"], r["top_share_pct"])
           for r in supplier_hhi_by_nation(spark, str(tmp)).collect()}
    assert got == _hhi_reference(lines, supp_nations), (lines, nations)


def _ship_lat_reference(lines):
    """Sequential integer-rank quantile replay per priority group."""
    groups = {}
    for p, lat in lines:
        groups.setdefault(f"P{p}", []).append(lat)

    def q(vals, num, den):
        s, n = sorted(vals), len(vals)
        cum = 0
        for v in sorted(set(s)):
            cum += s.count(v)
            if cum * den >= n * num:
                return v

    return {g: (len(v), q(v, 1, 2), q(v, 9, 10), q(v, 99, 100))
            for g, v in groups.items()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lines=st.lists(st.tuples(st.integers(0, 2),
                                st.integers(-2, 40)),
                      min_size=1, max_size=25))
def test_ship_latency_matches_python_reference(spark, tmp_path_factory,
                                               lines):
    """Random per-priority latency draws (ties on the rank
    boundaries, negative latencies, single-line groups): the
    histogram-rank SLA report must match the sequential integer-rank
    quantile replay."""
    import datetime as dt

    from data_warehouse_project_spark.plans.warehouse import (
        ship_latency_quantiles)
    t0 = dt.datetime(2024, 1, 10)
    tmp = tmp_path_factory.mktemp("lat")
    spark.createDataFrame(
        [(i, i % 7, 1, 100.0, (t0 + dt.timedelta(days=lat)))
         for i, (_, lat) in enumerate(lines)],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_extendedprice double, l_shipdate timestamp_ntz"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/lineitem.parquet")
    spark.createDataFrame(
        [(i, 1, "O", 100.0, t0, f"P{p}")
         for i, (p, _) in enumerate(lines)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/orders.parquet")
    got = {r["o_orderpriority"]: (r["n_lines"], r["p50_days"],
                                  r["p90_days"], r["p99_days"])
           for r in ship_latency_quantiles(spark, str(tmp)).collect()}
    assert got == _ship_lat_reference(lines), lines


def _aging_reference(orders):
    """Sequential replay: age vs the corpus max order day, the
    30/60/90/180/365 band case, per (status, band) count + dsum."""
    from data_warehouse_project_spark.plans.warehouse import _AGING_BANDS
    anchor = max(d for _, d, _ in orders)
    out = {}
    for s, d, cents in orders:
        age = anchor - d
        band = None
        prev = 0
        for i, ub in enumerate(_AGING_BANDS):
            if age <= ub:
                band = (f"000-{ub:03d}" if i == 0
                        else f"{prev + 1:03d}-{ub:03d}")
                break
            prev = ub
        if band is None:
            band = f"{_AGING_BANDS[-1] + 1:03d}+"
        n, t = out.get((s, band), (0, 0))
        out[(s, band)] = (n + 1,
                          t + math.floor(cents / 100.0 * 1e4 + 0.5))
    return {k: (n, math.floor((t + 50) / 100.0) / 100.0)
            for k, (n, t) in out.items()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(orders=st.lists(st.tuples(st.sampled_from(["O", "F", "P"]),
                                 st.integers(0, 500),
                                 st.integers(0, 10 ** 6)),
                       min_size=1, max_size=20))
def test_order_aging_matches_python_reference(spark, tmp_path_factory,
                                              orders):
    """Random (status, order-day, price) draws with ages straddling
    every band boundary: the aging report must match the sequential
    band-case replay, dsum values included."""
    import datetime as dt

    from data_warehouse_project_spark.plans.warehouse import (
        order_aging_report)
    t0 = dt.datetime(2022, 1, 1)
    tmp = tmp_path_factory.mktemp("aging")
    spark.createDataFrame(
        [(i, 1, s, c / 100.0, t0 + dt.timedelta(days=d), "3-MEDIUM")
         for i, (s, d, c) in enumerate(orders)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/orders.parquet")
    got = {(r["o_orderstatus"], r["age_band"]):
           (r["n_orders"], r["total_value"])
           for r in order_aging_report(spark, str(tmp)).collect()}
    assert got == _aging_reference(orders), orders


def _gap_reference(events):
    """Sequential replay: full hour spine min..max, per type the
    observed hours, missing count and first/last gap hour offsets."""
    hours = sorted({h for h, _ in events})
    lo, hi = hours[0], hours[-1]
    spine = list(range(lo, hi + 1))
    types = {t for _, t in events}
    out = {}
    for t in sorted(types):
        obs = {h for h, tt in events if tt == t}
        missing = [h for h in spine if h not in obs]
        out[t] = (len(spine), len(obs), len(missing),
                  missing[0] if missing else None,
                  missing[-1] if missing else None)
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(st.tuples(st.integers(0, 30),
                                 st.sampled_from(["click", "view"])),
                       min_size=1, max_size=25))
def test_gap_report_matches_python_reference(spark, tmp_path_factory,
                                             events):
    """Random sparse (hour, type) observations — gapless types,
    all-gap types outside their own hours, single-hour corpora: the
    spine anti-join gap audit must match the sequential replay,
    first/last gap hours included."""
    import datetime as dt

    from data_warehouse_project_spark.plans.audits import (
        events_gap_report)
    t0 = dt.datetime(2024, 1, 1)
    tmp = tmp_path_factory.mktemp("gap")
    spark.createDataFrame(
        [(i, t0 + dt.timedelta(hours=h, minutes=i % 60), 1, t, 1.0, "{}")
         for i, (h, t) in enumerate(events)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/events.parquet")

    def off(v):
        return (int((v - t0).total_seconds()) // 3600
                if v is not None else None)

    got = {r["event_type"]: (r["n_expected"], r["n_observed"],
                             r["n_missing"], off(r["first_gap"]),
                             off(r["last_gap"]))
           for r in events_gap_report(spark, str(tmp)).collect()}
    assert got == _gap_reference(events), events


def _scorecard_reference(lines):
    """Sequential replay: per-supplier line counts, return fraction,
    dsum net revenue, histogram-rank median latency, top-N by
    (revenue desc, suppkey)."""
    per = {}
    for s, lat, ret, c, d in lines:
        net = (c / 100.0) * (1 - d / 100.0)
        n, r, t, lats = per.get(s, (0, 0, 0, []))
        per[s] = (n + 1, r + ret, t + math.floor(net * 1e4 + 0.5),
                  lats + [lat])
    rows = {}
    for s, (n, r, t, lats) in per.items():
        rev = math.floor((t + 50) / 100.0) / 100.0
        sl = sorted(lats)
        cum, med = 0, None
        for v in sorted(set(sl)):
            cum += sl.count(v)
            if cum * 2 >= len(sl):
                med = v
                break
        rows[s] = (f"s{s}", n, rev,
                   math.floor(r / n * 1e6 + 0.5) / 1e6, med)
    top = sorted(rows, key=lambda s: (-rows[s][2], s))[:25]
    return {s: rows[s] for s in top}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lines=st.lists(
    st.tuples(st.integers(1, 4),            # suppkey
              st.integers(0, 60),           # latency days
              st.integers(0, 1),            # returned
              st.integers(1, 10 ** 6),      # price cents
              st.integers(0, 50)),          # discount pct
    min_size=1, max_size=20))
def test_supplier_scorecard_matches_python_reference(
        spark, tmp_path_factory, lines):
    """Random supplier line draws (all-returned suppliers, tied
    median ranks, revenue ties broken by key): the scorecard must
    match the sequential replay — counts, dsum revenue, quantized
    return fraction, and the histogram median latency."""
    import datetime as dt

    from data_warehouse_project_spark.plans.warehouse import (
        supplier_scorecard)
    t0 = dt.datetime(2024, 1, 10)
    tmp = tmp_path_factory.mktemp("sc")
    spark.createDataFrame(
        [(i, 1, s, c / 100.0, d / 100.0,
          "R" if ret else "N", t0 + dt.timedelta(days=lat))
         for i, (s, lat, ret, c, d) in enumerate(lines)],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_extendedprice double, l_discount double, "
        "l_returnflag string, l_shipdate timestamp_ntz"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/lineitem.parquet")
    spark.createDataFrame(
        [(i, 1, "O", 1.0, t0, "3-MEDIUM") for i in range(len(lines))],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/orders.parquet")
    spark.createDataFrame(
        [(s, f"s{s}", 0) for s in range(1, 5)],
        "s_suppkey long, s_name string, s_nationkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/supplier.parquet")
    got = {r["l_suppkey"]: (r["s_name"], r["n_lines"], r["revenue"],
                            r["return_frac"], r["p50_latency_days"])
           for r in supplier_scorecard(spark, str(tmp)).collect()}
    assert got == _scorecard_reference(lines), lines


def _ldiv_reference(custs):
    """Sequential replay: fixed acctbal bands, per-QI distinct band
    counts, diversity rollup with the below-l row mass."""
    bands = (0, 2500, 5000, 7500)
    eq = {}
    for seg, nat, bal in custs:
        b = sum(bal >= e for e in bands)
        sens, n = eq.get((seg, nat), (set(), 0))
        eq[(seg, nat)] = (sens | {b}, n + 1)
    out = {}
    for sens, n in eq.values():
        d = len(sens)
        g, c, below = out.get(d, (0, 0, 0))
        out[d] = (g + 1, c + n, below + (n if d < 3 else 0))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(custs=st.lists(
    st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 2),
              st.integers(-1000, 9000)),
    min_size=1, max_size=25))
def test_l_diversity_matches_python_reference(spark, tmp_path_factory,
                                              custs):
    """Random quasi-identifier groups with band values straddling
    every fixed edge (negative balances in band 0): the l-diversity
    profile must match the sequential distinct-band replay at every
    diversity level."""
    from data_warehouse_project_spark.plans.audits import (
        l_diversity_report)
    tmp = tmp_path_factory.mktemp("ldiv")
    spark.createDataFrame(
        [(i, seg, n, float(b)) for i, (seg, n, b) in enumerate(custs)],
        "c_custkey long, c_mktsegment string, c_nationkey long, "
        "c_acctbal double"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/customer.parquet")
    got = {r["diversity"]: (r["n_groups"], r["n_customers"],
                            r["n_below_l"])
           for r in l_diversity_report(spark, str(tmp)).collect()}
    assert got == _ldiv_reference(custs), custs


def _kanon_reference(custs):
    """Sequential replay: QI group sizes, power-of-two size band via
    bit length, per-band group/row/below-k mass."""
    eq = {}
    for seg, nat in custs:
        eq[(seg, nat)] = eq.get((seg, nat), 0) + 1
    out = {}
    for gsize in eq.values():
        band = gsize.bit_length()
        g, c, below = out.get(band, (0, 0, 0))
        out[band] = (g + 1, c + gsize,
                     below + (gsize if gsize < 5 else 0))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(custs=st.lists(
    st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 2)),
    min_size=1, max_size=30))
def test_k_anonymity_matches_python_reference(spark, tmp_path_factory,
                                              custs):
    """Random quasi-identifier populations (singleton groups, groups
    straddling the k = 5 threshold and the power-of-two band edges):
    the k-anonymity profile must match the sequential bit-length
    band replay."""
    from data_warehouse_project_spark.plans.audits import (
        k_anonymity_report)
    tmp = tmp_path_factory.mktemp("kanon")
    spark.createDataFrame(
        [(i, seg, n, 0.0) for i, (seg, n) in enumerate(custs)],
        "c_custkey long, c_mktsegment string, c_nationkey long, "
        "c_acctbal double"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp}/customer.parquet")
    got = {r["size_band_log2"]: (r["n_groups"], r["n_customers"],
                                 r["n_below_k"])
           for r in k_anonymity_report(spark, str(tmp)).collect()}
    assert got == _kanon_reference(custs), custs

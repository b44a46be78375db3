"""Local mini-driver: compare a Spark query result against its DuckDB
oracle the same way the round driver does — row count, schema (column
names), and an order-insensitive value comparison.

Doubles are compared with tolerance (the driver rounds before hashing;
locally we assert closeness so borderline rounding shows up as a
warning-level diff instead of a silent hash flake).
"""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (pd.Timestamp, datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows, key=repr)


def _dtype_family(col: pd.Series) -> str:
    """Coarse dtype family for driver-hash-compatibility checks."""
    kind = col.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    # object dtype: classify by the first non-null value
    nn = col.dropna()
    if len(nn) == 0:
        return "empty"
    v = nn.iloc[0]
    import decimal

    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, str):
        return "str"
    return "other"


def _check_dtype_families(sp: pd.DataFrame, du: pd.DataFrame, name: str) -> None:
    """Fail on int-vs-float family divergence in null-free columns.

    The round driver hashes pandas cell reprs, so a DuckDB column that
    surfaces as float64 (e.g. HUGEINT from a windowed SUM(BIGINT))
    against a Spark int64 hashes ``4377.0`` vs ``4377`` and fails the
    driver even though every value is numerically identical (VERDICT
    r8 "what's wrong" #1/#2 — events_value_drift_daily). Value-wise
    comparison can't see this (``4377.0 == 4377``), so assert the
    dtype families directly. Columns containing nulls are exempt:
    pandas promotes nullable int columns to float64 on conversion in
    engine-specific ways, and the driver's own hasher sees the same
    promotion on both sides there.
    """
    for c in sp.columns:
        fs, fd = _dtype_family(sp[c]), _dtype_family(du[c])
        if fs == fd or "empty" in (fs, fd):
            continue
        if {fs, fd} == {"int", "float"}:
            if sp[c].isna().any() or du[c].isna().any():
                continue  # null-promotion artifact, both engines agree value-wise
            raise AssertionError(
                f"{name}: column {c!r} dtype-family mismatch spark={fs} "
                f"duckdb={fd} with no nulls — the driver hashes these "
                f"differently (int 4377 vs float 4377.0) even when values "
                f"are identical; CAST the oracle (or the Spark plan) so "
                f"both sides agree"
            )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duckdb={len(du)}"
    _check_dtype_families(sp, du, name)
    a, b = _canon(sp), _canon(du)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:3]}"


#: Queries whose Spark and DuckDB results LEGITIMATELY diverge on a
#: ZERO-ROW corpus, with the reason — the documented-divergence list
#: of the round-9 empty-input discipline. Two classes:
#: (a) accuracy floors whose oracle is a PINNED constant encoding the
#:     driver-corpus contract (estimate-vs-exact gates are vacuous
#:     with no data; Spark reports NULL/0-evidence verdicts);
#: (b) GROUPING SETS/CUBE/ROLLUP: on empty input Spark emits zero
#:     rows while DuckDB (like PostgreSQL) emits the global () row —
#:     a real, documented engine-semantics difference, unreachable
#:     from driver data and not worth an isEmpty() action in the
#:     plan's hot path.
#: Everything else must agree engine-to-engine even on empty input.
EMPTY_INPUT_DIVERGENT = {
    "ann_recall_floor": "pinned-constant floor; vacuous with no data",
    "approx_quantile_accuracy_floor": "pinned floor; vacuous w/o data",
    "bpe_encode_floor": "pinned floor (has_merged_token presumes corpus)",
    "bpe_merge_floor": "pinned floor (n_rules=8 presumes the corpus)",
    "cms_accuracy_floor": "pinned-constant floor; vacuous w/o data",
    "equijoin_size_estimate_floor": "pinned floor; vacuous w/o data",
    "hll_distinct_accuracy_floor": "pinned floor; vacuous w/o data",
    "kmv_accuracy_floor": "pinned-constant floor; vacuous w/o data",
    "mg_fold_bound_floor": "pinned-constant floor; vacuous w/o data",
    "minhash_accuracy_floor": "pinned-constant floor; vacuous w/o data",
    "pca_projection_floor": "pinned floor; NULL verdicts w/o corpus",
    "cube_flags": "Spark CUBE emits 0 rows on empty; DuckDB emits ()",
    "geo_revenue_rollup": "Spark ROLLUP 0 rows on empty vs DuckDB ()",
    "grouping_sets_mixed": "Spark GROUPING SETS 0 rows vs DuckDB ()",
    "rollup_status_priority": "Spark ROLLUP 0 rows vs DuckDB ()",
}


def compare_empty(spark_df, con: duckdb.DuckDBPyConnection, sql: str,
                  name: str = "?") -> None:
    """Engine comparison for ZERO-ROW inputs: like compare(), but None
    and NaN cells are unified (both render SQL NULL — pandas merely
    surfaces nullable bool/int columns as object-None from Spark and
    float-NaN from DuckDB), and the dtype-family check is skipped
    (all-null and empty columns make families meaningless)."""
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} "
        f"duckdb={sorted(du.columns)}")
    assert len(sp) == len(du), (
        f"{name}: row count spark={len(sp)} duckdb={len(du)}")

    def nn(row):
        return tuple(None if x == "NaN" else x for x in row)

    a = [nn(r) for r in _canon(sp)]
    b = [nn(r) for r in _canon(du)]
    mismatches = [(x, y) for x, y in zip(sorted(a, key=repr),
                                         sorted(b, key=repr)) if x != y]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches on empty input; "
        f"first: {mismatches[:3]}")


def make_empty_sf_dir(path: str, template_sf_dir: str) -> None:
    """Write a zero-row parquet twin of every catalog table."""
    os.makedirs(path, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(template_sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}') LIMIT 0) "
                f"TO '{os.path.join(path, t + '.parquet')}' "
                f"(FORMAT PARQUET)")
    con.close()

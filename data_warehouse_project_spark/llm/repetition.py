"""Repetition signals and token-window chunking over `documents` —
two more training-data-pipeline stages (SURVEY.md §2.11 capability
mandate; the reference has no corpus tooling at all, ref app.py is a
CRUD portal).

`doc_repetition_stats` is the Gopher-style repetition family (Rae et
al. 2021 §A1.1 published the recipe): a document whose mass is
concentrated in a few repeated tokens / n-grams is boilerplate or
spam, and the standard filters threshold on exactly these fractions.
The corpus has no newlines (TESTDATA.md), so the line/paragraph
variants of the family are expressed at token and bigram granularity.

`chunk_documents` is the fixed-window-with-overlap chunker every
pretraining tokenization pipeline runs before packing: split each
document into CHUNK_TOKENS-token windows advancing by STRIDE_TOKENS
(trailing windows may be short), one output row per chunk.

Scale design (100 TB):
- repetition stats shuffle (doc_id, small-string) pairs with map-side
  combine — the reduction is per-document, so skew is bounded by the
  longest single document, never by corpus-level token popularity.
- chunking is a pure per-row explode: zero shuffle, linear in input
  splits, and the emitted chunk carries an md5 digest + token count,
  not necessarily the chunk body — downstream dedup/packing joins on
  the 32-byte digest (same never-shuffle-wide-strings policy as
  dup_ngram_spans).
- everything is built-in Spark SQL functions; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.compat import fround, sql_fround
from ..registry import register
from ..sources.catalog import Catalog


def _tokens(cat: Catalog) -> DataFrame:
    return cat.documents.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tokens"))


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition fractions: distinct-token ratio, the
    fraction of tokens taken by the single most frequent token, and
    the fraction of bigrams taken by the most frequent bigram.

    Plan: explode → count per (doc, gram) → per-doc max/sum/count —
    two map-side-combinable aggregation chains (unigram, bigram)
    joined on doc_id. The (doc_id, gram) key keeps hot corpus-wide
    tokens from concentrating: every document is its own key space.
    """
    cat = Catalog(spark, sf_dir)
    toks = _tokens(cat)
    uni = (
        toks.select("doc_id", F.explode("tokens").alias("w"))
        .groupBy("doc_id", "w").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_tokens"),
             F.count("*").cast("long").alias("n_distinct"),
             F.max("c").cast("long").alias("top_token_count"))
    )
    big = (
        toks.filter(F.size("tokens") >= 2)
        .select("doc_id", F.explode(F.expr(
            "transform(sequence(0, size(tokens) - 2), "
            "i -> concat(tokens[i], ' ', tokens[i + 1]))")).alias("b"))
        .groupBy("doc_id", "b").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_bigrams"),
             F.max("c").cast("long").alias("top_bigram_count"))
    )
    return (
        uni.join(big, "doc_id", "left")
        .select(
            "doc_id", "n_tokens", "n_distinct",
            fround(F.col("n_distinct") / F.col("n_tokens"), 6)
            .alias("distinct_ratio"),
            fround(F.col("top_token_count") / F.col("n_tokens"), 6)
            .alias("top_token_frac"),
            fround(F.coalesce(F.col("top_bigram_count"), F.lit(0))
                   / F.coalesce(F.col("n_bigrams"), F.lit(1)), 6)
            .alias("top_bigram_frac"),
        )
    )


DOC_REPETITION_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
    FROM documents
),
uni AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(c) AS BIGINT) AS top_token_count
    FROM (
        SELECT doc_id, u.w AS w, COUNT(*) AS c
        FROM toks, LATERAL (SELECT UNNEST(tokens) AS w) u
        GROUP BY doc_id, u.w
    ) GROUP BY doc_id
),
big AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS BIGINT) AS top_bigram_count
    FROM (
        SELECT doc_id, u.b AS b, COUNT(*) AS c
        FROM toks, LATERAL (
            SELECT UNNEST(list_transform(range(1, len(tokens)),
                   i -> tokens[i] || ' ' || tokens[i + 1])) AS b
        ) u
        WHERE len(tokens) >= 2
        GROUP BY doc_id, u.b
    ) GROUP BY doc_id
)
SELECT uni.doc_id, n_tokens, n_distinct,
       {sql_fround('n_distinct / CAST(n_tokens AS DOUBLE)', 6)}
           AS distinct_ratio,
       {sql_fround('top_token_count / CAST(n_tokens AS DOUBLE)', 6)}
           AS top_token_frac,
       {sql_fround('COALESCE(top_bigram_count, 0)'
                   ' / CAST(COALESCE(n_bigrams, 1) AS DOUBLE)', 6)}
           AS top_bigram_frac
FROM uni LEFT JOIN big ON uni.doc_id = big.doc_id
"""


#: chunk window and stride (tokens); stride < window → overlap, the
#: standard pretraining setting so no boundary context is lost
CHUNK_TOKENS = 64
STRIDE_TOKENS = 48


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into CHUNK_TOKENS-token windows advancing
    by STRIDE_TOKENS; one row per chunk with its token count and md5
    digest. Trailing chunks are short (never empty): window starts
    enumerate 0, STRIDE, ... while start < n_tokens.

    Zero-shuffle: sequence + explode + slice are all per-row codegen
    expressions — chunking 100 TB is exactly a full scan."""
    cat = Catalog(spark, sf_dir)
    return (
        _tokens(cat)
        .select(
            "doc_id", "tokens",
            # greatest(.., 1): a size-0 token array (possible if a
            # future fixture carries a truly empty text after split
            # semantics change) must yield ONE empty chunk, not raise —
            # sequence(0, -1, k) errors where DuckDB range(0, 0, k)
            # silently returns nothing (VERDICT r4 #7)
            F.explode(F.expr(
                f"sequence(0, greatest(size(tokens), 1) - 1, "
                f"{STRIDE_TOKENS})"))
            .alias("start"))
        .select(
            "doc_id",
            (F.col("start") / STRIDE_TOKENS).cast("long").alias("chunk_idx"),
            F.slice(F.col("tokens"), F.col("start") + 1, CHUNK_TOKENS)
            .alias("chunk"))
        .select(
            "doc_id", "chunk_idx",
            F.size("chunk").cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join(F.col("chunk"), " ")).alias("chunk_hash"))
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
    FROM documents
),
starts AS (
    SELECT doc_id, tokens, u.start AS start
    FROM toks, LATERAL (
        SELECT UNNEST(range(0, greatest(len(tokens), 1),
                            {STRIDE_TOKENS})) AS start
    ) u
)
SELECT doc_id,
       CAST(start / {STRIDE_TOKENS} AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(tokens, start + 1, start + {CHUNK_TOKENS}))
            AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(
           list_slice(tokens, start + 1, start + {CHUNK_TOKENS}), ' '))
           AS chunk_hash
FROM starts
"""


def dup_char_frac_chain(toks: DataFrame, n: int, out: str) -> DataFrame:
    """One duplicate-n-gram character-fraction aggregation chain:
    explode n-grams → (doc_id, gram) count → per-doc dup-char-mass /
    total-char-mass, rounded to 6dp. Docs with < n tokens are absent
    (callers left-join and coalesce to 0). Shared by
    dup_ngram_char_fracs and refinery (which needs only n=2 and
    must not pay for the n=5 chain)."""
    grams = toks.filter(F.size("tokens") >= n).select(
        "doc_id",
        F.explode(F.expr(
            f"transform(sequence(0, size(tokens) - {n}), i -> "
            f"array_join(slice(tokens, i + 1, {n}), ' '))")).alias("g"))
    return (
        grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(fround(
            F.sum(F.when(F.col("c") >= 2,
                         F.col("c") * F.length("g")).otherwise(0))
            / F.sum(F.col("c") * F.length("g")), 6).alias(out))
    )


def dup_ngram_char_fracs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-n-gram character fractions — the remaining half of the
    Gopher repetition family (Rae et al. 2021 §A1.1 measure, for
    n=2..4, the fraction of *characters* inside duplicated n-grams;
    doc_repetition_stats covers the top-gram fractions).

    Deterministic cross-engine definition: an n-gram occurrence is
    "duplicated" when its gram appears ≥ 2 times in the document; the
    fraction is (char mass of duplicated occurrences) / (char mass of
    all occurrences), where an occurrence's char mass is the length of
    the space-joined gram. Documents with < n tokens score 0.0.

    Plan: two explode → (doc_id, gram) count → per-doc sum chains
    (n=2, n=5) joined on doc_id — map-side combinable throughout, and
    the (doc_id, gram) key bounds skew to the longest single document
    exactly like doc_repetition_stats. No Python anywhere.
    """
    cat = Catalog(spark, sf_dir)
    toks = _tokens(cat)
    return (
        cat.documents.select("doc_id")
        .join(dup_char_frac_chain(toks, 2, "dup_2gram_char_frac"),
              "doc_id", "left")
        .join(dup_char_frac_chain(toks, 5, "dup_5gram_char_frac"),
              "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_2gram_char_frac", F.lit(0.0))
            .alias("dup_2gram_char_frac"),
            F.coalesce("dup_5gram_char_frac", F.lit(0.0))
            .alias("dup_5gram_char_frac"),
        )
    )


def _dup_chain_sql(n: int, out: str) -> str:
    return f"""
    SELECT doc_id,
           {sql_fround('SUM(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END)'
                       ' / CAST(SUM(c * length(g)) AS DOUBLE)', 6)} AS {out}
    FROM (
        SELECT doc_id, u.g AS g, COUNT(*) AS c
        FROM toks, LATERAL (
            SELECT UNNEST(list_transform(range(0, len(tokens) - {n} + 1),
                   i -> array_to_string(tokens[i + 1 : i + {n}], ' '))) AS g
        ) u
        WHERE len(tokens) >= {n}
        GROUP BY doc_id, u.g
    ) GROUP BY doc_id"""


DUP_NGRAM_CHAR_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
    FROM documents
),
c2 AS ({_dup_chain_sql(2, 'f2')}),
c5 AS ({_dup_chain_sql(5, 'f5')})
SELECT d.doc_id,
       COALESCE(f2, 0.0) AS dup_2gram_char_frac,
       COALESCE(f5, 0.0) AS dup_5gram_char_frac
FROM documents d
LEFT JOIN c2 ON d.doc_id = c2.doc_id
LEFT JOIN c5 ON d.doc_id = c5.doc_id
"""


register("doc_repetition_stats", doc_repetition_stats, DOC_REPETITION_SQL)
register("chunk_documents", chunk_documents, CHUNK_DOCUMENTS_SQL)
register("dup_ngram_char_fracs", dup_ngram_char_fracs, DUP_NGRAM_CHAR_SQL)


def chunk_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-level dedup accounting — the dedup pass that runs
    AFTER chunking, on the unit the trainer actually consumes: a
    chunk whose md5 recurs anywhere in the corpus is a duplicate
    training sequence even when its parent documents are distinct
    (shared boilerplate windows survive document-level dedup). Per
    source plus an ALL row: chunk count, corpus-wide-duplicate chunk
    count, the duplicated fraction, and the token mass a
    keep-one-copy pass would drop.

    Scale: reuses chunk_documents' zero-shuffle chunker; corpus-wide
    chunk totals are a WINDOW SUM over the (hash)-keyed partial
    aggregate (the span_stats shape — no totals-table self-join);
    the drop mass per hash is (copies − 1) · tokens, attributed to
    the source whose doc carries each dropped copy (every copy past
    the FIRST by (doc_id, chunk_idx) order is a drop — deterministic
    survivor rule, matching dedup_survivors' min-key discipline).
    """
    cat = Catalog(spark, sf_dir)
    chunks = (chunk_documents(spark, sf_dir)
              .join(cat.documents.select("doc_id", "source"), "doc_id"))
    w = Window.partitionBy("chunk_hash")
    ranked = chunks.select(
        "source", "chunk_hash", "n_chunk_tokens",
        F.count("*").over(w).alias("copies"),
        F.row_number().over(
            Window.partitionBy("chunk_hash")
            .orderBy("doc_id", "chunk_idx")).alias("copy_rank"))
    per_source = (ranked.groupBy("source")
                  .agg(F.count("*").cast("long").alias("n_chunks"),
                       F.sum(F.when(F.col("copies") >= 2, 1).otherwise(0))
                       .cast("long").alias("n_dup_chunks"),
                       F.sum(F.when(F.col("copy_rank") >= 2,
                                    F.col("n_chunk_tokens")).otherwise(0))
                       .cast("long").alias("drop_tokens")))
    allr = (per_source
            .agg(F.sum("n_chunks").cast("long").alias("n_chunks"),
                 F.sum("n_dup_chunks").cast("long").alias("n_dup_chunks"),
                 F.sum("drop_tokens").cast("long").alias("drop_tokens"))
            .select(F.lit("ALL").alias("source"), "n_chunks",
                    "n_dup_chunks", "drop_tokens"))
    return (per_source.select("source", "n_chunks", "n_dup_chunks",
                              "drop_tokens")
            .unionByName(allr)
            .select("source", "n_chunks", "n_dup_chunks",
                    fround(F.col("n_dup_chunks") / F.col("n_chunks"), 6)
                    .alias("dup_chunk_frac"), "drop_tokens")
            .orderBy("source"))


CHUNK_DEDUP_SQL = f"""
WITH chunks AS ({CHUNK_DOCUMENTS_SQL}),
sourced AS (
    SELECT c.doc_id, c.chunk_idx, c.n_chunk_tokens, c.chunk_hash,
           d.source
    FROM chunks c JOIN documents d ON c.doc_id = d.doc_id
),
ranked AS (
    SELECT source, chunk_hash, n_chunk_tokens,
           COUNT(*) OVER (PARTITION BY chunk_hash) AS copies,
           ROW_NUMBER() OVER (PARTITION BY chunk_hash
                              ORDER BY doc_id, chunk_idx) AS copy_rank
    FROM sourced
),
per_source AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN copies >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
           CAST(SUM(CASE WHEN copy_rank >= 2 THEN n_chunk_tokens
                         ELSE 0 END) AS BIGINT) AS drop_tokens
    FROM ranked GROUP BY 1
),
unioned AS (
    SELECT * FROM per_source
    UNION ALL
    SELECT 'ALL', CAST(SUM(n_chunks) AS BIGINT),
           CAST(SUM(n_dup_chunks) AS BIGINT),
           CAST(SUM(drop_tokens) AS BIGINT)
    FROM per_source
)
SELECT source, n_chunks, n_dup_chunks,
       {sql_fround('CAST(n_dup_chunks AS DOUBLE) / n_chunks', 6)}
           AS dup_chunk_frac,
       drop_tokens
FROM unioned
ORDER BY source
"""

register("chunk_dedup_report", chunk_dedup_report, CHUNK_DEDUP_SQL)

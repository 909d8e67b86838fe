"""Graded text-pipeline queries: exact dedup (L1), text analysis
suite (L4 — lang stats, token counting, language-ID, quality scoring,
content fingerprinting) over the documents fixture."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.functions.text import (
    BPE_TOKENS_SQL,
    CONTENT_FINGERPRINT_SQL,
    LANG_ID_SQL,
    STOPWORDS,
    bpe_tokens,
    content_fingerprint,
    lang_id,
    quality_score,
    ws_tokens,
)
from meepo_spark.registry import register


@register(
    "l1_exact_dedup",
    oracle="""
    WITH survivors AS (
        SELECT MIN(doc_id) AS doc_id, ANY_VALUE(lang) AS lang, COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    )
    SELECT lang,
           COUNT(*)                                   AS n_unique_docs,
           CAST(SUM(n_copies) AS BIGINT)              AS n_total_docs,
           CAST(SUM(n_copies) - COUNT(*) AS BIGINT)   AS n_removed
    FROM survivors
    GROUP BY lang
    """,
)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: exact dedup via content-hash groupBy (not dropDuplicates —
    the survivor is pinned to min doc_id, deterministic at any
    parallelism). Output: per-lang dedup accounting.

    At 100 TB: sha/md5-hash groupBy is the only exact-dedup shape that
    scales — the shuffle key is the 128-bit digest, never the text.
    """
    d = table(spark, sf_dir, "documents")
    survivors = d.groupBy(F.md5("text")).agg(
        F.min("doc_id").alias("doc_id"),
        F.any_value("lang").alias("lang"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_unique_docs"),
        F.sum("n_copies").alias("n_total_docs"),
        (F.sum("n_copies") - F.count(F.lit(1))).alias("n_removed"),
    )


@register(
    "l4_lang_stats",
    oracle="""
    SELECT lang,
           COUNT(*)                                        AS n_docs,
           ROUND(AVG(n_chars) + 1e-9, 2)                   AS avg_chars,
           CAST(COUNT(DISTINCT source) AS BIGINT)          AS n_sources,
           CAST(MIN(n_chars) AS BIGINT)                    AS min_chars,
           CAST(MAX(n_chars) AS BIGINT)                    AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def l4_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: corpus language distribution + length stats."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars") + 1e-9, 2).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "l4b_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(string_split(lower(text), ' ')) AS INT)         AS n_ws_tokens,
           CAST(LEN({BPE_TOKENS_SQL.format(c='text')}) AS INT)      AS n_bpe_tokens,
           CAST(LEN(list_distinct(string_split(lower(text), ' '))) AS INT) AS n_uniq_tokens,
           ROUND(LENGTH(text)::DOUBLE / LEN(string_split(lower(text), ' ')) + 1e-9, 2) AS chars_per_token
    FROM documents
    WHERE doc_id < 500
    """,
)
def l4b_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: token counting — whitespace tokens, BPE-ish pre-tokens
    (regexp), distinct vocab, chars/token ratio. All map-side."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    toks = ws_tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_ws_tokens"),
        F.size(bpe_tokens(F.col("text"))).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.round(F.length("text").cast("double") / F.size(toks) + 1e-9, 2).alias(
            "chars_per_token"
        ),
    )


@register(
    "l4c_lang_id",
    oracle=f"""
    SELECT lang                         AS labeled_lang,
           {LANG_ID_SQL.format(c='text')} AS predicted_lang,
           COUNT(*)                     AS n
    FROM documents
    GROUP BY 1, 2
    """,
)
def l4c_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: language-ID heuristic (character-class n-gram evidence)
    cross-tabulated against the labeled lang column."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("labeled_lang"),
            lang_id(F.col("text")).alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_STOP_SQL = "', '".join(STOPWORDS)


@register(
    "l4d_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text,
               string_split(lower(text), ' ') AS toks,
               LEN(string_split(lower(text), ' ')) AS n_tokens
        FROM documents WHERE doc_id < 500
    )
    SELECT doc_id,
           ROUND(GREATEST(LEAST(
               0.5 * LEAST(LENGTH(text) / 400.0, 1.0)
             + 0.4 * LEAST(LEN(LIST_FILTER(toks, x -> x IN ('{_STOP_SQL}')))::DOUBLE
                           / GREATEST(n_tokens, 1) * 5, 1.0)
             - 0.3 * LEN(LIST_FILTER(toks, x -> regexp_matches(x, '^[^a-z0-9]+$')))::DOUBLE
                           / GREATEST(n_tokens, 1)
           , 1.0), 0.0) + 1e-9, 4)  AS quality
    FROM t
    """,
)
def l4d_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: composite quality score — length saturation + stopword
    density − punctuation-token penalty, clamped to [0,1]."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    toks = ws_tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    n_punct = F.size(F.filter(toks, lambda x: x.rlike("^[^a-z0-9]+$")))
    return d.select(
        "doc_id",
        quality_score(F.col("text"), n_tokens, n_stop, n_punct).alias("quality"),
    )


@register(
    "l4e_fingerprint_groups",
    oracle=f"""
    SELECT {CONTENT_FINGERPRINT_SQL.format(c='text')}  AS fingerprint,
           COUNT(*)                                    AS n_docs,
           CAST(MIN(doc_id) AS BIGINT)                 AS canonical_doc
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
)
def l4e_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: content fingerprint (md5 of sorted distinct token set) —
    vocabulary-identical docs collide; the cheap map-side prefilter
    that catches shuffled/reordered near-dups before MinHash runs."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(content_fingerprint(F.col("text")).alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_doc"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "l4f_tfidf_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY token)
    SELECT t.lang, t.token,
           CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(ANY_VALUE(df.doc_freq) AS BIGINT) AS doc_freq,
           ROUND(COUNT(*) * LN((SELECT COUNT(*) FROM documents)::DOUBLE
                               / ANY_VALUE(df.doc_freq)), 4) AS tfidf
    FROM tok t
    JOIN df ON df.token = t.token
    WHERE df.doc_freq >= 2
    GROUP BY t.lang, t.token
    HAVING COUNT(*) >= 3
    """,
)
def l4f_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: TF-IDF term scoring per language — term frequency within
    the lang partition × ln(N/df) corpus rarity, hapax noise
    dropped by the df ≥ 2 bound (a production corpus would add a
    relative upper df bound as a statistical stopword list; this
    fixture's vocabulary is deliberately tiny, so every term is
    common and the band would be empty).
    Two aggregates over the exploded token stream; the df side is
    token-grain (vocabulary-sized, broadcastable) while tf is
    (lang, token)-grain. ln() of an integer ratio is the one float op
    — identical IEEE input on both engines, 4dp rounding absorbs libm
    ulp skew."""
    d = table(spark, sf_dir, "documents")
    n_docs = d.count()
    tok = d.select(
        "doc_id", "lang", F.explode(ws_tokens(F.col("text"))).alias("token")
    )
    df_tbl = (
        tok.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("doc_freq"))
        .filter(F.col("doc_freq") >= 2)
    )
    return (
        tok.join(F.broadcast(df_tbl), "token")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("doc_freq").alias("doc_freq"))
        .filter(F.col("tf") >= 3)
        .select(
            "lang",
            "token",
            "tf",
            "doc_freq",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 4
            ).alias("tfidf"),
        )
    )

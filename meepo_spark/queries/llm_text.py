"""Graded text-pipeline queries: exact dedup (L1), text analysis
suite (L4 — lang stats, token counting, language-ID, quality scoring,
content fingerprinting) over the documents fixture."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.operators.broadcast_gate import maybe_broadcast
from meepo_spark.queries._bm25_sql import BM25_IDX_CTES
from meepo_spark.queries.doc_cache import tokenized_docs
from meepo_spark.queries._session_cache import SessionFrameCache
from meepo_spark.functions.text import (
    BPE_TOKENS_SQL,
    CONTENT_FINGERPRINT_SQL,
    LANG_ID_SQL,
    STOPWORDS,
    bpe_tokens,
    content_fingerprint,
    lang_id,
    quality_score,
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
    d = tokenized_docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    toks = F.col("toks")
    return d.select(
        "doc_id",
        F.col("n_toks").alias("n_ws_tokens"),
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
    d = tokenized_docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    toks = F.col("toks")
    n_tokens = F.col("n_toks")
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
    d = tokenized_docs(spark, sf_dir)
    # 1-row corpus count folded back via broadcast — no .count()
    # driver sync splitting the DAG (the r1 q11/q15/q22 discipline)
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    tok = d.select(
        "doc_id", "lang", F.explode(F.col("toks")).alias("token")
    )
    df_tbl = (
        tok.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("doc_freq"))
        .filter(F.col("doc_freq") >= 2)
    )
    return (
        # df_tbl is vocabulary-sized — DATA-GROWING (corpus_scaling
        # measured the broadcast→shuffle flip at 40×): size-gated
        tok.join(maybe_broadcast(df_tbl), "token")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("doc_freq").alias("doc_freq"))
        .filter(F.col("tf") >= 3)
        .crossJoin(F.broadcast(n_docs))  # bcast: fixed
        .select(
            "lang",
            "token",
            "tf",
            "doc_freq",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("doc_freq")), 4
            ).alias("tfidf"),
        )
    )


@register(
    "l4l_zipf_slope",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    freq AS (
        SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok GROUP BY lang, token
    ),
    ranked AS (
        SELECT lang, token, n,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n DESC, token) AS rnk
        FROM freq
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(REGR_SLOPE(LN(CAST(n AS DOUBLE)), LN(CAST(rnk AS DOUBLE)))
                 + 1e-9, 3) + 0.0 AS zipf_slope
    FROM ranked
    WHERE rnk <= 100
    GROUP BY lang
    """,
)
def l4l_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: Zipf rank-frequency slope per language — the log-log
    regression slope over the top-100 token ranks. Natural corpora
    sit near −1; a slope far from that flags synthetic, templated,
    or degenerate text, which makes this a corpus-level quality gate
    alongside the per-doc scores (l4d/l4h).

    Plan shape: explode → (lang, token) count → per-lang window rank
    over the SMALL vocabulary table (never the token stream) →
    5-group REGR_SLOPE. Rank ties break deterministically on token so
    both engines regress identical (x, y) point sets; the regression
    itself is sums-of-products over ≤100 points, where 3dp rounding
    absorbs association-order skew."""
    d = tokenized_docs(spark, sf_dir)
    tok = d.select("lang", F.explode(F.col("toks")).alias("token"))
    freq = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    ranked = freq.withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("lang").orderBy(F.col("n").desc(), "token")
        ),
    ).filter(F.col("rnk") <= 100)
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_terms"),
        (
            F.round(
                F.regr_slope(
                    F.log(F.col("n").cast("double")),
                    F.log(F.col("rnk").cast("double")),
                )
                + 1e-9,
                3,
            )
            + 0.0
        ).alias("zipf_slope"),
    )


@register(
    "l4m_bigram_lm",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, string_split(lower(text), ' ') AS toks,
               len(string_split(lower(text), ' ')) AS n
        FROM documents
    ),
    bg AS (
        SELECT doc_id, lang, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, lang, toks, unnest(range(1, n)) AS i FROM t)
    ),
    vocab AS (
        SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS token FROM t)
    ),
    cbg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
            FROM bg GROUP BY 1, 2),
    cug AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1),
    scored AS (
        SELECT b.doc_id, b.lang,
               LN((cbg.c + 1.0) / (cug.c + vocab.v)) AS lp
        FROM bg b
        JOIN cbg ON cbg.w1 = b.w1 AND cbg.w2 = b.w2
        JOIN cug ON cug.w1 = b.w1
        CROSS JOIN vocab
    ),
    per_doc AS (
        SELECT doc_id, lang, ROUND(AVG(lp) + 1e-9, 6) AS s
        FROM scored GROUP BY 1, 2
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(s) + 1e-9, 3) AS avg_score,
           ROUND(MIN(s) + 1e-9, 3) AS min_score,
           ROUND(MAX(s) + 1e-9, 3) AS max_score
    FROM per_doc GROUP BY 1
    """,
)
def l4m_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: bigram language-model perplexity scoring — train add-one-
    smoothed bigram probabilities on the corpus itself, score each doc by
    its mean log-probability, report the per-language distribution.
    This is the KenLM-style LM quality filter of CCNet/RefinedWeb
    pipelines, self-trained so it needs no external model file.

    Scale shape: the LM tables are TINY (vocab and vocab² rows) and
    broadcast to the scoring join, so the token stream itself is
    touched exactly twice (count pass, score pass) and shuffles only
    at doc grain. Per-doc scores round at 6dp before the language
    rollup so cross-engine libm drift (≤1 ulp per LN) cannot move the
    3dp report."""
    d = tokenized_docs(spark, sf_dir)
    t = d.select("doc_id", "lang", "toks", F.col("n_toks").alias("n"))
    bg = t.select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.col("n") - 1),
                F.slice(F.col("toks"), 2, F.col("n") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "lang", "p.w1", "p.w2")
    vocab = t.select(F.explode("toks").alias("token")).agg(
        F.countDistinct("token").alias("v")
    )
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cug = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    scored = (
        # cbg/cug are vocab²- and vocab-sized LM count tables —
        # DATA-GROWING (VERDICT r5 #1): size-gated, shuffle past bound
        bg.join(maybe_broadcast(cbg), ["w1", "w2"])
        .join(maybe_broadcast(cug), "w1")
        .crossJoin(F.broadcast(vocab))  # bcast: fixed
        .select(
            "doc_id",
            "lang",
            F.log((F.col("cb") + 1.0) / (F.col("cu") + F.col("v"))).alias(
                "lp"
            ),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.round(F.avg("lp") + 1e-9, 6).alias("s")
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("s") + 1e-9, 3).alias("avg_score"),
        F.round(F.min("s") + 1e-9, 3).alias("min_score"),
        F.round(F.max("s") + 1e-9, 3).alias("max_score"),
    )


@register(
    "l4o_bpe_merge_candidates",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    p AS (
        SELECT unnest(list_transform(range(len(w) - 1),
                                     i -> substr(w, i + 1, 2))) AS pair
        FROM tok WHERE len(w) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair ASC
    LIMIT 20
    """,
)
def l4o_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: the first BPE merge iteration — count adjacent symbol
    pairs WITHIN words across the corpus and rank the top merge
    candidates (byte-pair encoding trains by repeatedly merging the
    most frequent adjacent pair; this is that counting step at char
    grain, distinct from l4m's token-level bigram LM). Total order
    (count desc, pair asc) makes the LIMIT deterministic.

    Scale shape: explode(words) → explode(char pairs) stays map-side
    in WholeStageCodegen; the only shuffle carries the PAIR VOCABULARY
    (≤ alphabet², partial-aggregated map-side), not the corpus — the
    same partial-agg discipline every vocab-building pass at 100 TB
    needs. A full BPE trainer iterates this query, re-tokenizing
    against the grown vocab each round (driver loop, like l3g's
    Lloyd iterations)."""
    d = tokenized_docs(spark, sf_dir)
    words = d.select(F.explode(F.col("toks")).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substring(F.col("w"), i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(20)
    )


_BM25_TERMS = ("query", "join", "vector")


@register(
    "l4n_bm25_search",
    oracle="WITH "
    + BM25_IDX_CTES
    + """
    SELECT doc_id,
           CAST(SUM(w) AS BIGINT)  AS bm25_mu,
           CAST(SUM(tf) AS BIGINT) AS n_hits
    FROM w
    WHERE term IN ('query', 'join', 'vector')
    GROUP BY doc_id
    ORDER BY bm25_mu DESC, doc_id ASC
    LIMIT 20
    """,
)
def l4n_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: BM25 full-text ranking (k1=1.2, b=0.75) for a fixed 3-term
    query — REWRITTEN r10 (VERDICT r9 #2/#4) to read the session-
    cached BM25 posting index (doc_cache.bm25_index over the shared
    sparse_tf tokenize pass) instead of rebuilding tokenize->tf->
    stats privately per call. The per-(doc, term) Okapi partials are
    integer-quantized milliunits (operators/sparse.py bm25_postings),
    so the query score is an exact BIGINT sum: immune to shuffle
    order AND to the codegen-churn bimodality the private rebuild
    showed (0.40/1.06 s same-code band — the rebuild was the
    churn-sensitive stage).

    Scale shape: this IS the production per-query cost model — the
    index is built once (cached), and a query touches only the
    postings of its terms: filter -> one |query|-width partial agg ->
    top-20 via TakeOrderedAndProject. No corpus-sized work per
    query."""
    from meepo_spark.queries.doc_cache import bm25_index

    w = bm25_index(spark, sf_dir)
    return (
        w.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id")
        .agg(
            F.sum("w").cast("long").alias("bm25_mu"),
            F.sum("tf").cast("long").alias("n_hits"),
        )
        .orderBy(F.col("bm25_mu").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@register(
    "l4q_gopher_quality_gate",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               len(string_split(text, ' '))                       AS n_words,
               n_chars * 1.0 / len(string_split(text, ' '))      AS cpw,
               len(list_distinct(string_split(lower(text), ' '))) * 1.0
                   / len(string_split(text, ' '))                AS ttr,
               len(list_filter(string_split(lower(text), ' '),
                   x -> x IN ('the','of','and','to','in','a','is','for','on','with'))) * 1.0
                   / len(string_split(text, ' '))                AS sw_frac
        FROM documents
    )
    SELECT lang,
           COUNT(*)                                                            AS n_docs,
           CAST(SUM(CASE WHEN n_words NOT BETWEEN 30 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
           CAST(SUM(CASE WHEN cpw NOT BETWEEN 4.8 AND 6.0 THEN 1 ELSE 0 END)   AS BIGINT) AS fail_wordlen,
           CAST(SUM(CASE WHEN ttr < 0.35 THEN 1 ELSE 0 END)                    AS BIGINT) AS fail_ttr,
           CAST(SUM(CASE WHEN sw_frac < 0.02 THEN 1 ELSE 0 END)                AS BIGINT) AS fail_stopwords,
           CAST(SUM(CASE WHEN n_words BETWEEN 30 AND 90 AND cpw BETWEEN 4.8 AND 6.0
                          AND ttr >= 0.35 AND sw_frac >= 0.02 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           ROUND(AVG(ttr) + 1e-9, 4)                                           AS avg_ttr
    FROM t
    GROUP BY lang
    """,
)
def l4q_gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: Gopher-style rule-based quality gate — the four classic
    document filters (word-count bounds, mean-word-length band,
    type-token-ratio floor as the repetition proxy, stopword-fraction
    floor as the natural-language proxy), evaluated per doc and
    reported as a per-lang pass/fail census. Thresholds are tuned so
    every rule actually splits this fixture (149/6/99/~50 failures at
    sf0.01) — no vacuous legs.

    Scale shape: every rule is a map-side expression over one scan
    (split once, reuse via lateral column aliases); the only shuffle
    carries per-lang partial counts. All comparisons are on doubles
    derived identically from integers, so both engines agree
    bit-exactly — no rounding needed before the CASE."""
    d = tokenized_docs(spark, sf_dir)
    toks = F.col("toks")
    raw = F.split(F.col("text"), " ")
    t = d.select(
        "lang",
        F.size(raw).alias("n_words"),
        (F.col("n_chars") * 1.0 / F.size(raw)).alias("cpw"),
        (F.size(F.array_distinct(toks)) * 1.0 / F.size(raw)).alias("ttr"),
        (
            F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))) * 1.0 / F.size(raw)
        ).alias("sw_frac"),
    )
    ok_words = F.col("n_words").between(30, 90)
    ok_cpw = F.col("cpw").between(4.8, 6.0)
    ok_ttr = F.col("ttr") >= 0.35
    ok_sw = F.col("sw_frac") >= 0.02
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(~ok_words, 1).otherwise(0)).alias("fail_words"),
        F.sum(F.when(~ok_cpw, 1).otherwise(0)).alias("fail_wordlen"),
        F.sum(F.when(~ok_ttr, 1).otherwise(0)).alias("fail_ttr"),
        F.sum(F.when(~ok_sw, 1).otherwise(0)).alias("fail_stopwords"),
        F.sum(F.when(ok_words & ok_cpw & ok_ttr & ok_sw, 1).otherwise(0)).alias("n_pass"),
        F.round(F.avg("ttr") + F.lit(1e-9), 4).alias("avg_ttr"),
    )


@register(
    "l11_bigram_novelty",
    oracle="""
    WITH ref AS (
        SELECT DISTINCT t.bg
        FROM (
            SELECT unnest(list_transform(
                range(greatest(len(string_split(lower(text), ' ')) - 1, 1)),
                i -> array_to_string(string_split(lower(text), ' ')[i+1:i+2], ' '))) AS bg
            FROM documents WHERE doc_id % 5 <> 4
        ) t
    ),
    cand AS (
        SELECT doc_id, lang, bg
        FROM (
            SELECT doc_id, lang, unnest(list_transform(
                range(greatest(len(string_split(lower(text), ' ')) - 1, 1)),
                i -> array_to_string(string_split(lower(text), ' ')[i+1:i+2], ' '))) AS bg
            FROM documents WHERE doc_id % 5 = 4
        ) t
    )
    SELECT c.lang,
           COUNT(*)                                               AS n_bigrams,
           CAST(SUM(CASE WHEN r.bg IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN r.bg IS NULL THEN 1.0 ELSE 0 END) / COUNT(*) + 1e-9, 4)
               AS novelty_rate
    FROM cand c LEFT JOIN ref r ON c.bg = r.bg
    GROUP BY c.lang
    """,
)
def l11_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L11: corpus-relative novelty — the candidate batch's bigram
    out-of-vocabulary rate against the reference corpus's bigram set
    (per lang). High novelty flags genuinely new content; near-zero
    novelty flags paraphrase/recombination of what the corpus already
    holds — the cheap LM-free complement to l4m's bigram-LM scoring.

    Scale shape: the reference side reduces to its DISTINCT bigram
    vocabulary once (vocabulary-sized, reusable across batches, bloom-
    filterable); the probe is a left join keyed on the bigram. Window
    slicing is map-side; the only corpus-sized shuffle carries
    (bigram) keys."""
    d = tokenized_docs(spark, sf_dir)

    def bigrams_of(df: DataFrame):
        toks = F.col("toks")
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)))
        return df.select(
            "doc_id", "lang",
            F.explode(
                F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, 2), " "))
            ).alias("bg"),
        )

    ref = (
        bigrams_of(d.filter(F.col("doc_id") % 5 != 4))
        .select("bg").distinct().withColumn("seen", F.lit(1))
    )
    cand = bigrams_of(d.filter(F.col("doc_id") % 5 == 4))
    probed = cand.join(ref, "bg", "left")
    return probed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0)).alias("n_novel"),
        F.round(
            F.sum(F.when(F.col("seen").isNull(), 1.0).otherwise(0.0)) / F.count(F.lit(1))
            + F.lit(1e-9),
            4,
        ).alias("novelty_rate"),
    )


@register(
    "l12_tokenizer_fertility",
    oracle=r"""
    WITH t AS (
        SELECT lang,
               len(string_split(text, ' '))                                    AS n_words,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe,
               n_chars
        FROM documents
    )
    SELECT lang,
           COUNT(*)                                        AS n_docs,
           CAST(SUM(n_words) AS BIGINT)                    AS total_words,
           CAST(SUM(n_bpe) AS BIGINT)                      AS total_bpe_tokens,
           ROUND(SUM(n_bpe) * 1.0 / SUM(n_words) + 1e-9, 4) AS fertility,
           ROUND(SUM(n_chars) * 1.0 / SUM(n_bpe) + 1e-9, 4) AS chars_per_token
    FROM t
    GROUP BY lang
    """,
)
def l12_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L12: tokenizer fertility per language — BPE-ish tokens per
    whitespace word and chars per token, THE metric for judging how
    well a tokenizer serves each language in the training mix (high
    fertility = the language pays more sequence length per word, so
    its effective context and its cost per document differ). Plain
    map-side length arithmetic over one scan; the shuffle carries
    per-lang integer partials."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
        F.size(bpe_tokens(F.col("text"))).alias("n_bpe"),
        "n_chars",
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.round(F.sum("n_bpe") * 1.0 / F.sum("n_words") + F.lit(1e-9), 4).alias("fertility"),
        F.round(F.sum("n_chars") * 1.0 / F.sum("n_bpe") + F.lit(1e-9), 4).alias("chars_per_token"),
    )


@register(
    "l20_classifier_filter",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        FROM documents
    ),
    scored AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(COALESCE(list_sum(list_transform(toks, x ->
                   CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
                       % 2001 - 1000)), 0) AS BIGINT) AS score_sum
        FROM t
    )
    SELECT doc_id, n_tokens, score_sum, score_sum > 0 AS keep
    FROM scored
    """,
)
def l20_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L20: model-based quality filtering — a hashed bag-of-words
    linear classifier (the fastText-style shape used for production
    quality/domain filters) scored entirely JVM-side. Each token maps
    to a fixed weight derived from its md5 digest (integer in
    [-1000, 1000], i.e. millis of a [-1, 1] weight); the document
    score is the exact integer sum, and keep = score > 0.

    The weight table is deterministic hashing rather than learned
    floats so (a) the DuckDB oracle reproduces every weight exactly
    and (b) the sum is integer arithmetic — no accumulation-order
    drift between engines. Swapping in a real trained model changes
    only the token->weight expression (a broadcast map lookup), not
    the plan.

    Scale shape: filter -> transform -> aggregate are all
    higher-order array functions on the scan — a pure narrow map
    with NO shuffle and NO Python. Classifier scoring over 100 TB is
    embarrassingly parallel and this plan keeps it that way."""
    toks = F.filter(F.col("toks"), lambda t: t != F.lit(""))
    wts = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        % 2001
        - 1000,
    )
    score = F.coalesce(
        F.aggregate(wts, F.lit(0).cast("long"), lambda a, x: a + x),
        F.lit(0).cast("long"),
    )
    d = tokenized_docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        score.alias("score_sum"),
        (score > 0).alias("keep"),
    )


@register(
    "l21_classifier_auc",
    oracle="""
    WITH t AS (
        SELECT source,
               COALESCE(list_sum(list_transform(
                   list_filter(string_split(lower(text), ' '), x -> x <> ''),
                   x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
                        % 2001 - 1000)), 0) AS score,
               lang = 'en' AS pos
        FROM documents
    ),
    g AS (SELECT source, score, COUNT(*) AS cnt,
                 SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS p
          FROM t GROUP BY 1, 2),
    c AS (SELECT source, score, cnt, p,
                 COALESCE(SUM(cnt) OVER (
                     PARTITION BY source ORDER BY score
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cb
          FROM g)
    SELECT source,
           CAST(SUM(p) AS BIGINT) AS n_pos,
           CAST(SUM(cnt) - SUM(p) AS BIGINT) AS n_neg,
           ROUND((SUM(p * (2 * cb + cnt + 1)) - SUM(p) * (SUM(p) + 1))
                 / (2.0 * SUM(p) * (SUM(cnt) - SUM(p))), 6) AS auc_r
    FROM c GROUP BY source
    HAVING SUM(p) > 0 AND SUM(cnt) - SUM(p) > 0
    ORDER BY source
    """,
)
def l21_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L21: distributed AUC-ROC of the l20 hashed classifier against
    the lang=='en' label, per source — the Mann-Whitney U formulation
    with exact tie handling: AUC = (R+ - P(P+1)/2) / (P*N) where R+ is
    the sum of AVERAGE ranks of positives. Doubling the rank identity
    (2*rank_avg = 2*cum_before + cnt + 1) keeps the numerator in
    exact integer arithmetic until the single final division, so both
    engines agree bit-for-bit before the 6dp round.

    Scale shape — ranking is the trap: a global
    `ROW_NUMBER() OVER (ORDER BY score)` collapses 100 TB into one
    task. The plan instead composes the o7 parallel-enumeration
    discipline with pre-grouping: reduce docs to one row per
    (source, score) — the only pass over the corpus — then
    per-(source, score-bucket) prefix sums with broadcast bucket
    offsets give every tied score group its global cumulative count
    without any single-partition sort. r4: the per-source window the
    r3 version kept ("small enough") measured ~2 rows per DOC at
    sf0.1 in the runtime waiver audit — scores are near-unique, so
    per-source frames grow linearly with the corpus; the rank-before
    count now comes from `bucketed_prefix_sum` over 1024-wide score
    bands (frame_end=-1 = the Mann-Whitney cum-BEFORE shape), bounded
    per window partition by construction."""
    from meepo_spark.operators.enumeration import bucketed_prefix_sum

    toks = F.filter(F.col("toks"), lambda t: t != F.lit(""))
    wts = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        % 2001
        - 1000,
    )
    score = F.coalesce(
        F.aggregate(wts, F.lit(0).cast("long"), lambda a, x: a + x),
        F.lit(0).cast("long"),
    )
    d = tokenized_docs(spark, sf_dir).select(
        "source",
        score.alias("score"),
        (F.col("lang") == "en").cast("long").alias("pos"),
    )
    g = d.groupBy("source", "score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("p")
    )
    c = bucketed_prefix_sum(
        g,
        bucket=F.floor(F.col("score") / 1024),
        order_cols=[F.col("score").asc()],
        vals={"cb": "cnt"},
        part_cols=["source"],
        frame_end=-1,
    ).select("source", "cnt", "p", "cb")
    agg = c.groupBy("source").agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        (F.sum("cnt") - F.sum("p")).cast("bigint").alias("n_neg"),
        F.sum(F.col("p") * (2 * F.col("cb") + F.col("cnt") + 1)).alias("r2"),
    )
    return (
        agg.where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            "source",
            "n_pos",
            "n_neg",
            F.round(
                (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1))
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                6,
            ).alias("auc_r"),
        )
        .orderBy("source")
    )


@register(
    "l30_calibration_bins",
    oracle="""
    WITH t AS (
        SELECT lang = 'en' AS pos,
               COALESCE(list_sum(list_transform(
                   list_filter(string_split(lower(text), ' '), x -> x <> ''),
                   x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
                        % 2001 - 1000)), 0) AS score
        FROM documents
    )
    SELECT CAST(LEAST(GREATEST(FLOOR(score / 2000.0), -5), 5) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           ROUND(SUM(CASE WHEN pos THEN 1 ELSE 0 END) * 1.0 / COUNT(*) + 1e-9, 4)
               + 0.0 AS observed_rate
    FROM t GROUP BY 1
    """,
)
def l30_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L30: classifier calibration (reliability) bins — the companion
    eval to l21's AUC: does a higher hashed-classifier score actually
    mean a higher P(lang=en)? Scores bucket into 11 clamped
    2000-wide bins; each bin reports its observed positive rate. A
    well-calibrated filter shows monotone rates; a miscalibrated one
    tells you the quality threshold (l16/l20's cut) sits on a cliff.

    Map-side projection + one 11-group aggregate — the cheapest
    possible eval pass; the one float is a ratio of two exact
    integers. FLOOR of a negative quotient is true floor division on
    both engines (the dq6 double-floor discipline: floor in DOUBLE
    then cast)."""
    toks = F.filter(F.col("toks"), lambda t: t != F.lit(""))
    wts = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        % 2001
        - 1000,
    )
    score = F.coalesce(
        F.aggregate(wts, F.lit(0).cast("long"), lambda a, x: a + x),
        F.lit(0).cast("long"),
    )
    d = tokenized_docs(spark, sf_dir).select(
        (F.col("lang") == "en").cast("long").alias("pos"), score.alias("score")
    )
    bin_ = F.least(
        F.greatest(F.floor(F.col("score") / 2000.0), F.lit(-5)), F.lit(5)
    ).cast("long")
    return d.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").alias("n_pos"),
        (
            F.round(F.sum("pos") * 1.0 / F.count(F.lit(1)) + 1e-9, 4) + 0.0
        ).alias("observed_rate"),
    )


@register(
    "l36_duplicate_ngram_fraction",
    oracle="""
    WITH tg AS (
        SELECT doc_id, lang, n_chars,
               unnest(list_transform(
                   range(greatest(len(string_split(lower(text), ' ')) - 2, 1)),
                   i -> array_to_string(string_split(lower(text), ' ')[i+1:i+3], ' '))) AS g
        FROM documents
    ),
    cnt AS (
        SELECT doc_id, lang, n_chars, g, CAST(COUNT(*) AS BIGINT) AS c
        FROM tg GROUP BY doc_id, lang, n_chars, g
    ),
    per_doc AS (
        SELECT doc_id, lang,
               ROUND((SUM(c) - COUNT(*)) * 1.0 / SUM(c) + 1e-9, 6) AS dup_frac,
               ROUND(MIN({'nc': -c, 'g': g}).nc * -1.0 * LENGTH(MIN({'nc': -c, 'g': g}).g)
                     / MAX(n_chars) + 1e-9, 6) AS top_frac
        FROM cnt GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(dup_frac) + 1e-9, 4) + 0.0 AS avg_dup_trigram_frac,
           ROUND(AVG(top_frac) + 1e-9, 4) + 0.0 AS avg_top_trigram_frac,
           CAST(SUM(CASE WHEN dup_frac > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repetitive
    FROM per_doc GROUP BY lang
    """,
)
def l36_duplicate_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L36: the Gopher/MassiveText duplicate-n-gram repetition
    signals (Rae et al. 2021 §A1.1): per doc, the fraction of trigram
    OCCURRENCES that are repeats (1 − distinct/total) and the
    character mass of the single most frequent trigram — the two
    screens that catch looping generations and boilerplate that
    l4h's unigram TTR misses (a doc can have high unigram diversity
    while looping a 3-token phrase). Tie on the top trigram breaks
    lexicographically via a (−count, gram) struct-min on both
    engines.

    Per-doc fractions are exact integer ratios rounded at 6dp; the
    per-lang report rounds the averages at 4dp (the l4m two-level
    discipline). One explode off the shared tokenized frame, one
    (doc, gram) partial-aggregated count, one doc rollup."""
    d = tokenized_docs(spark, sf_dir)
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0)))
    tg = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.explode(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, 3), " "))
        ).alias("g"),
    )
    cnt = tg.groupBy("doc_id", "lang", "n_chars", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    top = F.min(F.struct((-F.col("c")).alias("nc"), F.col("g")))
    per_doc = cnt.groupBy("doc_id", "lang").agg(
        F.round(
            (F.sum("c") - F.count(F.lit(1))) * 1.0 / F.sum("c") + 1e-9, 6
        ).alias("dup_frac"),
        F.round(
            top["nc"] * -1.0 * F.length(top["g"]) / F.max("n_chars") + 1e-9, 6
        ).alias("top_frac"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.round(F.avg("dup_frac") + 1e-9, 4) + 0.0).alias("avg_dup_trigram_frac"),
        (F.round(F.avg("top_frac") + 1e-9, 4) + 0.0).alias("avg_top_trigram_frac"),
        F.sum(F.when(F.col("dup_frac") > 0.2, 1).otherwise(0)).alias("n_repetitive"),
    )


# --- l46: full BPE training loop (VERDICT r5 next-round #2) ---

_BPE_K = 8  # merge rounds: enough to exercise re-segmentation feedback
# (later rounds merge SYMBOLS CREATED by earlier rounds), small enough
# for the DuckDB oracle to unroll exactly. Real trainings run 30-50k
# rounds of the SAME per-round plan — per-round cost is k-invariant.

_BPE_MERGE_LAMBDA = """(acc, el) -> CASE
                           WHEN acc[-1] = b.l AND el[1] = b.r
                           THEN list_concat(acc[1:len(acc)-1], [acc[-1] || el[1]])
                           ELSE list_concat(acc, el) END"""


def _bpe_train_ctes(k: int) -> str:
    """The shared training-unroll CTE chain (the l3g Lloyd-unroll
    discipline: a FIXED iteration budget turns an iterative algorithm
    into a flat SQL expression the oracle gate can hash-compare): w0
    word counts, s0 char segmentation, then per round i a pair count
    p{i}, the tie-broken argmax b{i}, and (before the last round) the
    re-segmented s{i+1}. Used by both l46 (emits the b* rows) and l47
    (applies the b* chain to per-lang words)."""
    parts = [
        """
    WITH w0 AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY word
    ),
    s0 AS (
        SELECT list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms,
               wc
        FROM w0
    )"""
    ]
    for i in range(k):
        parts.append(f""",
    p{i} AS (
        SELECT el.l AS l, el.r AS r, CAST(SUM(wc) AS BIGINT) AS cnt
        FROM (SELECT unnest(list_transform(range(1, len(syms)),
                                i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS el,
                     wc
              FROM s{i} WHERE len(syms) >= 2)
        GROUP BY 1, 2
    ),
    b{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1)""")
        if i < k - 1:
            parts.append(f""",
    s{i + 1} AS (
        SELECT list_reduce(list_transform(syms, c -> [c]),
                           {_BPE_MERGE_LAMBDA}) AS syms, wc
        FROM s{i} CROSS JOIN b{i} b
    )""")
    return "".join(parts)


def _bpe_oracle_sql(k: int) -> str:
    """l46's oracle: the training unroll, emitting the merge table."""
    selects = [
        f"SELECT CAST({i + 1} AS BIGINT) AS step, l AS left_sym,"
        f" r AS right_sym, cnt AS pair_count FROM b{i}"
        for i in range(k)
    ]
    return (
        _bpe_train_ctes(k)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY step"
    )


def _bpe_fertility_oracle_sql(k: int) -> str:
    """l47's oracle: train (shared CTE chain), then APPLY the k merges
    in order to the per-(lang, word) count table and report per-lang
    fertility — the a{i} chain replays each b{i} with the exact greedy
    fold training used."""
    parts = [
        _bpe_train_ctes(k),
        """,
    a0 AS (
        SELECT lang, LENGTH(word) AS wlen,
               list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms,
               CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY lang, word
    )""",
    ]
    for i in range(k):
        # LEFT JOIN ON TRUE, not CROSS JOIN: if the pair space drains
        # before round i, b{i} is EMPTY and a cross join would empty
        # every later a{} (zero output rows) while the engine's
        # bpe_apply just applies the truncated merge table; with the
        # left join b.l/b.r are NULL, the merge condition is NULL, and
        # the fold degrades to the identity — exactly the engine's
        # semantics (code-review r6 #4)
        parts.append(f""",
    a{i + 1} AS (
        SELECT lang, wlen,
               list_reduce(list_transform(syms, c -> [c]),
                           {_BPE_MERGE_LAMBDA}) AS syms, wc
        FROM a{i} LEFT JOIN b{i} b ON TRUE
    )""")
    parts.append(f"""
    SELECT lang,
           CAST(SUM(wc) AS BIGINT)                AS n_words,
           CAST(SUM(len(syms) * wc) AS BIGINT)    AS n_bpe_tokens,
           ROUND(SUM(len(syms) * wc)::DOUBLE / SUM(wc) + 1e-9, 4)
                                                  AS fertility,
           ROUND(SUM(wlen * wc)::DOUBLE / SUM(len(syms) * wc) + 1e-9, 4)
                                                  AS chars_per_token
    FROM a{k} GROUP BY lang""")
    return "".join(parts)


def _bpe_kernel_census_oracle_sql(k: int) -> str:
    """l62's oracle: the same training unroll + apply chain l47 uses
    (word grain instead of (lang, word)), ending in a merged-token
    vocabulary census — the oracle is path-blind, so hash-matching it
    through the Arrow KERNEL application path proves kernel ≡ fold
    cross-engine, not just property-pinned."""
    parts = [
        _bpe_train_ctes(k),
        """,
    a0 AS (
        SELECT list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms,
               CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY word
    )""",
    ]
    for i in range(k):
        parts.append(f""",
    a{i + 1} AS (
        SELECT list_reduce(list_transform(syms, c -> [c]),
                           {_BPE_MERGE_LAMBDA}) AS syms, wc
        FROM a{i} LEFT JOIN b{i} b ON TRUE
    )""")
    parts.append(f"""
    SELECT sym AS token,
           CAST(LENGTH(sym) AS BIGINT) AS token_len,
           CAST(SUM(wc) AS BIGINT) AS n_occurrences
    FROM (SELECT unnest(syms) AS sym, wc FROM a{k})
    WHERE LENGTH(sym) >= 2
    GROUP BY sym
    ORDER BY n_occurrences DESC, token
    LIMIT 25""")
    return "".join(parts)


_MERGE_TABLE_CACHE = SessionFrameCache(max_per_app=3)
_WORD_COUNTS_CACHE = SessionFrameCache(max_per_app=3)


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, wc): the corpus word-count vocabulary frame
    (optimization r10) — the BPE family's shared input: merge-table
    training, l62's kernel application, and l66's compression curve
    each re-ran the identical tokenize+explode+agg pass; one
    session-cached build now serves them all."""

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        from meepo_spark.catalog import spread

        d = table(spark, sf_dir, "documents")
        return spread(
            # spread BEFORE persisting (optimization r10 wave 3): the
            # tiny aggregate otherwise materializes AQE-coalesced to
            # ONE cached partition, which serializes every downstream
            # Arrow kernel (l62's tokenizer replay, l66's curve) on a
            # single Python worker — the l48 lesson applied to the
            # cached frame. At a real 30-50k vocabulary the kernel
            # wants this parallelism anyway.
            d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("wc"))
        )

    return _WORD_COUNTS_CACHE.get(spark, sf_dir, build)


def _trained_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The l46-trained merge table, session-cached: l46, l47, and
    repeated bench/selfcheck executions share ONE training run per
    (app, sf_dir) instead of re-running the k checkpointed rounds each
    time — the _verified_pairs/tokenized_docs discipline applied to
    the trained artifact (it IS an artifact: a production pipeline
    trains once and ships the table)."""
    from meepo_spark.operators.bpe import bpe_merge_table

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        return bpe_merge_table(_word_counts(spark, sf_dir), _BPE_K)

    return _MERGE_TABLE_CACHE.get(spark, sf_dir, build)


@register("l46_bpe_training", oracle=_bpe_oracle_sql(_BPE_K))
def l46_bpe_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L46: the FULL BPE tokenizer-training loop — k rounds of
    count → argmax → greedy re-segment over the corpus word-count
    table, returning the ordered merge table (the artifact a tokenizer
    ships). Closes VERDICT r5 "what's wrong" #2: l4o graded one
    counting step; this grades the iterated loop where later rounds
    merge symbols EARLIER rounds created, so any drift in merge
    application order compounds and the hash gate catches it.

    Scale shape (see operators/bpe.py): the corpus collapses to the
    vocabulary-sized word-count frame before round 0 and is never
    rescanned; each round is one map-side-combined pair-count shuffle
    + a 1-row struct-min argmax + a broadcast re-segment fold, with
    localCheckpoint cutting lineage per round (the operators/graph.py
    CC discipline). Ties break on (count DESC, left, right) — a total
    order, so the table is deterministic cross-engine. Integer counts
    and string symbols only: hash-exact, no float discipline needed."""
    mt = _trained_merge_table(spark, sf_dir)
    return mt.select(
        "step",
        F.col("left").alias("left_sym"),
        F.col("right").alias("right_sym"),
        "pair_count",
    ).orderBy("step")


@register("l47_bpe_fertility", oracle=_bpe_fertility_oracle_sql(_BPE_K))
def l47_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L47: tokenizer APPLICATION + fertility measurement — the other
    half of the BPE story (l46 trains, this segments): the trained
    merge table replays in order over the per-(lang, word) count table
    and each language reports fertility (BPE tokens per whitespace
    word) and chars-per-token, THE numbers that decide whether a
    tokenizer underserves a language (l40's OOV complement, measured
    post-merge instead of by vocab membership).

    Scale shape: training reuses operators/bpe (word-count grain);
    application compiles the k-row trained artifact into chained
    JVM-side folds (operators/bpe.bpe_apply — bounded driver collect
    of the merge table, the quantizer-seed class) over the
    (lang, word) vocabulary frame: one map-side projection, no
    shuffle, corpus never rescanned. Fertility sums are exact
    integers; the two divisions round at 4dp."""
    from meepo_spark.operators.bpe import bpe_apply

    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    wl = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("wc"))
    seg = bpe_apply(wl, _trained_merge_table(spark, sf_dir))
    n_tok = F.sum(F.size("syms") * F.col("wc"))
    return seg.groupBy("lang").agg(
        F.sum("wc").cast("long").alias("n_words"),
        n_tok.cast("long").alias("n_bpe_tokens"),
        F.round(n_tok.cast("double") / F.sum("wc") + 1e-9, 4).alias("fertility"),
        F.round(
            F.sum(F.length("word") * F.col("wc")).cast("double") / n_tok + 1e-9, 4
        ).alias("chars_per_token"),
    )


@register("l62_bpe_kernel_census", oracle=_bpe_kernel_census_oracle_sql(_BPE_K))
def l62_bpe_kernel_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L62: the Arrow-batched KERNEL application path graded through
    the oracle gate (VERDICT r7 next-round #1). Every other BPE query
    takes the k≤64 chained-fold JVM path; this one passes
    ``compile_threshold=0`` so the SAME trained table is applied by
    ``_bpe_apply_kernel`` (operators/bpe.py) — the path a production
    30-50k-merge vocabulary takes, where a fold chain would compile a
    k-deep expression tree (SCALE.md §18). The output is the merged-
    token vocabulary census (top 25 multi-char tokens by weighted
    occurrence — the artifact you'd eyeball to sanity-check a trained
    tokenizer), and the DuckDB oracle replays training + application
    with the path-blind unrolled fold — so a hash match proves the
    kernel's greedy-left substring-indexed replay is value-identical
    to the fold semantics ON THE GRADED CORPUS, closing the gap where
    the production path was only property-pinned on random small-k
    corpora.

    Scale shape: application is one ArrowEvalPython projection over
    the word-count vocabulary frame (corpus never rescanned; plan size
    O(1) in table size); the census is one explode + hash aggregate,
    top-25 by a total (count DESC, token) order so LIMIT is
    deterministic. length(token) >= 2 keeps only symbols CREATED by
    merges, so the census is empty unless kernel merges actually
    fired."""
    from meepo_spark.operators.bpe import bpe_apply

    seg = bpe_apply(
        _word_counts(spark, sf_dir),
        _trained_merge_table(spark, sf_dir),
        compile_threshold=0,
    )
    tok = seg.select(F.explode("syms").alias("token"), "wc")
    return (
        tok.filter(F.length("token") >= 2)
        .groupBy("token")
        .agg(F.sum("wc").cast("long").alias("n_occurrences"))
        .select(
            "token",
            F.length("token").cast("long").alias("token_len"),
            "n_occurrences",
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(25)
    )


from meepo_spark.operators.fingerprint import (
    explode_fps,
    winnow_ctes,
    with_fingerprints,
)

# winnow params: single source in doc_cache (t = k + w - 1 = 8)
from meepo_spark.queries.doc_cache import FP_K as _FP_K, FP_W as _FP_W


@register(
    "l53_winnow_fingerprints",
    oracle=f"""
    WITH {winnow_ctes(_FP_K, _FP_W)},
    per AS (
        SELECT lang,
               COUNT(*)                        AS n_docs,
               CAST(SUM(len(fps)) AS BIGINT)   AS n_fps,
               CAST(SUM(n_grams) AS BIGINT)    AS n_grams
        FROM tf GROUP BY lang
    ),
    dst AS (
        SELECT lang, COUNT(DISTINCT fp) AS n_distinct_fps
        FROM (SELECT lang, unnest(fps) AS fp FROM tf)
        GROUP BY lang
    )
    SELECT p.lang, p.n_docs, p.n_fps,
           CAST(d.n_distinct_fps AS BIGINT) AS n_distinct_fps,
           ROUND(p.n_fps::DOUBLE / GREATEST(p.n_grams, 1) + 1e-9, 6)
               AS fp_density
    FROM per p JOIN dst d USING (lang)
    """,
)
def l53_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 document fingerprinting, the rolling-hash variant the survey
    names: Karp-Rabin polynomial hashes of every 5-token gram, winnowed
    (MOSS, SIGMOD'03) to the distinct 4-window minima — the fingerprint
    set any shared run of >= 8 tokens must intersect. Per language:
    document count, total and distinct fingerprints, and the measured
    fingerprint density, which winnowing theory pins near
    2/(w+1) = 0.4 fingerprints per gram (the census VALIDATES the
    operator, not just times it).

    Scale shape: fingerprinting is a per-row projection fused into the
    scan (operators/fingerprint — md5-parity token codes keep the
    DuckDB oracle bit-identical); the census shuffles once per
    aggregate on (lang) / (lang, fp). No Python boundary, no
    all-pairs stage. fp_density is one division of two exact integers
    per lang — bit-stable, rounded at 6dp."""
    d = tokenized_docs(spark, sf_dir)
    f = with_fingerprints(
        d.select("doc_id", "lang", "toks"), "toks", _FP_K, _FP_W
    ).select(
        "doc_id",
        "lang",
        F.greatest(F.size("toks") - (_FP_K - 1), F.lit(0)).alias("n_grams"),
        "fps",
    )
    per = f.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("fps")).alias("n_fps"),
        F.sum("n_grams").alias("n_grams"),
    )
    dst = (
        explode_fps(f.select("lang", "fps"))
        .groupBy("lang")
        .agg(F.count_distinct("fp").alias("n_distinct_fps"))
    )
    return per.join(F.broadcast(dst), "lang").select(  # bcast: fixed (per-lang rows)
        "lang",
        "n_docs",
        "n_fps",
        "n_distinct_fps",
        F.round(
            F.col("n_fps").cast("double") / F.greatest("n_grams", F.lit(1)) + 1e-9, 6
        ).alias("fp_density"),
    )


@register(
    "l54_fingerprint_overlap",
    oracle=f"""
    WITH {winnow_ctes(_FP_K, _FP_W)},
    e AS (SELECT doc_id, lang, unnest(fps) AS fp FROM tf),
    ok AS (SELECT fp FROM e GROUP BY fp HAVING COUNT(*) <= 20),
    ee AS (SELECT e.* FROM e JOIN ok USING (fp)),
    p AS (
        SELECT a.doc_id AS id_a, a.lang AS lang_a,
               b.doc_id AS id_b, b.lang AS lang_b,
               COUNT(*) AS shared
        FROM ee a JOIN ee b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )
    SELECT lang_a, lang_b,
           COUNT(*)                      AS n_pairs,
           CAST(MAX(shared) AS BIGINT)   AS max_shared,
           CAST(SUM(shared) AS BIGINT)   AS total_shared
    FROM p WHERE shared >= 3
    GROUP BY lang_a, lang_b
    """,
)
def l54_fingerprint_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L4: fingerprint-overlap candidate pairs — the MOSS candidate
    generator over l53's winnowed sets. Explode (doc_id, fp), drop
    stop-fingerprints (document frequency > 20 — boilerplate that
    would create quadratic hot buckets, the stopword cut of
    fingerprint indexing), equi-join on the 8-byte fp (the inverted
    index — never all-pairs), and keep pairs sharing >= 3
    fingerprints. Census per language pair keeps the graded output
    bounded while the engine still materializes the full pair frame.

    Scale shape: ONE shuffle keyed on fp (longs, not text) builds
    each fingerprint's posting list, the df<=20 stop-fp cut drops
    hot buckets, and pairs expand MAP-SIDE inside each surviving
    bucket (<= C(20,2) = 190 per fp, a pure array expression — the
    exploded frame is computed once, no self-join); one more
    aggregate on (id_a, id_b) counts shared fps. The first cut of
    this operator self-joined two re-derived branches — the executed
    plan computed the fingerprint subtree TWICE (no exchange reuse
    under either BHJ or forced SMJ, measured); the bucketed
    expansion in operators/fingerprint.candidate_pairs is both the
    honest plan and the cheaper one."""
    from meepo_spark.queries.doc_cache import winnow_pairs

    pairs = winnow_pairs(spark, sf_dir)
    return pairs.groupBy("lang_a", "lang_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.max("shared").alias("max_shared"),
        F.sum("shared").alias("total_shared"),
    )


@register(
    "l57_winnow_dedup_survivors",
    oracle=f"""
    WITH {winnow_ctes(_FP_K, _FP_W)},
    e AS (SELECT doc_id, unnest(fps) AS fp FROM tf),
    ok AS (SELECT fp FROM e GROUP BY fp HAVING COUNT(*) <= 20),
    ee AS (SELECT e.* FROM e JOIN ok USING (fp)),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
        FROM ee a JOIN ee b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    dropped AS (SELECT DISTINCT id_b FROM p WHERE shared >= 3)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN doc_id NOT IN (SELECT id_b FROM dropped)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
           CAST(SUM(CASE WHEN doc_id IN (SELECT id_b FROM dropped)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
    FROM documents
    GROUP BY lang
    """,
)
def l57_winnow_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2/L4: the dedup pass the winnowing index exists for — drop
    every document that shares >= 3 fingerprints with a LOWER doc_id
    (greedy min-id survivor, the l2b convention), per-lang census.
    Completes the MOSS pipeline: l53 builds the fingerprint sets, l54
    generates candidate pairs on the inverted index, this query
    resolves them into a deduplicated corpus — the same
    detect-then-resolve split the MinHash family uses (l2 -> l2b),
    with fingerprints instead of signatures doing the blocking.

    Scale shape: candidate generation is the shared
    operators/fingerprint.candidate_pairs (stop-fp cut keeps the fp
    join linear in dup structure, SCALE.md §19); the resolution is
    ONE anti-join of the corpus against the distinct dropped-id set.
    All-integer output."""
    from meepo_spark.queries.doc_cache import winnow_pairs

    d = tokenized_docs(spark, sf_dir)
    dropped = (
        winnow_pairs(spark, sf_dir)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    docs = d.select("doc_id", "lang")
    flagged = docs.join(dropped, "doc_id", "left_semi").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_removed")
    )
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(F.broadcast(flagged), "lang", "left")  # bcast: fixed (per-lang rows)
        .select(
            "lang",
            "n_docs",
            (F.col("n_docs") - F.coalesce("n_removed", F.lit(0))).alias(
                "n_survivors"
            ),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )


# --- l65: Kneser-Ney bigram LM (round 8) -------------------------------

_KN_D = 0.75  # absolute discount; exactly representable in binary

_KN_ORACLE = """
    WITH t AS (
        SELECT doc_id, lang, string_split(lower(text), ' ') AS toks,
               len(string_split(lower(text), ' ')) AS n
        FROM documents
    ),
    bg AS (
        SELECT doc_id, lang, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, lang, toks, unnest(range(1, n)) AS i FROM t)
    ),
    cbg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
            FROM bg GROUP BY 1, 2),
    ctx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS ct,
                   CAST(COUNT(*) AS BIGINT) AS nf
            FROM cbg GROUP BY 1),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nb FROM cbg GROUP BY 1),
    btot AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM cbg),
    model AS (
        SELECT cbg.w1, cbg.w2,
               (GREATEST(CAST(cbg.c AS DOUBLE) - CAST(0.75 AS DOUBLE),
                         CAST(0 AS DOUBLE)) / CAST(ctx.ct AS DOUBLE))
               + ((CAST(0.75 AS DOUBLE) * CAST(ctx.nf AS DOUBLE)
                   / CAST(ctx.ct AS DOUBLE))
                  * (CAST(cont.nb AS DOUBLE) / CAST(btot.b AS DOUBLE))) AS p
        FROM cbg
        JOIN ctx ON ctx.w1 = cbg.w1
        JOIN cont ON cont.w2 = cbg.w2
        CROSS JOIN btot
    ),
    scored AS (
        SELECT b.lang, LN(m.p) AS lp
        FROM bg b JOIN model m ON m.w1 = b.w1 AND m.w2 = b.w2
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(-AVG(lp) + 1e-9, 4) + 0.0 AS cross_entropy
    FROM scored GROUP BY lang
"""


@register("l65_kneser_ney_lm", oracle=_KN_ORACLE)
def l65_kneser_ney_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L65: interpolated Kneser-Ney bigram LM — the smoothing that
    actually ships in LM-based quality filters (KenLM's default),
    where l4m's add-one baseline systematically over-penalizes rare
    continuations: absolute discount D=0.75 off every bigram count,
    mass redistributed through the CONTINUATION probability (how many
    distinct contexts precede w2), not the raw unigram. Trained on
    the corpus token stream and scored in-sample per occurrence; the
    census is per-language cross-entropy — the number a CCNet-style
    filter thresholds.

    Cross-engine: all model inputs are exact integer counts; D=0.75
    is exactly representable in binary, and both engines evaluate the
    identical (discount/ctx) + (backoff_weight * continuation) chain
    with explicit DOUBLE casts (the v26 decimal-literal discipline),
    so per-bigram probabilities are bit-comparable and only the
    per-lang AVG carries summation-order noise (absorbed at 4dp).

    Scale shape: the model tables are vocabulary-sized (bigram/
    context/continuation counts — map-side-combined aggregates), the
    scoring join is broadcast-able at real scales, and the token
    stream is touched exactly twice (count, score) — the l4m plan
    with one extra tiny aggregate for the continuation counts."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    t = d.select("lang", toks.alias("toks"))
    idx = F.sequence(F.lit(1), F.size("toks") - 1)
    bg = t.filter(F.size("toks") >= 2).select(
        "lang",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("toks", i).alias("w1"),
                    F.element_at("toks", i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    cbg = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    ctx = cbg.groupBy("w1").agg(
        F.sum("c").cast("long").alias("ct"), F.count(F.lit(1)).alias("nf")
    )
    cont = cbg.groupBy("w2").agg(F.count(F.lit(1)).alias("nb"))
    btot = cbg.agg(F.count(F.lit(1)).alias("b"))
    p = (
        F.greatest(F.col("c").cast("double") - F.lit(0.75), F.lit(0.0))
        / F.col("ct").cast("double")
    ) + (
        (F.lit(0.75) * F.col("nf").cast("double") / F.col("ct").cast("double"))
        * (F.col("nb").cast("double") / F.col("b").cast("double"))
    )
    model = (
        cbg.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(btot))  # bcast: fixed (1-row bigram total)
        .select("w1", "w2", p.alias("p"))
    )
    scored = bg.join(model, ["w1", "w2"]).select("lang", F.log("p").alias("lp"))
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.round(-F.avg("lp") + 1e-9, 4) + 0.0).alias("cross_entropy"),
    )


# --- l66: BPE compression curve over merge-table prefixes (round 8) ----

_CURVE_PREFIXES = [0, 2, 4, 8]  # 0 = character baseline; 8 = _BPE_K


def _bpe_curve_oracle_sql(k: int, prefixes: list[int]) -> str:
    """One training unroll + ONE word-grain apply chain a0..a{k}; the
    curve reads each requested prefix row off the shared chain (a
    prefix-p application IS the chain state after p merges)."""
    parts = [
        _bpe_train_ctes(k),
        """,
    a0 AS (
        SELECT LENGTH(word) AS wlen,
               list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms,
               CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY word
    )""",
    ]
    for i in range(k):
        parts.append(f""",
    a{i + 1} AS (
        SELECT wlen,
               list_reduce(list_transform(syms, c -> [c]),
                           {_BPE_MERGE_LAMBDA}) AS syms, wc
        FROM a{i} LEFT JOIN b{i} b ON TRUE
    )""")
    selects = [
        f"""
    SELECT CAST({p} AS BIGINT) AS k_merges,
           CAST(SUM(wc) AS BIGINT) AS n_words,
           CAST(SUM(len(syms) * wc) AS BIGINT) AS n_tokens,
           ROUND(SUM(len(syms) * wc)::DOUBLE / SUM(wc) + 1e-9, 4)
               AS fertility,
           ROUND(SUM(wlen * wc)::DOUBLE / SUM(len(syms) * wc) + 1e-9, 4)
               AS chars_per_token
    FROM a{p}"""
        for p in prefixes
    ]
    return "".join(parts) + "\n    UNION ALL ".join(selects)


@register(
    "l66_bpe_compression_curve",
    oracle=_bpe_curve_oracle_sql(_BPE_K, _CURVE_PREFIXES),
)
def l66_bpe_compression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L66: the tokenizer compression CURVE — corpus token count and
    fertility after applying each PREFIX of the trained merge table
    (0 = character baseline, then 2/4/8 merges). THE plot a tokenizer
    training run watches to pick its vocabulary size: marginal
    compression per merge decays, and the curve is monotone
    non-increasing in tokens by construction (each merge can only
    shrink segmentations) — a property the hash gate now pins at four
    points rather than trusting. Completes the BPE family: l46 trains,
    l47/l62 apply one table, this grades the APPLICATION AS A FUNCTION
    OF TABLE LENGTH (prefix-closure is what makes BPE vocabularies
    streamable artifacts: ship 32k merges, clients can run any
    prefix).

    Scale shape: training is the shared session-cached artifact; each
    prefix application is a chained JVM fold over the word-count
    vocabulary frame (corpus never rescanned), and the oracle reads
    all prefixes off ONE shared apply chain. Integer token sums;
    two 4dp ratio roundings."""
    from meepo_spark.operators.bpe import bpe_apply

    wl = _word_counts(spark, sf_dir)
    merges = _trained_merge_table(spark, sf_dir)
    outs = []
    for p in _CURVE_PREFIXES:
        seg = bpe_apply(wl, merges.filter(F.col("step") <= p))
        n_tok = F.sum(F.size("syms") * F.col("wc"))
        outs.append(
            seg.agg(
                F.lit(p).cast("long").alias("k_merges"),
                F.sum("wc").cast("long").alias("n_words"),
                n_tok.cast("long").alias("n_tokens"),
                F.round(n_tok.cast("double") / F.sum("wc") + 1e-9, 4).alias(
                    "fertility"
                ),
                F.round(
                    F.sum(F.length("word") * F.col("wc")).cast("double")
                    / n_tok
                    + 1e-9,
                    4,
                ).alias("chars_per_token"),
            )
        )
    from functools import reduce

    return reduce(DataFrame.unionByName, outs)


# --- l69: cross-source vocabulary drift (round 9) ------------------------

_KL_SQL = """
    WITH t AS (
        SELECT source, unnest(list_filter(string_split(lower(text), ' '),
                                          x -> x <> '')) AS term
        FROM documents
    ),
    cnt AS (
        SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
        FROM t GROUP BY 1, 2
    ),
    totals AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1
    ),
    vocab AS (SELECT DISTINCT term FROM cnt),
    vsz AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    grid AS (
        SELECT s.source, s.n, w.term, COALESCE(c.c, 0) AS c, z.v
        FROM totals s
        CROSS JOIN vocab w
        CROSS JOIN vsz z
        LEFT JOIN cnt c ON c.source = s.source AND c.term = w.term
    ),
    contrib AS (
        SELECT a.source AS source_a, b.source AS source_b, a.term,
               (CAST(a.c + 1 AS DOUBLE) / CAST(a.n + a.v AS DOUBLE))
               * LN((CAST(a.c + 1 AS DOUBLE) / CAST(a.n + a.v AS DOUBLE))
                    / (CAST(b.c + 1 AS DOUBLE) / CAST(b.n + b.v AS DOUBLE)))
                   AS kx
        FROM grid a JOIN grid b
          ON a.term = b.term AND a.source <> b.source
    ),
    folded AS (
        SELECT source_a, source_b,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               list_reduce(list(kx ORDER BY term), (acc, x) -> acc + x) AS kl
        FROM contrib GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_terms,
           ROUND(kl + 1e-9, 6) + 0.0 AS kl_nats
    FROM folded
"""


@register("l69_source_kl_drift", oracle=_KL_SQL)
def l69_source_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L69: cross-source vocabulary drift — pairwise KL divergence
    between the Laplace-smoothed unigram distributions of every
    source pair, the distribution-shift monitor a training-data
    pipeline runs when mixing domains (a source whose KL against the
    mix jumps is the one whose crawl changed under you; complements
    l38's temperature mixing, which assumes the per-source
    distributions are stable).

    Cross-engine: counts and totals are exact integers; Laplace
    smoothing (c+1)/(n+V) makes every probability a ratio of exact
    integers, and each pair's KL is summed by a SEQUENTIAL FOLD over
    the term-sorted contribution array (the t32 discipline) — a
    parallel double SUM would drift with shuffle order at the 6th
    decimal.

    Scale shape: the corpus collapses to |sources| x |vocab| counts
    (map-side combined); the dense (source, term) grid, the pair
    join, and the folds all run on that bounded grid — at 100 TB the
    grid grows with VOCABULARY (Heaps), not rows, and a df cut (the
    l68 discipline) bounds it further if vocabulary explodes."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
        ).alias("term"),
    )
    cnt = t.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    totals = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    vocab = cnt.select("term").distinct()
    vsz = vocab.agg(F.count(F.lit(1)).alias("v"))
    grid = (
        totals.crossJoin(vocab)
        .crossJoin(F.broadcast(vsz))  # bcast: fixed (1-row vocab size)
        .join(cnt, ["source", "term"], "left")
        .select(
            "source", "n", "term", F.coalesce("c", F.lit(0)).alias("c"), "v"
        )
    )
    a = grid.select(
        F.col("source").alias("source_a"),
        "term",
        F.col("c").alias("ca"),
        F.col("n").alias("na"),
        F.col("v").alias("va"),
    )
    b = grid.select(
        F.col("source").alias("source_b"),
        "term",
        F.col("c").alias("cb"),
        F.col("n").alias("nb"),
        F.col("v").alias("vb"),
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("na") + F.col("va")).cast(
        "double"
    )
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("vb")).cast(
        "double"
    )
    contrib = (
        a.join(b, "term")
        .filter(F.col("source_a") != F.col("source_b"))
        .select("source_a", "source_b", "term", (pa * F.log(pa / pb)).alias("kx"))
    )
    folded = contrib.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("term", "kx"))),
            lambda x: x["kx"],
        ).alias("xs"),
    )
    kl = F.aggregate(
        F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
        F.element_at(F.col("xs"), 1),
        lambda acc, x: acc + x,
    )
    return folded.select(
        "source_a",
        "source_b",
        "n_terms",
        (F.round(kl + 1e-9, 6) + 0.0).alias("kl_nats"),
    )

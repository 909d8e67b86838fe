"""Session-scoped tokenized-documents frame (VERDICT r3 #5).

The l-family text queries each re-scan ``documents`` and re-split
``text`` into whitespace tokens; a production pipeline tokenizes the
corpus ONCE and fans every stage out from the tokenized frame. Cache
semantics (keying, cap, LRU, eviction) live in the shared
``_session_cache.SessionFrameCache`` — the same instance discipline
as the near-dup pair cache in ``llm_dedup.py``.

The frame is ``documents`` plus:

- ``toks``   — lowercased whitespace tokens (``ws_tokens``)
- ``n_toks`` — ``size(toks)``

Consumers keep their own filters/derived expressions; only the
scan+split is shared. Queries needing the RAW (case-preserving) split
still derive it from ``text``, which stays a column of the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.functions.text import ws_tokens
from meepo_spark.queries._session_cache import SessionFrameCache

_CACHE = SessionFrameCache(max_per_app=3)


def _build(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    return d.select("*", toks.alias("toks"), F.size(toks).alias("n_toks"))


def tokenized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _CACHE.get(spark, sf_dir, _build)


_SH_CACHE = SessionFrameCache(max_per_app=3)


def _build_shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from meepo_spark.operators.dedup import shingle_hash_set

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.array_sort(shingle_hash_set(F.col("text"), 3)).alias("sh"),
    )


def shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source, sh) with sh = the SORTED distinct
    xxhash64 3-token shingle set — the other corpus-wide derived
    frame the dedup family re-derives per query (l2f, l6, l2g each
    re-shingled the corpus; l2g's verify join touched it four times).
    Sorted order is canonical so prefix filters can slice it
    directly; array_intersect and explode consumers are order-
    insensitive. Same SessionFrameCache discipline as tokenized_docs."""
    return _SH_CACHE.get(spark, sf_dir, _build_shingled)


_SPARSE_TF_CACHE = SessionFrameCache(max_per_app=3)


def _build_sparse_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from meepo_spark.operators.sparse import doc_terms

    d = table(spark, sf_dir, "documents")
    return (
        doc_terms(d)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def sparse_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf): the unigram+trigram term-frequency frame —
    the tokenize+explode+aggregate pass is the dominant cost of every
    sparse-index build, so it is cached once per (app, sf_dir) and
    df/norm/posting derivations (all cheap aggregates over it) are
    recomputed by each consumer: sparse_postings below, and l68b's
    df-cut census (which needs the CUT side of the vocabulary that
    the postings frame by definition no longer carries)."""
    return _SPARSE_TF_CACHE.get(spark, sf_dir, _build_sparse_tf)


_SPARSE_CACHE = SessionFrameCache(max_per_app=3)


def _build_sparse_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from meepo_spark.operators.sparse import df_capped_tfidf

    return df_capped_tfidf(tf=sparse_tf(spark, sf_dir))["postings"]


def sparse_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, w): the df-capped integer TF-IDF posting file
    (unigrams + word trigrams, stop terms with 2*df > N removed, w
    quantized to milliunits — operators/sparse.py). The l68 family
    touches it three times per query (query side, candidate side,
    norms) and l68c derives the pruned index from it — one corpus
    pass builds it, the session cache serves every reuse."""
    return _SPARSE_CACHE.get(spark, sf_dir, _build_sparse_postings)


_IVF_CACHE = SessionFrameCache(max_per_app=3)


def _build_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from meepo_spark.functions.vectors import sq_dist

    emb = table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = pts.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    aw = Window.partitionBy("vec_id").orderBy("sqd", "cid")
    return (
        pts.crossJoin(F.broadcast(cent))  # bcast: fixed (16 seed centroids)
        .select(
            "vec_id", "v", "cid", sq_dist(F.col("v"), F.col("cv")).alias("sqd")
        )
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("cid").alias("cell"))
    )


def ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, cell): the seeded IVF cell assignment (nearest of
    the 16 lowest-id vectors, ties on cid — l3k's quantizer) over the
    embeddings table, double-cast vectors included. The inverted-file
    build is the corpus-sized pass of every IVF consumer (l3k's graded
    mechanism check, l14b's dense hybrid branch), so it is cached once
    per (app, sf_dir); probes/search over it are query-sized. The
    16 seed centroids are recoverable as the rows with vec_id < 16
    (a centroid's own nearest cell is itself at distance 0)."""
    return _IVF_CACHE.get(spark, sf_dir, _build_ivf_assign)


_BM25_CACHE = SessionFrameCache(max_per_app=3)


def _build_bm25_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from meepo_spark.operators.sparse import bm25_postings

    return bm25_postings(tf=sparse_tf(spark, sf_dir))


def bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf, w): the unigram Okapi BM25 posting file
    (k1=1.2, b=0.75, milliunit-quantized — operators/sparse.py
    bm25_postings) derived from the SAME cached sparse_tf frame the
    TF-IDF index uses, so one tokenize pass serves both scorers
    (VERDICT r9 #4). Consumers: l4n's fixed-query search, l68d's
    multi-query retrieval, l14b's hybrid lexical branch. Caching the
    WEIGHTED postings (not just tf) is what killed l4n's bimodal
    rebuild: the dl/df/stats joins run once per (app, sf_dir)."""
    return _BM25_CACHE.get(spark, sf_dir, _build_bm25_postings)


# winnowing parameters shared by the l53/l54/l57/l18b family and the
# cached pair frame below (llm_text re-exports these as _FP_K/_FP_W
# for its generated oracles): k-token grams, w-gram window => the
# MOSS guarantee threshold t = k + w - 1 = 8
FP_K, FP_W = 5, 4
FP_MAX_DF, FP_MIN_SHARED = 20, 3

_WINNOW_PAIRS_CACHE = SessionFrameCache(max_per_app=3)


def _build_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from meepo_spark.operators.fingerprint import (
        candidate_pairs,
        explode_fps,
        with_fingerprints,
    )

    d = tokenized_docs(spark, sf_dir)
    e = explode_fps(
        with_fingerprints(d.select("doc_id", "lang", "toks"), "toks", FP_K, FP_W)
        .select("doc_id", "lang", "fps")
    )
    return candidate_pairs(e, max_df=FP_MAX_DF, min_shared=FP_MIN_SHARED)


def winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a, lang_a, id_b, lang_b, shared): the MOSS winnowing
    candidate-pair frame (k=5/w=4 fingerprints, df<=20 stop cut,
    >=3 shared) — built once per (app, sf_dir) and shared by l54's
    overlap census, l57's dedup resolution, and l18b's three-way
    ensemble (each previously re-derived the full
    tokenize->winnow->postings->pairs chain). lang columns ride along
    per the candidate_pairs extras contract (functionally dependent
    on doc_id); consumers that don't need them just drop them."""
    return _WINNOW_PAIRS_CACHE.get(spark, sf_dir, _build_winnow_pairs)

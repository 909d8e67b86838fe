"""Sparse lexical retrieval: df-capped TF-IDF postings + bounded
top-k over the inverted index (VERDICT r8 #1 — the generalization of
the l67 one-off to query = corpus).

Why the caps are the operator, not a detail: a posting-list equi-join
on the term generates SUM(df_t^2) candidate pairs. Stop terms sit at
df ~ N ("the": every doc), so ONE uncapped hot term turns the join
quadratic for near-zero IDF weight — at 100 TB that single skewed key
is the whole job. Two standard disciplines bound it (both exact,
deterministic, and oracle-replayable):

* **fractional df cut** (stopword discipline, the l54 stop-fp cut):
  drop terms with df/N above a threshold. Semantics: those terms are
  removed from the vector space entirely — cosine is EXACT over the
  kept vocabulary, and since df <= N*num/den implies
  ln(N/df) >= ln(den/num), every kept quantized weight is > 0 for
  den >= 2*num. Removes the bulk of pair volume (the documents
  fixture: the 30 stopword-hot unigrams are 99%+ of SUM(df^2));
  per-term pair cost stays df^2 <= (frac*N)^2 — fine when vocab
  grows with the corpus (Heaps), still quadratic for a fixed hot
  vocabulary, which is what the posting cap is for.
* **per-term posting cap** (static index pruning, Carmel et al.
  SIGIR'01 shape): keep only the R highest-weight postings per term
  (ties on doc_id, so the pruned index is a deterministic function of
  the corpus). Candidate pairs per term <= R^2 regardless of df —
  pair volume <= |vocab|*R^2, LINEAR in corpus growth once vocab
  saturates, at the documented cost that a doc outside a term's top-R
  can only be reached through its other terms (graded as its own
  query, not hidden inside the exact one).

Tokenization: unigrams plus word n-grams over the empties-filtered
token array — unigrams carry the topical mass (and all the stop
risk), n-gram shingles carry phrase identity (near-zero df each).
Weights are integer-quantized (floor(tf*ln(N/df)*q + 0.5)) so dot
products are exact BIGINTs immune to shuffle summation order; norms
and the final cosine are single double chains — bit-identical across
engines (the l67 discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def doc_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngrams: tuple[int, ...] = (1, 3),
) -> DataFrame:
    """(doc_id, term): unigrams + word n-grams of each requested size
    over the lowercased, empty-filtered token array. n-grams join
    tokens with a single space, so term class is recoverable from the
    space count (the census relies on this).

    The token array is staged as a REAL column before the n-gram
    transform — the operators/fingerprint.py:100 lesson: a
    higher-order-function lambda re-evaluates any INLINE subtree it
    references once per element, so an inline ts would re-split and
    re-filter the whole text n times per n-gram position (O(len²)+
    per doc; measured 15.9 s vs 1.3 s for the l68b census at
    sf0.1). As a materialized attribute each element_at is an O(1)
    column read."""
    staged = docs.withColumn(
        "__dt_ts",
        F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != F.lit("")),
    )
    ts = F.col("__dt_ts")
    parts: list[Column] = []
    for n in ngrams:
        if n == 1:
            parts.append(ts)
            continue
        # F.sequence DESCENDS when stop < start — guard short docs
        gram = F.when(
            F.size(ts) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(ts) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(ts, i + j + 1) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        parts.append(gram)
    allterms = parts[0]
    for p in parts[1:]:
        allterms = F.concat(allterms, p)
    return staged.select(
        F.col(id_col).alias("doc_id"), allterms.alias("ts")
    ).select("doc_id", F.explode("ts").alias("term"))


def df_capped_tfidf(
    terms: DataFrame | None = None,
    cap_num: int = 1,
    cap_den: int = 2,
    quant: int = 1000,
    posting_cap: int | None = None,
    tf: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """TF-IDF postings over the df-capped vocabulary.

    Returns {"postings": (doc_id, term, w), "norms": (doc_id, nr),
    "df": (term, df, kept), "nn": 1-row (n)}. The cap is the integer
    comparison cap_den*df <= cap_num*n — no float threshold, so the
    keep/cut verdict is engine-exact. norms are computed over the
    postings actually emitted (after both caps): the capped vectors
    DEFINE the metric, so cosine(x,x)=1 always holds on the index the
    join actually runs on.

    posting_cap=R additionally prunes each kept term's posting list
    to its R largest weights (w DESC, doc_id ASC) — the linear-scale
    mode; None means exact over the kept vocabulary.

    Scale shape: tf/df/norms are map-side-combined aggregates; the
    tf-df join shuffles on the term (vocab-sized build side — NOT
    broadcast, it grows with the corpus); the 1-row n frame is the
    only static broadcast. The posting-cap window partitions on the
    term (high cardinality) and is rank-limited, so Catalyst runs it
    as a Partial+Final WindowGroupLimit pair — per-partition top-R
    before the shuffle, never a full sort of the posting file.

    Pass ``tf`` (doc_id, term, tf) to reuse a precomputed — typically
    session-cached — term-frequency frame instead of re-tokenizing
    (the doc_cache.sparse_tf path); otherwise ``terms`` is
    aggregated here. The tokenize+explode+tf chain is the dominant
    build cost, so every consumer that can share it should."""
    if tf is None:
        if terms is None:  # both optional in the signature, one required
            raise ValueError("df_capped_tfidf: pass `terms` or a precomputed `tf`")
        tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nn = tf.agg(F.count_distinct("doc_id").alias("n"))
    df_flag = df_.crossJoin(F.broadcast(nn)).select(  # bcast: fixed (1 row)
        "term",
        "df",
        (F.col("df") * cap_den <= F.col("n") * cap_num).alias("kept"),
        "n",
    )
    w = (
        tf.join(df_flag.filter("kept"), "term")
        .select(
            "doc_id",
            "term",
            F.floor(
                F.col("tf").cast("double")
                * F.log(F.col("n").cast("double") / F.col("df"))
                * F.lit(float(quant))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("w"),
        )
    )
    if posting_cap is not None:
        pw = Window.partitionBy("term").orderBy(
            F.col("w").desc(), F.col("doc_id").asc()
        )
        w = (
            w.select("doc_id", "term", "w", F.row_number().over(pw).alias("pr"))
            .filter(F.col("pr") <= posting_cap)
            .drop("pr")
        )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nr")
    )
    return {"postings": w, "norms": norms, "df": df_flag.drop("n"), "nn": nn}


def bm25_postings(
    tf: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    quant: int = 1000,
    posting_cap: int | None = None,
    unigrams_only: bool = True,
) -> DataFrame:
    """BM25 weight mode over the SAME term-frequency frame the TF-IDF
    index builds from (VERDICT r9 #4 — one tokenize pass, two
    scorers): returns (doc_id, term, tf, w) with

        w = floor( ln(1 + (N - df + 0.5)/(df + 0.5))          -- idf
                   * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
                   * quant + 0.5 )                             -- BIGINT

    i.e. the Okapi BM25 per-(doc, term) partial, integer-quantized so
    any query score is an exact BIGINT sum (shuffle-order-immune, the
    TF-IDF path's discipline). Unlike TF-IDF, BM25 needs NO df cut
    for correctness: the +1-smoothed idf is strictly positive even at
    df ~ N, stop terms just get tiny weights — so the exact index
    keeps the full vocabulary, and `posting_cap` is the pair-volume
    discipline when this index feeds a doc-to-doc join (same
    Carmel-style truncation window as `df_capped_tfidf`; for
    query-list retrieval the query-term filter already bounds work).

    ``unigrams_only=True`` drops n-gram shingle terms (space in the
    term) first: BM25's length normalization is defined over the
    document's TOKEN count, so dl must not double-count shingles.
    dl/avgdl then come from the unigram tf itself — no second
    tokenize. avgdl = AVG over per-doc BIGINT sums is exact on both
    engines (integral AVG sums exactly before the one division), so
    the weight's double chain is bit-reproducible in DuckDB when
    written in this exact association order.

    Scale shape: dl/df/stats are map-side-combined aggregates; the
    tf–dl join co-partitions on doc_id, the tf–df join on term (both
    grow with the corpus — never broadcast); the 1-row stats frame is
    the only static broadcast."""
    if unigrams_only:
        tf = tf.filter(~F.col("term").contains(" "))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.avg("dl").alias("avgdl")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0) - F.lit(float(b)) + F.lit(float(b)) * F.col("dl") / F.col("avgdl")
    )
    w = (
        tf.join(dl, "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(stats))  # bcast: fixed (1-row corpus stats)
        .select(
            "doc_id",
            "term",
            "tf",
            F.floor(
                idf * F.col("tf") * F.lit(float(k1) + 1.0) / denom
                * F.lit(float(quant))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("w"),
        )
    )
    if posting_cap is not None:
        pw = Window.partitionBy("term").orderBy(
            F.col("w").desc(), F.col("doc_id").asc()
        )
        w = (
            w.select("doc_id", "term", "tf", "w", F.row_number().over(pw).alias("pr"))
            .filter(F.col("pr") <= posting_cap)
            .drop("pr")
        )
    return w


def sparse_cosine_topk(
    postings: DataFrame, norms: DataFrame, k: int
) -> DataFrame:
    """All-docs-vs-all-docs cosine top-k over the inverted index:
    candidates come ONLY from the posting equi-join on the term (pairs
    sharing no kept term never meet — there is no all-pairs stage),
    dots are exact BIGINT sums, and the per-query top-k is a
    rank-limited window on q_id that the planner runs as a
    Partial+Final WindowGroupLimit pair — block top-k per shuffle
    block, then a k-row merge, never a global sort of the candidate
    set. Ties break on cosine DESC, c_id ASC. Returns
    (q_id, c_id, cos, rank)."""
    a = postings.select(
        F.col("doc_id").alias("q_id"), "term", F.col("w").alias("wq")
    )
    b = postings.select(
        F.col("doc_id").alias("c_id"), "term", F.col("w").alias("wc")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id", "c_id")
        .agg(F.sum(F.col("wq") * F.col("wc")).cast("long").alias("dot"))
    )
    # optimization r11: the norm lookups are doc-grain and DATA-GROWING
    # — size-gate the broadcast (maybe_broadcast) instead of letting
    # the planner sort-merge the candidate frame twice (the l68/l67
    # before-plans paid two SMJ exchanges of the scored pairs for two
    # |docs|-row lookups).
    from meepo_spark.operators.broadcast_gate import maybe_broadcast

    cos = (
        dots.join(maybe_broadcast(norms.select(F.col("doc_id").alias("q_id"), F.col("nr").alias("nq"))), "q_id")
        .join(maybe_broadcast(norms.select(F.col("doc_id").alias("c_id"), F.col("nr").alias("nc"))), "c_id")
        .select(
            "q_id",
            "c_id",
            (F.col("dot").cast("double") / (F.col("nq") * F.col("nc"))).alias("cos"),
        )
    )
    win = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return cos.select(
        "q_id", "c_id", "cos", F.row_number().over(win).alias("rank")
    ).filter(F.col("rank") <= k)

"""Graded training-data-pipeline queries beyond dedup/similarity:
benchmark-contamination detection (L2 family), PII-style redaction
accounting, repetition scoring, and training-mix token budgeting
(L4 family). All over the documents fixture.

These are the curation steps a 100 TB pretraining pipeline runs after
near-dedup: scrub leaked eval data, redact sensitive spans, drop
degenerate/repetitive docs, and allocate the token budget across
languages. Every query is pure DataFrame API (JVM-side, codegen-able)
— no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.operators.broadcast_gate import maybe_broadcast
from meepo_spark.queries.doc_cache import tokenized_docs

from meepo_spark.registry import register

# Same distinct-3-token-shingle fragment as llm_dedup._SHINGLES_SQL,
# but carrying source and exploded to (doc_id, source, s) grain.
_SHINGLE_ROWS_SQL = """
    SELECT doc_id, source,
           unnest(list_distinct(list_transform(
               range(greatest(len(string_split(lower(text), ' ')) - 2, 1)),
               i -> array_to_string(string_split(lower(text), ' ')[i+1:i+3], ' ')))) AS s
    FROM documents
"""


@register(
    "l2f_contamination",
    oracle=f"""
    WITH sh AS ({_SHINGLE_ROWS_SQL}),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 200),
    per_doc AS (
        SELECT c.doc_id, c.source,
               COUNT(*)   AS n_shingles,
               COUNT(b.s) AS n_overlap
        FROM sh c LEFT JOIN bench b ON b.s = c.s
        WHERE c.doc_id >= 200
        GROUP BY c.doc_id, c.source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN 5 * n_overlap >= n_shingles THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(n_overlap) AS BIGINT) AS total_overlap
    FROM per_doc
    GROUP BY source
    """,
)
def l2f_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: benchmark-contamination check — flag corpus docs whose
    3-token shingles overlap a held-out benchmark set (here: doc_id <
    200 stands in for the eval suite). A doc is contaminated when ≥20%
    of its shingles appear in ANY benchmark doc (compared in exact
    integer form: 5·overlap ≥ shingles — no float threshold).

    Plan shape for 100 TB: the benchmark shingle vocabulary is tiny
    (eval suites are MBs, the corpus is TBs) and broadcast; the corpus
    side streams through one explode + broadcast-hash left join + two
    aggregations — no shuffle keyed on anything wider than (doc_id).
    Shingles compare as xxhash64 longs (8 bytes), never strings;
    overlap COUNTs are hash-invariant, so the string-shingle DuckDB
    oracle matches exactly (collision P < 1e-9, same argument as
    l2_minhash_lsh_pairs).
    """
    from meepo_spark.queries.doc_cache import shingled_docs

    sh = shingled_docs(spark, sf_dir).select(
        "doc_id", "source", F.explode("sh").alias("s")
    )
    bench = (
        sh.filter(F.col("doc_id") < 200)
        .select("s")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        sh.filter(F.col("doc_id") >= 200)
        .join(F.broadcast(bench), "s", "left")  # bcast: fixed (200-doc benchmark shingles)
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_overlap"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(5 * F.col("n_overlap") >= F.col("n_shingles"), 1).otherwise(0)
        ).alias("n_contaminated"),
        F.sum("n_overlap").alias("total_overlap"),
    )


# Stand-in sensitive-term pattern. In production this slot holds the
# email / phone / SSN / API-key alternation; the fixture's vocabulary
# is synthetic word salad, so three common corpus tokens play the role.
# The engine mechanics (regex scan + global replace + exact accounting)
# are identical for any pattern both regex dialects accept.
def _token_bigrams(df, *carry: str):
    """(carry..., bg): whitespace-token bigrams off the cached `toks`
    column. ONE copy of the n-gram windowing (code-review r4b #3) —
    the greatest(size-2, 0) clamp mirrors the DuckDB oracle fragment
    range(greatest(len-1, 1)): a 1-token doc yields its single token
    as one degenerate 'bigram' on both engines."""
    toks = F.col("toks")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)))
    return df.select(
        *carry,
        F.explode(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, 2), " "))
        ).alias("bg"),
    )


_PII_PAT = r"\b(key|hash|merge)\b"
_PII_SUB = "[REDACTED]"


@register(
    "l4g_pii_redaction",
    oracle=f"""
    WITH r AS (
        SELECT source,
               len(regexp_extract_all(text, '{_PII_PAT}')) AS n_hits,
               LENGTH(regexp_replace(text, '{_PII_PAT}', '{_PII_SUB}', 'g'))
                   - LENGTH(text) AS delta
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_touched,
           CAST(SUM(n_hits) AS BIGINT) AS n_redactions,
           CAST(SUM(delta) AS BIGINT)  AS chars_delta
    FROM r
    GROUP BY source
    """,
)
def l4g_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: PII-style redaction accounting — regex-match sensitive
    spans, globally replace them, and report per-source docs touched,
    span count, and the exact byte delta of the rewrite. The rewrite
    itself (`regexp_replace`) runs in the same projection the stats
    come from, so "audit" and "scrub" are one scan.

    All map-side inside WholeStageCodegen; the only shuffle is the
    final per-source partial+final aggregation. At 100 TB this is the
    canonical embarrassingly-parallel pass — throughput is bounded by
    parquet scan speed, and the integer accounting (count, byte delta)
    aggregates exactly on any engine.
    """
    d = table(spark, sf_dir, "documents")
    n_hits = F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_PAT), 0))
    redacted = F.regexp_replace(F.col("text"), _PII_PAT, _PII_SUB)
    r = d.select(
        "source",
        n_hits.alias("n_hits"),
        (F.length(redacted) - F.length("text")).alias("delta"),
    )
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0)).alias("n_docs_touched"),
        F.sum("n_hits").alias("n_redactions"),
        F.sum("delta").alias("chars_delta"),
    )


@register(
    "l4h_repetition",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents WHERE doc_id < 500
    ),
    tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*)               AS n_unique,
           CAST(MAX(c) AS BIGINT) AS top_count,
           ROUND(COUNT(*)::DOUBLE / SUM(c) + 1e-9, 4)  AS ttr,
           ROUND(MAX(c)::DOUBLE / SUM(c) + 1e-9, 4)    AS top_ratio
    FROM tc
    GROUP BY doc_id
    """,
)
def l4h_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: repetition / degeneracy scoring — per-doc type-token ratio
    and the mass of the single most frequent token. Low TTR or high
    top_ratio marks the looping/boilerplate docs a pretraining filter
    drops. Two hash aggregations over the exploded token stream; the
    doubles are each ONE integer division, bit-identical across
    engines before the 4dp round.

    At scale the (doc_id, token) aggregation partially aggregates
    map-side (tokens within a doc are co-located after explode — no
    pre-shuffle), so shuffle volume is the per-doc vocabulary, not the
    token stream.
    """
    d = tokenized_docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    tok = d.select("doc_id", F.explode(F.col("toks")).alias("token"))
    tc = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    return (
        tc.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_unique"),
            F.max("c").alias("top_count"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_unique",
            "top_count",
            F.round(
                F.col("n_unique").cast("double") / F.col("n_tokens") + 1e-9, 4
            ).alias("ttr"),
            F.round(
                F.col("top_count").cast("double") / F.col("n_tokens") + 1e-9, 4
            ).alias("top_ratio"),
        )
    )


@register(
    "l4i_sample_plan",
    oracle="""
    WITH lt AS (
        SELECT lang,
               CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM lt)
    SELECT lang, n_tokens,
           CAST((1000000 * n_tokens) // t AS BIGINT) AS alloc_tokens,
           CAST((10000 * n_tokens) // t AS BIGINT)   AS share_bp
    FROM lt, tot
    """,
)
def l4i_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: training-mix allocation — measure the per-language token
    supply, then split a fixed 1M-token budget proportionally. Pure
    integer arithmetic (floor division against the corpus total), so
    the plan is bit-identical on any engine and any partitioning —
    exactly what you want from the sampling manifest a 100 TB run is
    reproduced from.

    The token census is one map-side `size(split(...))` aggregation;
    the corpus total (a 1-row scalar) joins back via broadcast, never
    a shuffle.
    """
    d = tokenized_docs(spark, sf_dir)
    lt = d.groupBy("lang").agg(F.sum("n_toks").alias("n_tokens"))
    tot = lt.agg(F.sum("n_tokens").alias("t"))
    return (
        lt.crossJoin(F.broadcast(tot))  # bcast: fixed (1-row total)
        .select(
            "lang",
            "n_tokens",
            F.expr("(1000000 * n_tokens) div t").alias("alloc_tokens"),
            F.expr("(10000 * n_tokens) div t").alias("share_bp"),
        )
    )


@register(
    "l6_curation_pipeline",
    oracle=f"""
    WITH survivors AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    sh AS ({_SHINGLE_ROWS_SQL}),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 200),
    overlap AS (
        SELECT c.doc_id, COUNT(*) AS n_sh, COUNT(b.s) AS n_ov
        FROM sh c LEFT JOIN bench b ON b.s = c.s
        WHERE c.doc_id >= 200
        GROUP BY c.doc_id
    ),
    kept AS (
        SELECT d.lang, len(string_split(lower(d.text), ' ')) AS n_toks
        FROM documents d
        JOIN survivors sv USING (doc_id)
        JOIN overlap o USING (doc_id)
        WHERE d.n_chars >= 40 AND 5 * o.n_ov < o.n_sh
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens
    FROM kept
    GROUP BY lang
    """,
)
def l6_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: the end-to-end curation pipeline the individual L-operators
    compose into — exact dedup (md5 min-id survivor), benchmark
    decontamination (<20% shingle overlap, exact integer threshold),
    a length floor, then the per-language doc/token census of what
    remains. One DAG, all integer outputs.

    This is the DAG shape a 100 TB pretraining run executes nightly:
    every stage is a shuffle keyed on doc_id or a broadcast join, so
    the stages pipeline without materialization barriers; Catalyst
    schedules the dedup and decontamination branches off a shared
    documents scan. Swap the md5 stage for minhash_near_dup_pairs
    (l2b) to make the dedup fuzzy — same join topology.
    """
    from meepo_spark.queries.doc_cache import shingled_docs

    d = tokenized_docs(spark, sf_dir)
    survivors = d.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    sh = shingled_docs(spark, sf_dir).select("doc_id", F.explode("sh").alias("s"))
    bench = (
        sh.filter(F.col("doc_id") < 200)
        .select("s")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    overlap = (
        sh.filter(F.col("doc_id") >= 200)
        .join(F.broadcast(bench), "s", "left")  # bcast: fixed (200-doc benchmark shingles)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_ov"),
        )
    )
    kept = (
        d.filter(F.col("n_chars") >= 40)
        .join(survivors.select("doc_id"), "doc_id")
        .join(overlap, "doc_id")
        .filter(5 * F.col("n_ov") < F.col("n_sh"))
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )


@register(
    "l4k_heavy_hitters",
    oracle="""
    WITH t AS (
        SELECT string_split(lower(text), ' ') AS toks
        FROM documents
    ),
    bg AS (
        SELECT array_to_string(t.toks[i.i + 1 : i.i + 2], ' ') AS term
        FROM t, LATERAL (SELECT unnest(range(len(toks) - 1)) AS i) i
    ),
    bc AS (SELECT term, COUNT(*) AS n_occurrences FROM bg GROUP BY term),
    tot AS (SELECT CAST(SUM(n_occurrences) AS BIGINT) AS n FROM bc)
    SELECT term, CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM bc, tot
    WHERE n_occurrences * 600 > n
    """,
)
def l4k_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: heavy-hitter bigrams via one-pass Misra-Gries candidates +
    exact verification (operators/sketches.py). Reports every bigram
    whose frequency exceeds N/600 of the corpus bigram stream, with
    its EXACT count — the approximation lives only in candidate
    generation, where the pigeonhole guarantee (union of per-partition
    MG(k) summaries ⊇ all terms with global freq > N/k) makes the
    verified answer provably complete. The DuckDB oracle computes the
    same set the naive exact way, so the sketch path is graded as
    equality.

    Scale: the naive plan shuffles the full (term, count) vocabulary;
    this plan's only full-stream aggregation is map-side (MG inside
    mapInPandas, ≤600 rows out per partition), and the exact pass
    shuffles only rows matching the broadcast candidate set. At 100 TB
    the shuffle is bounded by k·partitions, not the vocabulary.

    Optimization r11: the term stream derives from the session-cached
    tokenized frame via `bigrams_from_toks` — the former
    `bigrams(text)` transform re-split the text once per element
    access (the l19 HOF re-evaluation trap), and it ran THREE times
    (sketch pass, exact pass, stream total) over three separate
    parquet scans. Now the stream is built twice off the cached
    `toks` column and the total comes free from the sketch pass's
    partition-count rows.
    """
    from meepo_spark.catalog import spread
    from meepo_spark.operators.sketches import (
        bigrams_from_toks,
        heavy_hitters_exact,
    )
    from meepo_spark.queries.doc_cache import tokenized_docs

    d = tokenized_docs(spark, sf_dir)
    # spread the (small) document rows, THEN explode inside each
    # partition — repartitioning the exploded term stream itself would
    # be exactly the full-stream shuffle the sketch exists to avoid
    terms = spread(d.select("toks")).select(
        F.explode(bigrams_from_toks(F.col("toks"))).alias("term")
    )
    return heavy_hitters_exact(terms, "term", 600)


@register(
    "l7_chunk_dedup",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, string_split(lower(text), ' ') AS toks,
               len(string_split(lower(text), ' ')) AS n
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang,
               array_to_string(
                   t.toks[i.chunk_idx * 12 + 1 : i.chunk_idx * 12 + 16], ' '
               ) AS chunk_text
        FROM t, LATERAL (
            SELECT unnest(range(1 + (greatest(n - 16, 0) + 11) // 12)) AS chunk_idx
        ) i
    ),
    cc AS (
        SELECT lang, chunk_text, COUNT(*) AS c
        FROM c GROUP BY lang, chunk_text
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT)                 AS n_chunks,
           COUNT(*)                               AS n_distinct,
           CAST(SUM(c) - COUNT(*) AS BIGINT)      AS dup_excess,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                  AS n_repeated_texts
    FROM cc
    GROUP BY lang
    """,
)
def l7_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7: chunk-grain dedup census — chunk every document into
    16-token windows on a 12-token stride (the l4j_chunking pass),
    then measure per-language duplication at the CHUNK grain: total
    chunks, distinct chunk texts, the excess instances doc-level
    dedup misses (boilerplate headers, repeated paragraphs), and how
    many distinct texts repeat at all. This is the step between
    document dedup and tokenization that removes the residual
    repetition doc-level passes cannot see.

    Plan shape for 100 TB: chunking is a pure projection fused into
    the scan (same argument as l4j); chunks shuffle ONCE keyed on
    (lang, xxhash64(chunk_text)) — 8-byte longs, never the chunk
    strings — with map-side partial aggregation collapsing
    within-partition repeats before the exchange. The census output
    is integer-exact, so the string-grouped DuckDB oracle matches
    bit-for-bit (xxhash64 collision P < 1e-9 at corpus scale).
    """
    d = tokenized_docs(spark, sf_dir)
    size, stride = 16, 12
    toks = F.col("toks")
    n = F.size(toks)
    n_starts = 1 + F.floor(
        (F.greatest(n - size, F.lit(0)) + (stride - 1)) / stride
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_starts - 1),
        lambda i: F.array_join(F.slice(toks, i * stride + 1, size), " "),
    )
    cc = (
        d.select("lang", F.explode(chunks).alias("chunk_text"))
        .groupBy("lang", F.xxhash64("chunk_text").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cc.groupBy("lang").agg(
        F.sum("c").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("c") - F.count(F.lit(1))).alias("dup_excess"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_repeated_texts"),
    )


@register(
    "l4j_chunking",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks,
               len(string_split(lower(text), ' ')) AS n
        FROM documents WHERE doc_id < 300
    ),
    c AS (
        SELECT doc_id, n,
               unnest(range(1 + (greatest(n - 16, 0) + 11) // 12)) AS chunk_idx
        FROM t
    )
    SELECT c.doc_id,
           CAST(c.chunk_idx AS INT) AS chunk_idx,
           array_to_string(t.toks[c.chunk_idx * 12 + 1 : c.chunk_idx * 12 + 16], ' ')
               AS chunk_text,
           CAST(len(t.toks[c.chunk_idx * 12 + 1 : c.chunk_idx * 12 + 16]) AS INT)
               AS n_chunk_tokens
    FROM c JOIN t ON t.doc_id = c.doc_id
    """,
)
def l4j_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: token-window chunking — split each document into 16-token
    chunks on a 12-token stride (4-token overlap), the
    context-window prep step between curation and tokenization.
    Chunk starts are 0, stride, 2·stride, …; the last start is the
    first that exposes the tail, so no token is dropped and no empty
    chunk is emitted.

    All map-side: chunk boundaries are arithmetic over the token
    array (sequence → transform → posexplode), no shuffle at all
    until whatever consumes the chunks. At 100 TB that matters: the
    chunker is a pure projection pass, so it fuses into the scan."""
    d = tokenized_docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    size, stride = 16, 12
    toks = F.col("toks")
    n = F.size(toks)
    n_starts = 1 + F.floor(
        (F.greatest(n - size, F.lit(0)) + (stride - 1)) / stride
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_starts - 1),
        lambda i: F.slice(toks, i * stride + 1, size),
    )
    return (
        d.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.array_join("chunk", " ").alias("chunk_text"),
            F.size("chunk").alias("n_chunk_tokens"),
        )
    )


@register(
    "l8_sequence_packing",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang,
               len(string_split(lower(text), ' ')) AS n_tok
        FROM documents
    ),
    seq AS (
        SELECT doc_id, lang, n_tok,
               SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok AS tok_offset
        FROM tok
    )
    SELECT lang,
           CAST(tok_offset // 256 AS BIGINT)  AS pack_id,
           CAST(COUNT(*) AS BIGINT)           AS n_docs,
           CAST(SUM(n_tok) AS BIGINT)         AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT)        AS first_doc,
           CAST(MAX(doc_id) AS BIGINT)        AS last_doc
    FROM seq
    GROUP BY lang, tok_offset // 256
    """,
)
def l8_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8: GPT-style sequence packing — concatenate each language's
    token stream in doc_id order and chop into fixed 256-token
    context windows; a doc belongs to the pack where its first token
    lands. The pretraining data loader runs exactly this to turn
    variable-length documents into fixed-shape training batches, and
    the per-pack census (docs spanned, token mass, boundary docs) is
    the packing-efficiency report.

    Scale shape: the naive formulation is one window cumsum per
    language — a single sequential task per lang at 100 TB. This
    plan computes the SAME prefix sum in two bounded levels: a
    within-bucket cumsum over ~1k-doc buckets (many small window
    partitions, parallel) plus a bucket-total cumsum over the tiny
    (lang, bucket) aggregate, then offset = bucket_base + within -
    own. Identical integers to the oracle's flat cumsum, but the
    longest sequential scan is one bucket, not one language."""
    d = tokenized_docs(spark, sf_dir)
    tok = d.select(
        "doc_id",
        "lang",
        F.col("n_toks").alias("n_tok"),
        (F.col("doc_id") / 1000).cast("long").alias("bkt"),
    )
    w_in = (
        W.partitionBy("lang", "bkt")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    within = tok.withColumn("cum_in", F.sum("n_tok").over(w_in))
    w_bkt = (
        W.partitionBy("lang")
        .orderBy("bkt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    base = (
        tok.groupBy("lang", "bkt")
        .agg(F.sum("n_tok").alias("b_tok"))
        .withColumn("b_base", F.sum("b_tok").over(w_bkt) - F.col("b_tok"))
        .select("lang", "bkt", "b_base")
    )
    packed = (
        within.join(F.broadcast(base), ["lang", "bkt"])  # bcast: fixed (lang x decile grid)
        .withColumn("offset", F.col("b_base") + F.col("cum_in") - F.col("n_tok"))
        .withColumn("pack_id", (F.col("offset") / 256).cast("long"))
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "l14_hybrid_retrieval",
    oracle="""
    WITH base AS (
        SELECT doc_id, len(string_split(lower(text), ' ')) AS dl FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM base),
    tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    tf AS (
        SELECT t.doc_id, t.token, COUNT(*) AS tf, ANY_VALUE(b.dl) AS dl
        FROM tok t JOIN base b ON t.doc_id = b.doc_id
        WHERE t.token IN ('query', 'join', 'vector')
        GROUP BY 1, 2
    ),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS doc_freq FROM tf GROUP BY 1),
    bm25 AS (
        SELECT doc_id,
               ROUND(SUM(LN(1 + (s.n_docs - df.doc_freq + 0.5) / (df.doc_freq + 0.5))
                         * tf.tf * 2.2
                         / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))) + 1e-9, 4) AS score
        FROM tf JOIN df USING (token) CROSS JOIN stats s
        GROUP BY doc_id
    ),
    ra AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS r
        FROM bm25
    ),
    qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
    rb AS (
        SELECT e.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                   ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.v) DESC,
                            e.vec_id ASC) AS r
        FROM embeddings e CROSS JOIN qv q
    ),
    fused AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               ROUND(COALESCE(1.0 / (60 + a.r), 0) + COALESCE(1.0 / (60 + b.r), 0), 6) AS rrf,
               a.r AS bm25_rank, b.r AS cos_rank
        FROM (SELECT * FROM ra WHERE r <= 50) a
        FULL OUTER JOIN (SELECT * FROM rb WHERE r <= 50) b ON a.doc_id = b.doc_id
    )
    SELECT doc_id, rrf,
           CAST(bm25_rank AS BIGINT) AS bm25_rank,
           CAST(cos_rank AS BIGINT)  AS cos_rank
    FROM fused
    ORDER BY rrf DESC, doc_id ASC
    LIMIT 15
    """,
)
def l14_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L14: hybrid retrieval with reciprocal-rank fusion — the modern
    RAG retrieval shape: a lexical ranker (BM25, l4n's scorer) and a
    dense ranker (exact cosine vs doc 0's embedding, l3's kernel)
    each produce a top-50, fused by RRF(60): score = Σ 1/(60+rank).
    Rank fusion needs no score calibration between rankers — exactly
    why production hybrid search uses it — and is integer-reciprocal
    arithmetic, so the fused ordering is bit-deterministic.

    Scale shape: each ranker is its own bounded pipeline (BM25's
    postings prefilter, cosine's one corpus scan vs a broadcast query
    vector); the fusion join touches 2×50 rows. The global
    row_number windows run over ranker outputs (candidate-sized, not
    corpus-sized) — per-query partitioning replaces them under a
    query batch."""
    from meepo_spark.functions.vectors import cosine_with_norms, norm
    from pyspark.sql import Window as W

    d = tokenized_docs(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings")

    # --- lexical ranker (l4n's BM25) ---
    base = d.select(
        "doc_id", F.explode(F.col("toks")).alias("token"),
        F.col("n_toks").alias("dl"),
    )
    stats = base.select("doc_id", "dl").dropDuplicates(["doc_id"]).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        base.filter(F.col("token").isin("query", "join", "vector"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    df_tbl = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("doc_freq"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("doc_freq") + 0.5) / (F.col("doc_freq") + 0.5))
    per_term = idf * F.col("tf") * 2.2 / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    bm25 = (
        tf.join(F.broadcast(df_tbl), "token")  # bcast: fixed (3 query terms)
        .crossJoin(F.broadcast(stats))  # bcast: fixed (1-row corpus stats)
        .groupBy("doc_id")
        .agg(F.round(F.sum(per_term) + F.lit(1e-9), 4).alias("score"))
    )
    # top-50 via TakeOrderedAndProject, then rank over the bounded
    # 50-row frame — an unpartitioned rank window never gets a
    # WindowGroupLimit, so rank-then-filter would single-task the
    # full score table (r3 plancheck fix, both rankers).
    ra = (
        bm25.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(50)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
            .alias("r"),
        )
    )

    # --- dense ranker (l3's cosine kernel) ---
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec"), norm(F.col("embedding")).alias("qn")
    )
    scored = emb.crossJoin(F.broadcast(qv)).select(  # bcast: fixed (1-row query vector)
        F.col("vec_id").alias("doc_id"),
        cosine_with_norms(
            F.col("q_vec"), F.col("embedding"), F.col("qn"), norm(F.col("embedding"))
        ).alias("cos"),
    )
    rb = (
        scored.orderBy(F.col("cos").desc(), F.col("doc_id").asc())
        .limit(50)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.col("cos").desc(), F.col("doc_id").asc()))
            .alias("r"),
        )
    )

    fused = (
        ra.withColumnRenamed("r", "bm25_rank")
        .join(rb.withColumnRenamed("r", "cos_rank"), "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (60 + F.col("bm25_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("cos_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
            F.col("bm25_rank").cast("long").alias("bm25_rank"),
            F.col("cos_rank").cast("long").alias("cos_rank"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(15)


@register(
    "l15_dataset_card",
    oracle="""
    SELECT COUNT(*)                                          AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT)              AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT)            AS n_sources,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT)         AS n_distinct_texts,
           ROUND(1.0 - COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*) + 1e-9, 4)
               AS exact_dup_rate,
           ROUND(AVG(n_chars) + 1e-9, 2)                     AS avg_chars
    FROM documents
    """,
)
def l15_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L15: the dataset card — the one-row corpus summary every
    published dataset ships (docs, language/source diversity, token
    volume, exact-dup rate, length profile). One scan, all counts
    integer-exact; the dup rate hashes content (128-bit digests, the
    same key the dedup pipeline shuffles on).

    At 100 TB this is the cheap always-on census the curation DAG
    (l6) re-derives per release; distinct counts would switch to the
    mergeable HLL sketches (g3b) when exactness stops being worth the
    distinct-shuffle."""
    d = table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("total_ws_tokens"),
        F.countDistinct(F.md5("text")).alias("n_distinct_texts"),
        F.round(
            1.0 - F.countDistinct(F.md5("text")) * 1.0 / F.count(F.lit(1)) + F.lit(1e-9), 4
        ).alias("exact_dup_rate"),
        F.round(F.avg("n_chars") + F.lit(1e-9), 2).alias("avg_chars"),
    )


@register(
    "l16_perplexity_filter",
    oracle="""
    WITH bg AS (
        SELECT doc_id, lang, bg
        FROM (
            SELECT doc_id, lang, unnest(list_transform(
                range(greatest(len(string_split(lower(text), ' ')) - 1, 1)),
                i -> array_to_string(string_split(lower(text), ' ')[i+1:i+2], ' '))) AS bg
            FROM documents
        ) t
    ),
    ref_counts AS (
        SELECT bg, COUNT(*) AS n FROM bg WHERE doc_id % 5 <> 4 GROUP BY bg
    ),
    ref_tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS vocab
        FROM ref_counts
    ),
    scored AS (
        SELECT c.doc_id, c.lang,
               -LN((COALESCE(r.n, 0) + 1.0) / (t.total + t.vocab + 1.0)) AS nll
        FROM bg c
        LEFT JOIN ref_counts r ON c.bg = r.bg
        CROSS JOIN ref_tot t
        WHERE c.doc_id % 5 = 4
    )
    SELECT lang,
           COUNT(DISTINCT doc_id)                           AS n_docs,
           ROUND(AVG(nll) + 1e-9, 4)                        AS avg_cross_entropy,
           CAST(COUNT(DISTINCT CASE WHEN doc_id IN (
               SELECT doc_id FROM scored GROUP BY doc_id HAVING AVG(nll) > 6.85
           ) THEN doc_id END) AS BIGINT)                    AS n_flagged
    FROM scored
    GROUP BY lang
    """,
)
def l16_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L16: LM-perplexity quality filtering (the CCNet/Wiki-LM recipe):
    an add-one-smoothed bigram LM is "trained" on the reference corpus
    (doc_id %5 != 4) as plain counts, and each candidate-batch doc is
    scored by its average negative log-likelihood; docs above the
    cross-entropy threshold get flagged as out-of-distribution. The LM
    IS two count tables + a broadcast join — no model artifact, which
    is exactly how distributed perplexity filtering shards at 100 TB
    (the n-gram table is the only shared state, and it's
    equi-joinable/bloom-prunable).

    Float discipline: per-bigram NLL is ln() of one identical integer
    ratio; per-doc averages sum ≤ ~100 such terms (1e-14 noise vs 4dp
    rounding), and the 6.85 flag threshold keeps a >=1e-4
    margin to every fixture score at all SFs (measured), so boundary
    flips can't occur."""
    d = tokenized_docs(spark, sf_dir)
    all_bg = _token_bigrams(d, "doc_id", "lang")
    ref = all_bg.filter(F.col("doc_id") % 5 != 4).groupBy("bg").agg(
        F.count(F.lit(1)).alias("n")
    )
    ref_tot = ref.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    cand = all_bg.filter(F.col("doc_id") % 5 == 4)
    scored = (
        # ref is the per-bigram LM count table — DATA-GROWING with the
        # reference corpus (VERDICT r5 #1): size-gated
        cand.join(maybe_broadcast(ref), "bg", "left")
        .crossJoin(F.broadcast(ref_tot))  # bcast: fixed (1-row totals)
        .select(
            "doc_id", "lang",
            (-F.log(
                (F.coalesce(F.col("n"), F.lit(0)) + 1.0)
                / (F.col("total") + F.col("vocab") + 1.0)
            )).alias("nll"),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(F.avg("nll").alias("doc_ce"))
    return (
        scored.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.round(F.avg("nll") + F.lit(1e-9), 4).alias("avg_cross_entropy"),
        )
        .join(
            per_doc.filter(F.col("doc_ce") > 6.85)
            .groupBy("lang")
            .agg(F.countDistinct("doc_id").alias("n_flagged")),
            "lang",
            "left",
        )
        .select(
            "lang", "n_docs", "avg_cross_entropy",
            F.coalesce("n_flagged", F.lit(0)).alias("n_flagged"),
        )
    )


@register(
    "l17_epoch_shuffle",
    oracle="""
    WITH sched AS (
        SELECT e.epoch, d.doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY e.epoch
                   ORDER BY md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) ASC,
                            d.doc_id ASC) AS pos
        FROM documents d
        CROSS JOIN (SELECT unnest(range(3)) AS epoch) e
    )
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(pos AS BIGINT)   AS pos,
           doc_id
    FROM sched WHERE pos <= 5
    """,
)
def l17_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L17: reproducible multi-epoch data ordering — every epoch is an
    independent deterministic permutation of the corpus, keyed by
    md5(epoch:doc_id). THE training-pipeline requirement a plain
    .orderBy(rand()) cannot meet: re-running epoch 7 after a crash
    must replay byte-identical order on any cluster size, and two
    epochs must decorrelate. Graded output: each epoch's first five
    scheduled docs.

    Scale shape (r3, per VERDICT r2 #1): the o7 bucketed-enumeration
    discipline replaces the per-epoch window — hash-prefix buckets
    (256/epoch), per-bucket counts -> broadcast running offsets ->
    within-bucket row_number + offset. Each WindowExec partition holds
    ~N/256 rows (and only off<5 buckets reach it for the graded top-5),
    vs the old plan's whole-corpus-per-epoch single task. The hash
    doubles as the shard assignment for packed-sequence writing (l8)."""
    d = table(spark, sf_dir, "documents")
    epochs = spark.range(3).select(F.col("id").alias("epoch"))
    sched = d.select("doc_id").crossJoin(F.broadcast(epochs)).select(  # bcast: fixed (epoch grid)
        "epoch",
        "doc_id",
        F.md5(F.concat_ws(":", F.col("epoch"), F.col("doc_id"))).alias("__h"),
    )
    # Bucket = first 2 hex chars of the hash (256 buckets/epoch). md5 is
    # lowercase hex, so lexicographic order of the full hash refines the
    # prefix order: bucket boundaries are consistent with the sort key,
    # and the bucket is an EXPRESSION of the key (the o7 rule — never a
    # physical partition id). At 100 TB widen the prefix (3 chars = 4096
    # buckets); offsets stay a tiny broadcast either way.
    b = sched.withColumn("__b", F.substring("__h", 1, 2))
    counts = b.groupBy("epoch", "__b").agg(F.count("*").alias("__n"))
    off_w = (
        W.partitionBy("epoch").orderBy("__b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "epoch", "__b",
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off"),
    )
    # pos = within-bucket rank + bucket offset; pos<=k needs off<k, so
    # only ~1 bucket per epoch ever reaches the window — the WindowExec
    # partition holds N/256 rows, not N. ONE constant drives both
    # filters so the prune can never desync from the graded top-k.
    top_k = 5
    rn_w = W.partitionBy("epoch", "__b").orderBy(
        F.col("__h").asc(), F.col("doc_id").asc()
    )
    return (
        b.join(F.broadcast(offsets), ["epoch", "__b"])  # bcast: bucket
        .filter(F.col("__off") < top_k)
        .select(
            "epoch", "doc_id",
            (F.row_number().over(rn_w) + F.col("__off")).cast("long").alias("pos"),
        )
        .filter(F.col("pos") <= top_k)
        .select("epoch", "pos", "doc_id")
    )


@register(
    "l18_dedup_signal_agreement",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(greatest(len(string_split(lower(text), ' ')) - 2, 1)),
                   i -> array_to_string(string_split(lower(text), ' ')[i+1:i+3], ' '))) AS sh
        FROM documents WHERE doc_id < 200
    ),
    lens AS (SELECT doc_id, len(sh) AS ln FROM d),
    tok AS (SELECT doc_id, unnest(sh) AS s FROM d),
    shared AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM tok a JOIN tok b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    text_pairs AS (
        SELECT s.id_a, s.id_b
        FROM shared s JOIN lens la ON s.id_a = la.doc_id JOIN lens lb ON s.id_b = lb.doc_id
        WHERE s.c * 1.0 / (la.ln + lb.ln - s.c) >= 0.6
    ),
    embed_pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 200 AND b.vec_id < 200
          AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
    ),
    joined AS (
        SELECT CASE WHEN t.id_a IS NOT NULL AND e.id_a IS NOT NULL THEN 'both'
                    WHEN t.id_a IS NOT NULL THEN 'text_only'
                    ELSE 'embedding_only' END AS signal
        FROM text_pairs t FULL OUTER JOIN embed_pairs e
          ON t.id_a = e.id_a AND t.id_b = e.id_b
    )
    SELECT signal, COUNT(*) AS n_pairs
    FROM joined GROUP BY signal
    """,
)
def l18_dedup_signal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L18: multi-signal dedup agreement matrix — near-dup pairs found
    by the lexical signal (exact shingle Jaccard >= 0.6 on a bounded
    200-doc block) vs the semantic signal (embedding cosine >= 0.3 on
    the same id range), full-outer joined and bucketed into
    both / text_only / embedding_only. The audit every multi-signal
    dedup pipeline runs before trusting one signal to gate the other:
    disagreement volume is the tuning target.

    Both pair generators reuse the graded operators' exact
    formulations (text: postings-join Jaccard; embeddings: sequential
    -fold cosine), so the matrix is integer-exact."""
    from meepo_spark.functions.vectors import cosine_with_norms, norm
    from meepo_spark.operators.dedup import exact_jaccard, shingle_hash_set

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    ids = d.select("doc_id")
    cand = ids.alias("x").join(
        ids.alias("y"), F.col("x.doc_id") < F.col("y.doc_id")
    ).select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
    text_pairs = (
        exact_jaccard(cand, d, "text", "doc_id", set_builder=lambda c: shingle_hash_set(c, 3))
        .filter(F.col("jaccard") >= 0.6)
        .select("id_a", "id_b")
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    ea = emb.select(F.col("vec_id").alias("ea"), F.col("embedding").alias("va")).withColumn(
        "na", norm(F.col("va"))
    )
    eb = emb.select(F.col("vec_id").alias("eb"), F.col("embedding").alias("vb")).withColumn(
        "nb", norm(F.col("vb"))
    )
    embed_pairs = (
        ea.join(eb, F.col("ea") < F.col("eb"))
        .filter(
            cosine_with_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")) >= 0.3
        )
        .select(F.col("ea").alias("id_a"), F.col("eb").alias("id_b"))
    )

    joined = text_pairs.withColumn("t", F.lit(1)).join(
        embed_pairs.withColumn("e", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    signal = (
        F.when(F.col("t").isNotNull() & F.col("e").isNotNull(), "both")
        .when(F.col("t").isNotNull(), "text_only")
        .otherwise("embedding_only")
    )
    return joined.select(signal.alias("signal")).groupBy("signal").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )

_L22_U = """((instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 1048576.0
              + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 65536.0
              + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 4096.0
              + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 256.0
              + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 16.0
              + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1)
              + 1.0) / 16777217.0"""

# weights CAST to DOUBLE and multiplied in Spark's left-to-right
# order — DuckDB otherwise folds 0.6 * n * 0.30 in exact DECIMAL,
# which lands 1 ulp off Spark's double chain for ~45% of counts and
# can flip an acceptance whose md5-uniform sits in the gap
# (code-review r3 finding, verified numerically)
_L22_W = ("CAST(CASE lang WHEN 'en' THEN 0.30 WHEN 'zh' THEN 0.20 "
          "WHEN 'es' THEN 0.20 WHEN 'de' THEN 0.15 ELSE 0.15 END "
          "AS DOUBLE)")


@register(
    "l22_mixture_sampling",
    oracle=f"""
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM counts),
    rates AS (
        SELECT lang, n_docs,
               LEAST(CAST(1.0 AS DOUBLE), CAST(0.6 AS DOUBLE) * tot.n * {_L22_W} / n_docs) AS rate
        FROM counts CROSS JOIN tot
    ),
    accepted AS (
        SELECT d.lang, COUNT(*) AS n_sampled
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE {_L22_U} < r.rate
        GROUP BY d.lang
    ),
    ts AS (SELECT CAST(SUM(n_sampled) AS BIGINT) AS t FROM accepted)
    SELECT r.lang, r.n_docs,
           CAST(COALESCE(a.n_sampled, 0) AS BIGINT) AS n_sampled,
           ROUND(r.rate + 1e-9, 4) AS rate_r,
           ROUND(COALESCE(a.n_sampled, 0) * 1.0 / ts.t + 1e-9, 4)
               AS achieved_share
    FROM rates r LEFT JOIN accepted a ON r.lang = a.lang CROSS JOIN ts
    """,
)
def l22_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L22: training-data MIXTURE resampling — hit target language
    proportions (en .30 / zh .20 / es .20 / de .15 / fr .15) within a
    60%-of-corpus token budget by computing per-language acceptance
    rates min(1, budget*w_l/n_l) and accepting each doc via a
    deterministic md5-uniform draw. THE data-mixture primitive behind
    every pretraining recipe (domain/language reweighting): the draw
    is reproducible across engines, runs, and cluster sizes — a
    plain `WHERE rand() < r` cannot be replayed or audited.

    Scale shape: per-language counts are one tiny aggregate (5 rows)
    joined back as a broadcast; the accept test is a pure map-side
    projection (one md5 per row, no shuffle); the achieved-mix report
    aggregates the accepted rows once more. Rates and uniforms are
    bit-identical IEEE expressions on both engines, so the accepted
    SET (not just its size) is deterministic — l4i grades the
    per-row sample plan, this grades the mixture contract."""
    d = table(spark, sf_dir, "documents").select("lang", "doc_id")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("n"))
    w = (
        F.when(F.col("lang") == "en", 0.30)
        .when(F.col("lang") == "zh", 0.20)
        .when(F.col("lang") == "es", 0.20)
        .when(F.col("lang") == "de", 0.15)
        .otherwise(0.15)
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(  # bcast: fixed (1-row total)
        "lang", "n_docs",
        F.least(F.lit(1.0), F.lit(0.6) * F.col("n") * w / F.col("n_docs")).alias("rate"),
    )
    h = F.md5(F.col("doc_id").cast("string"))
    u = (F.conv(F.substring(h, 1, 6), 16, 10).cast("double") + 1.0) / 16777217.0
    accepted = (
        d.join(F.broadcast(rates.select("lang", "rate")), "lang")  # bcast: fixed (per-lang rates)
        .filter(u < F.col("rate"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    ts = accepted.agg(F.sum("n_sampled").alias("t"))
    return (
        rates.join(F.broadcast(accepted), "lang", "left")  # bcast: fixed (per-lang counts)
        .crossJoin(F.broadcast(ts))  # bcast: fixed (1-row total)
        .select(
            "lang",
            "n_docs",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.round(F.col("rate") + 1e-9, 4).alias("rate_r"),
            F.round(
                F.coalesce("n_sampled", F.lit(0)) / F.col("t") + 1e-9, 4
            ).alias("achieved_share"),
        )
    )

@register(
    "l23_quality_decile_budget",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               len(string_split(lower(text), ' ')) AS n_tok,
               n_chars
        FROM documents
    ),
    tiled AS (
        SELECT doc_id, n_tok,
               NTILE(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
        FROM scored
    ),
    agg AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS tokens
        FROM tiled GROUP BY decile
    ),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS t FROM agg)
    SELECT CAST(decile AS BIGINT) AS decile, n_docs, tokens,
           ROUND(tokens * 1.0 / tot.t + 1e-9, 4) AS token_share
    FROM agg CROSS JOIN tot
    """,
)
def l23_quality_decile_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L23: quality-decile token budgeting — rank the corpus into
    global deciles by a quality key (length here; any scalar score
    slots in) and report each decile's document count, token mass,
    and share of the total budget. THE "keep the top X% by quality"
    planning table a curation run consults before committing to a
    filter threshold: it says what fraction of tokens each decile
    costs, which l4d's per-doc scores alone do not.

    Scale shape: the global NTILE comes from the shared bucketed
    enumeration (operators/enumeration.bucketed_ntile — no
    single-task sort; same machinery as m3/v11), the token count is
    a map-side projection, and the report is a 10-row aggregate plus
    a 1-row total broadcast."""
    from meepo_spark.operators.enumeration import bucketed_ntile

    d = tokenized_docs(spark, sf_dir).select(
        "doc_id",
        F.col("n_toks").alias("n_tok"),
        "n_chars",
    )
    tiled = bucketed_ntile(
        d, -F.col("n_chars"),
        [F.col("n_chars").desc(), F.col("doc_id")], 10, out="decile",
    )
    agg = tiled.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("tokens"),
    )
    tot = agg.agg(F.sum("tokens").alias("t"))
    return agg.crossJoin(F.broadcast(tot)).select(  # bcast: fixed (1-row total)
        "decile", "n_docs", "tokens",
        F.round(F.col("tokens") / F.col("t") + 1e-9, 4).alias("token_share"),
    )


_DSIR_BG_SQL = """
    SELECT doc_id, lang, source,
           unnest(list_transform(
               range(greatest(len(string_split(lower(text), ' ')) - 1, 1)),
               i -> array_to_string(string_split(lower(text), ' ')[i+1:i+2], ' '))) AS bg
    FROM documents
"""


@register(
    "l33_dsir_importance",
    oracle=f"""
    WITH bg AS (
        SELECT doc_id, lang, source,
               CAST(('0x' || substr(md5(bg), 1, 15)) AS BIGINT) % 1024 AS fid
        FROM ({_DSIR_BG_SQL})
    ),
    ct AS (SELECT fid, CAST(COUNT(*) AS BIGINT) AS c
           FROM bg WHERE lang = 'en' GROUP BY fid),
    cr AS (SELECT fid, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY fid),
    tot AS (SELECT CAST((SELECT COUNT(*) FROM bg WHERE lang = 'en') AS BIGINT) AS t,
                   CAST((SELECT COUNT(*) FROM bg) AS BIGINT) AS r),
    lr AS (
        SELECT cr.fid,
               ln((COALESCE(ct.c, 0) + 1) * 1.0 / (tot.t + 1024))
             - ln((cr.c + 1) * 1.0 / (tot.r + 1024)) AS lr
        FROM cr LEFT JOIN ct ON ct.fid = cr.fid CROSS JOIN tot
    ),
    per_doc_f AS (
        SELECT doc_id, source, fid, CAST(COUNT(*) AS BIGINT) AS c
        FROM bg GROUP BY doc_id, source, fid
    ),
    per_doc AS (
        SELECT doc_id, source,
               ROUND(list_sum(LIST(c * lr.lr ORDER BY fid)) + 1e-9, 6) AS w
        FROM per_doc_f JOIN lr USING (fid)
        GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(w) + 1e-9, 3) + 0.0 AS avg_log_importance,
           CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_target_like
    FROM per_doc GROUP BY source
    """,
)
def l33_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L33: DSIR-style data selection — importance weights from
    hashed n-gram features (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", the published recipe
    behind quality-targeted pretraining mixes): target distribution =
    the lang='en' slice, raw = the whole corpus; each doc's log
    importance weight is Σ_f count_d(f)·ln(p̂_t(f)/p̂_r(f)) over 1024
    hashed bigram buckets with add-one smoothing. Docs with w > 0
    look more like the target than the raw pool — the resampling
    acceptance set.

    Cross-engine exactness: feature ids are md5-derived (the l20
    discipline) so both engines bucket identically; the 1024 log-
    ratios are ln() of identical integer ratios (≤1 ulp libm skew);
    each doc folds its c·lr terms in SORTED fid order (F.aggregate ≡
    list_sum(LIST ... ORDER BY)), per-doc weights round at 6dp, the
    report at 3dp — the l4m two-level rounding discipline.

    Scale shape: one bigram explode off the shared tokenized frame;
    the feature-count tables are ≤1024 rows (broadcast); the only
    doc-grain shuffle carries (doc, fid) partial counts. This is the
    whole DSIR estimator as two aggregates and a broadcast join."""
    from meepo_spark.queries.doc_cache import tokenized_docs

    d = tokenized_docs(spark, sf_dir)
    bg = _token_bigrams(d, "doc_id", "lang", "source").select(
        "doc_id",
        "lang",
        "source",
        (F.conv(F.substring(F.md5("bg"), 1, 15), 16, 10).cast("long") % 1024).alias(
            "fid"
        ),
    )
    # optimization r10: ct/cr/tot/per_doc_f each re-ran the bigram
    # explode (4 corpus passes). ONE doc-grain partial aggregate is
    # materialized instead, and the three censuses are exact integer
    # re-aggregations of it (sum of partial counts = the full count).
    per_doc_f = (
        bg.groupBy("doc_id", "lang", "source", "fid")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    ct = (
        per_doc_f.filter(F.col("lang") == "en")
        .groupBy("fid")
        .agg(F.sum("c").cast("long").alias("c_t"))
    )
    cr = per_doc_f.groupBy("fid").agg(F.sum("c").cast("long").alias("c_r"))
    tot = per_doc_f.agg(
        F.sum(F.when(F.col("lang") == "en", F.col("c")).otherwise(0)).alias("t"),
        F.sum("c").alias("r"),
    )
    lr = (
        cr.join(ct, "fid", "left")
        .crossJoin(F.broadcast(tot))  # bcast: fixed (1-row total)
        .select(
            "fid",
            (
                F.log((F.coalesce("c_t", F.lit(0)) + 1) * 1.0 / (F.col("t") + 1024))
                - F.log((F.col("c_r") + 1) * 1.0 / (F.col("r") + 1024))
            ).alias("lr"),
        )
    )
    per_doc = (
        per_doc_f.join(F.broadcast(lr), "fid")  # bcast: fixed (1024 hashed fids)
        .groupBy("doc_id", "source")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct("fid", (F.col("c") * F.col("lr")).alias("term")))
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["term"],
                )
                + 1e-9,
                6,
            ).alias("w")
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.round(F.avg("w") + 1e-9, 3) + 0.0).alias("avg_log_importance"),
        F.sum(F.when(F.col("w") > 0, 1).otherwise(0)).alias("n_target_like"),
    )


@register(
    "l38_temperature_mixture",
    oracle="""
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
               SUM(SQRT(n_docs)) AS z,
               CAST(FLOOR(SUM(n_docs) * 0.5) AS BIGINT) AS b
        FROM counts
    ),
    shares AS (
        SELECT c.lang, c.n_docs, t.b,
               SQRT(c.n_docs) / t.z AS p,
               CAST(FLOOR(t.b * SQRT(c.n_docs) / t.z + 1e-9) AS BIGINT) AS alloc0,
               t.b * SQRT(c.n_docs) / t.z
                   - FLOOR(t.b * SQRT(c.n_docs) / t.z + 1e-9) AS rem
        FROM counts c CROSS JOIN tot t
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY ROUND(rem, 6) DESC, lang) AS rr,
               SUM(alloc0) OVER () AS base_total
        FROM shares
    )
    SELECT lang, n_docs,
           CAST(alloc0 + CASE WHEN rr <= b - base_total THEN 1 ELSE 0 END
                AS BIGINT)                                   AS alloc,
           ROUND(p + 1e-9, 4)                                AS share_r
    FROM ranked
    """,
)
def l38_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L38: temperature-flattened language mixture (the mT5/UNIMAX
    family: p_l ∝ n_l^α with α = 0.5) with an EXACT integer budget
    split by the largest-remainder (Hamilton) method — Σ alloc always
    equals the budget, unlike independent floors/rounds. α = 0.5 is
    deliberately sqrt: IEEE sqrt is correctly rounded, so the shares
    are bit-identical across engines where a pow(x, 0.3) could drift
    an ulp and flip a floor at the boundary.

    Scale shape: one 5-row language aggregate + broadcast scalar
    totals; the ranking window runs over the 5-row share frame
    (bounded by |langs|, never data-sized). The allocation this emits
    is what a 100 TB pretraining sampler consumes as per-language
    acceptance quotas — l22 grades rate-based acceptance, this grades
    the integer budget ledger."""
    d = table(spark, sf_dir, "documents").select("lang")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("n"),
        F.sum(F.sqrt("n_docs")).alias("z"),
        F.floor(F.sum("n_docs") * 0.5).cast("long").alias("b"),
    )
    shares = counts.crossJoin(F.broadcast(tot)).select(  # bcast: fixed (1-row total)
        "lang",
        "n_docs",
        "b",
        (F.sqrt("n_docs") / F.col("z")).alias("p"),
        F.floor(F.col("b") * F.sqrt("n_docs") / F.col("z") + 1e-9)
        .cast("long")
        .alias("alloc0"),
        (
            F.col("b") * F.sqrt("n_docs") / F.col("z")
            - F.floor(F.col("b") * F.sqrt("n_docs") / F.col("z") + 1e-9)
        ).alias("rem"),
    )
    w = W.orderBy(F.round("rem", 6).desc(), F.col("lang").asc())
    ranked = shares.select(
        "*",
        F.row_number().over(w).alias("rr"),
        F.sum("alloc0").over(W.partitionBy()).alias("base_total"),
    )
    return ranked.select(
        "lang",
        "n_docs",
        (
            F.col("alloc0")
            + F.when(F.col("rr") <= F.col("b") - F.col("base_total"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
        F.round(F.col("p") + 1e-9, 4).alias("share_r"),
    )


@register(
    "l39_c4_cleaning_census",
    oracle="""
    WITH f AS (
        SELECT lang,
               len(string_split(text, ' '))                    AS words,
               length(replace(text, ' ', ''))                  AS chars_ns,
               CASE WHEN text LIKE '%.' THEN 0 ELSE 1 END      AS no_punct,
               CASE WHEN contains(text, '{') THEN 1 ELSE 0 END AS brace,
               CASE WHEN contains(lower(text), 'lorem ipsum')
                    THEN 1 ELSE 0 END                          AS lorem
        FROM documents
    ),
    g AS (
        SELECT lang, no_punct, brace, lorem,
               CASE WHEN words < 20 THEN 1 ELSE 0 END AS short_doc,
               CASE WHEN chars_ns < 3 * words
                      OR chars_ns > 10 * words THEN 1 ELSE 0 END AS badlen
        FROM f
    )
    SELECT lang,
           COUNT(*)                              AS n_docs,
           CAST(SUM(short_doc) AS BIGINT)        AS n_too_short,
           CAST(SUM(no_punct) AS BIGINT)         AS n_no_terminal_punct,
           CAST(SUM(brace) AS BIGINT)            AS n_brace,
           CAST(SUM(lorem) AS BIGINT)            AS n_lorem,
           CAST(SUM(badlen) AS BIGINT)           AS n_bad_wordlen,
           CAST(SUM(CASE WHEN short_doc + no_punct + brace + lorem + badlen = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           ROUND(SUM(CASE WHEN short_doc + no_punct + brace + lorem + badlen = 0
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*) + 1e-9, 4)
                                                 AS pass_rate
    FROM g GROUP BY lang
    """,
)
def l39_c4_cleaning_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L39: C4/RefinedWeb-style cleaning-rule census per language —
    the web-scale pre-filter that runs BEFORE dedup: too-short docs,
    missing terminal punctuation, code markers ('{'), boilerplate
    ('lorem ipsum'), and implausible mean word length. The word-length
    gate is kept in INTEGER arithmetic (chars < 3*words or >
    10*words) so no double ratio can drift an inequality across
    engines. One map-side projection + one aggregate: at 100 TB this
    is a single scan whose selectivity report (pass_rate) is what the
    pipeline owner reads before committing the budget downstream."""
    d = table(spark, sf_dir, "documents")
    words = F.size(F.split("text", " "))
    chars_ns = F.length(F.regexp_replace("text", " ", ""))
    short_doc = (words < 20).cast("int")
    no_punct = (~F.col("text").endswith(".")).cast("int")
    brace = F.col("text").contains("{").cast("int")
    lorem = F.lower(F.col("text")).contains("lorem ipsum").cast("int")
    badlen = ((chars_ns < 3 * words) | (chars_ns > 10 * words)).cast("int")
    g = d.select(
        "lang",
        short_doc.alias("short_doc"),
        no_punct.alias("no_punct"),
        brace.alias("brace"),
        lorem.alias("lorem"),
        badlen.alias("badlen"),
    )
    clean = (
        F.col("short_doc") + F.col("no_punct") + F.col("brace")
        + F.col("lorem") + F.col("badlen")
        == 0
    ).cast("int")
    return g.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("short_doc").cast("long").alias("n_too_short"),
        F.sum("no_punct").cast("long").alias("n_no_terminal_punct"),
        F.sum("brace").cast("long").alias("n_brace"),
        F.sum("lorem").cast("long").alias("n_lorem"),
        F.sum("badlen").cast("long").alias("n_bad_wordlen"),
        F.sum(clean).cast("long").alias("n_pass"),
        F.round(F.sum(clean) / F.count(F.lit(1)) + 1e-9, 4).alias("pass_rate"),
    )


@register(
    "l40_vocab_coverage",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    df AS (
        SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY token
    ),
    vocab AS (
        SELECT token FROM df ORDER BY df DESC, token ASC LIMIT 500
    )
    SELECT t.lang,
           COUNT(*)                                            AS total_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                               AS oov_tokens,
           ROUND(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*) + 1e-9, 4)                         AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.lang
    """,
)
def l40_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L40: tokenizer-vocabulary coverage — build a 500-entry vocab
    from global document frequency (ties broken by token, a total
    order) and report per-language out-of-vocabulary token rates, the
    number that decides whether a tokenizer underserves a language
    (the fertility complement to l12).

    Scale shape: DF is one explode + one (token) hash aggregate with
    map-side combine; the vocab cut is orderBy().limit(500) — a
    TakeOrderedAndProject whose cost is a per-partition top-k merge,
    NEVER a global sort (the bound is structural, vocab can be
    millions of distinct tokens at 100 TB); membership is a 500-row
    broadcast left-anti-style join against the token stream."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    df_counts = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )
    vocab = (
        df_counts.orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(500)
        .select("token", F.lit(1).alias("__in_vocab"))
    )
    joined = tok.join(F.broadcast(vocab), "token", "left")  # bcast: fixed (limit-500 vocab)
    oov = F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.sum(oov).cast("long").alias("oov_tokens"),
        F.round(F.sum(oov) / F.count(F.lit(1)) + 1e-9, 4).alias("oov_rate"),
    )


# --- sequence packing (VERDICT r6 #4) --------------------------------

# One constant set drives the Spark queries AND the generated oracles
# (the Holt single-sourcing discipline, r5 #6): max tokens kept per
# document (docs longer are clipped, the loss censused), the training
# sequence capacity, and the packing block width.
_PACK_DOC_CAP = 80
_PACK_SEQ_LEN = 256
_PACK_BLOCK_W = 128

_PACK_TOKS_CTE = f"""
    toks AS (
        SELECT doc_id,
               least(len(string_split(lower(text), ' ')), {_PACK_DOC_CAP}) AS n,
               greatest(len(string_split(lower(text), ' ')) - {_PACK_DOC_CAP}, 0)
                   AS lost
        FROM documents
    )"""


def _packed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n, block, seq) — the shared packing stage: clip each
    doc's whitespace-token count at _PACK_DOC_CAP, first-fit-pack in
    doc_id order within fixed 128-doc blocks (operators/packing)."""
    from meepo_spark.operators.packing import pack_first_fit

    d = tokenized_docs(spark, sf_dir).select(
        "doc_id", F.least("n_toks", F.lit(_PACK_DOC_CAP)).alias("n")
    )
    return pack_first_fit(
        d, capacity=_PACK_SEQ_LEN, block_width=_PACK_BLOCK_W
    )


def _pack_sql(src: str = "toks", key: str = "doc_id") -> str:
    from meepo_spark.operators.packing import pack_first_fit_sql

    return pack_first_fit_sql(
        src, key=key, capacity=_PACK_SEQ_LEN, block_width=_PACK_BLOCK_W
    )


@register(
    "l50_sequence_packing",
    oracle=f"""
    WITH {_PACK_TOKS_CTE},
    packed AS ({_pack_sql()})
    SELECT block,
           seq,
           CAST(COUNT(*) AS BIGINT)  AS n_docs,
           CAST(SUM(n) AS BIGINT)    AS seq_tokens,
           ROUND(SUM(n) * 1.0 / {_PACK_SEQ_LEN} + 1e-9, 6) + 0.0 AS fill_rate
    FROM packed
    GROUP BY block, seq
    """,
)
def l50_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L50: sequence packing — the final stage of every pretraining
    data pipeline: documents (clipped at the 80-token doc cap) are
    greedily FIRST-FIT packed into 256-token training sequences,
    deterministically, and the per-sequence census (docs per
    sequence, token fill, fill rate) is the data-efficiency
    dashboard every training run reads — unfilled tail = wasted
    compute, and the block-boundary fill loss is measured here
    instead of assumed. Complements l8, the OTHER standard packing
    family: l8 concatenates-and-chops (docs split at context
    boundaries — zero padding waste, cross-doc attention bleed);
    this packer keeps every doc INTACT in one sequence (bin-packing
    waste instead, no bleed). Real pipelines pick per masking
    strategy, so the engine grades both.

    Scale shape (operators/packing.pack_first_fit): packing is a
    sequential recurrence, so the sequential unit is BOUNDED — blocks
    of ≤128 consecutive doc_ids pack independently via one JVM-side
    F.aggregate fold each (state capped by the block width), behind a
    single groupBy(block) shuffle of (id, n) pairs. No window, no
    enumeration, no Python; embarrassingly parallel across blocks at
    any corpus size. fill_rate divides by a power of two, so the
    double is exact cross-engine (rounded anyway, belt and braces).
    """
    return (
        _packed_docs(spark, sf_dir)
        .groupBy("block", "seq")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("seq_tokens"),
            (
                F.round(F.sum("n") / F.lit(_PACK_SEQ_LEN) + 1e-9, 6) + 0.0
            ).alias("fill_rate"),
        )
    )


@register(
    "l51_packing_census",
    oracle=f"""
    WITH {_PACK_TOKS_CTE},
    packed AS ({_pack_sql()}),
    seqs AS (
        SELECT block, seq, SUM(n) AS seq_tokens
        FROM packed GROUP BY block, seq
    )
    SELECT CAST((SELECT COUNT(*) FROM seqs) AS BIGINT)        AS n_sequences,
           CAST((SELECT COUNT(*) FROM toks) AS BIGINT)        AS n_docs,
           CAST((SELECT SUM(seq_tokens) FROM seqs) AS BIGINT) AS packed_tokens,
           CAST((SELECT COUNT(*) FROM toks WHERE lost > 0) AS BIGINT)
               AS trunc_docs,
           CAST((SELECT SUM(lost) FROM toks) AS BIGINT)       AS trunc_tokens,
           ROUND((SELECT SUM(seq_tokens) FROM seqs) * 1.0
                 / ((SELECT COUNT(*) FROM seqs) * {_PACK_SEQ_LEN}) + 1e-9, 6)
               + 0.0 AS avg_fill_rate
    """,
)
def l51_packing_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L51: the packing run's one-row efficiency report — sequence
    count, packed token mass, TRUNCATION loss (docs clipped at the
    80-token doc cap and the tokens that cost), and the
    realized average fill rate. The two loss channels a packing stage
    trades between: raise the doc cap and truncation falls but
    fragmentation (1 - fill) rises; this query is the measurement
    that closes that loop.

    Scale shape: the packing stage is l50's (bounded-block folds);
    the census is two tiny aggregates (per-sequence then global) plus
    one documents-scan aggregate for the truncation side — all
    map-side-combinable, output is ONE row."""
    toks = tokenized_docs(spark, sf_dir).select(
        "doc_id",
        F.least("n_toks", F.lit(_PACK_DOC_CAP)).alias("n"),
        F.greatest(
            F.col("n_toks") - F.lit(_PACK_DOC_CAP), F.lit(0)
        ).alias("lost"),
    )
    seqs = (
        _packed_docs(spark, sf_dir)
        .groupBy("block", "seq")
        .agg(F.sum("n").alias("seq_tokens"))
        .agg(
            F.count(F.lit(1)).alias("n_sequences"),
            F.sum("seq_tokens").alias("packed_tokens"),
        )
    )
    tc = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("lost") > 0, 1).otherwise(0)).cast("long").alias(
            "trunc_docs"
        ),
        F.sum("lost").cast("long").alias("trunc_tokens"),
    )
    return seqs.crossJoin(F.broadcast(tc)).select(  # bcast: fixed (1-row census)
        "n_sequences",
        "n_docs",
        "packed_tokens",
        "trunc_docs",
        "trunc_tokens",
        (
            F.round(
                F.col("packed_tokens")
                / (F.col("n_sequences") * F.lit(_PACK_SEQ_LEN))
                + 1e-9,
                6,
            )
            + 0.0
        ).alias("avg_fill_rate"),
    )


@register(
    "l52_shuffled_packing",
    oracle=f"""
    WITH {_PACK_TOKS_CTE},
    sched AS (
        SELECT ROW_NUMBER() OVER (
                   ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)) ASC,
                            doc_id ASC) - 1 AS k,
               n
        FROM toks
    ),
    packed AS ({_pack_sql("sched", key="k")})
    SELECT block,
           seq,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT)   AS seq_tokens,
           ROUND(SUM(n) * 1.0 / {_PACK_SEQ_LEN} + 1e-9, 6) + 0.0 AS fill_rate
    FROM packed
    GROUP BY block, seq
    """,
)
def l52_shuffled_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L52: packing composed with the EPOCH SHUFFLE (l17's
    deterministic md5(epoch:doc_id) permutation, epoch 0) — the order
    a real training run actually packs in: shuffle first (so
    neighboring sequences decorrelate), then first-fit within blocks
    of the SHUFFLED position. Same census as l50, so the two grade
    the fill-efficiency effect of order: doc_id order inherits any
    length autocorrelation in the corpus; the shuffled order is the
    exchangeable baseline.

    Scale shape: the shuffled position comes from the o7
    bucketed-enumeration discipline (operators/enumeration.
    bucketed_row_number over 256 md5-prefix buckets — the bucket is
    an expression of the sort key, never a partition id), then the
    SAME bounded-block fold as l50 packs by position blocks. The
    oracle's plain ROW_NUMBER window is the semantic spec; the
    engine-side plan never materializes a whole-corpus window
    partition."""
    from meepo_spark.operators.enumeration import bucketed_row_number
    from meepo_spark.operators.packing import pack_first_fit

    d = tokenized_docs(spark, sf_dir).select(
        "doc_id", F.least("n_toks", F.lit(_PACK_DOC_CAP)).alias("n")
    )
    h = F.md5(F.concat_ws(":", F.lit(0), F.col("doc_id")))
    keyed = d.select("doc_id", "n", h.alias("__h"))
    ranked = bucketed_row_number(
        keyed,
        F.substring("__h", 1, 2),
        [F.col("__h").asc(), F.col("doc_id").asc()],
        out="pos",
    ).select((F.col("pos") - 1).cast("long").alias("k"), "n")
    return (
        pack_first_fit(
            ranked,
            key_col="k",
            capacity=_PACK_SEQ_LEN,
            block_width=_PACK_BLOCK_W,
        )
        .groupBy("block", "seq")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("seq_tokens"),
            (
                F.round(F.sum("n") / F.lit(_PACK_SEQ_LEN) + 1e-9, 6) + 0.0
            ).alias("fill_rate"),
        )
    )


# --- l14b: hybrid retrieval over the graded indexes (round 10) ----------

from meepo_spark.queries.llm_sim import _SPARSE_IDX_CTES

_L14B_ORACLE = (
    "WITH "
    + _SPARSE_IDX_CTES
    + """,
    nrm AS (
        SELECT doc_id, sqrt(CAST(SUM(w * w) AS DOUBLE)) AS nr
        FROM w GROUP BY doc_id
    ),
    sd AS (
        SELECT b.doc_id AS c_id, CAST(SUM(a.w * b.w) AS BIGINT) AS dot
        FROM w a JOIN w b ON a.term = b.term
        WHERE a.doc_id = 0 AND b.doc_id <> 0
        GROUP BY 1
    ),
    scos AS (
        SELECT sd.c_id, CAST(sd.dot AS DOUBLE) / (qa.nr * qb.nr) AS c
        FROM sd
        JOIN nrm qa ON qa.doc_id = 0
        JOIN nrm qb ON qb.doc_id = sd.c_id
    ),
    ra AS (
        SELECT c_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY c DESC, c_id ASC) AS r
        FROM scos
    ),
    pts AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM pts WHERE vec_id < 16),
    assign AS (SELECT vec_id, cid AS cell FROM (
                 SELECT p.vec_id, c.cid,
                        ROW_NUMBER() OVER (
                          PARTITION BY p.vec_id
                          ORDER BY list_sum(list_transform(list_zip(p.v, c.cv),
                                   x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
                 FROM pts p CROSS JOIN cent c) WHERE rn = 1),
    qd AS (SELECT v AS qv FROM pts WHERE vec_id = 0),
    probes AS (SELECT cid AS cell FROM (
                 SELECT c.cid,
                        ROW_NUMBER() OVER (
                          ORDER BY list_sum(list_transform(list_zip(q.qv, c.cv),
                                   x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
                 FROM qd q CROSS JOIN cent c) WHERE rn <= 2),
    dsc AS (
        SELECT a.vec_id AS doc_id, list_dot_product(q.qv, p.v) AS dot
        FROM assign a
        JOIN probes pr ON a.cell = pr.cell
        JOIN pts p ON p.vec_id = a.vec_id
        CROSS JOIN qd q
        WHERE a.vec_id <> 0
    ),
    rb AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY dot DESC, doc_id ASC) AS r
        FROM dsc
    ),
    fused AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               ROUND(COALESCE(1.0 / (60 + a.r), 0)
                     + COALESCE(1.0 / (60 + b.r), 0), 6) AS rrf,
               a.r AS sparse_rank, b.r AS dense_rank
        FROM (SELECT * FROM ra WHERE r <= 50) a
        FULL OUTER JOIN (SELECT * FROM rb WHERE r <= 50) b
          ON a.doc_id = b.doc_id
    )
    SELECT doc_id, rrf,
           CAST(sparse_rank AS BIGINT) AS sparse_rank,
           CAST(dense_rank AS BIGINT)  AS dense_rank
    FROM fused
    ORDER BY rrf DESC, doc_id ASC
    LIMIT 15
"""
)


@register("l14b_hybrid_fused_retrieval", oracle=_L14B_ORACLE)
def l14b_hybrid_fused_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L14b: the full hybrid-search DAG as ONE graded pipeline
    (VERDICT r9 #5) — the sparse branch retrieves doc 0's cosine
    top-50 from the session-cached df-capped TF-IDF posting file
    (l68's index, doc_cache.sparse_postings), the dense branch
    retrieves vec 0's dot-product top-50 through the session-cached
    seeded IVF inverted file (l3k's index, doc_cache.ivf_assign,
    nprobe=2), and reciprocal-rank fusion (k=60) merges the two
    shortlists. Where l14 graded the FUSION micro-shape over two
    inline rankers, this grades the production composition: both
    branches read the same cached indexes every other retrieval query
    uses (plan-asserted: two InMemoryTableScans).

    Scale shape: per query the sparse branch touches only the posting
    lists of the query doc's kept terms and the dense branch only the
    probed cells (~nprobe/k of the corpus); both shortlists are
    bounded (50), so fusion is a 100-row full-outer join. All
    corpus-sized work lives in the cached index builds. Exactness:
    sparse dots are BIGINT sums of quantized weights; dense dots are
    sequential float64 folds; RRF is integer-reciprocal arithmetic —
    every rank and the fused score reproduce bit-wise in DuckDB."""
    from meepo_spark.functions.vectors import dot as vdot
    from meepo_spark.functions.vectors import sq_dist
    from meepo_spark.queries.doc_cache import ivf_assign, sparse_postings

    # --- sparse branch: doc 0 vs the TF-IDF posting file ---
    w = sparse_postings(spark, sf_dir)
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nr")
    )
    qpost = w.filter(F.col("doc_id") == 0).select("term", F.col("w").alias("wq"))
    dots = (
        w.filter(F.col("doc_id") != 0)
        .join(F.broadcast(qpost), "term")  # bcast: fixed (one doc's postings)
        .groupBy(F.col("doc_id").alias("c_id"))
        .agg(F.sum(F.col("wq") * F.col("w")).cast("long").alias("dot"))
    )
    qn = norms.filter(F.col("doc_id") == 0).select(F.col("nr").alias("nq"))
    scos = (
        dots.crossJoin(F.broadcast(qn))  # bcast: fixed (1-row query norm)
        .join(norms.select(F.col("doc_id").alias("c_id"), F.col("nr").alias("nc")), "c_id")
        .select("c_id", (F.col("dot").cast("double") / (F.col("nq") * F.col("nc"))).alias("c"))
    )
    # top-50 via TakeOrderedAndProject, then rank over the bounded
    # 50-row frame (the l14 discipline: an unpartitioned rank window
    # never gets a WindowGroupLimit)
    ra = (
        scos.orderBy(F.col("c").desc(), F.col("c_id").asc())
        .limit(50)
        .select(
            F.col("c_id").alias("doc_id"),
            F.row_number()
            .over(W.orderBy(F.col("c").desc(), F.col("c_id").asc()))
            .alias("r"),
        )
    )

    # --- dense branch: vec 0 through the seeded IVF inverted file ---
    assign = ivf_assign(spark, sf_dir)
    cent = assign.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    qd = assign.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    probes = (
        qd.crossJoin(F.broadcast(cent))  # bcast: fixed (16 seed centroids)
        .select("qv", "cid", sq_dist(F.col("qv"), F.col("cv")).alias("sqd"))
        .orderBy("sqd", "cid")
        .limit(2)
        .select("qv", F.col("cid").alias("cell"))
    )
    dsc = (
        assign.join(F.broadcast(probes), "cell")  # bcast: fixed (nprobe rows)
        .filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"),
            vdot(F.col("qv"), F.col("v")).alias("dot"),
        )
    )
    rb = (
        dsc.orderBy(F.col("dot").desc(), F.col("doc_id").asc())
        .limit(50)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.col("dot").desc(), F.col("doc_id").asc()))
            .alias("r"),
        )
    )

    fused = (
        ra.withColumnRenamed("r", "sparse_rank")
        .join(rb.withColumnRenamed("r", "dense_rank"), "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (60 + F.col("sparse_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("dense_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
            F.col("sparse_rank").cast("long").alias("sparse_rank"),
            F.col("dense_rank").cast("long").alias("dense_rank"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(15)

"""Graded multimodal-column queries (L5): binary payload + typed
metadata conventions, and the Arrow-batched feature-extraction path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meepo_spark.catalog import table
from meepo_spark.multimodal.columns import attach_fake_payload, extract_features
from meepo_spark.registry import register


@register(
    "l5_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)  AS n_bytes,
           md5(text)                                   AS content_md5,
           CAST(doc_id % 64 + 32 AS INT)               AS width,
           CAST(doc_id % 48 + 32 AS INT)               AS height,
           'image'                                     AS kind
    FROM documents
    WHERE doc_id < 300
    """,
)
def l5_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: binary payload construction + metadata struct access. The
    payload itself never leaves the executors — only its length and
    digest do (the discipline that matters when the column is a 4 MB
    image at 100 TB scale)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    m = attach_fake_payload(d)
    return (
        m.join(d.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            F.octet_length("payload").cast("long").alias("n_bytes"),
            F.md5("text").alias("content_md5"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.kind").alias("kind"),
        )
    )


@register(
    "l5b_multimodal_features",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               lower(hex(encode(text))) AS hx,
               octet_length(encode(text)) AS n
        FROM documents WHERE doc_id < 300
    ),
    bytes AS (
        SELECT doc_id, n, unnest(list_transform(range(n),
            i -> 16 * (strpos('0123456789abcdef', substr(hx, 2*i + 1, 1)) - 1)
                 + (strpos('0123456789abcdef', substr(hx, 2*i + 2, 1)) - 1)))
               AS bv
        FROM b
    ),
    hist AS (SELECT doc_id, n, bv, COUNT(*) AS c FROM bytes GROUP BY 1, 2, 3),
    stats AS (
        SELECT doc_id,
               SUM(bv * c)::DOUBLE / SUM(c) AS mean,
               -SUM((c::DOUBLE / n) * log2(c::DOUBLE / n)) AS ent
        FROM hist
        GROUP BY doc_id, n
    )
    SELECT b.doc_id,
           CAST(b.n AS BIGINT) AS n_bytes,
           ROUND(COALESCE(s.mean, 0) + 1e-9, 3) AS byte_mean,
           ROUND(COALESCE(s.ent, 0) + 1e-9, 3) AS byte_entropy,
           substr(b.hx, 1, 16) AS head_hex
    FROM b LEFT JOIN stats s ON s.doc_id = b.doc_id
    """,
)
def l5b_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: mapInPandas feature extraction over binary payloads —
    deterministic byte-level stats standing in for decoded media
    features (decode itself is stubbed; codecs absent here).

    Oracle-checked: the fake payload is the text's UTF-8 bytes, so
    DuckDB rebuilds the byte stream from hex(encode(text)) and
    recomputes mean/entropy/head in SQL. byte_mean is exact on both
    sides (integer byte sums < 2^53 stay lossless in float64 under
    any summation order); entropy sums ≤256 log2 terms whose ~1e-15
    association drift is absorbed by +1e-9 before 3dp rounding."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    feats = extract_features(attach_fake_payload(d))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.col("byte_mean") + 1e-9, 3).alias("byte_mean"),
        F.round(F.col("byte_entropy") + 1e-9, 3).alias("byte_entropy"),
        "head_hex",
    )


@register(
    "l5c_frame_sample_plan",
    oracle="""
    SELECT doc_id,
           unnest(range(0, CAST(doc_id % 16 + 1 AS INT), 4)) AS frame_idx
    FROM documents
    WHERE doc_id < 300
    """,
)
def l5c_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: video frame-sampling fan-out — every 4th frame of each fake
    video, planned JVM-side before any decode touches bytes."""
    from meepo_spark.multimodal.columns import attach_fake_video, plan_frame_samples

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return plan_frame_samples(attach_fake_video(d), every_n=4).select(
        "doc_id", F.col("frame_idx").cast("int").alias("frame_idx")
    )


@register(
    "l5d_resize_bytes",
    oracle="""
    SELECT doc_id,
           CAST(LEAST(doc_id % 64 + 32, 32) AS INT)  AS width,
           CAST(LEAST(doc_id % 48 + 32, 32) AS INT)  AS height,
           CAST(FLOOR(octet_length(encode(text))
                * LEAST(1.0, 1024.0 / ((doc_id % 64 + 32) * (doc_id % 48 + 32))))
                AS BIGINT)                            AS n_bytes
    FROM documents
    WHERE doc_id < 300
    """,
)
def l5d_resize_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: mapInPandas resize to 32×32 — the deterministic stub
    truncates payloads by area ratio, making the byte-length contract
    exactly SQL-checkable (same double math on both sides)."""
    from meepo_spark.multimodal.columns import attach_fake_payload, resize_media

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return resize_media(attach_fake_payload(d), 32, 32)


@register(
    "l5e_crossmodal_join",
    oracle="""
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(ROUND(sqrt(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4))
                 + 1e-9, 2) AS avg_norm,
           ROUND(CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*) + 1e-9, 1)
               AS avg_chars
    FROM documents d
    JOIN embeddings e ON e.vec_id = d.doc_id
    GROUP BY 1
    """,
)
def l5e_crossmodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5e: cross-modal pairing — join the text table to its
    embedding table by id (the documents/embeddings fixtures are
    aligned 1:1 on doc_id = vec_id) and report per-language pair
    counts, mean L2 norm, and mean length. This is the join every
    multimodal training pipeline runs to marry captions/transcripts
    to their vision/audio vectors before batching.

    Both sides shuffle on the SAME integer id (or the text side
    broadcasts when it is the small one); the norm folds JVM-side in
    DOUBLE with per-row 4dp rounding before the language average, so
    cross-engine float drift stays below the reported precision."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    norm = F.round(
        F.sqrt(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ),
        4,
    )
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select("lang", "n_chars", norm.alias("norm"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("norm") + 1e-9, 2).alias("avg_norm"),
            F.round(
                F.sum("n_chars").cast("double") / F.count(F.lit(1)) + 1e-9, 1
            ).alias("avg_chars"),
        )
    )

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


@register("l5b_multimodal_features")  # rows-only: Pandas-UDF byte stats
def l5b_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: mapInPandas feature extraction over binary payloads —
    deterministic byte-level stats standing in for decoded media
    features (decode itself is stubbed; codecs absent here). Rounds
    floats so the rows-only check is stable across runs."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    feats = extract_features(attach_fake_payload(d))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round("byte_mean", 3).alias("byte_mean"),
        F.round("byte_entropy", 3).alias("byte_entropy"),
        "head_hex",
    )

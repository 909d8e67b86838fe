"""Multimodal column plumbing.

Conventions:
  * payload: BINARY — the raw media bytes, never interpreted by Spark
    itself. Partition/shuffle cost is dominated by this column, so
    stages that don't need bytes must prune it (select the metadata
    struct only) — Catalyst column pruning keeps the scan narrow.
  * meta: STRUCT<kind, mime, width, height, duration_ms, n_frames> —
    typed, filterable, pushdown-friendly.

Decoding/feature extraction runs in ``mapInPandas`` (Arrow batches in
and out — the UDF sees pandas objects, rows never cross one at a
time). The image/audio codec libraries are not in this container, so
``decode_media`` is a clearly marked stub: real codecs behind an
import-try, and a deterministic fake (byte histogram features) keeps
the Spark-side plumbing — schema, batching, partitioning — real and
testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Deterministic stand-in media: utf-8 bytes of the text column as
    the BINARY payload plus a typed meta struct. In production this
    column comes straight from the source (tar/webdataset/parquet with
    embedded bytes) — everything downstream is identical."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("application/x-fake").alias("mime"),
            (F.pmod(F.col("doc_id"), F.lit(64)) + 32).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(48)) + 32).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, kind: str):
    """Decode raw media bytes. STUB — codec libraries (PIL/av/librosa)
    are not available in this environment; plug them in here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "media codecs not installed; use extract_features' deterministic "
            "byte-level path, or install PIL/av and implement decode_media"
        )
    raise NotImplementedError("real decode path not implemented in this container")


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload):
    byte-level statistics as a deterministic stand-in for real decoded
    features. The mapInPandas shape (schema, batch iteration,
    column pruning upstream) is exactly what a real decoder uses."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = pdf["payload"]
            n_bytes, means, ents, heads = [], [], [], []
            for raw in payloads:
                arr = np.frombuffer(raw, dtype=np.uint8)
                n_bytes.append(len(arr))
                means.append(float(arr.mean()) if len(arr) else 0.0)
                if len(arr):
                    counts = np.bincount(arr, minlength=256).astype(np.float64)
                    p = counts[counts > 0] / len(arr)
                    ents.append(float(-(p * np.log2(p)).sum()))
                else:
                    ents.append(0.0)
                heads.append(bytes(arr[:8]).hex())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "byte_mean": means,
                    "byte_entropy": ents,
                    "head_hex": heads,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def attach_fake_video(docs: DataFrame) -> DataFrame:
    """Deterministic stand-in VIDEO payloads: n_frames derived from
    doc_id (1..16), 25 fps timing in duration_ms."""
    n_frames = (F.pmod(F.col("doc_id"), F.lit(16)) + 1).cast("int")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("video").alias("kind"),
            F.lit("video/x-fake").alias("mime"),
            F.lit(320).cast("int").alias("width"),
            F.lit(240).cast("int").alias("height"),
            (n_frames * 40).cast("long").alias("duration_ms"),
            n_frames.alias("n_frames"),
        ).alias("meta"),
    )


def plan_frame_samples(df: DataFrame, every_n: int = 4) -> DataFrame:
    """One row per sampled frame index (stride ``every_n``) — the
    fan-out PLANNING step of video frame sampling, pure JVM (explode
    of a sequence over meta.n_frames; no decode needed to decide
    which frames to touch). The pixel extraction for each planned
    (doc_id, frame_idx) then runs through the decode path
    (``decode_media``, stubbed here) — planning first means the
    decoder touches ceil(n_frames/stride) frames, not all of them."""
    return df.select(
        "doc_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Arrow-batched resize over (doc_id, payload, meta). STUB
    semantics (codecs absent): the fake 'resampled' payload is the
    original truncated by the area ratio — deterministic, so the
    byte-length contract is SQL-checkable; swap the body for a real
    PIL/av resample without touching schema, batching, or callers."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target_area = float(target_w * target_h)
        for pdf in it:
            out_w, out_h, out_n = [], [], []
            for raw, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                ratio = min(1.0, target_area / float(w * h))
                out_w.append(min(int(w), target_w))
                out_h.append(min(int(h), target_h))
                out_n.append(int(len(raw) * ratio))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": out_w,
                    "height": out_h,
                    "n_bytes": out_n,
                }
            )

    flat = df.select(
        "doc_id", "payload", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(batches, RESIZE_SCHEMA)
